"""CLI entrypoint — mirrors the reference ``main.py:14-83`` interface.

    python main.py --cfg ScanNet/benchmark --mode train|test|benchmark \
        [--output_dir ... --epochs N --tag t --step path.npz|path.pth]
"""

from __future__ import annotations

import argparse
import os
import pprint


def parse_args():
    parser = argparse.ArgumentParser(description="tpu3dsis (3D-SIS on TPU)")
    parser.add_argument("--output_dir", type=str, default="../checkpoints/")
    parser.add_argument("--epochs", type=int, default=100000)
    parser.add_argument("--cfg", type=str, default="ScanNet/benchmark")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument(
        "--step", type=str, default="0",
        help="checkpoint to load (.npz snapshot or torch .pth)",
    )
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--max_steps", type=int, default=None)
    return parser.parse_args()


def main():
    from tpu3dsis.config import cfg_from_file, cfg_to_file, finalize_config

    args = parse_args()
    # Honor JAX_PLATFORMS even when a platform plugin (e.g. the axon TPU
    # tunnel) registers itself with priority over the env var.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("Called with args:")
    print(args)

    cfg = cfg_from_file(os.path.join("experiments", "cfgs", args.cfg + ".yml"))
    cfg.DEBUG = args.debug
    finalize_config(cfg)
    print("Using configs:")
    pprint.pprint(dict(cfg))

    out_dir = os.path.join(
        args.output_dir,
        f"{args.cfg}-{args.tag}" if args.tag is not None else args.cfg,
    )
    os.makedirs(out_dir, exist_ok=True)
    cfg_name = args.cfg.split("/")[-1]
    dump = os.path.join(out_dir, cfg_name + ".yml")
    if not os.path.isfile(dump):
        cfg_to_file(cfg, dump)

    if args.mode == "train":
        cfg.MODE = "train"
        from tpu3dsis.train.loop import Trainer

        trainer = Trainer(cfg, out_dir)
        pretrained = args.step if args.step not in ("0", "") else None
        trainer.train(args.epochs, max_steps=args.max_steps, pretrained=pretrained)
    elif args.mode in ("test", "benchmark"):
        cfg.MODE = args.mode
        import jax
        import numpy as np

        from tpu3dsis.models.detector import Detector
        from tpu3dsis.train import checkpoint as ckpt
        from tpu3dsis.infer.driver import run_scenes

        detector = Detector(cfg, anchor_dir="experiments/anchors")
        params = detector.init_params(jax.random.PRNGKey(0))
        if args.step not in ("0", ""):
            pre = (
                ckpt.load_pth(args.step)
                if args.step.endswith(".pth")
                else ckpt.load_snapshot(args.step)[0]
            )
            params = ckpt.partial_update(params, pre, cfg)
        params = {k: np.asarray(v) for k, v in params.items()}
        run_scenes(cfg, params, args.mode, detector=detector)
    else:
        raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
