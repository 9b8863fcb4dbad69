"""CLI: convert a released 3D-SIS torch .pth checkpoint to an .npz snapshot.

Usage:
    python tools/convert_checkpoint.py --pth step_1205541.pth \
        --cfg experiments/cfgs/ScanNet/benchmark.yml --out step_1205541.npz
    # ENet weights convert separately:
    python tools/convert_checkpoint.py --enet scannetv2_enet.pth --out enet.npz
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", help="3D-SIS network checkpoint (.pth)")
    p.add_argument("--enet", help="pretrained ENet checkpoint (.pth)")
    p.add_argument("--cfg", default="experiments/cfgs/ScanNet/benchmark.yml")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import numpy as np

    params = {}
    if args.pth:
        import jax

        from tpu3dsis.config import cfg_from_file, finalize_config
        from tpu3dsis.models import Detector
        from tpu3dsis.train import checkpoint as ckpt

        cfg = cfg_from_file(args.cfg)
        finalize_config(cfg)
        det = Detector(cfg, anchor_dir="experiments/anchors")
        model = {
            k: np.asarray(v)
            for k, v in det.init_params(jax.random.PRNGKey(0)).items()
        }
        pre = ckpt.load_pth(args.pth)
        known = set(model)
        loaded = ckpt.partial_update(model, pre, cfg)
        n_loaded = sum(
            1 for k in known if k in pre and loaded[k] is pre.get(k)
        )
        missing = sorted(k for k in pre if k not in known)
        params.update(loaded)
        print(f"converted {len(pre)} tensors; model params {len(known)}")
        if missing:
            print(f"note: {len(missing)} checkpoint tensors without a model "
                  f"slot (e.g. {missing[:3]})")
    if args.enet:
        import torch

        from tpu3dsis.models.enet2d import torch_enet_state_dict_to_params

        sd = torch.load(args.enet, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params.update(torch_enet_state_dict_to_params(sd))
        print(f"converted ENet: {len(sd)} tensors")

    np.savez(args.out, **{f"param:{k}": v for k, v in params.items()})
    print(f"wrote {args.out} ({len(params)} tensors)")


if __name__ == "__main__":
    main()
