"""Learning-loop validation: overfit synthetic chunks, watch mAP rise.

Builds a handful of synthetic 96x48x96 chunks with solid TSDF objects,
trains the full detector (RPN + class + mask losses) and reports chunk
validation metrics (AP_ROI / mAP_CLASSIFICATION / mAP_MASK) before/after.
A healthy pipeline overfits these in a few hundred steps.
"""

import argparse
import os
import sys
import pathlib

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd


def make_chunks(out_dir, n=4, seed=0):
    import numpy as np

    from tpu3dsis.io import write_chunk_file

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n):
        sdf = np.full((96, 48, 96), 8.0, np.float32)  # free space
        boxes, labels, masks = [], [], []
        for j in range(3):
            cx, cy, cz = rng.randint(14, 80), rng.randint(8, 38), rng.randint(14, 80)
            # alternate small cube (chair-ish) and slab (table-ish)
            if j % 2 == 0:
                sx, sy, sz = rng.randint(6, 10), rng.randint(7, 10), rng.randint(6, 10)
                label = 5  # nyu40 chair -> consecutive 3
            else:
                sx, sy, sz = rng.randint(12, 16), rng.randint(4, 6), rng.randint(12, 16)
                label = 7  # nyu40 table -> consecutive 5
            x0, y0, z0 = cx - sx // 2, cy - sy // 2, cz - sz // 2
            x1, y1, z1 = x0 + sx, y0 + sy, z0 + sz
            sdf[x0:x1, y0:y1, z0:z1] = 0.3  # near-surface band
            sdf[x0 + 1 : x1 - 1, y0 + 1 : y1 - 1, z0 + 1 : z1 - 1] = -2.0
            boxes.append([x0, y0, z0, x1, y1, z1])
            labels.append(label)
            masks.append(np.ones((sx, sy, sz), np.uint16))
        path = os.path.join(out_dir, f"ov{i}__0__.chunk")
        write_chunk_file(
            path, sdf, np.asarray(boxes, np.float64),
            np.asarray(labels, np.uint32), masks,
            np.ones(len(boxes), np.float32),
            np.eye(4, dtype=np.float32), np.zeros(0, np.uint32),
        )
        paths.append(path)
    filelist = os.path.join(out_dir, "train.txt")
    with open(filelist, "w") as f:
        f.write("".join(p + "\n" for p in paths))
    return filelist


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.003)
    p.add_argument("--out", default="data/overfit")
    args = p.parse_args()

    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu3dsis.config import cfg_from_file, finalize_config
    from tpu3dsis.infer.validate import ChunkValidator
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.train.loop import Trainer

    cfg = cfg_from_file("experiments/cfgs/ScanNet/benchmark.yml")
    finalize_config(cfg)
    cfg.USE_IMAGES = False
    cfg.FIX_BACKBONE = cfg.FIX_RPN = cfg.FIX_CLASS = False
    cfg.LEARNING_RATE = args.lr
    cfg.STEPSIZE = []
    cfg.VAL_TIME = 0.0
    cfg.DISPLAY = 20
    cfg.KEEP_THRESH = 0.0
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 512
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 64
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.CLASS_THRESH = 0.3
    cfg.ROI_THRESH = 0.5
    cfg.TPU_MAX_MASK_ROIS = 8
    cfg.TPU_DATA_PARALLEL = 1

    filelist = make_chunks(args.out)
    cfg.TRAIN_FILELIST = filelist
    cfg.VAL_FILELIST = filelist
    cfg.TRAINVAL_FILELIST = ""

    trainer = Trainer(cfg, os.path.join(args.out, "run"))
    validator = ChunkValidator(trainer.detector, cfg, (96, 48, 96))
    ds = SceneDataset(filelist, "chunk", cfg)

    state, _ = trainer.restore_or_init(seed=0)
    params0 = {k: np.asarray(v) for k, v in state.params.items()}
    before = validator.run(params0, ds, max_samples=4)
    print("[overfit] before:", before)

    state, step = trainer.train(epochs=10_000, max_steps=args.steps)
    params1 = {k: np.asarray(v) for k, v in state.params.items()}
    after = validator.run(params1, ds, max_samples=4)
    print(f"[overfit] after {step} steps:", after)

    # absolute bar (resumed runs make a before/after comparison meaningless)
    ok = after["AP_ROI"] >= 0.3 and after["mAP_CLASSIFICATION"] >= 0.3
    print("[overfit]", "PASS" if ok else "FAIL",
          "(bar: AP_ROI>=0.3 and mAP_CLASSIFICATION>=0.3)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
