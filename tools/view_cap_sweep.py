"""Quantify the per-tile view-cap deviation (VERDICT r2 next-step #3).

The per-tile color fallback fuses at most TPU_MAX_TILE_VIEWS frustum-selected
views per tile, where the reference max-pools EVERY view
(``lib/nets/network.py:220-235``). Since round 3 the default path is the
scene-resident color volume (every view fused — zero deviation); the cap
only applies to scenes whose color volume exceeds TPU_COLOR_VOLUME_MAX_MB.
This harness measures what the cap costs there: detection mAP on the
color_loop eval scenes for resident (reference semantics) vs per-tile with
TPU_MAX_TILE_VIEWS in {4, 8, 16, 32, all}.

Run after tools/color_loop_check.py (reuses its cached scenes + fixture):
  python tools/view_cap_sweep.py
"""

import argparse
import os
import pathlib
import pickle
import sys

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd


def eval_scenes(si, params, records, cfg, thresh):
    import numpy as np

    from tpu3dsis.eval import DetectionMAP
    from tpu3dsis.io.dataset import SceneDataset

    m = DetectionMAP(
        cfg.NUM_CLASSES, overlap_threshold=thresh, ignore_class=[0]
    )
    fl = os.path.join("data/color_loop", "scenes.txt")
    with open(fl, "w") as f:
        f.write("".join(r["scene_path"] + "\n" for r in records))
    ds = SceneDataset(fl, "scene", cfg)
    for i in range(len(ds)):
        s = ds[i]
        frames = {
            "images": s.images,
            "depths": s.depths,
            "poses": s.poses,
            "world_to_grid": s.world_to_grid,
        }
        out = si.detect(params, s.data, frames=frames)
        m.evaluate(
            out["pred_box"], out["pred_class"], out["pred_conf"],
            s.gt_box[:, :6], s.gt_box[:, 6],
        )
    m.finalize()
    return m.mAP()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/color_loop")
    p.add_argument("--fixture",
                   default="tests/fixtures/color_loop_params.npz")
    args = p.parse_args()

    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import color_loop_check as clc

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    manifest = os.path.join(args.out, "manifest.pkl")
    if not (os.path.exists(manifest) and os.path.exists(args.fixture)):
        print("run tools/color_loop_check.py first (scenes + fixture)")
        return 1
    with open(manifest, "rb") as f:
        _, eval_records = pickle.load(f)

    cfg = clc.build_cfg(os.path.join(args.out, "frames_square"))
    cfg.MODE = "test"
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = {
        k: np.asarray(v, np.float32)
        for k, v in np.load(args.fixture).items()
    }
    init = det.init_params(jax.random.PRNGKey(0))
    for k, v in init.items():
        params.setdefault(k, np.asarray(v))

    n_views = 96  # >= any scene's view count: the uncapped per-tile mode
    settings = [("resident (reference semantics)", None, None)]
    for cap in (4, 8, 16, 32, n_views):
        name = f"per-tile cap {cap}" if cap < n_views else "per-tile ALL"
        settings.append((name, "never", cap))

    rows = []
    for name, resident, cap in settings:
        c = cfg.copy()
        if resident is not None:
            c.TPU_SCENE_COLOR_RESIDENT = resident
        if cap is not None:
            c.TPU_MAX_TILE_VIEWS = cap
        si = SceneInference(det, c)
        r25 = eval_scenes(si, params, eval_records, c, 0.25)
        r50 = eval_scenes(si, params, eval_records, c, 0.5)
        rows.append((name, r25, r50))
        print(f"[view-cap] {name}: mAP@0.25={r25:.4f} mAP@0.5={r50:.4f}",
              flush=True)

    print("\n| mode | mAP@0.25 | mAP@0.5 |\n|---|---|---|")
    for name, r25, r50 in rows:
        print(f"| {name} | {r25:.4f} | {r50:.4f} |")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    sys.exit(main())
