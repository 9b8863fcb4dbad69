"""Measure the serving path at the reference's OWN scale limits.

The reference serves scenes with up to MAX_IMAGE=400 frames
(``lib/utils/config.py:123-124``) and benchmark-mode grids up to
400x200x400 with a 480 height crop (``lib/datasets/dataset.py:192-195``,
``tools/scannet_benchmark/vox2mesh.py:43``).  The bench fixture is
2 scenes / 87 views / 240x48x240 — this harness generates (and caches)
two scenes AT the reference limits and pushes them through the full
tiled detect + mask + benchmark-export path on the chip, publishing the
numbers VERDICT r4 item 2 asked for:

  views400  ~254x48x254 grid, 400 views (MAX_IMAGE) — the view-count axis
  tall      ~360x192x360 grid, 96 views, benchmark mode (480-crop path,
            inside the 400x200x400 vox2mesh canvas) — the grid axis

Both run with the trained color fixture so detections/masks are real
work, then the tall scene's predictions are exported through vox2mesh
into the official benchmark format (the reference example.sh chain).

Run on the TPU host:  python tools/reference_scale.py [--scene both]
CPU-scale path pinning lives in tests/test_reference_scale.py.
"""

import argparse
import json
import os
import pathlib
import pickle
import sys
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())
sys.path.insert(0, "tools")

import numpy as np

ROOT = "data/ref_scale"

SCENES = {
    # extent_m -> grid voxels at 4.7 cm: (11.9, 2.25, 11.9) -> 254x48x254
    "views400": dict(extent_m=(11.9, 2.25, 11.9), n_objects=28,
                     max_views=400, seed=201),
    # (16.9, 9.0, 16.9) -> 360x192x360 (within the 400x200x400 canvas);
    # objects span heights > 48 so only the benchmark 480-crop keeps them
    "tall": dict(extent_m=(16.9, 9.0, 16.9), n_objects=36,
                 max_views=96, seed=202),
}


def generate(name, spec):
    """Generate (once) and return the scene path."""
    from tpu3dsis.datagen.synthetic_color import generate_scene

    marker = os.path.join(ROOT, f"{name}.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    rng = np.random.RandomState(spec["seed"])
    out = generate_scene(
        rng, ROOT, name,
        extent_m=spec["extent_m"], n_objects=spec["n_objects"],
        voxel_size=0.046875, image_wh=(328, 256),
        max_views=spec["max_views"], traj_wh=(64, 48), chunks=False,
    )
    rec = {"scene_path": out["scene_path"], "n_views": len(out["poses"])}
    with open(marker, "w") as f:
        json.dump(rec, f)
    return rec


def measure(name, rec, params, report):
    import jax

    import color_loop_check as clc

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.models import Detector

    cfg = clc.build_cfg(os.path.join(ROOT, "frames_square"))
    cfg.MODE = "test"
    mode = "benchmark" if name == "tall" else "scene"
    fl = os.path.join(ROOT, f"{name}.txt")
    with open(fl, "w") as f:
        f.write(rec["scene_path"] + "\n")
    ds = SceneDataset(fl, mode, cfg)
    t0 = time.perf_counter()
    s = ds[0]
    load_s = time.perf_counter() - t0
    frames = {"images": s.images, "depths": s.depths, "poses": s.poses,
              "world_to_grid": s.world_to_grid}

    det = Detector(cfg, anchor_dir="experiments/anchors")
    init = det.init_params(jax.random.PRNGKey(0))
    p = dict(params)
    for k, v in init.items():
        p.setdefault(k, np.asarray(v))
    si = SceneInference(det, cfg)

    r = {"grid": list(s.data.shape[:3]), "views": int(s.images.shape[0]),
         "image_mb": round(s.images.nbytes / 1e6, 1),
         "load_s": round(load_s, 2),
         "resident": bool(si._color_resident_ok(s.data.shape[:3]))}

    t0 = time.perf_counter()
    out, masks = si.infer(p, s.data, frames=frames)
    r["wall_cold_s"] = round(time.perf_counter() - t0, 2)
    # warm pass = the steady-state serving number (compiles cached, but
    # per-scene prep NOT cached: fresh host arrays like the stream sees)
    d2 = s.data.copy()
    f2 = {k: (v.copy() if hasattr(v, "copy") else v)
          for k, v in frames.items()}
    t0 = time.perf_counter()
    out, masks = si.infer(p, d2, frames=f2)
    r["wall_warm_s"] = round(time.perf_counter() - t0, 2)
    r["detections"] = int(len(out["pred_box"]))
    r["mask_voxels"] = int(sum(int(np.asarray(m).sum()) for m in masks))
    report[name] = r
    return out, masks, s


def export_benchmark(name, out, masks, sample, report):
    """Predictions -> vox2mesh canvas -> per-vertex instances -> benchmark
    txt/mask files (the reference example.sh vox2mesh stage, at the
    400x200x400 canvas scale of ``vox2mesh.py:43``)."""
    from tpu3dsis.eval.scannet_benchmark import (
        save_scannet_benchmark,
        vertices_to_instances,
    )

    t0 = time.perf_counter()
    order = np.argsort(-np.asarray(out["pred_conf"]))
    box = np.asarray(out["pred_box"])[order]
    cls = np.asarray(out["pred_class"])[order]
    conf = np.asarray(out["pred_conf"])[order]
    canvas_shape = (400, 200, 400)
    scene = np.zeros(canvas_shape)
    for i in range(len(box)):
        r = np.clip(np.round(box[i]).astype(int), 0,
                    [*canvas_shape, *canvas_shape])
        m = np.asarray(masks[order[i]])
        sub = scene[r[0]: r[3], r[1]: r[4], r[2]: r[5]]
        msub = m[: sub.shape[0], : sub.shape[1], : sub.shape[2]]
        write = (msub != 0) & (sub == 0)
        sub[write] = i * 100 + cls[i] + min(float(conf[i]), 0.999) - 0.01
    # mesh vertices in grid coords (identity world2grid): the occupied
    # surface voxels stand in for the scan mesh
    occ = np.argwhere(sample.data[..., 0] <= 1.0).astype(np.float64)
    ic, im, cf = vertices_to_instances(occ, np.eye(4), scene)
    outdir = os.path.join(ROOT, "benchmark_out")
    save_scannet_benchmark(ic, im, cf, len(occ), outdir, name)
    report[name]["vox2mesh_s"] = round(time.perf_counter() - t0, 2)
    report[name]["mesh_verts"] = int(len(occ))
    report[name]["mesh_instances"] = int(len(ic))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="both",
                    choices=["views400", "tall", "both"])
    args = ap.parse_args()

    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(ROOT, exist_ok=True)

    fixture = "tests/fixtures/color_loop_params.npz"
    params = {k: np.asarray(v, np.float32)
              for k, v in np.load(fixture).items()}

    names = [args.scene] if args.scene != "both" else list(SCENES)
    report = {}
    for name in names:
        rec = generate(name, SCENES[name])
        print(f"[{name}] generated: {rec}", flush=True)
        out, masks, sample = measure(name, rec, params, report)
        print(f"[{name}] {report[name]}", flush=True)
        if name == "tall":
            export_benchmark(name, out, masks, sample, report)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
