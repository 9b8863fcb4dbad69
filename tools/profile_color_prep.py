"""Profile the per-scene COLOR prep path stage by stage on the chip.

bench.py r4 showed the flagship color stream is PREP-bound: 1.6-2.1 s/scene
wall vs 0.14 s fused detect+mask compute (`scenes_per_min_color_masked` 33.0
vs `_device` 436.9). The prep (image upload + ENet over all views + frusta +
resident color-volume build) runs on the SAME chip as the fused program, so
the prefetch thread cannot hide it — the stream rate IS the prep rate. This
harness publishes the split so each cut is measured, not guessed
(VERDICT r4 item 1; reference shipped config is USE_IMAGES: True,
`lib/nets/network.py:187-235`).

Stages timed per scene (median over --iters):
  upload     host->device transfer of the raw uint8 view stack
  enet       ENet features for all views (32-view blocks, as production)
  frusta     host-side per-view frustum bboxes
  volume     resident color-volume build (fuse_views scan over views)
  fused      the fused detect+stitch+mask program (the compute the stream
             overlaps prep with)
  prep_e2e   SceneInference._prepare_color wall (cache cleared) — should
             approximate upload+enet+frusta+volume

Run on the TPU host:  python tools/profile_color_prep.py
"""

import argparse
import json
import os
import pathlib
import sys
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())
sys.path.insert(0, "tools")

import numpy as np


def med_time(fn, iters=5, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench

    scenes, si, params, cfg = load_bench_scenes(bench)
    params_d = si._device_params(params)

    report = {}
    for idx, (data, frames) in enumerate(scenes):
        images = frames["images"]
        v = images.shape[0]
        key = f"scene{idx}"
        r = {"views": int(v), "shape": list(data.shape[:3]),
             "image_mb": round(images.nbytes / 1e6, 1)}

        # --- upload: raw view stack host->device ---
        def upload():
            buf = images.copy()  # defeat page cache aliasing
            jax.block_until_ready(jax.device_put(buf))

        r["upload_s"], _ = med_time(upload, args.iters)

        # --- enet: production 32-view blocks, input already on device ---
        feats_fn, _ = si._color_fns
        vpad = ((v + 31) // 32) * 32
        blks = []
        for i in range(0, vpad, 32):
            blk = images[i : i + 32]
            if blk.shape[0] < 32:
                blk = np.concatenate(
                    [blk, np.zeros((32 - blk.shape[0], *images.shape[1:]),
                                   images.dtype)]
                )
            blks.append(jax.device_put(blk))
        jax.block_until_ready(blks)

        def enet():
            outs = [feats_fn(params_d, b) for b in blks]
            jax.block_until_ready(outs)

        r["enet_s"], _ = med_time(enet, args.iters)

        # --- frusta: host-side view bboxes ---
        from tpu3dsis.models.color import frustum_bbox_grid

        proj = si.det.color_projector

        def frusta():
            return [
                frustum_bbox_grid(
                    frames["poses"][i], frames["world_to_grid"],
                    proj.intrinsic, proj.depth_shape,
                    proj.depth_min, proj.depth_max,
                )
                for i in range(v)
            ]

        r["frusta_s"], _ = med_time(frusta, args.iters)

        # --- volume: resident build, inputs resident ---
        si._color_prep_cache = {}
        prep = si._prepare_color(params_d, frames, data.shape[:3])
        bucket = si._bucket_shape(data.shape[:3])
        build = si._color_vol_fns[bucket]
        feats2d = jax.block_until_ready(prep["feats2d"])
        depths, poses = prep["depths"], prep["poses"]
        w2g = jnp.asarray(np.asarray(frames["world_to_grid"], np.float32))
        vv = jnp.asarray(np.arange(depths.shape[0]) < v)

        def volume():
            jax.block_until_ready(build(feats2d, depths, poses, w2g, vv))

        r["volume_s"], _ = med_time(volume, args.iters)

        # --- fused: the detect+mask program (device_seconds) ---
        r["fused_s"] = float(
            si.device_seconds(params, data, frames=frames, iters=4)
        )

        # --- prep_e2e: the production prep wall, cold cache ---
        def prep_e2e():
            si._color_prep_cache = {}
            out = si._prepare_color(params_d, frames, data.shape[:3])
            jax.block_until_ready(out["color"])

        r["prep_e2e_s"], _ = med_time(prep_e2e, args.iters)

        r = {
            k: (round(vv_, 4) if isinstance(vv_, float) else vv_)
            for k, vv_ in r.items()
        }
        report[key] = r
        print(json.dumps({key: r}))

    # raw tunnel bandwidth probe (32 MB)
    buf = np.random.RandomState(0).bytes(32 * 1024 * 1024)
    arr = np.frombuffer(buf, np.uint8)

    def put():
        jax.block_until_ready(jax.device_put(arr.copy()))

    bw_s, _ = med_time(put, 3)
    report["upload_mb_per_s"] = round(32 / bw_s, 1)
    print(json.dumps({"upload_mb_per_s": report["upload_mb_per_s"]}))
    return report


def load_bench_scenes(bench):
    """Reuse bench.py's fixture loading (scenes + trained params + cfg)."""
    import pickle

    import color_loop_check as clc
    import jax

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.models import Detector

    frames_root = os.path.join(bench.BENCH_COLOR_DIR, "frames_square")
    cfg = clc.build_cfg(frames_root)
    cfg.MODE = "test"
    manifest = os.path.join(bench.BENCH_COLOR_DIR, "manifest_v2.pkl")
    with open(manifest, "rb") as f:
        scene_paths = pickle.load(f)
    fl = os.path.join(bench.BENCH_COLOR_DIR, "scenes.txt")
    with open(fl, "w") as f:
        f.write("".join(p + "\n" for p in scene_paths))
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = {
        k: np.asarray(v, np.float32)
        for k, v in np.load(bench.COLOR_FIXTURE).items()
    }
    init = det.init_params(jax.random.PRNGKey(0))
    for k, v in init.items():
        params.setdefault(k, np.asarray(v))
    si = SceneInference(det, cfg)
    fl = os.path.join(bench.BENCH_COLOR_DIR, "scenes.txt")
    ds = SceneDataset(fl, "scene", cfg)
    scenes = []
    for i in range(len(ds)):
        s = ds[i]
        scenes.append(
            (s.data, {"images": s.images, "depths": s.depths,
                      "poses": s.poses, "world_to_grid": s.world_to_grid})
        )
    return scenes, si, params, cfg


if __name__ == "__main__":
    main()
