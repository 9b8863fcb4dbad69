"""Measure the scene-resident color-volume builder variants on the chip.

The resident volume (``infer/color_volume.py``) max-fuses every view's
projected ENet features into one full-scene grid (reference semantics,
``lib/nets/network.py:220-235``). This harness times the builder's design
space at whole-scene scale so the production defaults stay tied to
measurements (BENCH_NOTES "Scene-resident color volume" section):

  fused       one combined row gather per view — f32 depth rides the bf16
              feature table as an exact bf16x3 split (production default)
  split       row-gather features + separate one-hot depth lookup
              (the pre-fusion shape of the same scan)
  onehot      one-hot MXU contraction for features AND depth
              (wins at per-tile scale, loses at resident scale)
  fused K=4   blocked scan, 4 views per step (value-exact; measured loser
              on v5e — kept selectable via TPU_COLOR_VIEWS_PER_STEP)

Run on the TPU host:  python tools/bench_color_volume.py
"""

import argparse
import functools
import os
import pathlib
import sys
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd

import numpy as np


def build_inputs(rng, n_views, depth_shape, c):
    w, h = depth_shape
    feats = rng.randn(n_views, h, w, c).astype(np.float32)
    depths = rng.uniform(0.4, 4.2, (n_views, h, w)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    # cameras ringed around the scene center, looking inward
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        ca, sa = np.cos(a), np.sin(a)
        poses[i, :3, :3] = np.array(
            [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32
        )
        poses[i, :3, 3] = [4.5 * ca, 1.2, 4.5 * sa]
    return feats, depths, poses


def time_fn(fn, args, iters):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    del out
    ts.sort()
    return ts[len(ts) // 2], ts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, nargs=3, default=[192, 48, 192])
    p.add_argument("--views", type=int, default=90)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu3dsis.geometry.projection import (
        compute_projection,
        fuse_views,
        project_features,
    )
    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    depth_shape = (41, 32)  # ENet features of a 328x256 frame (config.py)
    c = 128
    voxel_size = 0.046875
    depth_min, depth_max = 0.4, 4.3
    intr = np.array(
        [[9.6, 0, 20.5, 0], [0, 9.6, 16.0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    scene = tuple(args.scene)
    w2g = np.diag([1 / voxel_size] * 3 + [1.0]).astype(np.float32)
    w2g[:3, 3] = [scene[0] / 2, scene[1] / 2, scene[2] / 2]

    rng = np.random.RandomState(0)
    feats, depths, poses = build_inputs(rng, args.views, depth_shape, c)
    valid = np.ones((args.views,), bool)

    common = dict(
        world_to_grid=jnp.asarray(w2g),
        intrinsic=jnp.asarray(intr),
        volume_dims=scene,
        image_dims=depth_shape,
        depth_min=depth_min,
        depth_max=depth_max,
        voxel_size=voxel_size,
    )

    def variant(name, feats_dtype, prefer_gather, k=1, split_depth=False):
        f = jnp.asarray(feats).astype(feats_dtype)
        d, po, vv = map(jnp.asarray, (depths, poses, valid))
        if split_depth:
            # pre-fusion scan shape: row-gather features, separate depth
            # lookup (compute_projection's one-hot at HW=1312)
            @jax.jit
            def run(f, d, po, vv):
                init = jnp.full((*scene, c), -jnp.inf, f.dtype)

                def body(carry, view):
                    ft, dp, ps, ok = view
                    lin2d, val = compute_projection(
                        dp, ps, common["world_to_grid"],
                        common["intrinsic"], scene, depth_shape,
                        depth_min, depth_max, voxel_size,
                    )
                    vol = project_features(ft, lin2d, val,
                                           prefer_gather=True)
                    return (
                        jnp.where(ok, jnp.maximum(carry, vol), carry),
                        None,
                    )

                out, _ = jax.lax.scan(body, init, (f, d, po, vv))
                return jnp.where(jnp.isneginf(out),
                                 jnp.zeros((), out.dtype), out)
        else:
            @jax.jit
            def run(f, d, po, vv):
                return fuse_views(
                    f, d, po, **common, view_valid=vv,
                    prefer_gather=prefer_gather, views_per_step=k,
                )

        med, ts = time_fn(run, (f, d, po, vv), args.iters)
        print(f"{name:34s} {med*1e3:8.1f} ms   "
              f"(spread {', '.join(f'{t*1e3:.0f}' for t in ts)})")
        return med

    print(f"scene {scene}, {args.views} views, C={c}, "
          f"feat {depth_shape[1]}x{depth_shape[0]}, "
          f"platform {jax.devices()[0].platform}")
    fused = variant("fused single-gather (production)", jnp.bfloat16, True)
    split = variant("split depth lookup (pre-fusion)", jnp.bfloat16, True,
                    split_depth=True)
    variant("fused, views_per_step=4", jnp.bfloat16, True, k=4)
    variant("one-hot features+depth", jnp.bfloat16, False)
    print(f"\nfused vs split: {split / fused:.2f}x")


if __name__ == "__main__":
    main()
