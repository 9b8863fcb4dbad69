"""Microbenchmark the resident color-volume view step (VERDICT r5 work).

profile_color_prep.py shows the volume build at ~0.70 s for ~90 views of a
172x48x172 scene (7.8 ms/view). This decomposes one view step into its parts
to find where those milliseconds go before optimizing:

  gather      plain (N,128) bf16 row gather from the (1312,128) table
  gather_n8   the same plus a second narrow (N,8) gather (depth ride option)
  coords      project_coords vector math alone
  split       project_view_split (production path)
  fused       project_view_fused (ridden-depth variant)
  scanstep    one full scan body step incl. carry max
  full_build  the whole 90-view fuse_views (sanity anchor vs profiler)

Run: python tools/profile_volume_step.py [--shape 172 48 172] [--views 90]
"""

import argparse
import functools
import json
import os
import pathlib
import sys
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())

import numpy as np


def timed(fn, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=3, default=[172, 48, 172])
    p.add_argument("--views", type=int, default=90)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu3dsis.geometry import projection as P

    dims = tuple(args.shape)
    n = int(np.prod(dims))
    v = args.views
    w, h = 41, 32
    c = 128
    rng = np.random.RandomState(0)

    feats = jnp.asarray(rng.randn(v, h, w, c).astype(np.float32)).astype(
        jnp.bfloat16
    )
    depths = jnp.asarray(rng.uniform(0.5, 4.0, (v, h, w)).astype(np.float32))
    poses_np = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    poses_np[:, 0, 3] = rng.uniform(0, dims[0] * 0.047, v)
    poses_np[:, 2, 3] = rng.uniform(-1.5, 0.5, v)
    poses = jnp.asarray(poses_np)
    vs = 0.046875
    w2g = jnp.asarray(np.diag([1 / vs] * 3 + [1.0]).astype(np.float32))
    intr_np = np.eye(4, dtype=np.float32)
    intr_np[0, 0] = intr_np[1, 1] = 35.0
    intr_np[0, 2], intr_np[1, 2] = w / 2, h / 2
    intr = jnp.asarray(intr_np)

    idx = jnp.asarray(rng.randint(0, w * h, n).astype(np.int32))
    table = feats[0].reshape(-1, c)
    out = {}

    # --- plain row gather ---
    @jax.jit
    def g(table, idx):
        return table[idx]

    out["gather_ms"] = timed(lambda: g(table, idx)) * 1e3

    # --- gather + narrow depth gather ---
    tab8 = jnp.concatenate(
        [depths[0].reshape(-1, 1).astype(jnp.bfloat16)] * 8, axis=1
    )

    @jax.jit
    def g8(table, tab8, idx):
        return table[idx], tab8[idx]

    out["gather_plus_n8_ms"] = timed(lambda: g8(table, tab8, idx)) * 1e3

    # --- combined width-131 gather (fused variant's shape) ---
    tab131 = jnp.concatenate([table, tab8[:, :3]], axis=1)

    @jax.jit
    def g131(tab, idx):
        return tab[idx]

    out["gather_w131_ms"] = timed(lambda: g131(tab131, idx)) * 1e3

    # --- coords only ---
    coords = jax.jit(
        functools.partial(
            P.project_coords, volume_dims=dims, image_dims=(w, h)
        )
    )
    out["coords_ms"] = timed(lambda: coords(poses[0], w2g, intr)) * 1e3

    # --- split / fused single-view ---
    for name, fn in (("split", P.project_view_split),
                     ("fused", P.project_view_fused)):
        f = jax.jit(
            functools.partial(
                fn, volume_dims=dims, image_dims=(w, h),
                depth_min=0.4, depth_max=4.0, voxel_size=vs,
            )
        )
        out[f"{name}_ms"] = timed(
            lambda f=f: f(feats[0], depths[0], poses[0], w2g, intr)
        ) * 1e3

    # --- one scan-body step: split + carry max ---
    @jax.jit
    def step(carry, feat, depth, pose):
        vol = P.project_view_split(
            feat, depth, pose, w2g, intr, dims, (w, h), 0.4, 4.0, vs
        )
        return jnp.maximum(carry, vol)

    carry = jnp.zeros((*dims, c), jnp.bfloat16)
    out["scanstep_ms"] = timed(
        lambda: step(carry, feats[0], depths[0], poses[0])
    ) * 1e3

    # --- full build ---
    @jax.jit
    def build(feats, depths, poses):
        return P.fuse_views(
            feats, depths, poses, w2g, intr, dims, (w, h), 0.4, 4.0, vs,
            prefer_gather=True,
        )

    out["full_build_ms"] = timed(
        lambda: build(feats, depths, poses), iters=4
    ) * 1e3
    out["per_view_ms"] = out["full_build_ms"] / v
    out = {k: round(x, 3) for k, x in out.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
