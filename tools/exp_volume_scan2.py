"""Round 2: unroll depth sweep + direct-depth-gather variant (exact checks).

exp_volume_scan.py measured unroll=4 at 488 ms vs base 615 (exact). Here:
  unroll{2,8,16}   sweep the unroll factor
  dgather          project_view variant where the depth pick is a plain
                   second (N,) gather from the f32 depth map instead of the
                   separable one-hot contraction (value-identical: both read
                   the same f32 depth value)
  dgather_u8       the same under unroll=8

Run: python tools/exp_volume_scan2.py
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


def timed(fn, iters=4, warmup=2):
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
    ok = jnp.ones((v,), bool)
    neg = jnp.asarray(-jnp.inf, jnp.bfloat16)

    proj = functools.partial(
        P.project_view_split, volume_dims=dims, image_dims=(w, h),
        depth_min=0.4, depth_max=4.0, voxel_size=vs,
    )

    def dgather_view(f, d, po):
        lin2d, in_image, zc = P.project_coords(po, w2g, intr, dims, (w, h))
        dvals = d.reshape(-1)[lin2d]  # plain (N,) f32 gather
        rows = f.reshape(-1, c)[lin2d]
        valid = (
            in_image
            & (dvals >= 0.4)
            & (dvals <= 4.0)
            & (jnp.abs(dvals - zc) <= vs)
        )
        vol = jnp.where(valid[:, None], rows, jnp.zeros((), jnp.bfloat16))
        return vol.reshape(*dims, c)

    def build_scan(view_fn, unroll):
        @jax.jit
        def run(feats, depths, poses, ok):
            init = jnp.full((*dims, c), neg, jnp.bfloat16)

            def body(carry, view):
                f, d, po, o = view
                vol = view_fn(f, d, po)
                return jnp.maximum(carry, jnp.where(o, vol, neg)), None

            r, _ = jax.lax.scan(
                body, init, (feats, depths, poses, ok), unroll=unroll
            )
            return jnp.where(jnp.isneginf(r), jnp.zeros((), r.dtype), r)

        return run

    split_view = lambda f, d, po: proj(f, d, po, w2g, intr)  # noqa: E731

    out = {}
    fused = functools.partial(
        P.project_view_fused, volume_dims=dims, image_dims=(w, h),
        depth_min=0.4, depth_max=4.0, voxel_size=vs,
    )
    fused_view = lambda f, d, po: fused(f, d, po, w2g, intr)  # noqa: E731
    variants = {
        "unroll8": build_scan(split_view, 8),
        "fused_u1": build_scan(fused_view, 1),
        "fused_u8": build_scan(fused_view, 8),
    }
    base = build_scan(split_view, 1)
    out["base_ms"] = timed(lambda: base(feats, depths, poses, ok)) * 1e3
    print("base", round(out["base_ms"], 1), flush=True)
    b = np.asarray(base(feats, depths, poses, ok))
    for name, fn in variants.items():
        out[f"{name}_ms"] = timed(
            lambda fn=fn: fn(feats, depths, poses, ok)
        ) * 1e3
        r = np.asarray(fn(feats, depths, poses, ok))
        out[f"{name}_exact"] = bool((r == b).all())
        print(name, round(out[f"{name}_ms"], 1), out[f"{name}_exact"],
              flush=True)

    out = {k: (round(x, 2) if isinstance(x, float) else x)
           for k, x in out.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
