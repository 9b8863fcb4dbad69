"""Experiment: why does the resident-volume view scan cost 6.8 ms/view when
the standalone per-view projection costs 1.3 ms?

profile_volume_step.py (v5e, 172x48x172, 90 views): split_ms=1.33,
full_build_ms=611 (6.8/view). Ideal fused step traffic (carry read + fused
gather-max write) is ~1 ms/view. Variants measured here:

  base       production fuse_views (scan, where(ok, max(carry,vol), carry))
  sel_max    max(carry, where(ok, vol, -inf)) — select folds into the max
             producer instead of a 3-operand whole-volume select
  unroll4    lax.scan(unroll=4)
  fori       fori_loop + dynamic_slice per view
  flat       carry kept flat (N, C) — no (X,Y,Z,C) reshape inside the loop

Run: python tools/exp_volume_scan.py [--views 90]
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
    out = {}

    # --- base: production ---
    @jax.jit
    def base(feats, depths, poses, ok):
        init = jnp.full((*dims, c), neg, jnp.bfloat16)

        def body(carry, view):
            f, d, po, o = view
            vol = proj(f, d, po, w2g, intr)
            return jnp.where(o, jnp.maximum(carry, vol), carry), None

        r, _ = jax.lax.scan(body, init, (feats, depths, poses, ok))
        return jnp.where(jnp.isneginf(r), jnp.zeros((), r.dtype), r)

    out["base_ms"] = timed(lambda: base(feats, depths, poses, ok)) * 1e3
    print("base", out["base_ms"], flush=True)

    # --- sel_max: fold validity into the vol producer ---
    @jax.jit
    def sel_max(feats, depths, poses, ok):
        init = jnp.full((*dims, c), neg, jnp.bfloat16)

        def body(carry, view):
            f, d, po, o = view
            vol = proj(f, d, po, w2g, intr)
            return jnp.maximum(carry, jnp.where(o, vol, neg)), None

        r, _ = jax.lax.scan(body, init, (feats, depths, poses, ok))
        return jnp.where(jnp.isneginf(r), jnp.zeros((), r.dtype), r)

    out["sel_max_ms"] = timed(lambda: sel_max(feats, depths, poses, ok)) * 1e3
    print("sel_max", out["sel_max_ms"], flush=True)

    # --- unroll4 ---
    @jax.jit
    def unroll4(feats, depths, poses, ok):
        init = jnp.full((*dims, c), neg, jnp.bfloat16)

        def body(carry, view):
            f, d, po, o = view
            vol = proj(f, d, po, w2g, intr)
            return jnp.maximum(carry, jnp.where(o, vol, neg)), None

        r, _ = jax.lax.scan(
            body, init, (feats, depths, poses, ok), unroll=4
        )
        return jnp.where(jnp.isneginf(r), jnp.zeros((), r.dtype), r)

    out["unroll4_ms"] = timed(lambda: unroll4(feats, depths, poses, ok)) * 1e3
    print("unroll4", out["unroll4_ms"], flush=True)

    # --- fori: explicit indexing ---
    @jax.jit
    def fori(feats, depths, poses, ok):
        init = jnp.full((*dims, c), neg, jnp.bfloat16)

        def body(i, carry):
            vol = proj(feats[i], depths[i], poses[i], w2g, intr)
            return jnp.maximum(carry, jnp.where(ok[i], vol, neg))

        r = jax.lax.fori_loop(0, v, body, init)
        return jnp.where(jnp.isneginf(r), jnp.zeros((), r.dtype), r)

    out["fori_ms"] = timed(lambda: fori(feats, depths, poses, ok)) * 1e3
    print("fori", out["fori_ms"], flush=True)

    # --- flat: carry stays (N, C); reshape once at the end ---
    n = int(np.prod(dims))

    @jax.jit
    def flat(feats, depths, poses, ok):
        init = jnp.full((n, c), neg, jnp.bfloat16)

        def body(carry, view):
            f, d, po, o = view
            lin2d, in_image, zc = P.project_coords(
                po, w2g, intr, dims, (w, h)
            )
            px = jnp.where(in_image, lin2d % w, w)
            py = lin2d // w
            d1, d2, d3 = P.split_bf16x3(d.reshape(h, w))
            table = jnp.concatenate([x.T for x in (d1, d2, d3)], axis=-1)
            oh_u = jax.nn.one_hot(px, w + 1, dtype=jnp.bfloat16)[:, :w]
            m = jnp.matmul(oh_u, table)
            oh_v = jax.nn.one_hot(py, h, dtype=jnp.bfloat16)
            m3 = m.reshape(-1, 3, h)
            picks = jnp.sum(m3 * oh_v[:, None, :], axis=-1)
            dvals = P.merge_bf16x3(picks[:, 0], picks[:, 1], picks[:, 2])
            rows = f.reshape(-1, c)[lin2d]
            valid = (
                in_image
                & (dvals >= 0.4)
                & (dvals <= 4.0)
                & (jnp.abs(dvals - zc) <= vs)
                & o
            )
            vol = jnp.where(valid[:, None], rows, neg)
            return jnp.maximum(carry, vol), None

        r, _ = jax.lax.scan(body, init, (feats, depths, poses, ok))
        r = jnp.where(jnp.isneginf(r), jnp.zeros((), r.dtype), r)
        return r.reshape(*dims, c)

    out["flat_ms"] = timed(lambda: flat(feats, depths, poses, ok)) * 1e3
    print("flat", out["flat_ms"], flush=True)

    # value check vs base
    b = np.asarray(base(feats, depths, poses, ok))
    for name, fn in (("sel_max", sel_max), ("unroll4", unroll4),
                     ("fori", fori), ("flat", flat)):
        r = np.asarray(fn(feats, depths, poses, ok))
        out[f"{name}_exact"] = bool((r == b).all())

    out = {k: (round(x, 2) if isinstance(x, float) else x)
           for k, x in out.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
