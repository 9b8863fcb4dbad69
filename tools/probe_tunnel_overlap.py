"""Probe the axon tunnel: upload bandwidth and transfer/compute overlap.

The color-scene stream is bound by per-scene host->device bytes (~28 MB:
uint8 views + TSDF) plus device prep (ENet + resident volume). Whether
>=60 scenes/min is reachable depends on one hardware fact: do tunnel
transfers overlap device compute (separate DMA stream), or serialize on
one request stream? This measures it directly.

Run: python tools/probe_tunnel_overlap.py
"""

import concurrent.futures
import json
import os
import pathlib
import sys
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}

    # --- upload bandwidth vs size ---
    rng = np.random.RandomState(0)
    for mb in (4, 24):
        buf = rng.randint(0, 255, (mb << 20,), dtype=np.uint8)
        jax.block_until_ready(jax.device_put(buf))  # warm path
        ts = []
        for _ in range(3):
            b = buf.copy()
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(b))
            ts.append(time.perf_counter() - t0)
        out[f"upload_{mb}mb_mb_per_s"] = round(mb / min(ts), 1)

    # --- the REAL shape the stream ships: an (V, H, W, 3) uint8 view stack
    imgs = rng.randint(0, 255, (87, 256, 328, 3), dtype=np.uint8)
    jax.block_until_ready(jax.device_put(imgs))
    ts = []
    for _ in range(3):
        b = imgs.copy()
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(b))
        ts.append(time.perf_counter() - t0)
    out["upload_viewstack_mb_per_s"] = round(
        imgs.nbytes / 1e6 / min(ts), 1
    )

    # --- two concurrent upload threads: does aggregate BW scale? ---
    bufs = [rng.randint(0, 255, (24 << 20,), dtype=np.uint8) for _ in range(2)]
    ex = concurrent.futures.ThreadPoolExecutor(2)
    t0 = time.perf_counter()
    futs = [ex.submit(lambda b=b: jax.block_until_ready(jax.device_put(b)))
            for b in bufs]
    [f.result() for f in futs]
    dt = time.perf_counter() - t0
    out["upload_2x24mb_concurrent_mb_per_s"] = round(48 / dt, 1)

    # --- compute kernel ~0.5 s ---
    x = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))

    @jax.jit
    def heavy(x):
        def body(c, _):
            c = jnp.tanh(c @ x) * 1e-3 + c
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=600)
        return c

    jax.block_until_ready(heavy(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(heavy(x))
        ts.append(time.perf_counter() - t0)
    compute_s = min(ts)
    out["compute_s"] = round(compute_s, 3)

    # --- overlap: dispatch compute, then upload from another thread ---
    buf = rng.randint(0, 255, (24 << 20,), dtype=np.uint8)
    upload_s = 24 / out["upload_24mb_mb_per_s"]
    ts = []
    for _ in range(3):
        b = buf.copy()
        t0 = time.perf_counter()
        y = heavy(x)  # async dispatch
        fut = ex.submit(lambda: jax.block_until_ready(jax.device_put(b)))
        fut.result()
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    both = min(ts)
    out["overlap_both_s"] = round(both, 3)
    out["serial_sum_s"] = round(compute_s + upload_s, 3)
    out["overlap_ratio"] = round(
        (compute_s + upload_s - both) / min(compute_s, upload_s), 2
    )  # 1.0 = full overlap, 0.0 = fully serialized

    # --- device->host download bandwidth (mask bits etc.) ---
    # 2 MB, not 24: the first probe run measured 0.1 MB/s on a 24 MB
    # download (4 min!) — keep the probe itself bounded
    dl = jax.device_put(buf[: 2 << 20])
    jax.block_until_ready(dl)
    t0 = time.perf_counter()
    np.asarray(dl)
    out["download_2mb_mb_per_s"] = round(2 / (time.perf_counter() - t0), 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
