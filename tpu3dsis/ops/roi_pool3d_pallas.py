"""Pallas TPU kernel for 3D RoI max-pooling.

Same semantics as :func:`tpu3dsis.ops.roi_pool3d.roi_pool3d` (the reference
CUDA kernel's bin arithmetic), different memory behavior: the level feature
map ((W, H, L, C) — ~1.8 MB in bf16 at stride-4 chunk resolution) is pinned
in VMEM ONCE and every RoI program on the grid re-reads it at VMEM
bandwidth. The XLA masked-reduce version streams from HBM per bin per RoI
(~1.4 GB per 8x200-roi batch); here HBM traffic is feat + rois + outputs
(~5 MB). The grid is (R,) with a constant feature index_map so Pallas keeps
the block resident across sequential programs.

Measured on v5e: bit-exact and parity-speed with the XLA path (9.2 vs
8.7 ms per 8x200 rois) — the op turns out VPU-compute-bound on the
per-bin masked selects, not HBM-bound, so VMEM residency alone doesn't
win. Kept as the production-ready Pallas variant; the XLA path stays the
default. interpret=True covers CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38


def _bin_bounds(p, pooled, lo, size, extent):
    """Static-p bin [start, end) with reference clamping (scalars)."""
    bin_size = size.astype(jnp.float32) / pooled
    start = jnp.floor(p * bin_size).astype(jnp.int32) + lo
    end = jnp.ceil((p + 1) * bin_size).astype(jnp.int32) + lo
    return (
        jnp.clip(start, 0, extent),
        jnp.clip(end, 0, extent),
    )


def _make_kernel(pooled, spatial_scale, w, h, l, c):
    def kernel(rois_ref, feat_ref, out_ref):
        i = pl.program_id(0)
        lo = []
        hi = []
        for d in range(3):
            lo.append(
                jnp.floor(rois_ref[i, d] * spatial_scale).astype(jnp.int32)
            )
            hi.append(
                jnp.ceil(rois_ref[i, d + 3] * spatial_scale).astype(jnp.int32)
            )
        sizes = [jnp.maximum(hi[d] - lo[d], 1) for d in range(3)]

        feat = feat_ref[:]  # (W, H, L, C) resident in VMEM
        ix = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        iz = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)

        for px in range(pooled):
            sx, ex = _bin_bounds(px, pooled, lo[0], sizes[0], w)
            mx = ((ix >= sx) & (ix < ex))[:, 0]
            okx = ex > sx
            fx = jnp.where(mx[:, None, None, None], feat, _NEG).max(axis=0)
            for py in range(pooled):
                sy, ey = _bin_bounds(py, pooled, lo[1], sizes[1], h)
                my = ((iy >= sy) & (iy < ey))[:, 0]
                oky = ey > sy
                fy = jnp.where(my[:, None, None], fx, _NEG).max(axis=0)
                for pz in range(pooled):
                    sz, ez = _bin_bounds(pz, pooled, lo[2], sizes[2], l)
                    mz = ((iz >= sz) & (iz < ez))[:, 0]
                    okz = ez > sz
                    fz = jnp.where(mz[:, None], fy, _NEG).max(axis=0)
                    ok = okx & oky & okz
                    out_ref[0, px, py, pz, :] = jnp.where(ok, fz, 0.0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("pooled", "spatial_scale", "interpret")
)
def roi_pool3d_pallas(feat, rois, pooled: int, spatial_scale: float,
                      interpret: bool = False):
    """feat: (W, H, L, C); rois: (R, 6) -> (R, P, P, P, C)."""
    w, h, l, c = feat.shape
    r = rois.shape[0]
    kernel = _make_kernel(pooled, spatial_scale, w, h, l, c)
    return pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((r, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (w, h, l, c), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, pooled, pooled, pooled, c),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((r, pooled, pooled, pooled, c),
                                       feat.dtype),
        interpret=interpret,
    )(rois, feat)
