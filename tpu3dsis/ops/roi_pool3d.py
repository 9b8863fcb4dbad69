"""3D RoI max-pooling as a separable masked reduction (XLA, autodiff-ready).

Replaces the reference CUDA kernel
(``lib/layer_utils/roi_pooling/src/cuda/roi_pooling_kernel.cu:15-134``) and
matches the CPU/python oracle (``roi_pooling/roi_pool.py:53-199``) bin
arithmetic exactly:

    start = floor(roi_min * spatial_scale); end = ceil(roi_max * spatial_scale)
    roi_size = max(end - start, 1); bin = roi_size / P
    cell [p] covers [floor(p*bin), ceil((p+1)*bin)) shifted by start, clamped
    to the feature extent; empty cells output 0.

TPU design: instead of a scalar gather loop per output cell, each RoI builds
three small (P, W)/(P, H)/(P, L) boolean bin-membership masks and the pooling
is three axis-wise masked max reductions over the shared feature map — dense,
vectorizable work that XLA fuses; `vmap` batches over RoIs. The backward pass
is JAX autodiff of the same program (the reference hand-writes an argmax
scatter kernel, roi_pooling_kernel.cu:137-271; ties differ only in gradient
tie-breaking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -3.0e38


def _axis_masks(lo, hi, pooled, extent):
    """Bin-membership masks for one axis.

    lo/hi: scalar roi start/end in feature coords (already floor/ceil ints).
    Returns (mask (P, extent) bool, nonempty (P,) bool).
    """
    size = jnp.maximum(hi - lo, 1)
    bin_size = size.astype(jnp.float32) / pooled
    p = jnp.arange(pooled, dtype=jnp.float32)
    start = jnp.floor(p * bin_size).astype(jnp.int32) + lo
    end = jnp.ceil((p + 1) * bin_size).astype(jnp.int32) + lo
    start = jnp.clip(start, 0, extent)
    end = jnp.clip(end, 0, extent)
    x = jnp.arange(extent)
    mask = (x[None, :] >= start[:, None]) & (x[None, :] < end[:, None])
    return mask, end > start


def _pool_one(feat, roi, pooled, spatial_scale):
    """feat: (W, H, L, C); roi: (6,) scene-coord corner box -> (P, P, P, C)."""
    w, h, l, _ = feat.shape
    lo = jnp.floor(roi[:3] * spatial_scale).astype(jnp.int32)
    hi = jnp.ceil(roi[3:6] * spatial_scale).astype(jnp.int32)
    mx, okx = _axis_masks(lo[0], hi[0], pooled, w)
    my, oky = _axis_masks(lo[1], hi[1], pooled, h)
    mz, okz = _axis_masks(lo[2], hi[2], pooled, l)

    # axis-wise masked max: (W,H,L,C) -> (P,H,L,C) -> (P,P,L,C) -> (P,P,P,C)
    fx = jnp.where(mx[:, :, None, None, None], feat[None], _NEG).max(axis=1)
    fy = jnp.where(my[None, :, :, None, None], fx[:, None], _NEG).max(axis=2)
    fz = jnp.where(mz[None, None, :, :, None], fy[:, :, None], _NEG).max(axis=3)

    ok = okx[:, None, None] & oky[None, :, None] & okz[None, None, :]
    return jnp.where(ok[..., None], fz, 0.0)


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale"))
def roi_pool3d(feat, rois, pooled: int, spatial_scale: float):
    """feat: (W, H, L, C) single sample; rois: (R, 6) -> (R, P, P, P, C)."""
    return jax.vmap(lambda r: _pool_one(feat, r, pooled, spatial_scale))(rois)


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scales"))
def roi_pool3d_multilevel(feats, rois, level_inds, pooled: int, spatial_scales):
    """Multi-level dispatch (reference ``network.py:503-534``).

    feats: tuple of (W, H, L, C) feature maps (one per level, 1-indexed);
    level_inds: (R,) int level of each roi. Every roi is pooled on every
    level and the right one is selected — branch-free and fixed-shape; the
    level count is <= 3 so the overhead is bounded and the MXU stays busy.
    """
    pooled_all = [
        roi_pool3d(f, rois, pooled, s) for f, s in zip(feats, spatial_scales)
    ]
    out = pooled_all[0]
    for lvl in range(1, len(pooled_all)):
        sel = (level_inds == (lvl + 1))[:, None, None, None, None]
        out = jnp.where(sel, pooled_all[lvl], out)
    return out
