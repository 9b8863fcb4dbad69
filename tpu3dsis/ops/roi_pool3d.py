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
import numpy as np

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
def roi_pool3d_reference(feat, rois, pooled: int, spatial_scale: float):
    """Direct separable masked-reduction version (kept as a readable oracle;
    the production path below computes identical outputs with ~7x less HBM
    traffic)."""
    return jax.vmap(lambda r: _pool_one(feat, r, pooled, spatial_scale))(rois)


# ---------------------------------------------------------------------------
# Production path: shared range-max tables.
#
# The masked-reduction version reads the full (W, H, L, C) feature map once
# per output bin per RoI — ~7M element-reads per RoI, which made RoI pooling
# the single most expensive stage of the pipeline on TPU (bandwidth-bound).
# Sparse-table range-max queries fix this: precompute, ONCE per feature map
# and shared by all RoIs, the power-of-two-window maxima over the (x, y)
# plane; any bin rectangle is then the max of 4 gathered corners (the
# classic RMQ trick, valid for max because overlapping windows are
# idempotent). Only the small z-axis reduction stays masked. Outputs are
# bit-identical to the reference semantics.
# ---------------------------------------------------------------------------


def _axis_bins(lo, hi, pooled, extent):
    """Clipped per-bin [start, end) ranges (reference bin arithmetic)."""
    size = jnp.maximum(hi - lo, 1)
    bin_size = size.astype(jnp.float32) / pooled
    p = jnp.arange(pooled, dtype=jnp.float32)
    start = jnp.clip(jnp.floor(p * bin_size).astype(jnp.int32) + lo, 0, extent)
    end = jnp.clip(jnp.ceil((p + 1) * bin_size).astype(jnp.int32) + lo, 0, extent)
    return start, end


def _floor_log2(n):
    """floor(log2(n)) for int n >= 1 (n <= 2^30)."""
    return 31 - jax.lax.clz(jnp.maximum(n, 1).astype(jnp.int32))


def _build_xy_tables(feat, kx_max, ky_max):
    """T[kx, ky, i, j, l, c] = max over [i, i+2^kx) x [j, j+2^ky).

    Out-of-range windows are padded with the edge value (queries never read
    them thanks to the corner clamping, but keep them finite).
    """
    w = feat.shape[0]
    h = feat.shape[1]
    tables = []
    tx = feat
    for kx in range(kx_max + 1):
        if kx > 0:
            shift = 1 << (kx - 1)
            shifted = jnp.concatenate([tx[shift:], tx[-1:].repeat(shift, 0)], 0)
            tx = jnp.maximum(tx, shifted)
        row = [tx]
        ty = tx
        for ky in range(1, ky_max + 1):
            shift = 1 << (ky - 1)
            shifted = jnp.concatenate(
                [ty[:, shift:], ty[:, -1:].repeat(shift, 1)], 1
            )
            ty = jnp.maximum(ty, shifted)
            row.append(ty)
        tables.append(jnp.stack(row, 0))
    return jnp.stack(tables, 0)  # (KX+1, KY+1, W, H, L, C)


def _pool_rois_tabled(feat, rois, pooled, spatial_scale):
    w, h, l, c = feat.shape
    kx_max = max(int(np.floor(np.log2(w))), 0)
    ky_max = max(int(np.floor(np.log2(h))), 0)
    tables = _build_xy_tables(feat, kx_max, ky_max)
    tflat = tables.reshape(-1, l, c)  # row index = ((kx*(KY+1)+ky)*W+i)*H+j

    def one(roi):
        lo = jnp.floor(roi[:3] * spatial_scale).astype(jnp.int32)
        hi = jnp.ceil(roi[3:6] * spatial_scale).astype(jnp.int32)
        sx, ex = _axis_bins(lo[0], hi[0], pooled, w)
        sy, ey = _axis_bins(lo[1], hi[1], pooled, h)
        sz, ez = _axis_bins(lo[2], hi[2], pooled, l)
        okx = ex > sx
        oky = ey > sy
        okz = ez > sz

        nx = jnp.maximum(ex - sx, 1)
        ny = jnp.maximum(ey - sy, 1)
        kx = jnp.minimum(_floor_log2(nx), kx_max)  # (P,)
        ky = jnp.minimum(_floor_log2(ny), ky_max)
        ax0 = sx
        ax1 = ex - (1 << kx)
        ay0 = sy
        ay1 = ey - (1 << ky)

        # (P, P) grids of corner rows in the flattened table
        def row(xi, yi):
            return (
                (kx[:, None] * (ky_max + 1) + ky[None, :]) * w + xi[:, None]
            ) * h + yi[None, :]

        rows = jnp.stack(
            [row(ax0, ay0), row(ax0, ay1), row(ax1, ay0), row(ax1, ay1)], 0
        )  # (4, P, P)
        corners = tflat[rows]  # (4, P, P, L, C)
        out_xy = jnp.max(corners, axis=0)  # (P, P, L, C)

        # z-axis: masked reduction over the remaining small axis
        zidx = jnp.arange(l)
        mz = (zidx[None, :] >= sz[:, None]) & (zidx[None, :] < ez[:, None])
        out = jnp.where(
            mz[None, None, :, :, None], out_xy[:, :, None, :, :], _NEG
        ).max(axis=3)  # (P, P, P, C)

        ok = (
            okx[:, None, None] & oky[None, :, None] & okz[None, None, :]
        )
        return jnp.where(ok[..., None], out, 0.0)

    return jax.vmap(one)(rois)


# ---------------------------------------------------------------------------
# One-pass disjoint-segment decomposition (BENCH_NOTES round-2 item) —
# MEASURED NEGATIVE RESULT, kept for the record like the table/Pallas
# variants.
#
# The masked reduction reads the feature map P times per axis (once per
# output bin). The reference's bins are NEARLY disjoint: bin p covers
# [floor(p*b), ceil((p+1)*b)) and overlaps its left neighbour by at most the
# single voxel floor(p*b). Assigning every voxel to exactly ONE segment
# (seg(v) = floor((v-lo)*P/size), exact in integer arithmetic for the
# reference's float bin math because P is a power of two) gives
#     bin_max[p] = max(segment_max[p], feat[bin_start_p])
# — one segment-max pass plus P gathered boundary rows per axis. On v5e
# (tools/bench_roi_pool.py) this is 3.3x SLOWER than the masked reduction
# (7.7 vs 2.3 ms / 200 rois): vmapped segment_max lowers to batched
# scatter-max, which serializes, while the P "redundant" masked passes are
# fused streaming reads. The op is VPU-bound, not bandwidth-bound (same
# conclusion as the Pallas experiment).
# ---------------------------------------------------------------------------


def _axis_seg_pool(feat, axis, lo, hi, pooled, extent):
    """One-pass per-axis pooling: (..., extent, ...) -> (..., pooled, ...).

    Returns (pooled_feat with `axis` replaced by P bins, nonempty (P,))."""
    size = jnp.maximum(hi - lo, 1)
    v = jnp.arange(extent)
    valid = (v >= lo) & (v < hi)
    seg = jnp.where(valid, (v - lo) * pooled // size, pooled)  # P = dropped
    moved = jnp.moveaxis(feat, axis, 0)
    seg_max = jax.ops.segment_max(
        moved, seg, num_segments=pooled + 1, indices_are_sorted=True
    )[:pooled]
    # boundary fixup: bin p always contains its (clipped) start voxel, which
    # may belong to segment p-1
    p = jnp.arange(pooled, dtype=jnp.float32)
    bin_size = size.astype(jnp.float32) / pooled
    start = jnp.clip(jnp.floor(p * bin_size).astype(jnp.int32) + lo, 0, extent)
    end = jnp.clip(jnp.ceil((p + 1) * bin_size).astype(jnp.int32) + lo, 0, extent)
    ok = end > start  # reference empty-bin rule (_axis_masks)
    out = jnp.maximum(seg_max, moved[jnp.minimum(start, extent - 1)])
    return jnp.moveaxis(out, 0, axis), ok


def _pool_one_segmented(feat, roi, pooled, spatial_scale):
    """One-pass variant of :func:`_pool_one` (identical outputs)."""
    w, h, l, _ = feat.shape
    lo = jnp.floor(roi[:3] * spatial_scale).astype(jnp.int32)
    hi = jnp.ceil(roi[3:6] * spatial_scale).astype(jnp.int32)
    fx, okx = _axis_seg_pool(feat, 0, lo[0], hi[0], pooled, w)
    fy, oky = _axis_seg_pool(fx, 1, lo[1], hi[1], pooled, h)
    fz, okz = _axis_seg_pool(fy, 2, lo[2], hi[2], pooled, l)
    ok = okx[:, None, None] & oky[None, :, None] & okz[None, None, :]
    return jnp.where(ok[..., None], fz, 0.0)


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale"))
def roi_pool3d_segmented(feat, rois, pooled: int, spatial_scale: float):
    return jax.vmap(lambda r: _pool_one_segmented(feat, r, pooled, spatial_scale))(
        rois
    )


# ---------------------------------------------------------------------------
# Production path (round 4): shared ALL-INTERVAL max table on the first axis.
#
# Round-3 profiling (tools/device_profile.py --batch 32) showed the pipeline
# spends 59% of device time in the RoI pool, and 44% in the FIRST axis-wise
# masked reduce alone: its cost is P x W x (H*L*C) select+max VPU ops PER ROI
# PER LEVEL (two identical 16.6 ms fusions at batch 32), because every bin
# re-streams the full feature extent. But all R rois share the feature map,
# and W is small (stride-4 features: W=24 for 96-voxel chunks), so interval
# maxima along the first axis can be precomputed ONCE per map — each roi's
# x-bins then become contiguous-row gathers of (H*L*C) rows (DMA-friendly,
# unlike the 2D corner table above whose (L*C) rows are too small). The
# y/z reductions run on the (P, H, L, C) gathered intermediate and stay
# masked (they are 4.5x cheaper than stage 1 combined).
#
# Two r5 rewrites of this path were MEASURED LOSERS and reverted (profiles
# in BENCH_NOTES "Round-5 chunk tail"):
#
# - sparse RMQ table, two query gathers max'd per bin: 53.8 -> 78.7 ms/iter
#   — the second gather + explicit max break the gather->y-reduce fusion
#   and materialize twice. ONE gather per bin is the law here.
# - same table built from binary-doubling sparse levels (by-length rows,
#   parallel elementwise maxes, no cummax chains): 53.8 -> 57.9 ms/iter —
#   the 2x24-piece concatenates materialize as 2.1 ms copies per level,
#   while the cummax build below was ALREADY cheap (fused; the two 4.2 ms
#   ops r4 attributed to the builds are actually the query gathers, which
#   run at ~18 GB/s and are unchanged by any build rewrite).
# ---------------------------------------------------------------------------


def _build_interval_table(feat):
    """T[tri(s, e)] = max over feat[s:e] along axis 0, all 0 <= s < e <= W.

    Triangular row layout: rows for start s occupy
    [offset(s), offset(s) + W - s), ordered by end; offset(s) =
    s*W - s*(s-1)/2. Row tri(s, e) = offset(s) + (e - s - 1).
    """
    w = feat.shape[0]
    rows = [jax.lax.cummax(feat[s:], axis=0) for s in range(w)]
    return jnp.concatenate(rows, axis=0)


def _interval_offsets(w):
    return np.concatenate(
        [[0], np.cumsum(np.arange(w, 0, -1))]
    ).astype(np.int32)


def _interval_table_rows(w):
    """Row count of the all-interval table for a W-wide axis."""
    return w * (w + 1) // 2


# all-interval table memory is W*(W+1)/2 * H*L*C; cap the element count at
# ~8x the 24x12x24x128 chunk-feature case so degenerate single-shot shapes
# (e.g. 60x12x60 scene features -> 337 MB/map) fall back to the masked path
_INTERVAL_TABLE_MAX_ELEMS = 96_000_000


def _pool_rois_interval(feat, rois, pooled, spatial_scale):
    w, h, l, c = feat.shape
    table = _build_interval_table(feat)
    offs = jnp.asarray(_interval_offsets(w))

    def one(roi):
        lo = jnp.floor(roi[:3] * spatial_scale).astype(jnp.int32)
        hi = jnp.ceil(roi[3:6] * spatial_scale).astype(jnp.int32)
        sx, ex = _axis_bins(lo[0], hi[0], pooled, w)
        okx = ex > sx
        idx = offs[jnp.clip(sx, 0, w - 1)] + jnp.maximum(ex - sx - 1, 0)
        idx = jnp.clip(idx, 0, table.shape[0] - 1)  # empty bins: any row
        fx = table[idx]  # (P, H, L, C)

        my, oky = _axis_masks(lo[1], hi[1], pooled, h)
        mz, okz = _axis_masks(lo[2], hi[2], pooled, l)
        fy = jnp.where(my[None, :, :, None, None], fx[:, None], _NEG).max(axis=2)
        fz = jnp.where(mz[None, None, :, :, None], fy[:, :, None], _NEG).max(axis=3)
        ok = okx[:, None, None] & oky[None, :, None] & okz[None, None, :]
        return jnp.where(ok[..., None], fz, 0.0)

    return jax.vmap(one)(rois)


def _roi_pool3d_masked(feat, rois, pooled, spatial_scale):
    return jax.vmap(lambda r: _pool_one(feat, r, pooled, spatial_scale))(rois)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _roi_pool3d_prod(feat, rois, pooled, spatial_scale):
    w, h, l, c = feat.shape
    if _interval_table_rows(w) * h * l * c > _INTERVAL_TABLE_MAX_ELEMS:
        return _roi_pool3d_masked(feat, rois, pooled, spatial_scale)
    return _pool_rois_interval(feat, rois, pooled, spatial_scale)


def _roi_pool3d_prod_fwd(feat, rois, pooled, spatial_scale):
    return _roi_pool3d_prod(feat, rois, pooled, spatial_scale), (feat, rois)


def _roi_pool3d_prod_bwd(pooled, spatial_scale, res, g):
    # backward = the masked formulation's VJP (the interval table and the
    # masked reduce compute the SAME function; any shared subgradient is
    # valid, and the masked one avoids differentiating through the table
    # build's W cummax chains, whose residuals scale with the table). rois
    # reach the output only through floor/ceil -> zero gradient, as in the
    # reference (proposals are detached, network.py:560-575).
    feat, rois = res
    _, vjp = jax.vjp(
        lambda f: _roi_pool3d_masked(f, rois, pooled, spatial_scale), feat
    )
    return vjp(g)[0], jnp.zeros_like(rois)


_roi_pool3d_prod.defvjp(_roi_pool3d_prod_fwd, _roi_pool3d_prod_bwd)


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale"))
def roi_pool3d(feat, rois, pooled: int, spatial_scale: float):
    """feat: (W, H, L, C) single sample; rois: (R, 6) -> (R, P, P, P, C).

    Production path = shared all-interval max table on the first axis +
    masked separable reductions on y/z (see the design note above). Falls
    back to the pure masked reduction when the table would not fit the
    element cap. Pool in bf16 when the pipeline is bf16 — comparisons are
    exact, traffic halves.
    """
    return _roi_pool3d_prod(feat, rois, pooled, spatial_scale)


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scales"))
def roi_pool3d_multilevel(feats, rois, level_inds, pooled: int, spatial_scales):
    """Multi-level dispatch (reference ``network.py:503-534``).

    feats: tuple of (W, H, L, C) feature maps (one per level, 1-indexed);
    level_inds: (R,) int level of each roi. Every roi is pooled on every
    level and the right one is selected — branch-free and fixed-shape.
    Measured alternative (tools/bench_roi_pool.py, v5e): gathering each
    roi's OWN level from a stacked feature array and pooling once is 2x
    SLOWER (6.2 vs 3.0 ms / 200 rois, f32) — the per-roi full-feature-map
    gather costs more than the second pool, which XLA streams.
    """
    pooled_all = [
        roi_pool3d(f, rois, pooled, s) for f, s in zip(feats, spatial_scales)
    ]
    out = pooled_all[0]
    for lvl in range(1, len(pooled_all)):
        sel = (level_inds == (lvl + 1))[:, None, None, None, None]
        out = jnp.where(sel, pooled_all[lvl], out)
    return out
