"""Fixed-shape 3D NMS as an XLA program.

Replaces the reference's CUDA bitmask kernel + host keep-scan
(``lib/layer_utils/nms/src/cuda/nms_kernel.cu:11-94``,
``nms/src/nms_cuda.c:10-67``) and its CPU oracle
(``nms/pth_nms.py:7-45``). Semantics are identical (+1-extent IoU, greedy
keep in input order == descending-score order), but the TPU design is
different: no dynamic output — the full (N, N) IoU matrix is computed on the
VPU/MXU in one shot, then a length-N `lax.fori_loop` resolves the sequential
keep dependency with O(N) vector work per step. N is a static bound
(RPN_PRE_NMS_TOP_N), invalid rows are masked out, and the result is a boolean
keep mask so downstream stays fixed-shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dsis.geometry.boxes import nms_overlap


def nms_mask_scan(boxes, thresh, valid=None):
    """Greedy NMS keep mask via a length-N sequential keep scan.

    Simple and exact; superseded by :func:`nms_mask` (tiled, far fewer
    sequential steps) but kept as the readable oracle-style implementation.
    """
    n = boxes.shape[0]
    ov = nms_overlap(boxes, boxes)  # (N, N)
    # suppress[i, j]: an earlier kept i would suppress j
    sup = ov > thresh
    if valid is not None:
        sup = sup & valid[:, None] & valid[None, :]
    # j only suppressed by i < j
    idx = jnp.arange(n)
    earlier = idx[:, None] < idx[None, :]
    sup = sup & earlier

    def body(j, keep):
        # j is kept iff no earlier kept box suppresses it
        suppressed = jnp.any(keep & sup[:, j])
        return keep.at[j].set(~suppressed)

    keep0 = jnp.zeros((n,), dtype=bool)
    keep = jax.lax.fori_loop(0, n, body, keep0)
    if valid is not None:
        keep = keep & valid
    return keep


def _self_suppress_tile(sup_tri, init_suppressed):
    """Exact greedy keep within one tile given already-suppressed rows.

    sup_tri: (B, B) bool, strict upper-triangular 'i would suppress j'.

    The greedy keep vector is the unique fixpoint of the ANTITONE map
        g(keep)[j] = eligible[j] and not any_i(sup_tri[i, j] and keep[i]).
    Antitone maps admit a certified sandwich iteration: maintain bounds
    l <= fix <= u and update (l, u) <- (g(u), g(l)); the earliest undecided
    index always has a fully decided prefix, so >= 1 new prefix element is
    certified per round (exact in <= B rounds, typically a handful).
    Returns the suppressed mask (~keep among eligible).
    """
    eligible = ~init_suppressed

    def g(keep):
        return eligible & ~jnp.any(sup_tri & keep[:, None], axis=0)

    def cond(state):
        l, u = state
        return jnp.any(l != u)

    def body(state):
        l, u = state
        return g(u), g(l)

    l0 = jnp.zeros_like(eligible)
    u0 = eligible
    l, u = jax.lax.while_loop(cond, body, (g(u0), g(l0)))
    return ~l


def nms_mask(boxes, thresh, valid=None, tile: int = 128, classes=None):
    """Greedy NMS keep mask — tiled exact algorithm.

    Identical output to the sequential scan (and the reference CUDA+host
    greedy NMS), but the sequential depth drops from N to
    O(N/B * (N/B + log B)): cross-tile suppression is a batched matrix test
    against previously-resolved tiles; within-tile resolution uses the
    monotone fixpoint iteration (the same idea as TF's padded NMS kernel).

    Args:
      boxes: (N, 6) corner boxes sorted by descending score.
      thresh: IoU suppression threshold.
      valid: optional (N,) bool; invalid boxes are never kept and never
        suppress anything.
      tile: static tile size.
      classes: optional (N,) int; when given, suppression only acts between
        boxes of the same class (class-aware NMS, used by scene stitching —
        IoU stays computed on the raw boxes so it is numerically identical
        to per-class NMS, unlike the coordinate-offset trick).
    """
    n = boxes.shape[0]
    if n <= tile:
        ntiles = 1
        b = n
        pad = 0
    else:
        b = tile
        ntiles = -(-n // b)
        pad = ntiles * b - n
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.full((pad, 6), -1e8, boxes.dtype)], 0
        )
        if valid is None:
            valid = jnp.arange(n + pad) < n
        else:
            valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        if classes is not None:
            classes = jnp.concatenate(
                [classes, jnp.full((pad,), -1, classes.dtype)]
            )
    if valid is None:
        valid = jnp.ones((n,), bool)

    tiles = boxes.reshape(ntiles, b, 6)
    valid_t = valid.reshape(ntiles, b)
    cls_t = classes.reshape(ntiles, b) if classes is not None else None
    keeps = []
    for ti in range(ntiles):
        cur = tiles[ti]
        cross = jnp.zeros((b,), bool)
        for tj in range(ti):
            ov = nms_overlap(tiles[tj], cur)  # (B, B)
            sup = ov > thresh
            if cls_t is not None:
                sup = sup & (cls_t[tj][:, None] == cls_t[ti][None, :])
            cross = cross | jnp.any(keeps[tj][:, None] & sup, axis=0)
        ov_self = nms_overlap(cur, cur) > thresh
        if cls_t is not None:
            ov_self = ov_self & (cls_t[ti][:, None] == cls_t[ti][None, :])
        idx = jnp.arange(b)
        tri = ov_self & (idx[:, None] < idx[None, :])
        tri = tri & valid_t[ti][:, None] & valid_t[ti][None, :]
        suppressed = _self_suppress_tile(tri, cross | ~valid_t[ti])
        keeps.append(~suppressed & valid_t[ti])
    keep = jnp.concatenate(keeps)[:n]
    return keep


@functools.partial(jax.jit, static_argnames=("post_nms_top_n",))
def nms_keep_indices(boxes, thresh, post_nms_top_n, valid=None, classes=None):
    """Keep mask -> fixed-size index list of the first `post_nms_top_n` kept.

    Returns (indices (K,), kept_valid (K,) bool). Indices of unfilled slots
    point at the last box (callers must apply kept_valid).
    """
    keep = nms_mask(boxes, thresh, valid, classes=classes)
    n = boxes.shape[0]
    # stable order of kept indices: position among kept = cumsum-1
    rank = jnp.cumsum(keep) - 1
    k = post_nms_top_n
    indices = jnp.full((k,), n - 1, dtype=jnp.int32)
    src = jnp.arange(n, dtype=jnp.int32)
    # scatter kept index i into slot rank[i] when rank < k
    slot = jnp.where(keep & (rank < k), rank, k)  # k = dropped bucket
    indices = jnp.zeros((k + 1,), jnp.int32).at[slot].set(src, mode="drop")[:k]
    num_kept = jnp.sum(keep)
    kept_valid = jnp.arange(k) < jnp.minimum(num_kept, k)
    indices = jnp.where(kept_valid, indices, n - 1)
    return indices, kept_valid
