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


def nms_mask(boxes, thresh, valid=None):
    """Greedy NMS keep mask.

    Args:
      boxes: (N, 6) corner boxes sorted by descending score.
      thresh: IoU suppression threshold (static or traced scalar).
      valid: optional (N,) bool; invalid boxes are never kept and never
        suppress anything (used to pad to a static N).

    Returns:
      (N,) bool keep mask.
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


@functools.partial(jax.jit, static_argnames=("post_nms_top_n",))
def nms_keep_indices(boxes, thresh, post_nms_top_n, valid=None):
    """Keep mask -> fixed-size index list of the first `post_nms_top_n` kept.

    Returns (indices (K,), kept_valid (K,) bool). Indices of unfilled slots
    point at the last box (callers must apply kept_valid).
    """
    keep = nms_mask(boxes, thresh, valid)
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
