"""3D axis-aligned box math — jit-friendly jnp ports of the reference formulas.

Boxes are corner-format ``(minx, miny, minz, maxx, maxy, maxz)`` float arrays.
Two IoU conventions exist in the reference and BOTH are preserved because mAP
parity depends on it:

  - ``bbox_overlap``: plain extents (``lib/utils/overlap.py:5-25``) — used by
    anchor/proposal/mask target assignment and mAP.
  - ``nms_overlap``: +1 extents (``lib/layer_utils/nms/pth_nms.py:7-45`` and
    ``nms/src/cuda/nms_kernel.cu:11-33``) — used only inside NMS.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(anchor_rois, gt_rois):
    """Encode gt boxes against anchors (center/log-size deltas).

    Port of ``lib/utils/bbox_transform.py:24-57`` including its exact epsilon
    placement (1e-14 inside the log argument AND on the denominators).
    """
    aw = anchor_rois[:, 3] - anchor_rois[:, 0]
    ah = anchor_rois[:, 4] - anchor_rois[:, 1]
    al = anchor_rois[:, 5] - anchor_rois[:, 2]
    acx = anchor_rois[:, 0] + 0.5 * aw
    acy = anchor_rois[:, 1] + 0.5 * ah
    acz = anchor_rois[:, 2] + 0.5 * al

    gw = gt_rois[:, 3] - gt_rois[:, 0]
    gh = gt_rois[:, 4] - gt_rois[:, 1]
    gl = gt_rois[:, 5] - gt_rois[:, 2]
    gcx = gt_rois[:, 0] + 0.5 * gw
    gcy = gt_rois[:, 1] + 0.5 * gh
    gcz = gt_rois[:, 2] + 0.5 * gl

    dx = (gcx - acx) / (aw + 1e-14)
    dy = (gcy - acy) / (ah + 1e-14)
    dz = (gcz - acz) / (al + 1e-14)
    dw = jnp.log(gw / (aw + 1e-14) + 1e-14)
    dh = jnp.log(gh / (ah + 1e-14) + 1e-14)
    dl = jnp.log(gl / (al + 1e-14) + 1e-14)

    return jnp.stack([dx, dy, dz, dw, dh, dl], axis=1)


def bbox_transform_inv(boxes, deltas):
    """Decode deltas against boxes; supports per-class stride-6 delta blocks.

    Port of ``lib/utils/bbox_transform.py:59-99``. ``deltas`` is (N, 6*K);
    returns (N, 6*K) with the same interleaving (all minx for K classes first,
    matching the reference's column-concat order).
    """
    w = boxes[:, 3] - boxes[:, 0]
    h = boxes[:, 4] - boxes[:, 1]
    l = boxes[:, 5] - boxes[:, 2]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    cz = boxes[:, 2] + 0.5 * l

    dx = deltas[:, 0::6]
    dy = deltas[:, 1::6]
    dz = deltas[:, 2::6]
    dw = deltas[:, 3::6]
    dh = deltas[:, 4::6]
    dl = deltas[:, 5::6]

    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pcz = dz * l[:, None] + cz[:, None]
    pw = jnp.exp(dw) * w[:, None]
    ph = jnp.exp(dh) * h[:, None]
    pl = jnp.exp(dl) * l[:, None]

    return jnp.concatenate(
        [
            pcx - 0.5 * pw,
            pcy - 0.5 * ph,
            pcz - 0.5 * pl,
            pcx + 0.5 * pw,
            pcy + 0.5 * ph,
            pcz + 0.5 * pl,
        ],
        axis=1,
    )


def clip_boxes(boxes, scene_shape):
    """Clamp corner boxes to [0, scene_shape] (``bbox_transform.py:4-21``)."""
    sx, sy, sz = scene_shape[0], scene_shape[1], scene_shape[2]
    return jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, sx),
            jnp.clip(boxes[:, 1], 0, sy),
            jnp.clip(boxes[:, 2], 0, sz),
            jnp.clip(boxes[:, 3], 0, sx),
            jnp.clip(boxes[:, 4], 0, sy),
            jnp.clip(boxes[:, 5], 0, sz),
        ],
        axis=1,
    )


def bbox_overlap(boxes, query_boxes):
    """(N, K) 3D IoU, plain extents (``lib/utils/overlap.py:5-25``)."""
    va = (
        (boxes[:, 3] - boxes[:, 0])
        * (boxes[:, 4] - boxes[:, 1])
        * (boxes[:, 5] - boxes[:, 2])
    )
    vb = (
        (query_boxes[:, 3] - query_boxes[:, 0])
        * (query_boxes[:, 4] - query_boxes[:, 1])
        * (query_boxes[:, 5] - query_boxes[:, 2])
    )
    iw = jnp.clip(
        jnp.minimum(boxes[:, 3:4], query_boxes[None, :, 3])
        - jnp.maximum(boxes[:, 0:1], query_boxes[None, :, 0]),
        0,
    )
    ih = jnp.clip(
        jnp.minimum(boxes[:, 4:5], query_boxes[None, :, 4])
        - jnp.maximum(boxes[:, 1:2], query_boxes[None, :, 1]),
        0,
    )
    il = jnp.clip(
        jnp.minimum(boxes[:, 5:6], query_boxes[None, :, 5])
        - jnp.maximum(boxes[:, 2:3], query_boxes[None, :, 2]),
        0,
    )
    inter = iw * ih * il
    union = va[:, None] + vb[None, :] - inter
    return inter / union


def nms_overlap(boxes, query_boxes):
    """(N, K) 3D IoU with the NMS +1-extent convention.

    Matches ``cpu_nms`` (``nms/pth_nms.py:7-45``): volumes and intersections
    use (max - min + 1).
    """
    va = (
        (boxes[:, 3] - boxes[:, 0] + 1)
        * (boxes[:, 4] - boxes[:, 1] + 1)
        * (boxes[:, 5] - boxes[:, 2] + 1)
    )
    vb = (
        (query_boxes[:, 3] - query_boxes[:, 0] + 1)
        * (query_boxes[:, 4] - query_boxes[:, 1] + 1)
        * (query_boxes[:, 5] - query_boxes[:, 2] + 1)
    )
    iw = jnp.clip(
        jnp.minimum(boxes[:, 3:4], query_boxes[None, :, 3])
        - jnp.maximum(boxes[:, 0:1], query_boxes[None, :, 0])
        + 1,
        0,
    )
    ih = jnp.clip(
        jnp.minimum(boxes[:, 4:5], query_boxes[None, :, 4])
        - jnp.maximum(boxes[:, 1:2], query_boxes[None, :, 1])
        + 1,
        0,
    )
    il = jnp.clip(
        jnp.minimum(boxes[:, 5:6], query_boxes[None, :, 5])
        - jnp.maximum(boxes[:, 2:3], query_boxes[None, :, 2])
        + 1,
        0,
    )
    inter = iw * ih * il
    union = va[:, None] + vb[None, :] - inter
    return inter / union
