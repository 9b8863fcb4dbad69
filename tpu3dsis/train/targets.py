"""Jittable target assignment: anchor / proposal / mask targets.

The reference computes these on the host in numpy every step
(``lib/layer_utils/anchor_target_layer.py``, ``proposal_target_layer.py``,
``mask_target_layer.py``), forcing a device->host->device round trip per
iteration (network.py:606-655). Here they are fixed-shape XLA programs that
run inside the jitted train step:

  - index-list filters become boolean masks,
  - ``np.random.choice`` subsampling becomes random-ranked top-k selection
    with identical marginal statistics (uniform without replacement),
  - ragged fg/bg sets become fixed-capacity rows with validity masks.

gt boxes arrive padded to (MAX_GT, 7) with a validity mask (see
``tpu3dsis.io.dataset.pad_sample``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsis.geometry.boxes import bbox_overlap, bbox_transform

BIG = 1e9
# classes whose thin dimension is inflated for level-3 anchor matching
# (anchor_target_layer.py:182: {sofa=6... } mapped consecutive ids)
_LEVEL3_THIN_CLASSES = (6, 7, 9, 12, 18)


def _rank_select(key, member_mask, quota):
    """Uniformly select min(quota, count) members of a masked set.

    Returns a bool mask of the selected members. Equivalent in distribution to
    ``np.random.choice(replace=False)`` (anchor_target_layer.py:262/269).
    """
    n = member_mask.shape[0]
    r = jax.random.uniform(key, (n,))
    scores = jnp.where(member_mask, r, -1.0)
    # rank among members by descending random score
    order = jnp.argsort(-scores)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return member_mask & (rank < quota)


def _masked_argmax_overlaps(anchors, gt_box, gt_valid):
    """IoU vs valid gt only -> (max_overlap (N,), argmax (N,))."""
    ov = bbox_overlap(anchors, gt_box[:, :6])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    return jnp.max(ov, axis=1), jnp.argmax(ov, axis=1)


def _inflate_gt_for_level3(gt_box):
    """Level-3 thin-box inflation (anchor_target_layer.py:175-203).

    Thin classes get +-2 voxels along their thinnest dim; all other classes
    are y-degenerated (miny+100 / maxy-100) so they can't match level-3
    anchors. Pure function of the padded gt array.
    """
    label = gt_box[:, 6].astype(jnp.int32)
    is_thin = jnp.zeros(label.shape, bool)
    for c in _LEVEL3_THIN_CLASSES:
        is_thin = is_thin | (label == c)
    sz = gt_box[:, 3:6] - gt_box[:, :3]
    thinnest = jnp.argmin(sz, axis=1)  # ties: x<=y<=z order matches reference
    delta_lo = jnp.zeros_like(gt_box[:, :3]).at[
        jnp.arange(label.shape[0]), thinnest
    ].set(-2.0)
    delta_hi = -delta_lo
    inflated = jnp.concatenate(
        [gt_box[:, :3] + delta_lo, gt_box[:, 3:6] + delta_hi, gt_box[:, 6:]], 1
    )
    squash = jnp.concatenate(
        [
            gt_box[:, 0:1],
            gt_box[:, 1:2] + 100.0,
            gt_box[:, 2:3],
            gt_box[:, 3:4],
            gt_box[:, 4:5] - 100.0,
            gt_box[:, 5:6],
            gt_box[:, 6:],
        ],
        1,
    )
    return jnp.where(is_thin[:, None], inflated, squash)


def anchor_targets(
    key,
    level_anchor_arrays: dict,
    level_inside_masks: dict,
    gt_box,
    gt_valid,
    rpn_batchsize: int,
    rpn_fg_fraction: float,
    pos_overlap: float,
    neg_overlap: float,
):
    """Per-level RPN training targets for one sample.

    level_anchor_arrays: {lvl: (N_l, 6)}; level_inside_masks: {lvl: (N_l,) bool}.
    Returns {lvl: dict(labels (N_l,) int32 in {-1,0,1}, bbox_targets (N_l,6),
    inside_w (N_l,6), outside_w (N_l,6))}.

    Parity notes vs ``anchor_target_layer.py:96-366``: labels computed on
    inside anchors only (outside filled -1); fg/bg subsampling is JOINT across
    levels; outside weights normalize by the PER-LEVEL positive count.
    """
    levels = sorted(level_anchor_arrays.keys())
    labels_per_level = {}
    argmax_per_level = {}
    for lvl in levels:
        anchors = level_anchor_arrays[lvl]
        inside = level_inside_masks[lvl]
        gt = _inflate_gt_for_level3(gt_box) if lvl == 3 else gt_box
        max_ov, argmax = _masked_argmax_overlaps(anchors, gt, gt_valid)
        labels = jnp.full(anchors.shape[0], -1, jnp.int32)
        labels = jnp.where(max_ov >= pos_overlap, 1, labels)
        labels = jnp.where(max_ov < neg_overlap, 0, labels)
        labels = jnp.where(inside, labels, -1)
        labels_per_level[lvl] = labels
        argmax_per_level[lvl] = argmax

    # --- joint subsampling (anchor_target_layer.py:252-270) ---
    all_labels = jnp.concatenate([labels_per_level[l] for l in levels])
    num_fg_quota = int(rpn_fg_fraction * rpn_batchsize)
    k1, k2 = jax.random.split(key)
    fg = all_labels == 1
    fg_keep = _rank_select(k1, fg, num_fg_quota)
    all_labels = jnp.where(fg & ~fg_keep, -1, all_labels)
    num_bg_quota = rpn_batchsize - jnp.sum(all_labels == 1)
    bg = all_labels == 0
    bg_keep = _rank_select(k2, bg, num_bg_quota)
    all_labels = jnp.where(bg & ~bg_keep, -1, all_labels)

    out = {}
    off = 0
    for lvl in levels:
        anchors = level_anchor_arrays[lvl]
        n = anchors.shape[0]
        labels = jax.lax.dynamic_slice_in_dim(all_labels, off, n)
        off += n
        targets = bbox_transform(
            anchors, gt_box[argmax_per_level[lvl], :6]
        )
        pos = labels == 1
        inside_w = jnp.where(pos[:, None], 1.0, 0.0) * jnp.ones((1, 6))
        npos = jnp.maximum(jnp.sum(pos), 1)
        outside_w = jnp.where(pos[:, None], 1.0 / npos, 0.0) * jnp.ones((1, 6))
        out[lvl] = {
            "labels": labels,
            "bbox_targets": jnp.where(
                level_inside_masks[lvl][:, None], targets, 0.0
            ),
            "inside_w": inside_w,
            "outside_w": outside_w,
        }
    return out


def proposal_targets(
    key,
    rois,
    roi_valid,
    level_inds,
    gt_box,
    gt_valid,
    num_classes: int,
    class_batch_size: int,
    fg_fraction: float,
    fg_thresh: float,
    bg_thresh: float,
    bg_thresh_lo: float,
    use_gt: bool = True,
):
    """Sample CLASS_BATCH_SIZE rois with labels + per-class regression targets.

    Parity: ``proposal_target_layer.py:13-171``. gt injection uses level 1 if
    all dims <= 20 else level 2 (proposal_target_layer.py:38-49). Rows are
    fixed: the first `num_fg` rows are foreground. Insufficient pools cycle
    (the reference resamples with replacement).
    Returns dict(rois (B,6), labels (B,), level_inds (B,), bbox_targets
    (B,6C), inside_w, outside_w, valid (B,)).
    """
    if use_gt:
        dims = gt_box[:, 3:6] - gt_box[:, :3]
        small = jnp.all(dims <= 20.0, axis=1)
        gt_levels = jnp.where(small, 1.0, 2.0)
        rois = jnp.concatenate([rois, gt_box[:, :6]], 0)
        level_inds = jnp.concatenate([level_inds, gt_levels], 0)
        roi_valid = jnp.concatenate([roi_valid, gt_valid], 0)

    ov = bbox_overlap(rois, gt_box[:, :6])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    max_ov = jnp.max(ov, axis=1)
    assignment = jnp.argmax(ov, axis=1)
    roi_labels = gt_box[assignment, 6]

    fg = roi_valid & (max_ov >= fg_thresh)
    bg = roi_valid & (max_ov < bg_thresh) & (max_ov >= bg_thresh_lo)
    fg_count = jnp.sum(fg)
    bg_count = jnp.sum(bg)

    quota_fg = int(round(fg_fraction * class_batch_size))
    # reference case analysis (proposal_target_layer.py:95-124): if bg empty,
    # fill everything with fg (resampled); if fg empty, everything bg.
    num_fg = jnp.where(
        bg_count > 0,
        jnp.minimum(quota_fg, fg_count),
        jnp.where(fg_count > 0, class_batch_size, 0),
    )

    k1, k2 = jax.random.split(key)
    n = rois.shape[0]

    def ranked_indices(kk, member):
        r = jax.random.uniform(kk, (n,))
        scores = jnp.where(member, r, -1.0)
        return jnp.argsort(-scores)  # members first, random order

    fg_ranked = ranked_indices(k1, fg)
    bg_ranked = ranked_indices(k2, bg)

    b = class_batch_size
    row = jnp.arange(b)
    is_fg_row = row < num_fg
    # cycle within the member pool when quota exceeds pool size
    fg_idx = fg_ranked[row % jnp.maximum(fg_count, 1)]
    bg_row = row - num_fg
    bg_idx = bg_ranked[bg_row % jnp.maximum(bg_count, 1)]
    keep = jnp.where(is_fg_row, fg_idx, bg_idx)

    out_rois = rois[keep]
    out_levels = level_inds[keep]
    labels = jnp.where(is_fg_row, roi_labels[keep], 0.0).astype(jnp.int32)
    valid = jnp.where(is_fg_row, fg_count > 0, bg_count > 0)
    # degenerate fallback (reference line 118-124: no fg and no in-window bg
    # -> sample from plain < BG_THRESH)
    valid = valid | (roi_valid[keep])

    targets6 = bbox_transform(out_rois, gt_box[assignment[keep], :6])
    cls = labels
    onehot = jax.nn.one_hot(cls, num_classes, dtype=targets6.dtype)
    # (B, C, 6) -> (B, 6C) with class-major blocks (6*cls + d layout,
    # proposal_target_layer.py:161-164)
    bbox_targets = (onehot[:, :, None] * targets6[:, None, :]).reshape(b, -1)
    inside_w = jnp.broadcast_to(
        (onehot * (cls > 0)[:, None])[:, :, None], (b, num_classes, 6)
    ).reshape(b, -1)
    outside_w = (inside_w > 0).astype(targets6.dtype)

    return {
        "rois": out_rois,
        "labels": labels,
        "level_inds": out_levels,
        "bbox_targets": bbox_targets,
        "inside_w": inside_w,
        "outside_w": outside_w,
        "valid": valid,
    }


def mask_targets(
    rois,
    roi_valid,
    gt_box,
    gt_valid,
    mask_fg_thresh: float,
    max_mask_rois: int,
):
    """Select mask-training rois (>= MASK_FG_THRESH IoU vs gt) + labels.

    Parity: ``mask_target_layer.py:10-50`` — the candidate set is the
    proposals PLUS all gt boxes; the reference keeps every fg roi, here the
    first `max_mask_rois` (in candidate order) are kept.
    Returns dict(rois (M,6) rounded ints as float, labels (M,), valid (M,)).
    The actual mask crop happens in the loss (one shared painted canvas).
    """
    cand = jnp.concatenate([rois, gt_box[:, :6]], 0)
    cand_valid = jnp.concatenate([roi_valid, gt_valid], 0)
    ov = bbox_overlap(cand, gt_box[:, :6])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    max_ov = jnp.max(ov, axis=1)
    assignment = jnp.argmax(ov, axis=1)
    fg = cand_valid & (max_ov >= mask_fg_thresh)

    # first M fg in order
    rank = jnp.cumsum(fg) - 1
    m = max_mask_rois
    slot = jnp.where(fg & (rank < m), rank, m)
    src = jnp.arange(cand.shape[0], dtype=jnp.int32)
    gather = jnp.zeros((m + 1,), jnp.int32).at[slot].set(src, mode="drop")[:m]
    valid = jnp.arange(m) < jnp.minimum(jnp.sum(fg), m)
    gather = jnp.where(valid, gather, 0)

    sel_rois = jnp.round(cand[gather])
    labels = gt_box[assignment[gather], 6].astype(jnp.int32)
    return {"rois": sel_rois, "labels": labels, "valid": valid}
