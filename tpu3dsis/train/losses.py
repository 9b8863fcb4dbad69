"""Loss assembly — jittable port of ``Network._add_losses``.

Parity targets (reference ``lib/nets/network.py:319-501``):
  - per-level RPN cross entropy over sampled anchors (labels != -1), mean
  - per-level RPN smooth-L1 box loss, sigma=2, summed (batch=1 mean)
  - class cross entropy with per-class weights (torch weighted-mean
    semantics: divide by the sum of selected weights)
  - per-class box smooth-L1, sigma=1, summed over columns, mean over rois
  - mask BCE-with-logits per fg roi, mean over crop voxels, class-weighted,
    divided by the count of nonzero-weight rois

The reference gathers selected anchors with a python loop (network.py:337-344,
a per-step host hotspot); here selection is a weight mask so the whole loss is
one fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred, target, inside_w, outside_w, sigma):
    """Reference ``_smooth_l1_loss`` elementwise core (network.py:485-501)."""
    sigma2 = sigma * sigma
    diff = inside_w * (pred - target)
    abs_diff = jnp.abs(diff)
    flag = (abs_diff < 1.0 / sigma2).astype(pred.dtype)
    per_elem = flag * 0.5 * sigma2 * diff * diff + (1.0 - flag) * (
        abs_diff - 0.5 / sigma2
    )
    return outside_w * per_elem


def rpn_level_losses(cls_score, bbox_pred, targets, sigma=2.0):
    """One RPN level for one sample.

    cls_score: (1, W, H, L, 2, A); bbox_pred: (1, W, H, L, 6A);
    targets: dict from anchor_targets (flat (N,) / (N,6) site-major A-minor).
    """
    labels = targets["labels"]
    n = labels.shape[0]
    # (W,H,L,2,A) -> (W,H,L,A,2) -> (N,2): aligns with flat anchor order
    logits = jnp.moveaxis(cls_score[0], 3, 4).reshape(n, 2)
    sel = labels != -1
    safe_labels = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
    count = jnp.maximum(jnp.sum(sel), 1)
    rpn_ce = jnp.sum(jnp.where(sel, ce, 0.0)) / count

    pred6 = bbox_pred[0].reshape(n, 6)
    box_l = smooth_l1(
        pred6, targets["bbox_targets"], targets["inside_w"], targets["outside_w"],
        sigma,
    )
    rpn_box = jnp.sum(box_l)
    return rpn_ce, rpn_box


def class_losses(cls_score, bbox_pred, ptargets, class_weights):
    """RCNN class CE (weighted mean) + per-class box smooth-L1.

    cls_score (B, C), bbox_pred (B, 6C); ptargets from proposal_targets;
    class_weights: (C,) NORMALIZE_WEIGHTS.
    """
    labels = ptargets["labels"]
    w = class_weights[labels]
    logp = jax.nn.log_softmax(cls_score, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    cross_entropy = jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-12)

    box_l = smooth_l1(
        bbox_pred,
        ptargets["bbox_targets"],
        ptargets["inside_w"],
        ptargets["outside_w"],
        sigma=1.0,
    )
    loss_box = jnp.mean(jnp.sum(box_l, axis=1))
    return cross_entropy, loss_box


def mask_loss_windowed(mask_logits, mask_targets, own_masks, item_valid,
                       roi_idx, labels, roi_valid, class_weights, num_rois):
    """Mask BCE over a halo-window work queue — network.py:461-481 semantics.

    Each of the C work items covers the OWNED output segment of one window
    of one roi (ops/mask_windows.py); ownership segments of a roi partition
    its box, so segment-summing per-voxel BCE by ``roi_idx`` and dividing by
    the summed owned volume reproduces the reference's per-roi mean over the
    exact-size crop for rois of ANY size.

    mask_logits: (C, X, Y, Z, NC) masked-FCN window outputs; mask_targets:
    (C, X, Y, Z) gt crops (window coords); own_masks: (C, X, Y, Z) owned
    segments; labels/roi_valid: per-roi (M,); class_weights with weights[0]
    forced 0 (bg contributes nothing).
    """
    return mask_loss_window_groups(
        [(mask_logits, mask_targets, own_masks, item_valid, roi_idx)],
        labels, roi_valid, class_weights, num_rois,
    )


def mask_loss_window_groups(groups, labels, roi_valid, class_weights,
                            num_rois):
    """Mask BCE over several window work queues sharing one roi space.

    Each group is (mask_logits, mask_targets, own_masks, item_valid,
    roi_idx) with its OWN canvas shape; every roi's windows live entirely in
    one group (e.g. the small-canvas fast queue vs the large-canvas halo
    queue in ``trainstep``), so per-roi sums/counts accumulate across groups
    into the same (M,) segment space and the result is identical to a
    single queue holding all windows.
    """
    cw = class_weights.at[0].set(0.0)
    roi_sum = jnp.zeros((num_rois,), jnp.float32)
    roi_cnt = jnp.zeros((num_rois,), jnp.float32)
    for mask_logits, mask_targets, own_masks, item_valid, roi_idx in groups:
        lab_item = labels[roi_idx]
        logit = jnp.take_along_axis(
            mask_logits, lab_item[:, None, None, None, None], axis=4
        )[..., 0]
        target = mask_targets
        # numerically-stable BCE with logits
        bce = jnp.maximum(logit, 0) - logit * target + jnp.log1p(
            jnp.exp(-jnp.abs(logit))
        )
        w_own = own_masks * item_valid[:, None, None, None].astype(
            own_masks.dtype
        )
        item_sum = jnp.sum(bce * w_own, axis=(1, 2, 3))
        item_cnt = jnp.sum(w_own, axis=(1, 2, 3))
        roi_sum = roi_sum + jax.ops.segment_sum(
            item_sum, roi_idx, num_segments=num_rois
        )
        roi_cnt = roi_cnt + jax.ops.segment_sum(
            item_cnt, roi_idx, num_segments=num_rois
        )
    per_roi = roi_sum / jnp.maximum(roi_cnt, 1.0)
    w = cw[labels] * roi_valid.astype(cw.dtype)
    counter = jnp.sum((w != 0.0).astype(jnp.float32))
    total = jnp.sum(per_roi * w)
    return jnp.where(counter > 0, total / jnp.maximum(counter, 1.0), total)


def roi_region_mask(roi, shape):
    """(X, Y, Z) float mask of the voxels inside a rounded corner box."""
    x = jnp.arange(shape[0])[:, None, None]
    y = jnp.arange(shape[1])[None, :, None]
    z = jnp.arange(shape[2])[None, None, :]
    r = jnp.round(roi)
    m = (
        (x >= r[0]) & (x < r[3]) & (y >= r[1]) & (y < r[4]) & (z >= r[2]) & (z < r[5])
    )
    return m.astype(jnp.float32)
