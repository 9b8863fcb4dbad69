"""3D region proposal network heads + fixed-shape proposal selection.

Head structure parity: reference ``lib/nets/network.py:38-52`` (3x3x3 conv to
RPN_CHANNELS, then 1x1x1 convs to 2A scores / 6A box deltas per level) and
``_region_proposal`` (network.py:537-587). Proposal selection re-designs
``lib/layer_utils/proposal_layer.py:11-204`` as one fixed-shape XLA program:
the host index-list inside-filter becomes a static mask, sort+topk becomes
`lax.top_k`, and the CUDA NMS becomes :func:`tpu3dsis.ops.nms.nms_mask`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.boxes import bbox_transform_inv, clip_boxes
from tpu3dsis.models.nn import Conv, apply_specs, init_spec_params, spec_param_names
from tpu3dsis.ops.nms import nms_mask


class RPNHeads:
    """Per-level conv heads. Levels with 0 anchors are absent."""

    def __init__(self, cfg, level_channels=(128, 128, 128)):
        self.num_anchors = [
            int(cfg.NUM_ANCHORS_LEVEL1),
            int(cfg.NUM_ANCHORS_LEVEL2),
            int(cfg.NUM_ANCHORS_LEVEL3),
        ]
        self.rpn_channels = int(cfg.RPN_CHANNELS)
        self.specs = {}
        for lvl, a in enumerate(self.num_anchors, start=1):
            if a == 0:
                continue
            cin = level_channels[lvl - 1]
            self.specs[lvl] = {
                "trunk": [
                    Conv(f"rpn_net_level{lvl}", cin, self.rpn_channels, 3, pad=1)
                ],
                "cls": [
                    Conv(
                        f"rpn_cls_score_net_level{lvl}.0",
                        self.rpn_channels,
                        a * 2,
                        1,
                    )
                ],
                "bbox": [
                    Conv(
                        f"rpn_bbox_pred_net_level{lvl}", self.rpn_channels, a * 6, 1
                    )
                ],
            }

    def init_params(self, key):
        params = {}
        for lvl in self.specs:
            for part in ("trunk", "cls", "bbox"):
                key, sk = jax.random.split(key)
                params.update(init_spec_params(sk, self.specs[lvl][part]))
        return params

    def param_names(self):
        names = []
        for lvl in self.specs:
            for part in ("trunk", "cls", "bbox"):
                names += spec_param_names(self.specs[lvl][part])
        return names

    def apply(self, params, level_feats, compute_dtype=jnp.float32):
        """level_feats: {lvl: (N, W, H, L, C)} -> per-level predictions.

        Returns {lvl: (cls_score (N,W,H,L,2,A), cls_prob, bbox_pred
        (N,W,H,L,6A))}; softmax over the fg/bg axis matches the reference's
        implicit dim=1 softmax on (N,2,W,H,L,A) (network.py:546).
        """
        out = {}
        for lvl, specs in self.specs.items():
            a = self.num_anchors[lvl - 1]
            x = level_feats[lvl]
            t = jax.nn.relu(
                apply_specs(params, specs["trunk"], x, compute_dtype)
            )
            cls = apply_specs(params, specs["cls"], t, compute_dtype)
            n, w, h, l, _ = cls.shape
            cls_score = cls.reshape(n, w, h, l, 2, a)
            cls_prob = jax.nn.softmax(cls_score, axis=4)
            bbox = apply_specs(params, specs["bbox"], t, compute_dtype)
            out[lvl] = (cls_score, cls_prob, bbox)
        return out


@dataclass(frozen=True)
class LevelAnchors:
    """Static per-level anchor data for one scene shape (host-precomputed)."""

    anchors: np.ndarray  # (K*A, 6) float32
    inside: np.ndarray  # (K*A,) bool — inside-volume filter mask


def select_proposals(
    rpn_out,
    level_anchors: dict,
    scene_shape,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
):
    """Fixed-shape proposal layer for ONE sample.

    rpn_out: {lvl: (cls_score, cls_prob, bbox_pred)} with batch dim 1.
    Returns dict with rois (P,6), scores (P,), level_inds (P,), valid (P,).
    """
    props, scores, lvl_ids, valid = [], [], [], []
    for lvl, (_, cls_prob, bbox_pred) in sorted(rpn_out.items()):
        la = level_anchors[lvl]
        deltas = bbox_pred[0].reshape(-1, 6)
        s = cls_prob[0, :, :, :, 1, :].reshape(-1)
        anchors = jnp.asarray(la.anchors)
        p = bbox_transform_inv(anchors, deltas)
        p = clip_boxes(p, scene_shape)
        props.append(p)
        scores.append(s)
        lvl_ids.append(jnp.full_like(s, lvl))
        valid.append(jnp.asarray(la.inside))

    props = jnp.concatenate(props, 0)
    scores = jnp.concatenate(scores, 0)
    lvl_ids = jnp.concatenate(lvl_ids, 0)
    valid = jnp.concatenate(valid, 0)

    # outside-volume anchors never propose (proposal_layer.py:36-84)
    neg = jnp.asarray(-1e9, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg)
    k = min(pre_nms_top_n, int(masked_scores.shape[0]))
    top_scores, order = jax.lax.top_k(masked_scores, k)
    top_props = props[order]
    top_lvls = lvl_ids[order]
    top_valid = valid[order]

    keep = nms_mask(top_props, nms_thresh, valid=top_valid)
    # first post_nms_top_n kept, in score order
    rank = jnp.cumsum(keep) - 1
    p_n = post_nms_top_n
    slot = jnp.where(keep & (rank < p_n), rank, p_n)
    src = jnp.arange(k, dtype=jnp.int32)
    gather = jnp.zeros((p_n + 1,), jnp.int32).at[slot].set(src, mode="drop")[:p_n]
    num_kept = jnp.minimum(jnp.sum(keep), p_n)
    out_valid = jnp.arange(p_n) < num_kept
    gather = jnp.where(out_valid, gather, 0)

    return {
        "rois": top_props[gather],
        "scores": jnp.where(out_valid, top_scores[gather], neg),
        "level_inds": top_lvls[gather],
        "valid": out_valid,
    }
