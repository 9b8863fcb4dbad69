"""Multi-chip single-shot scene inference: sharded backbone + full heads.

Composes :func:`tpu3dsis.parallel.spatial_features` (halo-exchanged
X-sharded convs) with the RPN / proposal / RoI-head stages (replicated on
the small stride-4 feature maps) — a whole scene larger than one chip's HBM
runs in ONE pass across the mesh. This is the end-to-end replacement for
the reference's MAX_VOLUME CPU fallback (``lib/utils/config.py:123-124``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpu3dsis.infer.tiling import pad_volume
from tpu3dsis.models.detector import Detector
from tpu3dsis.models.rpn import select_proposals
from tpu3dsis.parallel.spatial import spatial_features


def spatial_single_shot(
    detector: Detector, cfg, params, scene_data: np.ndarray, mesh,
    axis: str = "space",
):
    """One-pass whole-scene detection with the backbone sharded over `mesh`.

    Returns the same host dict as SingleShotInference.detect.
    """
    n = mesh.shape[axis]
    # X must tile to 4 * n for even shards at stride 4
    mult = 4 * n
    bx = ((scene_data.shape[0] + mult - 1) // mult) * mult
    by = ((scene_data.shape[1] + 3) // 4) * 4
    bz = ((scene_data.shape[2] + 3) // 4) * 4
    data = pad_volume(scene_data.astype(np.float32), (bx, by, bz))
    shape = tuple(data.shape[:3])

    feats = spatial_features(detector, params, jnp.asarray(data), mesh, axis)
    rpn_out = detector.rpn_forward(params, feats)
    level_anchors = detector.level_anchors(shape)
    prop = select_proposals(
        rpn_out,
        level_anchors,
        shape,
        int(cfg.TEST.RPN_PRE_NMS_TOP_N),
        int(cfg.TEST.RPN_POST_NMS_TOP_N),
        float(cfg.TEST.RPN_NMS_THRESH),
    )
    cls_score, cls_prob, cls_pred, bbox_pred = detector.classify_rois(
        params, feats, prop["rois"], prop["level_inds"]
    )
    pred_box, conf, degenerate = detector.decode_test_boxes(
        prop["rois"], cls_pred, cls_prob, bbox_pred, shape
    )

    keep = (
        np.asarray(prop["valid"])
        & ~np.asarray(degenerate)
        & (np.asarray(conf) > cfg.CLASS_THRESH)
        & (np.asarray(cls_pred) > 0)
    )
    sx, sy, sz = scene_data.shape[:3]
    boxes = np.clip(
        np.asarray(pred_box)[keep],
        0,
        np.array([sx, sy, sz, sx, sy, sz], np.float32),
    )
    confs = np.asarray(conf)[keep]
    order = np.argsort(-confs)
    return {
        "pred_box": boxes[order],
        "pred_class": np.asarray(cls_pred)[keep][order].astype(np.int32),
        "pred_conf": confs[order],
    }
