"""End-to-end detector: backbone -> RPN -> proposals -> RoI heads -> boxes.

TPU-first re-orchestration of ``lib/nets/network.py:26-706``'s forward: the
whole inference path for one fixed scene shape is a single jitted program —
no host round-trips between stages (the reference bounces to numpy for target
layers and to CUDA glue for NMS/RoIPool on every step).

Dynamic structures become fixed-capacity tensors with validity masks:
proposals are (POST_NMS_N, 6)+mask, class outputs are (POST_NMS_N, C), final
detections carry a validity mask instead of being filtered.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.anchors import (
    anchors_inside_mask,
    generate_level_anchors,
)
from tpu3dsis.geometry.boxes import bbox_transform_inv, clip_boxes
from tpu3dsis.models.backbones import (
    BACKBONES,
    FEAT_STRIDE,
    MaskBackboneArch,
)
from tpu3dsis.models.nn import Linear, apply_specs, init_spec_params, spec_param_names
from tpu3dsis.models.rpn import LevelAnchors, RPNHeads, select_proposals
from tpu3dsis.ops.roi_pool3d import roi_pool3d_multilevel


class Detector:
    """Static model structure + pure apply functions.

    Construction reads only static cfg fields; all state lives in the flat
    param dict, so `Detector` instances are safe to close over in jit.
    """

    def __init__(self, cfg, anchor_dir: str = "experiments/anchors"):
        self.cfg_static = {
            "num_classes": int(cfg.NUM_CLASSES),
            "pooling_size": int(cfg.CLASS_POOLING_SIZE),
            "use_rpn": bool(cfg.USE_RPN),
            "use_class": bool(cfg.USE_CLASS),
            "use_mask": bool(cfg.USE_MASK),
            "use_images": bool(cfg.USE_IMAGES),
            "compute_dtype": jnp.bfloat16
            if cfg.TPU_COMPUTE_DTYPE == "bfloat16"
            else jnp.float32,
        }
        self.backbone = BACKBONES[cfg.NET](cfg)
        self.rpn = RPNHeads(cfg)
        self.mask_backbone = (
            MaskBackboneArch(cfg) if cfg.USE_MASK and cfg.MASK_BACKBONE else None
        )
        self.color_projector = None
        if cfg.USE_IMAGES:
            from tpu3dsis.models.color import ColorProjector

            self.color_projector = ColorProjector(cfg)
        nc = self.cfg_static["num_classes"]
        self.class_heads = [
            Linear("classifier_cls_score_net", 128, nc),
        ]
        self.bbox_heads = [
            Linear("classifier_bbox_pred_net", 128, nc * 6),
        ]
        self.anchor_dir = anchor_dir
        self.anchor_files = {
            1: cfg.ANCHORS_TYPE_LEVEL1,
            2: cfg.ANCHORS_TYPE_LEVEL2,
            3: cfg.ANCHORS_TYPE_LEVEL3,
        }
        self.num_anchors = {
            1: int(cfg.NUM_ANCHORS_LEVEL1),
            2: int(cfg.NUM_ANCHORS_LEVEL2),
            3: int(cfg.NUM_ANCHORS_LEVEL3),
        }
        self._anchor_cache = {}

    # --- params ----------------------------------------------------------
    def init_params(self, key) -> dict:
        params = {}
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        params.update(self.backbone.init_params(k1))
        if self.cfg_static["use_rpn"]:
            params.update(self.rpn.init_params(k2))
        if self.cfg_static["use_class"]:
            params.update(init_spec_params(k3, self.class_heads))
            params.update(init_spec_params(k4, self.bbox_heads))
        if self.mask_backbone is not None:
            key, k5 = jax.random.split(key)
            params.update(self.mask_backbone.init_params(k5))
        if self.color_projector is not None:
            key, k6 = jax.random.split(key)
            params.update(self.color_projector.init_params(k6))
        return params

    def param_names(self):
        names = list(self.backbone.param_names())
        if self.cfg_static["use_rpn"]:
            names += self.rpn.param_names()
        if self.cfg_static["use_class"]:
            names += spec_param_names(self.class_heads)
            names += spec_param_names(self.bbox_heads)
        if self.mask_backbone is not None:
            names += self.mask_backbone.param_names()
        if self.color_projector is not None:
            names += self.color_projector.param_names()
        return names

    # --- anchors (host, cached per scene shape; network.py:248-258) ------
    def level_anchors(self, scene_shape) -> dict:
        key = tuple(int(s) for s in scene_shape)
        if key not in self._anchor_cache:
            feat = tuple(s // FEAT_STRIDE[0] for s in key)
            out = {}
            for lvl, a in self.num_anchors.items():
                if a == 0:
                    continue
                anchors = generate_level_anchors(
                    f"{self.anchor_dir}/{self.anchor_files[lvl]}",
                    feat,
                    FEAT_STRIDE[lvl - 1],
                )
                inside = anchors_inside_mask(anchors, key)
                out[lvl] = LevelAnchors(anchors=anchors, inside=inside)
            self._anchor_cache[key] = out
        return self._anchor_cache[key]

    # --- forward pieces --------------------------------------------------
    def features(self, params, scene, imageft=None):
        """scene (N,X,Y,Z,2) -> {lvl: feature map}; shared across heads."""
        dt = self.cfg_static["compute_dtype"]
        lvl1, lvl2, lvl3 = self.backbone.apply(params, scene, imageft, dt)
        feats = {1: lvl1, 2: lvl2}
        if lvl3 is not None:
            feats[3] = lvl3
        return feats

    def rpn_forward(self, params, feats):
        return self.rpn.apply(params, feats, self.cfg_static["compute_dtype"])

    def classify_rois(self, params, feats, rois, level_inds):
        """RoI pool (multi-level) + classifier MLP + class/bbox heads.

        rois: (R, 6) scene coords; returns (cls_score, cls_prob, cls_pred,
        bbox_pred). Parity: network.py:154-160 + 589-604.
        """
        dt = self.cfg_static["compute_dtype"]
        level_list = sorted(feats.keys())
        # pool at the compute dtype: max-pooling is order-exact in bf16 and
        # the pool is bandwidth-bound
        feat_tuple = tuple(feats[l][0].astype(dt) for l in level_list)
        scales = tuple(1.0 / FEAT_STRIDE[l - 1] for l in level_list)
        pool5 = roi_pool3d_multilevel(
            feat_tuple, rois, level_inds, self.cfg_static["pooling_size"], scales
        )
        fc7 = self.backbone.classify(params, pool5, dt)
        cls_score = apply_specs(params, self.class_heads, fc7, dt)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        cls_pred = jnp.argmax(cls_score, axis=-1)
        bbox_pred = apply_specs(params, self.bbox_heads, fc7, dt)
        return cls_score, cls_prob, cls_pred, bbox_pred

    def decode_test_boxes(self, rois, cls_pred, cls_prob, bbox_pred, scene_shape):
        """Per-class box refinement for TEST (network.py:283-301).

        Selects the predicted class's 6-delta block per roi, decodes, clips,
        and reports confidence = prob of the predicted class, plus a
        degenerate-box mask (round(min) >= round(max) on any axis).
        """
        r = rois.shape[0]
        nc = cls_prob.shape[-1]
        blocks = bbox_pred.reshape(r, nc, 6)
        sel = jnp.take_along_axis(blocks, cls_pred[:, None, None], axis=1)[:, 0, :]
        pred_box = bbox_transform_inv(rois, sel)
        pred_box = clip_boxes(pred_box, scene_shape)
        conf = jnp.take_along_axis(cls_prob, cls_pred[:, None], axis=1)[:, 0]
        rd = jnp.round(pred_box)
        degenerate = (
            (rd[:, 0] >= rd[:, 3]) | (rd[:, 1] >= rd[:, 4]) | (rd[:, 2] >= rd[:, 5])
        )
        return pred_box, conf, degenerate


def build_inference_fn(detector: Detector, cfg, scene_shape, mode="TEST"):
    """Compile-ready single-sample inference closure for a static shape.

    Returns f(params, scene[, imageft]) -> dict of fixed-shape outputs.
    """
    mode_cfg = cfg[mode]
    pre_n = int(mode_cfg.RPN_PRE_NMS_TOP_N)
    post_n = int(mode_cfg.RPN_POST_NMS_TOP_N)
    thresh = float(mode_cfg.RPN_NMS_THRESH)
    level_anchors = detector.level_anchors(scene_shape)
    shape_arr = tuple(int(s) for s in scene_shape)

    use_images = detector.cfg_static["use_images"]

    def infer(params, scene, frames=None):
        """frames (only when USE_IMAGES): dict with images (V, H, W, C),
        depths (V, Hd, Wd), poses (V, 4, 4), world_to_grid (4, 4),
        view_valid (V,) — the color volume is computed on-device. A
        precomputed (X, Y, Z, C) projected volume crop can be passed
        directly as frames["imageft"] instead (scene-resident color volume,
        infer/color_volume.py)."""
        imageft = None
        if use_images and frames is not None:
            pre = frames.get("imageft")
            if pre is not None:
                imageft = pre[None]
            else:
                imageft = detector.color_projector.project(
                    params,
                    frames.get("images"),
                    frames["depths"],
                    frames["poses"],
                    frames["world_to_grid"],
                    shape_arr,
                    view_valid=frames.get("view_valid"),
                    feats=frames.get("feats2d"),
                    zero_floor=frames.get("zero_floor"),
                )[None]
        feats = detector.features(params, scene, imageft)
        rpn_out = detector.rpn_forward(params, feats)
        prop = select_proposals(
            rpn_out, level_anchors, shape_arr, pre_n, post_n, thresh
        )
        out = dict(prop)
        if detector.cfg_static["use_class"]:
            cls_score, cls_prob, cls_pred, bbox_pred = detector.classify_rois(
                params, feats, prop["rois"], prop["level_inds"]
            )
            pred_box, conf, degenerate = detector.decode_test_boxes(
                prop["rois"], cls_pred, cls_prob, bbox_pred, shape_arr
            )
            out.update(
                cls_score=cls_score,
                cls_prob=cls_prob,
                cls_pred=cls_pred,
                bbox_pred=bbox_pred,
                pred_box=pred_box,
                pred_conf=conf,
                degenerate=degenerate,
            )
        return out

    return infer
