"""Chunk-level validation: RPN AP + classification mAP + mask mAP.

Behavioral port of ``SolverWrapper.validation`` (``lib/model/trainval.py:
434-632``): each val chunk runs the TEST-branch forward; RPN AP is
class-agnostic over rois with score > ROI_THRESH; classification mAP uses
per-class refined boxes above CLASS_THRESH with degenerate boxes culled;
mask mAP unmolds per-box thresholded masks into the chunk grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dsis.eval import DetectionMAP
from tpu3dsis.io.dataset import pad_sample
from tpu3dsis.models.detector import Detector, build_inference_fn


class ChunkValidator:
    def __init__(self, detector: Detector, cfg, chunk_shape=(96, 48, 96)):
        self.det = detector
        self.cfg = cfg
        self.shape = tuple(chunk_shape)
        self._infer = jax.jit(
            build_inference_fn(detector, cfg, self.shape, mode="TEST")
        )
        self._mask_fn = None
        if detector.mask_backbone is not None:
            self._mask_fn = jax.jit(self._batched_mask_fn())

    def _batched_mask_fn(self):
        det = self.det

        def f(params, scene, regions, labels):
            # scene (X,Y,Z,2); regions (M,X,Y,Z); labels (M,)
            def one(args):
                region, label = args
                logits = det.mask_backbone.apply(
                    params,
                    (scene * region[..., None])[None],
                    training=False,
                    region_mask=region[None, ..., None],
                    compute_dtype=det.cfg_static["compute_dtype"],
                )
                return logits[0, :, :, :, label]

            return jax.lax.map(one, (regions, labels))

        return f

    def predict_chunk(self, params, sample_padded):
        """Run TEST forward on one padded chunk -> host numpy prediction dict."""
        frames = None
        if "images" in sample_padded:
            frames = {
                "images": jnp.asarray(sample_padded["images"]),
                "depths": jnp.asarray(sample_padded["depths"]),
                "poses": jnp.asarray(sample_padded["poses"]),
                "world_to_grid": jnp.asarray(sample_padded["world_to_grid"]),
                "view_valid": jnp.asarray(sample_padded["view_valid"]),
            }
        out = self._infer(
            params, jnp.asarray(sample_padded["data"])[None], frames
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def masks_for_boxes(self, params, data, boxes, labels, batch=8):
        """Thresholded box-crop masks for given boxes on one chunk."""
        cfg = self.cfg
        masks = []
        n = len(boxes)
        for i in range(0, n, batch):
            bs = boxes[i : i + batch]
            ls = labels[i : i + batch]
            m = len(bs)
            regions = np.zeros((batch, *self.shape), np.float32)
            lab = np.zeros((batch,), np.int32)
            for j, b in enumerate(bs):
                r = np.round(b).astype(int)
                r = np.clip(r, 0, [*self.shape, *self.shape])
                regions[j, r[0] : r[3], r[1] : r[4], r[2] : r[5]] = 1.0
                lab[j] = ls[j]
            probs = np.asarray(
                self._mask_fn(
                    params, jnp.asarray(data), jnp.asarray(regions),
                    jnp.asarray(lab),
                )
            )
            for j, b in enumerate(bs[:m]):
                r = np.round(b).astype(int)
                r = np.clip(r, 0, [*self.shape, *self.shape])
                crop = probs[j, r[0] : r[3], r[1] : r[4], r[2] : r[5]]
                masks.append(
                    (crop >= cfg.MASK_THRESH).astype(np.float32)
                )
        return masks

    def _dump_artifacts(self, save_dir, sample, out, keep, pred_masks):
        """VAL_SAVE_DIR artifact dumps for the first VAL_NUM chunks
        (trainval.py:543-556, 589-592 format)."""
        import os
        import pickle

        d = os.path.join(save_dir, os.path.basename(sample.sample_id)[:12])
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "pred_class.npy"), out["cls_pred"])
        np.save(os.path.join(d, "pred_conf.npy"), out["pred_conf"])
        np.save(os.path.join(d, "pred_box.npy"), out["pred_box"])
        np.save(
            os.path.join(d, "scene.npy"),
            np.where(sample.data[..., 0] <= 1, 1, 0),
        )
        np.save(os.path.join(d, "gt_class.npy"), sample.gt_box[:, 6])
        np.save(os.path.join(d, "gt_box.npy"), sample.gt_box[:, :6])
        with open(os.path.join(d, "pred_mask"), "wb") as f:
            pickle.dump(pred_masks, f)
        with open(os.path.join(d, "pred_mask_index"), "wb") as f:
            pickle.dump(keep.tolist(), f)
        with open(os.path.join(d, "gt_mask"), "wb") as f:
            pickle.dump(sample.gt_mask, f)

    def run(self, params, dataset, max_samples=None, save_dir=None, logger=None, step=0):
        cfg = self.cfg
        map_rpn = DetectionMAP(1, overlap_threshold=cfg.MAP_THRESH)
        map_cls = DetectionMAP(
            cfg.NUM_CLASSES, overlap_threshold=cfg.MAP_THRESH, ignore_class=[0]
        )
        map_mask = DetectionMAP(
            cfg.NUM_CLASSES, overlap_threshold=cfg.MAP_THRESH, ignore_class=[0]
        )
        n_eval = 0
        for idx in range(len(dataset)):
            if max_samples is not None and n_eval >= max_samples:
                break
            sample = dataset[idx]
            if sample.gt_box.shape[0] == 0:
                continue  # skip empty (trainval.py:459-460)
            if sample.data.shape[:3] != self.shape:
                continue
            padded = pad_sample(sample, cfg, with_mask_canvas=False)
            out = self.predict_chunk(params, padded)
            n_eval += 1

            gt_box = sample.gt_box[:, :6]
            gt_cls = sample.gt_box[:, 6]
            valid = out["valid"]

            # --- RPN AP (trainval.py:479-500) ---
            scores = out["scores"]
            nkeep = int(np.sum((scores > cfg.ROI_THRESH) & valid))
            nkeep = max(nkeep, 1)
            map_rpn.evaluate(
                out["rois"][:nkeep],
                -np.ones(nkeep),
                scores[:nkeep],
                gt_box,
                np.zeros(gt_box.shape[0]),
            )

            # --- classification mAP (trainval.py:503-558) ---
            keep = (
                valid
                & (out["pred_conf"] > cfg.CLASS_THRESH)
                & ~out["degenerate"]
            )
            map_cls.evaluate(
                out["pred_box"][keep],
                out["cls_pred"][keep],
                out["pred_conf"][keep],
                gt_box,
                gt_cls,
            )

            # --- mask mAP (trainval.py:563-607) ---
            pred_masks = []
            if self._mask_fn is not None:
                pred_masks = self.masks_for_boxes(
                    params,
                    padded["data"],
                    out["pred_box"][keep],
                    out["cls_pred"][keep],
                )
            if save_dir is not None and n_eval <= int(cfg.VAL_NUM):
                self._dump_artifacts(save_dir, sample, out, keep, pred_masks)
            if self._mask_fn is not None:
                map_mask.evaluate_mask(
                    out["pred_box"][keep],
                    out["cls_pred"][keep],
                    out["pred_conf"][keep],
                    pred_masks,
                    gt_box,
                    gt_cls,
                    sample.gt_mask,
                    self.shape,
                )

        map_rpn.finalize()
        map_cls.finalize()
        results = {"AP_ROI": map_rpn.mAP(), "mAP_CLASSIFICATION": map_cls.mAP()}
        if self._mask_fn is not None:
            map_mask.finalize()
            results["mAP_MASK"] = map_mask.mAP()
        if logger is not None:
            for tag, v in results.items():
                logger.scalar_summary(tag, v, step)
        return results
