"""Single-shot whole-scene inference — the reference's TEST mode.

The reference pushes the ENTIRE scene through the backbone/RPN in one pass
with per-scene anchor regeneration (``lib/nets/network.py:187-317``). The
tiled path (tpu3dsis.infer.tiling) is the production mode, but single-shot
is kept for (a) apples-to-apples parity checks against released
checkpoints and (b) scenes where tiling boundary effects are under study.

Compiles once per padded scene shape (48-voxel buckets). Memory scales with
the scene; combine with ``tpu3dsis.parallel.spatial_features`` on a mesh to
go beyond one chip's HBM instead of the reference's MAX_VOLUME CPU fallback.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpu3dsis.infer.tiling import pad_volume
from tpu3dsis.models.detector import Detector, build_inference_fn


class SingleShotInference:
    def __init__(self, detector: Detector, cfg):
        self.det = detector
        self.cfg = cfg
        self._fns = {}

    def _fn_for(self, shape):
        if shape not in self._fns:
            self._fns[shape] = jax.jit(
                build_inference_fn(self.det, self.cfg, shape, mode="TEST")
            )
        return self._fns[shape]

    def detect(self, params, scene_data: np.ndarray, frames=None):
        """scene_data: (X, Y, Z, 2) -> dict like SceneInference.detect."""
        cfg = self.cfg
        # pad to 16-voxel multiples: finer buckets than the tiled path so the
        # free-space extension stays minimal (single-shot feature context
        # matches chunk training, which only ever sees conv zero-padding)
        bucket = tuple(((d + 15) // 16) * 16 for d in scene_data.shape[:3])
        data = pad_volume(scene_data.astype(np.float32), bucket)
        fn = self._fn_for(tuple(data.shape[:3]))
        fr = None
        if frames is not None:
            fr = {k: jnp.asarray(v) for k, v in frames.items()}
        out = fn(params, jnp.asarray(data)[None], fr)
        out = {k: np.asarray(v) for k, v in out.items()}
        keep = (
            out["valid"]
            & ~out["degenerate"]
            & (out["pred_conf"] > cfg.CLASS_THRESH)
            & (out["cls_pred"] > 0)
        )
        sx, sy, sz = scene_data.shape[:3]
        boxes = np.clip(
            out["pred_box"][keep],
            0,
            np.array([sx, sy, sz, sx, sy, sz], np.float32),
        )
        order = np.argsort(-out["pred_conf"][keep])
        return {
            "pred_box": boxes[order],
            "pred_class": out["cls_pred"][keep][order].astype(np.int32),
            "pred_conf": out["pred_conf"][keep][order],
        }
