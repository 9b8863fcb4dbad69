"""Whole-scene test / benchmark drivers with reference-compatible artifacts.

Port of ``SolverWrapper.test``/``benchmark`` (``lib/model/trainval.py:
640-941``): per scene, dump into ``<SAVE_DIR>/<scene-id[:12]>/``:
  pred_class.npy, pred_conf.npy, pred_box.npy,
  scene.npy (occupancy: encoded |tsdf| <= 1),
  pred_mask (pickle: list of box-crop binary masks for kept boxes),
  pred_mask_index (pickle: bool keep list),
  [test mode] gt_class.npy, gt_box.npy, gt_mask (pickle)
and (test mode) accumulate classification + mask mAP. Benchmark mode skips
scenes whose pred_box.npy already exists (restart idempotency,
trainval.py:648-653).

Unlike the reference's one-shot full-scene forward (with CPU fallback above
MAX_VOLUME), scenes run through the tiled ``SceneInference`` — any size, one
compiled program.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from tpu3dsis.eval import DetectionMAP
from tpu3dsis.infer.tiling import SceneInference
from tpu3dsis.io.dataset import SceneDataset
from tpu3dsis.models.detector import Detector


def _scene_dir(save_dir, scene_path):
    return os.path.join(save_dir, os.path.basename(scene_path)[:12])


def run_scenes(
    cfg,
    params,
    mode: str,
    detector: Detector | None = None,
    dataset: SceneDataset | None = None,
    max_scenes=None,
    with_masks=True,
):
    """mode: 'test' (gt + mAP) or 'benchmark' (export only).

    Returns the mAP dict for test mode, else {}.
    """
    assert mode in ("test", "benchmark")
    save_dir = cfg.TEST_SAVE_DIR
    os.makedirs(save_dir, exist_ok=True)
    if detector is None:
        detector = Detector(cfg, anchor_dir="experiments/anchors")
    if dataset is None:
        dataset = SceneDataset(
            cfg.TEST_FILELIST, "benchmark" if mode == "benchmark" else "scene", cfg
        )
    mesh = None
    n_tp = int(dict.get(cfg, "TPU_SCENE_TILE_PARALLEL", 0))
    if n_tp > 1:
        import jax
        from jax.sharding import Mesh

        n_tp = min(n_tp, len(jax.devices()))
        if n_tp > 1:
            mesh = Mesh(np.array(jax.devices()[:n_tp]), ("tiles",))
    si = SceneInference(detector, cfg, mesh=mesh)
    single_shot = str(dict.get(cfg, "TPU_SCENE_MODE", "tiled")) == "single_shot"
    if single_shot:
        # reference-style one-pass whole-scene inference (parity experiments);
        # masks still run through the tiled crop canvas
        from tpu3dsis.infer.single_shot import SingleShotInference

        shot = SingleShotInference(detector, cfg)
        si.detect = lambda params, data, frames=None: shot.detect(
            params, data, frames
        )

    map_cls = DetectionMAP(
        cfg.NUM_CLASSES, overlap_threshold=cfg.MAP_THRESH, ignore_class=[0]
    )
    map_mask = DetectionMAP(
        cfg.NUM_CLASSES, overlap_threshold=cfg.MAP_THRESH, ignore_class=[0]
    )

    n = len(dataset) if max_scenes is None else min(max_scenes, len(dataset))
    todo = [
        idx
        for idx in range(n)
        if not (
            mode == "benchmark"
            and os.path.isfile(
                os.path.join(
                    _scene_dir(save_dir, dataset.scenes[idx]), "pred_box.npy"
                )
            )
        )
    ]

    # scene-stream pipelining: one loader thread reads scene i+1 from disk
    # and starts its host->device transfer (SceneInference.prefetch_scene,
    # itself on a second thread) while scene i computes — upload is ~45% of
    # per-scene wall time through the tunnel, hidden entirely in steady state
    from concurrent.futures import ThreadPoolExecutor

    loader = ThreadPoolExecutor(max_workers=1, thread_name_prefix="scene-load")

    def _fetch(i):
        s = dataset[i]
        si.prefetch_scene(s.data)
        frames = None
        if cfg.USE_IMAGES and s.images is not None:
            frames = {
                "images": s.images,
                "depths": s.depths,
                "poses": s.poses,
                "world_to_grid": s.world_to_grid,
            }
            # image upload + ENet + resident color volume for the NEXT scene
            # overlap this scene's compute (tiling.py::prefetch_frames)
            si.prefetch_frames(params, frames, s.data.shape[:3])
        return s, frames

    pending = loader.submit(_fetch, todo[0]) if todo else None
    for pos, idx in enumerate(todo):
        scene_path = dataset.scenes[idx]
        out_dir = _scene_dir(save_dir, scene_path)
        sample, frames = pending.result()
        pending = (
            loader.submit(_fetch, todo[pos + 1])
            if pos + 1 < len(todo)
            else None
        )
        if with_masks and not single_shot:
            # fused one-dispatch path where eligible (geometry-only,
            # no mesh); otherwise infer() itself falls back to
            # detect + predict_masks with identical results
            det_out, masks = si.infer(params, sample.data, frames=frames)
        else:
            det_out = si.detect(params, sample.data, frames=frames)
            masks = (
                si.predict_masks(params, sample.data, det_out, frames=frames)
                if with_masks
                else []
            )

        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "pred_class.npy"), det_out["pred_class"])
        np.save(os.path.join(out_dir, "pred_conf.npy"), det_out["pred_conf"])
        np.save(os.path.join(out_dir, "pred_box.npy"), det_out["pred_box"])
        np.save(
            os.path.join(out_dir, "scene.npy"),
            np.where(sample.data[..., 0] <= 1, 1, 0),
        )
        if with_masks:
            with open(os.path.join(out_dir, "pred_mask"), "wb") as f:
                pickle.dump(masks, f)
            with open(os.path.join(out_dir, "pred_mask_index"), "wb") as f:
                pickle.dump([True] * len(masks), f)

        if mode == "test" and sample.gt_box.shape[0]:
            gt_box = sample.gt_box[:, :6]
            gt_cls = sample.gt_box[:, 6]
            np.save(os.path.join(out_dir, "gt_class.npy"), gt_cls)
            np.save(os.path.join(out_dir, "gt_box.npy"), gt_box)
            with open(os.path.join(out_dir, "gt_mask"), "wb") as f:
                pickle.dump(sample.gt_mask, f)
            map_cls.evaluate(
                det_out["pred_box"],
                det_out["pred_class"],
                det_out["pred_conf"],
                gt_box,
                gt_cls,
            )
            if with_masks:
                map_mask.evaluate_mask(
                    det_out["pred_box"],
                    det_out["pred_class"],
                    det_out["pred_conf"],
                    masks,
                    gt_box,
                    gt_cls,
                    sample.gt_mask,
                    sample.data.shape[:3],
                )

    loader.shutdown(wait=False)
    if mode == "test":
        map_cls.finalize()
        results = {"mAP_CLASSIFICATION": map_cls.mAP()}
        if with_masks:
            map_mask.finalize()
            results["mAP_MASK"] = map_mask.mAP()
        print(results)
        return results
    return {}
