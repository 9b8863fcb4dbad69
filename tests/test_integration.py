"""End-to-end integration: synthetic dataset -> train -> resume -> validate
-> whole-scene export. Small shapes so the suite stays CPU-friendly."""

import os
import pickle

import numpy as np
import pytest

from tpu3dsis.io import write_chunk_file


def make_dataset(tmp_path, rng, n=3, dims=(32, 16, 32)):
    paths = []
    for i in range(n):
        sdf = (rng.randn(*dims) * 2).astype(np.float32)
        # one solid object with a matching box+mask
        sdf[4:12, 3:10, 5:13] = 0.2
        boxes = np.array([[4, 3, 5, 12, 10, 13]], np.float64)
        labels = np.array([5], np.uint32)  # chair
        masks = [np.ones((8, 7, 8), np.uint16)]
        p = str(tmp_path / f"s{i}__0__.chunk")
        write_chunk_file(
            p, sdf, boxes, labels, masks, np.ones(1, np.float32),
            np.eye(4, dtype=np.float32), np.zeros(0, np.uint32),
        )
        paths.append(p)
    fl = tmp_path / "train.txt"
    fl.write_text("".join(p + "\n" for p in paths))
    return str(fl), paths


def tiny_cfg(scannet_cfg, tmp_path):
    cfg = scannet_cfg.copy()
    cfg.LABEL_MAP = ""
    cfg.KEEP_THRESH = 0.0
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 64
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 16
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 8
    cfg.RPN_BATCHSIZE = 16
    cfg.CLASS_BATCH_SIZE = 8
    cfg.TPU_MAX_GT = 4
    cfg.TPU_MAX_MASK_ROIS = 2
    cfg.TPU_TILE_SIZE = [32, 16, 32]
    cfg.TPU_TILE_STRIDE = [16, 16, 16]
    cfg.TPU_DATA_PARALLEL = 1
    cfg.VAL_TIME = 0.0
    cfg.SNAPSHOT_KEPT = 2
    cfg.CLASS_THRESH = 0.0
    cfg.ROI_THRESH = 0.0
    cfg.DISPLAY = 2
    return cfg


@pytest.mark.medium
def test_train_snapshot_resume_validate_scenes(tmp_path, rng, scannet_cfg):
    cfg = tiny_cfg(scannet_cfg, tmp_path)
    filelist, paths = make_dataset(tmp_path, rng)
    cfg.TRAIN_FILELIST = filelist
    cfg.VAL_FILELIST = filelist
    cfg.TRAINVAL_FILELIST = ""
    cfg.TEST_FILELIST = filelist
    cfg.TEST_SAVE_DIR = str(tmp_path / "results")

    from tpu3dsis.train.loop import Trainer

    out = str(tmp_path / "run")
    trainer = Trainer(cfg, out, chunk_shape=(32, 16, 32))
    state, step = trainer.train(epochs=2, max_steps=4)
    assert step >= 4
    snaps = os.listdir(trainer.checkpoint_dir)
    assert any(s.endswith(".npz") for s in snaps)

    # resume continues from the snapshot
    trainer2 = Trainer(cfg, out, chunk_shape=(32, 16, 32))
    state2, step2 = trainer2.restore_or_init()
    assert step2 == step

    # chunk validation produces the reference metric tags
    from tpu3dsis.infer.validate import ChunkValidator
    from tpu3dsis.io.dataset import SceneDataset

    params = {k: np.asarray(v) for k, v in state.params.items()}
    validator = ChunkValidator(trainer.detector, cfg, (32, 16, 32))
    ds = SceneDataset(filelist, "chunk", cfg)
    res = validator.run(params, ds, max_samples=2)
    assert set(res) == {"AP_ROI", "mAP_CLASSIFICATION", "mAP_MASK"}
    for v in res.values():
        assert 0.0 <= v <= 1.0

    # whole-scene export writes reference-format artifacts
    from tpu3dsis.infer.driver import run_scenes

    results = run_scenes(
        cfg, params, "test", detector=trainer.detector, dataset=ds,
        max_scenes=1,
    )
    scene_id = os.path.basename(paths[0])[:12]
    out_dir = os.path.join(cfg.TEST_SAVE_DIR, scene_id)
    for f in ("pred_class.npy", "pred_conf.npy", "pred_box.npy", "scene.npy",
              "gt_box.npy", "gt_class.npy"):
        assert os.path.isfile(os.path.join(out_dir, f)), f
    with open(os.path.join(out_dir, "pred_mask"), "rb") as f:
        masks = pickle.load(f)
    boxes = np.load(os.path.join(out_dir, "pred_box.npy"))
    assert len(masks) == len(boxes)
    assert "mAP_CLASSIFICATION" in results

    # benchmark mode is restart-idempotent: second run skips existing scenes
    cfg2 = cfg.copy()
    run_scenes(cfg2, params, "benchmark", detector=trainer.detector,
               dataset=ds, max_scenes=1)
