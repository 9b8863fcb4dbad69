"""Fast native loader path must match pad_sample outputs exactly."""

import numpy as np
import pytest

from tpu3dsis.io import write_chunk_file
from tpu3dsis.io.dataset import SceneDataset, load_fast_padded, pad_sample
from tpu3dsis.runtime import native_available


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_fast_path_matches_numpy(tmp_path, rng, scannet_cfg):
    cfg = scannet_cfg.copy()
    cfg.LABEL_MAP = "experiments/labelmaps/nyu40labels_scannet.csv"
    cfg.KEEP_THRESH = 1.0
    cfg.TPU_MAX_GT = 8
    dims = (96, 56, 96)  # taller than crop to exercise height slicing
    sdf = (rng.randn(*dims) * 2).astype(np.float32)
    boxes = np.array([[4.2, 3.1, 5.4, 20.0, 21.7, 22.2]], np.float64)
    labels = np.array([5], np.uint32)
    masks = [
        (rng.rand(16, 19, 18) > 0.4).astype(np.uint16)
    ]
    path = str(tmp_path / "f.chunk")
    write_chunk_file(
        path, sdf, boxes, labels, masks, np.ones(1, np.float32),
        np.eye(4, dtype=np.float32), np.zeros(0, np.uint32),
    )
    fl = tmp_path / "l.txt"
    fl.write_text(path + "\n")
    ds = SceneDataset(str(fl), "chunk", cfg)

    fast = load_fast_padded(ds, path, cfg)
    assert fast is not None
    slow = pad_sample(ds[0], cfg)

    for key in ("data", "gt_box", "gt_valid", "mask_canvas"):
        np.testing.assert_allclose(fast[key], slow[key], rtol=1e-6, err_msg=key)


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_fast_path_falls_back_on_filtered_boxes(tmp_path, rng, scannet_cfg):
    cfg = scannet_cfg.copy()
    cfg.LABEL_MAP = "experiments/labelmaps/nyu40labels_scannet.csv"
    cfg.KEEP_THRESH = 1.0
    sdf = (rng.randn(96, 48, 96) * 2).astype(np.float32)
    # box partially outside the chunk -> would be dropped by KEEP_THRESH
    boxes = np.array([[90.0, 3.0, 5.0, 110.0, 20.0, 20.0]], np.float64)
    masks = [np.ones((20, 17, 15), np.uint16)]
    path = str(tmp_path / "g.chunk")
    write_chunk_file(
        path, sdf, boxes, np.array([5], np.uint32), masks,
        np.ones(1, np.float32), np.eye(4, dtype=np.float32),
        np.zeros(0, np.uint32),
    )
    fl = tmp_path / "l.txt"
    fl.write_text(path + "\n")
    ds = SceneDataset(str(fl), "chunk", cfg)
    assert load_fast_padded(ds, path, cfg) is None  # defers to numpy path
