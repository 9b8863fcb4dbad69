"""TPU_COMPACT_TRANSFERS: shrunk host->device batches must be value-exact.

Three compactions (io/pipeline.py::PrefetchLoader._compact, frames.load_color,
models/color.py::image_features):
  - binary mask canvas uint8 (step casts the sliced window back to f32)
  - TSDF data in bfloat16 iff the compute dtype is bfloat16 (the first conv
    casts to bf16 anyway, so pre-casting on the host is the same math)
  - raw uint8 color images, normalized on device with the identical
    /255, -mean, /std fp32 ops as the host path
"""

import os
import types

import numpy as np
import pytest
from PIL import Image


def test_load_color_uint8_device_normalize_exact(tmp_path):
    from tpu3dsis.config import default_config
    from tpu3dsis.io.frames import load_color
    from tpu3dsis.models.color import ColorProjector

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (24, 32, 3), np.uint8)
    path = str(tmp_path / "c.png")
    Image.fromarray(img).save(path)

    cfg = default_config()
    cfg.USE_IMAGES_GT = False
    mean, std = cfg.COLOR_MEAN, cfg.COLOR_STD
    host = load_color(path, (32, 24), mean, std)  # normalized fp32
    raw = load_color(path, (32, 24), mean, std, normalize=False)
    assert raw.dtype == np.uint8

    proj = ColorProjector.__new__(ColorProjector)
    proj.enet = types.SimpleNamespace(features_for_3d=lambda p, x: x)
    proj.color_mean = np.asarray(mean, np.float32)
    proj.color_std = np.asarray(std, np.float32)
    import jax.numpy as jnp

    dev = np.asarray(proj.image_features({}, jnp.asarray(raw[None])))[0]
    np.testing.assert_allclose(dev, host, atol=1e-6)


@pytest.mark.slow
def test_compact_batch_metrics_exact(tmp_path, rng, scannet_cfg):
    """One train step on the float batch vs the compacted batch: identical
    metrics, for both fp32 (canvas-only compaction) and bfloat16 compute
    (canvas + bf16 data)."""
    import jax

    from tpu3dsis.io.dataset import SceneDataset, pad_sample
    from tpu3dsis.io.pipeline import PrefetchLoader
    from tpu3dsis.io import write_chunk_file
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    dims = (32, 16, 32)
    sdf = (rng.randn(*dims) * 2).astype(np.float32)
    chunk = str(tmp_path / "c__0__.chunk")
    write_chunk_file(
        chunk, sdf,
        np.array([[4, 4, 4, 12, 12, 12]], np.float64),
        np.array([5], np.uint32),
        [np.ones((8, 8, 8), np.uint16)],
        np.ones(1, np.float32),
        np.eye(4, dtype=np.float32),
        np.zeros(0, np.uint32),
    )
    filelist = str(tmp_path / "list.txt")
    with open(filelist, "w") as f:
        f.write(chunk + "\n")

    base = scannet_cfg.copy()
    base.TRAIN.RPN_PRE_NMS_TOP_N = 32
    base.TRAIN.RPN_POST_NMS_TOP_N = 8
    base.RPN_BATCHSIZE = 16
    base.CLASS_BATCH_SIZE = 8
    base.TPU_MAX_GT = 4
    base.TPU_MAX_MASK_ROIS = 1
    base.KEEP_THRESH = 0.0

    for dtype in ("float32", "bfloat16"):
        cfg = base.copy()
        cfg.TPU_COMPUTE_DTYPE = dtype
        ds = SceneDataset(filelist, "chunk", cfg)
        sample = ds[0]
        padded = pad_sample(sample, cfg)

        cfg_off = cfg.copy()
        cfg_off.TPU_COMPACT_TRANSFERS = False
        loader_on = PrefetchLoader(ds, cfg, batch_size=1)
        loader_off = PrefetchLoader(ds, cfg_off, batch_size=1)
        compact = loader_on._compact({k: v.copy() for k, v in padded.items()})
        plain = loader_off._compact({k: v.copy() for k, v in padded.items()})
        assert compact["mask_canvas"].dtype == np.uint8
        assert plain["mask_canvas"].dtype == np.float32
        if dtype == "bfloat16":
            assert compact["data"].dtype != np.float32

        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = det.init_params(jax.random.PRNGKey(0))
        opt_init, step = build_train_step(det, cfg, dims, mesh=None)
        key = jax.random.PRNGKey(1)

        outs = []
        for batch in (plain, compact):
            state = TrainState(params=params, opt=opt_init(params))
            b = {k: np.asarray(v)[None] for k, v in batch.items()}
            state, metrics = step(state, b, key)
            outs.append({k: float(v) for k, v in metrics.items()})
        assert outs[0] == outs[1], (dtype, outs)


def test_scene_upload_packed_occupancy_exact(scannet_cfg):
    """Scene upload ships the binary occupancy channel as packed bits and
    rebuilds the volume on device — must equal the direct upload exactly;
    non-binary channel-1 data (not encoded TSDF) must fall back unchanged."""
    import jax.numpy as jnp

    from tpu3dsis.infer.tiling import SceneInference, pad_volume
    from tpu3dsis.models import Detector

    cfg = scannet_cfg.copy()
    cfg.TPU_TILE_SIZE = [48, 48, 48]
    cfg.TPU_TILE_STRIDE = [36, 36, 36]
    det = Detector(cfg, anchor_dir="experiments/anchors")
    si = SceneInference.__new__(SceneInference)
    si.cfg = cfg
    si.tile = tuple(cfg.TPU_TILE_SIZE)
    si._dtype = jnp.bfloat16

    rng = np.random.RandomState(0)
    # encoded-TSDF-shaped scene: ch0 continuous, ch1 binary
    scene = np.stack(
        [
            np.abs(rng.randn(50, 40, 60)).astype(np.float32),
            (rng.rand(50, 40, 60) > 0.5).astype(np.float32),
        ],
        axis=-1,
    )
    data, dev = si._upload_scene(scene)
    assert getattr(si, "_rebuild_fn", None) is not None  # compact path ran
    want = jnp.asarray(data, dtype=jnp.bfloat16)  # direct-upload oracle
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(want))
    np.testing.assert_array_equal(data[:50, :40, :60], scene)

    # non-binary channel 1: falls back to the direct upload
    scene2 = rng.randn(50, 40, 60, 2).astype(np.float32)
    data2, dev2 = si._upload_scene(scene2)
    want2 = jnp.asarray(data2, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(dev2), np.asarray(want2))
