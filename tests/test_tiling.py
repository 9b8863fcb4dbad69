"""Whole-scene tiling: coverage, padding, stitch NMS, end-to-end smoke."""

import numpy as np
import pytest

from tpu3dsis.infer.tiling import pad_volume, tile_origins


def test_tile_origins_cover_extent():
    for extent in (96, 97, 100, 160, 250, 400):
        starts = tile_origins(extent, 96, 48)
        assert starts[0] == 0
        assert starts[-1] + 96 >= extent
        assert all(starts[i + 1] - starts[i] <= 48 for i in range(len(starts) - 1))
        # every interval of length <= tile - stride = 48 voxels (2.25 m)
        # lies fully inside some tile -> objects up to the largest ScanNet
        # anchor (53 vox) are whole in >= 1 tile for all but boundary cases
        for lo in range(0, extent - 48):
            assert any(s <= lo and lo + 48 <= s + 96 for s in starts)


def test_tile_origins_small_extent():
    assert tile_origins(48, 96, 64) == [0]


def test_pad_volume_free_space():
    data = np.random.RandomState(0).rand(50, 48, 70, 2).astype(np.float32)
    out = pad_volume(data, (96, 48, 96))
    assert out.shape == (96, 48, 96, 2)
    np.testing.assert_array_equal(out[:50, :, :70], data)
    assert (out[50:, :, :, 0] == 3.0).all() and (out[50:, :, :, 1] == 1.0).all()
    assert (out[:, :, 70:, 0] == 3.0).all() and (out[:, :, 70:, 1] == 1.0).all()


def test_stitch_nms_dedup(scannet_cfg):
    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    det = Detector(scannet_cfg, anchor_dir="experiments/anchors")
    si = SceneInference.__new__(SceneInference)
    si.cfg = scannet_cfg
    boxes = np.array(
        [
            [0, 0, 0, 10, 10, 10],
            [1, 1, 1, 10, 10, 10],  # duplicate of 0, lower conf
            [0, 0, 0, 10, 10, 10],  # same box, different class -> kept
            [40, 0, 0, 50, 10, 10],
        ],
        np.float32,
    )
    classes = np.array([3, 3, 5, 3])
    confs = np.array([0.9, 0.7, 0.8, 0.6])
    keep = si._stitch_nms(boxes, classes, confs, thresh=0.25)
    assert set(keep.tolist()) == {0, 2, 3}


@pytest.mark.slow
def test_scene_inference_smoke(scannet_cfg):
    import jax

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    cfg = scannet_cfg.copy()
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 8
    cfg.CLASS_THRESH = 0.0  # untrained net: accept everything valid
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    si = SceneInference(det, cfg, tile_batch=4)
    scene = np.random.RandomState(0).randn(100, 40, 100, 2).astype(np.float32)
    out = si.detect(params, scene)
    assert out["pred_box"].shape[1] == 6
    assert np.isfinite(out["pred_box"]).all()
    assert (out["pred_box"][:, :3] >= 0).all()
    assert (out["pred_box"][:, 3] <= 100).all()
    assert (out["pred_class"] > 0).all()
    # confidences sorted by the stitch keep order
    if len(out["pred_conf"]) > 1:
        assert (np.diff(out["pred_conf"]) <= 1e-6).all()
    few = {k: v[:2] for k, v in out.items()}  # mask FCN is slow on test CPU
    masks = si.predict_masks(params, scene, few)
    assert len(masks) == len(few["pred_box"])
    for m, b in zip(masks, few["pred_box"]):
        r = np.round(b).astype(int)
        assert m.shape == tuple(r[3:] - r[:3])


@pytest.mark.slow
def test_prefetch_scene_stream_equivalence(scannet_cfg):
    """prefetch_scene (background upload thread) must be a pure pipelining
    optimization: detections identical to the direct path, across a stream
    of scenes, including re-detection of an already-consumed scene."""
    import jax

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    cfg = scannet_cfg.copy()
    cfg.TPU_TILE_SIZE = [48, 48, 48]
    cfg.TPU_TILE_STRIDE = [36, 36, 36]
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 8
    cfg.CLASS_THRESH = 0.0
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    si = SceneInference(det, cfg, tile_batch=4)

    scenes = [
        np.random.RandomState(i).randn(60, 48, 60, 2).astype(np.float32)
        for i in range(3)
    ]
    direct = [si.detect(params, s) for s in scenes]

    si2 = SceneInference(det, cfg, tile_batch=4)
    si2.prefetch_scene(scenes[0])
    streamed = []
    for j, s in enumerate(scenes):
        if j + 1 < len(scenes):
            si2.prefetch_scene(scenes[j + 1])
        streamed.append(si2.detect(params, s))
    # re-detect a consumed scene: falls back to a fresh synchronous upload
    streamed[0] = si2.detect(params, scenes[0])

    for want, got in zip(direct, streamed):
        for k in want:
            np.testing.assert_array_equal(want[k], got[k])


@pytest.mark.slow
def test_tiled_mesh_matches_single_device(scannet_cfg):
    """Tile batches shard_mapped over a 4-device mesh must stitch to exactly
    the single-device detections (scene + params replicated, same tile math,
    including when the batch count does not divide the mesh size)."""
    import jax
    from jax.sharding import Mesh

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    cfg = scannet_cfg.copy()
    cfg.TPU_TILE_SIZE = [48, 48, 48]
    cfg.TPU_TILE_STRIDE = [36, 36, 36]
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 8
    cfg.CLASS_THRESH = 0.0
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    scene = np.random.RandomState(3).randn(84, 48, 84, 2).astype(np.float32)

    si1 = SceneInference(det, cfg, tile_batch=2)
    single = si1.detect(params, scene)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tiles",))
    si4 = SceneInference(det, cfg, tile_batch=2, mesh=mesh)
    sharded = si4.detect(params, scene)
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k])

    # mask windows shard across the mesh too (3 boxes over 4 devices
    # exercises the mesh-divisible padding); same masks bit for bit
    few = {k: v[:3] for k, v in single.items()}
    m1 = si1.predict_masks(params, scene, few)
    m4 = si4.predict_masks(params, scene, few)
    assert len(m1) == len(m4) == len(few["pred_box"])
    for a, b in zip(m1, m4):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_predict_masks_oversize_box_exact(scannet_cfg):
    """A box larger than the tile canvas gets a halo-windowed mask equal to
    the exact full-scene-crop computation (round-1 truncated it)."""
    import jax
    import jax.numpy as jnp

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector
    from tpu3dsis.ops.mask_windows import plan_windows_np

    cfg = scannet_cfg.copy()
    cfg.TPU_TILE_SIZE = [48, 48, 48]
    cfg.TPU_TILE_STRIDE = [36, 36, 36]
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    si = SceneInference(det, cfg, tile_batch=2)

    scene = np.random.RandomState(1).randn(96, 48, 48, 2).astype(np.float32)
    box = np.array([10, 4, 4, 90, 20, 20], np.float32)  # 80 voxels in x
    det_out = {
        "pred_box": box[None],
        "pred_class": np.array([3], np.int32),
        "pred_conf": np.array([0.9], np.float32),
    }
    items = plan_windows_np(box, scene.shape[:3], cfg.TPU_TILE_SIZE)
    assert len(items) > 1  # actually multi-window
    got = si.predict_masks(params, scene, det_out)
    assert len(got) == 1 and got[0].shape == (80, 16, 16)

    # oracle: exact-crop math = full-scene canvas with the box region mask
    r = np.round(box).astype(int)
    ix, iy, iz = np.ogrid[:96, :48, :48]
    region = (
        (ix >= r[0]) & (ix < r[3]) & (iy >= r[1]) & (iy < r[4])
        & (iz >= r[2]) & (iz < r[5])
    ).astype(np.float32)
    probs = det.mask_backbone.apply(
        params,
        jnp.asarray((scene * region[..., None])[None]),
        training=False,
        region_mask=jnp.asarray(region[None, ..., None]),
        compute_dtype=det.cfg_static["compute_dtype"],
    )
    want = (
        np.asarray(probs[0, :, :, :, 3]) >= float(cfg.MASK_THRESH)
    ).astype(np.uint8)[r[0]:r[3], r[1]:r[4], r[2]:r[5]]
    # identical math up to f32 reassociation; allow flips only at the
    # threshold boundary (<0.5% of voxels)
    mismatch = (got[0] != want).mean()
    assert mismatch < 0.005, f"mask mismatch fraction {mismatch}"


@pytest.mark.slow
def test_predict_masks_small_canvas_bucketing(scannet_cfg):
    """Boxes that fit the small canvas route through the small-canvas FCN
    program; the region-masked FCN is canvas-size independent on region
    voxels, so bucketed masks must equal the large-canvas-only path."""
    import jax

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    cfg = scannet_cfg.copy()
    cfg.TPU_TILE_SIZE = [48, 48, 48]
    cfg.TPU_TILE_STRIDE = [36, 36, 36]
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))

    scene = np.random.RandomState(2).randn(96, 48, 48, 2).astype(np.float32)
    det_out = {
        "pred_box": np.array(
            [
                [5, 5, 5, 20, 18, 21],     # small: fits 32^3
                [30, 2, 2, 75, 40, 40],    # large: 45 voxels in x
                [60, 30, 30, 70, 40, 44],  # small again (order mixing)
            ],
            np.float32,
        ),
        "pred_class": np.array([3, 5, 7], np.int32),
        "pred_conf": np.array([0.9, 0.8, 0.7], np.float32),
    }

    si_b = SceneInference(det, cfg, tile_batch=2)
    assert si_b.mask_canvas_small is not None
    bucketed = si_b.predict_masks(params, scene, det_out)

    cfg2 = cfg.copy()
    cfg2.TPU_MASK_INFER_CANVAS_SMALL = list(si_b.mask_canvas)  # disable
    si_l = SceneInference(det, cfg2, tile_batch=2)
    assert si_l.mask_canvas_small is None
    plain = si_l.predict_masks(params, scene, det_out)

    assert len(bucketed) == len(plain) == 3
    for a, b in zip(bucketed, plain):
        assert a.shape == b.shape
        # identical math up to f32 reassociation; allow flips only at the
        # sigmoid threshold boundary
        assert (a != b).mean() < 0.005


@pytest.mark.slow
def test_fused_matches_multidispatch(scannet_cfg):
    """The one-dispatch fused scene program (device stitch NMS + in-graph
    window planning + mask FCN) must reproduce detect() + predict_masks()
    exactly: same greedy NMS algorithm, same window plans, same crop math."""
    import jax

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    cfg = scannet_cfg.copy()
    cfg.TPU_TILE_SIZE = [48, 48, 48]
    cfg.TPU_TILE_STRIDE = [36, 36, 36]
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 8
    cfg.CLASS_THRESH = 0.0  # untrained net: accept everything valid
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    scene = np.random.RandomState(5).randn(60, 48, 60, 2).astype(np.float32)

    si = SceneInference(det, cfg, tile_batch=2)
    want_det = si.detect(params, scene)
    want_masks = si.predict_masks(params, scene, want_det)

    si2 = SceneInference(det, cfg, tile_batch=2)
    got_det, got_masks = si2.infer(params, scene)
    assert si2._last_fused, "fused path fell back unexpectedly"

    assert len(got_det["pred_box"]) == len(want_det["pred_box"])
    np.testing.assert_allclose(
        got_det["pred_box"], want_det["pred_box"], atol=1e-5
    )
    np.testing.assert_array_equal(got_det["pred_class"], want_det["pred_class"])
    np.testing.assert_allclose(
        got_det["pred_conf"], want_det["pred_conf"], rtol=1e-6
    )
    assert len(got_masks) == len(want_masks)
    for a, b in zip(got_masks, want_masks):
        assert a.shape == b.shape
        if a.size == 0:  # degenerate clipped box: empty mask on both paths
            continue
        # identical crop math; flips only at the sigmoid threshold boundary
        assert (a != b).mean() < 0.005


def test_tile_coverage_longest_anchor():
    """Default tile/stride must fully contain every object up to the longest
    ScanNet anchor extent (53 voxels, scannet14_11.txt) on every axis, for
    any scene size and any object position (round-1 stride 48 violated
    this for 49-53 voxel objects)."""
    from tpu3dsis.config import default_config

    cfg = default_config()
    tile = cfg.TPU_TILE_SIZE
    stride = cfg.TPU_TILE_STRIDE
    longest = np.zeros(3)
    for f in ("scannet14_3.txt", "scannet14_11.txt"):
        anchors = np.loadtxt(f"experiments/anchors/{f}", delimiter=",")
        longest = np.maximum(longest, np.ceil(anchors.max(0)))
    np.testing.assert_array_equal(longest, [53, 39, 53])
    for t, s, a in zip(tile, stride, longest):
        assert t - s >= a
    # exhaustive 1D check: every interval of length `longest[ax]` is inside
    # some tile, for scene extents from chunk-sized to benchmark-sized
    for extent in (48, 64, 96, 97, 140, 240, 400, 401):
        for t, s, a in zip(tile, stride, longest.astype(int)):
            if extent < t:
                continue  # single end-clamped tile covers everything
            starts = tile_origins(extent, t, s)
            for lo in range(0, extent - a + 1):
                assert any(o <= lo and lo + a <= o + t for o in starts), (
                    extent, t, s, lo
                )
