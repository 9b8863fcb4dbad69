"""Halo-window mask decomposition: planner properties + loss exactness.

The round-1 windowed mask canvas truncated boxes larger than the canvas
(VERDICT round 1, weak #4). These tests pin the fix: the planner's ownership
segments partition every box with valid halos, and windowed training loss
equals full-canvas loss even for an 80-voxel box.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsis.ops.mask_windows import (
    HALO,
    plan_windows,
    plan_windows_np,
    windows_per_axis,
)


def _check_plan_items(items, box, scene, canvas):
    """Ownership partitions the box; every owned voxel has a valid halo."""
    r0 = np.clip(np.round(box[:3]).astype(int), 0, np.array(scene) - 1)
    r1 = np.clip(np.round(box[3:]).astype(int), r0 + 1, scene)
    covered = np.zeros(tuple(r1 - r0), np.int32)
    for start, local, own in items:
        assert (start >= 0).all()
        assert (start + canvas <= scene).all()
        for ax in range(3):
            lo, hi = own[ax], own[3 + ax]
            assert r0[ax] <= lo < hi <= r1[ax]
            # exactness: each owned face is either >= HALO voxels from the
            # window face, or the window face lies outside the box
            wlo, whi = start[ax], start[ax] + canvas[ax]
            assert lo - wlo >= HALO or wlo <= r0[ax]
            assert whi - hi >= HALO or whi >= r1[ax]
        covered[
            own[0] - r0[0] : own[3] - r0[0],
            own[1] - r0[1] : own[4] - r0[1],
            own[2] - r0[2] : own[5] - r0[2],
        ] += 1
    np.testing.assert_array_equal(covered, 1)


def test_np_planner_partitions_and_halos():
    scene = (96, 48, 96)
    canvas = (64, 48, 64)
    rng = np.random.RandomState(0)
    boxes = [np.array([4, 4, 4, 84, 40, 90], np.float32)]  # oversize x+z
    boxes.append(np.array([0, 0, 0, 96, 48, 96], np.float32))  # whole scene
    boxes.append(np.array([10, 10, 10, 20, 20, 20], np.float32))  # small
    boxes.append(np.array([40, 0, 88, 96, 7, 96], np.float32))  # edge sliver
    for _ in range(30):
        lo = rng.randint(0, np.array(scene) - 1)
        hi = lo + 1 + rng.randint(0, np.array(scene) - lo - 1)
        boxes.append(np.concatenate([lo, hi]).astype(np.float32))
    for box in boxes:
        items = plan_windows_np(box, scene, canvas)
        _check_plan_items(items, box, scene, canvas)


def test_jax_planner_matches_np_planner():
    scene = (96, 48, 96)
    canvas = (64, 48, 64)
    rois = np.array(
        [
            [4, 4, 4, 84, 40, 90],
            [10, 10, 10, 20, 20, 20],
            [0, 0, 0, 96, 48, 96],
            [-1e4, -1e4, -1e4, -1e4 + 1, -1e4 + 1, -1e4 + 1],
        ],
        np.float32,
    )
    valid = np.array([True, True, True, False])
    capacity = 4 + 12
    plan = jax.jit(
        lambda r, v: plan_windows(r, v, scene, canvas, capacity)
    )(jnp.asarray(rois), jnp.asarray(valid))
    assert int(plan["dropped"]) == 0
    got = {}
    for i in range(capacity):
        if not bool(plan["valid"][i]):
            continue
        ridx = int(plan["roi_idx"][i])
        start = np.asarray(plan["starts"][i])
        own = np.asarray(plan["own6"][i]) + np.concatenate([start, start])
        got.setdefault(ridx, []).append(
            (start, np.asarray(plan["locals6"][i]), own)
        )
    assert set(got) == {0, 1, 2}
    for ridx, items in got.items():
        want = plan_windows_np(rois[ridx], scene, canvas)
        assert len(items) == len(want)
        _check_plan_items(items, rois[ridx], scene, canvas)


def test_planner_drops_extras_not_primaries():
    scene = (96, 48, 96)
    canvas = (64, 48, 64)
    # two oversize rois (4 windows each) but zero spare slots
    rois = np.array(
        [[0, 0, 0, 96, 48, 96], [2, 2, 2, 90, 40, 90]], np.float32
    )
    plan = plan_windows(
        jnp.asarray(rois), jnp.ones(2, bool), scene, canvas, capacity=2
    )
    assert int(plan["dropped"]) == 6  # 8 real windows, 2 kept
    assert int(plan["valid"].sum()) == 2
    assert set(np.asarray(plan["roi_idx"])[np.asarray(plan["valid"])]) == {
        0,
        1,
    }  # one primary per roi survives


@pytest.mark.medium
def test_windowed_equals_full_for_80_voxel_box(rng, scannet_cfg):
    """VERDICT round-1 done-criterion: an 80-voxel box (larger than the
    32-voxel windowed canvas) trains with EXACTLY the full-canvas loss."""
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    shape = (96, 16, 32)
    assert windows_per_axis(96, 32) == 5  # truly multi-window in x
    gt = np.zeros((1, 4, 7), np.float32)
    gt[:, :, :3] = -1e4
    gt[:, :, 3:6] = -1e4 + 1
    gt[:, 0] = [4, 4, 4, 84, 12, 12, 3]  # 80 voxels along x
    batch = {
        "data": rng.randn(1, *shape, 2).astype(np.float32),
        "gt_box": gt,
        "gt_valid": np.pad(np.ones((1, 1), bool), ((0, 0), (0, 3))),
        "mask_canvas": np.zeros((1, *shape), np.float32),
    }
    # non-trivial gt mask inside the box
    blob = (rng.rand(80, 8, 8) > 0.5).astype(np.float32)
    batch["mask_canvas"][0, 4:84, 4:12, 4:12] = blob

    losses = []
    for canvas in (list(shape), [32, 16, 32]):
        cfg = scannet_cfg.copy()
        cfg.LABEL_MAP = ""
        cfg.TPU_MAX_GT = 4
        cfg.TPU_MAX_MASK_ROIS = 2
        cfg.TPU_MASK_EXTRA_WINDOWS = 8
        cfg.TRAIN.RPN_PRE_NMS_TOP_N = 32
        cfg.TRAIN.RPN_POST_NMS_TOP_N = 8
        cfg.RPN_BATCHSIZE = 16
        cfg.CLASS_BATCH_SIZE = 8
        cfg.TPU_MASK_CANVAS = canvas
        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = det.init_params(jax.random.PRNGKey(0))
        opt_init, step = build_train_step(det, cfg, shape, mesh=None)
        state = TrainState(params=params, opt=opt_init(params))
        _, m = step(state, batch, jax.random.PRNGKey(0))
        assert float(m["mask_windows_dropped"]) == 0.0
        losses.append(float(m["loss_mask"]))
    assert losses[0] > 0.1  # non-degenerate
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)


@pytest.mark.medium
def test_small_canvas_bucketed_training_equals_unbucketed(rng, scannet_cfg):
    """TPU_MASK_CANVAS_SMALL routes small rois through a small-canvas queue;
    with enough large-queue capacity (no drops) the mask loss must equal the
    single-queue path exactly (region-masked FCN is canvas-size
    independent)."""
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    shape = (96, 16, 32)
    gt = np.zeros((1, 4, 7), np.float32)
    gt[:, :, :3] = -1e4
    gt[:, :, 3:6] = -1e4 + 1
    gt[:, 0] = [4, 4, 4, 84, 12, 12, 3]   # 80 voxels along x: large queue
    gt[:, 1] = [8, 2, 18, 20, 12, 30, 5]  # 12-voxel box: small queue
    batch = {
        "data": rng.randn(1, *shape, 2).astype(np.float32),
        "gt_box": gt,
        "gt_valid": np.pad(np.ones((1, 2), bool), ((0, 0), (0, 2))),
        "mask_canvas": np.zeros((1, *shape), np.float32),
    }
    batch["mask_canvas"][0, 4:84, 4:12, 4:12] = (
        rng.rand(80, 8, 8) > 0.5
    ).astype(np.float32)
    batch["mask_canvas"][0, 8:20, 2:12, 18:30] = (
        rng.rand(12, 10, 12) > 0.5
    ).astype(np.float32)

    losses = []
    for small in ([0, 0, 0], [16, 16, 16]):
        cfg = scannet_cfg.copy()
        cfg.LABEL_MAP = ""
        cfg.TPU_MAX_GT = 4
        cfg.TPU_MAX_MASK_ROIS = 4
        cfg.TPU_MASK_EXTRA_WINDOWS = 8
        cfg.TRAIN.RPN_PRE_NMS_TOP_N = 32
        cfg.TRAIN.RPN_POST_NMS_TOP_N = 8
        cfg.RPN_BATCHSIZE = 16
        cfg.CLASS_BATCH_SIZE = 8
        cfg.TPU_MASK_CANVAS = [32, 16, 32]
        cfg.TPU_MASK_CANVAS_SMALL = small
        cfg.TPU_MAX_LARGE_MASK_ROIS = 4
        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = det.init_params(jax.random.PRNGKey(0))
        opt_init, step = build_train_step(det, cfg, shape, mesh=None)
        state = TrainState(params=params, opt=opt_init(params))
        _, m = step(state, batch, jax.random.PRNGKey(0))
        assert float(m["mask_windows_dropped"]) == 0.0
        losses.append(float(m["loss_mask"]))
    assert losses[0] > 0.1
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)


@pytest.mark.medium
def test_small_canvas_bucketed_full_canvas_capacity(rng, scannet_cfg):
    """Bucketing with TPU_MASK_CANVAS == chunk dims (the degenerate
    full-volume path) respects the reduced large-queue capacity: valid
    large rois beyond it are counted as dropped, never silently lost."""
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    shape = (96, 16, 32)
    gt = np.zeros((1, 4, 7), np.float32)
    gt[:, :, :3] = -1e4
    gt[:, :, 3:6] = -1e4 + 1
    gt[:, 0] = [4, 4, 4, 84, 12, 12, 3]
    gt[:, 1] = [10, 2, 2, 90, 14, 14, 5]  # second large roi
    batch = {
        "data": rng.randn(1, *shape, 2).astype(np.float32),
        "gt_box": gt,
        "gt_valid": np.pad(np.ones((1, 2), bool), ((0, 0), (0, 2))),
        "mask_canvas": np.zeros((1, *shape), np.float32),
    }
    cfg = scannet_cfg.copy()
    cfg.LABEL_MAP = ""
    cfg.TPU_MAX_GT = 4
    cfg.TPU_MAX_MASK_ROIS = 4
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 32
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 8
    cfg.RPN_BATCHSIZE = 16
    cfg.CLASS_BATCH_SIZE = 8
    cfg.TPU_MASK_CANVAS = list(shape)  # full-volume degenerate path
    cfg.TPU_MASK_CANVAS_SMALL = [8, 8, 8]
    cfg.TPU_MASK_EXTRA_WINDOWS = 0  # no halo windows in the degenerate path
    cfg.TPU_MAX_LARGE_MASK_ROIS = 1  # 2 large rois -> 1 must drop
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    opt_init, step = build_train_step(det, cfg, shape, mesh=None)
    state = TrainState(params=params, opt=opt_init(params))
    _, m = step(state, batch, jax.random.PRNGKey(0))
    assert float(m["mask_windows_dropped"]) >= 1.0
    assert np.isfinite(float(m["loss_mask"]))
