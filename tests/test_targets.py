"""Target assignment vs deterministic numpy oracles of the reference math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu3dsis.train.targets import (
    _inflate_gt_for_level3,
    anchor_targets,
    mask_targets,
    proposal_targets,
)


def np_iou(a, b):
    va = np.prod(a[:, 3:6] - a[:, :3], axis=1)
    vb = np.prod(b[:, 3:6] - b[:, :3], axis=1)
    inter = np.ones((len(a), len(b)))
    for d in range(3):
        w = np.minimum(a[:, None, 3 + d], b[None, :, 3 + d]) - np.maximum(
            a[:, None, d], b[None, :, d]
        )
        inter *= np.clip(w, 0, None)
    return inter / (va[:, None] + vb[None, :] - inter)


def pad_gt(gt, max_gt=8):
    out = np.zeros((max_gt, 7), np.float32)
    out[:, :3] = -1e4
    out[:, 3:6] = -1e4 + 1
    out[: len(gt)] = gt
    valid = np.zeros(max_gt, bool)
    valid[: len(gt)] = True
    return jnp.asarray(out), jnp.asarray(valid)


def test_anchor_targets_deterministic_labels(rng):
    """With quotas above the counts, labels/targets are deterministic —
    compare against a direct port of anchor_target_layer.py:96-156,286-316."""
    anchors = np.concatenate(
        [
            rng.uniform(0, 60, (50, 3)),
            np.zeros((50, 3)),
        ],
        1,
    ).astype(np.float32)
    anchors[:, 3:6] = anchors[:, :3] + rng.uniform(4, 20, (50, 3))
    inside = (anchors[:, 3:] < 96).all(axis=1) & (anchors[:, :3] >= 0).all(
        axis=1
    )
    gt = np.array(
        [[10, 10, 10, 24, 22, 25, 3], [40, 20, 40, 55, 33, 52, 5]],
        np.float32,
    )
    gt_j, gv = pad_gt(gt)

    out = anchor_targets(
        jax.random.PRNGKey(0),
        {1: jnp.asarray(anchors)},
        {1: jnp.asarray(inside)},
        gt_j,
        gv,
        rpn_batchsize=10_000,  # no subsampling
        rpn_fg_fraction=0.5,
        pos_overlap=0.35,
        neg_overlap=0.15,
    )[1]

    ov = np_iou(anchors, gt[:, :6])
    argmax = ov.argmax(axis=1)
    mx = ov[np.arange(len(anchors)), argmax]
    labels = np.full(len(anchors), -1.0)
    labels[mx >= 0.35] = 1
    labels[mx < 0.15] = 0
    labels[~inside] = -1
    np.testing.assert_array_equal(np.asarray(out["labels"]), labels)

    # regression targets for positives = bbox_transform(anchor, assigned gt)
    pos = np.where(labels == 1)[0]
    if len(pos):
        a = anchors[pos]
        g = gt[argmax[pos], :6]
        aw = a[:, 3:] - a[:, :3]
        ac = a[:, :3] + aw / 2
        gw = g[:, 3:] - g[:, :3]
        gc = g[:, :3] + gw / 2
        expect = np.concatenate(
            [(gc - ac) / (aw + 1e-14), np.log(gw / (aw + 1e-14) + 1e-14)], 1
        )
        np.testing.assert_allclose(
            np.asarray(out["bbox_targets"])[pos], expect, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(out["inside_w"])[pos], np.ones((len(pos), 6))
        )
        np.testing.assert_allclose(
            np.asarray(out["outside_w"])[pos],
            np.full((len(pos), 6), 1.0 / len(pos)),
            rtol=1e-6,
        )
    neg = labels != 1
    assert (np.asarray(out["inside_w"])[neg] == 0).all()


def test_anchor_targets_subsampling_counts(rng):
    """RPN_BATCHSIZE / FG_FRACTION quotas are enforced exactly."""
    anchors = np.zeros((200, 6), np.float32)
    anchors[:, :3] = rng.uniform(0, 60, (200, 3))
    anchors[:, 3:] = anchors[:, :3] + 10
    inside = np.ones(200, bool)
    # half the anchors overlap gt strongly
    gt = np.array([[0, 0, 0, 90, 90, 90, 3]], np.float32)
    gt_j, gv = pad_gt(gt)
    out = anchor_targets(
        jax.random.PRNGKey(1),
        {1: jnp.asarray(anchors)},
        {1: jnp.asarray(inside)},
        gt_j, gv,
        rpn_batchsize=64, rpn_fg_fraction=0.5,
        pos_overlap=0.01, neg_overlap=0.005,
    )[1]
    labels = np.asarray(out["labels"])
    assert (labels == 1).sum() <= 32
    assert (labels == 1).sum() + (labels == 0).sum() <= 64


def test_level3_inflation_semantics():
    """Thin classes get +-2 on the thinnest dim; others y-degenerate
    (anchor_target_layer.py:175-203)."""
    gt = jnp.asarray(
        np.array(
            [
                [10, 10, 10, 30, 12, 30, 6],   # thin class, y thinnest
                [10, 10, 10, 30, 30, 30, 3],   # not thin class
            ],
            np.float32,
        )
    )
    out = np.asarray(_inflate_gt_for_level3(gt))
    np.testing.assert_allclose(out[0], [10, 8, 10, 30, 14, 30, 6])
    np.testing.assert_allclose(out[1], [10, 110, 10, 30, -70, 30, 3])


def test_proposal_targets_fg_labels_and_expansion(rng):
    """fg rows carry the assigned gt class and its 6-delta block; bg rows
    are class 0 with zero weights (proposal_target_layer.py:80-171)."""
    gt = np.array(
        [[10, 10, 10, 20, 20, 20, 3], [40, 40, 40, 60, 55, 60, 7]], np.float32
    )
    gt_j, gv = pad_gt(gt)
    # proposals: one perfect match per gt + far-away bg boxes
    rois = np.array(
        [
            [10, 10, 10, 20, 20, 20],
            [40, 40, 40, 60, 55, 60],
            [70, 5, 70, 80, 15, 80],
            [1, 30, 70, 9, 40, 80],
        ],
        np.float32,
    )
    out = proposal_targets(
        jax.random.PRNGKey(0),
        jnp.asarray(rois),
        jnp.ones(4, bool),
        jnp.asarray([1.0, 2.0, 1.0, 1.0]),
        gt_j, gv,
        num_classes=19, class_batch_size=8, fg_fraction=0.5,
        fg_thresh=0.5, bg_thresh=0.2, bg_thresh_lo=0.0, use_gt=True,
    )
    labels = np.asarray(out["labels"])
    brois = np.asarray(out["rois"])
    targets = np.asarray(out["bbox_targets"])
    inside = np.asarray(out["inside_w"])
    # first 4 rows are fg (quota = 4 of 8)
    assert set(labels[:4].tolist()) <= {3, 7}
    assert (labels[4:] == 0).all()
    for r in range(4):
        cls = labels[r]
        block = targets[r, 6 * cls : 6 * cls + 6]
        # perfect-match rois regress to ~zero deltas
        np.testing.assert_allclose(block, np.zeros(6), atol=1e-4)
        assert inside[r, 6 * cls : 6 * cls + 6].all()
        other = np.delete(
            targets[r].reshape(19, 6), cls, axis=0
        )
        assert (other == 0).all()
    assert (inside[4:] == 0).all()
    # gt injection levels: small gt (dims <= 20) -> level 1, larger -> 2
    levels = np.asarray(out["level_inds"])[:4]
    assert set(levels.tolist()) <= {1.0, 2.0}


def test_mask_targets_selects_fg(rng):
    gt = np.array([[10, 10, 10, 20, 20, 20, 3]], np.float32)
    gt_j, gv = pad_gt(gt)
    rois = np.array(
        [[11, 11, 11, 20, 20, 20], [70, 70, 70, 80, 80, 80]], np.float32
    )
    out = mask_targets(
        jnp.asarray(rois), jnp.ones(2, bool), gt_j, gv,
        mask_fg_thresh=0.5, max_mask_rois=4,
    )
    valid = np.asarray(out["valid"])
    labels = np.asarray(out["labels"])
    sel = np.asarray(out["rois"])
    # fg = the overlapping roi + the injected gt box itself
    assert valid.sum() == 2
    assert (labels[valid] == 3).all()
    np.testing.assert_allclose(sel[0], [11, 11, 11, 20, 20, 20])
    np.testing.assert_allclose(sel[1], [10, 10, 10, 20, 20, 20])


@pytest.mark.medium
def test_mask_canvas_windowing_loss_equivalence(rng, scannet_cfg):
    """Windowed mask-canvas training must equal full-canvas losses for boxes
    that fit the window (the exact-crop equivalence)."""
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    gt = np.zeros((1, 4, 7), np.float32)
    gt[:, :, :3] = -1e4
    gt[:, :, 3:6] = -1e4 + 1
    gt[:, 0] = [4, 4, 4, 12, 12, 12, 3]
    batch = {
        "data": rng.randn(1, 32, 16, 32, 2).astype(np.float32),
        "gt_box": gt,
        "gt_valid": np.pad(np.ones((1, 1), bool), ((0, 0), (0, 3))),
        "mask_canvas": np.zeros((1, 32, 16, 32), np.float32),
    }
    batch["mask_canvas"][:, 4:12, 4:12, 4:12] = 1.0

    losses = []
    for canvas in ([32, 16, 32], [16, 16, 16]):
        cfg = scannet_cfg.copy()
        cfg.LABEL_MAP = ""
        cfg.TPU_MAX_GT = 4
        cfg.TPU_MAX_MASK_ROIS = 2
        cfg.TRAIN.RPN_PRE_NMS_TOP_N = 32
        cfg.TRAIN.RPN_POST_NMS_TOP_N = 8
        cfg.RPN_BATCHSIZE = 16
        cfg.CLASS_BATCH_SIZE = 8
        cfg.TPU_MASK_CANVAS = canvas
        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = det.init_params(jax.random.PRNGKey(0))
        opt_init, step = build_train_step(det, cfg, (32, 16, 32), mesh=None)
        state = TrainState(params=params, opt=opt_init(params))
        _, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss_mask"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)


@pytest.mark.medium
def test_nonfinite_step_skips_update(rng, scannet_cfg):
    """A NaN in the input must yield step_finite=0 and UNCHANGED params/opt
    (the SURVEY 5.2 numeric guard), and a clean batch step_finite=1."""
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    cfg = scannet_cfg.copy()
    cfg.LABEL_MAP = ""
    cfg.TPU_MAX_GT = 4
    cfg.TPU_MAX_MASK_ROIS = 2
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 32
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 8
    cfg.RPN_BATCHSIZE = 16
    cfg.CLASS_BATCH_SIZE = 8
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    opt_init, step = build_train_step(det, cfg, (32, 16, 32), mesh=None)
    state = TrainState(params=params, opt=opt_init(params))

    gt = np.zeros((1, 4, 7), np.float32)
    gt[:, :, :3] = -1e4
    gt[:, :, 3:6] = -1e4 + 1
    gt[:, 0] = [4, 4, 4, 12, 12, 12, 3]
    batch = {
        "data": rng.randn(1, 32, 16, 32, 2).astype(np.float32),
        "gt_box": gt,
        "gt_valid": np.pad(np.ones((1, 1), bool), ((0, 0), (0, 3))),
        "mask_canvas": np.zeros((1, 32, 16, 32), np.float32),
    }
    batch["mask_canvas"][:, 4:12, 4:12, 4:12] = 1.0

    bad = dict(batch)
    bad["data"] = batch["data"].copy()
    bad["data"][0, 0, 0, 0, 0] = np.nan
    new_state, m = step(state, bad, jax.random.PRNGKey(0))
    assert float(m["step_finite"]) == 0.0
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(new_state.params[k]), np.asarray(state.params[k])
        )
    assert int(new_state.opt.step) == int(state.opt.step)

    good_state, m = step(state, batch, jax.random.PRNGKey(0))
    assert float(m["step_finite"]) == 1.0
    assert np.isfinite(float(m["total_loss"]))
    changed = any(
        not np.array_equal(np.asarray(good_state.params[k]),
                           np.asarray(state.params[k]))
        for k in params
    )
    assert changed
