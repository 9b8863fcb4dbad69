"""Projection vs a numpy oracle of the reference math; mAP sanity."""

import numpy as np
import jax.numpy as jnp

from tpu3dsis.eval import DetectionMAP
from tpu3dsis.geometry.projection import (
    compute_projection,
    fuse_views,
    project_features,
)


def np_projection_oracle(
    depth, c2w, w2g, K, vol_dims, image_dims, dmin, dmax, vsize
):
    """Reference acceptance predicate (lib/layer_utils/projection.py:85-110)
    evaluated per voxel, as scatter targets."""
    W, H = image_dims
    w2c = np.linalg.inv(c2w)
    g2w = np.linalg.inv(w2g)
    out_lin = -np.ones(vol_dims, np.int64)
    for x in range(vol_dims[0]):
        for y in range(vol_dims[1]):
            for z in range(vol_dims[2]):
                p = w2c @ (g2w @ np.array([x, y, z, 1.0]))
                px = int(np.round(p[0] * K[0, 0] / p[2] + K[0, 2]))
                py = int(np.round(p[1] * K[1, 1] / p[2] + K[1, 2]))
                if not (0 <= px < W and 0 <= py < H):
                    continue
                d = depth[py, px]
                if d < dmin or d > dmax or abs(d - p[2]) > vsize:
                    continue
                out_lin[x, y, z] = py * W + px
    return out_lin


def make_frame(rng):
    W, H = 8, 6
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 7.0, 7.5, 3.5, 2.5
    # camera at -3m on z looking at grid; grid 0.25 m voxels at origin
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -1.0
    w2g = np.diag([4.0, 4.0, 4.0, 1.0]).astype(np.float32)  # 0.25 m voxels
    depth = rng.uniform(0.5, 3.5, (H, W)).astype(np.float32)
    return depth, c2w, w2g, K, (W, H)


def test_projection_matches_oracle(rng):
    depth, c2w, w2g, K, image_dims = make_frame(rng)
    vol = (6, 5, 7)
    expect = np_projection_oracle(
        depth, c2w, w2g, K, vol, image_dims, 0.4, 4.0, 0.25
    )
    lin2d, valid = compute_projection(
        jnp.asarray(depth),
        jnp.asarray(c2w),
        jnp.asarray(w2g),
        jnp.asarray(K),
        vol,
        image_dims,
        0.4,
        4.0,
        0.25,
    )
    lin2d, valid = np.asarray(lin2d), np.asarray(valid)
    assert valid.any(), "degenerate test setup: nothing projects"
    np.testing.assert_array_equal(valid, expect >= 0)
    np.testing.assert_array_equal(lin2d[valid], expect[expect >= 0])


def test_project_features_gather(rng):
    depth, c2w, w2g, K, image_dims = make_frame(rng)
    vol = (6, 5, 7)
    C = 4
    feat = rng.randn(image_dims[1], image_dims[0], C).astype(np.float32)
    lin2d, valid = compute_projection(
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(w2g), jnp.asarray(K),
        vol, image_dims, 0.4, 4.0, 0.25,
    )
    out = np.asarray(project_features(jnp.asarray(feat), lin2d, valid))
    lin2d, valid = np.asarray(lin2d), np.asarray(valid)
    flat = feat.reshape(-1, C)
    for x in range(vol[0]):
        for y in range(vol[1]):
            for z in range(vol[2]):
                if valid[x, y, z]:
                    np.testing.assert_array_equal(
                        out[x, y, z], flat[lin2d[x, y, z]]
                    )
                else:
                    assert (out[x, y, z] == 0).all()


def test_fuse_views_max_and_killing(rng):
    depth, c2w, w2g, K, image_dims = make_frame(rng)
    vol = (6, 5, 7)
    C = 3
    V = 3
    feats = rng.randn(V, image_dims[1], image_dims[0], C).astype(np.float32)
    depths = np.stack([depth] * V)
    poses = np.stack([c2w] * V)
    fused = np.asarray(
        fuse_views(
            jnp.asarray(feats), jnp.asarray(depths), jnp.asarray(poses),
            jnp.asarray(w2g), jnp.asarray(K), vol, image_dims, 0.4, 4.0, 0.25,
        )
    )
    # per-view volumes, elementwise max
    vols = []
    for v in range(V):
        lin2d, valid = compute_projection(
            jnp.asarray(depths[v]), jnp.asarray(poses[v]), jnp.asarray(w2g),
            jnp.asarray(K), vol, image_dims, 0.4, 4.0, 0.25,
        )
        vols.append(np.asarray(project_features(jnp.asarray(feats[v]), lin2d, valid)))
    # reference semantics (network.py:224-235): init = view0's volume
    # (0-filled where uncovered), later views max in — NO extra zero floor,
    # so a voxel every view sees as negative stays negative
    expect = np.maximum(np.maximum(vols[0], vols[1]), vols[2])
    np.testing.assert_allclose(fused, expect, rtol=1e-6)

    # kill view 1 and 2: result = view0's volume verbatim (single-view
    # pass-through, matching the reference's killing_inds drop)
    fused0 = np.asarray(
        fuse_views(
            jnp.asarray(feats), jnp.asarray(depths), jnp.asarray(poses),
            jnp.asarray(w2g), jnp.asarray(K), vol, image_dims, 0.4, 4.0, 0.25,
            view_valid=jnp.asarray([True, False, False]),
        )
    )
    np.testing.assert_allclose(fused0, vols[0], rtol=1e-6)


def test_detection_map_half_recall():
    m = DetectionMAP(n_class=2, overlap_threshold=0.5)
    gt = np.array([[0, 0, 0, 10, 10, 10], [20, 20, 20, 30, 30, 30]], np.float32)
    gt_cls = np.array([1, 1])
    pred = np.array([[0, 0, 0, 10, 10, 10], [50, 50, 50, 60, 60, 60]], np.float32)
    pred_cls = np.array([1, 1])
    conf = np.array([0.9, 0.8])
    m.evaluate(pred, pred_cls, conf, gt, gt_cls)
    m.finalize()
    assert 0 in m.ignore_class  # class 0 has no gt
    assert abs(m.AP(1) - 0.5) < 1e-9
    assert abs(m.mAP() - 0.5) < 1e-9


def test_detection_map_duplicate_is_fp():
    m = DetectionMAP(n_class=2, overlap_threshold=0.5)
    gt = np.array([[0, 0, 0, 10, 10, 10]], np.float32)
    gt_cls = np.array([1])
    pred = np.tile(np.array([[0, 0, 0, 10, 10, 10]], np.float32), (2, 1))
    pred_cls = np.array([1, 1])
    conf = np.array([0.9, 0.8])
    m.evaluate(pred, pred_cls, conf, gt, gt_cls)
    m.finalize()
    acc = m.total_accumulators[1]
    assert acc.TP == 1 and acc.FN == 0
    assert len(acc.predictions) == 2  # one TP + one duplicate FP
    assert abs(m.AP(1) - 1.0) < 1e-9  # TP ranked above the duplicate


def test_detection_map_class_agnostic_rpn():
    m = DetectionMAP(n_class=1, overlap_threshold=0.25)
    gt = np.array([[0, 0, 0, 10, 10, 10]], np.float32)
    gt_cls = np.array([0])
    pred = np.array([[1, 1, 1, 11, 11, 11]], np.float32)
    pred_cls = np.array([-1])  # class-agnostic mode (evaluation.py:188)
    conf = np.array([0.7])
    m.evaluate(pred, pred_cls, conf, gt, gt_cls)
    m.finalize()
    assert m.total_accumulators[0].TP == 1
