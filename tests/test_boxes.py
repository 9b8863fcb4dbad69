"""Box math vs independent numpy oracles (reference formulas re-derived)."""

import numpy as np
import jax.numpy as jnp

from tpu3dsis.geometry import (
    bbox_overlap,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    nms_overlap,
)


def rand_boxes(rng, n, scale=90.0):
    lo = rng.uniform(0, scale, (n, 3))
    sz = rng.uniform(1, 30, (n, 3))
    return np.concatenate([lo, lo + sz], axis=1).astype(np.float32)


def np_iou(a, b, plus_one=0.0):
    va = np.prod(a[:, 3:] - a[:, :3] + plus_one, axis=1)
    vb = np.prod(b[:, 3:] - b[:, :3] + plus_one, axis=1)
    inter = np.ones((a.shape[0], b.shape[0]))
    for d in range(3):
        w = (
            np.minimum(a[:, None, 3 + d], b[None, :, 3 + d])
            - np.maximum(a[:, None, d], b[None, :, d])
            + plus_one
        )
        inter *= np.clip(w, 0, None)
    return inter / (va[:, None] + vb[None, :] - inter)


def test_bbox_overlap_oracle(rng):
    a, b = rand_boxes(rng, 40), rand_boxes(rng, 17)
    got = np.asarray(bbox_overlap(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5)


def test_nms_overlap_plus_one(rng):
    a, b = rand_boxes(rng, 25), rand_boxes(rng, 25)
    got = np.asarray(nms_overlap(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b, plus_one=1.0), rtol=1e-5)


def test_transform_roundtrip(rng):
    anchors = rand_boxes(rng, 30)
    gts = rand_boxes(rng, 30)
    deltas = bbox_transform(jnp.asarray(anchors), jnp.asarray(gts))
    rec = bbox_transform_inv(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-3, atol=1e-3)


def test_transform_oracle(rng):
    """Exact encode formulas incl. epsilon placement (bbox_transform.py:47-53)."""
    anchors = rand_boxes(rng, 10)
    gts = rand_boxes(rng, 10)
    aw = anchors[:, 3:] - anchors[:, :3]
    ac = anchors[:, :3] + 0.5 * aw
    gw = gts[:, 3:] - gts[:, :3]
    gc = gts[:, :3] + 0.5 * gw
    expect = np.concatenate(
        [(gc - ac) / (aw + 1e-14), np.log(gw / (aw + 1e-14) + 1e-14)], axis=1
    )
    got = np.asarray(bbox_transform(jnp.asarray(anchors), jnp.asarray(gts)))
    # fp32 log vs fp64 oracle
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_transform_inv_multiclass(rng):
    """Per-class stride-6 decode column layout (bbox_transform.py:77-96)."""
    boxes = rand_boxes(rng, 8)
    deltas = rng.uniform(-0.2, 0.2, (8, 18)).astype(np.float32)
    got = np.asarray(bbox_transform_inv(jnp.asarray(boxes), jnp.asarray(deltas)))
    assert got.shape == (8, 18)
    # class k's decoded box should equal a single-class decode of its block
    for k in range(3):
        block = deltas[:, 6 * k : 6 * k + 6]
        single = np.asarray(
            bbox_transform_inv(jnp.asarray(boxes), jnp.asarray(block))
        )
        np.testing.assert_allclose(got[:, k::3], single, rtol=1e-5)


def test_clip(rng):
    boxes = rand_boxes(rng, 20, scale=120.0)
    got = np.asarray(clip_boxes(jnp.asarray(boxes), (96, 48, 96)))
    assert got[:, 0].max() <= 96 and got[:, 1].max() <= 48
    assert got.min() >= 0
