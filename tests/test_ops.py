"""NMS and RoIPool3D vs oracles ported from the reference's own CPU paths."""

import numpy as np
import jax.numpy as jnp

from tpu3dsis.ops import nms_mask, nms_keep_indices, roi_pool3d


def np_greedy_nms(dets, thresh):
    """Oracle: greedy +1-extent NMS (reference nms/pth_nms.py:7-45)."""
    x1, y1, z1, x2, y2, z2 = [dets[:, i] for i in range(6)]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1) * (z2 - z1 + 1)
    order = np.arange(0, dets.shape[0])
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        zz1 = np.maximum(z1[i], z1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        zz2 = np.minimum(z2[i], z2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        l = np.maximum(0.0, zz2 - zz1 + 1)
        inter = w * h * l
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return np.array(keep)


def rand_boxes(rng, n, scale=90.0):
    lo = rng.uniform(0, scale, (n, 3))
    sz = rng.uniform(2, 30, (n, 3))
    return np.concatenate([lo, lo + sz], axis=1).astype(np.float32)


def test_nms_matches_reference_cpu(rng):
    for trial in range(3):
        boxes = rand_boxes(rng, 120, scale=50.0)
        thresh = [0.1, 0.35, 0.5][trial]
        expect = np_greedy_nms(boxes, thresh)
        keep = np.asarray(nms_mask(jnp.asarray(boxes), thresh))
        got = np.where(keep)[0]
        np.testing.assert_array_equal(got, expect)


def test_nms_with_invalid_padding(rng):
    boxes = rand_boxes(rng, 60, scale=50.0)
    valid = np.ones(60, dtype=bool)
    valid[40:] = False
    expect = np_greedy_nms(boxes[:40], 0.3)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), 0.3, jnp.asarray(valid)))
    assert not keep[40:].any()
    np.testing.assert_array_equal(np.where(keep[:40])[0], expect)


def test_nms_keep_indices_fixed_size(rng):
    boxes = rand_boxes(rng, 80, scale=40.0)
    expect = np_greedy_nms(boxes, 0.25)
    idx, ok = nms_keep_indices(jnp.asarray(boxes), 0.25, 16)
    idx, ok = np.asarray(idx), np.asarray(ok)
    k = min(len(expect), 16)
    np.testing.assert_array_equal(idx[:k], expect[:16])
    assert ok[:k].all() and not ok[k:].any()


def np_roi_pool(features, rois, pooled, spatial_scale):
    """Oracle: reference python RoIPool loop (roi_pooling/roi_pool.py:53-199),
    channels-last features (W, H, L, C)."""
    W, H, L, C = features.shape
    out = np.zeros((len(rois), pooled, pooled, pooled, C), dtype=np.float32)
    for ri, roi in enumerate(rois):
        s = roi * spatial_scale
        rs = [int(np.floor(s[0])), int(np.floor(s[1])), int(np.floor(s[2]))]
        re = [int(np.ceil(s[3])), int(np.ceil(s[4])), int(np.ceil(s[5]))]
        rw = max(re[0] - rs[0], 1)
        rh = max(re[1] - rs[1], 1)
        rl = max(re[2] - rs[2], 1)
        bw, bh, bl = rw / pooled, rh / pooled, rl / pooled
        for pw in range(pooled):
            for ph in range(pooled):
                for pl in range(pooled):
                    ws = min(W, max(0, int(np.floor(pw * bw)) + rs[0]))
                    hs = min(H, max(0, int(np.floor(ph * bh)) + rs[1]))
                    ls = min(L, max(0, int(np.floor(pl * bl)) + rs[2]))
                    we = min(W, max(0, int(np.ceil((pw + 1) * bw)) + rs[0]))
                    he = min(H, max(0, int(np.ceil((ph + 1) * bh)) + rs[1]))
                    le = min(L, max(0, int(np.ceil((pl + 1) * bl)) + rs[2]))
                    if we <= ws or he <= hs or le <= ls:
                        continue
                    out[ri, pw, ph, pl] = features[ws:we, hs:he, ls:le].max(
                        axis=(0, 1, 2)
                    )
    return out


def test_roi_pool_matches_reference_cpu(rng):
    feat = rng.randn(24, 12, 24, 8).astype(np.float32)
    rois = np.stack(
        [
            np.array([0, 0, 0, 96, 48, 96], np.float32),  # whole volume
            np.array([4, 4, 4, 20, 20, 20], np.float32),
            np.array([1, 1, 1, 3, 3, 3], np.float32),  # sub-bin-size roi
            np.array([50, 20, 50, 90, 44, 90], np.float32),
            np.array([10.3, 7.7, 22.1, 33.9, 30.2, 55.5], np.float32),
        ]
    )
    expect = np_roi_pool(feat, rois, 4, 0.25)
    got = np.asarray(roi_pool3d(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_roi_pool_gradient_flows(rng):
    import jax

    feat = jnp.asarray(rng.randn(8, 8, 8, 4).astype(np.float32))
    rois = jnp.asarray(np.array([[0, 0, 0, 32, 32, 32]], np.float32))

    def loss(f):
        return roi_pool3d(f, rois, 2, 0.25).sum()

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.asarray(g).sum() > 0


def test_roi_pool_tabled_equals_reference_random(rng):
    """Production range-max-table path vs the direct masked version."""
    from tpu3dsis.ops.roi_pool3d import roi_pool3d_reference

    feat = rng.randn(24, 12, 24, 8).astype(np.float32)
    lo = rng.uniform(0, 90, (64, 3))
    hi = lo + rng.uniform(1, 60, (64, 3))
    rois = np.clip(
        np.concatenate([lo, hi], 1), 0, [96, 48, 96, 96, 48, 96]
    ).astype(np.float32)
    a = np.asarray(roi_pool3d(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25))
    b = np.asarray(
        roi_pool3d_reference(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25)
    )
    np.testing.assert_array_equal(a, b)


def test_roi_pool_cap_fallback_branch(rng, monkeypatch):
    """The production op silently switches to the masked path when the
    all-interval table would exceed _INTERVAL_TABLE_MAX_ELEMS
    (roi_pool3d.py:289-296). Pin (a) that an above-cap shape still matches
    the oracle and (b) that the cap actually selects the branch intended —
    by shrinking the cap so the SAME shape flips branches, and asserting
    the chosen implementation is the one the cap dictates."""
    import importlib

    rp = importlib.import_module("tpu3dsis.ops.roi_pool3d")

    feat = rng.randn(24, 12, 24, 8).astype(np.float32)
    lo = rng.uniform(0, 90, (16, 3))
    hi = lo + rng.uniform(1, 60, (16, 3))
    rois = np.clip(
        np.concatenate([lo, hi], 1), 0, [96, 48, 96, 96, 48, 96]
    ).astype(np.float32)
    elems = rp._interval_table_rows(24) * 12 * 24 * 8  # this shape's table

    calls = []
    real_interval = rp._pool_rois_interval
    real_masked = rp._roi_pool3d_masked
    monkeypatch.setattr(
        rp, "_pool_rois_interval",
        lambda *a: (calls.append("interval"), real_interval(*a))[1],
    )
    monkeypatch.setattr(
        rp, "_roi_pool3d_masked",
        lambda *a: (calls.append("masked"), real_masked(*a))[1],
    )

    want = np.asarray(
        rp.roi_pool3d_reference(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25)
    )

    # below cap -> interval table (jit cache bypassed via _roi_pool3d_prod)
    monkeypatch.setattr(rp, "_INTERVAL_TABLE_MAX_ELEMS", elems)
    a = np.asarray(
        rp._roi_pool3d_prod(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25)
    )
    assert calls == ["interval"]
    np.testing.assert_array_equal(a, want)

    # above cap -> masked fallback, same values
    calls.clear()
    monkeypatch.setattr(rp, "_INTERVAL_TABLE_MAX_ELEMS", elems - 1)
    b = np.asarray(
        rp._roi_pool3d_prod(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25)
    )
    assert calls == ["masked"]
    np.testing.assert_array_equal(b, want)


def test_roi_pool_above_default_cap_matches_oracle(rng):
    """A shape above the PRODUCTION cap (single-shot 240-voxel scene
    features: 60x12x60 stride-4 maps -> 337M table elems > 96M) through the
    public roi_pool3d, asserting the fallback path is numerically right at
    the shape production actually hits."""
    import importlib

    rp = importlib.import_module("tpu3dsis.ops.roi_pool3d")

    w, h, l, c = 60, 12, 60, 128
    assert rp._interval_table_rows(w) * h * l * c > rp._INTERVAL_TABLE_MAX_ELEMS
    feat = rng.randn(w, h, l, c).astype(np.float32)
    lo = rng.uniform(0, 220, (8, 3))
    hi = lo + rng.uniform(4, 100, (8, 3))
    rois = np.clip(
        np.concatenate([lo, hi], 1), 0, [240, 48, 240, 240, 48, 240]
    ).astype(np.float32)
    got = np.asarray(roi_pool3d(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25))
    want = np.asarray(
        rp.roi_pool3d_reference(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25)
    )
    np.testing.assert_array_equal(got, want)


def test_roi_pool_pallas_interpret_parity(rng):
    """Pallas TPU kernel (interpret mode on CPU) == XLA path."""
    from tpu3dsis.ops.roi_pool3d_pallas import roi_pool3d_pallas

    feat = rng.randn(24, 12, 24, 8).astype(np.float32)
    lo = rng.uniform(0, 90, (16, 3))
    hi = lo + rng.uniform(1, 60, (16, 3))
    rois = np.clip(
        np.concatenate([lo, hi], 1), 0, [96, 48, 96, 96, 48, 96]
    ).astype(np.float32)
    a = np.asarray(roi_pool3d(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25))
    b = np.asarray(
        roi_pool3d_pallas(
            jnp.asarray(feat), jnp.asarray(rois), 4, 0.25, interpret=True
        )
    )
    np.testing.assert_array_equal(a, b)


def test_nms_tiled_multi_tile_matches_oracle(rng):
    """Cross-tile + sandwich self-suppression path (N > tile)."""
    from tpu3dsis.ops.nms import nms_mask_scan

    boxes = rand_boxes(rng, 300, scale=60.0)
    for thresh in (0.1, 0.35):
        expect = np_greedy_nms(boxes, thresh)
        keep = np.asarray(nms_mask(jnp.asarray(boxes), thresh, tile=64))
        np.testing.assert_array_equal(np.where(keep)[0], expect)
        scan = np.asarray(nms_mask_scan(jnp.asarray(boxes), thresh))
        np.testing.assert_array_equal(keep, scan)
    # with validity padding crossing tile boundaries
    valid = np.ones(300, bool); valid[200:] = False
    expect = np_greedy_nms(boxes[:200], 0.3)
    keep = np.asarray(
        nms_mask(jnp.asarray(boxes), 0.3, jnp.asarray(valid), tile=64)
    )
    assert not keep[200:].any()
    np.testing.assert_array_equal(np.where(keep[:200])[0], expect)


def test_roi_pool_segmented_matches_reference(rng):
    """The one-pass segment variant (documented negative perf result) must
    stay bit-identical to the masked reduction / reference semantics."""
    import jax.numpy as jnp

    from tpu3dsis.ops.roi_pool3d import (
        roi_pool3d_reference,
        roi_pool3d_segmented,
    )

    feat = jnp.asarray(rng.randn(12, 8, 12, 16).astype(np.float32))
    rois = np.zeros((40, 6), np.float32)
    lo = rng.randint(0, 44, (40, 3))
    sz = rng.randint(1, 40, (40, 3))
    rois[:, :3] = lo
    rois[:, 3:] = lo + sz  # some extend past the volume: empty-bin clipping
    got = np.asarray(roi_pool3d_segmented(feat, jnp.asarray(rois), 4, 0.25))
    want = np.asarray(roi_pool3d_reference(feat, jnp.asarray(rois), 4, 0.25))
    np.testing.assert_array_equal(got, want)


def test_nms_class_aware_matches_per_class(rng):
    """classes= restricts suppression to same-class pairs; must equal
    running the plain greedy NMS independently per class (the host
    stitch-NMS semantics, infer/tiling.py::_stitch_nms). Multi-tile sizes
    exercise the cross-tile suppression path too."""
    for n, thresh in ((90, 0.25), (300, 0.35)):
        boxes = rand_boxes(rng, n, scale=60.0)
        classes = rng.randint(1, 5, size=n)
        keep = np.asarray(
            nms_mask(jnp.asarray(boxes), thresh, classes=jnp.asarray(classes))
        )
        expect = np.zeros(n, bool)
        for c in np.unique(classes):
            sel = np.where(classes == c)[0]
            expect[sel[np_greedy_nms(boxes[sel], thresh)]] = True
        np.testing.assert_array_equal(keep, expect)
