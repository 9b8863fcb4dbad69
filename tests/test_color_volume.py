"""Scene-resident color volume (infer/color_volume.py): exactness vs the
reference fusion semantics (EVERY view max-fused into a full-scene volume,
lib/nets/network.py:220-235), the fused single-gather view projection, and
the coord_offset projection identity."""

import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.projection import (
    compute_projection,
    fuse_views,
    merge_bf16x3,
    project_features,
    project_view_fused,
    project_view_split,
    split_bf16x3,
)
from tpu3dsis.infer.color_volume import make_color_volume_fn
from tpu3dsis.models.color import ColorProjector


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _proj(w=8, h=6, voxel=0.25):
    cfg = _Cfg(
        USE_IMAGES_GT=True,
        INTRINSIC=[
            [7.0, 0, 3.5, 0],
            [0, 7.5, 2.5, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        DEPTH_SHAPE=[w, h],
        PROJ_DEPTH_MIN=0.4,
        PROJ_DEPTH_MAX=4.0,
        VOXEL_SIZE=voxel,
        COLOR_MEAN=[0.0, 0.0, 0.0],
        COLOR_STD=[1.0, 1.0, 1.0],
    )
    return ColorProjector(cfg)


def _frames(rng, proj, v, c=5):
    w, h = proj.depth_shape
    feats = rng.randn(v, h, w, c).astype(np.float32)
    depths = rng.uniform(0.5, 3.8, (v, h, w)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    for i in range(v):
        # cameras around the scene, rotated about y, looking inward
        ang = 2 * np.pi * i / v
        rot = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ],
            np.float32,
        )
        poses[i, :3, :3] = rot
        poses[i, :3, 3] = [
            3.0 + 2.5 * np.sin(ang),
            1.0,
            3.0 - 2.5 * np.cos(ang),
        ]
    return feats, depths, poses


def _w2g(voxel=0.25):
    m = np.diag([1 / voxel, 1 / voxel, 1 / voxel, 1.0]).astype(np.float32)
    return m


def test_coord_offset_matches_full_grid_slice(rng):
    proj = _proj()
    feats, depths, poses = _frames(rng, proj, 1)
    scene = (24, 16, 24)
    full_lin, full_valid = compute_projection(
        jnp.asarray(depths[0]), jnp.asarray(poses[0]), jnp.asarray(_w2g()),
        jnp.asarray(proj.intrinsic), scene, proj.depth_shape,
        proj.depth_min, proj.depth_max, proj.voxel_size,
    )
    crop = (8, 8, 8)
    off = np.array([4, 2, 10], np.int32)
    lin, valid = compute_projection(
        jnp.asarray(depths[0]), jnp.asarray(poses[0]), jnp.asarray(_w2g()),
        jnp.asarray(proj.intrinsic), crop, proj.depth_shape,
        proj.depth_min, proj.depth_max, proj.voxel_size,
        coord_offset=jnp.asarray(off),
    )
    np.testing.assert_array_equal(
        np.asarray(lin),
        np.asarray(full_lin)[4:12, 2:10, 10:18],
    )
    np.testing.assert_array_equal(
        np.asarray(valid),
        np.asarray(full_valid)[4:12, 2:10, 10:18],
    )


def test_bf16x3_split_roundtrips_f32_exactly(rng):
    x = np.concatenate(
        [
            rng.uniform(0.05, 4.5, 4096).astype(np.float32),
            np.float32([0.0, 1.0, 0.1, 3.9999998, 2.0**-20]),
        ]
    )
    h1, h2, h3 = split_bf16x3(jnp.asarray(x))
    back = np.asarray(merge_bf16x3(h1, h2, h3))
    np.testing.assert_array_equal(back, x)


def test_fused_single_gather_matches_two_pass_projection(rng):
    proj = _proj()
    feats, depths, poses = _frames(rng, proj, 1, c=16)
    feats = jnp.asarray(feats[0]).astype(jnp.bfloat16)
    scene = (24, 16, 24)
    lin2d, valid = compute_projection(
        jnp.asarray(depths[0]), jnp.asarray(poses[0]), jnp.asarray(_w2g()),
        jnp.asarray(proj.intrinsic), scene, proj.depth_shape,
        proj.depth_min, proj.depth_max, proj.voxel_size,
    )
    ref = project_features(feats, lin2d, valid)
    got = project_view_fused(
        feats, jnp.asarray(depths[0]), jnp.asarray(poses[0]),
        jnp.asarray(_w2g()), jnp.asarray(proj.intrinsic), scene,
        proj.depth_shape, proj.depth_min, proj.depth_max, proj.voxel_size,
    )
    assert int(valid.sum()) > 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_split_projection_bit_exact_at_lane_width(rng):
    """project_view_split (lane-aligned 128-wide gather + separable one-hot
    depth lookup on the MXU) must be bit-identical to project_view_fused:
    the same f32 depth value must reach the acceptance predicate, so the
    kept-voxel SET — not just the features — matches exactly. Also pins the
    fuse_views dispatch: at C % 128 == 0 the gather path must route through
    the split kernel and still equal the prefer_gather=False oracle."""
    proj = _proj()
    v = 3
    feats, depths, poses = _frames(rng, proj, v, c=128)
    scene = (24, 16, 24)
    w2g = _w2g()

    for i in range(v):
        fused = project_view_fused(
            jnp.asarray(feats[i]).astype(jnp.bfloat16),
            jnp.asarray(depths[i]), jnp.asarray(poses[i]),
            jnp.asarray(w2g), jnp.asarray(proj.intrinsic), scene,
            proj.depth_shape, proj.depth_min, proj.depth_max,
            proj.voxel_size,
        )
        split = project_view_split(
            jnp.asarray(feats[i]).astype(jnp.bfloat16),
            jnp.asarray(depths[i]), jnp.asarray(poses[i]),
            jnp.asarray(w2g), jnp.asarray(proj.intrinsic), scene,
            proj.depth_shape, proj.depth_min, proj.depth_max,
            proj.voxel_size,
        )
        assert float(jnp.abs(fused.astype(jnp.float32)).sum()) > 0
        np.testing.assert_array_equal(np.asarray(split), np.asarray(fused))

    oracle = fuse_views(
        jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(depths),
        jnp.asarray(poses), jnp.asarray(w2g), jnp.asarray(proj.intrinsic),
        scene, proj.depth_shape, proj.depth_min, proj.depth_max,
        proj.voxel_size, prefer_gather=False,
    )
    got = fuse_views(
        jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(depths),
        jnp.asarray(poses), jnp.asarray(w2g), jnp.asarray(proj.intrinsic),
        scene, proj.depth_shape, proj.depth_min, proj.depth_max,
        proj.voxel_size, prefer_gather=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(oracle))


def test_resident_volume_exact_vs_reference_fusion_semantics(rng):
    """The resident builder (fused single-gather path) must equal the
    one-hot fuse_views construction — which is itself pinned against the
    reference's pairwise view max-pool in test_color_pipeline — including
    view_valid masking of padded views."""
    proj = _proj()
    v = 7
    feats, depths, poses = _frames(rng, proj, v)
    scene = (32, 16, 32)
    w2g = _w2g()

    oracle = fuse_views(
        jnp.asarray(feats).astype(jnp.bfloat16), jnp.asarray(depths),
        jnp.asarray(poses), jnp.asarray(w2g), jnp.asarray(proj.intrinsic),
        scene, proj.depth_shape, proj.depth_min, proj.depth_max,
        proj.voxel_size,
    )
    assert float(jnp.abs(oracle.astype(jnp.float32)).sum()) > 0

    build = make_color_volume_fn(proj, scene, jnp.bfloat16)
    # pad views the way _prepare_color's 32-view bucketing does
    pad = 3
    feats_p = np.concatenate([feats, np.zeros((pad, *feats.shape[1:]),
                                              feats.dtype)])
    depths_p = np.concatenate([depths, np.zeros((pad, *depths.shape[1:]),
                                                depths.dtype)])
    poses_p = np.concatenate(
        [poses, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))]
    )
    got = build(
        jnp.asarray(feats_p), jnp.asarray(depths_p), jnp.asarray(poses_p),
        jnp.asarray(w2g), jnp.asarray(np.arange(v + pad) < v),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(oracle))


def test_view_blocking_exact_for_any_k(rng):
    """views_per_step blocks the scan K views at a time (one carry RMW per
    block). Max is associative and invalid views enter the block max as
    -inf, so every K — including K that does not divide V, forcing padding
    — must be value-identical to the sequential scan."""
    proj = _proj()
    v = 7
    feats, depths, poses = _frames(rng, proj, v)
    scene = (32, 16, 32)
    w2g = _w2g()
    view_valid = np.array([True, True, False, True, True, True, False])

    def run(k, prefer_gather):
        return np.asarray(
            fuse_views(
                jnp.asarray(feats).astype(jnp.bfloat16),
                jnp.asarray(depths), jnp.asarray(poses), jnp.asarray(w2g),
                jnp.asarray(proj.intrinsic), scene, proj.depth_shape,
                proj.depth_min, proj.depth_max, proj.voxel_size,
                view_valid=jnp.asarray(view_valid),
                prefer_gather=prefer_gather, views_per_step=k,
            )
        )

    ref = run(1, False)
    assert np.abs(ref.astype(np.float32)).sum() > 0
    for k in (2, 3, 4, 7, 8):
        np.testing.assert_array_equal(run(k, False), ref)
        np.testing.assert_array_equal(run(k, True), ref)
