"""Scene-resident color volume (infer/color_volume.py): exactness vs the
full-grid projection oracle (reference semantics: EVERY view max-fused,
lib/nets/network.py:220-235), planner coverage, and the coord_offset
projection identity."""

import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.projection import compute_projection, fuse_views
from tpu3dsis.infer.color_volume import (
    frustum_crop_shape,
    make_color_volume_fn,
    plan_view_crops,
)
from tpu3dsis.models.color import ColorProjector, frustum_bbox_grid


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


def test_planner_covers_frustum_aabbs(rng):
    proj = _proj()
    _, _, poses = _frames(rng, proj, 6)
    scene = (40, 16, 40)
    crop = (16, 16, 16)  # smaller than the frusta: forces splitting
    frusta = [
        frustum_bbox_grid(
            p, _w2g(), proj.intrinsic, proj.depth_shape,
            proj.depth_min, proj.depth_max,
        )
        for p in poses
    ]
    origins, view_idx, owners = plan_view_crops(frusta, scene, crop)
    assert len(origins) >= 6  # at least one window per in-scene view
    for i, (bmin, bmax) in enumerate(frusta):
        lo = np.maximum(np.floor(bmin).astype(int), 0)
        hi = np.minimum(np.ceil(bmax).astype(int), scene)
        if np.any(hi <= lo):
            continue
        # every voxel of AABB-intersect-scene lies in some window of view i
        covered = np.zeros(scene, bool)
        for o, vi in zip(origins, view_idx):
            if vi != i:
                continue
            covered[
                o[0] : o[0] + crop[0],
                o[1] : o[1] + crop[1],
                o[2] : o[2] + crop[2],
            ] = True
        assert covered[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]].all()
        # owner boxes partition the in-scene AABB exactly once (coverage
        # counting must not double-increment split views)
        owned = np.zeros(scene, np.int32)
        for ow, vi in zip(owners, view_idx):
            if vi != i:
                continue
            owned[ow[0] : ow[3], ow[1] : ow[4], ow[2] : ow[5]] += 1
        inside = owned[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
        assert (inside == 1).all()
        owned[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]] = 0
        assert (owned == 0).all()


def _resident(proj, scene, crop, feats, depths, poses, w2g):
    frusta = [
        frustum_bbox_grid(
            p, w2g, proj.intrinsic, proj.depth_shape,
            proj.depth_min, proj.depth_max,
        )
        for p in poses
    ]
    origins, view_idx, owners = plan_view_crops(frusta, scene, crop)
    build = make_color_volume_fn(proj, scene, crop, jnp.float32)
    return build(
        jnp.asarray(feats), jnp.asarray(depths), jnp.asarray(poses),
        jnp.asarray(w2g), jnp.asarray(origins), jnp.asarray(view_idx),
        jnp.asarray(owners), jnp.ones((len(origins),), bool),
        jnp.asarray(len(poses), jnp.int32),
    )


def test_resident_volume_exact_vs_full_grid_oracle(rng):
    proj = _proj()
    v = 7
    feats, depths, poses = _frames(rng, proj, v)
    scene = (32, 16, 32)
    w2g = _w2g()

    oracle = fuse_views(
        jnp.asarray(feats), jnp.asarray(depths), jnp.asarray(poses),
        jnp.asarray(w2g), jnp.asarray(proj.intrinsic), scene,
        proj.depth_shape, proj.depth_min, proj.depth_max, proj.voxel_size,
    )
    assert float(jnp.abs(oracle).sum()) > 0  # scene actually hit

    crop = frustum_crop_shape(proj, scene)
    got = _resident(proj, scene, crop, feats, depths, poses, w2g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(oracle))

    # force multi-window splitting (crop far below the frustum span)
    got_split = _resident(
        proj, scene, (16, 16, 16), feats, depths, poses, w2g
    )
    np.testing.assert_array_equal(np.asarray(got_split), np.asarray(oracle))


def test_crop_shape_bounds_frustum_aabb(rng):
    proj = _proj()
    _, _, poses = _frames(rng, proj, 12)
    scene = (400, 48, 400)  # large enough not to clamp
    crop = frustum_crop_shape(proj, scene)
    for p in poses:
        bmin, bmax = frustum_bbox_grid(
            p, _w2g(), proj.intrinsic, proj.depth_shape,
            proj.depth_min, proj.depth_max,
        )
        span = np.ceil(bmax) - np.floor(bmin)
        assert (span <= np.asarray(crop)).all(), (span, crop)
