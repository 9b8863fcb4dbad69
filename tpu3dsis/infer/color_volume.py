"""Scene-resident projected color volume for whole-scene inference.

The reference materializes the FULL scene's projected 2D-feature volume once
and every stage crops from it (``lib/nets/network.py:187-235`` builds it by
incremental pairwise view max-pool; ``lib/model/trainval.py:882-897`` crops
it again for the mask head). Round-2's tiled color path instead re-projected
up to ``TPU_MAX_TILE_VIEWS`` frustum-selected views per tile — cheaper per
tile but (a) a documented semantic deviation (the view cap) and (b) ~4x
redundant projection compute across overlapping tiles, re-paid per window in
the mask phase.

This module restores the reference's semantics the TPU way: the color
volume is built ON DEVICE in one scan over (view, frustum-crop) work items —
each item projects one view into a fixed-size crop of the scene grid
(static shapes; the frustum AABB bounds where a view can ever pass the
acceptance predicate) and max-fuses it in place via dynamic read-modify-
write. Every view is fused, bit-identically to a full-grid projection
(``compute_projection(coord_offset=origin)`` feeds the same coordinate
floats through the same matrices), with compute proportional to frustum
volume instead of scene volume x views. Tiles and mask windows then slice
their color crops from the resident volume exactly like the geometry
channel — no per-tile projection at detect time at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.projection import compute_projection, project_features


def frustum_crop_shape(proj, scene_shape, multiple: int = 16):
    """Static per-view crop dims covering any single view's frustum AABB.

    Rotation-invariant bound: the frustum's 8 corners (image corners at
    depth_min/depth_max in camera space) have some maximum pairwise distance
    D; under any rigid pose the AABB span per axis is <= D, so D/voxel_size
    (+2 for ``frustum_bbox_grid``'s +-1 slack) voxels suffice per axis.
    Clamped to the (padded) scene dims; views whose in-scene AABB still
    exceeds the crop (non-rigid world_to_grid) are split by the planner, so
    exactness never depends on this bound.
    """
    w, h = proj.depth_shape
    fx, fy = proj.intrinsic[0][0], proj.intrinsic[1][1]
    cx, cy = proj.intrinsic[0][2], proj.intrinsic[1][2]
    corners = []
    for d in (proj.depth_min, proj.depth_max):
        for ux, uy in ((0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)):
            corners.append([d * (ux - cx) / fx, d * (uy - cy) / fy, d])
    corners = np.asarray(corners, np.float64)
    diam = max(
        float(np.linalg.norm(a - b)) for a in corners for b in corners
    )
    bound = int(np.ceil(diam / proj.voxel_size)) + 2
    bound = -(-bound // multiple) * multiple
    return tuple(min(int(s), bound) for s in scene_shape)


def plan_view_crops(frusta, scene_shape, crop_shape):
    """Host planner: one work item per (view, crop window).

    frusta: list of (bmin, bmax) grid-coord AABBs (``frustum_bbox_grid``).
    Views whose in-scene AABB fits the crop get one item; larger spans are
    covered by several windows (overlap is harmless — max is idempotent).
    Views with no scene overlap get no item. Returns (origins (M, 3) int32,
    view_idx (M,) int32).
    """
    origins, view_idx = [], []
    scene = np.asarray(scene_shape, np.int64)
    crop = np.asarray(crop_shape, np.int64)
    for i, (bmin, bmax) in enumerate(frusta):
        lo = np.maximum(np.floor(bmin).astype(np.int64), 0)
        hi = np.minimum(np.ceil(bmax).astype(np.int64), scene)
        if np.any(hi <= lo):
            continue
        axis_starts = []
        for a in range(3):
            span = int(hi[a] - lo[a])
            n = max(1, -(-span // int(crop[a])))
            starts = sorted(
                {
                    int(
                        min(
                            max(lo[a] + k * crop[a], 0),
                            scene[a] - crop[a],
                        )
                    )
                    for k in range(n)
                }
            )
            axis_starts.append(starts)
        for ox in axis_starts[0]:
            for oy in axis_starts[1]:
                for oz in axis_starts[2]:
                    origins.append((ox, oy, oz))
                    view_idx.append(i)
    if not origins:
        return np.zeros((0, 3), np.int32), np.zeros((0,), np.int32)
    return (
        np.asarray(origins, np.int32),
        np.asarray(view_idx, np.int32),
    )


def make_color_volume_fn(proj, scene_shape, crop_shape, out_dtype):
    """Jittable builder: (feats2d, depths, poses, world_to_grid, origins,
    view_idx, item_valid) -> (X, Y, Z, C) resident color volume.

    One ``lax.scan`` over work items; the carry is the scene volume, updated
    in place (dynamic slice -> elementwise max -> dynamic update). Padded
    items (item_valid False) contribute zeros — a no-op under max against
    the zero-initialized volume (reference ``Projection.forward`` zero-init,
    projection.py:129-136).
    """
    intr = jnp.asarray(proj.intrinsic)
    sx, sy, sz = (int(s) for s in scene_shape)
    cx, cy, cz = (int(c) for c in crop_shape)

    def build(feats2d, depths, poses, world_to_grid, origins, view_idx,
              item_valid):
        c = feats2d.shape[-1]
        vol = jnp.zeros((sx, sy, sz, c), out_dtype)

        def body(carry, item):
            origin, vi, ok = item
            lin2d, valid = compute_projection(
                depths[vi],
                poses[vi],
                world_to_grid,
                intr,
                (cx, cy, cz),
                proj.depth_shape,
                proj.depth_min,
                proj.depth_max,
                proj.voxel_size,
                coord_offset=origin,
            )
            v = project_features(feats2d[vi], lin2d, valid & ok)
            cur = jax.lax.dynamic_slice(
                carry, (origin[0], origin[1], origin[2], 0), (cx, cy, cz, c)
            )
            carry = jax.lax.dynamic_update_slice(
                carry,
                jnp.maximum(cur, v.astype(out_dtype)),
                (origin[0], origin[1], origin[2], 0),
            )
            return carry, None

        vol, _ = jax.lax.scan(body, vol, (origins, view_idx, item_valid))
        return vol

    return build
