"""Color stream: 2D features (ENet or gt labels) projected into the voxel grid.

Replaces the reference's host-orchestrated per-frame pipeline (ENet forward,
``compute_projection`` on the host, ``Projection.apply`` scatter and view
max-pool in ``network.py:90-115``) with one on-device program: batched ENet
over views -> dense per-voxel gather -> running max over views (see
``tpu3dsis.geometry.projection``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.projection import fuse_views
from tpu3dsis.models.enet2d import ENet2D


class ColorProjector:
    """Static config + pure apply. Owns the ENet when USE_IMAGES_GT=False."""

    def __init__(self, cfg):
        self.use_gt = bool(cfg.USE_IMAGES_GT)
        self.enet = None if self.use_gt else ENet2D(int(cfg.NUM_2D_CLASSES))
        self.intrinsic = np.asarray(cfg.INTRINSIC, np.float32)
        self.depth_shape = tuple(int(x) for x in cfg.DEPTH_SHAPE)  # (W, H)
        self.depth_min = float(cfg.PROJ_DEPTH_MIN)
        self.depth_max = float(cfg.PROJ_DEPTH_MAX)
        self.voxel_size = float(cfg.VOXEL_SIZE)
        self.color_mean = np.asarray(cfg.COLOR_MEAN, np.float32)
        self.color_std = np.asarray(cfg.COLOR_STD, np.float32)

    def init_params(self, key):
        return {} if self.enet is None else self.enet.init_params(key)

    def param_names(self):
        return [] if self.enet is None else self.enet.param_names()

    def image_features(self, params, images):
        """(V, H, W, C_in) -> (V, Hd, Wd, C_feat).

        uint8 color input (TPU_COMPACT_TRANSFERS: 4x fewer tunnel bytes) is
        normalized ON DEVICE with the same /255, -mean, /std fp32 ops as
        ``frames.load_color`` — identical values, just computed post-upload.
        """
        if self.enet is None:
            return images  # gt label images already at DEPTH_SHAPE resolution
        if images.dtype == jnp.uint8:
            images = (
                images.astype(jnp.float32) / 255.0 - self.color_mean
            ) / self.color_std
        return self.enet.features_for_3d(params, images)

    def project(
        self,
        params,
        images,
        depths,
        poses,
        world_to_grid,
        volume_dims,
        view_valid=None,
        feats=None,
        zero_floor=None,
    ):
        """-> (X, Y, Z, C) fused color volume for one sample/tile.

        Pass ``feats`` to reuse precomputed 2D features (tiled scene
        inference computes ENet once per scene, not once per tile).
        ``zero_floor``: see :func:`fuse_views` — set when only a subset of
        the scene's valid views is fused (per-tile view selection).
        """
        if feats is None:
            feats = self.image_features(params, images)
        return fuse_views(
            feats,
            depths,
            poses,
            world_to_grid,
            jnp.asarray(self.intrinsic),
            tuple(volume_dims),
            self.depth_shape,
            self.depth_min,
            self.depth_max,
            self.voxel_size,
            view_valid=view_valid,
            zero_floor=zero_floor,
        )


def shift_world_to_grid(world_to_grid, origin):
    """world->grid for a tile at `origin` (grid coords shift by -origin)."""
    m = np.asarray(world_to_grid, np.float32).copy()
    m[0, 3] -= origin[0]
    m[1, 3] -= origin[1]
    m[2, 3] -= origin[2]
    return m


def frustum_bbox_grid(
    pose, world_to_grid, intrinsic, depth_shape, depth_min, depth_max
):
    """Host-side loose frustum AABB in grid coords (one view).

    Mirrors ``ProjectionHelper.compute_frustum_bounds``
    (``lib/layer_utils/projection.py:27-49``): the 8 frustum corners at
    depth_min/depth_max, pushed through camera-to-world then world-to-grid.
    Used for per-tile view SELECTION (a new capability: the reference fuses
    every view into the whole scene; tiled inference only needs the views
    whose frusta touch each tile).
    """
    w, h = depth_shape
    fx, fy = intrinsic[0][0], intrinsic[1][1]
    cx, cy = intrinsic[0][2], intrinsic[1][2]
    corners = []
    for d in (depth_min, depth_max):
        for ux, uy in ((0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)):
            x = (ux - cx) / fx
            y = (uy - cy) / fy
            corners.append([d * x, d * y, d, 1.0])
    corners = np.asarray(corners, np.float64).T  # (4, 8)
    grid = np.asarray(world_to_grid, np.float64) @ (
        np.asarray(pose, np.float64) @ corners
    )
    pts = grid[:3].T
    return pts.min(axis=0) - 1, pts.max(axis=0) + 1


def select_views_for_tile(frusta, origin, tile_shape, max_views):
    """Indices of views whose frustum AABB intersects the tile AABB.

    frusta: list of (bmin, bmax). Returns (idx (max_views,), valid
    (max_views,), floor) — first-come order (the nearest-image lists are
    already coverage-ordered by the datagen, SceneSampler/main.cpp:615-724).
    ``floor`` is True when any scene-valid view was NOT selected (zero
    frustum overlap with this tile, or cap-truncated): each omitted view
    contributes an all-zero volume to the reference's over-all-views max,
    so the fused tile must be floored at 0 (``fuse_views(zero_floor=...)``).
    """
    lo = np.asarray(origin, np.float64)
    hi = lo + np.asarray(tile_shape, np.float64)
    sel = []
    for i, (bmin, bmax) in enumerate(frusta):
        if (bmax >= lo).all() and (bmin <= hi).all():
            sel.append(i)
            if len(sel) == max_views:
                break
    idx = np.zeros((max_views,), np.int32)
    valid = np.zeros((max_views,), bool)
    idx[: len(sel)] = sel
    valid[: len(sel)] = True
    return idx, valid, len(sel) < len(frusta)
