"""Anchor generation — numpy (host, precomputed per static shape).

Port of ``lib/layer_utils/generate_anchors.py:4-119``: anchor size files hold
``w, h, l`` lines; each size is centered at the origin then tiled over the
feature-map grid with stride ``feat_stride``. The reference regenerates these
per scene shape in TEST and caches in TRAIN — here they are a pure function of
(sizes, feat shape, stride), cached by the caller, and the inside-volume filter
becomes a static boolean mask instead of np.where index lists so downstream
stays fixed-shape for XLA.
"""

from __future__ import annotations

import functools

import numpy as np


def read_anchor_sizes(path: str) -> np.ndarray:
    """Parse an anchor size file -> (A, 6) origin-centered corner boxes."""
    sizes = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            w, h, l = [float(x) for x in line.split(",")]
            sizes.append([-w / 2, -h / 2, -l / 2, w / 2, h / 2, l / 2])
    return np.asarray(sizes, dtype=np.float64)


@functools.lru_cache(maxsize=64)
def _grid_shifts(size, feat_stride):
    sx = np.arange(0, size[0]) * feat_stride
    sy = np.arange(0, size[1]) * feat_stride
    sz = np.arange(0, size[2]) * feat_stride
    gx, gy, gz = np.meshgrid(sx, sy, sz, indexing="ij")
    return np.vstack(
        (gx.ravel(), gy.ravel(), gz.ravel(), gx.ravel(), gy.ravel(), gz.ravel())
    ).transpose()


def tile_anchors(base_anchors: np.ndarray, feat_size, feat_stride: int) -> np.ndarray:
    """Tile (A, 6) base anchors over a (W, H, L) feature grid -> (K*A, 6).

    Ordering matches the reference (``generate_anchors.py:74-87``): grid cell
    index (x-major via 'ij' meshgrid ravel) outermost, anchor index innermost.
    """
    shifts = _grid_shifts(tuple(int(s) for s in feat_size), int(feat_stride))
    A = base_anchors.shape[0]
    K = shifts.shape[0]
    anchors = base_anchors.reshape((1, A, 6)) + shifts.reshape((K, 1, 6))
    return anchors.reshape((K * A, 6)).astype(np.float32, copy=False)


def generate_level_anchors(anchor_file: str, feat_size, feat_stride: int) -> np.ndarray:
    return tile_anchors(read_anchor_sizes(anchor_file), feat_size, feat_stride)


def anchors_inside_mask(anchors: np.ndarray, scene_shape, allowed_border: float = 0):
    """Boolean (N,) mask of anchors fully inside the scene volume.

    Same predicate as the index-list filter at ``proposal_layer.py:36-43`` /
    ``anchor_target_layer.py:30-37``, but as a mask so fixed shapes survive jit.
    """
    return (
        (anchors[:, 0] >= -allowed_border)
        & (anchors[:, 1] >= -allowed_border)
        & (anchors[:, 2] >= -allowed_border)
        & (anchors[:, 3] < scene_shape[0] + allowed_border)
        & (anchors[:, 4] < scene_shape[1] + allowed_border)
        & (anchors[:, 5] < scene_shape[2] + allowed_border)
    )
