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
volume is built ON DEVICE as one ``lax.scan`` over views
(:func:`tpu3dsis.geometry.projection.fuse_views` — the exact construction
the reference's pairwise max-pool computes), with each view's step a SINGLE
combined row gather (``project_view_fused``: the f32 depth rides the bf16
feature table as an exact bf16x3 split, so the per-voxel depth lookup costs
no separate pass). Tiles and mask windows then slice their color crops from
the resident volume exactly like the geometry channel — no per-tile
projection at detect time at all.

Two earlier shapes of this builder were measured and rejected on v5e
(192x48x192 scene, 90 views, per-op traces in BENCH_NOTES):

- per-(view, frustum-crop) work items with dynamic-slice/max/update carries
  and one-hot gathers: 1718 ms — the carry RMW copies the full scene per
  item (22% of time) and the one-hot's N*P*C flops dominate; with row
  gathers + plan-time tight crops still 1062 ms.
- block ``lax.scatter_max`` over vmapped items: 2133 ms — the batched
  update windows materialize in HBM.
- full-grid view scan (this module): pure elementwise max into the carry,
  no dynamic indexing at all — 953 ms with separate depth lookup, faster
  with the fused gather, despite projecting every voxel for every view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsis.geometry.projection import fuse_views


def make_color_volume_fn(proj, scene_shape, out_dtype, views_per_step=1,
                         scan_unroll=8):
    """Jittable builder: (feats2d (V, H, W, C), depths (V, H, W),
    poses (V, 4, 4), world_to_grid (4, 4), view_valid (V,) bool)
    -> (X, Y, Z, C) resident volume.

    Exact reference fusion semantics (network.py:224-235): first valid
    view's zero-filled scattered volume is the init, later views fold in
    with elementwise max — so a voxel missed by any valid view floors at 0,
    a voxel covered by every view keeps its raw (possibly negative) max,
    and voxels no view covers are 0.

    ``views_per_step`` blocks the view scan K-at-a-time (value-exact for
    any K; see ``fuse_views`` — config ``TPU_COLOR_VIEWS_PER_STEP``).
    """
    intr = jnp.asarray(proj.intrinsic)
    dims = tuple(int(s) for s in scene_shape)

    def build(feats2d, depths, poses, world_to_grid, view_valid):
        return fuse_views(
            feats2d.astype(out_dtype),
            depths,
            poses,
            world_to_grid,
            intr,
            dims,
            tuple(proj.depth_shape),
            proj.depth_min,
            proj.depth_max,
            proj.voxel_size,
            view_valid=view_valid,
            prefer_gather=True,
            views_per_step=views_per_step,
            scan_unroll=scan_unroll,
        )

    return build
