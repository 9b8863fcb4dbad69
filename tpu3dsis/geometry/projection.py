"""2D->3D back-projection: dense per-voxel gather, vmapped over views.

TPU-first redesign of the reference projection
(``lib/layer_utils/projection.py:6-153``). The reference builds, per frame,
length-prefixed index-pair lists on the host (frustum cull -> perspective
project -> depth-consistency test -> ``index_copy_`` scatter of 2D features
into the 3D volume). Because each 3D voxel reads at most ONE pixel, that
scatter is really a gather — so here every voxel center is projected in one
dense batched computation (no host loops, no dynamic index lists) and the
color volume is a masked ``take`` from the image feature map. Multi-view
fusion is a running elementwise max over views (identical math to the
reference's stacked/pairwise view max-pool, network.py:107-113 / 220-235,
since invalid voxels contribute 0).

Acceptance predicate parity (projection.py:90-110): rounded pixel coords in
bounds, depth in [depth_min, depth_max], |depth - z_cam| <= voxel_size. The
reference's loose frustum-bbox cull is a compute optimization only — every
voxel it excludes also fails this predicate (up to its >=1-voxel bbox
slack), and dense math needs no cull.

The backward pass is JAX autodiff of the gather — a correct scatter-add,
unlike the reference's hand-written backward which overwrites duplicate
pixels and hardcodes a 32x41 grad shape (projection.py:146-151).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("volume_dims", "image_dims"))
def project_coords(
    camera_to_world,
    world_to_grid,
    intrinsic,
    volume_dims,
    image_dims,
    coord_offset=None,
):
    """Coordinate math of :func:`compute_projection` without the depth test.

    Returns (lin2d (N,) int32 flat pixel index — 0 where out of image,
    in_image (N,) bool, zc (N,) f32 camera-space depth of the voxel center).
    """
    w, h = image_dims
    world_to_camera = jnp.linalg.inv(camera_to_world)
    grid_to_world = jnp.linalg.inv(world_to_grid)

    x = jnp.arange(volume_dims[0], dtype=jnp.float32)
    y = jnp.arange(volume_dims[1], dtype=jnp.float32)
    z = jnp.arange(volume_dims[2], dtype=jnp.float32)
    if coord_offset is not None:
        off = coord_offset.astype(jnp.float32)
        x, y, z = x + off[0], y + off[1], z + off[2]
    gx, gy, gz = jnp.meshgrid(x, y, z, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, gz, ones], axis=-1).reshape(-1, 4)  # (N, 4)

    m = world_to_camera @ grid_to_world
    cam = coords @ m.T  # (N, 4)
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    zc = cam[:, 2]
    px = jnp.round(cam[:, 0] * fx / zc + cx).astype(jnp.int32)
    py = jnp.round(cam[:, 1] * fy / zc + cy).astype(jnp.int32)

    in_image = (px >= 0) & (py >= 0) & (px < w) & (py < h)
    lin2d = jnp.where(in_image, py * w + px, 0)
    return lin2d, in_image, zc


def split_bf16x3(x):
    """Decompose f32 ``x`` into three bf16 terms whose f32 sum (in order)
    reconstructs x EXACTLY: each term captures the next 8 mantissa bits, the
    slices don't overlap, so the two additions are exact (this is the same
    decomposition the MXU's HIGHEST-precision f32 matmul uses). Lets f32
    depth ride a bf16 gather table without losing the bits the +-voxel_size
    acceptance test needs."""
    x = x.astype(jnp.float32)
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    return h1, h2, h3


def merge_bf16x3(h1, h2, h3):
    return (
        h1.astype(jnp.float32) + h2.astype(jnp.float32)
        + h3.astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("volume_dims", "image_dims"))
def compute_projection(
    depth,
    camera_to_world,
    world_to_grid,
    intrinsic,
    volume_dims,
    image_dims,
    depth_min,
    depth_max,
    voxel_size,
    coord_offset=None,
):
    """Project every voxel center into one depth frame.

    Args:
      depth: (H, W) metric depth at the feature-map resolution.
      camera_to_world, world_to_grid: (4, 4).
      intrinsic: (4, 4) at the depth-map resolution.
      volume_dims: static (X, Y, Z).
      image_dims: static (W, H) — reference convention (config DEPTH_SHAPE).
      coord_offset: optional (3,) voxel offset added to the grid coords —
        projects the sub-volume starting at that offset of the grid that
        ``world_to_grid`` maps into. Bit-identical to slicing the full-grid
        result (the coords fed through the matrices are the same floats),
        unlike shifting the world_to_grid translation, whose inverse then
        differs in float (see ``infer/color_volume.py``).

    Returns:
      lin2d: (X, Y, Z) int32 flat pixel index (y * W + x), 0 where invalid.
      valid: (X, Y, Z) bool acceptance mask.
    """
    w, h = image_dims
    lin2d, in_image, zc = project_coords(
        camera_to_world, world_to_grid, intrinsic, tuple(volume_dims),
        (w, h), coord_offset,
    )
    if w * h <= 4096:
        # depth lookup as a one-hot contraction: XLA lowers a scalar gather
        # of N indices from the tiny (H*W ~ 1312) depth map at ~1 row/cycle
        # (55 ms for 16 views of a 96x48x96 tile — the single hottest op of
        # color scene inference); the fused one-hot reduce is plain vector
        # work (measured 2.9x faster, TPU v5e). Exact: each row has one 1.0
        # and the other f32 products are exactly 0.0, so the sum IS the
        # gathered value bit for bit.
        # precision HIGHEST: the MXU's default bf16 operand rounding would
        # quantize the gathered depths (f32 -> bf16 is a ~0.4% error at 2 m,
        # enough to flip the boundary of the +-voxel_size acceptance test vs
        # the reference); HIGHEST is the 3-pass bf16 split, exact for f32
        # stop_gradient: depth is input data, and everything downstream of
        # dvals is a boolean acceptance test (non-differentiable anyway).
        # Without it, reverse-mode AD through the view scan in fuse_views
        # saves this (N, H*W) one-hot per view as a stacked residual —
        # 11.6 GB for a 5-view 96x48x96 color TRAIN step, a measured HBM
        # OOM on v5e (19.9 G needed of 15.75 G).
        oh = jax.lax.stop_gradient(
            jax.nn.one_hot(lin2d, w * h, dtype=jnp.float32)
        )
        dvals = jnp.matmul(
            oh,
            jax.lax.stop_gradient(depth.reshape(-1)),
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        dvals = depth.reshape(-1)[lin2d]
    depth_ok = (
        (dvals >= depth_min)
        & (dvals <= depth_max)
        & (jnp.abs(dvals - zc) <= voxel_size)
    )
    valid = in_image & depth_ok
    shape = tuple(volume_dims)
    return lin2d.reshape(shape), valid.reshape(shape)


@jax.custom_vjp
def _onehot_row_gather(flat, idx):
    """``flat[idx]`` with rows ``idx == P`` yielding zeros, as a one-hot MXU
    matmul (see compute_projection — same scalar-gather lowering issue, same
    exactness argument: one 1.0 per row, other products exactly 0.0 — and
    out-of-range rows hit the sliced-away dump column, reproducing
    ``jnp.where(valid, ..., 0)``). Measured 1.17x over the row gather, v5e.

    custom_vjp so reverse-mode AD saves only ``idx`` (int32, ~1.7 MB for a
    96x48x96 chunk) instead of the (N, P) one-hot (2.3 GB f32) — with the
    default rule the view scan in ``fuse_views`` stacks that residual per
    view and OOMs HBM for the 5-view color TRAIN step. The backward rebuilds
    the one-hot and contracts it from the left: oh.T @ g, EXACTLY the
    cotangent the default rule computes (each output row is one input row,
    so the transpose is a sum of g-rows per pixel — a scatter-add).
    """
    p = flat.shape[0]
    oh = jax.nn.one_hot(idx, p + 1, dtype=flat.dtype)[:, :p]
    # HIGHEST keeps the gather exact for f32 features (MXU default would
    # round them to bf16); for bf16 features (the flagship compute dtype)
    # HIGHEST is the native single pass — no cost
    return jnp.matmul(oh, flat, precision=jax.lax.Precision.HIGHEST)


def _onehot_row_gather_fwd(flat, idx):
    # residuals must be jax types: a (P, 0) empty array carries flat's row
    # count and dtype to the backward at zero memory cost
    shape_tok = jnp.zeros((flat.shape[0], 0), flat.dtype)
    return _onehot_row_gather(flat, idx), (idx, shape_tok)


def _onehot_row_gather_bwd(res, g):
    idx, shape_tok = res
    p = shape_tok.shape[0]
    oh = jax.nn.one_hot(idx, p + 1, dtype=shape_tok.dtype)[:, :p]
    df = jnp.matmul(oh.T, g.astype(shape_tok.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    return df, None


_onehot_row_gather.defvjp(_onehot_row_gather_fwd, _onehot_row_gather_bwd)


def project_features(feat2d, lin2d, valid, prefer_gather=False):
    """Gather image features into the voxel grid.

    feat2d: (H, W, C); returns (X, Y, Z, C), 0 where invalid — matching the
    zero-initialized scatter of the reference ``Projection.forward``
    (projection.py:129-136).

    ``prefer_gather`` selects the plain row gather over the one-hot MXU
    contraction (both exact — same values): the one-hot costs N*P*C flops
    and wins at per-tile scale (<= 16 views x 442k voxels, measured 1.17x,
    v5e) where the gather is issue-bound; at whole-scene resident scale
    (~90 views x >= 1M voxels) the one-hot's flops dominate the program and
    the gather measured 1.32x faster.
    """
    c = feat2d.shape[-1]
    flat = feat2d.reshape(-1, c)
    p = flat.shape[0]
    if p <= 4096 and not prefer_gather:
        idx = jnp.where(valid.reshape(-1), lin2d.reshape(-1), p)
        vol = _onehot_row_gather(flat, idx)
    else:
        vol = flat[lin2d.reshape(-1)]
        vol = jnp.where(valid.reshape(-1, 1), vol,
                        jnp.zeros((), flat.dtype))
    return vol.reshape(*lin2d.shape, c)


def project_view_fused(
    feat2d,
    depth,
    camera_to_world,
    world_to_grid,
    intrinsic,
    volume_dims,
    image_dims,
    depth_min,
    depth_max,
    voxel_size,
    coord_offset=None,
):
    """One view's projected volume via a SINGLE combined gather.

    Value-identical to ``compute_projection`` + ``project_features`` (the
    acceptance predicate sees the same f32 depth — bf16x3 is exact), but the
    per-voxel depth lookup rides the feature gather as three extra bf16
    channels instead of its own (N, H*W) one-hot contraction. At resident
    scale that contraction was the single hottest op of the volume build
    (396 of 953 ms for 90 views of a 192x48x192 scene, v5e per-op trace);
    fusing it into the row gather removes it entirely (measured 1.6x).

    feat2d must be bf16 (the resident volume's dtype). Returns (X, Y, Z, C).
    """
    c = feat2d.shape[-1]
    lin2d, in_image, zc = project_coords(
        camera_to_world, world_to_grid, intrinsic, tuple(volume_dims),
        tuple(image_dims), coord_offset,
    )
    d1, d2, d3 = split_bf16x3(depth.reshape(-1))
    table = jnp.concatenate(
        [
            feat2d.reshape(-1, c).astype(jnp.bfloat16),
            jnp.stack([d1, d2, d3], axis=-1),
        ],
        axis=-1,
    )  # (H*W, C+3)
    rows = table[lin2d]  # one gather serves features AND depth
    dvals = merge_bf16x3(rows[:, c], rows[:, c + 1], rows[:, c + 2])
    valid = (
        in_image
        & (dvals >= depth_min)
        & (dvals <= depth_max)
        & (jnp.abs(dvals - zc) <= voxel_size)
    )
    vol = jnp.where(valid[:, None], rows[:, :c],
                    jnp.zeros((), jnp.bfloat16))
    return vol.reshape(*tuple(volume_dims), c)


def project_view_split(
    feat2d,
    depth,
    camera_to_world,
    world_to_grid,
    intrinsic,
    volume_dims,
    image_dims,
    depth_min,
    depth_max,
    voxel_size,
    coord_offset=None,
):
    """One view's projected volume: lane-aligned feature gather + separable
    one-hot depth lookup.

    Value-identical to :func:`project_view_fused` (same f32 depth reaches
    the acceptance predicate), but splits its combined (N, C+3) gather:

    * the 3 ridden depth columns pushed the gather row width to C+3 = 131,
      which the TPU tiled layout pads to 256 lanes — the gather DMA then
      moves 2x the feature bytes, and extracting the 3 columns afterwards
      forced a full (N, 131) layout transpose (a measured 2.1 ms/view copy
      in the 192x48x192 resident build, ~18% of the view step);
    * here the feature table stays exactly C = 128 wide (one lane granule)
      and the depth lookup becomes a SEPARABLE one-hot contraction:
      M = onehot(px) @ T with T[u, j*H+v] = d_j[v, u] picks column px on
      the MXU for every image row at once (bf16 products 1.0 * x are
      exact), then a one-hot(py) row-dot picks the image row — unlike the
      flat (N, H*W) one-hot of ``compute_projection`` (whose materialized
      operand is ~9 GB at resident scale) the factors are only (N, W+1)
      and (N, H). The three bf16x3 planes ride T's columns, so the merged
      dval is the exact f32 depth, bit-identical to the ridden-column path.

    feat2d must be bf16 (the resident volume's dtype). Returns (X, Y, Z, C).
    """
    w, h = image_dims
    c = feat2d.shape[-1]
    lin2d, in_image, zc = project_coords(
        camera_to_world, world_to_grid, intrinsic, tuple(volume_dims),
        tuple(image_dims), coord_offset,
    )
    px = jnp.where(in_image, lin2d % w, w)  # dump column when out of image
    py = lin2d // w

    d1, d2, d3 = split_bf16x3(jax.lax.stop_gradient(depth.reshape(h, w)))
    table = jnp.concatenate(
        [d.T for d in (d1, d2, d3)], axis=-1
    )  # (W, 3H): [u, j*H + v] = d_j[v, u]
    onehot_u = jax.lax.stop_gradient(
        jax.nn.one_hot(px, w + 1, dtype=jnp.bfloat16)[:, :w]
    )
    m = jnp.matmul(onehot_u, table)  # (N, 3H), exact bf16 picks
    # the whole pick chain stays bf16: every reduction sums exactly one
    # nonzero product (1.0 * x is exact on the VPU), so the result equals
    # the f32 computation bit-for-bit while the (N, H) / (N, 3H) / (N, 3)
    # intermediates move half the HBM bytes
    onehot_v = jax.lax.stop_gradient(
        jax.nn.one_hot(py, h, dtype=jnp.bfloat16)
    )
    m3 = m.reshape(-1, 3, h)
    picks = jnp.sum(m3 * onehot_v[:, None, :], axis=-1)  # (N, 3) exact
    dvals = merge_bf16x3(picks[:, 0], picks[:, 1], picks[:, 2])

    rows = feat2d.reshape(-1, c).astype(jnp.bfloat16)[lin2d]  # aligned gather
    valid = (
        in_image
        & (dvals >= depth_min)
        & (dvals <= depth_max)
        & (jnp.abs(dvals - zc) <= voxel_size)
    )
    vol = jnp.where(valid[:, None], rows, jnp.zeros((), jnp.bfloat16))
    return vol.reshape(*tuple(volume_dims), c)


def fuse_views(
    feats2d,
    depths,
    poses,
    world_to_grid,
    intrinsic,
    volume_dims,
    image_dims,
    depth_min,
    depth_max,
    voxel_size,
    view_valid=None,
    zero_floor=None,
    prefer_gather=False,
    views_per_step=1,
    scan_unroll=1,
):
    """Max-fuse V views into one color volume (X, Y, Z, C).

    feats2d: (V, H, W, C); depths: (V, H, W); poses: (V, 4, 4).
    ``view_valid`` optionally drops whole frames (the reference's
    ``killing_inds``, network.py:220-223). Implemented as a lax.scan with a
    single carried volume so memory stays O(1) in V (the reference's
    TEST-mode pairwise max-pool exists for the same reason; the math is
    identical).

    Semantics (network.py:224-235): the FIRST valid view's scattered volume
    is the init, later valid views fold in with an elementwise max. Each
    per-view volume holds 0 at voxels that view does not cover, so the max
    floors at 0 once >= 2 views are fused — but a voxel whose every fused
    view sees a negative feature stays negative, and a single view passes
    through verbatim. A -inf init with a final 0-backfill (only where NO
    valid view existed at all) reproduces that exactly; a 0 init would not.

    ``zero_floor`` (bool scalar, may be traced): set when the caller fused
    only a SUBSET of the scene's valid views into this (sub)volume — e.g. a
    tile that skipped views whose frusta miss it. Each omitted valid view
    contributes an all-zero volume to the reference's max, so flooring the
    result at 0 restores exactly their effect (exact for zero-coverage
    omissions; for cap-dropped covering views the floor is the documented
    approximation).
    """
    c = feats2d.shape[-1]
    neg = jnp.asarray(-jnp.inf, feats2d.dtype)
    init = jnp.full((*tuple(volume_dims), c), neg, feats2d.dtype)
    # under shard_map the scan carry must carry the same varying-axes type
    # as the body output; the body varies with world_to_grid (per tile), so
    # fold a zero-valued dependency on it into the init (no-op outside
    # shard_map, fixes "varying manual axes do not match" inside it)
    init = init + 0 * world_to_grid.reshape(-1)[0].astype(init.dtype)

    def project_one(feat, depth, pose, ok):
        if prefer_gather and feat.dtype == jnp.bfloat16:
            # split > fused when the feature width is lane-aligned: the
            # ridden depth columns make the gather rows 131 wide -> padded
            # to 256 lanes (2x DMA) + a full layout copy (see
            # project_view_split); both are value-identical
            proj = (
                project_view_split
                if feat.shape[-1] % 128 == 0
                else project_view_fused
            )
            vol = proj(
                feat, depth, pose, world_to_grid, intrinsic,
                tuple(volume_dims), tuple(image_dims),
                depth_min, depth_max, voxel_size,
            )
            return vol, ok
        lin2d, valid = compute_projection(
            depth,
            pose,
            world_to_grid,
            intrinsic,
            tuple(volume_dims),
            tuple(image_dims),
            depth_min,
            depth_max,
            voxel_size,
        )
        vol = project_features(feat, lin2d, valid,
                               prefer_gather=prefer_gather)
        return vol, ok

    def body(carry, view):
        vol, ok = project_one(*view)
        return jnp.where(ok, jnp.maximum(carry, vol), carry), None

    def body_block(carry, views):
        # K views per step: invalid views enter the within-block max as
        # -inf (the max identity), valid ones with their 0-filled per-view
        # volumes — max is associative, so folding the block max into the
        # carry is value-identical to K sequential steps. The carry's HBM
        # read-modify-write is paid once per K views instead of per view,
        # but on v5e that LOSES for the gather path (953 -> 1833 ms at K=4,
        # 90-view 192x48x192 build): the vmapped per-view gathers
        # materialize K full volumes in HBM before the block max. Kept
        # (exactness-tested) for architectures where the carry RMW, not
        # the gather, bounds the scan; default K=1.
        vols, oks = jax.vmap(project_one)(*views)
        vols = jnp.where(oks[:, None, None, None, None], vols, neg)
        blk = jnp.max(vols, axis=0)
        return jnp.maximum(carry, blk), None

    if view_valid is None:
        view_valid = jnp.ones((feats2d.shape[0],), bool)
    k = max(1, int(views_per_step))
    v = feats2d.shape[0]
    if k > 1:
        vpad = -(-v // k) * k
        xs = (feats2d, depths, poses, view_valid)
        if vpad != v:
            xs = tuple(
                jnp.concatenate(
                    [a, jnp.zeros((vpad - v, *a.shape[1:]), a.dtype)]
                )
                for a in xs
            )
            xs = (*xs[:3], xs[3].astype(bool))
        xs = tuple(a.reshape(vpad // k, k, *a.shape[1:]) for a in xs)
        out, _ = jax.lax.scan(body_block, init, xs,
                              unroll=max(1, int(scan_unroll)))
    else:
        # unrolling the view scan lets XLA overlap/fuse consecutive view
        # steps (each step is value-independent except the carry max):
        # measured 622 -> 472 ms for the 90-view 172x48x172 resident build
        # on v5e at unroll=8, bit-exact (tools/exp_volume_scan2.py)
        out, _ = jax.lax.scan(
            body, init, (feats2d, depths, poses, view_valid),
            unroll=max(1, int(scan_unroll)),
        )
    out = jnp.where(jnp.isneginf(out), jnp.zeros((), out.dtype), out)
    if zero_floor is None:
        return out
    return jnp.where(
        jnp.asarray(zero_floor), jnp.maximum(out, 0), out
    )
