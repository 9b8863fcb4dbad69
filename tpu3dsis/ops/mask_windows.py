"""Halo-window decomposition of the mask FCN over arbitrarily large rois.

The mask backbone (``models/backbones.py::MaskBackboneArch``) is a local FCN:
its deepest path is five 3x3x3 convs (geometry or color branch) plus one
3x3x3 combine conv, so every output voxel depends only on inputs within a
receptive-field radius of 6 voxels. Running the FCN on a fixed crop canvas
with the roi region re-masked after every layer is exact for rois that fit
the canvas (see MaskBackboneArch.apply); for larger rois this module tiles
the roi into canvas-sized windows with a 6-voxel halo so EVERY roi is exact:

- per axis, a roi of size ``b`` needs ``n = 1`` window if ``b <= canvas``,
  else ``n = ceil(b / s)`` windows with interior stride ``s = canvas - 2*halo``;
- window ``k`` starts at ``clamp(r0 + k*s - halo, 0, scene - canvas)`` and
  OWNS the output segment ``[r0 + k*s, min(r0 + (k+1)*s, r1))``. A window
  face either lies outside the roi (where the region mask reproduces the
  reference's zero crop-padding exactly) or is >= halo voxels away from the
  owned segment, so owned outputs equal the reference's exact-size crop
  (``lib/nets/network.py:168-184``) everywhere.

Training uses the fixed-capacity jnp planner (a compile-static work queue:
one primary window per roi always fits; extra windows of oversize rois fill
the remaining slots, most-needed first). Whole-scene inference uses the
variable-length numpy planner per detected box.
"""

from __future__ import annotations

import numpy as np

HALO = 6  # receptive-field radius of MaskBackboneArch (5 conv3 + combine)


def windows_per_axis(scene: int, canvas: int, halo: int = HALO) -> int:
    """Static upper bound on per-axis window count for any roi in `scene`."""
    if scene <= canvas:
        return 1
    s = canvas - 2 * halo
    if s <= 0:
        raise ValueError(
            f"mask canvas {canvas} too small for halo {halo} windowing"
        )
    return -(-scene // s)


def plan_windows(rois, roi_valid, scene_shape, canvas, capacity,
                 halo: int = HALO, allow_drop: bool = False,
                 single_window: bool = False):
    """jnp planner: (M, 6) rois -> a capacity-C window work queue.

    Returns dict with, per work item:
      starts  (C, 3) int32 window origins (in-bounds for dynamic_slice)
      locals6 (C, 6) the FULL roi box in window coords (may exceed the
              window; used as the compute-time region mask)
      own6    (C, 6) the owned output segment in window coords
      roi_idx (C,)   which roi the item belongs to
      valid   (C,)   item validity
      dropped ()     number of real windows that did not fit the capacity
    Primary (k=0) windows are packed first, so with capacity >= M no roi is
    ever dropped entirely and rois that fit one window behave exactly as the
    unwindowed path. With ``allow_drop`` the capacity may be below M — valid
    primaries beyond it are dropped and counted (callers reconcile, e.g. the
    fused scene path re-runs shorted rois through the host-planned path).
    """
    import jax.numpy as jnp

    m = rois.shape[0]
    if capacity < m and not allow_drop:
        raise ValueError(f"capacity {capacity} < num rois {m}")
    scene_t = tuple(int(x) for x in scene_shape)
    canvas_t = tuple(int(x) for x in canvas)
    # single_window: the caller guarantees every VALID roi fits the canvas
    # (e.g. the small-canvas fast queues, whose validity masks exclude
    # oversize rois), so halo decomposition — and its canvas > 2*halo
    # constraint — is skipped entirely
    ks = (
        (1, 1, 1)
        if single_window
        else tuple(
            windows_per_axis(sc, ca, halo)
            for sc, ca in zip(scene_t, canvas_t)
        )
    )
    k_total = ks[0] * ks[1] * ks[2]
    capacity = min(capacity, m * k_total)  # can't need more than every window

    s_dev = jnp.asarray(scene_t, jnp.int32)
    c_dev = jnp.asarray(canvas_t, jnp.int32)
    stride = jnp.maximum(c_dev - 2 * halo, 1)

    r = jnp.round(rois).astype(jnp.int32)
    r0 = jnp.clip(r[:, :3], 0, s_dev[None] - 1)
    r1 = jnp.clip(r[:, 3:6], r0 + 1, s_dev[None])
    bsz = r1 - r0
    n_ax = jnp.where(bsz <= c_dev[None], 1, -(-bsz // stride[None]))  # (M,3)

    # single-window placement: roi fully inside the window
    st1 = jnp.clip(r0, 0, (s_dev - c_dev)[None])
    st1 = jnp.minimum(st1, jnp.maximum(r1 - c_dev[None], 0))

    starts, own_lo, own_hi, valid, roi_idx, primary = [], [], [], [], [], []
    for kk in range(k_total):
        kx = kk // (ks[1] * ks[2])
        ky = (kk // ks[2]) % ks[1]
        kz = kk % ks[2]
        k3 = jnp.asarray([kx, ky, kz], jnp.int32)[None]  # (1,3)
        stk = jnp.clip(r0 + k3 * stride[None] - halo, 0, (s_dev - c_dev)[None])
        st = jnp.where(n_ax == 1, st1, stk)
        olo = jnp.where(n_ax == 1, r0, r0 + k3 * stride[None])
        ohi = jnp.where(
            n_ax == 1, r1, jnp.minimum(r0 + (k3 + 1) * stride[None], r1)
        )
        ok = roi_valid & jnp.all(k3 < n_ax, axis=1)
        starts.append(st)
        own_lo.append(olo)
        own_hi.append(ohi)
        valid.append(ok)
        roi_idx.append(jnp.arange(m, dtype=jnp.int32))
        primary.append(jnp.full((m,), kk == 0))

    starts = jnp.concatenate(starts)      # (M*K, 3)
    own_lo = jnp.concatenate(own_lo)
    own_hi = jnp.concatenate(own_hi)
    valid = jnp.concatenate(valid)
    roi_idx = jnp.concatenate(roi_idx)
    primary = jnp.concatenate(primary)
    box0 = jnp.tile(r0, (k_total, 1))
    box1 = jnp.tile(r1, (k_total, 1))

    if k_total > 1 or capacity < m:
        # compaction: valid primaries, then valid extras, then padding
        key = (~valid).astype(jnp.int32) * 2 + (~primary).astype(jnp.int32)
        order = jnp.argsort(key, stable=True)[:capacity]
    else:
        order = jnp.arange(capacity, dtype=jnp.int32)

    sel = lambda a: a[order]
    starts, own_lo, own_hi = sel(starts), sel(own_lo), sel(own_hi)
    box0, box1 = sel(box0), sel(box1)
    roi_idx, v_sel = sel(roi_idx), sel(valid)
    dropped = jnp.sum(valid) - jnp.sum(v_sel)
    return {
        "starts": starts,
        "locals6": jnp.concatenate([box0 - starts, box1 - starts], axis=1),
        "own6": jnp.concatenate([own_lo - starts, own_hi - starts], axis=1),
        "roi_idx": roi_idx,
        "valid": v_sel,
        "dropped": dropped,
    }


def plan_windows_np(box, scene_shape, canvas, halo: int = HALO):
    """Host planner for one box: list of (start, local_box6, own_abs6).

    start: (3,) window origin; local_box6: the full box in window coords
    (compute-time region mask); own_abs6: the owned segment in ABSOLUTE
    scene coords. Variable length — whole-scene inference pastes each
    window's owned segment into the output mask.
    """
    box = np.asarray(np.round(box), np.int64)
    r0 = np.clip(box[:3], 0, np.asarray(scene_shape) - 1)
    r1 = np.clip(box[3:6], r0 + 1, scene_shape)
    per_axis = []
    for ax in range(3):
        c, s_ext = int(canvas[ax]), int(scene_shape[ax])
        b = int(r1[ax] - r0[ax])
        if b <= c:
            st = min(max(int(r0[ax]), 0), s_ext - c)
            st = min(st, max(int(r1[ax]) - c, 0))
            per_axis.append([(st, int(r0[ax]), int(r1[ax]))])
        else:
            s = c - 2 * halo
            if s <= 0:
                raise ValueError(
                    f"mask canvas {c} too small for halo {halo} windowing"
                )
            n = -(-b // s)
            axis_items = []
            for k in range(n):
                st = min(max(int(r0[ax]) + k * s - halo, 0), s_ext - c)
                lo = int(r0[ax]) + k * s
                hi = min(int(r0[ax]) + (k + 1) * s, int(r1[ax]))
                axis_items.append((st, lo, hi))
            per_axis.append(axis_items)

    items = []
    for sx, lx, hx in per_axis[0]:
        for sy, ly, hy in per_axis[1]:
            for sz, lz, hz in per_axis[2]:
                start = np.array([sx, sy, sz], np.int32)
                local = np.concatenate([r0 - start, r1 - start]).astype(
                    np.int32
                )
                own = np.array([lx, ly, lz, hx, hy, hz], np.int32)
                items.append((start, local, own))
    return items
