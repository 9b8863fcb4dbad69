"""Whole-scene inference: static-shape sliding-window tiling + stitching.

The reference runs the full scene through the backbone in ONE shot with
per-scene anchor regeneration and a CPU fallback above MAX_VOLUME voxels
(``lib/nets/network.py:187-317``, ``lib/utils/config.py:123-124``,
``lib/model/trainval.py:664-667``). That design is hostile to XLA (a fresh
compile per scene shape) and memory-bound. Here a scene of ANY size runs
through ONE compiled program: 96x48x96 tiles with overlap, batched through
the jitted chunk detector, detections shifted to scene coords and
deduplicated with a class-aware cross-tile 3D NMS. Masks run per kept box on
a fixed crop canvas (region-masked FCN == exact-crop math, see
``tpu3dsis.models.backbones.MaskBackboneArch``).

Coverage argument: with tile t and stride s, every axis interval of length
<= t - s lies fully inside some tile; the default strides equal tile minus
the longest per-axis ScanNet anchor extent (53, 39, 53 voxels — 2.5 m at
4.7 cm/voxel, experiments/anchors/scannet14_11.txt), so every anchor-sized
object is fully contained in at least one tile on every axis
(``tests/test_tiling.py::test_tile_coverage_longest_anchor`` pins this).
Duplicate detections from overlapping tiles are removed by the stitch NMS
keeping the highest-confidence copy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.geometry.boxes import nms_overlap
from tpu3dsis.models.detector import Detector, build_inference_fn


def tile_origins(extent: int, tile: int, stride: int):
    """1D tile start offsets covering [0, extent), last tile end-clamped."""
    if extent <= tile:
        return [0]
    starts = list(range(0, extent - tile, stride))
    starts.append(extent - tile)
    return starts


def pad_volume(data: np.ndarray, tile_shape, pad_value=(3.0, 1.0)):
    """Pad encoded TSDF (X, Y, Z, 2) up to at least one tile per axis.

    Padding is free space: |tsdf| = TRUNCATED, occupancy = 1 (sdf > -1),
    matching what empty regions look like after ``encode_tsdf``.
    """
    px = max(0, tile_shape[0] - data.shape[0])
    py = max(0, tile_shape[1] - data.shape[1])
    pz = max(0, tile_shape[2] - data.shape[2])
    if px or py or pz:
        data = np.pad(
            data,
            ((0, px), (0, py), (0, pz), (0, 0)),
            constant_values=0.0,
        )
        # overwrite the padded region per channel
        if px:
            data[-px:, :, :, 0] = pad_value[0]
            data[-px:, :, :, 1] = pad_value[1]
        if py:
            data[:, -py:, :, 0] = pad_value[0]
            data[:, -py:, :, 1] = pad_value[1]
        if pz:
            data[:, :, -pz:, 0] = pad_value[0]
            data[:, :, -pz:, 1] = pad_value[1]
    return data


# per-tile outputs the stitching loop actually reads (detect() below)
_STITCH_KEYS = ("valid", "degenerate", "pred_conf", "cls_pred", "pred_box")


class SceneInference:
    """Compile-once whole-scene detector (+ optional masks).

    mesh: optional single-axis ``jax.sharding.Mesh`` — tile batches, color
    tiles, and mask windows are shard_mapped across its devices (scene,
    params, and 2D features replicated), cutting per-scene latency
    ~linearly in device count. Per-item math is unchanged: geometry
    detections and masks match the single-device path exactly
    (``test_tiled_mesh_matches_single_device``); the color path matches to
    float precision (its local vmap width differs, shifting XLA fusion by
    an ulp — ``test_color_scene_inference`` mesh leg). The per-scene ENet
    pass runs once on the default device.
    """

    def __init__(self, detector: Detector, cfg, tile_batch: int = 8,
                 mesh=None):
        self.det = detector
        self.cfg = cfg
        self.mesh = mesh
        self.tile = tuple(int(t) for t in cfg.TPU_TILE_SIZE)
        self.stride = tuple(int(s) for s in cfg.TPU_TILE_STRIDE)
        # mask-FCN window canvas: smaller than the tile (halo windows keep
        # masks exact for boxes of ANY size) => ~2.3x less FCN compute per
        # window at the default [64, 48, 64] vs the round-1 full-tile canvas
        self.mask_canvas = tuple(
            min(int(c), int(t))
            for c, t in zip(
                dict.get(cfg, "TPU_MASK_INFER_CANVAS", [64, 48, 64]),
                cfg.TPU_TILE_SIZE,
            )
        )
        # second, smaller canvas for boxes that fit it: the region-masked
        # FCN is canvas-size independent on region voxels (every conv is
        # followed by the region re-mask — backbones.py::MaskBackboneArch),
        # so routing small boxes through a ~6x-smaller window is exact and
        # cuts most of the mask-phase FLOPs (typical ScanNet detections are
        # chairs/objects well under 32 voxels per axis)
        self.mask_canvas_small = tuple(
            min(int(c), int(t))
            for c, t in zip(
                dict.get(cfg, "TPU_MASK_INFER_CANVAS_SMALL", [32, 32, 32]),
                self.mask_canvas,
            )
        )
        if self.mask_canvas_small == self.mask_canvas:
            self.mask_canvas_small = None
        if mesh is not None:  # color tiles shard over the batch axis
            n_dev = int(mesh.devices.size)
            tile_batch = n_dev * (-(-tile_batch // n_dev))
        self.tile_batch = tile_batch
        self._single = build_inference_fn(detector, cfg, self.tile, mode="TEST")
        single = self._single
        # the scene lives ON DEVICE (transferred once, in the compute dtype)
        # and tiles/crops are dynamic_slice'd there: through the axon tunnel
        # host->device bandwidth is ~35 MB/s, so shipping each overlapping
        # tile (and each mask crop) from the host dominated scene eval.
        # Scene shapes are bucketed to tile multiples, so compile count is
        # bounded by the handful of padded-shape buckets.
        self._dtype = detector.cfg_static["compute_dtype"]

        def tiled(params, scene_dev, origins):
            """origins: (n_batches, tile_batch, 3) — ALL tiles of the scene
            in ONE dispatch: lax.map over batches (bounds activations to one
            vmap'd batch) so a whole scene costs a single tunnel round trip.
            """

            def one(origin):
                t = jax.lax.dynamic_slice(
                    scene_dev, (origin[0], origin[1], origin[2], 0),
                    (*self.tile, 2),
                )
                out = single(params, t[None])
                # download ONLY what stitching consumes: the full head
                # outputs (cls_prob/bbox_pred/rois/...) are ~10x the bytes
                # and each extra key costs a tunnel round trip
                return {k: out[k] for k in _STITCH_KEYS}

            return jax.lax.map(lambda ob: jax.vmap(one)(ob), origins)

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]

            def tiled_mesh(params, scene_dev, origins):
                """origins: (n_dev, k, tile_batch, 3) — each device runs its
                own k tile batches over the replicated scene."""

                def local(params, scene_dev, org):
                    return jax.tree.map(
                        lambda x: x[None], tiled(params, scene_dev, org[0])
                    )

                return shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(), P(), P(axis)),
                    out_specs=P(axis),
                )(params, scene_dev, origins)

            self._tiled_fn = jax.jit(tiled_mesh)
        else:
            self._tiled_fn = jax.jit(tiled)
        self._mask_fn = None
        self._mask_color_fn = None
        self._mask_fn_small = None
        self._mask_color_fn_small = None
        if detector.mask_backbone is not None:
            mf = self._build_mask_fn(self.mask_canvas)
            if mesh is not None:
                mf = self._shard_over_items(mf, n_item_args=3)
            self._mask_fn = jax.jit(mf)
            if self.mask_canvas_small is not None:
                mfs = self._build_mask_fn(self.mask_canvas_small)
                if mesh is not None:
                    mfs = self._shard_over_items(mfs, n_item_args=3)
                self._mask_fn_small = jax.jit(mfs)
            if detector.color_projector is not None and bool(
                cfg.MASK_USE_IMAGES
            ):
                mcf = self._build_mask_color_fn(self.mask_canvas)
                if mesh is not None:
                    mcf = self._shard_over_items(mcf, n_item_args=7)
                self._mask_color_fn = jax.jit(mcf)
                if self.mask_canvas_small is not None:
                    mcfs = self._build_mask_color_fn(self.mask_canvas_small)
                    if mesh is not None:
                        mcfs = self._shard_over_items(mcfs, n_item_args=7)
                    self._mask_color_fn_small = jax.jit(mcfs)
        # color path: a scene-resident projected color volume (every view
        # fused once per scene — exact reference semantics, no view cap;
        # infer/color_volume.py) when it fits TPU_COLOR_VOLUME_MAX_MB, else
        # per-tile frustum view selection capped at TPU_MAX_TILE_VIEWS
        self.max_tile_views = int(dict.get(cfg, "TPU_MAX_TILE_VIEWS", 16))
        self._resident_mode = str(
            dict.get(cfg, "TPU_SCENE_COLOR_RESIDENT", "auto")
        ).lower()
        self._color_vol_max_bytes = int(
            dict.get(cfg, "TPU_COLOR_VOLUME_MAX_MB", 2048)
        ) * (1 << 20)
        self._color_vol_fns = {}  # (bucket_shape, crop_shape) -> jitted build
        self._color_fns = None
        self._color_res_fn = None
        self._mask_color_res_fn = None
        self._mask_color_res_fn_small = None
        if detector.color_projector is not None:
            self._num_image_channels = int(cfg.NUM_IMAGE_CHANNELS)

            def tiled_color_res(params, scene_dev, origins, color_dev):
                """Resident-volume color tiles: slice BOTH the TSDF and the
                projected color volume per tile (no per-tile projection)."""
                c2d = color_dev.shape[-1]

                def one(origin):
                    scene = jax.lax.dynamic_slice(
                        scene_dev, (origin[0], origin[1], origin[2], 0),
                        (*self.tile, 2),
                    )
                    col = jax.lax.dynamic_slice(
                        color_dev, (origin[0], origin[1], origin[2], 0),
                        (*self.tile, c2d),
                    )
                    out = single(params, scene[None], {"imageft": col})
                    return {k: out[k] for k in _STITCH_KEYS}

                return jax.lax.map(lambda ob: jax.vmap(one)(ob), origins)

            if mesh is not None:
                tiled_color_res = self._shard_over_items(
                    tiled_color_res, n_item_args=1
                )
            self._color_res_fn = jax.jit(tiled_color_res)
            if detector.mask_backbone is not None and bool(
                cfg.MASK_USE_IMAGES
            ):
                mrf = self._build_mask_color_fn_resident(self.mask_canvas)
                if mesh is not None:
                    mrf = self._shard_over_items(mrf, n_item_args=3)
                self._mask_color_res_fn = jax.jit(mrf)
                if self.mask_canvas_small is not None:
                    mrfs = self._build_mask_color_fn_resident(
                        self.mask_canvas_small
                    )
                    if mesh is not None:
                        mrfs = self._shard_over_items(mrfs, n_item_args=3)
                    self._mask_color_res_fn_small = jax.jit(mrfs)

            def feats_fn(params, images):
                return detector.color_projector.image_features(params, images)

            def tiled_color(
                params, scene_dev, origins, w2gs, sel_idx, sel_valid,
                sel_floor, feats2d, depths, poses,
            ):
                # ALL tile batches of the scene in ONE dispatch (lax.map over
                # batches, as the geometry path): per-batch dispatches each
                # paid a full tunnel round trip, which dominated color-scene
                # wall time ~25x over the actual tile compute.
                # arg order: per-tile items first, then the replicated
                # whole-scene operands — _shard_over_items slices the
                # leading group across the mesh.
                def one(origin, w2g, idx, ok, floor):
                    scene = jax.lax.dynamic_slice(
                        scene_dev, (origin[0], origin[1], origin[2], 0),
                        (*self.tile, 2),
                    )
                    frames = {
                        "feats2d": feats2d[idx],
                        "depths": depths[idx],
                        "poses": poses[idx],
                        "world_to_grid": w2g,
                        "view_valid": ok,
                        "zero_floor": floor,
                    }
                    out = single(params, scene[None], frames)
                    return {k: out[k] for k in _STITCH_KEYS}

                # leading item axis (n_batches, bs, ...): map batches, vmap
                # tiles within a batch
                return jax.lax.map(
                    lambda args: jax.vmap(one)(*args),
                    (origins, w2gs, sel_idx, sel_valid, sel_floor),
                )

            if mesh is not None:
                tiled_color = self._shard_over_items(
                    tiled_color, n_item_args=5
                )
            self._color_fns = (jax.jit(feats_fn), jax.jit(tiled_color))

    def _shard_over_items(self, fn, n_item_args: int):
        """Shard a ``(params, scene_dev, *items[, *replicated])`` batch fn's
        leading item axis across the mesh.

        Every item (mask window / tile) is computed independently, so each
        device runs the unchanged per-item body on its slice of the batch —
        results are bit-identical to single-device. Callers pad the item
        count to a multiple of the mesh size.
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        axis = mesh.axis_names[0]

        def wrapped(params, scene_dev, *args):
            n_rep = len(args) - n_item_args
            in_specs = (
                (P(), P()) + (P(axis),) * n_item_args + (P(),) * n_rep
            )
            return shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=P(axis)
            )(params, scene_dev, *args)

        return wrapped

    # --- mask on fixed crop canvas ---------------------------------------
    def _build_mask_fn(self, canvas):
        det = self.det
        tx, ty, tz = canvas
        thresh = float(self.cfg.MASK_THRESH)

        def mask_batch(params, scene_dev, starts, locals_, labels):
            """Device-resident masks: crop + region + FCN + threshold on-chip.

            starts: (M, 3) crop-window origins; locals_: (M, 6) the box in
            window coords; labels: (M,). Returns (M, ceil(tx*ty*tz/8))
            BIT-PACKED thresholded masks — 32x fewer bytes than f32 probs
            through the ~35 MB/s tunnel, with no crop upload at all.
            """
            ix = jnp.arange(tx)[:, None, None]
            iy = jnp.arange(ty)[None, :, None]
            iz = jnp.arange(tz)[None, None, :]

            def one(args):
                start, local, label = args
                crop = jax.lax.dynamic_slice(
                    scene_dev, (start[0], start[1], start[2], 0), (tx, ty, tz, 2)
                )
                region = (
                    (ix >= local[0]) & (ix < local[3])
                    & (iy >= local[1]) & (iy < local[4])
                    & (iz >= local[2]) & (iz < local[5])
                ).astype(crop.dtype)
                probs = det.mask_backbone.apply(
                    params,
                    (crop * region[..., None])[None],
                    training=False,  # sigmoid applied (backbones.py:285-287)
                    region_mask=region[None, ..., None],
                    compute_dtype=det.cfg_static["compute_dtype"],
                )
                bits = (probs[0, :, :, :, label] >= thresh).reshape(-1)
                return jnp.packbits(bits)

            return jax.lax.map(one, (starts, locals_, labels))

        return mask_batch

    def _build_mask_color_fn(self, canvas):
        """MASK_USE_IMAGES: mask FCN with the color/combine branches fed by
        per-window color projection.

        The reference re-runs the mask backbone on imageft cropped from the
        scene-level projected color volume (``lib/model/trainval.py:882-897``,
        ``lib/nets/network.py:303-317``). Materializing that volume for a
        whole scene is HBM-hostile (X*Y*Z*128 floats); projection is
        per-voxel independent, so projecting each window's views into the
        window grid yields the identical crop on-chip.
        """
        det = self.det
        tx, ty, tz = canvas
        thresh = float(self.cfg.MASK_THRESH)
        proj = det.color_projector

        def mask_batch(params, scene_dev, starts, locals_, labels, w2gs,
                       sel_idx, sel_valid, sel_floor, feats2d, depths, poses):
            ix = jnp.arange(tx)[:, None, None]
            iy = jnp.arange(ty)[None, :, None]
            iz = jnp.arange(tz)[None, None, :]

            def one(args):
                start, local, label, w2g, idx, ok, floor = args
                crop = jax.lax.dynamic_slice(
                    scene_dev, (start[0], start[1], start[2], 0),
                    (tx, ty, tz, 2),
                )
                region = (
                    (ix >= local[0]) & (ix < local[3])
                    & (iy >= local[1]) & (iy < local[4])
                    & (iz >= local[2]) & (iz < local[5])
                ).astype(crop.dtype)
                imageft = proj.project(
                    params,
                    None,
                    depths[idx],
                    poses[idx],
                    w2g,
                    (tx, ty, tz),
                    view_valid=ok,
                    feats=feats2d[idx],
                    zero_floor=floor,
                )
                probs = det.mask_backbone.apply(
                    params,
                    (crop * region[..., None])[None],
                    imageft=(imageft * region[..., None])[None],
                    training=False,
                    region_mask=region[None, ..., None],
                    compute_dtype=det.cfg_static["compute_dtype"],
                )
                bits = (probs[0, :, :, :, label] >= thresh).reshape(-1)
                return jnp.packbits(bits)

            return jax.lax.map(
                one,
                (starts, locals_, labels, w2gs, sel_idx, sel_valid, sel_floor),
            )

        return mask_batch

    def _build_mask_color_fn_resident(self, canvas):
        """MASK_USE_IMAGES with the scene-resident color volume: the color
        branch input is a dynamic_slice of the resident volume — the exact
        reference semantics (crop of the scene-level imageft,
        ``lib/model/trainval.py:882-897``), no per-window re-projection."""
        det = self.det
        tx, ty, tz = canvas
        thresh = float(self.cfg.MASK_THRESH)

        def mask_batch(params, scene_dev, starts, locals_, labels, color_dev):
            c2d = color_dev.shape[-1]
            ix = jnp.arange(tx)[:, None, None]
            iy = jnp.arange(ty)[None, :, None]
            iz = jnp.arange(tz)[None, None, :]

            def one(args):
                start, local, label = args
                crop = jax.lax.dynamic_slice(
                    scene_dev, (start[0], start[1], start[2], 0),
                    (tx, ty, tz, 2),
                )
                imageft = jax.lax.dynamic_slice(
                    color_dev, (start[0], start[1], start[2], 0),
                    (tx, ty, tz, c2d),
                )
                region = (
                    (ix >= local[0]) & (ix < local[3])
                    & (iy >= local[1]) & (iy < local[4])
                    & (iz >= local[2]) & (iz < local[5])
                ).astype(crop.dtype)
                probs = det.mask_backbone.apply(
                    params,
                    (crop * region[..., None])[None],
                    imageft=(imageft * region[..., None].astype(imageft.dtype))[None],
                    training=False,
                    region_mask=region[None, ..., None],
                    compute_dtype=det.cfg_static["compute_dtype"],
                )
                bits = (probs[0, :, :, :, label] >= thresh).reshape(-1)
                return jnp.packbits(bits)

            return jax.lax.map(one, (starts, locals_, labels))

        return mask_batch

    # --- scene-resident color volume ---------------------------------------
    def _bucket_shape(self, scene_shape):
        """The padded device-scene shape ``_upload_scene`` produces."""
        padded = [max(int(d), int(t)) for d, t in zip(scene_shape, self.tile)]
        return tuple(((d + 47) // 48) * 48 for d in padded)

    def _color_resident_ok(self, scene_shape):
        """Does this scene use the resident color volume?"""
        if self._color_res_fn is None:
            return False
        mode = self._resident_mode
        if mode in ("never", "0", "false"):
            return False
        bucket = self._bucket_shape(scene_shape)
        itemsize = 2 if self._dtype == jnp.bfloat16 else 4
        nbytes = (
            int(np.prod(bucket)) * self._num_image_channels * itemsize
        )
        if nbytes > self._color_vol_max_bytes:
            if mode == "always":
                raise ValueError(
                    f"TPU_SCENE_COLOR_RESIDENT=always but the color volume "
                    f"needs {nbytes >> 20} MB > TPU_COLOR_VOLUME_MAX_MB"
                )
            return False
        return True

    def _device_params(self, params):
        """device_put the param dict ONCE per params identity.

        Host-numpy params are ~21 MB; without this every dispatch re-uploads
        them through the ~35 MB/s tunnel (0.6 s per call — measured as the
        dominant cost of whole-scene detect before this cache).
        """
        cached = getattr(self, "_params_cache", None)
        if cached is not None and cached[0] is params:
            return cached[1]
        dev = {k: jax.device_put(jnp.asarray(v)) for k, v in params.items()}
        self._params_cache = (params, dev)
        return dev

    def _upload_scene(self, scene_data: np.ndarray):
        data = pad_volume(scene_data.astype(np.float32), self.tile)
        bucket = [((d + 47) // 48) * 48 for d in data.shape[:3]]
        data = pad_volume(data, bucket)
        # upload at the compute dtype: bf16 halves the ~35 MB/s tunnel
        # transfer, and the first conv casts to bf16 anyway (identical math).
        # The occupancy channel of encoded TSDF is binary (io/dataset.py::
        # encode_tsdf: occ = sdf > -1) — ship it as PACKED BITS (32x fewer
        # bytes) and rebuild the (X, Y, Z, 2) volume on device, value-exact.
        # Scene upload bounds the steady streaming rate (it overlaps compute
        # via prefetch_scene but the tunnel is serial), so bytes ARE time.
        occ = data[..., 1]
        compact = bool(
            dict.get(self.cfg, "TPU_COMPACT_TRANSFERS", True)
        ) and bool(np.isin(occ, (0.0, 1.0)).all())
        if compact:
            if getattr(self, "_rebuild_fn", None) is None:
                dt = self._dtype

                def rebuild(ch0, occ_bytes, shape):
                    bits = (
                        occ_bytes[:, None]
                        >> jnp.arange(7, -1, -1, dtype=jnp.uint8)
                    ) & 1  # MSB-first, matching np.packbits
                    n = shape[0] * shape[1] * shape[2]
                    occ_d = bits.reshape(-1)[:n].reshape(shape).astype(dt)
                    return jnp.stack([ch0, occ_d], axis=-1)

                self._rebuild_fn = jax.jit(rebuild, static_argnames=("shape",))
            scene_dev = self._rebuild_fn(
                jnp.asarray(data[..., 0], dtype=self._dtype),
                jnp.asarray(np.packbits(occ.astype(bool).reshape(-1))),
                data.shape[:3],
            )
        else:
            scene_dev = jax.device_put(jnp.asarray(data, dtype=self._dtype))
        scene_dev.block_until_ready()  # finish the transfer on THIS thread
        return data, scene_dev

    def prefetch_scene(self, scene_data: np.ndarray) -> None:
        """Start the host->device scene transfer in the background.

        Scene upload is ~45% of per-scene wall time through the axon tunnel
        (11 MB bf16 for 240x48x240 at ~35 MB/s); a scene *stream* hides it
        entirely by uploading scene i+1 while scene i computes
        (``infer/driver.py::run_scenes``). No-op if the scene is already
        resident or already in flight.
        """
        cached = getattr(self, "_scene_cache", None)
        if cached is not None and cached[0] is scene_data:
            return
        pf = getattr(self, "_scene_prefetch", None)
        if pf is None:
            pf = self._scene_prefetch = {}
        if id(scene_data) in pf:
            return
        if getattr(self, "_upload_exec", None) is None:
            import concurrent.futures

            self._upload_exec = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="scene-upload"
            )
        if len(pf) >= 4:  # bound HBM held by unconsumed prefetches
            pf.pop(next(iter(pf)))
        pf[id(scene_data)] = (
            scene_data,
            self._upload_exec.submit(self._upload_scene, scene_data),
        )

    def _device_scene(self, scene_data: np.ndarray):
        """Pad to bucketed shape (48-voxel multiples) and device_put ONCE.

        Cached by array identity so detect + predict_masks on the same scene
        share a single transfer; a pending ``prefetch_scene`` of the same
        array is joined instead of re-uploading.
        """
        cached = getattr(self, "_scene_cache", None)
        if cached is not None and cached[0] is scene_data:
            return cached[1], cached[2]
        pf = getattr(self, "_scene_prefetch", None) or {}
        entry = pf.pop(id(scene_data), None)
        if entry is not None and entry[0] is scene_data:
            data, scene_dev = entry[1].result()
        else:
            data, scene_dev = self._upload_scene(scene_data)
        self._scene_cache = (scene_data, data, scene_dev)
        return data, scene_dev

    def prefetch_frames(self, params, frames, scene_shape=None) -> None:
        """Start a scene's color prep (image upload + ENet + resident color
        volume) in the background.

        The image upload (~24 MB for 96 views) plus the ENet pass plus the
        resident-volume projection is the bulk of per-scene color cost; a
        scene stream hides it entirely by preparing scene i+1's views while
        scene i computes (same pattern as ``prefetch_scene``). Results land
        in the bounded ``_prepare_color`` cache keyed by frames-dict
        identity. Pass the scene's (X, Y, Z) shape so the resident color
        volume can be built here too.
        """
        if frames is None or self._color_fns is None:
            return
        cache = getattr(self, "_color_prep_cache", None)
        if cache is not None and id(frames) in cache:
            return
        if getattr(self, "_upload_exec", None) is None:
            import concurrent.futures

            self._upload_exec = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="scene-upload"
            )
        params_d = self._device_params(params)
        self._upload_exec.submit(
            self._prepare_color, params_d, frames, scene_shape
        )

    def _prepare_color(self, params, frames, scene_shape=None):
        """Per-scene color prep: ENet features for all views (bucketed V),
        frusta, and — when the scene shape is known and the volume fits —
        the scene-resident projected color volume.

        Returns a dict with feats2d, depths, poses, frusta, and optionally
        color (device volume) + color_shape. Cached by frames-dict identity
        (bounded dict — a prefetched scene stream holds several scenes' prep
        in flight) so detect + predict_masks on the same scene share one
        ENet pass, one feature upload, and one projection.
        """
        cache = getattr(self, "_color_prep_cache", None)
        if cache is None:
            cache = self._color_prep_cache = {}
        hit = cache.get(id(frames))
        prep = None
        if hit is not None and hit[0] is frames:
            prep = hit[1]
        from tpu3dsis.models.color import frustum_bbox_grid

        proj = self.det.color_projector
        if prep is None:
            images = frames["images"]
            v = images.shape[0]
            vpad = ((v + 31) // 32) * 32  # bucket V to bound recompiles
            feats_fn, _ = self._color_fns
            feats = []
            for i in range(0, vpad, 32):
                blk = images[i : i + 32]
                if blk.shape[0] < 32:
                    blk = np.concatenate(
                        [blk, np.zeros((32 - blk.shape[0], *images.shape[1:]),
                                       images.dtype)]  # uint8 under compact
                    )
                feats.append(feats_fn(params, jnp.asarray(blk)))
            # fuse and store 2D features at the compute dtype: bf16 halves
            # the projection matmul time and bytes, and is exact relative to
            # the backbone's own input cast (max commutes with the monotone
            # bf16 rounding; the one-hot gather only multiplies by 1.0/0.0)
            feats2d = jnp.concatenate(feats, axis=0).astype(self._dtype)
            depths = np.concatenate(
                [frames["depths"],
                 np.zeros((vpad - v, *frames["depths"].shape[1:]), np.float32)]
            )
            poses = np.concatenate(
                [frames["poses"],
                 np.tile(np.eye(4, dtype=np.float32), (vpad - v, 1, 1))]
            )
            frusta = [
                frustum_bbox_grid(
                    frames["poses"][i],
                    frames["world_to_grid"],
                    proj.intrinsic,
                    proj.depth_shape,
                    proj.depth_min,
                    proj.depth_max,
                )
                for i in range(v)
            ]
            prep = {
                "feats2d": feats2d,
                "depths": jnp.asarray(depths),
                "poses": jnp.asarray(poses),
                "frusta": frusta,
            }
        if (
            scene_shape is not None
            and self._color_resident_ok(scene_shape)
            and prep.get("color_shape") != self._bucket_shape(scene_shape)
        ):
            from tpu3dsis.infer.color_volume import make_color_volume_fn

            bucket = self._bucket_shape(scene_shape)
            build = self._color_vol_fns.get(bucket)
            if build is None:
                build = jax.jit(
                    make_color_volume_fn(
                        proj, bucket, self._dtype,
                        views_per_step=int(
                            getattr(self.cfg, "TPU_COLOR_VIEWS_PER_STEP", 1)
                        ),
                        scan_unroll=int(
                            getattr(self.cfg, "TPU_COLOR_SCAN_UNROLL", 8)
                        ),
                    )
                )
                self._color_vol_fns[bucket] = build
            prep = dict(prep)
            # feats2d/depths/poses are padded to the 32-view bucket above;
            # view_valid masks the padding out of the fusion
            n_views = len(prep["frusta"])
            view_valid = np.arange(prep["depths"].shape[0]) < n_views
            prep["color"] = build(
                prep["feats2d"], prep["depths"], prep["poses"],
                jnp.asarray(
                    np.asarray(frames["world_to_grid"], np.float32)
                ),
                jnp.asarray(view_valid),
            )
            prep["color_shape"] = bucket
        if len(cache) >= 4:  # bound HBM held by in-flight preps
            cache.pop(next(iter(cache)))
        cache[id(frames)] = (frames, prep)
        return prep

    # --- main entry -------------------------------------------------------
    def detect(self, params, scene_data: np.ndarray, frames=None):
        """scene_data: (X, Y, Z, 2) encoded TSDF (host array).

        frames (color configs): dict with images (V, H, W, C), depths,
        poses, world_to_grid for the whole scene; each tile fuses only the
        views whose frusta intersect it (up to TPU_MAX_TILE_VIEWS).

        Returns dict(pred_box (N,6), pred_class (N,), pred_conf (N,)) in
        scene voxel coords, stitched + deduplicated, sorted by confidence.
        """
        cfg = self.cfg
        tx, ty, tz = self.tile
        params = self._device_params(params)
        data, scene_dev = self._device_scene(scene_data)
        xs = tile_origins(data.shape[0], tx, self.stride[0])
        ys = tile_origins(data.shape[1], ty, self.stride[1])
        zs = tile_origins(data.shape[2], tz, self.stride[2])
        origins = [(ox, oy, oz) for ox in xs for oy in ys for oz in zs]
        origins_np = np.asarray(origins, np.int32)

        use_color = self._color_fns is not None and frames is not None
        resident = False
        if use_color:
            prep = self._prepare_color(params, frames, scene_data.shape[:3])
            resident = prep.get("color_shape") == data.shape[:3]
            if not resident:
                from tpu3dsis.models.color import (
                    select_views_for_tile,
                    shift_world_to_grid,
                )

                feats2d, depths_d, poses_d, frusta = (
                    prep["feats2d"], prep["depths"], prep["poses"],
                    prep["frusta"],
                )
                w2gs = np.stack(
                    [
                        shift_world_to_grid(frames["world_to_grid"], o)
                        for o in origins
                    ]
                )
                sel = [
                    select_views_for_tile(
                        frusta, o, self.tile, self.max_tile_views
                    )
                    for o in origins
                ]
                sel_idx = np.stack([s[0] for s in sel])
                sel_valid = np.stack([s[1] for s in sel])
                sel_floor = np.asarray([s[2] for s in sel], bool)

        boxes, classes, confs = [], [], []
        bs = self.tile_batch
        n = len(origins)
        nb_batches = -(-n // bs)

        def padb(a, i):
            out = a[i : i + bs]
            if out.shape[0] < bs:
                pad = np.zeros((bs - out.shape[0], *out.shape[1:]), out.dtype)
                out = np.concatenate([out, pad])
            return out

        if use_color and resident:
            # resident color volume: tiles slice TSDF + color on device —
            # one dispatch, origins are the only per-tile operand
            def stackb(a):
                return np.stack([padb(a, i) for i in range(0, n, bs)])

            all_origins = stackb(origins_np)  # (nb, bs, 3)
            nb = all_origins.shape[0]
            if self.mesh is not None:
                n_dev = self.mesh.devices.size
                pad_b = -nb % n_dev
                if pad_b:
                    all_origins = np.concatenate(
                        [all_origins,
                         np.zeros((pad_b, *all_origins.shape[1:]),
                                  all_origins.dtype)]
                    )
                nb += pad_b
            out = self._color_res_fn(
                params, scene_dev, jnp.asarray(all_origins), prep["color"]
            )
            out = jax.device_get(out)  # one bulk transfer
            out_np = {
                k: np.asarray(v).reshape(nb * bs, *v.shape[2:])
                for k, v in out.items()
            }
        elif use_color:
            # ONE dispatch for the whole scene (lax.map over tile batches on
            # device) + one bulk download — per-batch dispatches each paid a
            # tunnel round trip, ~25x the tile compute
            def stackb(a):
                return np.stack([padb(a, i) for i in range(0, n, bs)])

            all_origins = stackb(origins_np)  # (nb, bs, 3)
            all_w2gs = stackb(w2gs)
            all_sel_idx = stackb(sel_idx)
            all_sel_valid = stackb(sel_valid)
            all_sel_floor = stackb(sel_floor)
            nb = all_origins.shape[0]
            if self.mesh is not None:
                # pad the batch axis to the mesh size; padded batches land
                # past index n and are never read by the stitch loop below
                n_dev = self.mesh.devices.size
                pad_b = -nb % n_dev
                if pad_b:
                    def padm(a):
                        return np.concatenate(
                            [a, np.zeros((pad_b, *a.shape[1:]), a.dtype)]
                        )

                    all_origins = padm(all_origins)
                    all_w2gs = padm(all_w2gs)
                    all_sel_idx = padm(all_sel_idx)
                    all_sel_valid = padm(all_sel_valid)
                    all_sel_floor = padm(all_sel_floor)
                nb += pad_b
            out = self._color_fns[1](
                params,
                scene_dev,
                jnp.asarray(all_origins),
                jnp.asarray(all_w2gs),
                jnp.asarray(all_sel_idx),
                jnp.asarray(all_sel_valid),
                jnp.asarray(all_sel_floor),
                feats2d,
                depths_d,
                poses_d,
            )
            out = jax.device_get(out)  # one bulk transfer
            out_np = {
                k: np.asarray(v).reshape(nb * bs, *v.shape[2:])
                for k, v in out.items()
            }
        else:
            all_origins = np.stack(
                [padb(origins_np, i) for i in range(0, n, bs)]
            )  # (nb_batches, bs, 3)
            if self.mesh is not None:
                # pad the batch axis to the mesh size and give each device a
                # contiguous run of tile batches; padded batches land past
                # index n and are never read by the stitch loop below
                n_dev = self.mesh.devices.size
                k = -(-nb_batches // n_dev)
                pad_b = n_dev * k - nb_batches
                if pad_b:
                    all_origins = np.concatenate(
                        [all_origins,
                         np.zeros((pad_b, bs, 3), all_origins.dtype)]
                    )
                all_origins = all_origins.reshape(n_dev, k, bs, 3)
                nb_batches = n_dev * k
            out = self._tiled_fn(params, scene_dev, jnp.asarray(all_origins))
            out = jax.device_get(out)  # one bulk transfer, not one per key
            lead = 2 if self.mesh is None else 3  # (.., bs) batch dims
            out_np = {
                key: np.asarray(v).reshape(nb_batches * bs, *v.shape[lead:])
                for key, v in out.items()
            }

        for j in range(n):
            keep = (
                out_np["valid"][j]
                & ~out_np["degenerate"][j]
                & (out_np["pred_conf"][j] > cfg.CLASS_THRESH)
                & (out_np["cls_pred"][j] > 0)
            )
            if not keep.any():
                continue
            b = out_np["pred_box"][j][keep]
            off = np.array(origins[j], np.float32)
            boxes.append(b + np.concatenate([off, off]))
            classes.append(out_np["cls_pred"][j][keep])
            confs.append(out_np["pred_conf"][j][keep])

        if not boxes:
            return {
                "pred_box": np.zeros((0, 6), np.float32),
                "pred_class": np.zeros((0,), np.int32),
                "pred_conf": np.zeros((0,), np.float32),
            }

        boxes = np.concatenate(boxes)
        classes = np.concatenate(classes)
        confs = np.concatenate(confs)
        keep = self._stitch_nms(boxes, classes, confs)
        # clip to the true (unpadded) scene extent
        sx, sy, sz = scene_data.shape[:3]
        out_box = np.clip(
            boxes[keep], 0, np.array([sx, sy, sz, sx, sy, sz], np.float32)
        )
        return {
            "pred_box": out_box,
            "pred_class": classes[keep].astype(np.int32),
            "pred_conf": confs[keep],
        }

    def _stitch_nms(self, boxes, classes, confs, thresh=None):
        """Class-aware greedy NMS across tiles (host numpy, +1 extents)."""
        if thresh is None:
            thresh = float(dict.get(self.cfg, "TPU_STITCH_NMS_THRESH", 0.25))
        # stable: equal-confidence candidates keep tile order, matching the
        # device path's top_k tie-break (lower index first) so fused and
        # multi-dispatch NMS pick the same member of a tied group
        order = np.argsort(-confs, kind="stable")
        keep = []
        iou = np.asarray(
            nms_overlap(jnp.asarray(boxes), jnp.asarray(boxes))
        )
        suppressed = np.zeros(len(boxes), bool)
        for i in order:
            if suppressed[i]:
                continue
            keep.append(i)
            same = classes == classes[i]
            suppressed |= same & (iou[i] > thresh)
        return np.array(keep, np.int64)

    # --- masks ------------------------------------------------------------
    def predict_masks(self, params, scene_data: np.ndarray, det_out: dict,
                      batch: int = 16, frames=None):
        """Per kept box: sigmoid mask of the predicted class, thresholded.

        Halo windows are planned on the host, sliced from the device-resident
        scene, and run through the mask FCN in fixed-size device batches (one
        dispatch per `batch` windows). MASK_USE_IMAGES configs additionally
        project each window's views into the window grid for the color
        branch (pass the same `frames` dict given to detect()). Returns a
        list of (bw, bh, bl) uint8 box-crop masks (reference
        trainval.py:755-762 artifact semantics), exact for boxes of any size.
        """
        if self._mask_fn is None:
            return []
        use_color = self._mask_color_fn is not None
        if use_color and frames is None:
            raise ValueError(
                "MASK_USE_IMAGES config: predict_masks needs the frames dict"
            )
        from tpu3dsis.ops.mask_windows import plan_windows_np

        params = self._device_params(params)
        data, scene_dev = self._device_scene(scene_data)
        scene_shape = data.shape[:3]

        n = len(det_out["pred_box"])
        if n == 0:
            return []
        # one work item per halo window: boxes that fit a canvas get exactly
        # one (round-1 behavior); larger boxes get several, each exact on its
        # owned segment (ops/mask_windows.py). Boxes that fit the SMALL
        # canvas route to the small-canvas FCN program — exact (see
        # mask_canvas_small in __init__) with ~6x fewer voxels per window.
        small = self.mask_canvas_small
        queues = {"large": (self.mask_canvas, [], batch)}
        if small is not None and self._mask_fn_small is not None:
            # small windows are ~6x cheaper: 4x larger device batches keep
            # dispatch overhead amortized without growing transient memory
            queues["small"] = (small, [], batch * 4)
        full_sizes = []
        for i, (box, cls) in enumerate(
            zip(det_out["pred_box"], det_out["pred_class"])
        ):
            r = np.round(box).astype(int)
            dims = r[3:] - r[:3]
            full_sizes.append(tuple(dims))
            which = (
                "small"
                if "small" in queues and np.all(dims <= np.asarray(small))
                else "large"
            )
            canvas, items, _ = queues[which]
            for start, local, own in plan_windows_np(box, scene_shape, canvas):
                items.append((i, start, local, own, int(cls)))

        masks = [np.zeros(fs, np.uint8) for fs in full_sizes]
        box_r0 = np.round(det_out["pred_box"][:, :3]).astype(int)
        n_dev = 1 if self.mesh is None else self.mesh.devices.size

        resident = False
        if use_color:
            prep = self._prepare_color(params, frames, scene_data.shape[:3])
            resident = (
                prep.get("color_shape") == data.shape[:3]
                and self._mask_color_res_fn is not None
            )
            if not resident:
                from tpu3dsis.models.color import (
                    select_views_for_tile,
                    shift_world_to_grid,
                )

                feats2d, depths_d, poses_d, frusta = (
                    prep["feats2d"], prep["depths"], prep["poses"],
                    prep["frusta"],
                )

        for which, (canvas, items, qbatch) in queues.items():
            if not items:
                continue
            cx, cy, cz = canvas
            box_idx = [it[0] for it in items]
            starts = np.stack([it[1] for it in items]).astype(np.int32)
            locals6 = np.stack([it[2] for it in items]).astype(np.int32)
            owns = [it[3] for it in items]
            labels = np.asarray([it[4] for it in items], np.int32)
            if use_color and resident:
                mask_fn = (
                    self._mask_color_res_fn
                    if which == "large"
                    else self._mask_color_res_fn_small
                )
            elif use_color:
                mask_fn = (
                    self._mask_color_fn
                    if which == "large"
                    else self._mask_color_fn_small
                )
                w2gs = np.stack(
                    [
                        shift_world_to_grid(frames["world_to_grid"], s)
                        for s in starts
                    ]
                )
                sel = [
                    select_views_for_tile(
                        frusta, s, canvas, self.max_tile_views
                    )
                    for s in starts
                ]
                sel_idx = np.stack([s[0] for s in sel])
                sel_valid = np.stack([s[1] for s in sel])
                sel_floor = np.asarray([s[2] for s in sel], bool)
            else:
                mask_fn = (
                    self._mask_fn if which == "large" else self._mask_fn_small
                )

            # device batches of `qbatch` windows, pow2-bucketed tail
            # (measured faster than one mega-dispatch: the uint8 download
            # overlaps the next batch's compute across dispatches). On a
            # mesh, each batch is `qbatch` windows PER DEVICE, padded to a
            # mesh-divisible count.
            qbatch = qbatch * n_dev
            n_items = len(items)
            i = 0
            while i < n_items:
                m = min(qbatch, n_items - i)
                per = -(-m // n_dev)
                m_pad = n_dev * (1 << (per - 1).bit_length())

                def padb(a):
                    out = a[i : i + m]
                    if out.shape[0] < m_pad:
                        out = np.concatenate(
                            [out,
                             np.zeros((m_pad - out.shape[0], *out.shape[1:]),
                                      a.dtype)]
                        )
                    return out

                if use_color and resident:
                    got = np.asarray(
                        mask_fn(
                            params, scene_dev, jnp.asarray(padb(starts)),
                            jnp.asarray(padb(locals6)),
                            jnp.asarray(padb(labels)), prep["color"],
                        )
                    )[:m]
                elif use_color:
                    got = np.asarray(
                        mask_fn(
                            params, scene_dev, jnp.asarray(padb(starts)),
                            jnp.asarray(padb(locals6)),
                            jnp.asarray(padb(labels)),
                            jnp.asarray(padb(w2gs)),
                            jnp.asarray(padb(sel_idx)),
                            jnp.asarray(padb(sel_valid)),
                            jnp.asarray(padb(sel_floor)), feats2d, depths_d,
                            poses_d,
                        )
                    )[:m]
                else:
                    got = np.asarray(
                        mask_fn(
                            params, scene_dev, jnp.asarray(padb(starts)),
                            jnp.asarray(padb(locals6)),
                            jnp.asarray(padb(labels)),
                        )
                    )[:m]
                # bit-packed windows -> (m, cx, cy, cz)
                got = np.unpackbits(got, axis=1, count=cx * cy * cz).reshape(
                    m, cx, cy, cz
                )
                for j in range(m):
                    b = box_idx[i + j]
                    own = owns[i + j]
                    st = starts[i + j]
                    crop = got[j][
                        own[0] - st[0] : own[3] - st[0],
                        own[1] - st[1] : own[4] - st[1],
                        own[2] - st[2] : own[5] - st[2],
                    ]
                    o = own[:3] - box_r0[b]
                    masks[b][
                        o[0] : o[0] + crop.shape[0],
                        o[1] : o[1] + crop.shape[1],
                        o[2] : o[2] + crop.shape[2],
                    ] = crop
                i += m
        return masks

    # --- fused one-dispatch scene inference -------------------------------
    def _build_fused_fn(self, use_color: bool = False):
        """Whole-scene instance segmentation as ONE XLA program.

        tiles -> flatten -> device class-aware stitch NMS -> in-graph mask
        window planning (small/large canvas queues) -> mask FCN -> bit-packed
        masks. The multi-dispatch path (detect + predict_masks) pays one host
        round trip per stage — ~50-100 ms each through the axon tunnel — and
        a detect->masks host sync; fusing removes all of it. Per-item math is
        identical: the device NMS is the same greedy algorithm as
        ``_stitch_nms`` (``ops/nms.py::nms_mask``, class-aware via the
        ``classes`` operand so IoU stays computed on raw boxes), windows are
        the same plans as ``plan_windows_np`` (``ops/mask_windows.py`` — the
        jnp planner used by training), and the FCN crop math matches
        ``_build_mask_fn``. Fixed-capacity queues replace the host's dynamic
        lists (the TPU-idiomatic trade): overflow is COUNTED and returned so
        ``infer_fused`` can reconcile through the exact host-planned path.

        With ``use_color`` the program takes the scene-resident projected
        color volume as one more operand: tiles and (under MASK_USE_IMAGES)
        mask windows dynamic_slice their color crop from it, exactly like
        the multi-dispatch resident path.
        """
        det, cfg = self.det, self.cfg
        mask_color = (
            use_color
            and det.color_projector is not None
            and bool(dict.get(cfg, "MASK_USE_IMAGES", False))
        )
        single = self._single
        tile = self.tile
        bs = self.tile_batch
        nms_thresh = float(dict.get(cfg, "TPU_STITCH_NMS_THRESH", 0.25))
        class_thresh = float(cfg.CLASS_THRESH)
        mask_thresh = float(cfg.MASK_THRESH)
        pre_cap = int(dict.get(cfg, "TPU_FUSED_PRE_NMS", 1024))
        k_det = int(dict.get(cfg, "TPU_FUSED_MAX_DETECTIONS", 64))
        large_cap = int(dict.get(cfg, "TPU_FUSED_LARGE_WINDOWS", 12))
        canvas_l = self.mask_canvas
        canvas_s = self.mask_canvas_small or canvas_l
        use_mask = det.mask_backbone is not None
        dtype = self._dtype

        from tpu3dsis.ops.mask_windows import plan_windows
        from tpu3dsis.ops.nms import nms_mask

        def run_queue(params, scene_dev, plan, labels_item, canvas, chunk,
                      color_dev=None):
            cx, cy, cz = canvas
            ix = jnp.arange(cx)[:, None, None]
            iy = jnp.arange(cy)[None, :, None]
            iz = jnp.arange(cz)[None, None, :]

            def one(start, local, label):
                crop = jax.lax.dynamic_slice(
                    scene_dev, (start[0], start[1], start[2], 0),
                    (cx, cy, cz, 2),
                )
                region = (
                    (ix >= local[0]) & (ix < local[3])
                    & (iy >= local[1]) & (iy < local[4])
                    & (iz >= local[2]) & (iz < local[5])
                ).astype(crop.dtype)
                kwargs = {}
                if color_dev is not None:
                    imageft = jax.lax.dynamic_slice(
                        color_dev, (start[0], start[1], start[2], 0),
                        (cx, cy, cz, color_dev.shape[-1]),
                    )
                    kwargs["imageft"] = (
                        imageft * region[..., None].astype(imageft.dtype)
                    )[None]
                probs = det.mask_backbone.apply(
                    params,
                    (crop * region[..., None])[None],
                    training=False,
                    region_mask=region[None, ..., None],
                    compute_dtype=dtype,
                    **kwargs,
                )
                bits = (probs[0, :, :, :, label] >= mask_thresh).reshape(-1)
                return jnp.packbits(bits)

            c = plan["starts"].shape[0]
            pad = -c % chunk

            def padq(a):
                a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                return a.reshape(-1, chunk, *a.shape[1:])

            packed = jax.lax.map(
                lambda args: jax.vmap(one)(*args),
                (padq(plan["starts"]), padq(plan["locals6"]),
                 padq(labels_item)),
            )
            return packed.reshape(c + pad, -1)[:c]

        def fused(params, scene_dev, origins, tile_valid, extent,
                  color_dev=None):
            # origins (T, 3) padded to a tile_batch multiple; tile_valid (T,)
            # marks real tiles; extent (3,) true scene size for final clip
            def one_tile(origin):
                t = jax.lax.dynamic_slice(
                    scene_dev, (origin[0], origin[1], origin[2], 0),
                    (*tile, 2),
                )
                if use_color:
                    col = jax.lax.dynamic_slice(
                        color_dev, (origin[0], origin[1], origin[2], 0),
                        (*tile, color_dev.shape[-1]),
                    )
                    out = single(params, t[None], {"imageft": col})
                else:
                    out = single(params, t[None])
                return {k: out[k] for k in _STITCH_KEYS}

            outs = jax.lax.map(
                lambda ob: jax.vmap(one_tile)(ob), origins.reshape(-1, bs, 3)
            )
            t_total = origins.shape[0]
            flat = {
                k: v.reshape(t_total * v.shape[2], *v.shape[3:])
                for k, v in outs.items()
            }
            n_t = flat["pred_box"].shape[0] // t_total
            org_rep = jnp.repeat(origins, n_t, axis=0).astype(jnp.float32)
            boxes = flat["pred_box"] + jnp.concatenate(
                [org_rep, org_rep], axis=1
            )
            conf = flat["pred_conf"]
            cls = flat["cls_pred"].astype(jnp.int32)
            dvalid = (
                flat["valid"]
                & ~flat["degenerate"]
                & (conf > class_thresh)
                & (cls > 0)
                & jnp.repeat(tile_valid, n_t)
            )

            # top-P by confidence feed the stitch NMS (host path is unbounded;
            # overflow is counted and triggers the host fallback)
            p = min(pre_cap, boxes.shape[0])
            conf_m = jnp.where(dvalid, conf, -jnp.inf)
            top_conf, top_idx = jax.lax.top_k(conf_m, p)
            boxes_p = boxes[top_idx]
            cls_p = cls[top_idx]
            valid_p = jnp.isfinite(top_conf)
            pre_overflow = jnp.sum(dvalid) - jnp.sum(valid_p)

            keep = nms_mask(boxes_p, nms_thresh, valid_p, classes=cls_p)
            # fixed-size keep-index compaction (as ops/nms.py::nms_keep_indices,
            # inlined so the keep mask is computed once and the K-cap overflow
            # can be counted from it)
            rank = jnp.cumsum(keep) - 1
            slot = jnp.where(keep & (rank < k_det), rank, k_det)
            keep_idx = jnp.zeros((k_det + 1,), jnp.int32).at[slot].set(
                jnp.arange(p, dtype=jnp.int32), mode="drop"
            )[:k_det]
            num_kept = jnp.sum(keep)
            kept_valid = jnp.arange(k_det) < num_kept
            det_overflow = jnp.maximum(num_kept - k_det, 0)
            ext = jnp.concatenate([extent, extent]).astype(jnp.float32)
            kept_box = jnp.clip(boxes_p[keep_idx], 0.0, ext[None])
            kept_cls = cls_p[keep_idx]
            kept_conf = top_conf[keep_idx]

            out = {
                "pred_box": kept_box,
                "pred_class": kept_cls,
                "pred_conf": kept_conf,
                "det_valid": kept_valid,
                "pre_overflow": pre_overflow,
                "det_overflow": det_overflow,
            }
            if use_mask:
                pad_shape = scene_dev.shape[:3]
                dims = jnp.round(kept_box[:, 3:6]) - jnp.round(kept_box[:, :3])
                fits = jnp.all(
                    dims <= jnp.asarray(canvas_s, jnp.float32)[None], axis=1
                )
                plan_s = plan_windows(
                    kept_box, kept_valid & fits, pad_shape, canvas_s, k_det,
                    single_window=True,
                )
                plan_l = plan_windows(
                    kept_box, kept_valid & ~fits, pad_shape, canvas_l,
                    large_cap, allow_drop=True,
                )
                mask_col = color_dev if mask_color else None
                out["mask_small"] = {
                    "starts": plan_s["starts"],
                    "own6": plan_s["own6"],
                    "roi_idx": plan_s["roi_idx"],
                    "valid": plan_s["valid"],
                    "dropped": plan_s["dropped"],
                    "packed": run_queue(
                        params, scene_dev, plan_s,
                        kept_cls[plan_s["roi_idx"]], canvas_s, 8,
                        color_dev=mask_col,
                    ),
                }
                out["mask_large"] = {
                    "starts": plan_l["starts"],
                    "own6": plan_l["own6"],
                    "roi_idx": plan_l["roi_idx"],
                    "valid": plan_l["valid"],
                    "dropped": plan_l["dropped"],
                    "packed": run_queue(
                        params, scene_dev, plan_l,
                        kept_cls[plan_l["roi_idx"]], canvas_l, 4,
                        color_dev=mask_col,
                    ),
                }
            return out

        return fused

    def infer(self, params, scene_data: np.ndarray, frames=None):
        """One-dispatch scene inference: (det_out, masks) per kept box.

        Geometry configs — and color configs whose scene-resident color
        volume fits HBM (``TPU_SCENE_COLOR_RESIDENT``) — run detect +
        stitch NMS + mask FCN as ONE jitted program (one tunnel round trip;
        color additionally pays the per-scene prep dispatch, which a scene
        stream prefetches); results are identical to ``detect`` +
        ``predict_masks`` (pinned by ``test_fused_matches_multidispatch``
        and its color leg). Meshes and over-budget color scenes fall back to
        the multi-dispatch path, as do rare capacity overflows — counted on
        device, reconciled through the exact host-planned path here.
        """
        self._last_fused = False  # diagnostic: did the fused program serve?
        use_color = self._color_fns is not None and frames is not None
        color_fusable = (
            use_color
            and self.mesh is None
            and self._color_resident_ok(scene_data.shape[:3])
        )
        if (
            (use_color and not color_fusable)
            or (frames is not None) != use_color
            or (self._color_fns is not None and frames is None)
            or self.mesh is not None
            or self.det.mask_backbone is None
            or not self.det.cfg_static["use_class"]
        ):
            out = self.detect(params, scene_data, frames=frames)
            return out, self.predict_masks(
                params, scene_data, out, frames=frames
            )
        from tpu3dsis.ops.mask_windows import plan_windows_np

        params_d = self._device_params(params)
        prep = None
        if use_color:
            prep = self._prepare_color(
                params_d, frames, scene_data.shape[:3]
            )
            if getattr(self, "_fused_fn_color", None) is None:
                self._fused_fn_color = jax.jit(
                    self._build_fused_fn(use_color=True)
                )
        elif getattr(self, "_fused_fn", None) is None:
            self._fused_fn = jax.jit(self._build_fused_fn())
        data, scene_dev = self._device_scene(scene_data)
        if use_color and prep.get("color_shape") != data.shape[:3]:
            # resident volume unavailable at this shape: exact fallback
            out = self.detect(params, scene_data, frames=frames)
            return out, self.predict_masks(
                params, scene_data, out, frames=frames
            )
        tx, ty, tz = self.tile
        xs = tile_origins(data.shape[0], tx, self.stride[0])
        ys = tile_origins(data.shape[1], ty, self.stride[1])
        zs = tile_origins(data.shape[2], tz, self.stride[2])
        origins = np.asarray(
            [(ox, oy, oz) for ox in xs for oy in ys for oz in zs], np.int32
        )
        n = len(origins)
        pad = -n % self.tile_batch
        if pad:
            origins = np.concatenate(
                [origins, np.zeros((pad, 3), np.int32)]
            )
        tile_valid = np.arange(n + pad) < n
        extent = np.asarray(scene_data.shape[:3], np.int32)
        if use_color:
            out = jax.device_get(
                self._fused_fn_color(
                    params_d, scene_dev, jnp.asarray(origins),
                    jnp.asarray(tile_valid), jnp.asarray(extent),
                    prep["color"],
                )
            )
        else:
            out = jax.device_get(
                self._fused_fn(
                    params_d, scene_dev, jnp.asarray(origins),
                    jnp.asarray(tile_valid), jnp.asarray(extent),
                )
            )
        if int(out["pre_overflow"]) > 0 or int(out["det_overflow"]) > 0:
            # more confident detections than the device queues hold: the
            # host-planned path is unbounded — use it for this scene
            det_out = self.detect(params, scene_data, frames=frames)
            return det_out, self.predict_masks(
                params, scene_data, det_out, frames=frames
            )
        self._last_fused = True

        kv = out["det_valid"].astype(bool)
        det_out = {
            "pred_box": out["pred_box"][kv].astype(np.float32),
            "pred_class": out["pred_class"][kv].astype(np.int32),
            "pred_conf": out["pred_conf"][kv].astype(np.float32),
        }
        n_kept = int(kv.sum())
        boxes_r = np.round(det_out["pred_box"]).astype(int)
        masks = [
            np.zeros(tuple(r[3:] - r[:3]), np.uint8) for r in boxes_r
        ]
        # kept-slot index -> compact mask index
        slot_to_out = np.full(len(kv), -1, np.int64)
        slot_to_out[kv] = np.arange(n_kept)
        delivered = np.zeros(len(kv), np.int64)
        for qname, canvas in (
            ("mask_small", self.mask_canvas_small or self.mask_canvas),
            ("mask_large", self.mask_canvas),
        ):
            q = out[qname]
            cx, cy, cz = canvas
            unpacked = np.unpackbits(
                q["packed"], axis=1, count=cx * cy * cz
            ).reshape(-1, cx, cy, cz)
            for j in range(len(q["valid"])):
                if not q["valid"][j]:
                    continue
                b = slot_to_out[int(q["roi_idx"][j])]
                if b < 0:
                    continue
                delivered[int(q["roi_idx"][j])] += 1
                own = q["own6"][j]
                st = q["starts"][j]
                crop = unpacked[j][
                    own[0]:own[3], own[1]:own[4], own[2]:own[5]
                ]
                o = st[:3] + own[:3] - boxes_r[b][:3]
                masks[b][
                    o[0]:o[0] + crop.shape[0],
                    o[1]:o[1] + crop.shape[1],
                    o[2]:o[2] + crop.shape[2],
                ] = crop
        if int(out["mask_large"]["dropped"]) > 0:
            # reconcile rois whose halo windows did not all fit the device
            # queue: recompute those through the exact host-planned path.
            # Only large-routed rois (dims > small canvas) can be shorted —
            # the small queue's capacity equals the roi count.
            small_dims = np.asarray(self.mask_canvas_small or self.mask_canvas)
            short = []
            for slot in np.nonzero(kv)[0]:
                b = slot_to_out[slot]
                if np.all(boxes_r[b][3:] - boxes_r[b][:3] <= small_dims):
                    continue
                want = len(plan_windows_np(
                    det_out["pred_box"][b], data.shape[:3], self.mask_canvas
                ))
                if delivered[slot] < want:
                    short.append(b)
            if short:
                sub = {k: v[short] for k, v in det_out.items()}
                redo = self.predict_masks(
                    params, scene_data, sub, frames=frames
                )
                for b, mk in zip(short, redo):
                    masks[b] = mk
        return det_out, masks

    def device_seconds(self, params, scene_data: np.ndarray, frames=None,
                       iters: int = 6):
        """Device-bound seconds per fused scene program (scan-amortized).

        Times ONLY the on-device compute of the fused one-dispatch program
        (tiles + stitch NMS + mask FCN windows) by chaining `iters`
        executions inside one jitted ``lax.scan`` with a carried data
        dependency — the tunnel-independent capability figure. Excludes
        host<->device transfer, per-scene color prep, and host mask unpack,
        all of which a degraded axon tunnel can inflate arbitrarily (BENCH
        r3: identical code captured at 34 vs 170 scenes/min). bench.py
        reports this alongside the wall-clock stream rate and uses it to
        flag stall-degenerate passes.
        """
        use_color = self._color_fns is not None and frames is not None
        params_d = self._device_params(params)
        color_dev = None
        if use_color:
            prep = self._prepare_color(params_d, frames, scene_data.shape[:3])
            color_dev = prep.get("color")
            if color_dev is None:
                raise ValueError(
                    "device_seconds requires the resident color volume"
                )
        data, scene_dev = self._device_scene(scene_data)
        tx, ty, tz = self.tile
        xs = tile_origins(data.shape[0], tx, self.stride[0])
        ys = tile_origins(data.shape[1], ty, self.stride[1])
        zs = tile_origins(data.shape[2], tz, self.stride[2])
        origins = np.asarray(
            [(ox, oy, oz) for ox in xs for oy in ys for oz in zs], np.int32
        )
        n = len(origins)
        pad = -n % self.tile_batch
        if pad:
            origins = np.concatenate([origins, np.zeros((pad, 3), np.int32)])
        tile_valid = jnp.asarray(np.arange(n + pad) < n)
        origins = jnp.asarray(origins)
        extent = jnp.asarray(np.asarray(scene_data.shape[:3], np.int32))
        fused = self._build_fused_fn(use_color=use_color)

        # params/volume/origins enter as jit ARGUMENTS, not closures: a
        # closed-over device array is embedded into the serialized HLO as a
        # literal, and the resident color volume (~450 MB bf16) blows the
        # axon remote_compile request limit (measured HTTP 413)
        def repeated(scene_dev, params_d, origins, tile_valid, extent,
                     color_dev):
            def body(c, _):
                sd = scene_dev + (c * 1e-20).astype(scene_dev.dtype)
                if use_color:
                    out = fused(params_d, sd, origins, tile_valid, extent,
                                color_dev)
                else:
                    out = fused(params_d, sd, origins, tile_valid, extent)
                r = jnp.float32(jnp.sum(out["pred_conf"]))
                if "mask_small" in out:
                    r = r + jnp.float32(
                        jnp.sum(out["mask_small"]["packed"])
                        + jnp.sum(out["mask_large"]["packed"])
                    )
                return r, ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        f = jax.jit(repeated)
        args = (scene_dev, params_d, origins, tile_valid, extent, color_dev)
        float(f(*args))  # compile + drain
        import time as _time

        t0 = _time.perf_counter()
        float(f(*args))
        return (_time.perf_counter() - t0) / iters
