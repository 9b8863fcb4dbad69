"""The jitted training step: full forward + targets + losses + SGD update.

TPU-first re-orchestration of one reference iteration
(``lib/model/trainval.py:317-384`` + ``Network.forward`` TRAIN branch,
``network.py:78-185``): everything — backbone, RPN, target assignment,
proposal selection/NMS, RoI pooling, mask FCN, losses, backward, SGD — is ONE
XLA program per step. Data parallelism shards the chunk batch over the device
mesh; gradients are averaged with `jax.lax.pmean` inside `shard_map`
(SURVEY.md section 2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsis.models.detector import Detector
from tpu3dsis.models.rpn import select_proposals
from tpu3dsis.train import losses as L
from tpu3dsis.train import targets as T
from tpu3dsis.train.solver import SGDState, apply_updates, make_solver


class TrainState(NamedTuple):
    params: dict
    opt: SGDState


def _window_region_mask(local, canvas):
    ix = jnp.arange(canvas[0])[:, None, None]
    iy = jnp.arange(canvas[1])[None, :, None]
    iz = jnp.arange(canvas[2])[None, None, :]
    return (
        (ix >= local[0]) & (ix < local[3])
        & (iy >= local[1]) & (iy < local[4])
        & (iz >= local[2]) & (iz < local[5])
    ).astype(jnp.float32)


def _mask_forward_scan(detector, params, scene, rois, roi_valid, scene_shape,
                       canvas, imageft=None, chunk=4, extra_windows=4,
                       capacity=None, allow_drop=False, single_window=False):
    """Run the mask FCN over a fixed-capacity queue of roi crop windows.

    Each roi that fits the `canvas` (TPU_MASK_CANVAS) gets ONE window with
    the region re-masked after every conv — identical math to the
    reference's exact-size crops (network.py:170-184). Oversize rois are
    halo-decomposed into several windows (ops/mask_windows.py), each exact
    on its owned output segment, filling up to `extra_windows` spare queue
    slots. Statically-unrolled blocks of `chunk` windows bound transient
    memory and are rematerialized for the backward pass. NOTE: deliberately
    NOT lax.map — grad-of-scan-of-remat hits a pathological slow path
    (~30x) on the CPU backend.

    Returns dict(logits (C, *canvas, NC), own_masks (C, *canvas),
    starts (C, 3), roi_idx (C,), valid (C,), dropped ()).
    """
    from tpu3dsis.ops.mask_windows import plan_windows

    canvas = tuple(int(min(c, s)) for c, s in zip(canvas, scene_shape))
    full = canvas == tuple(scene_shape)
    m_rois = rois.shape[0]
    if full:
        # windows degenerate to the whole volume: share the scene across
        # rois instead of materializing per-roi crop copies
        if capacity is not None and capacity < m_rois:
            # compaction (valid first) so a reduced-capacity queue drops
            # only invalid rois when possible; real drops are counted
            order = jnp.argsort(~roi_valid, stable=True)[:capacity]
            rois = rois[order]
            kept_valid = roi_valid[order]
            dropped = jnp.sum(roi_valid) - jnp.sum(kept_valid)
            roi_idx = order.astype(jnp.int32)
            item_valid = kept_valid
            m_rois = capacity
        else:
            roi_idx = jnp.arange(m_rois, dtype=jnp.int32)
            item_valid = roi_valid
            dropped = jnp.zeros((), jnp.int32)
        starts = jnp.zeros((m_rois, 3), jnp.int32)
        locals6 = jnp.round(rois).astype(jnp.int32)
        own6 = locals6
    else:
        plan = plan_windows(
            rois, roi_valid, scene_shape, canvas,
            m_rois + extra_windows if capacity is None else capacity,
            allow_drop=allow_drop, single_window=single_window,
        )
        starts, locals6, own6 = plan["starts"], plan["locals6"], plan["own6"]
        roi_idx, item_valid = plan["roi_idx"], plan["valid"]
        dropped = plan["dropped"]
    regions = jax.vmap(lambda l: _window_region_mask(l, canvas))(locals6)
    own_masks = jax.vmap(lambda l: _window_region_mask(l, canvas))(own6)

    if full:
        crops = jnp.broadcast_to(scene[None], (m_rois, *scene.shape))
        ift_crops = (
            jnp.broadcast_to(imageft[None], (m_rois, *imageft.shape))
            if imageft is not None
            else None
        )
    else:
        def crop(vol, start):
            return jax.lax.dynamic_slice(
                vol, (start[0], start[1], start[2], 0), (*canvas, vol.shape[-1])
            )

        crops = jax.vmap(lambda s: crop(scene, s))(starts)
        ift_crops = None
        if imageft is not None:
            ift_crops = jax.vmap(lambda s: crop(imageft, s))(starts)

    @jax.checkpoint
    def one_block(args):
        x, masks, ift = args
        x = x * masks[..., None]
        if ift is not None:
            ift = ift * masks[..., None]
        return detector.mask_backbone.apply(
            params,
            x,
            imageft=ift,
            training=True,
            region_mask=masks[..., None],
            compute_dtype=detector.cfg_static["compute_dtype"],
        )

    m = crops.shape[0]
    nblk = (m + chunk - 1) // chunk
    pad = nblk * chunk - m

    def padm(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    crops_p = padm(crops)
    regions_p = padm(regions)
    ift_p = padm(ift_crops) if ift_crops is not None else None
    outs = []
    for i in range(nblk):
        sl = slice(i * chunk, (i + 1) * chunk)
        outs.append(
            one_block(
                (crops_p[sl], regions_p[sl],
                 ift_p[sl] if ift_p is not None else None)
            )
        )
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return {
        "logits": out[:m],
        "own_masks": own_masks,
        "starts": starts,
        "roi_idx": roi_idx,
        "valid": item_valid,
        "dropped": dropped,
    }


def build_loss_fn(detector: Detector, cfg, scene_shape):
    """Single-sample loss closure (vmapped/shard_mapped by the caller)."""
    level_anchors = detector.level_anchors(scene_shape)
    anchor_arrays = {
        l: jnp.asarray(a.anchors) for l, a in level_anchors.items()
    }
    inside_masks = {
        l: jnp.asarray(a.inside) for l, a in level_anchors.items()
    }
    class_weights = jnp.asarray(cfg.NORMALIZE_WEIGHTS, jnp.float32)
    shape_t = tuple(int(s) for s in scene_shape)
    pre_n = int(cfg.TRAIN.RPN_PRE_NMS_TOP_N)
    post_n = int(cfg.TRAIN.RPN_POST_NMS_TOP_N)
    nms_thresh = float(cfg.TRAIN.RPN_NMS_THRESH)
    max_mask_rois = int(getattr_cfg(cfg, "TPU_MAX_MASK_ROIS", 16))
    mask_extra_windows = int(getattr_cfg(cfg, "TPU_MASK_EXTRA_WINDOWS", 4))
    mask_canvas_dims = tuple(
        int(c) for c in getattr_cfg(cfg, "TPU_MASK_CANVAS", list(scene_shape))
    )
    # opt-in small-canvas fast queue for mask training (TPU_MASK_CANVAS_SMALL
    # [sx, sy, sz], 0s = off): rois fitting the small canvas run the FCN on
    # ~13x fewer voxels (exact — region-masked FCN is canvas-size
    # independent); the large-canvas queue then only needs capacity for the
    # few oversize rois (TPU_MAX_LARGE_MASK_ROIS), with overflow counted in
    # the mask_windows_dropped metric rather than silently truncated
    mask_small_dims = tuple(
        int(c)
        for c in getattr_cfg(cfg, "TPU_MASK_CANVAS_SMALL", [0, 0, 0])
    )
    use_small_canvas = all(c > 0 for c in mask_small_dims)
    max_large_rois = int(
        getattr_cfg(cfg, "TPU_MAX_LARGE_MASK_ROIS", max_mask_rois)
    )
    use_mask = bool(cfg.USE_MASK) and detector.mask_backbone is not None
    use_images = bool(cfg.USE_IMAGES)
    mask_use_images = bool(cfg.MASK_USE_IMAGES)
    fix_rpn = bool(cfg.FIX_RPN) or not bool(cfg.USE_RPN)
    fix_class = (
        bool(cfg.FIX_CLASS) and not cfg.NYUV2_FINETUNE
    ) or not bool(cfg.USE_CLASS)
    use_rpn = bool(cfg.USE_RPN)

    def loss_fn(params, sample, key):
        scene = sample["data"][None]  # (1, X, Y, Z, 2)
        gt_box = sample["gt_box"]
        gt_valid = sample["gt_valid"]
        k_anchor, k_prop = jax.random.split(key)

        imageft = None
        if use_images:
            imageft = detector.color_projector.project(
                params,
                sample["images"],
                sample["depths"],
                sample["poses"],
                sample["world_to_grid"],
                shape_t,
                view_valid=sample["view_valid"],
            )[None]
            if bool(cfg.FIX_ENET):
                # frozen ENet (every shipped config): skip its backward pass
                # entirely — grads into imageft would only reach ENet params
                imageft = jax.lax.stop_gradient(imageft)

        feats = detector.features(params, scene, imageft)

        metrics = {}
        total = jnp.zeros((), jnp.float32)

        # --- RPN losses (network.py:326-428) ---
        rpn_out = detector.rpn_forward(params, feats) if use_rpn else None
        if not fix_rpn:
            atargets = T.anchor_targets(
                k_anchor,
                anchor_arrays,
                inside_masks,
                gt_box,
                gt_valid,
                int(cfg.RPN_BATCHSIZE),
                float(cfg.RPN_FG_FRACTION),
                float(cfg.RPN_POSITIVE_OVERLAP),
                float(cfg.RPN_NEGATIVE_OVERLAP),
            )
            for lvl, tgt in atargets.items():
                cls_score, _, bbox_pred = rpn_out[lvl]
                ce, box = L.rpn_level_losses(cls_score, bbox_pred, tgt)
                metrics[f"rpn_cross_entropy_level{lvl}"] = ce
                metrics[f"rpn_loss_box_level{lvl}"] = box
                total = total + ce + box

        # --- proposals (no grad through selection, like the reference's
        # .data use at network.py:666-674) ---
        if use_rpn:
            prop = select_proposals(
                jax.lax.stop_gradient(rpn_out),
                level_anchors,
                shape_t,
                pre_n,
                post_n,
                nms_thresh,
            )
        else:
            # USE_RPN=False ablation: gt boxes are the proposals
            # (network.py:149-152); level by the dims<=20 heuristic
            dims = gt_box[:, 3:6] - gt_box[:, :3]
            prop = {
                "rois": gt_box[:, :6],
                "scores": jnp.where(gt_valid, 1.0, -1e9),
                "level_inds": jnp.where(
                    jnp.all(dims <= 20.0, axis=1), 1.0, 2.0
                ),
                "valid": gt_valid,
            }

        # --- classification losses (network.py:438-455) ---
        if not fix_class:
            ptargets = T.proposal_targets(
                k_prop,
                prop["rois"],
                prop["valid"],
                prop["level_inds"],
                gt_box,
                gt_valid,
                int(cfg.NUM_CLASSES),
                int(cfg.CLASS_BATCH_SIZE),
                float(cfg.FG_FRACTION),
                float(cfg.FG_THRESH),
                float(cfg.BG_THRESH),
                float(cfg.BG_THRESH_LO),
                bool(cfg.USE_GT),
            )
            cls_score, _, _, bbox_pred = detector.classify_rois(
                params, feats, ptargets["rois"], ptargets["level_inds"]
            )
            ce, box = L.class_losses(cls_score, bbox_pred, ptargets, class_weights)
            metrics["cross_entropy"] = ce
            metrics["loss_box"] = box
            total = total + ce + box

        # --- mask loss (network.py:461-481) ---
        if use_mask:
            mtargets = T.mask_targets(
                prop["rois"],
                prop["valid"],
                gt_box,
                gt_valid,
                float(cfg.MASK_FG_THRESH),
                max_mask_rois,
            )
            m_ift = (
                imageft[0]
                if (mask_use_images and imageft is not None)
                else None
            )

            def queue(rois, valid, canvas, capacity, allow_drop,
                      single_window=False):
                mw = _mask_forward_scan(
                    detector,
                    params,
                    sample["data"],
                    rois,
                    valid,
                    shape_t,
                    canvas,
                    imageft=m_ift,
                    extra_windows=mask_extra_windows,
                    capacity=capacity,
                    allow_drop=allow_drop,
                    single_window=single_window,
                )
                win = mw["logits"].shape[1:4]
                targets = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(
                        sample["mask_canvas"], (s[0], s[1], s[2]), win
                    )
                )(mw["starts"]).astype(jnp.float32)  # canvas may be uint8
                group = (
                    mw["logits"], targets, mw["own_masks"], mw["valid"],
                    mw["roi_idx"],
                )
                return group, mw["dropped"]

            if use_small_canvas:
                r = jnp.round(mtargets["rois"]).astype(jnp.int32)
                dims = r[:, 3:6] - r[:, :3]
                fits = jnp.all(
                    dims <= jnp.asarray(mask_small_dims, jnp.int32)[None],
                    axis=1,
                )
                g_small, d_small = queue(
                    mtargets["rois"], mtargets["valid"] & fits,
                    mask_small_dims, max_mask_rois, False,
                    single_window=True,
                )
                g_large, d_large = queue(
                    mtargets["rois"], mtargets["valid"] & ~fits,
                    mask_canvas_dims,
                    max_large_rois + mask_extra_windows, True,
                )
                groups = [g_small, g_large]
                dropped = d_small + d_large
            else:
                g, dropped = queue(
                    mtargets["rois"], mtargets["valid"], mask_canvas_dims,
                    None, False,
                )
                groups = [g]
            lm = L.mask_loss_window_groups(
                groups,
                mtargets["labels"],
                mtargets["valid"],
                class_weights,
                max_mask_rois,
            )
            metrics["loss_mask"] = lm
            metrics["mask_windows_dropped"] = dropped.astype(jnp.float32)
            total = total + lm

        metrics["total_loss"] = total
        return total, metrics

    return loss_fn


def getattr_cfg(cfg, key, default):
    try:
        return cfg[key]
    except KeyError:
        return default


def apply_step_update(state: TrainState, grads, metrics, opt_update):
    """SGD update + non-finite guard (shared by step_local and the DP
    equivalence test, which re-derives the 8-device trajectory on one
    device from pre-folded keys — tests/test_distributed.py)."""
    finite = jnp.isfinite(metrics["total_loss"])
    for g in jax.tree.leaves(grads):
        finite = finite & jnp.all(jnp.isfinite(g))
    updates, opt = opt_update(grads, state.opt, state.params)
    params = apply_updates(state.params, updates)
    params = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old),
        params, state.params,
    )
    opt = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), opt, state.opt
    )
    metrics = dict(metrics)
    metrics["step_finite"] = finite.astype(jnp.float32)
    return TrainState(params=params, opt=opt), metrics


def build_train_step(detector: Detector, cfg, scene_shape, mesh=None):
    """Returns (init_state(params), step(state, batch, key) -> state, metrics).

    batch: dict of stacked per-sample arrays with a leading device-shardable
    batch axis. With a mesh, the step runs under shard_map over the 'data'
    axis and gradients are pmean'd over ICI (the DP strategy in SURVEY 2.3).
    """
    loss_fn = build_loss_fn(detector, cfg, scene_shape)
    opt_init, opt_update = make_solver(cfg, detector.param_names())

    def batched_loss(params, batch, key):
        n = batch["data"].shape[0]
        keys = jax.random.split(key, n)
        totals, metrics = jax.vmap(
            lambda s, k: loss_fn(params, s, k), in_axes=(0, 0)
        )(batch, keys)
        return jnp.mean(totals), {k: jnp.mean(v) for k, v in metrics.items()}

    def step_local(state, batch, key):
        if mesh is not None:
            # decorrelate target sampling across data shards
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        (_, metrics), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            state.params, batch, key
        )
        if mesh is not None:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), grads)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "data"), metrics)
        # Numeric guard (SURVEY 5.2): a non-finite loss/grad skips the update
        # instead of silently poisoning params; surfaced via the step_finite
        # metric so the training loop can count/report occurrences.
        return apply_step_update(state, grads, metrics, opt_update)

    if mesh is None:
        return opt_init, jax.jit(step_local)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    sharded_step = shard_map(
        step_local,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return opt_init, jax.jit(sharded_step)
