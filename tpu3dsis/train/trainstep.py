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


def _mask_forward_scan(detector, params, scene, region_masks, imageft=None, chunk=4):
    """Run the mask FCN over M region-masked copies of the scene.

    Statically-unrolled blocks of `chunk` rois bound transient memory (the
    reference loops over RoIs in python, network.py:170-184); each block is
    rematerialized for the backward pass. NOTE: deliberately NOT lax.map —
    grad-of-scan-of-remat hits a pathological slow path (~30x) on the CPU
    backend, and the block count is small and static anyway.
    """

    @jax.checkpoint
    def one_block(masks):
        # masks: (chunk, X, Y, Z)
        x = scene[None] * masks[..., None]
        ift = None
        if imageft is not None:
            ift = imageft[None] * masks[..., None]
        return detector.mask_backbone.apply(
            params,
            x,
            imageft=ift,
            training=True,
            region_mask=masks[..., None],
            compute_dtype=detector.cfg_static["compute_dtype"],
        )

    m = region_masks.shape[0]
    nblk = (m + chunk - 1) // chunk
    pad = nblk * chunk - m
    masks = jnp.pad(region_masks, ((0, pad), (0, 0), (0, 0), (0, 0)))
    outs = [
        one_block(masks[i * chunk : (i + 1) * chunk]) for i in range(nblk)
    ]
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return out[:m]


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
            regions = jax.vmap(lambda r: L.roi_region_mask(r, shape_t))(
                mtargets["rois"]
            )
            mask_logits = _mask_forward_scan(
                detector,
                params,
                sample["data"],
                regions,
                imageft=imageft[0] if (mask_use_images and imageft is not None) else None,
            )
            lm = L.mask_loss(
                mask_logits,
                sample["mask_canvas"],
                regions,
                mtargets["labels"],
                mtargets["valid"],
                class_weights,
            )
            metrics["loss_mask"] = lm
            total = total + lm

        metrics["total_loss"] = total
        return total, metrics

    return loss_fn


def getattr_cfg(cfg, key, default):
    try:
        return cfg[key]
    except KeyError:
        return default


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
        updates, opt = opt_update(grads, state.opt, state.params)
        params = apply_updates(state.params, updates)
        return TrainState(params=params, opt=opt), metrics

    if mesh is None:
        return opt_init, jax.jit(step_local)

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    sharded_step = shard_map(
        step_local,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return opt_init, jax.jit(sharded_step)
