"""SGD solver with the reference's per-parameter-group rules, as one
optax-style GradientTransformation.

Parity targets (``lib/model/trainval.py:176-196, 271-284``):
  - torch-SGD update order: grad += weight_decay * param, then momentum
    accumulation, then lr scaling
  - bias parameters: lr x2 when DOUBLE_BIAS, weight decay only if BIAS_DECAY
  - FIX_BACKBONE / FIX_RPN / FIX_CLASS freeze by name-substring
    (geometry|color|combine minus mask_backbone / rpn / classifier)
  - step LR schedule: LEARNING_RATE * GAMMA^(#stepsizes passed)
    (trainval.py:229-245 resume semantics fall out of making lr a pure
    function of the global step)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def param_groups(param_names, cfg):
    """name -> (is_bias, is_frozen) following fix_eval_parts semantics."""
    groups = {}
    for name in param_names:
        is_bias = "bias" in name
        frozen = False
        if (
            cfg.FIX_BACKBONE
            and ("geometry" in name or "color" in name or "combine" in name)
            and "mask_backbone" not in name
        ):
            frozen = True
        elif cfg.FIX_RPN and "rpn" in name:
            frozen = True
        elif cfg.FIX_CLASS and "classifier" in name:
            frozen = True
        elif cfg.FIX_ENET and "enet" in name:
            frozen = True
        if cfg.NYUV2_FINETUNE and (
            "classfier_cls" in name
            or "classifier_bbox" in name
            or "classifier.4" in name
        ):
            frozen = False
        groups[name] = (is_bias, frozen)
    return groups


class SGDState(NamedTuple):
    momentum: dict
    step: jnp.ndarray


def lr_at_step(step, cfg):
    """Pure step->lr function (replays GAMMA decays; trainval.py:236-245)."""
    lr = jnp.asarray(cfg.LEARNING_RATE, jnp.float32)
    for s in cfg.STEPSIZE:
        lr = jnp.where(step > s, lr * cfg.GAMMA, lr)
    return lr


def make_solver(cfg, param_names):
    groups = param_groups(param_names, cfg)
    momentum = float(cfg.MOMENTUM)
    wd = float(cfg.WEIGHT_DECAY)
    double_bias = bool(cfg.DOUBLE_BIAS)
    bias_decay = bool(cfg.BIAS_DECAY)

    def init(params):
        return SGDState(
            momentum={k: jnp.zeros_like(v) for k, v in params.items()},
            step=jnp.zeros((), jnp.int32),
        )

    def update(grads, state, params):
        step = state.step + 1
        lr = lr_at_step(step, cfg)
        new_m = {}
        updates = {}
        for k, g in grads.items():
            is_bias, frozen = groups[k]
            if frozen:
                new_m[k] = state.momentum[k]
                updates[k] = jnp.zeros_like(g)
                continue
            decay = (wd if (not is_bias or bias_decay) else 0.0)
            g = g + decay * params[k]
            v = momentum * state.momentum[k] + g
            scale = lr * (2.0 if (is_bias and double_bias) else 1.0)
            new_m[k] = v
            updates[k] = -scale * v
        return updates, SGDState(momentum=new_m, step=step)

    return init, update


def apply_updates(params, updates):
    return {k: params[k] + updates[k] for k in params}
