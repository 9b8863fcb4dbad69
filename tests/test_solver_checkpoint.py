"""Solver schedule / param-group semantics and checkpoint round trips."""

import numpy as np
import jax.numpy as jnp

from tpu3dsis.train.checkpoint import (
    params_to_torch_state_dict,
    partial_update,
    torch_state_dict_to_params,
)
from tpu3dsis.train.solver import lr_at_step, make_solver, param_groups


def test_lr_schedule_replays_gamma(scannet_cfg):
    cfg = scannet_cfg.copy()
    cfg.LEARNING_RATE = 0.001
    cfg.GAMMA = 0.1
    cfg.STEPSIZE = [500000, 600000]
    np.testing.assert_allclose(float(lr_at_step(jnp.asarray(1), cfg)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(
        float(lr_at_step(jnp.asarray(500000), cfg)), 0.001, rtol=1e-6
    )
    np.testing.assert_allclose(float(lr_at_step(jnp.asarray(500001), cfg)), 1e-4)
    np.testing.assert_allclose(
        float(lr_at_step(jnp.asarray(700000), cfg)), 1e-5, rtol=1e-6
    )


def test_param_groups_freeze_partitions(scannet_cfg):
    cfg = scannet_cfg.copy()
    cfg.FIX_BACKBONE = True
    cfg.FIX_CLASS = True
    names = [
        "geometry1.0.weight", "geometry2.2.conv1.bias", "color.0.weight",
        "mask_backbone.geometry.0.weight", "rpn_net_level1.weight",
        "classifier.0.weight", "classifier_cls_score_net.bias",
    ]
    g = param_groups(names, cfg)
    assert g["geometry1.0.weight"] == (False, True)       # frozen
    assert g["geometry2.2.conv1.bias"] == (True, True)    # bias + frozen
    assert g["color.0.weight"] == (False, True)
    assert g["mask_backbone.geometry.0.weight"] == (False, False)  # mask trains
    assert g["rpn_net_level1.weight"] == (False, False)
    assert g["classifier.0.weight"] == (False, True)
    assert g["classifier_cls_score_net.bias"] == (True, True)


def test_sgd_matches_torch_semantics(scannet_cfg):
    """One update == torch SGD(momentum, wd-in-grad, bias lr x2, no bias wd)."""
    cfg = scannet_cfg.copy()
    cfg.LEARNING_RATE = 0.1
    cfg.MOMENTUM = 0.9
    cfg.WEIGHT_DECAY = 0.01
    cfg.DOUBLE_BIAS = True
    cfg.BIAS_DECAY = False
    cfg.STEPSIZE = []
    params = {
        "rpn_net_level1.weight": jnp.asarray([2.0]),
        "rpn_net_level1.bias": jnp.asarray([1.0]),
    }
    grads = {k: jnp.asarray([0.5]) for k in params}
    init, update = make_solver(cfg, list(params))
    state = init(params)
    upd, state = update(grads, state, params)
    # weight: g = 0.5 + 0.01*2 = 0.52; v = 0.52; delta = -0.1*0.52
    np.testing.assert_allclose(float(upd["rpn_net_level1.weight"][0]), -0.052)
    # bias: no decay, lr x2: delta = -0.2*0.5
    np.testing.assert_allclose(float(upd["rpn_net_level1.bias"][0]), -0.1)
    # second step: momentum accumulates
    upd2, state = update(grads, state, params)
    np.testing.assert_allclose(
        float(upd2["rpn_net_level1.weight"][0]), -0.1 * (0.9 * 0.52 + 0.52),
        rtol=1e-6,
    )


def test_pth_conversion_roundtrip(rng):
    params = {
        "geometry1.0.weight": rng.randn(2, 2, 2, 2, 32).astype(np.float32),
        "classifier.0.weight": rng.randn(8192, 256).astype(np.float32),
        "classifier.0.bias": rng.randn(256).astype(np.float32),
    }
    sd = params_to_torch_state_dict(params)
    assert sd["geometry1.0.weight"].shape == (32, 2, 2, 2, 2)
    assert sd["classifier.0.weight"].shape == (256, 8192)
    back = torch_state_dict_to_params(sd)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k])


def test_partial_update_partitions(scannet_cfg, rng):
    cfg = scannet_cfg.copy()
    cfg.LOAD_BACKBONE = True
    cfg.LOAD_RPN = False
    cfg.LOAD_CLASS = True
    cfg.USE_IMAGES = False
    model = {
        "geometry1.0.weight": np.zeros(3, np.float32),
        "rpn_net_level1.weight": np.zeros(3, np.float32),
        "classifier.0.weight": np.zeros(3, np.float32),
    }
    pre = {k: np.ones(3, np.float32) for k in model}
    out = partial_update(model, pre, cfg)
    assert out["geometry1.0.weight"].sum() == 3    # loaded
    assert out["rpn_net_level1.weight"].sum() == 0  # LOAD_RPN off
    assert out["classifier.0.weight"].sum() == 3


def test_load_pth_torch_file_roundtrip(tmp_path, rng, scannet_cfg):
    """torch.save a full-model state_dict in torch layouts, load via
    load_pth + partial_update, and confirm every partitioned tensor lands."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax

    from tpu3dsis.models import Detector
    from tpu3dsis.train.checkpoint import load_pth, params_to_torch_state_dict

    cfg = scannet_cfg.copy()
    cfg.LOAD_BACKBONE = cfg.LOAD_RPN = cfg.LOAD_CLASS = True
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = {
        k: np.asarray(v)
        for k, v in det.init_params(jax.random.PRNGKey(3)).items()
    }
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(params).items()
    }
    path = str(tmp_path / "full.pth")
    torch.save(sd, path)

    back = load_pth(path)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k])

    zeros = {k: np.zeros_like(v) for k, v in params.items()}
    loaded = partial_update(zeros, back, cfg)
    # everything in the backbone/rpn/class/mask partitions restored
    for k in params:
        if any(t in k for t in ("geometry", "combine", "rpn", "classifier")):
            np.testing.assert_array_equal(loaded[k], params[k]), k


def test_nyuv2_finetune_semantics(scannet_cfg, rng):
    """NYUV2_FINETUNE: cls/bbox heads are NOT loaded (trainval.py:149-152)
    and stay trainable despite FIX_CLASS (trainval.py:282-283)."""
    cfg = scannet_cfg.copy()
    cfg.NYUV2_FINETUNE = True
    cfg.FIX_CLASS = True
    cfg.LOAD_CLASS = True
    cfg.LOAD_BACKBONE = cfg.LOAD_RPN = False
    names = [
        "classifier.0.weight", "classifier.4.weight",
        "classifier_cls_score_net.weight", "classifier_bbox_pred_net.weight",
    ]
    g = param_groups(names, cfg)
    assert g["classifier.0.weight"][1] is True          # frozen
    assert g["classifier.4.weight"][1] is False         # finetuned
    assert g["classifier_bbox_pred_net.weight"][1] is False

    model = {k: np.zeros(2, np.float32) for k in names}
    pre = {k: np.ones(2, np.float32) for k in names}
    out = partial_update(model, pre, cfg)
    assert out["classifier.0.weight"].sum() == 2        # loaded
    assert out["classifier_cls_score_net.weight"].sum() == 0  # head skipped
    assert out["classifier_bbox_pred_net.weight"].sum() == 0
