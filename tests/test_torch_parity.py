"""Numerical parity vs torch oracles of the same architectures.

Validates the `.pth` conversion path end-to-end: a torch model with random
weights must produce the same activations as our JAX apply after
``torch_state_dict_to_params``. The torch modules here are compact test
oracles mirroring the architecture spec (reference ``lib/nets/backbones.py``,
``lib/nets/network.py:38-57``), not production code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu3dsis.models import Detector  # noqa: E402
from tpu3dsis.models.backbones import MaskBackboneArch, ScanNetBackbone  # noqa: E402
from tpu3dsis.train.checkpoint import torch_state_dict_to_params  # noqa: E402


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes):
        super().__init__()
        self.conv1 = tnn.Conv3d(inplanes, planes, 1)
        self.conv2 = tnn.Conv3d(planes, planes, 3, padding=1)
        self.conv3 = tnn.Conv3d(planes, inplanes, 1)

    def forward(self, x):
        y = tF.relu(self.conv1(x))
        y = tF.relu(self.conv2(y))
        y = self.conv3(y)
        return tF.relu(y + x)


def torch_scannet_geometry():
    g1 = tnn.Sequential(
        tnn.Conv3d(2, 32, 2, stride=2, bias=False),
        tnn.ReLU(True),
        TorchBottleneck(32, 32),
        TorchBottleneck(32, 32),
        tnn.Conv3d(32, 128, 2, stride=2, bias=False),
        tnn.ReLU(True),
        TorchBottleneck(128, 32),
        TorchBottleneck(128, 32),
    )
    g2 = tnn.Sequential(
        tnn.Conv3d(128, 128, 3, padding=1, bias=False),
        tnn.ReLU(True),
        TorchBottleneck(128, 64),
        TorchBottleneck(128, 64),
        tnn.MaxPool3d(3, 1, 1),
    )
    return g1, g2


def to_jax_vol(x_torch):
    """(N, C, X, Y, Z) -> (N, X, Y, Z, C)"""
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 4, 1))


def test_scannet_backbone_parity(scannet_cfg):
    torch.manual_seed(0)
    g1, g2 = torch_scannet_geometry()
    vol = torch.randn(1, 2, 32, 16, 32)
    with torch.no_grad():
        t1 = g1(vol)
        t2 = g2(t1)

    sd = {}
    for name, p in g1.named_parameters():
        sd["geometry1." + name] = p
    for name, p in g2.named_parameters():
        sd["geometry2." + name] = p
    params = torch_state_dict_to_params(sd)

    arch = ScanNetBackbone(scannet_cfg)
    lvl1, lvl2, _ = arch.apply(params, to_jax_vol(vol))
    np.testing.assert_allclose(
        np.asarray(lvl1), to_jax_vol(t1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lvl2), to_jax_vol(t2), rtol=1e-4, atol=1e-4
    )


def test_rpn_head_parity(scannet_cfg):
    """RPN conv heads + the reference's score reshape chain
    (network.py:537-556)."""
    torch.manual_seed(1)
    A = 3
    trunk = tnn.Conv3d(128, 64, 3, padding=1)
    cls = tnn.Conv3d(64, A * 2, 1)
    bbox = tnn.Conv3d(64, A * 6, 1)
    feat = torch.randn(1, 128, 8, 4, 8)
    with torch.no_grad():
        t = tF.relu(trunk(feat))
        tb = bbox(t).permute(0, 2, 3, 4, 1).contiguous()
        tc = (
            cls(t)
            .view(1, 2, A, tb.size(1), tb.size(2), tb.size(3))
            .permute(0, 1, 3, 4, 5, 2)
            .contiguous()
        )
        tprob = tF.softmax(tc, dim=1)

    sd = {}
    for name, p in trunk.named_parameters():
        sd["rpn_net_level1." + name] = p
    for name, p in cls.named_parameters():
        sd["rpn_cls_score_net_level1.0." + name] = p
    for name, p in bbox.named_parameters():
        sd["rpn_bbox_pred_net_level1." + name] = p
    params = torch_state_dict_to_params(sd)

    cfg = scannet_cfg.copy()
    cfg.NUM_ANCHORS_LEVEL1 = 3
    cfg.NUM_ANCHORS_LEVEL2 = 0
    cfg.RPN_CHANNELS = 64
    from tpu3dsis.models.rpn import RPNHeads

    heads = RPNHeads(cfg)
    out = heads.apply(params, {1: to_jax_vol(feat)})
    cls_score, cls_prob, bbox_pred = out[1]
    # ours: (N, W, H, L, 2, A); torch: (N, 2, W, H, L, A)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(cls_score, 4, 1)),
        tc.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(cls_prob, 4, 1)),
        tprob.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bbox_pred), tb.numpy(), rtol=1e-4, atol=1e-5
    )


def test_classifier_parity(scannet_cfg):
    """RoI classifier MLP flatten order (backbones.py:92-96) + heads."""
    torch.manual_seed(2)
    P = 4
    mlp = tnn.Sequential(
        tnn.Linear(128 * P**3, 256),
        tnn.ReLU(True),
        tnn.Linear(256, 256),
        tnn.ReLU(True),
        tnn.Linear(256, 128),
        tnn.ReLU(True),
    )
    cls_head = tnn.Linear(128, 19)
    bbox_head = tnn.Linear(128, 19 * 6)
    pool5 = torch.randn(5, 128, P, P, P)
    with torch.no_grad():
        fc7 = mlp(pool5.view(5, -1))
        t_cls = cls_head(fc7)
        t_bbox = bbox_head(fc7)

    sd = {}
    for name, p in mlp.named_parameters():
        sd["classifier." + name] = p
    for name, p in cls_head.named_parameters():
        sd["classifier_cls_score_net." + name] = p
    for name, p in bbox_head.named_parameters():
        sd["classifier_bbox_pred_net." + name] = p
    params = torch_state_dict_to_params(sd)

    det = Detector(scannet_cfg, anchor_dir="experiments/anchors")
    pool5_jax = jnp.asarray(pool5.numpy().transpose(0, 2, 3, 4, 1))
    fc7_jax = det.backbone.classify(params, pool5_jax)
    from tpu3dsis.models.nn import apply_specs

    cls_jax = apply_specs(params, det.class_heads, fc7_jax)
    bbox_jax = apply_specs(params, det.bbox_heads, fc7_jax)
    np.testing.assert_allclose(np.asarray(cls_jax), t_cls.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bbox_jax), t_bbox.numpy(), rtol=1e-4, atol=1e-5
    )


def test_mask_backbone_crop_equivalence(scannet_cfg):
    """The region-masked full-canvas FCN must equal the reference's
    exact-size crop forward (network.py:168-184 crop semantics)."""
    torch.manual_seed(3)
    geo = tnn.Sequential(
        tnn.Conv3d(2, 64, 3, padding=1, bias=False),
        tnn.ReLU(True),
        tnn.Conv3d(64, 64, 3, padding=1, bias=False),
        tnn.ReLU(True),
        tnn.Conv3d(64, 64, 3, padding=1, bias=False),
        tnn.ReLU(True),
        tnn.Conv3d(64, 64, 3, padding=1, bias=False),
        tnn.ReLU(True),
        tnn.Conv3d(64, 64, 3, padding=1, bias=False),
        tnn.ReLU(True),
        tnn.Conv3d(64, 19, 1, bias=False),
    )
    scene = torch.randn(1, 2, 24, 16, 24)
    box = (3, 2, 5, 14, 12, 19)
    crop = scene[:, :, box[0] : box[3], box[1] : box[4], box[2] : box[5]]
    with torch.no_grad():
        t_out = geo(crop)

    sd = {}
    for name, p in geo.named_parameters():
        sd["mask_backbone.geometry." + name] = p
    params = torch_state_dict_to_params(sd)

    arch = MaskBackboneArch(scannet_cfg)
    from tpu3dsis.train.losses import roi_region_mask

    region = roi_region_mask(jnp.asarray(np.array(box, np.float32)), (24, 16, 24))
    scene_jax = to_jax_vol(scene)
    out = arch.apply(
        params,
        scene_jax * region[None, ..., None],
        training=True,
        region_mask=region[None, ..., None],
    )
    got = np.asarray(
        out[0, box[0] : box[3], box[1] : box[4], box[2] : box[5], :]
    )
    expect = t_out[0].numpy().transpose(1, 2, 3, 0)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
