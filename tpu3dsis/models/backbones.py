"""3D conv backbones: ScanNet / SUNCG variants + the mask FCN backbone.

Architecture parity with reference ``lib/nets/backbones.py``:
  - SUNCG_Backbone   (backbones.py:118-169)
  - ScanNet_Backbone (backbones.py:171-231)
  - MaskBackbone     (backbones.py:236-287)
Spec names match the torch state_dict keys, so released checkpoints load
through the converter in ``tpu3dsis.train.checkpoint``.

All backbones are dual-stream: a geometry stream over the 2-channel encoded
TSDF and (optionally) a color stream over the 2D-features-projected-to-3D
volume, concatenated and fused by ``geometry2``. feat_stride is 4 at every
level; level1 and level2 share the spatial grid (the "levels" differ by
receptive field, not resolution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsis.models.nn import (
    Bottleneck,
    Conv,
    Linear,
    MaxPool,
    Relu,
    apply_specs,
    init_spec_params,
    spec_param_names,
)

FEAT_STRIDE = (4, 4, 4)  # reference backbones.py:46
NET_CONV_CHANNELS = 128  # channels of every RPN level input (backbones.py:50-56)
FC7_CHANNELS = 128  # classifier MLP output (backbones.py:47)


def _classifier_specs(pooling_size: int):
    # backbones.py:163-169 / 225-231
    cin = NET_CONV_CHANNELS * pooling_size**3
    return [
        Linear("classifier.0", cin, 256),
        Relu(),
        Linear("classifier.2", 256, 256),
        Relu(),
        Linear("classifier.4", 256, 128),
        Relu(),
    ]


class BackboneArch:
    """Static architecture description; apply() is pure."""

    def __init__(self, cfg):
        self.use_images = bool(cfg.USE_IMAGES)
        self.only_images = bool(cfg.ONLY_IMAGES)
        self.pooling_size = int(cfg.CLASS_POOLING_SIZE)
        self.num_image_channels = int(cfg.NUM_IMAGE_CHANNELS)
        self.geometry1: list = []
        self.color: list = []
        self.geometry2: list = []
        self.classifier: list = _classifier_specs(self.pooling_size)

    # --- structure -------------------------------------------------------
    def init_params(self, key) -> dict:
        params = {}
        for specs in (self.geometry1, self.color, self.geometry2, self.classifier):
            key, sk = jax.random.split(key)
            params.update(init_spec_params(sk, specs))
        return params

    def param_names(self):
        names = []
        for specs in (self.geometry1, self.color, self.geometry2, self.classifier):
            names += spec_param_names(specs)
        return names

    # --- forward ---------------------------------------------------------
    def apply(self, params, scene, imageft=None, compute_dtype=jnp.float32):
        """scene: (N, X, Y, Z, 2); imageft: (N, X, Y, Z, C2d) or None.

        Returns (net_conv_level1, net_conv_level2, None) — the stream-concat
        ordering [color, geometry] matches reference ``backbones.py:98-113``.
        """
        if self.use_images and self.only_images:
            lvl1 = apply_specs(params, self.color, imageft, compute_dtype)
        elif self.use_images:
            c = apply_specs(params, self.color, imageft, compute_dtype)
            g = apply_specs(params, self.geometry1, scene, compute_dtype)
            lvl1 = jnp.concatenate([c, g], axis=-1)
        else:
            lvl1 = apply_specs(params, self.geometry1, scene, compute_dtype)
        lvl2 = apply_specs(params, self.geometry2, lvl1, compute_dtype)
        return lvl1, lvl2, None

    def classify(self, params, pool5, compute_dtype=jnp.float32):
        """pool5: (R, P, P, P, C) -> fc7 (R, 128).

        Flattening uses channel-major order to match torch's
        ``pool5.view(R, -1)`` on (R, C, P, P, P) (reference backbones.py:92-96)
        so converted classifier weights stay correct.
        """
        r = pool5.shape[0]
        flat = jnp.transpose(pool5, (0, 4, 1, 2, 3)).reshape(r, -1)
        return apply_specs(params, self.classifier, flat, compute_dtype)


class ScanNetBackbone(BackboneArch):
    """reference ``backbones.py:171-231``."""

    def __init__(self, cfg):
        super().__init__(cfg)
        if self.only_images:
            geo_ch, col_ch = 0, 128
        elif self.use_images:
            geo_ch, col_ch = 64, 64
        else:
            geo_ch, col_ch = 128, 0

        if not self.only_images or not self.use_images:
            self.geometry1 = [
                Conv("geometry1.0", 2, 32, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("geometry1.2", 32, 32),
                Bottleneck("geometry1.3", 32, 32),
                Conv("geometry1.4", 32, geo_ch, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("geometry1.6", geo_ch, 32),
                Bottleneck("geometry1.7", geo_ch, 32),
            ]
        if self.use_images:
            self.color = [
                Conv("color.0", self.num_image_channels, 64, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("color.2", 64, 32),
                MaxPool(3, 1, 1),
                Conv("color.4", 64, col_ch, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("color.6", col_ch, 32),
                MaxPool(3, 1, 1),
            ]
        self.geometry2 = [
            Conv("geometry2.0", geo_ch + col_ch, 128, 3, pad=1, bias=False),
            Relu(),
            Bottleneck("geometry2.2", 128, 64),
            Bottleneck("geometry2.3", 128, 64),
            MaxPool(3, 1, 1),
        ]


class SUNCGBackbone(BackboneArch):
    """reference ``backbones.py:118-169``."""

    def __init__(self, cfg):
        super().__init__(cfg)
        if self.use_images and self.only_images:
            in2 = 64
        elif self.use_images:
            in2 = 128
        else:
            in2 = 64

        if not self.only_images or not self.use_images:
            self.geometry1 = [
                Conv("geometry1.0", 2, 64, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("geometry1.2", 64, 32),
                Conv("geometry1.3", 64, 64, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("geometry1.5", 64, 32),
            ]
        if self.use_images:
            self.color = [
                Conv("color.0", self.num_image_channels, 64, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("color.2", 64, 32),
                Conv("color.3", 64, 64, 2, stride=2, bias=False),
                Relu(),
                Bottleneck("color.5", 64, 32),
            ]
        self.geometry2 = [
            Conv("geometry2.0", in2, 128, 3, pad=1, bias=False),
            Relu(),
            Bottleneck("geometry2.2", 128, 64),
        ]


BACKBONES = {
    "ScanNet_Backbone": ScanNetBackbone,
    "SUNCG_Backbone": SUNCGBackbone,
}


class MaskBackboneArch:
    """Full-resolution FCN over per-RoI TSDF crops (``backbones.py:236-287``).

    Param names are prefixed ``mask_backbone.`` to match the reference
    state_dict. Sigmoid is applied at eval only (backbones.py:285-287).
    """

    def __init__(self, cfg):
        self.num_classes = int(cfg.NUM_CLASSES)
        self.use_images = bool(cfg.MASK_USE_IMAGES)
        self.only_images = bool(cfg.MASK_ONLY_IMAGES)
        geo_out = 64 if self.use_images else self.num_classes
        self.geometry = [
            Conv("mask_backbone.geometry.0", 2, 64, 3, pad=1, bias=False),
            Relu(),
            Conv("mask_backbone.geometry.2", 64, 64, 3, pad=1, bias=False),
            Relu(),
            Conv("mask_backbone.geometry.4", 64, 64, 3, pad=1, bias=False),
            Relu(),
            Conv("mask_backbone.geometry.6", 64, 64, 3, pad=1, bias=False),
            Relu(),
            Conv("mask_backbone.geometry.8", 64, 64, 3, pad=1, bias=False),
            Relu(),
            Conv("mask_backbone.geometry.10", 64, geo_out, 1, bias=False),
        ]
        self.color = []
        self.combine = []
        if self.use_images:
            col_out = self.num_classes if self.only_images else 64
            self.color = [
                Conv("mask_backbone.color.0", 128, 64, 3, pad=1, bias=False),
                Relu(),
                Conv("mask_backbone.color.2", 64, 64, 3, pad=1, bias=False),
                Relu(),
                Conv("mask_backbone.color.4", 64, 64, 3, pad=1, bias=False),
                Relu(),
                Conv("mask_backbone.color.6", 64, 64, 3, pad=1, bias=False),
                Relu(),
                Conv("mask_backbone.color.8", 64, 64, 3, pad=1, bias=False),
                Relu(),
                Conv("mask_backbone.color.10", 64, col_out, 1, bias=False),
            ]
            self.combine = [
                Conv("mask_backbone.combine.0", 128, 128, 3, pad=1, bias=False),
                Relu(),
                Conv(
                    "mask_backbone.combine.2", 128, self.num_classes, 1, bias=False
                ),
            ]

    def init_params(self, key) -> dict:
        params = {}
        for specs in (self.geometry, self.color, self.combine):
            key, sk = jax.random.split(key)
            params.update(init_spec_params(sk, specs))
        return params

    def param_names(self):
        names = []
        for specs in (self.geometry, self.color, self.combine):
            names += spec_param_names(specs)
        return names

    def apply(
        self,
        params,
        scene,
        imageft=None,
        training=True,
        region_mask=None,
        compute_dtype=jnp.float32,
    ):
        """scene: (N, X, Y, Z, 2) crop canvas -> (N, X, Y, Z, NUM_CLASSES).

        ``region_mask`` (N, X, Y, Z, 1) restricts the computation to an
        embedded crop: it is re-applied after every layer, which makes running
        on a zero-padded fixed canvas mathematically identical to the
        reference's exact-size variable crops (zero conv padding at the crop
        boundary at every depth).
        """

        def run(specs, x):
            for spec in specs:
                x = apply_specs(params, [spec], x, compute_dtype)
                if region_mask is not None and isinstance(spec, (Conv,)):
                    x = x * region_mask
            return x

        if self.only_images:
            net = run(self.color, imageft)
        else:
            net = run(self.geometry, scene)
            if self.use_images:
                col = run(self.color, imageft)
                net = jnp.concatenate([net, col], axis=-1)
                net = run(self.combine, net)
        if not training:
            net = jax.nn.sigmoid(net)
        return net
