"""ENet 2D encoder — the color-stream feature extractor.

Architecture parity with the reference's Torch7-converted graph
(``lib/nets/enet.py:130-694``): initial block (conv(3->13, s2) || maxpool,
channel-concat, BN, PReLU), a 16->64 downsample bottleneck + 4 regular
bottlenecks, a 64->128 downsample + 8-bottleneck dilation section
(1, d2, asym5, d4, 1, d8, asym5, d16), the same 8-bottleneck section again,
and a 1x1 classifier. ``create_enet_for_3d`` (enet.py:697-715) splits at
module boundaries: fixed = [0, n-9), trainable = [n-9, n-1) (the second
dilation section), classifier = [n-1].

The reference runs BOTH halves in eval mode even during training
(network.py:80-83) and every shipped config freezes ENet (FIX_ENET), so
this implementation is a pure inference function: BatchNorm uses running
statistics, dropout is identity. Param keys mirror the torch state_dict
paths (prefixed ``enet.``) so ``scannetv2_enet.pth`` loads mechanically.

Input: (N, H, W, 3) normalized RGB (COLOR_MEAN/STD), H=256, W=328.
Output: 128-channel features at H/8 x W/8 = 32 x 41 — the NUM_IMAGE_CHANNELS
/ DEPTH_SHAPE contract of the 3D color stream (config.py:209-216).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d(x, w, b=None, stride=1, padding=(0, 0), dilation=1):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y


def _bn(x, p, prefix, eps=1e-3):
    scale = p[prefix + ".weight"] / jnp.sqrt(p[prefix + ".running_var"] + eps)
    return x * scale + (p[prefix + ".bias"] - p[prefix + ".running_mean"] * scale)


def _prelu(x, a):
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


# ---------------------------------------------------------------------------
# Block table: mirrors create_enet's module list. Entries:
#   ("initial",)                        module 0..3
#   ("down", idx, cin, mid, cout, drop) downsample bottleneck at module idx
#   ("reg",  idx, cin, mid, drop, dilation)  3x3 (optionally dilated)
#   ("asym", idx, cin, mid, drop)       1x5 then 5x1
#   ("classifier", idx, cin)
# ---------------------------------------------------------------------------


def enet_blocks(num_classes):
    blocks = [("initial",)]
    blocks.append(("down", 4, 16, 16, 64, 0.01))
    for i in range(5, 9):
        blocks.append(("reg", i, 64, 16, 0.01, 1))
    blocks.append(("down", 9, 64, 32, 128, 0.1))
    for base in (10, 18):
        blocks.append(("reg", base + 0, 128, 32, 0.1, 1))
        blocks.append(("reg", base + 1, 128, 32, 0.1, 2))
        blocks.append(("asym", base + 2, 128, 32, 0.1))
        blocks.append(("reg", base + 3, 128, 32, 0.1, 4))
        blocks.append(("reg", base + 4, 128, 32, 0.1, 1))
        blocks.append(("reg", base + 5, 128, 32, 0.1, 8))
        blocks.append(("asym", base + 6, 128, 32, 0.1))
        blocks.append(("reg", base + 7, 128, 32, 0.1, 16))
    blocks.append(("classifier", 26, 128))
    return blocks


N_MODULES = 27  # top-level torch Sequential length
TRAINABLE_START = N_MODULES - 9  # module 18 (enet.py:702-703)


def _bottleneck_param_specs(kind, idx, cin, mid, cout=None):
    """(key, shape, init_kind) param specs for one bottleneck's main branch."""
    p = f"enet.{idx}.0.0"
    specs = []
    if kind == "down":
        specs.append((f"{p}.0.weight", (2, 2, cin, mid), "conv"))
    else:
        specs.append((f"{p}.0.weight", (1, 1, cin, mid), "conv"))
    specs += [
        (f"{p}.1.weight", (mid,), "one"),
        (f"{p}.1.bias", (mid,), "zero"),
        (f"{p}.1.running_mean", (mid,), "zero"),
        (f"{p}.1.running_var", (mid,), "one"),
        (f"{p}.2.weight", (mid,), "prelu"),
    ]
    if kind == "asym":
        specs += [
            (f"{p}.3.weight", (1, 5, mid, mid), "conv"),
            (f"{p}.4.weight", (5, 1, mid, mid), "conv"),
            (f"{p}.4.bias", (mid,), "zero"),
            (f"{p}.5.weight", (mid,), "one"),
            (f"{p}.5.bias", (mid,), "zero"),
            (f"{p}.5.running_mean", (mid,), "zero"),
            (f"{p}.5.running_var", (mid,), "one"),
            (f"{p}.6.weight", (mid,), "prelu"),
            (f"{p}.7.weight", (1, 1, mid, cout), "conv"),
            (f"{p}.8.weight", (cout,), "one"),
            (f"{p}.8.bias", (cout,), "zero"),
            (f"{p}.8.running_mean", (cout,), "zero"),
            (f"{p}.8.running_var", (cout,), "one"),
        ]
    else:
        specs += [
            (f"{p}.3.weight", (3, 3, mid, mid), "conv"),
            (f"{p}.3.bias", (mid,), "zero"),
            (f"{p}.4.weight", (mid,), "one"),
            (f"{p}.4.bias", (mid,), "zero"),
            (f"{p}.4.running_mean", (mid,), "zero"),
            (f"{p}.4.running_var", (mid,), "one"),
            (f"{p}.5.weight", (mid,), "prelu"),
            (f"{p}.6.weight", (1, 1, mid, cout), "conv"),
            (f"{p}.7.weight", (cout,), "one"),
            (f"{p}.7.bias", (cout,), "zero"),
            (f"{p}.7.running_mean", (cout,), "zero"),
            (f"{p}.7.running_var", (cout,), "one"),
        ]
    specs.append((f"enet.{idx}.2.weight", (cout,), "prelu"))
    return specs


class ENet2D:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.blocks = enet_blocks(num_classes)

    def param_specs(self):
        specs = [
            ("enet.0.0.weight", (3, 3, 3, 13), "conv"),
            ("enet.0.0.bias", (13,), "zero"),
            ("enet.2.weight", (16,), "one"),
            ("enet.2.bias", (16,), "zero"),
            ("enet.2.running_mean", (16,), "zero"),
            ("enet.2.running_var", (16,), "one"),
            ("enet.3.weight", (16,), "prelu"),
        ]
        for blk in self.blocks[1:]:
            if blk[0] == "down":
                _, idx, cin, mid, cout, _ = blk
                specs += _bottleneck_param_specs("down", idx, cin, mid, cout)
            elif blk[0] == "reg":
                _, idx, cin, mid, _, _ = blk
                specs += _bottleneck_param_specs("reg", idx, cin, mid, cin)
            elif blk[0] == "asym":
                _, idx, cin, mid, _ = blk
                specs += _bottleneck_param_specs("asym", idx, cin, mid, cin)
            elif blk[0] == "classifier":
                _, idx, cin = blk
                specs.append(
                    (f"enet.{idx}.0.weight", (1, 1, cin, self.num_classes), "conv")
                )
        return specs

    def init_params(self, key):
        params = {}
        for name, shape, kind in self.param_specs():
            if kind == "conv":
                key, sk = jax.random.split(key)
                fan_in = int(np.prod(shape[:-1]))
                params[name] = jax.random.normal(sk, shape) / np.sqrt(fan_in)
            elif kind == "one":
                params[name] = jnp.ones(shape)
            elif kind == "zero":
                params[name] = jnp.zeros(shape)
            elif kind == "prelu":
                params[name] = jnp.full(shape, 0.25)
        return params

    def param_names(self):
        return [s[0] for s in self.param_specs()]

    # --- forward ----------------------------------------------------------
    def _bottleneck(self, p, x, blk):
        kind = blk[0]
        idx = blk[1]
        pre = f"enet.{idx}.0.0"
        if kind == "down":
            _, _, cin, mid, cout, drop = blk
            y = _conv2d(x, p[f"{pre}.0.weight"], stride=2)
            y = _bn(y, p, f"{pre}.1")
            y = _prelu(y, p[f"{pre}.2.weight"])
            y = _conv2d(y, p[f"{pre}.3.weight"], p[f"{pre}.3.bias"], padding=(1, 1))
            y = _bn(y, p, f"{pre}.4")
            y = _prelu(y, p[f"{pre}.5.weight"])
            y = _conv2d(y, p[f"{pre}.6.weight"])
            y = _bn(y, p, f"{pre}.7")
            y = y * (1.0 - drop)  # converted-Dropout2d scales by (1-p) even
            # in eval (reference enet.py:89-95) — baked into the checkpoint
            skip = _maxpool2(x)
            padc = cout - cin
            skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, padc)))
        elif kind == "asym":
            drop = blk[4]
            y = _conv2d(x, p[f"{pre}.0.weight"])
            y = _bn(y, p, f"{pre}.1")
            y = _prelu(y, p[f"{pre}.2.weight"])
            y = _conv2d(y, p[f"{pre}.3.weight"], padding=(0, 2))
            y = _conv2d(y, p[f"{pre}.4.weight"], p[f"{pre}.4.bias"], padding=(2, 0))
            y = _bn(y, p, f"{pre}.5")
            y = _prelu(y, p[f"{pre}.6.weight"])
            y = _conv2d(y, p[f"{pre}.7.weight"])
            y = _bn(y, p, f"{pre}.8")
            y = y * (1.0 - drop)
            skip = x
        else:  # reg
            _, _, cin, mid, drop, dil = blk
            y = _conv2d(x, p[f"{pre}.0.weight"])
            y = _bn(y, p, f"{pre}.1")
            y = _prelu(y, p[f"{pre}.2.weight"])
            y = _conv2d(
                y, p[f"{pre}.3.weight"], p[f"{pre}.3.bias"],
                padding=(dil, dil), dilation=dil,
            )
            y = _bn(y, p, f"{pre}.4")
            y = _prelu(y, p[f"{pre}.5.weight"])
            y = _conv2d(y, p[f"{pre}.6.weight"])
            y = _bn(y, p, f"{pre}.7")
            y = y * (1.0 - drop)
            skip = x
        return _prelu(y + skip, p[f"enet.{idx}.2.weight"])

    def apply(self, p, x, upto=None):
        """x: (N, H, W, 3). upto: stop after this top-module index (exclusive).

        Returns the feature map; with upto=None runs through the classifier.
        """
        # initial block (modules 0-3)
        conv = _conv2d(x, p["enet.0.0.weight"], p["enet.0.0.bias"], stride=2,
                       padding=(1, 1))
        pool = _maxpool2(x)
        y = jnp.concatenate([conv, pool], axis=-1)
        y = _bn(y, p, "enet.2")
        y = _prelu(y, p["enet.3.weight"])
        for blk in self.blocks[1:]:
            idx = blk[1]
            if upto is not None and idx >= upto:
                return y
            if blk[0] == "classifier":
                y = _conv2d(y, p[f"enet.{idx}.0.weight"])
            else:
                y = self._bottleneck(p, y, blk)
        return y

    def features_for_3d(self, p, x):
        """The 128-ch feature map fed to the 3D color stream: fixed prefix +
        trainable section, no classifier (enet.py:700-703 split)."""
        return self.apply(p, x, upto=N_MODULES - 1)


def torch_enet_state_dict_to_params(state_dict) -> dict:
    """scannetv2_enet.pth (torch OIHW) -> our flat dict (HWIO, 'enet.'-keys)."""
    params = {}
    for name, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        key = "enet." + name
        if name.endswith("num_batches_tracked"):
            continue
        params[key] = arr
    return params
