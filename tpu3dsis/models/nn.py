"""Functional NN primitives: pure apply functions over flat param dicts.

Design: parameters live in ONE flat dict keyed by torch-style state_dict names
(e.g. ``geometry1.0.weight``). This keeps (a) `.pth` checkpoint conversion a
mechanical rename+transpose, (b) the reference's name-prefix partition
semantics for partial loading/freezing (``lib/model/trainval.py:135-173``)
trivially expressible as dict filters, and (c) everything a plain pytree for
jit/pjit/optax.

Layouts are TPU-native: volumes are channels-last ``(N, X, Y, Z, C)`` so XLA
tiles convs onto the MXU; conv weights are ``(kx, ky, kz, in, out)``; linear
weights are ``(in, out)``. Matmul/conv accumulation is float32 regardless of
the compute dtype (bfloat16 supported via ``compute_dtype``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

CONV_DIMSPEC = ("NDHWC", "DHWIO", "NDHWC")


def conv3d(x, w, b=None, stride=1, padding=0, compute_dtype=jnp.float32):
    """3D convolution, channels-last.

    float32 mode: explicit fp32 accumulation (checkpoint-parity path).
    bfloat16 mode: native bf16 in/out — the MXU still accumulates fp32
    internally, and requesting preferred_element_type=f32 on bf16 inputs
    breaks the conv VJP's same-dtype requirement under grad.
    """
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=CONV_DIMSPEC,
        preferred_element_type=preferred,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear(x, w, b=None, compute_dtype=jnp.float32):
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    y = jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=preferred,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def max_pool3d(x, window=3, stride=1, padding=1):
    """Channels-last 3D max pooling (torch nn.MaxPool3d(3, 1, 1) equivalent)."""
    if isinstance(window, int):
        window = (window,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=[(0, 0), *padding, (0, 0)],
    )


# ---------------------------------------------------------------------------
# Layer specs: declarative Sequential graphs with torch-style names
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Conv:
    name: str
    cin: int
    cout: int
    k: int
    stride: int = 1
    pad: int = 0
    bias: bool = True


@dataclass(frozen=True)
class Relu:
    pass


@dataclass(frozen=True)
class MaxPool:
    window: int = 3
    stride: int = 1
    pad: int = 1


@dataclass(frozen=True)
class Bottleneck:
    """1-3-1 residual block, no BN (reference ``backbones.py:17-40``)."""

    name: str
    inplanes: int
    planes: int


@dataclass(frozen=True)
class Linear:
    name: str
    cin: int
    cout: int
    bias: bool = True


def _kaiming_uniform_torch(key, shape_torch_fan_in, shape, a=math.sqrt(5)):
    """Torch's default Conv/Linear init (kaiming_uniform with a=sqrt(5))."""
    fan_in = shape_torch_fan_in
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_spec_params(key, specs) -> dict:
    """Initialize parameters for a spec list -> flat {name: array} dict."""
    params = {}
    for spec in specs:
        if isinstance(spec, Conv):
            key, k1, k2 = jax.random.split(key, 3)
            fan_in = spec.cin * spec.k**3
            params[spec.name + ".weight"] = _kaiming_uniform_torch(
                k1, fan_in, (spec.k, spec.k, spec.k, spec.cin, spec.cout)
            )
            if spec.bias:
                bound = 1.0 / math.sqrt(fan_in)
                params[spec.name + ".bias"] = jax.random.uniform(
                    k2, (spec.cout,), jnp.float32, -bound, bound
                )
        elif isinstance(spec, Linear):
            key, k1, k2 = jax.random.split(key, 3)
            params[spec.name + ".weight"] = _kaiming_uniform_torch(
                k1, spec.cin, (spec.cin, spec.cout)
            )
            if spec.bias:
                bound = 1.0 / math.sqrt(spec.cin)
                params[spec.name + ".bias"] = jax.random.uniform(
                    k2, (spec.cout,), jnp.float32, -bound, bound
                )
        elif isinstance(spec, Bottleneck):
            sub = [
                Conv(spec.name + ".conv1", spec.inplanes, spec.planes, 1),
                Conv(spec.name + ".conv2", spec.planes, spec.planes, 3, pad=1),
                Conv(spec.name + ".conv3", spec.planes, spec.inplanes, 1),
            ]
            key, sk = jax.random.split(key)
            params.update(init_spec_params(sk, sub))
    return params


def apply_specs(params: dict, specs, x, compute_dtype=jnp.float32):
    """Run a spec list as a Sequential."""
    for spec in specs:
        if isinstance(spec, Conv):
            x = conv3d(
                x,
                params[spec.name + ".weight"],
                params.get(spec.name + ".bias") if spec.bias else None,
                stride=spec.stride,
                padding=spec.pad,
                compute_dtype=compute_dtype,
            )
        elif isinstance(spec, Relu):
            x = jax.nn.relu(x)
        elif isinstance(spec, MaxPool):
            x = max_pool3d(x, spec.window, spec.stride, spec.pad)
        elif isinstance(spec, Bottleneck):
            res = x
            y = conv3d(
                x,
                params[spec.name + ".conv1.weight"],
                params[spec.name + ".conv1.bias"],
                compute_dtype=compute_dtype,
            )
            y = jax.nn.relu(y)
            y = conv3d(
                y,
                params[spec.name + ".conv2.weight"],
                params[spec.name + ".conv2.bias"],
                padding=1,
                compute_dtype=compute_dtype,
            )
            y = jax.nn.relu(y)
            y = conv3d(
                y,
                params[spec.name + ".conv3.weight"],
                params[spec.name + ".conv3.bias"],
                compute_dtype=compute_dtype,
            )
            x = jax.nn.relu(y + res)
        elif isinstance(spec, Linear):
            x = linear(
                x,
                params[spec.name + ".weight"],
                params.get(spec.name + ".bias") if spec.bias else None,
                compute_dtype=compute_dtype,
            )
        else:
            raise TypeError(spec)
    return x


def spec_param_names(specs):
    names = []
    for spec in specs:
        if isinstance(spec, Conv):
            names.append(spec.name + ".weight")
            if spec.bias:
                names.append(spec.name + ".bias")
        elif isinstance(spec, Linear):
            names.append(spec.name + ".weight")
            if spec.bias:
                names.append(spec.name + ".bias")
        elif isinstance(spec, Bottleneck):
            for c in ("conv1", "conv2", "conv3"):
                names.append(f"{spec.name}.{c}.weight")
                names.append(f"{spec.name}.{c}.bias")
    return names
