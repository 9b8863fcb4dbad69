"""2D convolutional autoencoder over ScanNet frames.

Functional port of the reference's standalone alternative-2D-features
experiment (``lib/nets/autoencoder.py:19-148``): a 3-level conv encoder
(3->16->32->64, stride-2) and mirrored transposed-conv decoder, trained
with an L2 reconstruction objective. Not wired into the main pipeline in
either framework; provided for component parity plus a train_step helper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_ENC = [("enc0", 3, 16), ("enc1", 16, 32), ("enc2", 32, 64)]
_DEC = [("dec0", 64, 32), ("dec1", 32, 16), ("dec2", 16, 3)]


def init_params(key):
    params = {}
    for name, cin, cout in _ENC + _DEC:
        key, k1 = jax.random.split(key)
        fan_in = cin * 9
        params[name + ".weight"] = jax.random.normal(
            k1, (3, 3, cin, cout)
        ) / np.sqrt(fan_in)
        params[name + ".bias"] = jnp.zeros((cout,))
    return params


def _conv(x, w, b, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b


def _deconv(x, w, b, stride=2):
    y = jax.lax.conv_transpose(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def encode(params, x):
    for name, _, _ in _ENC:
        x = jax.nn.relu(
            _conv(x, params[name + ".weight"], params[name + ".bias"], 2)
        )
    return x


def decode(params, z):
    for i, (name, _, _) in enumerate(_DEC):
        z = _deconv(z, params[name + ".weight"], params[name + ".bias"], 2)
        if i < len(_DEC) - 1:
            z = jax.nn.relu(z)
    return z


def reconstruction_loss(params, x):
    return jnp.mean((decode(params, encode(params, x)) - x) ** 2)


@jax.jit
def train_step(params, x, lr=1e-3):
    loss, grads = jax.value_and_grad(reconstruction_loss)(params, x)
    params = {k: v - lr * grads[k] for k, v in params.items()}
    return params, loss
