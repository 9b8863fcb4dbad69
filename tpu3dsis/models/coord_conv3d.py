"""CoordConv3d: 3D convolution with normalized coordinate channels.

Functional port of ``lib/layer_utils/coord_conv3d.py`` (and its
random-window variant): appends three [-1, 1] normalized coordinate
channels (x, y, z order matching the reference's stack) to the input
before the convolution. Present for inventory parity — the shipped
architectures import but never use it (``lib/nets/backbones.py:12``).
"""

from __future__ import annotations

import jax.numpy as jnp


def add_coordinates_3d(x, window=None):
    """x: (N, X, Y, Z, C) -> (N, X, Y, Z, 3+C) with coord channels in [-1,1].

    The coordinate channels come FIRST (the reference cats ``(coords, grid)``,
    coord_conv3d.py:67), so converted CoordConv3d weights line up.

    window: optional ((x0, x1), (y0, y1), (z0, z1)) normalized sub-range —
    the 'random window' variant feeds a shifted coordinate frame
    (coord_conv3d_random.py) for crop-equivariant training.
    """
    n, sx, sy, sz, _ = x.shape
    if window is None:
        window = ((-1, 1), (-1, 1), (-1, 1))

    def axis(num, lo, hi):
        if num == 1:
            return jnp.zeros((num,))
        return jnp.linspace(lo, hi, num)

    cx = axis(sx, *window[0])[:, None, None]
    cy = axis(sy, *window[1])[None, :, None]
    cz = axis(sz, *window[2])[None, None, :]
    coords = jnp.stack(
        [
            jnp.broadcast_to(cx, (sx, sy, sz)),
            jnp.broadcast_to(cy, (sx, sy, sz)),
            jnp.broadcast_to(cz, (sx, sy, sz)),
        ],
        axis=-1,
    )
    coords = jnp.broadcast_to(coords[None], (n, sx, sy, sz, 3))
    return jnp.concatenate([coords.astype(x.dtype), x], axis=-1)


def coord_conv3d(x, w, b=None, stride=1, padding=0, window=None,
                 compute_dtype=jnp.float32):
    """Conv over coordinate-augmented input; w has cin+3 input channels."""
    from tpu3dsis.models.nn import conv3d

    return conv3d(
        add_coordinates_3d(x, window), w, b, stride, padding, compute_dtype
    )
