"""Smoke + parity tests for the inventory-parity side models.

Covers SURVEY §2.1 rows 22 (CoordConv3d) and 23 (2D autoencoder):
- coordinate channels match the reference's AddCoordinates3d
  (``lib/layer_utils/coord_conv3d.py``) loaded directly from /root/reference;
- coord_conv3d == plain conv over the augmented input;
- the autoencoder round-trips shapes and its train_step reduces the loss.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsis.models.coord_conv3d import add_coordinates_3d, coord_conv3d

REF_CC = "/root/reference/lib/layer_utils/coord_conv3d.py"


def test_coord_channels_match_reference():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF_CC):
        pytest.skip("reference coord_conv3d.py not available")
    spec = importlib.util.spec_from_file_location("ref_cc", REF_CC)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    x = np.random.RandomState(0).randn(2, 5, 6, 7, 4).astype(np.float32)
    # reference layout NCXYZ; ours NXYZC
    ref = mod.AddCoordinates3d(with_r=False)(
        torch.from_numpy(np.moveaxis(x, -1, 1))
    ).numpy()
    ours = np.asarray(add_coordinates_3d(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.moveaxis(ref, 1, -1), ours, rtol=0, atol=1e-6
    )


def test_coord_conv_equals_conv_on_augmented_input():
    from tpu3dsis.models.nn import conv3d

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5, 4).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    got = coord_conv3d(x, w, b, stride=1, padding=1)
    want = conv3d(add_coordinates_3d(x), w, b, 1, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert got.shape == (1, 6, 6, 6, 4)


def test_coord_window_shifts_frame():
    x = jnp.zeros((1, 4, 4, 4, 1))
    full = add_coordinates_3d(x)
    windowed = add_coordinates_3d(x, window=((0.0, 0.5), (-1, 1), (-1, 1)))
    # channel 0 is the x coordinate: full spans [-1,1], windowed [0,0.5]
    assert np.isclose(float(full[0, 0, 0, 0, 0]), -1.0)
    assert np.isclose(float(windowed[0, 0, 0, 0, 0]), 0.0)
    assert np.isclose(float(windowed[0, -1, 0, 0, 0]), 0.5)


def test_autoencoder_roundtrip_and_training():
    from tpu3dsis.models import autoencoder2d as ae

    params = ae.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32)
    )
    z = ae.encode(params, x)
    assert z.shape == (2, 4, 4, 64)  # 3 stride-2 levels
    y = ae.decode(params, z)
    assert y.shape == x.shape

    loss0 = float(ae.reconstruction_loss(params, x))
    p = params
    for _ in range(5):
        p, loss = ae.train_step(p, x)
    assert float(loss) < loss0
    assert np.isfinite(float(loss))
