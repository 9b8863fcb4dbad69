"""ENet parity against the ACTUAL reference converted graph.

The reference's ``lib/nets/enet.py`` is self-contained (imports only torch),
so it is loaded directly from /root/reference as the test oracle — the
strongest possible check that scannetv2_enet.pth weights will produce
identical activations through our JAX ENet.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ENET = "/root/reference/lib/nets/enet.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ENET), reason="reference enet.py not available"
)


def load_ref_enet():
    spec = importlib.util.spec_from_file_location("ref_enet", REF_ENET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)


def test_enet_full_graph_parity():
    import jax

    from tpu3dsis.models.enet2d import (
        ENet2D,
        N_MODULES,
        torch_enet_state_dict_to_params,
    )

    ref = load_ref_enet()
    model = ref.create_enet(41)
    assert len(model) == N_MODULES  # module-count parity with our block table
    randomize(model)
    model.eval()

    x = torch.randn(1, 3, 256, 328, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        t_out = model(x)
        # trainable-split feature map (what feeds the 3D color stream)
        feat = x
        for i in range(N_MODULES - 1):
            feat = model[i](feat)

    params = torch_enet_state_dict_to_params(model.state_dict())
    ours = ENet2D(41)
    missing = set(ours.param_names()) - set(params)
    extra = set(params) - set(ours.param_names())
    assert not missing, f"missing keys: {sorted(missing)[:6]}"
    assert not extra, f"extra keys: {sorted(extra)[:6]}"

    xj = x.numpy().transpose(0, 2, 3, 1)
    feat_j = np.asarray(ours.features_for_3d(params, xj))
    np.testing.assert_allclose(
        feat_j, feat.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
    assert feat_j.shape == (1, 32, 41, 128)  # DEPTH_SHAPE x NUM_IMAGE_CHANNELS

    out_j = np.asarray(ours.apply(params, xj))
    np.testing.assert_allclose(
        out_j, t_out.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


def test_enet_for_3d_split_boundaries():
    """Split indices match create_enet_for_3d (enet.py:697-715)."""
    ref = load_ref_enet()
    import torch.nn as tnn

    model = ref.create_enet(41)
    n = len(model)
    fixed, trainable, classifier = (
        tnn.Sequential(*(model[i] for i in range(n - 9))),
        tnn.Sequential(*(model[i] for i in range(n - 9, n - 1))),
        tnn.Sequential(model[n - 1]),
    )
    from tpu3dsis.models.enet2d import TRAINABLE_START

    assert len(fixed) == TRAINABLE_START
    assert len(trainable) == 8
