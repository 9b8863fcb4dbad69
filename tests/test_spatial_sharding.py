"""Spatially-sharded backbone must be numerically identical to one-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.medium
def test_spatial_features_match_single_device(rng, scannet_cfg, n_shards):
    from tpu3dsis.models import Detector
    from tpu3dsis.parallel import spatial_features

    if jax.device_count() < n_shards:
        pytest.skip("not enough devices")
    det = Detector(scannet_cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))

    scene = rng.randn(32 * n_shards, 16, 32, 2).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
    feats_sharded = spatial_features(det, params, jnp.asarray(scene), mesh)
    feats_single = det.features(params, jnp.asarray(scene)[None])

    for lvl in (1, 2):
        a = np.asarray(feats_sharded[lvl])
        b = np.asarray(feats_single[lvl])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_halo_exchange_edges(rng):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu3dsis.parallel import halo_exchange

    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    x = rng.randn(16, 2, 2, 1).astype(np.float32)

    f = shard_map(
        lambda s: halo_exchange(s, "space"),
        mesh=mesh,
        in_specs=P("space"),
        out_specs=P("space"),
        check_vma=False,
    )
    out = np.asarray(f(jnp.asarray(x)))  # (4 shards * 6, ...)
    out = out.reshape(4, 6, 2, 2, 1)
    shards = x.reshape(4, 4, 2, 2, 1)
    # interior halos carry neighbor edges; grid edges carry zeros
    np.testing.assert_array_equal(out[0, 0], np.zeros((2, 2, 1)))
    np.testing.assert_array_equal(out[3, 5], np.zeros((2, 2, 1)))
    for s in range(4):
        np.testing.assert_array_equal(out[s, 1:5], shards[s])
        if s > 0:
            np.testing.assert_array_equal(out[s, 0], shards[s - 1, 3])
        if s < 3:
            np.testing.assert_array_equal(out[s, 5], shards[s + 1, 0])


@pytest.mark.medium
def test_spatial_single_shot_matches_single_device(rng, scannet_cfg):
    """Full pipeline with the backbone sharded over 4 devices == one device."""
    import jax.numpy as jnp

    from tpu3dsis.infer.single_shot import SingleShotInference
    from tpu3dsis.models import Detector
    from tpu3dsis.parallel.scene import spatial_single_shot

    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    cfg = scannet_cfg.copy()
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 16
    cfg.CLASS_THRESH = 0.0
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    scene = rng.randn(64, 16, 48, 2).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    sharded = spatial_single_shot(det, cfg, params, scene, mesh)

    single = SingleShotInference(det, cfg)
    one = single.detect(params, scene)

    assert sharded["pred_box"].shape == one["pred_box"].shape
    np.testing.assert_allclose(
        sharded["pred_box"], one["pred_box"], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_array_equal(sharded["pred_class"], one["pred_class"])
    np.testing.assert_allclose(
        sharded["pred_conf"], one["pred_conf"], rtol=1e-4, atol=1e-5
    )
