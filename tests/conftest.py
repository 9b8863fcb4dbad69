"""Test harness: force an 8-device virtual CPU mesh before importing jax.

Multi-chip sharding is validated on host CPU devices (the TPU-native
substitute for multi-node CI; see SURVEY.md section 4(d)).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (a remote TPU
# tunnel with ~30ms RTT per dispatch) which makes unit tests crawl AND runs
# fp32 convs through the MXU's bf16 pass (1e-3 error vs torch oracles).
# The env var alone is overridden by the axon plugin; jax.config wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def scannet_cfg():
    """ScanNet-style config (mirrors experiments/cfgs/ScanNet/benchmark.yml
    minus the color pipeline), with NUM_CLASSES=19 set directly."""
    from tpu3dsis.config import default_config

    cfg = default_config()
    cfg.NUM_CLASSES = 19
    cfg.NORMALIZE_WEIGHTS = [1.0] * 19
    cfg.LABEL_MAP = ""
    cfg.NET = "ScanNet_Backbone"
    cfg.MASK_BACKBONE = "MaskBackbone"
    cfg.NUM_ANCHORS_LEVEL1 = 3
    cfg.NUM_ANCHORS_LEVEL2 = 11
    cfg.NUM_ANCHORS_LEVEL3 = 0
    cfg.ANCHORS_TYPE_LEVEL1 = "scannet14_3.txt"
    cfg.ANCHORS_TYPE_LEVEL2 = "scannet14_11.txt"
    cfg.CLASS_POOLING_SIZE = 4
    cfg.USE_RPN = True
    cfg.USE_CLASS = True
    cfg.USE_BACKBONE = True
    cfg.USE_MASK = True
    cfg.USE_IMAGES = False
    cfg.RPN_BATCHSIZE = 64
    cfg.RPN_POSITIVE_OVERLAP = 0.35
    cfg.RPN_NEGATIVE_OVERLAP = 0.15
    cfg.CLASS_BATCH_SIZE = 16
    cfg.FG_FRACTION = 0.5
    cfg.FG_THRESH = 0.5
    cfg.BG_THRESH = 0.2
    cfg.BG_THRESH_LO = 0.0
    cfg.TRAIN.RPN_NMS_THRESH = 0.5
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 1000
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 500
    cfg.TEST.RPN_PRE_NMS_TOP_N = 400
    cfg.TEST.RPN_POST_NMS_TOP_N = 200
    cfg.TEST.RPN_NMS_THRESH = 0.1
    return cfg
