"""Multi-process training init (SURVEY 5.8): a real 2-process CPU cluster.

Spawns two subprocesses that initialize jax.distributed via the
TPU3DSIS_COORDINATOR env contract, build a 4-device global mesh (2 local CPU
devices each), and run one full data-parallel train step through the
Trainer. The driver-side single-process multi-device path is covered by
__graft_entry__.dryrun_multichip.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from tpu3dsis.parallel import distributed as dist

assert dist.initialize_from_env()
pid, pcount = dist.process_info()
assert pcount == 2, pcount
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
from tpu3dsis.config import default_config
from tpu3dsis.train.loop import Trainer

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
cfg.USE_BACKBONE = cfg.USE_RPN = cfg.USE_CLASS = cfg.USE_MASK = True
cfg.USE_IMAGES = False
cfg.RPN_BATCHSIZE = 16
cfg.RPN_POSITIVE_OVERLAP = 0.35
cfg.RPN_NEGATIVE_OVERLAP = 0.15
cfg.CLASS_BATCH_SIZE = 8
cfg.FG_FRACTION = 0.5
cfg.FG_THRESH = 0.5
cfg.BG_THRESH = 0.2
cfg.BG_THRESH_LO = 0.0
cfg.TRAIN.RPN_NMS_THRESH = 0.5
cfg.TRAIN.RPN_PRE_NMS_TOP_N = 64
cfg.TRAIN.RPN_POST_NMS_TOP_N = 16
cfg.TPU_MAX_GT = 4
cfg.TPU_MAX_MASK_ROIS = 2
cfg.TPU_DATA_PARALLEL = 4
cfg.TPU_TILE_SIZE = [32, 16, 32]

out_dir = sys.argv[1]
trainer = Trainer(cfg, os.path.join(out_dir, f"run{pid}"))
assert trainer.process_count == 2 and trainer.mesh is not None
assert trainer.mesh.devices.size == 4

from tpu3dsis.parallel.distributed import replicate_to_mesh, shard_batch_to_mesh
from tpu3dsis.train.trainstep import TrainState

state, _ = trainer.restore_or_init(seed=0)
state = TrainState(
    params=replicate_to_mesh(state.params, trainer.mesh),
    opt=replicate_to_mesh(state.opt, trainer.mesh),
)

rng = np.random.RandomState(0)  # same data on both ranks -> loss is exact
shape = (32, 16, 32)
local = 2  # global batch 4 = 2 per process
gt = np.zeros((local, 4, 7), np.float32)
gt[:, :, :3] = -1e4
gt[:, :, 3:6] = -1e4 + 1
gt[:, 0] = [2, 2, 2, 10, 10, 10, 3]
batch = {
    "data": rng.randn(local, *shape, 2).astype(np.float32),
    "gt_box": gt,
    "gt_valid": np.pad(np.ones((local, 1), bool), ((0, 0), (0, 3))),
    "mask_canvas": np.zeros((local, *shape), np.float32),
}
batch["mask_canvas"][:, 2:10, 2:10, 2:10] = 1.0
batch = shard_batch_to_mesh(batch, trainer.mesh)

import jax
state, metrics = trainer.step_fn(state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(state.params)
total = float(metrics["total_loss"])
assert np.isfinite(total)
print(f"RANK{pid} OK total_loss={total:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        # the worker script lives in tmp_path, so python puts tmp_path (not
        # the repo) on sys.path — make tpu3dsis importable without requiring
        # the package to be pip-installed
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.update(
            TPU3DSIS_COORDINATOR=f"127.0.0.1:{port}",
            TPU3DSIS_NUM_PROCESSES="2",
            TPU3DSIS_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=os.getcwd(),
            )
        )
    outs = []
    for rank, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=900)
        outs.append(out)
        assert proc.returncode == 0, f"rank {rank} failed:\n{out}"
    losses = []
    for rank, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith(f"RANK{rank} OK")]
        assert line, out
        losses.append(float(line[0].split("total_loss=")[1]))
    # replicated params + identical data => identical loss on both ranks
    assert losses[0] == losses[1]
