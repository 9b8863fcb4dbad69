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


@pytest.mark.medium
def test_multistep_dp_matches_single_device_trajectory():
    """N steps of 8-device DP training == the single-device trajectory.

    Exact by construction (VERDICT r3 #5): the mesh step folds the step key
    by `axis_index('data')` then splits once per local sample
    (trainstep.py::step_local / batched_loss), so a single-device run fed
    the SAME pre-folded per-sample keys must produce the same averaged
    gradients — pmean over 8 one-sample shards == mean over the 8 samples.
    Pins that multi-chip DP training follows the single-device trajectory
    beyond one step (params AND loss curve), not just that one step runs.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpu3dsis.models import Detector
    from tpu3dsis.train.solver import make_solver
    from tpu3dsis.train.trainstep import (
        TrainState,
        apply_step_update,
        build_loss_fn,
        build_train_step,
    )

    import __graft_entry__ as entry

    cfg = entry._scannet_cfg(tiny=True)
    shape = (16, 16, 16)
    n = 8
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params0 = det.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    gt = np.full((n, cfg.TPU_MAX_GT, 7), -1e4, np.float32)
    gt[:, :, 3:6] = -1e4 + 1
    gt[:, :, 6] = 0
    canvas = np.zeros((n, *shape), np.float32)
    for i in range(n):  # distinct geometry per shard: shards must disagree
        x0, y0, z0 = rng.randint(0, 5, 3)
        dx, dy, dz = rng.randint(5, 9, 3)
        gt[i, 0] = [x0, y0, z0, x0 + dx, y0 + dy, z0 + dz, 1 + i % 3]
        canvas[i, x0:x0 + dx, y0:y0 + dy, z0:z0 + dz] = 1.0
    batch = {
        "data": rng.randn(n, *shape, 2).astype(np.float32),
        "gt_box": gt,
        "gt_valid": np.pad(np.ones((n, 1), bool),
                           ((0, 0), (0, cfg.TPU_MAX_GT - 1))),
        "mask_canvas": canvas,
    }

    n_steps = 3
    base = jax.random.PRNGKey(7)
    step_keys = [jax.random.fold_in(base, s) for s in range(n_steps)]

    # --- 8-device mesh trajectory ---------------------------------------
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("data",))
    opt_init, mesh_step = build_train_step(det, cfg, shape, mesh=mesh)
    sharding = NamedSharding(mesh, P("data"))
    batch_d = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    state = TrainState(params=params0, opt=opt_init(params0))
    mesh_losses = []
    for s in range(n_steps):
        state, metrics = mesh_step(state, batch_d, step_keys[s])
        mesh_losses.append(float(metrics["total_loss"]))
    mesh_params = jax.device_get(state.params)

    # --- single-device trajectory with the pre-folded keys ---------------
    loss_fn = build_loss_fn(det, cfg, shape)
    _, opt_update = make_solver(cfg, det.param_names())

    @jax.jit
    def ref_step(state, batch, key):
        def mean_loss(params):
            keys = jax.vmap(
                lambda i: jax.random.split(jax.random.fold_in(key, i), 1)[0]
            )(jnp.arange(n, dtype=jnp.uint32))
            totals, metrics = jax.vmap(
                lambda s, k: loss_fn(params, s, k), in_axes=(0, 0)
            )(batch, keys)
            return jnp.mean(totals), {
                k: jnp.mean(v) for k, v in metrics.items()
            }

        (_, metrics), grads = jax.value_and_grad(mean_loss, has_aux=True)(
            state.params
        )
        return apply_step_update(state, grads, metrics, opt_update)

    state1 = TrainState(params=params0, opt=opt_init(params0))
    ref_losses = []
    for s in range(n_steps):
        state1, metrics1 = ref_step(state1, batch, step_keys[s])
        ref_losses.append(float(metrics1["total_loss"]))
    ref_params = jax.device_get(state1.params)

    np.testing.assert_allclose(mesh_losses, ref_losses, rtol=1e-6)
    for k in ref_params:
        np.testing.assert_allclose(
            mesh_params[k], ref_params[k], rtol=1e-5, atol=1e-7,
            err_msg=f"param {k} diverged between DP-8 and single-device",
        )


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
