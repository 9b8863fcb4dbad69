"""Multi-process (multi-host / multi-slice) runtime initialization.

One TPU host only sees its local chips; scaling past a single host requires
`jax.distributed.initialize` so every process shares one global device list
and XLA collectives ride ICI/DCN across hosts (SURVEY section 5.8). The
reference has no equivalent (single-GPU CUDA); this is the TPU-native
scaling path.

Configuration is env-driven so launch scripts stay uniform:
  TPU3DSIS_COORDINATOR   host:port of process 0 (explicit cluster)
  TPU3DSIS_NUM_PROCESSES total process count
  TPU3DSIS_PROCESS_ID    this process's rank
  TPU3DSIS_DIST=1        auto-detected cluster (TPU pods / GKE / SLURM,
                         where jax.distributed.initialize() needs no args)
"""

from __future__ import annotations

import os

_initialized = False


def initialize_from_env() -> bool:
    """Idempotently initialize the JAX distributed runtime if configured.

    Returns True when running multi-process (after initialization), False
    for plain single-process runs. Must be called before the first device
    query (`jax.devices()` fixes the backend).
    """
    global _initialized
    coord = os.environ.get("TPU3DSIS_COORDINATOR", "")
    auto = os.environ.get("TPU3DSIS_DIST", "") == "1"
    if not coord and not auto:
        return False
    if _initialized:
        return True

    import jax

    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["TPU3DSIS_NUM_PROCESSES"]),
            process_id=int(os.environ["TPU3DSIS_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    _initialized = True
    return True


def process_info():
    """(process_index, process_count) — (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def replicate_to_mesh(tree, mesh):
    """Replicate a host/single-device pytree onto every device of the mesh.

    Required in multi-process runs: per-process arrays from init/restore
    cannot be fed to a global-mesh program directly. Every process must
    hold the SAME values (init with the same seed / restore the same file).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        tree,
    )


def shard_batch_to_mesh(batch: dict, mesh, axis: str = "data") -> dict:
    """Place a host batch onto a (possibly multi-process) mesh.

    Single-process: a plain device_put with the batch sharded over `axis`.
    Multi-process: each process passes ITS OWN local shard (leading dim =
    global_batch / process_count) and the pieces are assembled into one
    global array via `jax.make_array_from_process_local_data` — no host
    ever materializes the global batch.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
