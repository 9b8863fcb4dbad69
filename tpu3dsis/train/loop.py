"""The training driver: epochs, wall-clock validation cadence, snapshots.

Equivalent of ``SolverWrapper.train_model`` (``lib/model/trainval.py:286-432``)
re-built around the one-program train step:
  - resume from the newest usable snapshot (skipping stepsize+1 files)
  - VAL_TIME-hours wall-clock-triggered validation on val + trainval splits
    followed by a snapshot, retention SNAPSHOT_KEPT
  - DISPLAY-interval loss logging with the reference's scalar tags
  - data parallel over all local devices via the shard_mapped step
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu3dsis.infer.validate import ChunkValidator
from tpu3dsis.io.dataset import SceneDataset
from tpu3dsis.io.pipeline import PrefetchLoader
from tpu3dsis.parallel import distributed as dist
from tpu3dsis.models.detector import Detector
from tpu3dsis.train import checkpoint as ckpt
from tpu3dsis.train.solver import SGDState
from tpu3dsis.train.trainstep import TrainState, build_train_step
from tpu3dsis.utils.logger import Logger


class Trainer:
    def __init__(self, cfg, output_dir: str, chunk_shape=None):
        if chunk_shape is None:
            chunk_shape = tuple(int(t) for t in cfg.TPU_TILE_SIZE)
        self.cfg = cfg
        self.output_dir = output_dir
        self.checkpoint_dir = os.path.join(output_dir, "checkpoints")
        self.log_dir = os.path.join(output_dir, "logs")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.logger_train = Logger(os.path.join(self.log_dir, "train"))
        self.logger_val = Logger(os.path.join(self.log_dir, "val"))
        self.logger_trainval = Logger(os.path.join(self.log_dir, "trainval"))

        self.detector = Detector(cfg, anchor_dir="experiments/anchors")
        self.chunk_shape = chunk_shape

        # multi-host: initialize the distributed runtime (no-op unless the
        # TPU3DSIS_COORDINATOR / TPU3DSIS_DIST env is set; SURVEY 5.8) BEFORE
        # the first device query, then data-parallel over GLOBAL devices
        dist.initialize_from_env()
        self.process_id, self.process_count = dist.process_info()
        n_dp = int(cfg.TPU_DATA_PARALLEL) or len(jax.devices())
        n_dp = min(n_dp, len(jax.devices()))
        if n_dp % self.process_count:
            raise ValueError(
                f"TPU_DATA_PARALLEL={n_dp} not divisible by "
                f"process_count={self.process_count}"
            )
        self.mesh = None
        if n_dp > 1:
            from jax.sharding import Mesh

            self.mesh = Mesh(np.array(jax.devices()[:n_dp]), ("data",))
        self.n_dp = max(n_dp, 1)
        self.opt_init, self.step_fn = build_train_step(
            self.detector, cfg, chunk_shape, mesh=self.mesh
        )

    # --- state ------------------------------------------------------------
    def init_state(self, seed=0, pretrained: str | None = None) -> TrainState:
        params = self.detector.init_params(jax.random.PRNGKey(seed))
        if pretrained:
            pre = (
                ckpt.load_pth(pretrained)
                if pretrained.endswith(".pth")
                else ckpt.load_snapshot(pretrained)[0]
            )
            params = ckpt.partial_update(params, pre, self.cfg)
        params = {k: jnp.asarray(v) for k, v in params.items()}
        return TrainState(params=params, opt=self.opt_init(params))

    def restore_or_init(self, seed=0, pretrained=None):
        files = ckpt.find_previous(self.checkpoint_dir, self.cfg.STEPSIZE)
        if files:
            path = files[-1]
            params, momentum, opt_step = ckpt.load_snapshot(path)
            params = {k: jnp.asarray(v) for k, v in params.items()}
            state = TrainState(
                params=params,
                opt=SGDState(
                    momentum={k: jnp.asarray(v) for k, v in momentum.items()},
                    step=jnp.asarray(opt_step, jnp.int32),
                ),
            )
            print(f"restored from {path} at step {opt_step}")
            return state, opt_step
        return self.init_state(seed, pretrained), 0

    # --- training ---------------------------------------------------------
    def train(self, epochs: int, max_steps=None, val_fn=None, seed=0,
              pretrained=None):
        cfg = self.cfg
        state, last_iter = self.restore_or_init(seed, pretrained)

        train_ds = SceneDataset(cfg.TRAIN_FILELIST, "chunk", cfg)
        # multi-process: each host loads ONLY its local slice of the global
        # batch (decorrelated by a per-process sampling stream)
        loader = PrefetchLoader(
            train_ds, cfg, batch_size=self.n_dp // self.process_count,
            seed=seed + 9973 * self.process_id,
        )
        validator = None
        if val_fn is None and cfg.VAL_FILELIST and os.path.exists(cfg.VAL_FILELIST):
            validator = ChunkValidator(self.detector, cfg, self.chunk_shape)

        if self.process_count > 1:
            state = TrainState(
                params=dist.replicate_to_mesh(state.params, self.mesh),
                opt=dist.replicate_to_mesh(state.opt, self.mesh),
            )

        step = last_iter
        last_val = time.time()
        t_iter = time.time()
        for epoch in range(epochs):
            for batch in loader:
                if self.mesh is not None:
                    batch = dist.shard_batch_to_mesh(batch, self.mesh)
                key = jax.random.PRNGKey(seed * 1_000_003 + step)
                state, metrics = self.step_fn(state, batch, key)
                step += 1

                if step % cfg.DISPLAY == 0 and self.process_id == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    dt = (time.time() - t_iter) / cfg.DISPLAY
                    t_iter = time.time()
                    print(
                        f"epoch {epoch} step {step} "
                        f"total {metrics['total_loss']:.4f} {dt:.3f}s/iter"
                    )
                    for tag, v in metrics.items():
                        self.logger_train.scalar_summary(tag, v, step)

                # VAL_TIME-hours cadence (trainval.py:368-384)
                if (
                    cfg.VAL_TIME > 0
                    and (time.time() - last_val) / 3600.0 > cfg.VAL_TIME
                ):
                    last_val = time.time()
                    self._validate_and_snapshot(state, step, validator, val_fn)

                if max_steps is not None and step - last_iter >= max_steps:
                    self._snapshot(state, step)
                    return state, step
        self._snapshot(state, step)
        return state, step

    def _validate_and_snapshot(self, state, step, validator, val_fn):
        if self.process_id != 0:
            return  # single-host validation; ranks re-sync on the next step
        cfg = self.cfg
        params_np = {k: np.asarray(v) for k, v in state.params.items()}
        if val_fn is not None:
            val_fn(params_np, step)
        elif validator is not None:
            for mode, filelist, logger in (
                ("val", cfg.VAL_FILELIST, self.logger_val),
                ("trainval", cfg.TRAINVAL_FILELIST, self.logger_trainval),
            ):
                if not filelist or not os.path.exists(filelist):
                    continue
                ds = SceneDataset(filelist, "chunk", cfg)
                res = validator.run(
                    params_np, ds, max_samples=cfg.VAL_NUM,
                    save_dir=cfg.VAL_SAVE_DIR or None, logger=logger,
                    step=step,
                )
                print(f"[{mode}] step {step}: {res}")
        self._snapshot(state, step)

    def _snapshot(self, state, step):
        if self.process_id != 0:
            return None  # params are replicated; rank 0 writes
        path = ckpt.save_snapshot(
            self.checkpoint_dir,
            step,
            {k: np.asarray(v) for k, v in state.params.items()},
            state.opt,
        )
        ckpt.prune_snapshots(self.checkpoint_dir, self.cfg.SNAPSHOT_KEPT)
        print(f"snapshot -> {path}")
        return path
