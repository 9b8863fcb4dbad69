"""Checkpointing: torch `.pth` <-> flat JAX param dict, native snapshots.

The released 3D-SIS checkpoints are torch 0.4 ``state_dict`` pickles
(``README.md:59-65``). Conversion is mechanical because our param dict keys
ARE the torch names (see ``tpu3dsis.models.nn``); only layouts change:

  - conv3d weight:  torch (out, in, kx, ky, kz) -> ours (kx, ky, kz, in, out)
  - linear weight:  torch (out, in)             -> ours (in, out)
  - the first classifier Linear consumes the flattened RoI pool; torch
    flattens (C, P, P, P) channel-major and we transpose pool5 to match
    (backbones.py ``classify``), so no weight permutation is needed
  - biases: unchanged

Partial-load semantics mirror ``SolverWrapper.from_snapshot``
(``lib/model/trainval.py:135-173``): name-substring partitions
backbone=geometry|combine, rpn=rpn, class=classifier (minus cls/bbox heads
under NYUV2 finetune), color=color.

Native snapshots are ``.npz`` files (step_<N>.npz) with the same retention
policy as the reference (SNAPSHOT_KEPT, ``trainval.py:247-258``).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np


def torch_state_dict_to_params(state_dict) -> dict:
    """Convert a torch state_dict (tensors or numpy) to our flat param dict."""
    params = {}
    for name, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        if name.endswith(".weight") and arr.ndim == 5:
            arr = arr.transpose(2, 3, 4, 1, 0)  # OIDHW -> DHWIO
        elif name.endswith(".weight") and arr.ndim == 2:
            arr = arr.transpose(1, 0)  # (out,in) -> (in,out)
        params[name] = arr
    return params


def params_to_torch_state_dict(params: dict) -> dict:
    """Inverse conversion (numpy arrays in torch layouts)."""
    out = {}
    for name, value in params.items():
        arr = np.asarray(value, dtype=np.float32)
        if name.endswith(".weight") and arr.ndim == 5:
            arr = arr.transpose(4, 3, 0, 1, 2)
        elif name.endswith(".weight") and arr.ndim == 2:
            arr = arr.transpose(1, 0)
        out[name] = arr
    return out


def load_pth(path: str) -> dict:
    """Load a torch .pth checkpoint into our param dict (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return torch_state_dict_to_params(sd)


def partial_update(
    model_params: dict,
    pretrained: dict,
    cfg,
) -> dict:
    """Name-prefix partitioned partial load (trainval.py:140-158)."""
    out = dict(model_params)

    def take(pred):
        for k, v in pretrained.items():
            if pred(k) and k in out:
                if out[k].shape != v.shape:
                    raise ValueError(
                        f"shape mismatch for {k}: {out[k].shape} vs {v.shape}"
                    )
                out[k] = v

    if cfg.LOAD_BACKBONE:
        take(lambda k: "geometry" in k or "combine" in k)
    if cfg.LOAD_RPN:
        take(lambda k: "rpn" in k)
    if cfg.LOAD_CLASS:
        if cfg.NYUV2_FINETUNE:
            take(
                lambda k: "classifier" in k
                and "classifier_cls" not in k
                and "classifier_bbox" not in k
            )
        else:
            take(lambda k: "classifier" in k)
    if cfg.USE_IMAGES:
        take(lambda k: "color" in k)
    return out


# --- native snapshots --------------------------------------------------------


def save_snapshot(checkpoint_dir: str, step: int, params: dict, opt_state=None):
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"step_{step}.npz")
    arrays = {f"param:{k}": np.asarray(v) for k, v in params.items()}
    if opt_state is not None:
        arrays.update(
            {f"momentum:{k}": np.asarray(v) for k, v in opt_state.momentum.items()}
        )
        arrays["opt_step"] = np.asarray(opt_state.step)
    np.savez(path, **arrays)
    return path


def load_snapshot(path: str):
    data = np.load(path)
    params = {
        k[len("param:") :]: data[k] for k in data.files if k.startswith("param:")
    }
    momentum = {
        k[len("momentum:") :]: data[k]
        for k in data.files
        if k.startswith("momentum:")
    }
    opt_step = int(data["opt_step"]) if "opt_step" in data.files else 0
    return params, momentum, opt_step


def find_previous(checkpoint_dir: str, stepsizes=()):
    """Newest usable snapshot (trainval.py:194-214: skip stepsize+1 files)."""
    files = glob.glob(os.path.join(checkpoint_dir, "step_*.npz"))
    red = {
        os.path.join(checkpoint_dir, f"step_{s + 1}.npz") for s in stepsizes
    }
    files = [f for f in files if f not in red]
    files.sort(key=os.path.getmtime)
    return files


def prune_snapshots(checkpoint_dir: str, keep: int):
    """Retention: delete oldest beyond SNAPSHOT_KEPT (trainval.py:247-258)."""
    if keep <= 0:
        return
    files = find_previous(checkpoint_dir)
    for f in files[:-keep]:
        os.remove(f)


def snapshot_step(path: str) -> int:
    m = re.search(r"step_(\d+)\.npz$", path)
    return int(m.group(1)) if m else -1
