"""Fixture provenance: stamp committed .npz training fixtures with the
generating command + a config fingerprint (VERDICT r3 #9).

The committed fixtures (tests/fixtures/*.npz) are trained artifacts of
tools/tiling_parity_check.py and tools/color_loop_check.py. If those tools'
configs drift, a fixture silently stops matching what the tool would
produce. Each fixture gets a ``<fixture>.provenance.json`` sidecar recording
the command, the generation args, and a deterministic fingerprint of the
tool's config; a default-tier test recomputes the fingerprint from the
CURRENT tool code and fails loudly on drift — no retraining needed.
"""

from __future__ import annotations

import hashlib
import json
import os

# keys whose values are host paths / run modes, not model-relevant config
_VOLATILE = ("FILELIST", "PATH", "DIR", "MODE")


def _norm(v):
    import numpy as np

    if isinstance(v, dict):
        return {
            k: _norm(v[k])
            for k in sorted(v)
            if not any(t in str(k) for t in _VOLATILE)
        }
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        return float(v)
    if v is None or isinstance(v, str):
        return v
    return str(v)


def config_fingerprint(cfg) -> str:
    """sha256 over the sorted, volatile-key-stripped config mapping."""
    blob = json.dumps(_norm(dict(cfg)), sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()


def sidecar_path(fixture_path: str) -> str:
    return fixture_path + ".provenance.json"


def write_provenance(fixture_path: str, command: str, cfg, args: dict,
                     note: str = "") -> str:
    """Write the sidecar next to the fixture; returns its path."""
    p = sidecar_path(fixture_path)
    payload = {
        "fixture": os.path.basename(fixture_path),
        "command": command,
        "args": _norm(args),
        "config_fingerprint": config_fingerprint(cfg),
        "dtype": "float16 (savez_compressed)",
    }
    if note:
        payload["note"] = note
    with open(p, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    return p


def read_provenance(fixture_path: str) -> dict:
    with open(sidecar_path(fixture_path)) as f:
        return json.load(f)
