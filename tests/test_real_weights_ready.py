"""One-command real-weights readiness rehearsal (VERDICT r2 #8, r3 #7).

Runs ``tools/real_weights_eval.py --dry-run`` as a subprocess: one leg per
shipped released-checkpoint config (``/root/reference/README.md:120-168``).
Leg 0 (ScanNet benchmark.yml): the reference network's RANDOM state_dict
saved as a genuine ``.pth``, converted by ``train/checkpoint.py``,
parity-checked against the reference's own torch TEST branch with those
weights, evaluated on a synthetic whole scene, and pushed through the
vox2mesh benchmark export. Legs 1/2 (ScanNet/SUNCG rpn_class_mask_5.yml):
the FULL color branch — random reference ENet ``.pth`` + synthetic shaded
RGB/depth/pose frames — through the identical stages."""

import os
import subprocess
import sys

import pytest


def _run_leg(leg):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "tools/real_weights_eval.py", "--dry-run",
         "--dry-run-leg", str(leg)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=3600,
    )
    sys.stdout.write(proc.stdout[-3000:])
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, f"real-weights leg {leg} NOT READY"
    assert "[real-weights] READY" in proc.stdout
    return proc.stdout


@pytest.mark.slow
def test_real_weights_dry_run_ready_geometry_and_export():
    out = _run_leg(0)
    # every stage actually ran (none silently skipped)
    for stage in ("convert: PASS", "parity/proposals: PASS",
                  "parity/classifier: PASS", "parity/mask: PASS",
                  "eval: PASS", "benchmark-export: PASS"):
        assert stage in out, f"stage missing: {stage}"


@pytest.mark.slow
def test_real_weights_dry_run_ready_scannet_color():
    out = _run_leg(1)
    for stage in ("convert: PASS", "parity/proposals: PASS",
                  "parity/classifier: PASS", "parity/mask: PASS",
                  "parity/enet: PASS", "eval: PASS"):
        assert stage in out, f"stage missing: {stage}"


@pytest.mark.slow
def test_real_weights_dry_run_ready_suncg_color():
    out = _run_leg(2)
    for stage in ("convert: PASS", "parity/proposals: PASS",
                  "parity/classifier: PASS", "parity/mask: PASS",
                  "parity/enet: PASS", "eval: PASS"):
        assert stage in out, f"stage missing: {stage}"
