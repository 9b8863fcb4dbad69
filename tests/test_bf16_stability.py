"""bf16 decision stability on trained fixtures (VERDICT r4 #7).

The one-hot projection picks are proven exact in bf16 (tests/test_ops.py,
tests/test_projection.py); what was NOT bounded is the drift the bf16
conv/ENet stacks introduce through the full net, and whether that drift
crosses the DECISION boundaries the reference's eval flow thresholds on
(``lib/model/trainval.py:824-858``): the detection set at the mAP-matching
IoU, the per-detection class argmax, and CLASS_THRESH confidence
crossings. Measured drift (fp32-trained fixture, bf16 inference, CPU XLA
— see PARITY.md "bf16 error budget"): confident detections move by up to
~2.5 voxels and survive IoU-0.5 matching with identical classes; the
low-confidence tail (conf < 0.9) can gain/lose members. These tests pin
exactly that contract.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tpu3dsis.geometry.boxes import bbox_overlap
from tpu3dsis.infer.tiling import SceneInference
from tpu3dsis.models import Detector


def _detect(cfg, params, scene, frames=None):
    det = Detector(cfg, anchor_dir="experiments/anchors")
    si = SceneInference(det, cfg)
    return si.detect(params, scene, frames=frames)


def _iou_match(boxes_a, boxes_b, thresh=0.5):
    """Greedy IoU matching; returns list of (i, j) pairs."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return []
    iou = np.asarray(bbox_overlap(boxes_a.astype(np.float32),
                                  boxes_b.astype(np.float32)))
    used = np.zeros(len(boxes_b), bool)
    pairs = []
    for i in range(len(boxes_a)):
        row = np.where(used, -1.0, iou[i])
        j = int(np.argmax(row))
        if row[j] >= thresh:
            pairs.append((i, j))
            used[j] = True
    return pairs


def _assert_decision_stability(out32, out16, conf_gate=0.9,
                               iou_thresh=0.5, max_conf_drift=0.1,
                               slack_div=8):
    conf32 = np.asarray(out32["pred_conf"], np.float64)
    conf16 = np.asarray(out16["pred_conf"], np.float64)
    hi32 = conf32 >= conf_gate
    hi16 = conf16 >= conf_gate
    pairs = _iou_match(
        np.asarray(out32["pred_box"])[hi32],
        np.asarray(out16["pred_box"])[hi16],
        iou_thresh,
    )
    n_hi = int(hi32.sum())
    # every CONFIDENT fp32 detection has a bf16 counterpart at the
    # mAP-matching IoU (detection-set stability where mAP is scored)
    assert len(pairs) >= n_hi - max(1, n_hi // slack_div), (
        f"only {len(pairs)}/{n_hi} confident fp32 detections matched in "
        f"bf16 at IoU {iou_thresh}: {np.asarray(out32['pred_box'])[hi32]} "
        f"vs {np.asarray(out16['pred_box'])[hi16]}"
    )
    # and vice versa: bf16 does not hallucinate confident detections
    n_hi16 = int(hi16.sum())
    assert n_hi16 - len(pairs) <= max(1, n_hi // slack_div), (
        f"bf16 added {n_hi16 - len(pairs)} unmatched confident detections"
    )
    cls32 = np.asarray(out32["pred_class"])[hi32]
    cls16 = np.asarray(out16["pred_class"])[hi16]
    c32m = conf32[hi32]
    c16m = conf16[hi16]
    drift = 0.0
    for i, j in pairs:
        assert cls32[i] == cls16[j], (
            f"class argmax flipped on matched pair: {cls32[i]} vs {cls16[j]}"
        )
        drift = max(drift, abs(float(c32m[i]) - float(c16m[j])))
    assert drift <= max_conf_drift, f"pred_conf drift {drift}"
    return len(pairs), drift


@pytest.mark.medium
def test_bf16_decisions_match_fp32_geometry_trained():
    import tiling_parity_check as tpc

    from tpu3dsis.config import load_label_mapping

    params = {
        k: np.asarray(v, np.float32)
        for k, v in np.load("tests/fixtures/tiling_parity_params.npz").items()
    }
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = tpc.build_cfg(steps=700, lr=0.003)
        cfg.TPU_COMPUTE_DTYPE = dt
        mapping, _ = load_label_mapping(cfg.LABEL_MAP)
        rng = np.random.RandomState(11)
        scene, gt_box, _ = tpc.make_scene(
            rng, cfg, mapping, extent=(140, 48, 140), n_objects=8
        )
        outs[dt] = _detect(cfg, params, scene)
    n_pairs, drift = _assert_decision_stability(
        outs["float32"], outs["bfloat16"]
    )
    assert n_pairs >= 6  # the scene's 8 objects are confidently detected


@pytest.mark.medium
def test_bf16_decisions_match_fp32_color_trained():
    """Same check through the FULL color branch (ENet + projection +
    color backbone), the flagship bf16 surface."""
    import pickle

    import color_loop_check as clc

    fixture = "tests/fixtures/color_loop_params.npz"
    bench_dir = "data/bench_color"
    manifest = os.path.join(bench_dir, "manifest.pkl")
    if not (os.path.exists(fixture) and os.path.exists(manifest)):
        pytest.skip("color fixture/scenes not generated")

    from tpu3dsis.io.dataset import SceneDataset

    frames_root = os.path.join(bench_dir, "frames_square")
    with open(manifest, "rb") as f:
        scene_paths = pickle.load(f)
    fl = os.path.join(bench_dir, "scenes_bf16test.txt")
    with open(fl, "w") as f:
        f.write(scene_paths[0] + "\n")
    params = {
        k: np.asarray(v, np.float32) for k, v in np.load(fixture).items()
    }
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = clc.build_cfg(frames_root)
        cfg.MODE = "test"
        cfg.TPU_COMPUTE_DTYPE = dt
        ds = SceneDataset(fl, "scene", cfg)
        s = ds[0]
        frames = {
            "images": s.images, "depths": s.depths, "poses": s.poses,
            "world_to_grid": s.world_to_grid,
        }
        det0 = Detector(cfg, anchor_dir="experiments/anchors")
        init = det0.init_params(jax.random.PRNGKey(0))
        for k, v in init.items():
            params.setdefault(k, np.asarray(v))
        outs[dt] = _detect(cfg, params, s.data, frames=frames)
    # the color branch's measured drift is larger (ENet + projection +
    # color backbone all in bf16, on a lightly-trained fixture whose
    # confident set contains overlapping near-duplicates): detections
    # remain matched at the reference's own chunk-eval threshold
    # (MAP_THRESH=0.25, config.py:117) with up to a quarter of the set
    # churning — the measured budget PARITY.md documents
    _assert_decision_stability(
        outs["float32"], outs["bfloat16"], iou_thresh=0.25,
        max_conf_drift=0.3, slack_div=4
    )
