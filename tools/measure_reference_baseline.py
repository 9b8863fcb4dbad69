"""Measure the reference's per-chunk TEST inference on this machine's CPU.

The reference publishes no throughput numbers (BASELINE.md); round 1 used an
ADMITTED estimate (8 chunks/s) as the bench denominator. This tool replaces
it with a measurement: the reference's own torch code (loaded from
/root/reference via tools/refnet.py) runs its full TEST pipeline — backbone,
RPN heads, proposal layer with its numpy cpu_nms, RoI pool (CPU
re-implementation of its C kernel), classifier, decode — per 96x48x96 chunk
on the host CPU.

Caveats recorded alongside the number: (a) this is CPU torch, not the
GTX 1080 Ti (convs would be faster there; the host-side proposal/NMS path
would not); (b) the RoI pool stand-in is Python (its cost is excluded from
the timed region and reported separately so the comparison cannot be
accused of sandbagging).

Writes BASELINE_MEASURED.json (committed; bench.py reads it):
  {"ref_cpu_chunks_per_s": ..., "ref_cpu_s_per_chunk": ...,
   "stage_s": {...}, "host": ...}
"""

import json
import os
import sys
import pathlib
import platform
import time

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd

import numpy as np  # noqa: E402


def make_chunk(seed):
    rng = np.random.RandomState(seed)
    sdf = np.full((96, 48, 96), 8.0, np.float32)
    for _ in range(4):
        sx, sy, sz = rng.randint(8, 30, 3)
        x0 = rng.randint(2, 94 - sx)
        y0 = rng.randint(2, 46 - sy)
        z0 = rng.randint(2, 94 - sz)
        sdf[x0 : x0 + sx, y0 : y0 + sy, z0 : z0 + sz] = 0.3
        sdf[x0 + 1 : x0 + sx - 1, y0 + 1 : y0 + sy - 1, z0 + 1 : z0 + sz - 1] = -2.0
    trunc = np.clip(sdf, -3, 3)
    return np.stack(
        [np.abs(trunc), (sdf > -1).astype(np.float32)], axis=-1
    )[None].astype(np.float32)


def main(n_chunks=12):
    import sys

    sys.path.insert(0, "tools")
    import refnet

    import torch

    if not refnet.available():
        raise SystemExit("reference checkout not available")
    torch.set_num_threads(os.cpu_count() or 8)
    net, rc = refnet.build_scannet_net()

    chunks = [make_chunk(i) for i in range(n_chunks)]
    # timing split: everything except the Python RoI-pool stand-in counts;
    # the stand-in's own time is reported separately
    stage_s = {"backbone_rpn_proposal_decode": 0.0, "roi_pool_standin": 0.0}
    t_pool = [0.0]
    orig_pool = refnet.roi_pooling_forward_cpu

    def timed_pool(*args):
        t0 = time.perf_counter()
        out = orig_pool(*args)
        t_pool[0] += time.perf_counter() - t0
        return out

    refnet.roi_pooling_forward_cpu = timed_pool  # PyRoIPool calls this

    # warmup (allocators, conv algo selection)
    refnet.run_test_stages(net, rc, chunks[0])

    t0 = time.perf_counter()
    t_pool[0] = 0.0
    n_props = []
    for c in chunks:
        out = refnet.run_test_stages(net, rc, c)
        n_props.append(int(out["rois"].shape[0]))
    total = time.perf_counter() - t0
    timed = total - t_pool[0]
    stage_s["backbone_rpn_proposal_decode"] = timed / n_chunks
    stage_s["roi_pool_standin"] = t_pool[0] / n_chunks

    result = {
        "ref_cpu_s_per_chunk": timed / n_chunks,
        "ref_cpu_chunks_per_s": n_chunks / timed,
        "ref_cpu_s_per_chunk_incl_pool_standin": total / n_chunks,
        "mean_proposals": float(np.mean(n_props)),
        "stage_s": stage_s,
        "n_chunks": n_chunks,
        "torch_threads": torch.get_num_threads(),
        "cpus_visible": os.cpu_count(),
        "host": platform.processor() or platform.machine(),
        "note": (
            "reference torch TEST pipeline on host CPU (no CUDA in this "
            "environment; SINGLE visible core — a weak lower bound on the "
            "GTX 1080 Ti for convs, not for its host-side proposal path); "
            "the Python RoI-pool stand-in's time is EXCLUDED from the "
            "headline figure"
        ),
    }
    os.makedirs("data", exist_ok=True)
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
