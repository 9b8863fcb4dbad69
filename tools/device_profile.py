"""Per-op device-time profile of the flagship programs (VERDICT r2 #2).

Captures a ``jax.profiler`` trace of the chunk detection program (and the
fused scene program when a trained fixture exists), parses the XLA-op
track out of the trace, and prints a top-N ops-by-device-time table in
the BENCH_NOTES markdown format, plus the aggregate device time vs the
wall-clock dispatch time.

Run on the TPU host:  python tools/device_profile.py [--top 10]
The table answers "where do the microseconds go" — the companion MFU
number in bench.py answers "how far from peak".
"""

import argparse
import collections
import glob
import gzip
import json
import os
import pathlib
import sys

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd


def capture_trace(fn, args, trace_dir, iters=20):
    """Run fn(*args) under the profiler; return the trace-event list."""
    import jax

    fn(*args)  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise RuntimeError(f"no trace written under {trace_dir}")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        return json.load(f)["traceEvents"]


def device_op_table(events, iters):
    """Aggregate complete events on device-side XLA-op tracks by op name.

    The trace contains host threads (dispatch, runtime) and per-device
    tracks; XLA op timings live on tracks whose process is the TPU/device
    and whose thread name contains "XLA Ops". Durations are microseconds.
    """
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    def on_device_ops(e):
        p = pid_name.get(e.get("pid"), "")
        t = tid_name.get((e.get("pid"), e.get("tid")), "")
        dev = any(k in p for k in ("TPU", "Device", "/device:"))
        return dev and ("XLA Ops" in t or "XLA Op" in t or "Ops" == t)

    total = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and on_device_ops(e):
            total[e["name"]] += e.get("dur", 0)
            count[e["name"]] += 1
    per_iter = {k: v / iters for k, v in total.items()}
    return per_iter, count, sum(per_iter.values())


def print_table(tag, per_iter, count, total_us, iters, top):
    print(f"\n### {tag}: top {top} XLA ops by device time "
          f"(mean over {iters} iters, total {total_us/1e3:.2f} ms/iter)\n")
    print("| op | ms/iter | % | calls/iter |")
    print("|---|---|---|---|")
    for name, us in sorted(per_iter.items(), key=lambda kv: -kv[1])[:top]:
        short = name if len(name) <= 70 else name[:67] + "..."
        print(f"| `{short}` | {us/1e3:.3f} | {100*us/total_us:.1f}% "
              f"| {count[name]/iters:.0f} |")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=0,
                   help="profile the bench.py batched program (vmap over "
                        "BATCH chunks, bf16 compute) instead of entry()")
    p.add_argument("--trace-dir", default="/tmp/tpu3dsis_profile")
    args = p.parse_args()

    import numpy as np

    import jax

    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import __graft_entry__ as g

    if args.batch:
        # the exact program bench.py::bench_chunks times (minus the scan
        # wrapper, which only amortizes dispatch): vmapped TEST inference
        # over a batch of chunks in bf16
        from tpu3dsis.models import Detector, build_inference_fn

        cfg = g._scannet_cfg()
        cfg.TPU_COMPUTE_DTYPE = "bfloat16"
        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = det.init_params(jax.random.PRNGKey(0))
        shape = (96, 48, 96)
        single = build_inference_fn(det, cfg, shape, mode="TEST")

        def batched(params, scenes):
            out = jax.vmap(lambda s: single(params, s[None]))(scenes)
            return out["pred_conf"].sum() + out["rois"].sum()

        rng = np.random.RandomState(0)
        scenes = jax.numpy.asarray(
            rng.randn(args.batch, *shape, 2).astype(np.float32)
        )
        jitted, ex = jax.jit(batched), (params, scenes)
        tag = f"chunk detect batch={args.batch} bf16 (bench program)"
    else:
        fn, ex = g.entry()
        jitted, tag = jax.jit(fn), "chunk detect (entry())"
    events = capture_trace(
        jitted, ex, os.path.join(args.trace_dir, "chunk"), args.iters
    )
    per_iter, count, total_us = device_op_table(events, args.iters)
    if not per_iter:
        # fall back: dump the track names so the failure is debuggable
        names = sorted(
            {e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
        )
        print(f"no device-op events found; thread tracks: {names}")
        return 1
    print_table(tag, per_iter, count, total_us, args.iters, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
