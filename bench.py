"""Benchmark: end-to-end chunk detection inference throughput on one chip.

Measures the full jitted pipeline (geometry backbone + 2-level RPN + NMS +
multi-level RoI pool + classification head + per-class box decode) on
96x48x96 TSDF chunks — the reference's core workload (a whole ScanNet scene
is ~10-40 chunk-equivalents of voxels).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
comparison constant below is an estimate of the reference pipeline on its
GTX 1080 Ti: its per-scene test loop is dominated by host<->device
round-trips (numpy target/proposal glue + CUDA NMS keep-scan on CPU,
lib/model/trainval.py:769-941); the reference trains at ~2-4 it/s on chunks,
and inference-only is estimated at ~8 chunks/s. Re-estimate in later rounds.
"""

import json
import time

import numpy as np

REFERENCE_CHUNKS_PER_S_ESTIMATE = 8.0
BATCH = 32


def main():
    import jax

    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _scannet_cfg
    from tpu3dsis.models import Detector, build_inference_fn

    cfg = _scannet_cfg()
    cfg.TPU_COMPUTE_DTYPE = "bfloat16"
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(0))
    shape = (96, 48, 96)
    single = build_inference_fn(det, cfg, shape, mode="TEST")

    iters = 10

    def batched(params, scenes):
        out = jax.vmap(lambda s: single(params, s[None]))(scenes)
        return out["pred_conf"].sum() + out["rois"].sum()

    def repeated(params, scenes):
        # lax.scan with a carried data dependency: amortizes the host<->device
        # tunnel RTT (~30ms on axon) and defeats CSE across iterations
        def body(carry, _):
            r = batched(params, scenes + carry * 1e-20)
            return r, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    fn = jax.jit(repeated)
    rng = np.random.RandomState(0)
    scenes = jnp.asarray(rng.randn(BATCH, *shape, 2).astype(np.float32))

    float(fn(params, scenes))  # warmup/compile + full completion
    t0 = time.perf_counter()
    float(fn(params, scenes))
    dt = time.perf_counter() - t0

    chunks_per_s = BATCH * iters / dt
    print(
        json.dumps(
            {
                "metric": "chunk_detection_inference_throughput",
                "value": round(chunks_per_s, 2),
                "unit": "chunks/s",
                "vs_baseline": round(
                    chunks_per_s / REFERENCE_CHUNKS_PER_S_ESTIMATE, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
