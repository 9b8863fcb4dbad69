"""Benchmark: end-to-end chunk detection throughput + masked whole scenes.

Primary metric: the full jitted chunk pipeline (geometry backbone + 2-level
RPN + NMS + multi-level RoI pool + classification head + per-class box
decode) on 96x48x96 TSDF chunks — the reference's core workload.

Secondary (north-star) metric, reported in the same JSON object: whole-scene
inference WITH instance masks (tiled detect + stitch NMS + halo-window mask
FCN) on a reference-scale 240x48x240 scene using a TRAINED model (the
committed tiling-parity fixture) so the detection count is realistic
(~10-50), wall-clock timed end to end including all host<->device traffic.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline provenance (the reference publishes no numbers, BASELINE.md):
- measured: tools/measure_reference_baseline.py runs the reference's OWN
  torch TEST pipeline (loaded from /root/reference) on this host's CPU ->
  BASELINE_MEASURED.json. Caveat: single visible core, no CUDA — a weak
  lower bound on its GTX 1080 Ti for the conv stages (not for its host-side
  proposal/NMS path, which stayed on CPU in the reference too).
- estimate: ~8 chunks/s for the full reference pipeline on its 1080 Ti
  (round-1 figure, kept as the CONSERVATIVE comparison).
`vs_baseline` uses the measured number; `vs_1080ti_estimate` the estimate.
"""

import json
import os
import time

import numpy as np

REFERENCE_CHUNKS_PER_S_ESTIMATE = 8.0  # conservative 1080 Ti estimate
BATCH = 32
SCENE_FIXTURE = "tests/fixtures/tiling_parity_params.npz"
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 / 394 TOP/s int8 per chip
# (public spec, cloud.google.com/tpu/docs/v5e). MFU below = achieved
# flops/s (XLA cost_analysis flops / measured wall) over this peak.
V5E_PEAK_BF16_FLOPS = 197e12


def measured_baseline():
    try:
        with open("BASELINE_MEASURED.json") as f:
            return json.load(f)
    except Exception:
        return None


def bench_chunks(jax, jnp):
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

    # cost_analysis on the UNREPEATED batched program: XLA's analysis counts
    # a while/scan body ONCE regardless of trip count, so analysing
    # `repeated` under-reports flops by the iteration factor (measured 10x:
    # 4.29 vs the true 42.9 GFLOP/chunk)
    try:
        per_dispatch = float(
            jax.jit(batched).lower(params, scenes).compile()
            .cost_analysis()["flops"]
        )
        total_flops = per_dispatch * iters  # what `repeated` executes
    except Exception:
        total_flops = None

    float(fn(params, scenes))  # warmup/compile + full completion
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, scenes))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    rate = BATCH * iters / dt
    extras = {
        "chunks_per_s_spread": [
            round(BATCH * iters / t, 2) for t in sorted(times)
        ],
    }
    if total_flops:
        # flops is for the whole program (BATCH * iters chunks)
        extras["chunk_gflops"] = round(total_flops / (BATCH * iters) / 1e9, 2)
        extras["achieved_tflops"] = round(total_flops / dt / 1e12, 2)
        extras["mfu_vs_v5e_bf16_peak"] = round(
            total_flops / dt / V5E_PEAK_BF16_FLOPS, 4
        )
    return rate, extras


def stable_stream_passes(one_pass, dev_s, max_passes=12, want_clean=4,
                         budget_s=150.0):
    """Run stream passes until enough are stall-clean (tunnel-robust capture).

    BENCH r3 postmortem: the driver's cold run recorded 34 scenes/min where
    identical code re-measured 170 — all 5 passes sank together in a
    degraded axon-tunnel state, so a fixed median-of-5 is NOT robust. Here a
    pass is CLEAN if its per-scene wall time is within 2.5x the device-bound
    time (``SceneInference.device_seconds`` — host unpack + pipelined upload
    overhead never legitimately exceeds that) or within 1.3x the best pass
    seen. Passes repeat until `want_clean` clean ones exist (or caps hit);
    canonical figure = median of the clean passes. Returns
    (canonical_s, best_s, all_passes_sorted, n_degraded).
    """
    passes = []
    t0 = time.perf_counter()
    while len(passes) < max_passes and time.perf_counter() - t0 < budget_s:
        passes.append(one_pass())
        best = min(passes)
        clean = [p for p in passes
                 if p <= max(2.5 * dev_s, 1.3 * best)]
        if len(clean) >= want_clean:
            break
    best = min(passes)
    clean = sorted(
        p for p in passes if p <= max(2.5 * dev_s, 1.3 * best)
    ) or sorted(passes)[:3]
    return (clean[len(clean) // 2], best, sorted(passes),
            len(passes) - len(clean))


def bench_masked_scene(jax):
    """Scenes/min with masks on a trained model (realistic detection count)."""
    if not os.path.exists(SCENE_FIXTURE):
        return None
    import sys

    sys.path.insert(0, "tools")
    import tiling_parity_check as tpc

    from tpu3dsis.config import load_label_mapping
    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.models import Detector

    cfg = tpc.build_cfg(steps=700, lr=0.003)
    cfg.USE_MASK = True
    cfg.TPU_COMPUTE_DTYPE = "bfloat16"
    mapping, _ = load_label_mapping(cfg.LABEL_MAP)
    params = {
        k: np.asarray(v, np.float32) for k, v in np.load(SCENE_FIXTURE).items()
    }
    det = Detector(cfg, anchor_dir="experiments/anchors")
    # the fixture was trained with USE_MASK=False; init the mask FCN params
    # (mask timing does not depend on weight values)
    init = det.init_params(jax.random.PRNGKey(0))
    for k, v in init.items():
        params.setdefault(k, np.asarray(v))
    si = SceneInference(det, cfg)

    k = 4
    scenes = [
        tpc.make_scene(np.random.RandomState(7 + i), cfg, mapping,
                       n_objects=24)[0]
        for i in range(k)
    ]

    # warmup: one full pass compiles the fused one-dispatch program
    # (tiles + stitch NMS + mask windows in ONE XLA dispatch per scene)
    n_det = 0
    for s in scenes:
        out, masks = si.infer(params, s)
        n_det += len(out["pred_box"])

    # timed: a STREAM of distinct scenes; scene i+1's host->device upload
    # (prefetch thread) overlaps scene i's compute — the serving shape of
    # the workload. Fresh array copies so every upload really happens.
    # Best of 3 passes: single passes vary up to 2x with transient tunnel
    # stalls (measured 56-128 scenes/min for identical code); the best pass
    # is the steady-state device+pipeline capability.
    def one_pass():
        stream = [s.copy() for _ in range(2) for s in scenes]
        t0 = time.perf_counter()
        si.prefetch_scene(stream[0])
        for j, s in enumerate(stream):
            if j + 1 < len(stream):
                si.prefetch_scene(stream[j + 1])
            out, masks = si.infer(params, s)
            assert len(masks) == len(out["pred_box"])
        return (time.perf_counter() - t0) / len(stream)

    # device-bound anchor (tunnel-independent): scan-amortized fused program
    dev_s = si.device_seconds(params, scenes[0], iters=6)
    dt, best, spread, n_degraded = stable_stream_passes(one_pass, dev_s)
    return {"scenes_per_min_masked": 60.0 / dt,
            "scenes_per_min_masked_best": 60.0 / best,
            "scenes_per_min_masked_device": 60.0 / dev_s,
            "scene_s_device": round(dev_s, 3),
            "scene_degraded_passes": n_degraded,
            "scene_s_spread": [round(p, 3) for p in spread],
            "detections": int(round(n_det / k)), "scene_s": dt}


COLOR_FIXTURE = "tests/fixtures/color_loop_params.npz"
BENCH_COLOR_DIR = "data/bench_color"


def bench_color_scene(jax):
    """Flagship COLOR whole-scene throughput (the reference's shipped config
    sets USE_IMAGES: True — benchmark.yml:93).

    Scenes + shaded-RGB frames are generated once by the framework's own
    datagen (synthetic virtual scans, cached under data/bench_color, ~2 min
    first run); the model is the tools/color_loop_check.py fixture (trained
    end-to-end incl. ENet) so detection counts are realistic. Measures the
    serving stream: ENet + resident color volume prep prefetched, fused
    one-dispatch tiles+NMS+masks per scene, all host<->device traffic
    counted.
    """
    if not os.path.exists(COLOR_FIXTURE):
        return None
    import pickle
    import sys

    sys.path.insert(0, "tools")
    import color_loop_check as clc

    from tpu3dsis.infer.tiling import SceneInference
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.models import Detector

    frames_root = os.path.join(BENCH_COLOR_DIR, "frames_square")
    cfg = clc.build_cfg(frames_root)
    cfg.MODE = "test"

    # 6-scene corpus spanning view counts 32-200 and extents 5-11 m
    # (VERDICT r4 #8: the flagship metric shouldn't ride on a 2-scene
    # sample) — deterministic regeneration, one RNG stream
    corpus = [
        dict(extent_m=(7.5, 2.4, 7.5), n_objects=20, max_views=96),
        dict(extent_m=(7.5, 2.4, 7.5), n_objects=20, max_views=96),
        dict(extent_m=(5.0, 2.4, 5.0), n_objects=12, max_views=32),
        dict(extent_m=(9.5, 2.4, 9.5), n_objects=24, max_views=144),
        dict(extent_m=(11.0, 2.6, 11.0), n_objects=28, max_views=200),
        dict(extent_m=(6.0, 2.4, 8.5), n_objects=16, max_views=64),
    ]
    manifest = os.path.join(BENCH_COLOR_DIR, "manifest_v2.pkl")
    if os.path.exists(manifest):
        with open(manifest, "rb") as f:
            scene_paths = pickle.load(f)
    else:
        from tpu3dsis.datagen.synthetic_color import generate_scene

        scene_paths = []
        for i, spec in enumerate(corpus):
            # per-scene seed: each scene is reproducible in isolation
            # (resume-safe — a killed generation run restarts mid-corpus
            # without shifting the later scenes' RNG stream)
            out = generate_scene(
                np.random.RandomState(1230 + i), BENCH_COLOR_DIR,
                f"bench{i}", voxel_size=0.046875, image_wh=(328, 256),
                traj_wh=(64, 48), chunks=False, **spec,
            )
            scene_paths.append(out["scene_path"])
        with open(manifest, "wb") as f:
            pickle.dump(scene_paths, f)

    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = {
        k: np.asarray(v, np.float32)
        for k, v in np.load(COLOR_FIXTURE).items()
    }
    init = det.init_params(jax.random.PRNGKey(0))
    for k, v in init.items():
        params.setdefault(k, np.asarray(v))
    si = SceneInference(det, cfg)

    fl = os.path.join(BENCH_COLOR_DIR, "scenes.txt")
    with open(fl, "w") as f:
        f.write("".join(p + "\n" for p in scene_paths))
    ds = SceneDataset(fl, "scene", cfg)
    scenes = []
    for i in range(len(ds)):
        s = ds[i]
        scenes.append(
            (
                s.data,
                {
                    "images": s.images,
                    "depths": s.depths,
                    "poses": s.poses,
                    "world_to_grid": s.world_to_grid,
                },
            )
        )

    # warmup: compile + count detections
    n_det, n_views = 0, 0
    for data, frames in scenes:
        out, masks = si.infer(params, data, frames=frames)
        n_det += len(out["pred_box"])
        n_views += frames["images"].shape[0]

    def one_pass():
        stream = [
            (d.copy(), dict(f)) for _ in range(2) for d, f in scenes
        ]
        t0 = time.perf_counter()
        si.prefetch_scene(stream[0][0])
        si.prefetch_frames(params, stream[0][1], stream[0][0].shape[:3])
        for j, (d, f) in enumerate(stream):
            if j + 1 < len(stream):
                si.prefetch_scene(stream[j + 1][0])
                si.prefetch_frames(
                    params, stream[j + 1][1], stream[j + 1][0].shape[:3]
                )
            out, masks = si.infer(params, d, frames=f)
            assert len(masks) == len(out["pred_box"])
        return (time.perf_counter() - t0) / len(stream)

    # device-bound anchor: the fused color program (resident color volume
    # as operand); per-scene prep (ENet + volume build) is prefetch-hidden
    # in the stream, so the clean-pass bound is the fused compute
    d0, f0 = scenes[0]
    dev_s = si.device_seconds(params, d0, frames=f0, iters=6)
    dt, best, spread, n_degraded = stable_stream_passes(one_pass, dev_s)
    return {
        "scenes_per_min_color_masked": 60.0 / dt,
        "scenes_per_min_color_masked_best": 60.0 / best,
        "scenes_per_min_color_masked_device": 60.0 / dev_s,
        "color_scene_s_device": round(dev_s, 3),
        "color_degraded_passes": n_degraded,
        "color_scene_s_spread": [round(p, 3) for p in spread],
        "color_detections": int(round(n_det / len(scenes))),
        "color_views_per_scene": int(round(n_views / len(scenes))),
        "color_fused": bool(si._last_fused),
    }


def bench_train(jax, jnp):
    """Train-step s/iter for the two shipped workloads (VERDICT r4 #6).

    The reference's published schedule is ~400k train steps
    (README.md:177-202) — training is half the workload, so a train-step
    regression must be driver-visible. Two configs, matching BENCH_NOTES
    "Training": geometry-only chunks (batch 8) and the FULL color config
    (5-view ENet + on-device projection + RPN/class/mask losses, batch 4),
    both bf16, full 96x48x96 chunks, one jitted program per step. Timed as
    a short stream of sequential steps with carried state (the production
    shape); reported as s/iter per *chunk batch*, plus chunks/s to make
    cross-batch comparison direct.
    """
    from __graft_entry__ import _scannet_cfg
    from tpu3dsis.models import Detector
    from tpu3dsis.train.trainstep import TrainState, build_train_step

    rng = np.random.RandomState(7)
    shape = (96, 48, 96)

    def make_batch(n, cfg, color=False):
        max_gt = int(cfg.TPU_MAX_GT)
        gt = np.full((n, max_gt, 7), -1e4, np.float32)
        gt[..., 3:6] = gt[..., :3] + 1.0
        gt[..., 6] = 0.0
        valid = np.zeros((n, max_gt), bool)
        canvas = np.zeros((n, *shape), np.float32)
        for i in range(n):
            for j in range(4):
                x0 = rng.randint(8, shape[0] - 22)
                y0 = rng.randint(4, shape[1] - 14)
                z0 = rng.randint(8, shape[2] - 22)
                sx, sy, sz = rng.randint(6, 14, 3)
                gt[i, j] = [x0, y0, z0, x0 + sx, y0 + sy, z0 + sz,
                            3 + (j % 4) * 4]
                valid[i, j] = True
                canvas[i, x0 : x0 + sx, y0 : y0 + sy, z0 : z0 + sz] = 1.0
        batch = {
            "data": rng.randn(n, *shape, 2).astype(np.float32),
            "gt_box": gt,
            "gt_valid": valid,
            "mask_canvas": canvas,
        }
        if color:
            v = int(cfg.NUM_IMAGES)
            w_img, h_img = cfg.IMAGE_SHAPE
            w_d, h_d = cfg.DEPTH_SHAPE
            batch["images"] = rng.randint(
                0, 255, (n, v, h_img, w_img, 3)
            ).astype(np.float32) / 255.0
            batch["depths"] = rng.uniform(
                0.4, 4.0, (n, v, h_d, w_d)
            ).astype(np.float32)
            poses = np.tile(np.eye(4, dtype=np.float32), (n, v, 1, 1))
            poses[..., 2, 3] = -1.0  # camera 1 m in front of the grid
            batch["poses"] = poses
            batch["view_valid"] = np.ones((n, v), bool)
            vs = float(cfg.VOXEL_SIZE)
            w2g = np.diag([1 / vs] * 3 + [1.0]).astype(np.float32)
            w2g[:3, 3] = [shape[0] / 2, 0.0, shape[2] / 2]
            batch["world_to_grid"] = np.tile(w2g, (n, 1, 1))
        return batch

    def run_once(cfg, n, color, iters=3):
        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = det.init_params(jax.random.PRNGKey(0))
        opt_init, step = build_train_step(det, cfg, shape)
        state = TrainState(params=params, opt=opt_init(params))
        batch = {
            k: jnp.asarray(v) for k, v in make_batch(n, cfg, color).items()
        }
        key = jax.random.PRNGKey(1)
        state, m = step(state, batch, key)  # compile
        jax.block_until_ready(state.params)
        assert bool(m["step_finite"]), "non-finite bench train step"
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            state, _ = step(state, batch, jax.random.fold_in(key, i))
            jax.block_until_ready(state.params)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        return dt, n / dt

    def run(cfg, batches, color):
        # the mask-FCN activations dominate train-step HBM; the full-canvas
        # step OOMs one v5e chip above batch ~4 (measured 19.4 G / 15.75 G
        # at batch 8), so step the batch down on RESOURCE_EXHAUSTED and
        # report the batch that fit — a regression that shrinks the
        # fitting batch is itself driver-visible this way
        err = None
        for n in batches:
            try:
                dt, rate = run_once(cfg, n, color)
            except Exception as e:  # HBM OOM surfaces as JaxRuntimeError
                if "RESOURCE_EXHAUSTED" not in str(e) and (
                    "memory" not in str(e).lower()
                ):
                    raise
                err = e
                continue
            if dt > 30.0 and n > batches[-1]:
                # a step that compiles but runs 50x its expected time is
                # HBM oversubscription paging through the host tunnel
                # (measured: color batch 2 at 165 s/iter vs batch 1 at
                # ~0.7) — treat like OOM and step the batch down
                continue
            return n, dt, rate
        raise err or RuntimeError("all bench batches oversubscribed")

    cfg = _scannet_cfg()
    cfg.TPU_COMPUTE_DTYPE = "bfloat16"
    # windowed mask crops: exact for boxes <= 3 m (BENCH_NOTES Training),
    # and the config every large-batch training run would use
    cfg.TPU_MASK_CANVAS = [64, 48, 64]
    g_n, g_it, g_rate = run(cfg, (8, 4, 2), color=False)

    ccfg = _scannet_cfg()
    ccfg.TPU_COMPUTE_DTYPE = "bfloat16"
    ccfg.TPU_MASK_CANVAS = [64, 48, 64]
    ccfg.USE_IMAGES = True
    ccfg.USE_IMAGES_GT = False
    ccfg.NUM_IMAGES = 5
    # every shipped config freezes ENet (FIX_ENET; reference enet.py:699 +
    # network.py:80-83 run it in eval) — bench the shipped workload
    c_n, c_it, c_rate = run(ccfg, (4, 2, 1), color=True)

    return {
        "train_geometry_s_per_iter": round(g_it, 3),
        "train_geometry_batch": g_n,
        "train_geometry_chunks_per_s": round(g_rate, 2),
        "train_color5v_s_per_iter": round(c_it, 3),
        "train_color5v_batch": c_n,
        "train_color5v_chunks_per_s": round(c_rate, 2),
    }


def main():
    import jax

    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    chunks_per_s, chunk_extras = bench_chunks(jax, jnp)
    scene = bench_masked_scene(jax)
    color = None
    try:
        color = bench_color_scene(jax)
    except Exception as e:  # color bench must never mask the core metric
        color = {"color_bench_error": f"{type(e).__name__}: {e}"[:200]}
    try:
        train = bench_train(jax, jnp)
    except Exception as e:  # train bench must never mask the core metric
        train = {"train_bench_error": f"{type(e).__name__}: {e}"[:200]}

    base = measured_baseline()
    ref_cpu = base["ref_cpu_chunks_per_s"] if base else None
    out = {
        "metric": "chunk_detection_inference_throughput",
        "value": round(chunks_per_s, 2),
        "unit": "chunks/s",
        "vs_baseline": round(chunks_per_s / ref_cpu, 2) if ref_cpu else None,
        "baseline_provenance": (
            "measured: reference torch TEST pipeline on this host's CPU "
            "(single core, no CUDA; BASELINE_MEASURED.json)"
            if ref_cpu
            else "no measured baseline file; see bench.py header"
        ),
        "ref_cpu_chunks_per_s_measured": round(ref_cpu, 2) if ref_cpu else None,
        "vs_1080ti_estimate": round(
            chunks_per_s / REFERENCE_CHUNKS_PER_S_ESTIMATE, 2
        ),
    }
    out.update(chunk_extras)
    if scene:
        out["scenes_per_min_masked"] = round(scene["scenes_per_min_masked"], 2)
        out["scenes_per_min_masked_best"] = round(
            scene["scenes_per_min_masked_best"], 2
        )
        out["scene_detections"] = scene["detections"]
        out["scene_s"] = round(scene["scene_s"], 3)
        out["scene_s_spread"] = scene["scene_s_spread"]
    if color:
        for k, v in color.items():
            out[k] = round(v, 2) if isinstance(v, float) else v
    if train:
        out.update(train)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
