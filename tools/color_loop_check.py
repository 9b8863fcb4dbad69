"""Closed color loop at reference scale: generated data -> ENet color
training -> tiled color scene eval -> vox2mesh -> official evaluator.

VERDICT r2 next-step #6: prove the framework's own datagen (shaded-RGB
virtual scans), color training, resident-volume scene inference, and the
benchmark-export stack compose, with AP@0.5 > 0 on held-out generated
scenes. Also saves the trained params (ENet included) as the fixture
``bench.py::bench_color_scene`` uses for realistic color-scene throughput.

Run on the TPU host:  python tools/color_loop_check.py --steps 800
Scenes cache under --out; delete the dir to regenerate.
"""

import argparse
import os
import pathlib
import pickle
import sys

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd

W, H = 328, 256  # rendered frame resolution (reference IMAGE_SHAPE)


def build_cfg(base_path, steps=800, lr=0.003):
    from tpu3dsis.config import cfg_from_file, finalize_config
    from tpu3dsis.datagen.synthetic_color import scaled_intrinsic
    from tpu3dsis.datagen.virtual_scan import intrinsic_from_fov

    cfg = cfg_from_file("experiments/cfgs/ScanNet/benchmark.yml")
    finalize_config(cfg)
    cfg.BASE_IMAGE_PATH = base_path
    cfg.INTRINSIC = scaled_intrinsic(
        intrinsic_from_fov(W, H), (W, H), tuple(cfg.DEPTH_SHAPE)
    ).tolist()
    cfg.PRETRAINED_ENET_PATH = ""
    cfg.FIX_ENET = False  # no pretrained ENet: train it
    cfg.FIX_BACKBONE = cfg.FIX_RPN = cfg.FIX_CLASS = False
    cfg.LEARNING_RATE = lr
    cfg.STEPSIZE = [int(steps * 0.7)]
    cfg.VAL_TIME = 0.0
    cfg.DISPLAY = 50
    cfg.KEEP_THRESH = 0.0
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 512
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 64
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.CLASS_THRESH = 0.3
    cfg.ROI_THRESH = 0.5
    cfg.MAP_THRESH = 0.5
    cfg.NUM_IMAGES = 5
    cfg.TPU_MAX_MASK_ROIS = 4
    cfg.TPU_DATA_PARALLEL = 1
    cfg.TPU_COMPUTE_DTYPE = "bfloat16"
    return cfg


def generate_data(out_root, n_train=5, n_eval=2, seed=11, max_views=64):
    """Generate (and cache) train/eval scenes; returns (chunk_paths,
    eval_scene_records)."""
    import numpy as np

    from tpu3dsis.datagen.synthetic_color import generate_scene

    os.makedirs(out_root, exist_ok=True)
    manifest = os.path.join(out_root, "manifest.pkl")
    if os.path.exists(manifest):
        with open(manifest, "rb") as f:
            return pickle.load(f)

    rng = np.random.RandomState(seed)
    chunk_paths = []
    eval_records = []
    for i in range(n_train + n_eval):
        name = f"synth{i:02d}"
        print(f"[color-loop] generating scene {name} ...", flush=True)
        out = generate_scene(
            rng, out_root, name,
            extent_m=(6.0, 2.4, 6.0), n_objects=12,
            voxel_size=0.046875, image_wh=(W, H), max_views=max_views,
            traj_wh=(64, 48), sample_factor=48, num_nearest=5,
            chunks=i < n_train,
        )
        if i < n_train:
            chunk_paths.extend(out["chunk_paths"])
        else:
            eval_records.append(
                {
                    "scene_path": out["scene_path"],
                    "frames_dir": out["frames_dir"],
                    "scsdf": out["scsdf"],
                    "world_to_grid": out["world_to_grid"],
                    "label": out["grid"].label,
                    "instance": out["grid"].instance,
                }
            )
    data = (chunk_paths, eval_records)
    with open(manifest, "wb") as f:
        pickle.dump(data, f)
    return data


def benchmark_eval(rec, pred_dir, tmp_dir):
    """vox2mesh + official evaluator for one generated scene."""
    import numpy as np

    from tpu3dsis.datagen.marching_tets import extract_isosurface
    from tpu3dsis.datagen.tsdf_fusion import load_scsdf
    from tpu3dsis.eval import scannet_benchmark as sb
    from tpu3dsis.tools.ply import write_ply

    scene_id = os.path.basename(rec["scene_path"])[:12]
    sdf_grid, _, _, _ = load_scsdf(rec["scsdf"])
    verts_grid, faces = extract_isosurface(sdf_grid, band=2.0)
    vi = np.clip(
        np.floor(verts_grid).astype(int), 0,
        np.asarray(rec["label"].shape) - 1,
    )
    vlabel = rec["label"][vi[:, 0], vi[:, 1], vi[:, 2]].astype(np.int64)
    vinst = rec["instance"][vi[:, 0], vi[:, 1], vi[:, 2]].astype(np.int64)
    gt_ids = np.where(vinst > 0, vlabel * 1000 + vinst, vlabel)
    verts_world = (
        np.linalg.inv(rec["world_to_grid"])
        @ np.concatenate([verts_grid, np.ones((len(verts_grid), 1))], 1).T
    ).T[:, :3]
    mesh_file = os.path.join(tmp_dir, f"{scene_id}.ply")
    write_ply(mesh_file, verts_world.astype(np.float32), faces=faces.tolist())

    bench_dir = os.path.join(tmp_dir, f"bench_{scene_id}")
    sb.export_scene(
        pred_dir, mesh_file,
        os.path.join(rec["frames_dir"], "world2grid.txt"),
        bench_dir, scene_id,
    )
    sb.remap_benchmark_labels(bench_dir)
    gt_file = os.path.join(tmp_dir, f"gt_{scene_id}.txt")
    np.savetxt(gt_file, gt_ids, fmt="%d")
    return os.path.join(bench_dir, f"{scene_id}.txt"), gt_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--lr", type=float, default=0.003)
    p.add_argument("--out", default="data/color_loop")
    p.add_argument("--fixture",
                   default="tests/fixtures/color_loop_params.npz")
    p.add_argument("--load", default="", help="reuse a saved fixture")
    p.add_argument("--max-views", type=int, default=64)
    args = p.parse_args()

    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tpu3dsis.eval import DetectionMAP, scannet_benchmark as sb
    from tpu3dsis.infer.driver import run_scenes
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.models import Detector
    from tpu3dsis.train.loop import Trainer

    frames_root = os.path.join(args.out, "frames_square")
    cfg = build_cfg(frames_root, args.steps, args.lr)
    chunk_paths, eval_records = generate_data(
        args.out, max_views=args.max_views
    )
    print(f"[color-loop] {len(chunk_paths)} train chunks, "
          f"{len(eval_records)} eval scenes")

    filelist = os.path.join(args.out, "train.txt")
    with open(filelist, "w") as f:
        f.write("".join(p_ + "\n" for p_ in chunk_paths))

    if args.load:
        det = Detector(cfg, anchor_dir="experiments/anchors")
        params = {
            k: np.asarray(v, np.float32)
            for k, v in np.load(args.load).items()
        }
    else:
        cfg.TRAIN_FILELIST = filelist
        cfg.VAL_FILELIST = filelist
        cfg.TRAINVAL_FILELIST = ""
        trainer = Trainer(cfg, os.path.join(args.out, "run"))
        trainer.restore_or_init(seed=0)
        state, step = trainer.train(epochs=100_000, max_steps=args.steps)
        params = {k: np.asarray(v) for k, v in state.params.items()}
        det = trainer.detector
        os.makedirs(os.path.dirname(args.fixture), exist_ok=True)
        np.savez_compressed(
            args.fixture,
            **{k: v.astype(np.float16) for k, v in params.items()},
        )
        from tpu3dsis.utils.provenance import write_provenance

        write_provenance(
            args.fixture,
            command=(f"python tools/color_loop_check.py --steps {args.steps}"
                     f" --lr {args.lr} --max-views {args.max_views}"),
            cfg=cfg,
            args={"steps": args.steps, "lr": args.lr,
                  "max_views": args.max_views, "seed": 0},
        )
        print(f"[color-loop] fixture saved: {args.fixture}")

    # --- eval: tiled color scene inference + chunk-style mAP --------------
    cfg_t = cfg.copy()
    cfg_t.MODE = "test"
    cfg_t.TEST_SAVE_DIR = os.path.join(args.out, "res")
    sl = os.path.join(args.out, "scenes.txt")
    with open(sl, "w") as f:
        f.write("".join(r["scene_path"] + "\n" for r in eval_records))
    cfg_t.TEST_FILELIST = sl
    sds = SceneDataset(sl, "scene", cfg_t)
    results = run_scenes(cfg_t, params, "test", detector=det, dataset=sds)
    print(f"[color-loop] chunk-style eval: {results}")

    # --- official benchmark on the generated meshes -----------------------
    pred_files, gt_files = [], []
    for rec in eval_records:
        scene_id = os.path.basename(rec["scene_path"])[:12]
        pred_dir = os.path.join(cfg_t.TEST_SAVE_DIR, scene_id)
        pf, gf = benchmark_eval(rec, pred_dir, args.out)
        pred_files.append(pf)
        gt_files.append(gf)
    avgs = sb.evaluate(pred_files, gt_files, verbose=True)
    ap50 = float(avgs["all_ap_50%"])
    ap25 = float(avgs["all_ap_25%"])
    print(f"[color-loop] official AP@0.5={ap50:.4f} AP@0.25={ap25:.4f}")
    ok = np.isfinite(ap50) and ap50 > 0
    print("[color-loop]", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
