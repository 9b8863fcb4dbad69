"""Self-contained golden-path demo on synthetic data.

datagen (TSDF fusion -> .scene) -> whole-scene tiled inference -> artifact
export -> PLY visualization. Run: python tools/demo.py --out example_result
"""

import argparse
import os
import pathlib
import sys

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="example_result")
    p.add_argument("--checkpoint", default=None, help=".npz or .pth")
    args = p.parse_args()

    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu3dsis.config import cfg_from_file, finalize_config
    from tpu3dsis.datagen import scene_sampler as ss
    from tpu3dsis.datagen import tsdf_fusion as tf
    from tpu3dsis.infer.driver import run_scenes
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.models.detector import Detector
    from tpu3dsis.tools.visualization import visualize_result
    from tpu3dsis.train import checkpoint as ckpt

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(0)

    # --- 1. datagen: fuse a synthetic scene, export a .scene file ---------
    print("[demo] fusing synthetic scene ...")
    voxel = 0.046875
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 289.0
    K[0, 2], K[1, 2] = 160, 120
    frames = []
    for step in range(4):
        pose = np.eye(4)
        pose[0, 3] = 0.5 + step * 0.8
        pose[2, 3] = -1.2
        depth = np.full((240, 320), 1.6, np.float32)
        depth[80:160, 100:220] = 1.2  # a box-shaped object
        label = np.zeros((240, 320), np.uint8)
        label[80:160, 100:220] = 5  # chair
        inst = ((label > 0) * 2).astype(np.uint8)
        frames.append((K, pose, depth, label, inst))
    grid, w2g = tf.fuse_scene(
        frames, ((0.0, -0.8, -0.4), (3.5, 0.8, 0.8)), voxel_size=voxel
    )
    scsdf = os.path.join(args.out, "demo.scsdf")
    tf.save_scsdf(scsdf, grid.sdf, voxel, (0.0, -0.8, -0.4), (3.5, 0.8, 0.8))
    # instance boxes from the fused instance volume
    occ = np.array(np.nonzero(grid.instance == 2))
    lo, hi = occ.min(axis=1), occ.max(axis=1) + 1
    mask, _, _ = grid.instance_mask_for_aabb(np.concatenate([lo, hi]), 2)
    aabbs = os.path.join(args.out, "demo.aabbs")
    tf.save_aabbs(aabbs, np.concatenate([lo, hi])[None], np.array([5]), [mask])
    scene_file = os.path.join(args.out, "demo__scene.scene")
    ss.process_scene(scsdf, aabbs, scene_file)
    print(f"[demo] wrote {scene_file}")
    # debug isosurface of the fused TSDF (reference s_bDebugOut equivalent)
    from tpu3dsis.datagen.marching_tets import grid_to_mesh
    from tpu3dsis.tools.ply import write_ply

    mverts, mfaces = grid_to_mesh(grid)
    write_ply(os.path.join(args.out, "demo_fused.ply"), mverts, faces=mfaces)
    print(f"[demo] fused-TSDF mesh: {os.path.join(args.out, 'demo_fused.ply')}")

    # --- 2. inference + artifact export ------------------------------------
    cfg = cfg_from_file("experiments/cfgs/ScanNet/benchmark.yml")
    finalize_config(cfg)
    cfg.USE_IMAGES = False
    cfg.TEST_SAVE_DIR = os.path.join(args.out, "test")
    cfg.CLASS_THRESH = 0.05
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    filelist = os.path.join(args.out, "scenes.txt")
    with open(filelist, "w") as f:
        f.write(scene_file + "\n")
    cfg.TEST_FILELIST = filelist

    detector = Detector(cfg, anchor_dir="experiments/anchors")
    params = detector.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        pre = (
            ckpt.load_pth(args.checkpoint)
            if args.checkpoint.endswith(".pth")
            else ckpt.load_snapshot(args.checkpoint)[0]
        )
        params = ckpt.partial_update(params, pre, cfg)
    params = {k: np.asarray(v) for k, v in params.items()}
    dataset = SceneDataset(filelist, "scene", cfg)
    print("[demo] running whole-scene tiled inference ...")
    results = run_scenes(cfg, params, "test", detector=detector, dataset=dataset)

    # --- 3. visualization ---------------------------------------------------
    scene_dir = os.path.join(
        cfg.TEST_SAVE_DIR, os.path.basename(scene_file)[:12]
    )
    vis_dir = os.path.join(args.out, "vis")
    visualize_result(scene_dir, vis_dir)
    print(f"[demo] artifacts: {scene_dir}")
    print(f"[demo] plys:      {vis_dir}")
    print(f"[demo] metrics:   {results}")


if __name__ == "__main__":
    main()
