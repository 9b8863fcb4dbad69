"""Full benchmark-workflow rehearsal with a trained net on synthetic data.

Chain: trained checkpoint -> run_scenes (tiled detection + masks, artifact
export) -> vox2mesh (mesh-vertex instance format) -> proj_label remap ->
official ScanNet evaluator. Passes when AP@0.5 > 0 — i.e. every stage of
the reference's example.sh workflow works end-to-end on detections that
mean something.

Run after tools/overfit_check.py has produced data/overfit/run checkpoints.
"""

import os
import sys
import pathlib

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd


def main():
    import numpy as np

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tpu3dsis.config import cfg_from_file, finalize_config
    from tpu3dsis.eval import scannet_benchmark as sb
    from tpu3dsis.infer.driver import run_scenes
    from tpu3dsis.io.dataset import SceneDataset
    from tpu3dsis.models import Detector
    from tpu3dsis.tools.ply import write_ply
    from tpu3dsis.train import checkpoint as ckpt

    out_root = "data/rehearsal"
    os.makedirs(out_root, exist_ok=True)

    cfg = cfg_from_file("experiments/cfgs/ScanNet/benchmark.yml")
    finalize_config(cfg)
    cfg.USE_IMAGES = False
    cfg.KEEP_THRESH = 0.0
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.CLASS_THRESH = 0.3
    cfg.TEST_SAVE_DIR = os.path.join(out_root, "test")

    # scenes = the overfit training chunks renamed as 12-char scene ids
    src_list = open("data/overfit/train.txt").read().split()
    scenes = []
    for i, src in enumerate(src_list[:2]):
        scene_id = f"scene{i:04d}_00"
        dst = os.path.join(out_root, scene_id + ".scene")
        if not os.path.exists(dst):
            os.link(src, dst)
        scenes.append((scene_id, dst))
    filelist = os.path.join(out_root, "scenes.txt")
    with open(filelist, "w") as f:
        f.write("".join(p + "\n" for _, p in scenes))
    cfg.TEST_FILELIST = filelist

    snaps = sorted(
        os.listdir("data/overfit/run/checkpoints"),
        key=lambda s: int(s.split("_")[1].split(".")[0]),
    )
    params, _, step = ckpt.load_snapshot(
        os.path.join("data/overfit/run/checkpoints", snaps[-1])
    )
    print(f"[rehearsal] checkpoint step {step}")

    detector = Detector(cfg, anchor_dir="experiments/anchors")
    ds = SceneDataset(filelist, "scene", cfg)
    results = run_scenes(cfg, params, "test", detector=detector, dataset=ds)
    print(f"[rehearsal] chunk-level: {results}")

    # --- mesh vertices + gt ids per scene (from the known gt) -------------
    bench_dir = os.path.join(out_root, "benchmark")
    gt_dir = os.path.join(out_root, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    pred_files, gt_files = [], []
    for i, (scene_id, path) in enumerate(scenes):
        sample = ds[i]
        verts, gt_ids = [], []
        for k, (box, mask) in enumerate(zip(sample.gt_box, sample.gt_mask)):
            x0, y0, z0 = [int(v) for v in box[:3]]
            xs, ys, zs = np.nonzero(mask)
            for x, y, z in zip(xs[::2], ys[::2], zs[::2]):  # subsample
                verts.append([x0 + x + 0.5, y0 + y + 0.5, z0 + z + 0.5])
                gt_ids.append(int(box[6]) * 1000 + k + 1)
        # background verts
        rngv = np.random.RandomState(i)
        for _ in range(150):
            verts.append(rngv.uniform(0, 10, 3).tolist())
            gt_ids.append(0)
        verts = np.asarray(verts, np.float32)
        mesh_file = os.path.join(out_root, scene_id + "_vh_clean_2.ply")
        write_ply(mesh_file, verts)
        gt_file = os.path.join(gt_dir, scene_id + ".txt")
        np.savetxt(gt_file, np.asarray(gt_ids, np.int64), fmt="%d")

        # world2grid with the [10,16,10] padding the exporter subtracts
        w2g_file = os.path.join(out_root, scene_id + "_world2grid.txt")
        m = np.eye(4)
        m[0, 3], m[1, 3], m[2, 3] = 10, 16, 10
        np.savetxt(w2g_file, m, fmt="%.6f")

        sb.export_scene(
            os.path.join(cfg.TEST_SAVE_DIR, scene_id[:12]),
            mesh_file, w2g_file, bench_dir, scene_id,
        )
        pred_files.append(os.path.join(bench_dir, scene_id + ".txt"))
        gt_files.append(gt_file)

    avgs = sb.evaluate(pred_files, gt_files, verbose=False)
    print(
        f"[rehearsal] benchmark AP {avgs['all_ap']:.3f} "
        f"AP50 {avgs['all_ap_50%']:.3f} AP25 {avgs['all_ap_25%']:.3f}"
    )
    ok = avgs["all_ap_25%"] > 0
    print("[rehearsal]", "PASS" if ok else "FAIL", "(AP25 > 0)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
