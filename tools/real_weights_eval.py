"""One-command real-weights readiness (VERDICT r2 next-step #8).

The moment the released 3D-SIS checkpoints and real ScanNet data land in
this environment, this single command validates and evaluates them end to
end (reference workflow: ``README.md:59-65,146-156``, ``example.sh:23-34``):

  python tools/real_weights_eval.py \
      --pth  checkpoints/step_1205541.pth \
      --enet checkpoints/scannetv2_enet.pth \
      --scene-filelist experiments/filelists/ScanNet/v2/test.txt \
      --frames /data/frames_square [--benchmark-export out/benchmark]

Stages (each prints PASS/FAIL; any failure exits non-zero):
  1. convert  — .pth -> flat param dict (``train/checkpoint.py``), strict
               coverage report: every model parameter must be filled by the
               checkpoint (ENet from --enet).
  2. parity   — the SAME weights pushed through the reference's own torch
               TEST branch (tools/refnet.py) and ours on a fixed chunk;
               classifier probs / box deltas / proposal sets must agree to
               float tolerance. Color configs run the composed color branch
               (feature-image isolation; ENet itself is compared directly
               on a random image when --enet is given). Skipped when
               /root/reference or torch is unavailable.
  3. eval     — tiled whole-scene inference over --scene-filelist
               (``infer/driver.run_scenes``): chunk-style mAP@MAP_THRESH,
               plus the official benchmark export when --benchmark-export
               is set (vox2mesh inputs written per scene).

``--dry-run`` exercises the identical code path in CI with no external
data: the reference network's RANDOM state_dict is saved as a real .pth,
converted, parity-checked, and evaluated on a synthetic scene.
"""

import argparse
import os
import pathlib
import sys
import tempfile

os.chdir(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())  # tools run from any cwd
sys.path.insert(0, "tools")

CHUNK_SHAPE = (96, 48, 96)


def _status(name, ok, detail=""):
    print(f"[real-weights] {name}: {'PASS' if ok else 'FAIL'} {detail}",
          flush=True)
    return ok


def make_chunk(seed=3):
    """Synthetic box-scene chunk (the full-net parity fixture geometry)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    sdf = np.full(CHUNK_SHAPE, 8.0, np.float32)
    for x0, y0, z0, sx, sy, sz in (
        (12, 6, 14, 14, 12, 14),
        (50, 4, 20, 20, 6, 20),
        (30, 8, 60, 53, 22, 24),
    ):
        sdf[x0:x0 + sx, y0:y0 + sy, z0:z0 + sz] = 0.3
        sdf[x0 + 1:x0 + sx - 1, y0 + 1:y0 + sy - 1, z0 + 1:z0 + sz - 1] = -2.0
    sdf += rng.randn(*sdf.shape).astype(np.float32) * 0.01
    return sdf


def stage_convert(args, cfg, det):
    """-> (params, ok): load + convert + coverage check."""
    import jax
    import numpy as np

    from tpu3dsis.train import checkpoint as ckpt

    model = {
        k: np.asarray(v)
        for k, v in det.init_params(jax.random.PRNGKey(0)).items()
    }
    pre = ckpt.load_pth(args.pth)
    if args.enet:
        import torch

        from tpu3dsis.models.enet2d import torch_enet_state_dict_to_params

        sd = torch.load(args.enet, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        pre.update(torch_enet_state_dict_to_params(sd))
    filled, missing = [], []
    for k in model:
        if k in pre:
            if model[k].shape != pre[k].shape:
                return None, _status(
                    "convert", False,
                    f"shape mismatch {k}: {model[k].shape} vs {pre[k].shape}",
                )
            model[k] = np.asarray(pre[k], np.float32)
            filled.append(k)
        else:
            missing.append(k)
    extra = sorted(k for k in pre if k not in model)
    # ENet params live under enet.* only when the config trains color
    missing = [m for m in missing if args.enet or not m.startswith("enet")]
    ok = not missing
    detail = (f"{len(filled)}/{len(model)} params from checkpoint"
              + (f"; {len(extra)} unused ckpt tensors" if extra else ""))
    if missing:
        detail += f"; MISSING: {missing[:5]}{'...' if len(missing) > 5 else ''}"
    _status("convert", ok, detail)
    return model, ok


def stage_parity(args, cfg, det, params):
    """Same weights through the reference's torch TEST branch vs ours."""
    import numpy as np

    try:
        import torch
    except ImportError:
        print("[real-weights] parity: SKIP (torch unavailable)")
        return True
    if not os.path.isdir("/root/reference/lib"):
        print("[real-weights] parity: SKIP (reference checkout unavailable)")
        return True

    import jax
    import jax.numpy as jnp

    import refnet

    from tpu3dsis.models.detector import build_inference_fn
    from tpu3dsis.models.rpn import select_proposals  # noqa: F401 (compile)
    from tpu3dsis.train.checkpoint import params_to_torch_state_dict

    use_images = bool(cfg.USE_IMAGES)
    updates = {"USE_IMAGES": use_images}
    if use_images:
        # feature-image isolation (USE_IMAGES_GT): the composed color branch
        # minus ENet; ENet compared directly below
        updates.update(
            USE_IMAGES_GT=True,
            NUM_IMAGE_CHANNELS=int(cfg.NUM_IMAGE_CHANNELS),
            IMAGE_SHAPE=list(cfg.DEPTH_SHAPE),
            DEPTH_SHAPE=list(cfg.DEPTH_SHAPE),
            INTRINSIC=[list(r) for r in np.asarray(cfg.INTRINSIC)],
            VOXEL_SIZE=float(cfg.VOXEL_SIZE),
        )
    network_mod, backbones_mod, rc = refnet.load_reference(
        updates, cfg_file=args.cfg, num_classes=int(cfg.NUM_CLASSES)
    )
    # align the proposal-stage knobs with OUR (possibly dry-run-reduced)
    # config — identical values on real runs, required for count parity
    rc.TEST.RPN_PRE_NMS_TOP_N = int(cfg.TEST.RPN_PRE_NMS_TOP_N)
    rc.TEST.RPN_POST_NMS_TOP_N = int(cfg.TEST.RPN_POST_NMS_TOP_N)
    rc.TEST.RPN_NMS_THRESH = float(cfg.TEST.RPN_NMS_THRESH)
    net = getattr(backbones_mod, str(cfg.NET))()
    net.init_modules()
    net.eval()
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(
            {k: v for k, v in params.items() if not k.startswith("enet")}
        ).items()
    }
    missing, unexpected = net.load_state_dict(sd, strict=False)
    if missing:
        return _status("parity", False, f"reference lacks keys: {missing[:4]}")

    sdf = make_chunk()
    trunc = np.clip(sdf, -3, 3)
    enc = np.stack(
        [np.abs(trunc), (sdf > -1).astype(np.float32)], axis=-1
    ).astype(np.float32)[None]

    frames = None
    blobs_images = None
    proj3d = proj2d = None
    if use_images:
        from lib.layer_utils.projection import ProjectionHelper

        w, h = (int(x) for x in cfg.DEPTH_SHAPE)
        v = 3
        rng = np.random.RandomState(11)
        feats = rng.randn(v, h, w, int(cfg.NUM_IMAGE_CHANNELS)).astype(
            np.float32
        )
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        ramp = (1.0 + 2.4 * (xx + yy) / float(w + h - 2)).astype(np.float32)
        depths = np.stack([ramp + 0.15 * i for i in range(v)])
        poses = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
        vs = float(cfg.VOXEL_SIZE)
        poses[:, 0, 3] = CHUNK_SHAPE[0] * vs / 2
        poses[:, 1, 3] = CHUNK_SHAPE[1] * vs / 2
        poses[:, 2, 3] = -1.0
        poses[1, 0, 3] += 0.4
        poses[2, 0, 3] -= 0.4
        w2g = np.diag([1 / vs, 1 / vs, 1 / vs, 1.0]).astype(np.float32)
        helper = ProjectionHelper(
            updates["INTRINSIC"], float(cfg.PROJ_DEPTH_MIN),
            float(cfg.PROJ_DEPTH_MAX), [w, h], CHUNK_SHAPE, vs,
        )
        proj = [
            refnet.compute_projection_torch04(
                helper, torch.from_numpy(depths[i]),
                torch.from_numpy(poses[i]), torch.from_numpy(w2g),
            )
            for i in range(v)
        ]
        if any(p is None for p in proj):
            return _status("parity", False, "a parity view projected nothing")
        proj3d = torch.stack([p[0] for p in proj])
        proj2d = torch.stack([p[1] for p in proj])
        blobs_images = torch.from_numpy(
            np.ascontiguousarray(np.moveaxis(feats, -1, 1))
        )
        frames = {
            "feats2d": jnp.asarray(feats),  # bypass ENet: feature images
            "depths": jnp.asarray(depths),
            "poses": jnp.asarray(poses),
            "world_to_grid": jnp.asarray(w2g),
        }

    blobs = {
        "id": ["parity"],
        "data": torch.from_numpy(enc).permute(0, 4, 1, 2, 3).contiguous(),
        "gt_box": [torch.zeros(0, 7)],
        "gt_mask": None,
        "nearest_images": {"images": [blobs_images]} if use_images else {},
        "proj_ind_3d": [proj3d] if use_images else None,
        "proj_ind_2d": [proj2d] if use_images else None,
    }
    um = rc.USE_MASK
    rc.USE_MASK = False  # decode parity below covers the shared trunk
    with torch.no_grad():
        net.forward(blobs, "TEST", killing_inds=[])
    rc.USE_MASK = um
    ref_rois = net._predictions["rois"][0].detach().numpy()
    ref_levels = (
        net._predictions["level_inds"][0].detach().numpy().reshape(-1)
    )
    ref_cls_prob = net._predictions["cls_prob"].detach().numpy()
    ref_bbox = net._predictions["bbox_pred"].detach().numpy()

    infer = build_inference_fn(det, cfg, CHUNK_SHAPE, mode="TEST")
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    ours = infer(jparams, jnp.asarray(enc), frames)
    valid = np.asarray(ours["valid"])
    our_rois = np.asarray(ours["rois"])[valid]

    if use_images:
        imageft = det.color_projector.project(
            jparams, None, frames["depths"], frames["poses"],
            frames["world_to_grid"], CHUNK_SHAPE, feats=frames["feats2d"],
        )
        feats3d = det.features(
            jparams, jnp.asarray(enc), imageft[None].astype(jnp.float32)
        )
    else:
        feats3d = det.features(jparams, jnp.asarray(enc))
    _, cls_prob, _, bbox_pred = det.classify_rois(
        jparams, feats3d,
        jnp.asarray(ref_rois[:, :6].astype(np.float32)),
        jnp.asarray(ref_levels.astype(np.int32)),
    )

    ok = True
    if len(ref_rois) != len(our_rois):
        ok = _status(
            "parity", False,
            f"proposal counts differ: {len(ref_rois)} vs {len(our_rois)}",
        )
    else:
        used = np.zeros(len(our_rois), bool)
        worst = 0.0
        for rb in ref_rois[:, :6]:
            d = np.abs(our_rois - rb[None]).max(1)
            d[used] = 1e9
            j = int(np.argmin(d))
            worst = max(worst, float(d[j]))
            used[j] = True
        ok &= _status(
            "parity/proposals", worst < 1e-2, f"worst roi delta {worst:.2e}"
        )
    dp = float(np.abs(np.asarray(cls_prob) - ref_cls_prob).max())
    db = float(np.abs(np.asarray(bbox_pred) - ref_bbox).max())
    ok &= _status("parity/classifier", dp < 2e-3 and db < 2e-2,
                  f"|cls_prob| {dp:.2e} |bbox| {db:.2e}")

    if bool(cfg.USE_MASK):
        # mask head with the SAME converted weights (VERDICT r4 #3): the
        # reference re-runs mask_backbone over each final box's chunk crop
        # in eval mode and thresholds the predicted class's sigmoid
        # (trainval.py:868-906); ours is the PRODUCTION windowed mask path
        # (SceneInference.predict_masks — halo windows + region-masked FCN).
        # Deterministic boxes span all three window regimes: the small
        # canvas, one large window, and a multi-window split.
        from tpu3dsis.infer.tiling import SceneInference

        mask_boxes = np.array(
            [
                [12, 6, 14, 26, 18, 28],
                [30, 8, 60, 83, 30, 84],
                [10, 4, 10, 80, 20, 30],
            ],
            np.float32,
        )
        mask_cls = np.array([5, 7, 3], np.int32)
        net.mask_backbone.eval()
        ref_masks = []
        with torch.no_grad():
            for b, c_ in zip(mask_boxes.astype(int), mask_cls):
                crop = blobs["data"][
                    :, :, b[0]:b[3], b[1]:b[4], b[2]:b[5]
                ]
                # MASK_USE_IMAGES is False in every shipped config
                # (reference config.py:100, no yml overrides): imageft unused
                p = net.mask_backbone(crop, None)  # sigmoid in eval
                ref_masks.append(
                    (p[0, int(c_)].numpy() >= float(rc.MASK_THRESH))
                    .astype(np.uint8)
                )
        mcfg = cfg.copy()
        if args.dry_run:
            # smaller windows keep the CPU rehearsal fast; window planning
            # keeps the masks exact for boxes of any size vs canvas
            mcfg.TPU_MASK_CANVAS = [32, 32, 32]
        si = SceneInference(det, mcfg)
        ours_masks = si.predict_masks(
            jparams, np.asarray(enc[0]),
            {"pred_box": mask_boxes, "pred_class": mask_cls},
        )
        worst = 0.0
        npos = 0
        for rm, om in zip(ref_masks, ours_masks):
            worst = max(worst, float(np.mean(rm != om)))
            npos += int(rm.sum())
        # fp32 rehearsal: any mismatch beyond threshold-boundary noise fails
        ok &= _status(
            "parity/mask", worst <= 1e-3,
            f"worst voxel-mask mismatch fraction {worst:.2e} "
            f"({npos} ref-positive voxels)",
        )

    if args.enet:
        # released scannetv2_enet.pth through the reference's OWN converted
        # graph (lib/nets/enet.py) vs our JAX ENet with the converted params
        import importlib.util

        from tpu3dsis.models.enet2d import ENet2D, N_MODULES

        spec = importlib.util.spec_from_file_location(
            "ref_enet", "/root/reference/lib/nets/enet.py"
        )
        ref_enet = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_enet)
        loaded = torch.load(args.enet, map_location="cpu",
                            weights_only=False)
        if isinstance(loaded, torch.nn.Module):
            model = loaded
        else:
            model = ref_enet.create_enet(int(cfg.NUM_2D_CLASSES))
            model.load_state_dict(loaded)
        model.eval()
        x = torch.randn(
            1, 3, 256, 328, generator=torch.Generator().manual_seed(1)
        )
        with torch.no_grad():
            feat = x
            for i in range(N_MODULES - 1):
                feat = model[i](feat)
        enet = ENet2D(int(cfg.NUM_2D_CLASSES))
        ours2d = np.asarray(
            enet.features_for_3d(
                jparams, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            )
        )
        de = float(
            np.abs(ours2d - feat.numpy().transpose(0, 2, 3, 1)).max()
        )
        ok &= _status("parity/enet", de < 1e-2, f"|feat| {de:.2e}")
    return ok


def stage_eval(args, cfg, det, params):
    import numpy as np

    from tpu3dsis.infer.driver import run_scenes
    from tpu3dsis.io.dataset import SceneDataset

    cfg_t = cfg.copy()
    cfg_t.MODE = "test"
    cfg_t.TEST_FILELIST = args.scene_filelist
    cfg_t.TEST_SAVE_DIR = args.save_dir
    if args.frames:
        cfg_t.BASE_IMAGE_PATH = args.frames
    ds = SceneDataset(args.scene_filelist, "scene", cfg_t)
    results = run_scenes(
        cfg_t, params, "test", detector=det, dataset=ds,
        max_scenes=args.max_scenes,
    )
    print(f"[real-weights] eval results: {results}")
    ok = np.isfinite(float(results.get("mAP_CLASSIFICATION", np.nan)))
    _status("eval", ok, f"{len(ds)} scenes -> {args.save_dir}")
    if ok and args.benchmark_export:
        if args.dry_run:
            ok &= stage_benchmark_export_dry(args, cfg_t, ds)
        else:
            print(
                "[real-weights] benchmark export: run tools/vox2mesh.py + "
                f"tools/proj_label.py on {args.save_dir} (per-scene "
                "artifacts written; meshes + world2grid come from the "
                "ScanNet release)"
            )
    return ok


def stage_benchmark_export_dry(args, cfg_t, ds):
    """Dry-run the vox2mesh benchmark export on the eval output.

    Real runs get meshes + world2grid from the ScanNet release; here both
    are synthesized from the scene gt (tools/e2e_benchmark_rehearsal.py
    recipe) so the export stage — the reference's
    tools/scannet_benchmark/vox2mesh.py step (README.md:146-151) — runs
    for real and its instance files are format-checked.
    """
    import numpy as np

    from tpu3dsis.eval import scannet_benchmark as sb
    from tpu3dsis.tools.ply import write_ply

    out_root = os.path.dirname(args.save_dir) or "."
    bench_dir = os.path.join(out_root, "benchmark")
    ok = True
    n_exported = 0
    for i in range(len(ds)):
        scene_id = os.path.basename(ds.scenes[i]).split("__")[0]
        save_scene = os.path.join(cfg_t.TEST_SAVE_DIR, scene_id[:12])
        if not os.path.isdir(save_scene):
            continue
        sample = ds[i]
        verts = [[0.5, 0.5, 0.5]]
        for box in np.asarray(sample.gt_box):
            lo, hi = box[:3], box[3:6]
            verts.append(((lo + hi) / 2 + 0.5).tolist())
        rngv = np.random.RandomState(i)
        verts.extend(rngv.uniform(0, 4, (50, 3)).tolist())
        mesh_file = os.path.join(out_root, scene_id + "_vh_clean_2.ply")
        write_ply(mesh_file, np.asarray(verts, np.float32))
        w2g_file = os.path.join(out_root, scene_id + "_world2grid.txt")
        m = np.eye(4)
        m[0, 3], m[1, 3], m[2, 3] = 10, 16, 10  # exporter's pad offset
        np.savetxt(w2g_file, m, fmt="%.6f")
        sb.export_scene(save_scene, mesh_file, w2g_file, bench_dir, scene_id)
        pred_txt = os.path.join(bench_dir, scene_id + ".txt")
        if not os.path.exists(pred_txt):
            ok = False
            continue
        # format check: "<mask_rel> <label_id> <conf>" lines, masks on disk
        for line in open(pred_txt).read().splitlines():
            rel, label_id, conf = line.split()
            ok &= os.path.exists(os.path.join(bench_dir, rel))
            int(label_id), float(conf)
        n_exported += 1
    ok &= n_exported > 0
    return _status(
        "benchmark-export", ok, f"{n_exported} scenes -> {bench_dir}"
    )


def prepare_dry_run(tmp, cfg, cfg_path, color):
    """Random reference weights as a genuine .pth + a synthetic scene.

    color=False: geometry chunk-scene (fast leg). color=True: a full
    synthetic color scene — shaded RGB/depth/pose frames in the
    frames_square layout (datagen/synthetic_color) plus a random reference
    ENet saved as a real .pth, so convert/parity/eval run the color branch
    end to end.
    """
    import numpy as np
    import torch

    import refnet

    from tpu3dsis.io import write_chunk_file

    enet_pth = None
    frames_root = None
    updates = {"USE_IMAGES": color}
    if color:
        # random ENet FIRST: the reference's init_modules torch.loads
        # PRETRAINED_ENET_PATH when USE_IMAGES (backbones.py init chain)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_enet", "/root/reference/lib/nets/enet.py"
        )
        ref_enet = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_enet)
        torch.manual_seed(0)
        enet = ref_enet.create_enet(int(cfg.NUM_2D_CLASSES))
        enet_pth = os.path.join(tmp, "enet.pth")
        torch.save(enet.state_dict(), enet_pth)
        updates.update(
            NUM_IMAGE_CHANNELS=int(cfg.NUM_IMAGE_CHANNELS),
            NUM_2D_CLASSES=int(cfg.NUM_2D_CLASSES),
            PRETRAINED_ENET_PATH=enet_pth,
        )
    _, backbones_mod, _ = refnet.load_reference(
        updates, cfg_file=cfg_path, num_classes=int(cfg.NUM_CLASSES)
    )
    net = getattr(backbones_mod, str(cfg.NET))()
    net.init_modules()
    pth = os.path.join(tmp, "step_0.pth")
    torch.save(net.state_dict(), pth)

    if color:
        from tpu3dsis.datagen.synthetic_color import generate_scene

        out = generate_scene(
            np.random.RandomState(17), tmp, "scene0000_00",
            extent_m=(4.2, 2.2, 4.2), n_objects=5,
            voxel_size=float(cfg.VOXEL_SIZE),
            image_wh=tuple(int(x) for x in cfg.IMAGE_SHAPE),
            max_views=6, traj_wh=(48, 36), chunks=False,
        )
        scene = out["scene_path"]
        frames_root = os.path.join(tmp, "frames_square")
        if str(cfg.IMAGE_TYPE) != "color":
            # SUNCG layout names the color dir e.g. 'color2'
            # (augmented frames; dataset.py:144-149 hardcodes the name)
            src = os.path.join(frames_root, "scene0000_00", "color")
            os.rename(src, src[:-5] + str(cfg.IMAGE_TYPE))
    else:
        sdf = make_chunk(seed=9)
        boxes = np.array(
            [[12, 6, 14, 26, 18, 28], [50, 4, 20, 70, 10, 40]], np.float64
        )
        labels = np.array([5, 7])
        masks = [
            np.ones((14, 12, 14), np.uint16),
            np.ones((20, 6, 20), np.uint16),
        ]
        scene = os.path.join(tmp, "scene0000_00__0__.scene")
        vs = 0.046875
        write_chunk_file(
            scene, sdf, boxes, labels, masks, np.ones(2, np.float32),
            np.diag([vs, vs, vs, 1.0]).astype(np.float32),  # inv(world2grid)
            np.zeros(0, np.uint32),
        )
    fl = os.path.join(tmp, "scenes.txt")
    with open(fl, "w") as f:
        f.write(scene + "\n")
    return pth, fl, enet_pth, frames_root


# the three shipped released-checkpoint configs (reference README.md:120-168:
# ScanNetV2 step_805146, ScanNet Benchmark step_1205541, SUNCG step_956472).
# --dry-run exercises every one: leg 0 geometry-only + the benchmark export,
# legs 1/2 the FULL color branch (random ENet .pth + synthetic frames).
DRY_RUN_LEGS = (
    ("experiments/cfgs/ScanNet/benchmark.yml", False, True),
    ("experiments/cfgs/ScanNet/rpn_class_mask_5.yml", True, False),
    ("experiments/cfgs/SUNCG/rpn_class_mask_5.yml", True, False),
)


def run_leg(args):
    import jax  # noqa: F401 (backend selected in main)

    from tpu3dsis.config import cfg_from_file, finalize_config
    from tpu3dsis.models import Detector

    cfg = cfg_from_file(args.cfg)
    finalize_config(cfg)
    if args.dry_run:
        cfg.KEEP_THRESH = 0.0
        cfg.TEST.RPN_PRE_NMS_TOP_N = 256
        cfg.TEST.RPN_POST_NMS_TOP_N = 32
        cfg.CLASS_THRESH = 0.05
        if not args.dry_color:
            cfg.USE_IMAGES = False  # geometry leg
    if not bool(cfg.USE_IMAGES_GT) and bool(cfg.USE_IMAGES) and not args.enet:
        raise SystemExit(
            "color config needs --enet (PRETRAINED_ENET_PATH analogue)"
        )
    det = Detector(cfg, anchor_dir="experiments/anchors")

    params, ok = stage_convert(args, cfg, det)
    if ok:
        ok = stage_parity(args, cfg, det, params) and ok
    if ok and args.scene_filelist:
        ok = stage_eval(args, cfg, det, params) and ok
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", help="released network checkpoint (.pth)")
    p.add_argument("--enet", help="released pretrained ENet (.pth)")
    p.add_argument("--cfg", default="experiments/cfgs/ScanNet/benchmark.yml")
    p.add_argument("--scene-filelist", help="whole-scene .scene filelist")
    p.add_argument("--frames", help="BASE_IMAGE_PATH for color frames")
    p.add_argument("--save-dir", default="data/real_weights/test")
    p.add_argument("--benchmark-export", default="")
    p.add_argument("--max-scenes", type=int, default=None)
    p.add_argument("--dry-run", action="store_true",
                   help="CI rehearsal: random reference weights + synthetic "
                        "scenes through the identical stages, one leg per "
                        "shipped checkpoint config")
    p.add_argument("--dry-run-leg", type=int, default=None,
                   help="run only this DRY_RUN_LEGS index (budgeted CI)")
    args = p.parse_args()
    args.dry_color = False

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from tpu3dsis.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if not args.dry_run:
        if not args.pth:
            p.error("--pth required (or --dry-run)")
        ok = run_leg(args)
        print(f"[real-weights] {'READY' if ok else 'NOT READY'}")
        return 0 if ok else 1

    from tpu3dsis.config import cfg_from_file, finalize_config

    ok = True
    legs = list(enumerate(DRY_RUN_LEGS))
    if args.dry_run_leg is not None:
        legs = [legs[args.dry_run_leg]]
    for i, (cfg_path, color, export) in legs:
        print(f"[real-weights] === dry-run leg {i}: {cfg_path}"
              f"{' (color)' if color else ''} ===", flush=True)
        leg = argparse.Namespace(**vars(args))
        leg.cfg = cfg_path
        leg.dry_color = color
        cfg = cfg_from_file(cfg_path)
        finalize_config(cfg)
        tmp = tempfile.mkdtemp(prefix=f"real_weights_dry{i}_")
        leg.pth, leg.scene_filelist, leg.enet, leg.frames = prepare_dry_run(
            tmp, cfg, cfg_path, color
        )
        leg.save_dir = os.path.join(tmp, "test")
        leg.max_scenes = 1
        leg.benchmark_export = os.path.join(tmp, "benchmark") if export else ""
        ok = run_leg(leg) and ok
    print(f"[real-weights] {'READY' if ok else 'NOT READY'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
