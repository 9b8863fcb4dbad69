"""Color TEST-branch parity against the reference's OWN torch code.

Extends tests/test_full_net_parity.py to the composed COLOR pipeline
(VERDICT r2 next-step #4): the reference's ``Network.forward(mode='TEST')``
with USE_IMAGES — per-frame ``ProjectionHelper.compute_projection`` index
lists -> ``Projection.apply`` scatter -> incremental pairwise view max-pool
(``lib/nets/network.py:187-235``) -> color backbone stream -> concat ->
RPN -> proposals -> RoI pool -> classifier — is driven end to end on a
fixed chunk, against our ``fuse_views`` + dual-stream backbone + heads with
shared weights.

USE_IMAGES_GT=True feeds 128-channel feature images directly on both sides,
which isolates exactly the stages above; the ENet that produces those
features in the real config is activation-identical to the reference's
converted graph by tests/test_enet.py. The mask color branch
(network.py:303-317 crop semantics) is compared directly at the module
level.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "lib")),
        reason="reference checkout not available",
    ),
    pytest.mark.medium,
]

sys.path.insert(0, "tools")
import refnet  # noqa: E402

W, H = 24, 18  # feature-map resolution (both sides read cfg.DEPTH_SHAPE)
V = 3  # views
SCENE = (48, 32, 48)
INTRINSIC = [
    [21.0, 0, 11.5, 0], [0, 22.5, 8.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]
]


def cfg_updates():
    return {
        "USE_IMAGES": True,
        "USE_IMAGES_GT": True,
        "NUM_IMAGE_CHANNELS": 128,
        "IMAGE_SHAPE": [W, H],
        "DEPTH_SHAPE": [W, H],
        "INTRINSIC": INTRINSIC,
        "VOXEL_SIZE": 0.25,
        "PROJ_DEPTH_MIN": 0.4,
        "PROJ_DEPTH_MAX": 4.0,
        "USE_MASK": True,
        "MASK_USE_IMAGES": True,
        "NUM_IMAGES": V,
    }


def our_cfg():
    from tpu3dsis.config import cfg_from_file

    cfg = cfg_from_file(
        os.path.join(REF, "experiments/cfgs/ScanNet/benchmark.yml")
    )
    cfg.LABEL_MAP = ""
    cfg.NUM_CLASSES = 19
    cfg.NORMALIZE_WEIGHTS = [1.0] * 19
    for k, v in cfg_updates().items():
        cfg[k] = v
    return cfg


def make_scene(seed=3):
    rng = np.random.RandomState(seed)
    sdf = np.full(SCENE, 8.0, np.float32)
    for x0, y0, z0, sx, sy, sz in (
        (6, 4, 8, 12, 10, 12),
        (26, 4, 10, 16, 6, 16),
        (10, 6, 30, 20, 14, 10),
    ):
        sdf[x0 : x0 + sx, y0 : y0 + sy, z0 : z0 + sz] = 0.3
        sdf[x0 + 1 : x0 + sx - 1, y0 + 1 : y0 + sy - 1,
            z0 + 1 : z0 + sz - 1] = -2.0
    sdf += rng.randn(*sdf.shape).astype(np.float32) * 0.01
    trunc = np.clip(sdf, -3, 3)
    enc = np.stack(
        [np.abs(trunc), (sdf > -1).astype(np.float32)], axis=-1
    ).astype(np.float32)
    return enc[None]


def make_frames(seed=5):
    rng = np.random.RandomState(seed)
    feats = rng.randn(V, H, W, 128).astype(np.float32)
    # depths must be geometry-consistent: compute_projection keeps a voxel
    # only when |voxel_depth - depth_map| <= voxel_size, so random depths
    # project ~nothing. A depth ramp spreads the admitted voxels across many
    # z-slices; the per-view pose shifts make the fused sets differ.
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ramp = 1.0 + 2.4 * (xx + yy) / float(W + H - 2)
    ramp = ramp + 0.1 * np.sin(xx / 2.0) * np.cos(yy / 2.0)
    depths = np.stack(
        [ramp + 0.15 * i for i in range(V)]
    ).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    # center the camera on the grid (world extents 12 x 8 x 12 m) so the
    # frustum actually covers voxels; 1 m in front of the z=0 face
    poses[:, 0, 3] = 6.0
    poses[:, 1, 3] = 4.0
    poses[:, 2, 3] = -1.0
    poses[1, 0, 3] += 0.5  # shift views so the fused volume differs per view
    poses[2, 0, 3] -= 0.5
    poses[2, 1, 3] += 0.4
    w2g = np.diag([4.0, 4.0, 4.0, 1.0]).astype(np.float32)
    return feats, depths, poses, w2g


@pytest.fixture(scope="module")
def parity():
    network_mod, backbones_mod, rc = refnet.load_reference(cfg_updates())
    from lib.layer_utils.projection import ProjectionHelper

    from tpu3dsis.models import Detector
    from tpu3dsis.models.detector import build_inference_fn
    from tpu3dsis.train.checkpoint import params_to_torch_state_dict

    cfg = our_cfg()
    det = Detector(cfg, anchor_dir="experiments/anchors")
    params = det.init_params(jax.random.PRNGKey(7))

    net = backbones_mod.ScanNet_Backbone()
    net.init_modules()
    net.eval()
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(params).items()
    }
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert not missing, f"our params lack reference keys: {missing}"
    assert not unexpected, f"our params have extra keys: {unexpected}"

    scene = make_scene()
    feats, depths, poses, w2g = make_frames()

    # --- reference: the real TEST forward, projection indices computed the
    # way trainval.py:797-820 does ---------------------------------------
    helper = ProjectionHelper(
        INTRINSIC, 0.4, 4.0, [W, H], SCENE, 0.25
    )
    # the reference's own compute_projection is bitrotten under modern torch
    # (LongTensor/int was floor division in torch-0.4); refnet restores the
    # original semantics, Projection.apply + the fusion loop stay reference
    proj = [
        refnet.compute_projection_torch04(
            helper,
            torch.from_numpy(depths[i]),
            torch.from_numpy(poses[i]),
            torch.from_numpy(w2g),
        )
        for i in range(V)
    ]
    assert all(p is not None for p in proj), "a view projected nothing"
    assert min(int(p[0][0]) for p in proj) > 100, "too few voxels for signal"
    blobs = {
        "id": ["parity"],
        "data": torch.from_numpy(scene).permute(0, 4, 1, 2, 3).contiguous(),
        "gt_box": [torch.zeros(0, 7)],
        "gt_mask": None,
        "nearest_images": {
            "images": [
                torch.from_numpy(
                    np.ascontiguousarray(np.moveaxis(feats, -1, 1))
                )
            ],
        },
        "proj_ind_3d": [torch.stack([p[0] for p in proj])],
        "proj_ind_2d": [torch.stack([p[1] for p in proj])],
    }
    net.USE_MASK_SAVE = getattr(net, "USE_MASK_SAVE", None)
    rc.USE_MASK = False  # mask leg compared at module level below
    with torch.no_grad():
        net.forward(blobs, "TEST", killing_inds=[])
    rc.USE_MASK = True

    out = {"ref": {
        "imageft": net._imageft.detach().numpy(),  # (B, C, X, Y, Z)
        "rois": net._predictions["rois"][0].detach().numpy(),
        "level_inds": net._predictions["level_inds"][0]
        .detach().numpy().reshape(-1),
        "cls_prob": net._predictions["cls_prob"].detach().numpy(),
        "bbox_pred": net._predictions["bbox_pred"].detach().numpy(),
    }}

    # --- ours: one fused program, same inputs ----------------------------
    from tpu3dsis.geometry.projection import fuse_views

    imageft = fuse_views(
        jnp.asarray(feats), jnp.asarray(depths), jnp.asarray(poses),
        jnp.asarray(w2g), jnp.asarray(np.asarray(INTRINSIC, np.float32)),
        SCENE, (W, H), 0.4, 4.0, 0.25,
    )
    infer = build_inference_fn(det, cfg, SCENE, mode="TEST")
    frames = {
        "images": jnp.asarray(feats),
        "depths": jnp.asarray(depths),
        "poses": jnp.asarray(poses),
        "world_to_grid": jnp.asarray(w2g),
    }
    ours_out = infer(params, jnp.asarray(scene), frames)
    # heads on the REFERENCE's rois (isolates stage drift from order)
    feats3d = det.features(
        params, jnp.asarray(scene), imageft[None].astype(jnp.float32)
    )
    cls_score, cls_prob, cls_pred, bbox_pred = det.classify_rois(
        params, feats3d,
        jnp.asarray(out["ref"]["rois"][:, :6].astype(np.float32)),
        jnp.asarray(out["ref"]["level_inds"].astype(np.int32)),
    )
    valid = np.asarray(ours_out["valid"])
    out["ours"] = {
        "imageft": np.asarray(imageft),  # (X, Y, Z, C)
        "rois": np.asarray(ours_out["rois"])[valid],
        "cls_prob": np.asarray(cls_prob),
        "bbox_pred": np.asarray(bbox_pred),
    }
    out["det"], out["params"], out["net"] = det, params, net
    out["scene"], out["imageft_ours"] = scene, imageft
    return out


def test_projected_volume_parity(parity):
    """fuse_views == Projection.apply + pairwise max-pool, every view."""
    ref = parity["ref"]["imageft"][0]  # (C, X, Y, Z)
    ours = np.moveaxis(parity["ours"]["imageft"], -1, 0)
    assert ref.shape == ours.shape
    assert np.abs(ref).sum() > 0, "reference projected nothing"
    np.testing.assert_allclose(ref, ours, atol=1e-5)


def test_color_proposal_set_parity(parity):
    ref_rois = parity["ref"]["rois"][:, :6]
    our_rois = parity["ours"]["rois"]
    assert len(ref_rois) == len(our_rois), (len(ref_rois), len(our_rois))
    used = np.zeros(len(our_rois), bool)
    for rb in ref_rois:
        d = np.abs(our_rois - rb[None]).max(1)
        d[used] = 1e9
        j = int(np.argmin(d))
        assert d[j] < 1e-2, f"no match for reference roi {rb}: best {d[j]}"
        used[j] = True


def test_color_classifier_parity(parity):
    np.testing.assert_allclose(
        parity["ref"]["cls_prob"], parity["ours"]["cls_prob"],
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        parity["ref"]["bbox_pred"], parity["ours"]["bbox_pred"],
        atol=1e-3, rtol=1e-3,
    )


def test_mask_color_branch_parity(parity):
    """Reference mask_backbone(crop, imageft_crop) (network.py:303-317
    crop semantics) vs ours with the same imageft crop."""
    net, det, params = parity["net"], parity["det"], parity["params"]
    scene = parity["scene"]
    imageft = np.asarray(parity["imageft_ours"])  # (X, Y, Z, C)
    crop = scene[:, 6:18, 4:14, 8:20]
    ft_crop = imageft[6:18, 4:14, 8:20][None]
    with torch.no_grad():
        ref_m = net.mask_backbone(
            torch.from_numpy(crop).permute(0, 4, 1, 2, 3).contiguous(),
            torch.from_numpy(
                np.ascontiguousarray(np.moveaxis(ft_crop, -1, 1))
            ),
        )
    ours = det.mask_backbone.apply(
        params, jnp.asarray(crop), imageft=jnp.asarray(ft_crop),
        training=False, compute_dtype=det.cfg_static["compute_dtype"],
    )
    np.testing.assert_allclose(
        np.moveaxis(ref_m.detach().numpy(), 1, -1), np.asarray(ours),
        atol=2e-4, rtol=1e-3,
    )
