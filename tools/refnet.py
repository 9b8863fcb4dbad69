"""Load the reference 3D-SIS torch network from /root/reference on CPU.

Shared by the parity tests (tests/test_full_net_parity.py) and the measured
bench baseline (tools/measure_reference_baseline.py). The reference's
CUDA-era compiled extensions get CPU stand-ins re-implemented from its C
source; `.cuda()` becomes identity. Read-only: bytecode writing is disabled.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np

REF = "/root/reference"


def available() -> bool:
    return os.path.isdir(os.path.join(REF, "lib"))


def roi_pooling_forward_cpu(pw, ph, pl, scale, features, rois, output):
    """Exact semantics of roi_pooling.c::roi_pooling_forward (reference
    lib/layer_utils/roi_pooling/src/roi_pooling.c:6-120)."""
    import torch

    f = features.detach().numpy()[0]  # (C, W, H, L)
    r = rois.detach().numpy()
    dims = f.shape[1:]
    pooled = (int(pw), int(ph), int(pl))
    out = np.zeros((r.shape[0], f.shape[0], *pooled), np.float32)
    for n in range(r.shape[0]):
        start = [int(np.floor(r[n, i] * scale)) for i in range(3)]
        end = [int(np.ceil(r[n, i + 3] * scale)) for i in range(3)]
        size = [max(end[i] - start[i], 1) for i in range(3)]
        bins = [size[i] / pooled[i] for i in range(3)]
        for aw in range(pooled[0]):
            ws = min(max(int(np.floor(aw * bins[0])) + start[0], 0), dims[0])
            we = min(max(int(np.ceil((aw + 1) * bins[0])) + start[0], 0), dims[0])
            for ah in range(pooled[1]):
                hs = min(max(int(np.floor(ah * bins[1])) + start[1], 0), dims[1])
                he = min(max(int(np.ceil((ah + 1) * bins[1])) + start[1], 0), dims[1])
                for al in range(pooled[2]):
                    ls = min(max(int(np.floor(al * bins[2])) + start[2], 0), dims[2])
                    le = min(max(int(np.ceil((al + 1) * bins[2])) + start[2], 0), dims[2])
                    if ws >= we or hs >= he or ls >= le:
                        continue  # empty bin stays 0
                    out[n, :, aw, ah, al] = f[:, ws:we, hs:he, ls:le].max(
                        axis=(1, 2, 3)
                    )
    output.copy_(torch.from_numpy(out))
    return 1


class PyRoIPool:
    """Stand-in for the legacy-autograd RoIPoolFunction (forward only)."""

    def __init__(self, pw, ph, pl, scale):
        self.args = (pw, ph, pl, float(scale))

    def __call__(self, features, rois):
        import torch

        pw, ph, pl, scale = self.args
        out = torch.zeros(
            rois.shape[0], features.shape[1], int(pw), int(ph), int(pl)
        )
        roi_pooling_forward_cpu(pw, ph, pl, scale, features, rois, out)
        return out


def install_stubs():
    import torch

    sys.dont_write_bytecode = True  # never touch the read-only reference
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None):
                super().__init__()
                for k, v in (d or {}).items():
                    self[k] = v

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    if "ipdb" not in sys.modules:
        m = types.ModuleType("ipdb")
        m.set_trace = lambda *a, **k: None
        sys.modules["ipdb"] = m
    if "plyfile" not in sys.modules:
        m = types.ModuleType("plyfile")
        m.PlyData, m.PlyElement = object, object
        sys.modules["plyfile"] = m
    if "skimage" not in sys.modules:  # only used by TRAIN-mode target layers
        m = types.ModuleType("skimage")
        t = types.ModuleType("skimage.transform")
        t.resize = None
        m.transform = t
        sys.modules["skimage"] = m
        sys.modules["skimage.transform"] = t
    if "lib.layer_utils.nms._ext" not in sys.modules:
        m = types.ModuleType("lib.layer_utils.nms._ext")
        m.nms = types.SimpleNamespace()  # only the numpy cpu_nms is used
        sys.modules["lib.layer_utils.nms._ext"] = m
    if "lib.layer_utils.roi_pooling._ext" not in sys.modules:
        m = types.ModuleType("lib.layer_utils.roi_pooling._ext")
        m.roi_pooling = types.SimpleNamespace(
            roi_pooling_forward=roi_pooling_forward_cpu
        )
        sys.modules["lib.layer_utils.roi_pooling._ext"] = m
    # .cuda() -> identity (the reference hardcodes CUDA placement)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None


def compute_projection_torch04(helper, depth, camera_to_world, world_to_grid):
    """``ProjectionHelper.compute_projection`` restored to its torch-0.4
    semantics (reference ``lib/layer_utils/projection.py:53-126``).

    The reference decomposes linear voxel indices with ``LongTensor / int``,
    which was FLOOR division when the code was written; modern torch
    true-divides, which zeroes the x/y voxel coordinates and makes the
    function return garbage index lists. This re-derivation keeps every
    other step identical (frustum bounds, round()-to-pixel, the
    |depth - p_z| <= voxel_size consistency test, the count-prefixed index
    format consumed by ``Projection.apply``)."""
    import torch

    dims = helper.volume_dims
    world_to_camera = torch.inverse(camera_to_world)
    grid_to_world = torch.inverse(world_to_grid)
    vmin, vmax = helper.compute_frustum_bounds(world_to_grid, camera_to_world)
    vmin = torch.clamp(vmin, min=0).float()
    vmax = torch.minimum(
        vmax.float(), torch.tensor([float(d) for d in dims])
    )
    lin = torch.arange(dims[0] * dims[1] * dims[2], dtype=torch.long)
    z = lin // (dims[0] * dims[1])
    tmp = lin - z * (dims[0] * dims[1])
    y = tmp // dims[0]
    x = torch.remainder(tmp, dims[0])
    coords = torch.stack(
        [x.float(), y.float(), z.float(), torch.ones_like(x, dtype=torch.float32)]
    )
    mask = (
        (coords[0] >= vmin[0]) & (coords[1] >= vmin[1])
        & (coords[2] >= vmin[2]) & (coords[0] < vmax[0])
        & (coords[1] < vmax[1]) & (coords[2] < vmax[2])
    )
    if not mask.any():
        return None
    lin = lin[mask]
    coords = coords[:, mask]
    p = world_to_camera @ (grid_to_world @ coords)
    px = (p[0] * helper.intrinsic[0][0]) / p[2] + helper.intrinsic[0][2]
    py = (p[1] * helper.intrinsic[1][1]) / p[2] + helper.intrinsic[1][2]
    pix = torch.round(px).long()
    piy = torch.round(py).long()
    valid = (
        (pix >= 0) & (piy >= 0)
        & (pix < helper.image_dims[0]) & (piy < helper.image_dims[1])
    )
    if not valid.any():
        return None
    ilin = piy[valid] * helper.image_dims[0] + pix[valid]
    dvals = depth.reshape(-1)[ilin]
    dmask = (
        (dvals >= helper.depth_min) & (dvals <= helper.depth_max)
        & ((dvals - p[2][valid]).abs() <= helper.voxel_size)
    )
    if not dmask.any():
        return None
    upd = lin[valid][dmask]
    n = dims[0] * dims[1] * dims[2] + 1
    l3 = torch.zeros(n, dtype=torch.long)
    l2 = torch.zeros(n, dtype=torch.long)
    l3[0] = upd.shape[0]
    l2[0] = upd.shape[0]
    l3[1 : 1 + upd.shape[0]] = upd
    l2[1 : 1 + upd.shape[0]] = ilin[dmask]
    return l3, l2


def load_reference(cfg_updates: dict | None = None,
                   cfg_file: str = "experiments/cfgs/ScanNet/benchmark.yml",
                   num_classes: int = 19):
    """-> (network_module, backbones_module, ref_cfg) with `cfg_file` (the
    reference's own copy) merged into its global cfg plus `cfg_updates`."""
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cfg_mod = importlib.import_module("lib.utils.config")
    rc = cfg_mod.cfg
    # the reference's cfg_from_file uses the removed yaml.load(f) API;
    # merge the same file manually (flat keys + the TRAIN/TEST sub-dicts)
    import yaml

    with open(os.path.join(REF, cfg_file)) as f:
        y = yaml.safe_load(f)
    for k, v in y.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                rc[k][k2] = v2
        else:
            rc[k] = v
    rc.USE_IMAGES = False
    rc.NUM_CLASSES = num_classes
    rc.NORMALIZE_WEIGHTS = [1.0] * num_classes
    for k, v in (cfg_updates or {}).items():
        rc[k] = v
    # backbones FIRST: network.py circularly imports lib.nets.backbones and
    # only resolves when backbones initiates the import chain
    backbones = importlib.import_module("lib.nets.backbones")
    network = importlib.import_module("lib.nets.network")
    network.RoIPoolFunction = PyRoIPool  # legacy autograd Function is a
    # RuntimeError under modern torch; forward-only stand-in above
    return network, backbones, rc


def build_scannet_net(cfg_updates: dict | None = None):
    """-> (net (eval mode), ref_cfg)."""
    _, backbones, rc = load_reference(cfg_updates)
    net = backbones.ScanNet_Backbone()
    net.init_modules()
    net.eval()
    return net, rc


def run_test_stages(net, rc, scene_nxyzc):
    """Drive the reference TEST branch stage by stage on one chunk.

    scene_nxyzc: (1, X, Y, Z, 2) numpy. Returns the predictions dict plus
    intermediate stage tensors (network.py:245-301 semantics).
    """
    import torch

    with torch.no_grad():
        net.batch_size = 1
        net._mode = "TEST"
        sx, sy, sz = scene_nxyzc.shape[1:4]
        net._scene_info = np.array([sx, sy, sz, 2])
        net._scene = (
            torch.from_numpy(scene_nxyzc).permute(0, 4, 1, 2, 3).contiguous()
        )
        l1, l2, l3 = net._backbone()
        net._anchor_component(
            [l1.size(2), l1.size(3), l1.size(4)],
            [l2.size(2), l2.size(3), l2.size(4)],
            [],
        )
        net._region_proposal(l1, l2, None)
        rois = net._predictions["rois"][0]
        levels = net._predictions["level_inds"][0]
        pool5 = net._roi_pool_layer(
            l1, l2, None, rois, levels, net._feat_stride, rc.CLASS_POOLING_SIZE
        )
        fc7 = net._classifier(pool5)
        net._region_classification(fc7)
    return {
        "l1": l1,
        "l2": l2,
        "rois": rois,
        "levels": levels,
        "pool5": pool5,
        "fc7": fc7,
        "predictions": net._predictions,
    }
