"""ScanNet benchmark subsystem: vox2mesh export -> official evaluator."""

import os
import pickle

import numpy as np

from tpu3dsis.eval import scannet_benchmark as sb
from tpu3dsis.tools.ply import read_ply, write_ply


def test_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    colors = [(255, 0, 0)] * 3
    faces = [[0, 1, 2]]
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, colors=colors, faces=faces)
    data = read_ply(p)
    np.testing.assert_allclose(
        np.stack([data["vertex"]["x"], data["vertex"]["y"], data["vertex"]["z"]], 1),
        verts,
    )
    np.testing.assert_array_equal(data["face"], faces)


def make_scene_fixture(tmp_path, rng):
    """A 'scene' with 2 instances of >=100 verts each, perfectly predicted."""
    pred_dir = tmp_path / "pred" / "scene0000_00"
    os.makedirs(pred_dir)
    # two boxes with full masks
    boxes = np.array(
        [[20, 10, 20, 26, 16, 26], [40, 10, 40, 46, 16, 46]], np.float32
    )
    classes = np.array([3, 5])  # chair, table (consecutive ids)
    confs = np.array([0.9, 0.8], np.float32)
    masks = [np.ones((6, 6, 6), np.uint8), np.ones((6, 6, 6), np.uint8)]
    np.save(pred_dir / "pred_box.npy", boxes)
    np.save(pred_dir / "pred_class.npy", classes)
    np.save(pred_dir / "pred_conf.npy", confs)
    with open(pred_dir / "pred_mask", "wb") as f:
        pickle.dump(masks, f)
    with open(pred_dir / "pred_mask_index", "wb") as f:
        pickle.dump([True, True], f)

    # mesh vertices: 125 verts inside each box (5x5x5 grid spanning the box)
    verts = []
    gt_ids = []
    for b, cls in zip(boxes, classes):
        xs = np.linspace(b[0] + 0.5, b[3] - 0.5, 5)
        ys = np.linspace(b[1] + 0.5, b[4] - 0.5, 5)
        zs = np.linspace(b[2] + 0.5, b[5] - 0.5, 5)
        for x in xs:
            for y in ys:
                for z in zs:
                    verts.append([x, y, z])
                    gt_ids.append(int(cls) * 1000 + 1)
    # background verts far away (void label 0)
    for i in range(120):
        verts.append([200 + i * 0.1, 5, 200])
        gt_ids.append(0)
    verts = np.asarray(verts, np.float32)

    mesh_file = str(tmp_path / "scene0000_00_vh_clean_2.ply")
    write_ply(mesh_file, verts)

    # world2grid: identity + the fixed [10,16,10] padding the loader removes
    w2g = np.eye(4)
    w2g[0, 3], w2g[1, 3], w2g[2, 3] = 10, 16, 10
    w2g_file = str(tmp_path / "world2grid.txt")
    np.savetxt(w2g_file, w2g, fmt="%.6f")

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    gt_file = str(gt_dir / "scene0000_00.txt")
    np.savetxt(gt_file, np.asarray(gt_ids, np.int64), fmt="%d")
    return str(pred_dir), mesh_file, w2g_file, gt_file


def test_vox2mesh_and_evaluate_perfect(tmp_path, rng):
    pred_dir, mesh_file, w2g_file, gt_file = make_scene_fixture(tmp_path, rng)
    out_dir = str(tmp_path / "bench")
    sb.export_scene(pred_dir, mesh_file, w2g_file, out_dir, "scene0000_00")

    pred_txt = os.path.join(out_dir, "scene0000_00.txt")
    assert os.path.isfile(pred_txt)
    lines = open(pred_txt).read().splitlines()
    assert len(lines) == 2  # both instances exported

    avgs = sb.evaluate([pred_txt], [gt_file], verbose=False)
    assert abs(avgs["all_ap_50%"] - 1.0) < 1e-9
    assert abs(avgs["all_ap_25%"] - 1.0) < 1e-9
    assert abs(avgs["classes"]["chair"]["ap50%"] - 1.0) < 1e-9
    assert abs(avgs["classes"]["table"]["ap50%"] - 1.0) < 1e-9
    # classes without gt are NaN and excluded from the mean
    assert np.isnan(avgs["classes"]["bed"]["ap50%"])


def test_proj_label_remap(tmp_path, rng):
    pred_dir, mesh_file, w2g_file, gt_file = make_scene_fixture(tmp_path, rng)
    out_dir = str(tmp_path / "bench")
    sb.export_scene(pred_dir, mesh_file, w2g_file, out_dir, "scene0000_00")
    sb.remap_benchmark_labels(out_dir)
    lines = open(os.path.join(out_dir, "scene0000_00.txt")).read().splitlines()
    labels = sorted(int(l.split()[1]) for l in lines)
    assert labels == [5, 7]  # consecutive 3->nyu40 5 (chair), 5->7 (table)


def test_visualization_outputs(tmp_path, rng):
    from tpu3dsis.tools.visualization import visualize_result, write_bbox, write_mask

    mask = np.zeros((4, 4, 4))
    mask[1:3, 1:3, 1:3] = 1
    write_mask(mask, str(tmp_path / "mask.ply"))
    write_bbox(
        np.array([[0, 0, 0, 3, 3, 3, 5]], np.float32), str(tmp_path / "b.ply")
    )
    data = read_ply(str(tmp_path / "mask.ply"))
    assert data["vertex"].shape[0] == 8 * 8  # 8 voxels x 8 cube verts

    pred_dir, *_ = make_scene_fixture(tmp_path, rng)
    np.save(
        os.path.join(pred_dir, "scene.npy"), (rng.rand(50, 20, 50) > 0.95)
    )
    visualize_result(pred_dir, str(tmp_path / "vis"))
    assert os.path.isfile(tmp_path / "vis" / "pred_bbox.ply")
    assert os.path.isfile(tmp_path / "vis" / "pred_mask.ply")
