"""Datagen: TSDF fusion, rotations, chunk sampling, format round-trips."""

import numpy as np

from tpu3dsis.datagen import scene_sampler as ss
from tpu3dsis.datagen import tsdf_fusion as tf


def test_rotate_mask_matches_index_oracle(rng):
    for rot in range(4):
        mask = (rng.rand(5, 3, 4) > 0.5).astype(np.uint16)
        got = ss.rotate_mask(mask, rot)
        expect = ss._rotate_grid_index_math(mask, rot)
        np.testing.assert_array_equal(got, expect), rot


def test_scsdf_and_aabbs_roundtrip(tmp_path, rng):
    sdf = rng.randn(10, 8, 12).astype(np.float32)
    p = str(tmp_path / "s.scsdf")
    tf.save_scsdf(p, sdf, 0.046875, (0, 0, 0), (0.5, 0.4, 0.6))
    grid, vs, bmin, bmax = tf.load_scsdf(p)
    np.testing.assert_array_equal(grid, sdf)
    assert abs(vs - 0.046875) < 1e-7

    boxes = np.array([[1, 1, 1, 4, 3, 5]], np.float32)
    labels = np.array([5])
    masks = [np.ones((3, 2, 4), np.uint16)]
    ap = str(tmp_path / "s.aabbs")
    tf.save_aabbs(ap, boxes, labels, masks)
    b2, l2, m2 = tf.load_aabbs(ap)
    np.testing.assert_allclose(b2, boxes)
    np.testing.assert_array_equal(l2, labels)
    np.testing.assert_array_equal(m2[0], masks[0])


def test_tsdf_fusion_flat_wall(rng):
    """Fuse a synthetic frontal view of a wall at z=1m; the zero crossing
    must land at the wall and sdf must be normalized to voxel units."""
    voxel = 0.05
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 50.0
    K[0, 2], K[1, 2] = 32, 24
    pose = np.eye(4)  # camera at origin looking +z
    depth = np.full((48, 64), 1.0, np.float32)
    label = np.full((48, 64), 7, np.uint8)
    inst = np.full((48, 64), 2, np.uint8)

    grid, w2g = tf.fuse_scene(
        [(K, pose, depth, label, inst)],
        ((-0.3, -0.3, 0.5), (0.3, 0.3, 1.3)),
        voxel_size=voxel,
        pad=4,
    )
    assert (grid.weight > 0).any()
    obs = grid.sdf[np.isfinite(grid.sdf)]
    assert obs.size > 0
    # normalized units: magnitudes are in voxels, truncation ~< 3.5 + eps
    assert np.abs(obs).max() <= (2.5 + 4.0) + 1e-3
    # voxels at the wall (world z ~ 1.0) have |sdf| small and carry labels
    zs_world = (np.arange(grid.dims[2]) + 0.5 - 0)  # via inverse transform
    wall_mask = np.abs(grid.sdf) <= 1.0
    assert wall_mask.any()
    assert (grid.label[wall_mask & (grid.label > 0)] == 7).all()
    # the instance mask extraction finds the wall voxels
    lo = np.array(np.nonzero(wall_mask)).min(axis=1)
    hi = np.array(np.nonzero(wall_mask)).max(axis=1) + 1
    mask, occ, total = grid.instance_mask_for_aabb(
        np.concatenate([lo, hi]), 2
    )
    assert occ > 0 and occ <= total


def np_extract_chunk_oracle(grid, start, rot, dim):
    """Direct port of the extractChunk data loop (main.cpp:322-337)."""
    grid_dim = np.asarray(grid.shape)
    rot_grid_dim = ss._rot_coord(grid_dim, rot)
    offset = np.zeros(3, int)
    for i in (0, 2):
        if rot_grid_dim[i] < 0:
            offset[i] = -rot_grid_dim[i]
    out = np.full(tuple(dim), -np.inf, np.float32)
    for x in range(dim[0]):
        for y in range(dim[1]):
            for z in range(dim[2]):
                loc = -offset + np.asarray(start) + np.array([x, y, z])
                coord = ss._rot_coord(loc, 4 - rot if rot else 0)
                if rot == 1:
                    coord[0] -= 1
                elif rot == 2:
                    coord[0] -= 1
                    coord[2] -= 1
                elif rot == 3:
                    coord[2] -= 1
                if (coord >= 0).all() and (coord < grid_dim).all():
                    out[x, y, z] = grid[coord[0], coord[1], coord[2]]
    return out


def test_extract_chunk_rotations_match_reference_math(rng):
    grid = rng.randn(14, 6, 10).astype(np.float32)
    dim = (6, 6, 6)
    for rot in range(4):
        data, _ = ss.extract_chunk(grid, [], [], [], (2, 0, 1), rot, dim)
        expect = np_extract_chunk_oracle(grid, (2, 0, 1), rot, dim)
        np.testing.assert_array_equal(data, expect), f"rot {rot}"


def test_process_scene_chunks_end_to_end(tmp_path, rng):
    """scsdf+aabbs -> .chunk files loadable by the training dataset."""
    gd = (40, 80, 40)  # will produce 96-chunks clamped? use small chunk dim
    sdf = rng.randn(*gd).astype(np.float32) * 5
    sdf[10:20, 18:26, 12:22] = 0.5  # object surface region
    scsdf = str(tmp_path / "scene.scsdf")
    tf.save_scsdf(scsdf, sdf, 0.046875, (0, 0, 0), (1, 2, 1))
    boxes = np.array([[10, 18, 12, 20, 26, 22]], np.float32)
    masks = [np.ones((10, 8, 10), np.uint16)]
    aabbs = str(tmp_path / "scene.aabbs")
    tf.save_aabbs(aabbs, boxes, np.array([5]), masks)

    written = ss.process_scene_chunks(
        scsdf, aabbs, str(tmp_path / "chunk_"), depths=None, poses=None,
        chunk_dim=(24, 24, 24), sample_factor=8, rotate90=True,
        require_images=False,
    )
    assert len(written) > 0
    from tpu3dsis.io import read_chunk_file

    raw = read_chunk_file(written[0])
    assert raw.sdf.shape == (24, 24, 24)
    assert raw.boxes.shape[0] >= 1
    assert len(raw.masks) == raw.boxes.shape[0]

    # whole-scene export
    scene_path = ss.process_scene(scsdf, aabbs, str(tmp_path / "a.scene"))
    raw2 = read_chunk_file(scene_path)
    assert raw2.sdf.shape == (gd[0] - 20, 80 - 26, gd[2] - 20)


def test_find_nearest_images_coverage(rng):
    """A frame looking at the object must be selected."""
    chunk_dim = (16, 16, 16)
    voxel = 0.25
    box = np.array([4, 4, 4, 12, 12, 12], np.float32)
    mask = np.ones((8, 8, 8), np.uint16)
    sel = [(box, 5, mask, 1.0)]
    # chunk->world: identity scale voxel, origin at 0 => voxel v at v*0.25m
    c2w = np.diag([voxel, voxel, voxel, 1.0])
    K = ss.nearest_image_intrinsic()
    # camera at world (-1.5, 1.0, 1.0) looking +x toward the object center
    pose = np.array(
        [[0, 0, 1, -1.5], [0, 1, 0, 1.0], [1, 0, 0, 1.0], [0, 0, 0, 1]],
        np.float64,
    )
    # depth image consistent with the box front face at x=1.0m -> 2.5m away
    good_depth = np.full((60, 80), 2.5, np.float32)
    bad_depth = np.full((60, 80), 0.2, np.float32)  # too close: no hits
    chosen = ss.find_nearest_images(
        sel, c2w, voxel, chunk_dim, [bad_depth, good_depth], [pose, pose], 2
    )
    assert 1 in chosen and 0 not in chosen


def test_rot_chunk_transform_consistent_with_extract(rng):
    """world->rotated-chunk transform maps world points onto the same voxels
    extract_chunk places them at, for every rotation."""
    grid = rng.randn(20, 8, 14).astype(np.float32)
    voxel = 0.5
    bmin = np.array([1.0, 2.0, 3.0])
    w2g = ss.make_scene_world_to_grid(bmin, voxel, pad=0)
    dim = (6, 6, 6)
    start = (3, 1, 2)
    for rot in range(4):
        data, _ = ss.extract_chunk(grid, [], [], [], start, rot, dim)
        w2c = ss.rot_chunk_transform(w2g, grid.shape, rot, start)
        c2w = np.linalg.inv(w2c)
        hits = checks = 0
        for cx in range(dim[0]):
            for cy in range(dim[1]):
                for cz in range(dim[2]):
                    if not np.isfinite(data[cx, cy, cz]):
                        continue
                    # voxel center in chunk coords -> world -> original grid
                    p = c2w @ np.array([cx + 0.5, cy + 0.5, cz + 0.5, 1.0])
                    g = w2g @ p
                    gi = np.floor(g[:3]).astype(int)
                    if (gi >= 0).all() and (gi < grid.shape).all():
                        checks += 1
                        if np.isclose(grid[gi[0], gi[1], gi[2]],
                                      data[cx, cy, cz]):
                            hits += 1
        assert checks > 50, f"rot {rot}: degenerate test"
        assert hits == checks, f"rot {rot}: {hits}/{checks} voxels consistent"


def _quad(vertices, base_index):
    """Two triangles covering a rectangle given 4 corner indices."""
    a, b, c, d = base_index, base_index + 1, base_index + 2, base_index + 3
    return [[a, b, c], [a, c, d]]


def test_mesh_render_depth_occlusion_labels():
    """Analytic z-buffer check: two fronto-parallel quads, the nearer one
    occludes; depth is exact; semantic/instance come from the winning face
    (Fuser.cpp renderDepthSemantics equivalence)."""
    from tpu3dsis.datagen.mesh_render import MeshRenderer

    # camera at origin looking +z (identity pose); quad A at z=2 covers the
    # full image; quad B at z=1 covers the left half
    verts = np.array(
        [
            [-4, -4, 2], [4, -4, 2], [4, 4, 2], [-4, 4, 2],  # A
            [-4, -4, 1], [0, -4, 1], [0, 4, 1], [-4, 4, 1],  # B (left half)
        ],
        np.float64,
    )
    faces = np.array(_quad(verts, 0)[:2] + _quad(verts, 4), np.int64)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int64)
    sem = np.array([7, 7, 9, 9], np.uint8)
    inst = np.array([1, 1, 2, 2], np.uint16)
    w, h = 16, 12
    intr = np.array(
        [[8.0, 0, w / 2, 0], [0, 8.0, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    r = MeshRenderer(verts, faces, sem, inst)
    out = r.render(intr, np.eye(4), w, h, near=0.4, far=4.0)

    # right half sees quad A at depth 2; left half sees B at depth 1
    assert np.allclose(out["depth"][:, w // 2 + 1 :], 2.0, atol=1e-5)
    assert np.allclose(out["depth"][:, : w // 2 - 1], 1.0, atol=1e-5)
    assert (out["semantic"][:, w // 2 + 1 :] == 7).all()
    assert (out["semantic"][:, : w // 2 - 1] == 9).all()
    assert (out["instance"][:, : w // 2 - 1] == 2).all()

    # near-plane culling: nothing survives with far below the quads
    out2 = r.render(intr, np.eye(4), w, h, near=0.4, far=0.9)
    assert (out2["depth"] == 0).all()


def test_mesh_render_oversize_face_path():
    """A triangle larger than the fast-path window rasterizes exactly."""
    from tpu3dsis.datagen.mesh_render import MeshRenderer

    verts = np.array([[-8, -8, 2], [8, -8, 2], [8, 8, 2], [-8, 8, 2]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    w, h = 64, 48  # quad projects to the full image >> window=12
    intr = np.array(
        [[16.0, 0, w / 2, 0], [0, 16.0, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    out = MeshRenderer(verts, faces).render(intr, np.eye(4), w, h)
    assert np.allclose(out["depth"], 2.0, atol=1e-5)


def test_render_and_fuse_cube_roundtrip():
    """Fuser.cpp end-to-end equivalent: render an annotated cube mesh from
    orbiting cameras, TSDF-fuse, and recover the cube as occupied voxels
    with its label."""
    from tpu3dsis.datagen.mesh_render import (
        MeshRenderer,
        render_and_fuse,
        vertex_to_face_attr,
    )

    # unit cube centered at origin (12 triangles)
    c = np.array(
        [
            [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5],
            [-0.5, 0.5, -0.5], [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5],
            [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
        ]
    )
    quads = [
        (0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
        (2, 3, 7, 6), (0, 3, 7, 4), (1, 2, 6, 5),
    ]
    faces = []
    for a, b, d, e in quads:
        faces += [[a, b, d], [a, d, e]]
    faces = np.array(faces)
    vsem = np.full(8, 5, np.uint8)
    sem = vertex_to_face_attr(faces, vsem)
    inst = np.ones(len(faces), np.uint16)

    # cameras on a circle of radius 2 in the y=0 plane, looking at origin
    poses = []
    for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eye = np.array([2 * np.cos(ang), 0.0, 2 * np.sin(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        pose = np.eye(4)
        pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = (
            right, true_up, fwd, eye,
        )
        poses.append(pose)

    w, h = 48, 48
    intr = np.array(
        [[40.0, 0, w / 2, 0], [0, 40.0, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    grid, w2g = render_and_fuse(
        c, faces, sem, inst, poses, intr, w, h, voxel_size=0.1, pad=4,
        depth_min=0.4, depth_max=4.0,
    )
    near_surface = (grid.weight >= 2) & (np.abs(grid.sdf) <= 0.5)
    assert near_surface.sum() > 200  # the cube shell was reconstructed
    # surface voxels concentrate on the cube boundary (grazing-angle TSDF
    # fins from the 8 coplanar views are expected fusion behavior)
    idx = np.argwhere(near_surface)
    homo = np.concatenate([idx, np.ones((len(idx), 1))], 1)
    world = (np.linalg.inv(w2g) @ homo.T).T[:, :3]
    dist_to_shell = np.abs(np.abs(world).max(1) - 0.5)
    assert np.quantile(dist_to_shell, 0.9) < 0.15
    assert dist_to_shell.max() < 0.45  # truncation-bounded
    # labels voted onto the surface
    lbl = grid.label[near_surface]
    assert (lbl == 5).mean() > 0.8


def _room_mesh():
    """A 4x2.6x4 m room: floor + 2 walls (label 0) and two labeled boxes."""
    verts, faces, sem, inst = [], [], [], []

    def add_quad(corners, label, instance):
        base = len(verts)
        verts.extend(corners)
        faces.extend([[base, base + 1, base + 2], [base, base + 2, base + 3]])
        sem.extend([label, label])
        inst.extend([instance, instance])

    def add_box(lo, hi, label, instance):
        x0, y0, z0 = lo
        x1, y1, z1 = hi
        # 6 faces
        add_quad([(x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0)], label, instance)
        add_quad([(x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)], label, instance)
        add_quad([(x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0)], label, instance)
        add_quad([(x1, y0, z0), (x1, y0, z1), (x1, y1, z1), (x1, y1, z0)], label, instance)
        add_quad([(x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1)], label, instance)
        add_quad([(x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1)], label, instance)

    add_quad([(0, 0, 0), (4, 0, 0), (4, 0, 4), (0, 0, 4)], 0, 0)  # floor
    add_quad([(0, 0, 0), (4, 0, 0), (4, 2.6, 0), (0, 2.6, 0)], 0, 0)  # wall z=0
    add_quad([(0, 0, 0), (0, 0, 4), (0, 2.6, 4), (0, 2.6, 0)], 0, 0)  # wall x=0
    add_box((1.0, 0, 1.0), (1.8, 0.8, 1.8), 5, 1)  # chair-ish
    add_box((2.4, 0, 2.2), (3.6, 0.5, 3.0), 7, 2)  # table-ish
    return (np.asarray(verts, float), np.asarray(faces), 
            np.asarray(sem, np.uint8), np.asarray(inst, np.uint16))


def test_evaluate_view_scoring():
    """Views full of labeled objects at scanner-like depths outscore empty
    or degenerate views (ViewGenerator.h:219-254 semantics)."""
    from tpu3dsis.datagen.virtual_scan import ViewStats, evaluate_view

    stats = ViewStats()
    h, w = 24, 32
    good_d = np.full((h, w), 2.0, np.float32)
    good_s = np.full((h, w), 5, np.uint8)
    empty_d = np.zeros((h, w), np.float32)
    empty_s = np.zeros((h, w), np.uint8)
    far_d = np.full((h, w), 7.5, np.float32)  # beyond the 6 m eval depth

    ob_good, hist_good = evaluate_view(good_d, good_s, stats)
    ob_empty, _ = evaluate_view(empty_d, empty_s, stats)
    ob_far, _ = evaluate_view(far_d, good_s, stats)
    assert ob_good == 1.0 and ob_empty == 0.0 and ob_far == 0.0
    assert 0.0 < hist_good <= 1.0


def test_camera_pose_conventions():
    from tpu3dsis.datagen.virtual_scan import camera_pose

    # pitch +20 looks DOWN (reference: + => down); yaw 0 looks +z
    p = camera_pose(np.array([1.0, 1.5, 1.0]), 0.0, 20.0)
    look = p[:3, 2]
    assert look[2] > 0.9 and look[1] < -0.05
    # rotation part orthonormal
    np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-6)


def test_virtual_scan_end_to_end():
    """SUNCGScan equivalent: key views cover the room, the fused grid
    contains both labeled objects, and instance masks extract."""
    from tpu3dsis.datagen.virtual_scan import ViewGenerator, virtual_scan
    from tpu3dsis.datagen.mesh_render import MeshRenderer

    verts, faces, sem, inst = _room_mesh()
    grid, w2g, cams = virtual_scan(
        verts, faces, sem, inst, voxel_size=0.1, width=48, height=36,
        seed=3, max_views=60,
    )
    assert len(cams) >= 4  # several key views accepted
    occupied = (grid.weight > 0) & (np.abs(grid.sdf) <= 1.0)
    assert occupied.sum() > 300
    labels = set(np.unique(grid.label[occupied])) - {0}
    assert {5, 7} <= labels, labels

    # aabb/mask extraction for the chair (world -> grid coords)
    lo = (w2g @ np.array([1.0, 0, 1.0, 1.0]))[:3]
    hi = (w2g @ np.array([1.8, 0.8, 1.8, 1.0]))[:3]
    # the fused shell sits within ~2 voxels of the exact geometry
    aabb = np.concatenate([lo - 2, hi + 2])
    mask, n_inst, n_occ = grid.instance_mask_for_aabb(aabb, 1)
    assert n_inst > 10
    assert mask.sum() == n_inst


# --- marching tetrahedra (reference MarchingCubes.h debug-mesh parity) -----


def _sphere_sdf(dim=24, radius=8.0):
    c = (dim - 1) / 2.0
    g = np.arange(dim)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - radius)


def test_marching_tets_sphere_geometry():
    from tpu3dsis.datagen.marching_tets import extract_isosurface

    dim, radius = 24, 8.0
    sdf = _sphere_sdf(dim, radius).astype(np.float32)
    verts, faces = extract_isosurface(sdf)
    assert len(faces) > 100 and len(verts) > 50
    c = (dim - 1) / 2.0
    r = np.linalg.norm(verts - c, axis=1)
    # vertices sit on the isosurface of the *sampled* field: within half a
    # voxel of the analytic sphere
    assert abs(r.mean() - radius) < 0.2
    assert np.abs(r - radius).max() < 0.5

    # watertight: the Freudenthal split is translation-consistent, so every
    # edge must bound exactly two triangles
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # outward orientation: triangle normals point away from the center
    # (sdf increases outward)
    tv = verts[faces]
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    outward = (n * (tv.mean(1) - c)).sum(1)
    assert (outward > 0).all()


def test_marching_tets_band_and_invalid_skip():
    from tpu3dsis.datagen.marching_tets import extract_isosurface

    sdf = _sphere_sdf().astype(np.float32)
    # truncation band: skip tets touching |sdf| >= band — surface persists
    # (it lives at |sdf| ~ 0) but nothing is emitted outside the band
    verts, faces = extract_isosurface(sdf, band=2.0)
    assert len(faces) > 100
    # non-finite (never-observed) voxels produce nothing
    empty = np.full((16, 16, 16), -np.inf, np.float32)
    verts, faces = extract_isosurface(empty)
    assert len(faces) == 0
    # constant field: no crossings
    verts, faces = extract_isosurface(np.ones((8, 8, 8), np.float32))
    assert len(faces) == 0


def test_marching_tets_scsdf_to_ply(tmp_path):
    from tpu3dsis.datagen.marching_tets import scsdf_to_ply
    from tpu3dsis.tools.ply import read_ply

    sdf = _sphere_sdf().astype(np.float32)
    path = tmp_path / "s.scsdf"
    tf.save_scsdf(str(path), sdf, 0.05, [1.0, 2.0, 3.0], [2.2, 3.2, 4.2])
    out = tmp_path / "s.ply"
    verts, faces = scsdf_to_ply(str(path), str(out))
    got = read_ply(str(out))
    gv = np.stack(
        [got["vertex"]["x"], got["vertex"]["y"], got["vertex"]["z"]], axis=1
    )
    assert len(gv) == len(verts) and len(got["face"]) == len(faces)
    # placed at bbox_min + voxel_size * p
    lo = np.array([1.0, 2.0, 3.0])
    assert (gv >= lo - 1e-3).all()
    assert (gv <= lo + 0.05 * 24 + 1e-3).all()


def test_fuse_scene_debug_mesh(tmp_path):
    """s_bDebugOut parity: fuse_scene can dump the fused isosurface PLY;
    for a frontal wall at z=1m the mesh must sit at the wall."""
    from tpu3dsis.tools.ply import read_ply

    K = np.eye(4)
    K[0, 0] = K[1, 1] = 50.0
    K[0, 2], K[1, 2] = 32, 24
    depth = np.full((48, 64), 1.0, np.float32)
    out = tmp_path / "debug.ply"
    tf.fuse_scene(
        [(K, np.eye(4), depth)],
        ((-0.3, -0.3, 0.5), (0.3, 0.3, 1.3)),
        voxel_size=0.05,
        pad=4,
        debug_mesh_path=str(out),
    )
    got = read_ply(str(out))
    z = got["vertex"]["z"]
    assert len(z) > 20
    assert np.abs(z - 1.0).max() < 0.08  # within ~1.5 voxels of the wall


def _write_sens(path, frames):
    """Minimal ScanNet .sens writer (the public SensorData binary layout
    prepare_2d.SensFile parses) for synthetic frame fixtures."""
    import io
    import struct
    import zlib

    from PIL import Image

    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"synth"
        f.write(struct.pack("<Q", len(name)))
        f.write(name)
        eye = np.eye(4, dtype=np.float32)
        for _ in range(4):
            f.write(eye.tobytes())
        f.write(struct.pack("<ii", 1, 2))  # compression tags (reader skips)
        h, w = frames[0][1].shape[:2]
        dh, dw = frames[0][2].shape
        f.write(struct.pack("<II", w, h))
        f.write(struct.pack("<II", dw, dh))
        f.write(struct.pack("<f", 1000.0))
        f.write(struct.pack("<Q", len(frames)))
        for pose, color, depth in frames:
            f.write(pose.astype(np.float32).tobytes())
            f.write(struct.pack("<QQ", 0, 0))  # timestamps
            buf = io.BytesIO()
            Image.fromarray(color).save(buf, format="JPEG")
            cj = buf.getvalue()
            dz = zlib.compress(depth.tobytes())
            f.write(struct.pack("<QQ", len(cj), len(dz)))
            f.write(cj)
            f.write(dz)


def test_prepare_2d_label_export_roundtrip(tmp_path, rng):
    """.sens + raw label pngs -> export_frames(label_dir=...) -> the mapped
    label frames USE_IMAGES_GT runs read back via io.frames
    (prepare_2d_data.py:38-56,84-108 parity: nearest resize + raw->nyu40
    remap, unmapped ids pass through)."""
    from PIL import Image

    from tpu3dsis.datagen.prepare_2d import (
        export_frames,
        map_label_image,
        read_scannet_label_mapping,
    )

    n_frames, W, H = 5, 32, 24
    frames = []
    for i in range(n_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = float(i)
        color = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        depth = (rng.rand(12, 16) * 4000).astype(np.uint16)
        frames.append((pose, color, depth))
    sens_path = str(tmp_path / "scene.sens")
    _write_sens(sens_path, frames)

    # raw label pngs for every raw frame index (scene*/label-filt layout)
    label_dir = tmp_path / "label-filt"
    label_dir.mkdir()
    raws = {}
    for i in range(n_frames):
        raw = rng.choice([0, 3, 7, 1200], size=(H, W)).astype(np.uint16)
        Image.fromarray(raw).save(str(label_dir / f"{i}.png"))
        raws[i] = raw

    tsv = tmp_path / "labels.combined.tsv"
    tsv.write_text("id\traw_category\tnyu40id\n3\tchair\t5\n7\ttable\t39\n"
                   "1200\tcustom\t\n")
    mapping = read_scannet_label_mapping(str(tsv))
    assert mapping == {3: 5, 7: 39, 1200: 0}

    out = tmp_path / "frames" / "scene"
    export_frames(sens_path, str(out), frame_skip=2, image_size=(W, H),
                  label_dir=str(label_dir), label_mapping=mapping)

    for i in (0, 2, 4):
        for sub, ext in (("color", "jpg"), ("depth", "png"),
                         ("pose", "txt"), ("label", "png")):
            assert (out / sub / f"{i}.{ext}").exists(), (i, sub)
        got = np.array(Image.open(str(out / "label" / f"{i}.png")))
        # same size => nearest resize is identity; remap per the tsv
        np.testing.assert_array_equal(got, map_label_image(raws[i], mapping))
        assert got.dtype == np.uint8
        assert set(np.unique(got)) <= {0, 5, 39}
    assert not (out / "label" / "1.png").exists()  # frame_skip respected

    # downstream round trip: io/frames.py::load_label_image reads the export
    from tpu3dsis.io.frames import load_label_image

    img = load_label_image(str(out / "label" / "0.png"), (W, H),
                           mapping={5: 2, 39: 4})
    assert img.shape == (H, W, 1)
    assert set(np.unique(img)) <= {0.0, 2.0, 4.0}
