"""Mesh extraction: marching tetrahedra + TSDF fusion + PLY writer."""
import os

import numpy as np


def _sphere_sdf(n=48, r=0.6):
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - r, 2.0 / (n - 1)


def test_marching_tets_sphere():
    from tpu_splat.eval.mesh import marching_tetrahedra

    n, r = 48, 0.6
    sdf, spacing = _sphere_sdf(n, r)
    mesh = marching_tetrahedra(sdf, 0.0, origin=(-1, -1, -1), spacing=spacing)
    assert len(mesh.vertices) > 500 and len(mesh.faces) > 1000
    d = np.linalg.norm(mesh.vertices, axis=1)
    # every vertex sits on the sphere to within a voxel
    assert np.abs(d - r).max() < 1.5 * spacing
    # closed surface: every edge shared by exactly 2 faces
    f = np.asarray(mesh.faces)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # outward orientation: face normals point away from the center
    v = mesh.vertices
    nrm = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    c = v[f].mean(axis=1)
    outward = (np.einsum("ij,ij->i", nrm, c) > 0).mean()
    assert outward > 0.99


def test_marching_tets_empty():
    from tpu_splat.eval.mesh import marching_tetrahedra

    mesh = marching_tetrahedra(np.ones((8, 8, 8)))
    assert len(mesh.vertices) == 0 and len(mesh.faces) == 0


def test_tsdf_fusion_plane():
    from tpu_splat.eval.mesh import extract_mesh_tsdf

    # one camera at origin looking down +z at a wall z=2
    H = W = 64
    fx = fy = 60.0
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]])
    w2c = np.eye(4)
    depth = np.full((H, W), 2.0)
    color = np.zeros((H, W, 3))
    color[..., 0] = 1.0
    alpha = np.ones((H, W))

    mesh = extract_mesh_tsdf(
        [depth], [color], [alpha], [K], [w2c],
        bounds_min=np.array([-0.5, -0.5, 1.0]),
        bounds_max=np.array([0.5, 0.5, 3.0]),
        resolution=48,
    )
    assert len(mesh.vertices) > 100
    frontal = mesh.vertices[np.abs(mesh.vertices[:, :2]).max(axis=1) < 0.3]
    # TSDF produces a closed shell: a front face at z=2 and a back face one
    # truncation band behind; the FRONT surface must sit on the true wall
    spacing = 2.0 / 47
    front = frontal[frontal[:, 2] < 2.0 + 2 * spacing]
    assert len(front) > 50
    assert np.abs(front[:, 2] - 2.0).max() < 1.5 * spacing
    assert mesh.colors is not None
    assert mesh.colors[:, 0].mean() > 150  # red wall


def test_save_mesh_ply_roundtrip(tmp_path):
    from tpu_splat.eval.mesh import Mesh, save_mesh_ply

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    path = str(tmp_path / "m.ply")
    save_mesh_ply(Mesh(verts, faces, cols), path)
    data = open(path, "rb").read()
    assert b"element vertex 3" in data and b"element face 1" in data
    body = data[data.index(b"end_header\n") + 11 :]
    assert len(body) == 3 * (12 + 3) + 1 * (1 + 12)


def test_generate_path_orbits_training_cloud():
    """generate_path (PCA recenter -> ellipse -> warp back; reference
    render_utils.py:176-208) produces cameras that orbit around the
    training-camera centroid at a comparable radius, looking inward."""
    import numpy as np

    from tpu_splat.data import orbit_camera
    from tpu_splat.eval.trajectories import generate_path

    class _LC:
        def __init__(self, cam):
            self.camera = cam

    rng = np.random.default_rng(0)
    cams = [
        _LC(orbit_camera(32, 32, radius=4.0, azimuth=a, elevation=0.3 + e))
        for a, e in zip(np.linspace(0, 5.5, 12), 0.05 * rng.normal(size=12))
    ]
    path = generate_path(cams, n_frames=24)
    assert len(path) == 24
    train_c = np.stack([np.asarray(l.camera.camera_center) for l in cams])
    path_c = np.stack([np.asarray(c.camera_center) for c in path])
    r_train = np.linalg.norm(train_c - train_c.mean(0), axis=1).mean()
    r_path = np.linalg.norm(path_c - train_c.mean(0), axis=1).mean()
    assert 0.4 * r_train < r_path < 2.0 * r_train
    # every path camera faces the cloud center (forward row of world_view)
    for c in path:
        W = np.asarray(c.world_view)
        fwd_w = W[:3, :3].T @ np.array([0.0, 0.0, 1.0])
        to_center = train_c.mean(0) - np.asarray(c.camera_center)
        to_center /= np.linalg.norm(to_center) + 1e-9
        assert fwd_w @ to_center > 0.3
