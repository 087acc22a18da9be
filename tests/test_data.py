"""Data layer: COLMAP binary round-trip, Blender reader, scene assembly,
config system round-trip."""
import json
import os
import struct

import numpy as np
import pytest

from tpu_splat.data.colmap import (
    read_model,
    qvec2rotmat,
    CAMERA_MODELS,
)
from tpu_splat.data.readers import (
    read_blender_scene,
    read_colmap_scene,
    detect_scene_type,
    resolution_policy,
    nerfpp_norm,
)


def _write_colmap_bin(sparse, n_imgs=4, w=64, h=48):
    os.makedirs(sparse, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))  # id 1, PINHOLE
        f.write(struct.pack("<dddd", 60.0, 60.0, w / 2, h / 2))
    # images.bin
    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    # points3D.bin
    n_pts = 50
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(
                struct.pack(
                    "<QdddBBBd", i, *rng.normal(size=3), 100, 150, 200, 0.5
                )
            )
            f.write(struct.pack("<Q", 0))
    return n_imgs, n_pts


def test_colmap_bin_roundtrip(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    n_imgs, n_pts = _write_colmap_bin(sparse)
    cams, imgs, (xyz, rgb, err) = read_model(sparse)
    assert len(cams) == 1 and cams[1].model == "PINHOLE"
    assert len(imgs) == n_imgs
    assert xyz.shape == (n_pts, 3)
    assert rgb[0].tolist() == [100, 150, 200]
    R = qvec2rotmat(imgs[1].qvec)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def _write_blender_scene(root, n=3, size=32):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(n):
        name = f"r_{i}"
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, name + ".png"))
        # simple c2w: camera on +z looking at origin (OpenGL convention)
        c2w = np.eye(4)
        c2w[2, 3] = 4.0 + i * 0.1
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


def test_blender_reader(tmp_path):
    root = str(tmp_path / "scene")
    _write_blender_scene(root)
    assert detect_scene_type(root) == "Blender"
    info = read_blender_scene(root, num_points=500)
    assert len(info.train_cameras) == 3
    xyz, rgb = info.point_cloud
    assert xyz.shape == (500, 3)
    assert np.abs(xyz).max() <= 1.3
    assert info.radius > 0
    ci = info.train_cameras[0]
    # OpenGL camera at +z looking -z -> after flip, forward +z view dir
    center = -ci.R @ ci.T
    np.testing.assert_allclose(center, [0, 0, 4.0], atol=1e-6)


def test_scene_assembly(tmp_path):
    from tpu_splat.data.scene import Scene

    root = str(tmp_path / "scene")
    _write_blender_scene(root, n=4)
    scene = Scene(root, str(tmp_path / "model"), shuffle=False)
    assert len(scene.train_cameras) == 4
    lc = scene.train_cameras[0]
    assert lc.image.shape == (32, 32, 3)
    assert lc.camera.height == 32
    scene.save_cameras_json()
    assert os.path.exists(os.path.join(str(tmp_path / "model"), "cameras.json"))


def test_resolution_policy():
    assert resolution_policy(1600, 1200, -1) == (900, 675)
    assert resolution_policy(800, 600, -1) == (800, 600)
    assert resolution_policy(800, 600, 2) == (400, 300)
    assert resolution_policy(800, 600, 400) == (400, 300)


def test_config_roundtrip(tmp_path):
    from tpu_splat.config import (
        build_parser,
        save_cfg_args,
        get_combined_args,
        OptimizationParams,
        ModelParams,
    )

    parser = build_parser()
    args = parser.parse_args(
        ["-s", "/data/lego", "-m", str(tmp_path), "--iterations", "100", "-w"]
    )
    assert args.white_background is True
    opt = OptimizationParams.extract(args)
    assert opt.iterations == 100
    assert opt.refl_lr == 0.006  # reference default preserved
    save_cfg_args(str(tmp_path), args)
    # render-time parser merges persisted flags
    parser2 = build_parser(fill_none_model=True)
    merged = get_combined_args(parser2, ["-m", str(tmp_path)])
    assert merged.source_path == "/data/lego"
    assert merged.iterations == 100


def test_positive_alias_flags():
    from tpu_splat.config import build_parser

    parser = build_parser()
    args = parser.parse_args(["--normal_propagation", "--color_sabotage"])
    assert args.normal_propagation is True
