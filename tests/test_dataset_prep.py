"""Dataset prep: COLMAP model write/read round-trips, depth-scale fit,
BlenderNeRF fixer, cfg_args rewriter."""
import json
import os
from pathlib import Path

import numpy as np


def _toy_model():
    from tpu_splat.data.colmap import ColmapCamera, ColmapImage

    cams = {
        1: ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))
    }
    rng = np.random.default_rng(0)
    imgs = {}
    for i in (1, 2):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i] = ColmapImage(
            i, q, rng.normal(size=3), 1, f"im_{i}.png",
            xys=rng.uniform(0, 48, (5, 2)),
            point3d_ids=np.array([1, 2, 3, -1, 4], np.int64),
        )
    xyz = rng.normal(size=(4, 3))
    rgb = rng.integers(0, 255, (4, 3)).astype(np.uint8)
    err = rng.uniform(0, 1, 4)
    return cams, imgs, (xyz, rgb, err)


def _check_roundtrip(tmp_path, ext):
    from tpu_splat.data.colmap import read_model, write_model

    cams, imgs, pts = _toy_model()
    d = str(tmp_path / ext.strip("."))
    write_model(cams, imgs, pts, d, ext=ext)
    rcams, rimgs, rpts = read_model(d, with_points2d=True)
    assert rcams[1].model == "PINHOLE"
    np.testing.assert_allclose(rcams[1].params, cams[1].params)
    for i in (1, 2):
        np.testing.assert_allclose(rimgs[i].qvec, imgs[i].qvec, atol=1e-12)
        np.testing.assert_allclose(rimgs[i].tvec, imgs[i].tvec, atol=1e-12)
        assert rimgs[i].name == imgs[i].name
        np.testing.assert_allclose(rimgs[i].xys, imgs[i].xys, atol=1e-9)
        np.testing.assert_array_equal(rimgs[i].point3d_ids, imgs[i].point3d_ids)
    np.testing.assert_allclose(rpts[0], pts[0], atol=1e-12)
    np.testing.assert_array_equal(rpts[1], pts[1])


def test_colmap_write_read_bin(tmp_path):
    _check_roundtrip(tmp_path, ".bin")


def test_colmap_write_read_txt(tmp_path):
    _check_roundtrip(tmp_path, ".txt")


def test_make_depth_scale(tmp_path):
    from PIL import Image

    from tpu_splat.data.colmap import (
        ColmapCamera,
        ColmapImage,
        write_model,
    )
    from tpu_splat.scripts.make_depth_scale import main

    rng = np.random.default_rng(1)
    W, H = 64, 48
    fx = fy = 60.0
    cams = {1: ColmapCamera(1, "PINHOLE", W, H, np.array([fx, fy, W / 2, H / 2]))}

    # identity pose; points in front of the camera
    n_pts = 60
    depth = rng.uniform(2.0, 6.0, n_pts)
    x = rng.uniform(-0.4, 0.4, n_pts) * depth
    y = rng.uniform(-0.3, 0.3, n_pts) * depth
    xyz = np.stack([x, y, depth], axis=1)
    u = fx * x / depth + W / 2
    v = fy * y / depth + H / 2

    imgs = {
        1: ColmapImage(
            1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "im_1.png",
            xys=np.stack([u, v], axis=1),
            point3d_ids=np.arange(1, n_pts + 1, dtype=np.int64),
        )
    }
    base = tmp_path / "scene"
    write_model(
        cams, imgs,
        (xyz, np.zeros((n_pts, 3), np.uint8), np.zeros(n_pts)),
        str(base / "sparse" / "0"), ext=".bin",
    )

    # synthetic inverse mono-depth: invmono = (invdepth - off) / sc
    sc, off = 2.0, 0.1
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    r = np.sqrt(((uu - W / 2) / fx) ** 2 + ((vv - H / 2) / fy) ** 2)
    # a smooth field whose value at each keypoint approximates the true
    # inverse depth of the point that projects there
    invd_img = np.full((H, W), 1.0 / 4.0)
    for ui, vi, di in zip(u, v, depth):
        yi, xi = int(round(vi)), int(round(ui))
        invd_img[max(yi - 1, 0) : yi + 2, max(xi - 1, 0) : xi + 2] = 1.0 / di
    invmono = (invd_img - off) / sc
    depths = tmp_path / "depths"
    os.makedirs(depths)
    img16 = np.clip(invmono * (2**16), 0, 2**16 - 1).astype(np.uint16)
    Image.fromarray(img16).save(depths / "im_1.png")

    rc = main(["--base_dir", str(base), "--depths_dir", str(depths)])
    assert rc == 0
    params = json.load(open(base / "sparse" / "0" / "depth_params.json"))
    assert "im_1" in params
    # recovered scale/offset map mono back to colmap inverse depth
    got = params["im_1"]
    assert abs(got["scale"] - sc) / sc < 0.2
    assert abs(got["offset"] - off) < 0.1


def test_fix_blendernerf_dataset(tmp_path):
    from tpu_splat.scripts.fix_blendernerf_dataset import main

    scene = tmp_path / "scene"
    (scene / "train").mkdir(parents=True)
    frames = [
        {"file_path": f"train/r_{i}.png", "transform_matrix": np.eye(4).tolist()}
        for i in range(16)
    ]
    with open(scene / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)

    rc = main([str(scene), "--step", "8"])
    assert rc == 0
    train = json.load(open(scene / "transforms_train.json"))
    test = json.load(open(scene / "transforms_test.json"))
    assert len(train["frames"]) == 14 and len(test["frames"]) == 2
    assert train["frames"][0]["file_path"].startswith("rgb/")
    assert not train["frames"][0]["file_path"].endswith(".png")
    assert (scene / "rgb").is_dir()
    assert (scene / "transforms_train_original.json.bak").exists()


def test_fix_update_cfg_args(tmp_path):
    from argparse import Namespace

    from tpu_splat.scripts.fix_update_cfg_args import main

    model = tmp_path / "out" / "lego"
    model.mkdir(parents=True)
    ns = Namespace(source_path="/mnt/data/nerf/lego", model_path="/old/lego",
                   white_background=True)
    with open(model / "cfg_args", "w") as f:
        f.write(str(ns))

    rc = main([
        "--root", str(tmp_path / "out"),
        "--dataset_dir", str(tmp_path / "data"),
    ])
    assert rc == 0
    got = eval(open(model / "cfg_args").read(), {"Namespace": Namespace})
    assert got.model_path == str(model)
    assert got.source_path == str(tmp_path / "data" / "nerf" / "lego")
