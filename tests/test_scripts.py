"""End-to-end CLI flow: train -> render -> metrics -> fps on a tiny scene."""
import json
import os

import numpy as np
import pytest


def _make_scene(root, n=4, size=32):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        name = f"r_{i}"
        img = np.zeros((size, size, 3), np.uint8)
        img[8:24, 8:24] = [200, 60, 60]  # a red square to fit
        Image.fromarray(img).save(os.path.join(root, name + ".png"))
        ang = 2 * np.pi * i / n
        c2w = np.eye(4)
        # camera orbiting origin at radius 4 (OpenGL convention pre-flip)
        pos = np.array([4 * np.sin(ang), 0.0, 4 * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)  # looks at origin (-z OpenGL)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up) if abs(fwd[1]) < 0.9 else np.array([1.0, 0, 0])
        right = right / np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        c2w[:3, 0] = right
        c2w[:3, 1] = up2
        c2w[:3, 2] = -fwd  # OpenGL: camera looks down -z
        c2w[:3, 3] = pos
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    with open(os.path.join(root, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames[:1]}, f)


@pytest.mark.slow
def test_cli_train_render_metrics(tmp_path):
    from tpu_splat.scripts import train as train_cli
    from tpu_splat.scripts import render as render_cli
    from tpu_splat.scripts import metrics as metrics_cli

    src = str(tmp_path / "scene")
    out = str(tmp_path / "model")
    _make_scene(src)

    train_cli.main(
        [
            "-s", src, "-m", out, "--eval", "--disable_viewer",
            "--iterations_override", "30",
            "--num_points", "300",
            "--init_until_iter", "5",
            "--save_iterations", "30",
            "--cubemap_resol", "8",
            "--max_tiles_per_gaussian", "8",
            "--max_instances", "8192",
            "--tile_depth", "256",
        ]
    )
    ply = os.path.join(out, "point_cloud", "iteration_30", "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(out, "cfg_args"))
    assert os.path.exists(os.path.join(out, "cameras.json"))

    render_cli.main(["-m", out, "--skip_train"])
    renders = os.path.join(out, "test", "ours_30", "renders")
    assert len(os.listdir(renders)) == 1
    assert os.path.exists(os.path.join(out, "env_cood1.png"))

    metrics_cli.main(["-m", out])
    with open(os.path.join(out, "results.json")) as f:
        res = json.load(f)
    psnr = res["ours_30"]["PSNR"]
    assert np.isfinite(psnr) and psnr > 5.0, res


@pytest.mark.slow
def test_cli_train_mesh_modes(tmp_path):
    """--mesh tiles|dp train the same tiny scene on the virtual 8-device CPU
    mesh through the real CLI (multi-chip wiring, VERDICT r2 item 4)."""
    from tpu_splat.scripts import train as train_cli

    src = str(tmp_path / "scene")
    _make_scene(src)
    common = [
        "-s", src, "--eval", "--disable_viewer",
        "--iterations_override", "8",
        "--num_points", "200",
        "--init_until_iter", "2",
        "--save_iterations", "8",
        "--cubemap_resol", "8",
        "--max_tiles_per_gaussian", "8",
        "--max_instances", "8192",
        "--tile_depth", "256",
    ]
    for mode, ndev in (("tiles", 2), ("dp", 3)):
        out = str(tmp_path / f"model_{mode}")
        train_cli.main(
            common + ["-m", out, "--mesh", mode, "--mesh_devices", str(ndev)]
        )
        assert os.path.exists(
            os.path.join(out, "point_cloud", "iteration_8", "point_cloud.ply")
        )
