"""Eval tooling: image utils, diff-map sheets, extract_metrics, smooth_loss,
checkpoint model-only restore."""
import json
import os

import numpy as np


def test_psnr_and_gradient_maps():
    from tpu_splat.eval.image_utils import (
        gradient_map,
        normalized_psnr_map,
        psnr_map,
        to_3ch,
    )

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = a.copy()
    b[:8] = rng.uniform(0, 1, (8, 16, 3))
    p = psnr_map(a, b)
    assert p.shape == (16, 16, 1)
    assert np.isinf(p[12, 4, 0])  # identical half -> inf PSNR
    n = normalized_psnr_map(a, b)
    assert np.isfinite(n).all() and n.min() >= 0 and n.max() <= 1
    g = gradient_map(a)
    assert g.shape == (16, 16, 1) and g.max() <= 1.0
    assert to_3ch(np.zeros((4, 4))).shape == (4, 4, 3)


def test_make_grid_and_plot_cubemap():
    from tpu_splat.eval.image_utils import make_grid, plot_cubemap

    tiles = [np.full((8, 8, 3), i / 10, np.float32) for i in range(5)]
    grid = make_grid(tiles, nrow=5, pad=2)
    assert grid.shape == (12, 52, 3)
    assert np.allclose(grid[2:10, 2:10], 0.0)

    faces = np.arange(6, dtype=np.float32)[:, None, None, None] * np.ones(
        (6, 4, 4, 3), np.float32
    )
    cross = plot_cubemap(faces)
    assert cross.shape == (12, 16, 3)
    assert cross[2, 6, 0] == 2.0  # +y on top
    assert cross[6, 2, 0] == 1.0  # -x left


def test_view_diff_maps_sheets(tmp_path):
    from PIL import Image

    from tpu_splat.scripts.view_diff_maps import main

    rng = np.random.default_rng(1)
    method = tmp_path / "model" / "test" / "ours_10"
    for sub in ("renders", "gt"):
        os.makedirs(method / sub)
    for i in range(3):
        img = (rng.uniform(0, 255, (24, 24, 3))).astype(np.uint8)
        Image.fromarray(img).save(method / "renders" / f"{i:05d}.png")
        Image.fromarray(img // 2).save(method / "gt" / f"{i:05d}.png")
    rc = main(["-m", str(tmp_path / "model"), "--views_per_sheet", "2"])
    assert rc == 0
    sheets = os.listdir(method / "diff_maps")
    assert len(sheets) == 2  # 2 views + 1 remainder


def test_extract_metrics_csv(tmp_path):
    from tpu_splat.scripts.extract_metrics import main

    scene = tmp_path / "lego"
    os.makedirs(scene)
    with open(scene / "fps.txt", "w") as f:
        f.write("fps:42.5\ncount:1000\n")
    with open(scene / "results.json", "w") as f:
        json.dump(
            {
                "ours_10": {"PSNR": 20.0, "SSIM": 0.8, "LPIPS": 0.1},
                "ours_20": {"PSNR": 25.0, "SSIM": 0.9, "LPIPS": 0.05},
            },
            f,
        )
    rc = main(["--output_path", str(tmp_path)])
    assert rc == 0
    rows = open(tmp_path / "results.csv").read().strip().split("\n")
    assert rows[0].split("\t")[0] == "lego"
    assert rows[1].split("\t")[0] == "25.0"  # highest-iteration method wins
    assert rows[4].split("\t")[0] == "42.5"
    assert rows[5].split("\t")[0] == "1000"


def test_smooth_loss_edge_aware():
    import jax.numpy as jnp

    from tpu_splat.train.losses import smooth_loss

    rng = np.random.default_rng(2)
    disp = jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32))
    flat_img = jnp.zeros((16, 16, 3))
    edgy_img = jnp.asarray(rng.uniform(0, 50, (16, 16, 3)).astype(np.float32))
    # image edges should suppress the penalty
    assert float(smooth_loss(disp, edgy_img)) < float(smooth_loss(disp, flat_img))
    assert float(smooth_loss(jnp.ones((16, 16)), flat_img)) == 0.0


def test_checkpoint_gaussians_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tpu_splat.model import init_from_pcd
    from tpu_splat.model.io import load_checkpoint_gaussians, save_checkpoint
    from tpu_splat.model.optim import adam_init
    from tpu_splat.train.step import TrainState

    class _Opt:
        opacity_lr = 0.05

    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, capacity=64, cubemap_resolution=8)
    ts = TrainState.create(state, _Opt())

    path = str(tmp_path / "chkpnt5.npz")
    save_checkpoint(path, ts, 5)
    restored, it = load_checkpoint_gaussians(path)
    assert it == 5
    assert restored.capacity == 64
    np.testing.assert_allclose(np.asarray(restored.xyz), np.asarray(state.xyz))
    np.testing.assert_allclose(
        np.asarray(restored.env.texture), np.asarray(state.env.texture)
    )
    assert int(np.asarray(restored.alive).sum()) == 32


def test_checkpoint_isp_roundtrip_and_apply(tmp_path):
    """The trained ISP rides the checkpoint and changes eval renders: per-frame
    transform for train views, controller for frame_idx=-1 (test views) —
    the reference applies PPISP to every eval render (render.py:59,89-90)."""
    import jax.numpy as jnp

    from tpu_splat.isp.ppisp import apply_isp
    from tpu_splat.model import init_from_pcd
    from tpu_splat.model.io import (
        load_checkpoint_gaussians,
        load_checkpoint_isp,
        save_checkpoint,
    )
    from tpu_splat.train.step import TrainState

    class _Opt:
        opacity_lr = 0.05

    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (16, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, capacity=32, cubemap_resolution=8)
    ts = TrainState.create(state, _Opt(), num_frames=3)
    # make frame 1 and the controller visibly non-identity
    isp = ts.isp
    isp = isp._replace(
        gain=isp.gain.at[1].mul(1.5),
        ctrl_bias=isp.ctrl_bias + 0.25,
    )
    ts = ts.replace(isp=isp)

    path = str(tmp_path / "chkpnt7.npz")
    save_checkpoint(path, ts, 7)
    _, it = load_checkpoint_gaussians(path)
    restored = load_checkpoint_isp(path)
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(restored.gain), np.asarray(isp.gain), rtol=1e-6
    )

    img = jnp.full((8, 8, 3), 0.5)
    own = apply_isp(restored, img, frame_idx=1)
    ident = apply_isp(restored, img, frame_idx=0)
    ctrl = apply_isp(restored, img, frame_idx=-1)
    assert float(jnp.max(jnp.abs(own - img))) > 0.1  # frame 1 transform applied
    np.testing.assert_allclose(np.asarray(ident), np.asarray(img), atol=1e-5)
    assert float(jnp.max(jnp.abs(ctrl - img))) > 0.1  # controller bias applied

    # ISP-less checkpoints (post_process=False) restore as None
    ts0 = TrainState.create(state, _Opt())
    p0 = str(tmp_path / "chkpnt0.npz")
    save_checkpoint(p0, ts0, 1)
    assert load_checkpoint_isp(p0) is None


def test_scene_frame_idx_matches_training_order(tmp_path):
    """Unshuffled Scene loads (render/eval tools) recover the training-order
    frame index through the same seeded permutation."""
    import random

    n = 7
    perm = list(range(n))
    random.Random(0).shuffle(perm)
    # invert the permutation the way Scene does
    inv = [0] * n
    for j, i in enumerate(perm):
        inv[i] = j
    for orig_idx in range(n):
        # camera at unshuffled position orig_idx sits at shuffled position
        # inv[orig_idx]; the shuffled (training) list at that position must
        # be the same camera
        assert perm[inv[orig_idx]] == orig_idx


def test_failure_snapshot_dump(tmp_path):
    """Non-finite-loss / overflow snapshots contain replayable rasterizer
    inputs (reference diff_surfel_rasterization/__init__.py:91-98) and the
    first dump is never overwritten."""
    from tpu_splat.core.graphics import Camera
    from tpu_splat.model import init_from_pcd
    from tpu_splat.train.debug_dump import dump_snapshot

    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (8, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, capacity=16, cubemap_resolution=8)
    cam = Camera.create(
        R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=1.0, height=32, width=32
    )
    gt = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)

    p = dump_snapshot(str(tmp_path), state, cam, gt, 123, "non-finite loss nan")
    assert p and os.path.exists(p)
    z = np.load(p)
    assert str(z["reason"]) == "non-finite loss nan"
    assert int(z["iteration"]) == 123
    np.testing.assert_allclose(z["xyz"], np.asarray(state.xyz))
    assert z["cam_world_view"].shape == (4, 4)
    assert z["gt_image"].shape == (32, 32, 3)

    # second failure must NOT clobber the first snapshot
    p2 = dump_snapshot(str(tmp_path), state, cam, gt, 456, "later failure")
    assert p2 == ""
    assert int(np.load(p)["iteration"]) == 123


def test_torch_map_sidecar_roundtrip(tmp_path):
    """A real torch-saved reference `.map` state dict loads through the
    stdlib torch-pickle reader (VERDICT: reference-checkpoint import)."""
    import torch

    from tpu_splat.model.io import load_envmap

    tex = torch.rand(6, 3, 16, 16) - 0.5
    failv = torch.zeros(3) + 0.25
    sd = {"params.Cubemap_texture": tex, "params.Cubemap_failv": failv}
    p = tmp_path / "point_cloud.map"
    torch.save(sd, str(p))

    env = load_envmap(str(p))
    np.testing.assert_allclose(np.asarray(env.texture), tex.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(env.fail_value), failv.numpy(), atol=0)


def test_torch_pickle_parameter_and_noncontiguous(tmp_path):
    import torch

    from tpu_splat.model.torch_pickle import load_torch_state_dict

    t = torch.arange(24, dtype=torch.float32).reshape(4, 6).t()  # transposed view
    obj = {"p": torch.nn.Parameter(torch.ones(2, 3)), "t": t,
           "i": torch.arange(5), "s": 3, "name": "x"}
    p = tmp_path / "obj.pt"
    torch.save(obj, str(p))
    out = load_torch_state_dict(str(p))
    np.testing.assert_allclose(out["p"], np.ones((2, 3)))
    np.testing.assert_allclose(out["t"], t.numpy())
    np.testing.assert_array_equal(out["i"], np.arange(5))
    assert out["s"] == 3 and out["name"] == "x"
