"""Calibrated LPIPS: structure equivalence against a torch replica of the
reference implementation (lpipsPyTorch/modules/{lpips,networks,utils}.py),
driven by synthetic weights saved in the torchvision / richzhang key formats
(no pretrained files exist in this zero-egress image)."""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _make_vgg_state_dict(rng):
    """Random VGG16-features-shaped state dict (torchvision key layout)."""
    from tpu_splat.eval.lpips import _VGG16_PLAN

    sd = {}
    idx, cin = 0, 3
    for spec in _VGG16_PLAN:
        if spec == "M":
            idx += 1
            continue
        # small weights so activations stay finite through 13 convs
        w = rng.normal(0, 0.08, (spec, cin, 3, 3)).astype(np.float32)
        b = rng.normal(0, 0.01, (spec,)).astype(np.float32)
        sd[f"features.{idx}.weight"] = torch.from_numpy(w)
        sd[f"features.{idx}.bias"] = torch.from_numpy(b)
        idx += 2
        cin = spec
    return sd


def _make_lin_state_dict(rng):
    chans = [64, 128, 256, 512, 512]
    return {
        f"lin{i}.model.1.weight": torch.from_numpy(
            rng.uniform(0, 0.3, (1, c, 1, 1)).astype(np.float32)
        )
        for i, c in enumerate(chans)
    }


def _torch_reference_lpips(vgg_sd, lin_sd, x_np, y_np):
    """Faithful torch replica of the reference LPIPS forward
    (lpipsPyTorch/modules/lpips.py:30-36, networks.py BaseNet.forward:52-63,
    utils.py normalize_activation) without torchvision: the VGG16 feature
    stack is rebuilt op-by-op from the same plan."""
    import torch.nn.functional as F

    from tpu_splat.eval.lpips import (
        _LPIPS_SCALE,
        _LPIPS_SHIFT,
        _VGG16_PLAN,
        _VGG16_TAPS,
    )

    shift = torch.from_numpy(_LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.from_numpy(_LPIPS_SCALE).view(1, 3, 1, 1)

    def features(t):
        x = (t - shift) / scale
        out = []
        idx = 0  # torchvision module index (conv at idx, relu idx+1, pool 1 slot)
        for spec in _VGG16_PLAN:
            if spec == "M":
                x = F.max_pool2d(x, 2, 2)
                idx += 1
            else:
                w = vgg_sd[f"features.{idx}.weight"]
                b = vgg_sd[f"features.{idx}.bias"]
                x = F.relu(F.conv2d(x, w, b, padding=1))
                idx += 2
            # reference taps with 1-based enumeration AFTER applying module
            # #idx (networks.py:56-60): 1-based index of the last module = idx
            if idx in _VGG16_TAPS:
                n = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
                out.append(x / (n + 1e-10))
        return out

    x = torch.from_numpy(x_np.transpose(2, 0, 1)[None])
    y = torch.from_numpy(y_np.transpose(2, 0, 1)[None])
    fx, fy = features(x), features(y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        lw = lin_sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, lw).mean((2, 3), True)
    return float(total)


def test_lpips_matches_reference_structure(tmp_path):
    rng = np.random.default_rng(0)
    vgg_sd = _make_vgg_state_dict(rng)
    lin_sd = _make_lin_state_dict(rng)
    vgg_path = tmp_path / "vgg16-synthetic.pth"
    lin_path = tmp_path / "lpips_vgg_synthetic.pth"
    torch.save(vgg_sd, str(vgg_path))
    torch.save(lin_sd, str(lin_path))

    from tpu_splat.eval.lpips import _load_torch_state_dict, _LpipsVgg

    model = _LpipsVgg(
        _load_torch_state_dict(str(vgg_path)), _load_torch_state_dict(str(lin_path))
    )
    a = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    ours = model(a, b)
    ref = _torch_reference_lpips(vgg_sd, lin_sd, a, b)
    assert ours == pytest.approx(ref, abs=1e-4)
    assert model(a, a) == pytest.approx(0.0, abs=1e-6)


def test_torch_map_writer_roundtrip(tmp_path):
    """save_torch_state_dict emits a REAL torch.save-compatible zip: read
    back both by actual torch.load (incl. weights_only safe mode — what a
    reference install does at scene/gaussian_model.py:331-333) and by our
    stdlib reader, bit-identical."""
    from tpu_splat.model.torch_pickle import (
        load_torch_state_dict,
        save_torch_state_dict,
    )

    rng = np.random.default_rng(3)
    d = {
        "params.Cubemap_texture": rng.normal(size=(6, 3, 8, 8)).astype(
            np.float32
        ),
        "params.Cubemap_failv": rng.normal(size=(3,)).astype(np.float32),
    }
    p = str(tmp_path / "model.map")
    save_torch_state_dict(p, d)

    via_torch = torch.load(p, map_location="cpu", weights_only=True)
    via_ours = load_torch_state_dict(p)
    for k, v in d.items():
        np.testing.assert_array_equal(via_torch[k].numpy(), v)
        np.testing.assert_array_equal(via_ours[k], v)


def test_save_ply_reference_map_sidecar(tmp_path):
    """save_ply writes BOTH sidecars; the torch-format .map round-trips
    through load_envmap (the reference-interop path) with the identical
    texture."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_splat.model import init_from_pcd
    from tpu_splat.model.io import load_envmap, save_ply

    rng = np.random.default_rng(4)
    state = init_from_pcd(
        rng.uniform(-1, 1, (16, 3)).astype(np.float32),
        rng.uniform(0, 1, (16, 3)).astype(np.float32),
        capacity=16,
        cubemap_resolution=8,
    )
    p = str(tmp_path / "point_cloud.ply")
    save_ply(state, p)
    assert (tmp_path / "point_cloud.map").exists()
    assert (tmp_path / "point_cloud.map.npz").exists()

    env_t = load_envmap(str(tmp_path / "point_cloud.map"))
    np.testing.assert_array_equal(
        np.asarray(env_t.texture), np.asarray(state.env.texture)
    )
    np.testing.assert_array_equal(
        np.asarray(env_t.fail_value), np.asarray(state.env.fail_value)
    )
    sd = torch.load(
        str(tmp_path / "point_cloud.map"), map_location="cpu",
        weights_only=True,
    )
    np.testing.assert_array_equal(
        sd["params.Cubemap_texture"].numpy(), np.asarray(state.env.texture)
    )


def test_lpips_fn_discovery(tmp_path, monkeypatch):
    """lpips_fn_or_none finds local weights via TORCH_HOME/LPIPS_WEIGHTS and
    returns None when either file is missing (GMSD fallback path)."""
    rng = np.random.default_rng(1)
    hub = tmp_path / "hub" / "checkpoints"
    hub.mkdir(parents=True)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)

    from tpu_splat.eval.lpips import lpips_fn_or_none

    assert lpips_fn_or_none() is None  # nothing on disk

    torch.save(_make_vgg_state_dict(rng), str(hub / "vgg16-397923af.pth"))
    assert lpips_fn_or_none() is None  # backbone alone is not LPIPS

    torch.save(_make_lin_state_dict(rng), str(hub / "lpips_vgg_v01.pth"))
    fn = lpips_fn_or_none()
    assert fn is not None
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)
