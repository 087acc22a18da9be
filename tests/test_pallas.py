"""Pallas tile-blend kernel vs the XLA scan path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.data import random_scene, orbit_camera
from tpu_splat.raster import rasterize
from tpu_splat.raster.config import RasterConfig

H = W = 48
XLA = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16)
PAL = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16, backend="pallas")


def _scene(n=100, seed=0):
    raw = random_scene(n, seed=seed)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    act = dict(
        means3d=jnp.asarray(raw["xyz"]),
        scales=jnp.exp(jnp.asarray(raw["scaling"])),
        rotations=jnp.asarray(raw["rotation"]),
        opacity=jax.nn.sigmoid(jnp.asarray(raw["opacity"][:, 0])),
        refl=jax.nn.sigmoid(jnp.asarray(raw["refl"][:, 0])),
        sh=jnp.asarray(raw["sh"]),
    )
    return act, cam


def _run(act, cam, cfg, bg):
    return rasterize(
        act["means3d"], act["scales"], act["rotations"], act["opacity"],
        act["refl"], cam, bg, cfg, sh=act["sh"], sh_degree=0,
    )


def test_pallas_matches_xla():
    act, cam = _scene()
    bg = jnp.array([0.15, 0.25, 0.35])
    o_x = _run(act, cam, XLA, bg)
    o_p = _run(act, cam, PAL, bg)
    np.testing.assert_allclose(o_p.color, o_x.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(o_p.final_T, o_x.final_T, atol=2e-5)
    np.testing.assert_allclose(o_p.refl_map, o_x.refl_map, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(o_p.others, o_x.others, atol=5e-5, rtol=1e-3)
    np.testing.assert_array_equal(o_p.n_contrib, o_x.n_contrib)
    np.testing.assert_allclose(
        o_p.gaussian_weights, o_x.gaussian_weights, atol=2e-5
    )


def test_pallas_opaque_scene_early_exit():
    """A wall of opaque Gaussians triggers the T<1e-4 early exit path; weights
    of occluded instances must be zero (zero-fill path)."""
    act, cam = _scene(n=200, seed=3)
    act = dict(act, opacity=jnp.full_like(act["opacity"], 0.99))
    bg = jnp.zeros(3)
    o_x = _run(act, cam, XLA, bg)
    o_p = _run(act, cam, PAL, bg)
    np.testing.assert_allclose(o_p.color, o_x.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        o_p.gaussian_weights, o_x.gaussian_weights, atol=2e-5
    )
    assert float(jnp.min(o_p.final_T)) < 1e-3  # saturated somewhere


def test_pallas_gradients_match_xla():
    """Hand-derived backward kernel vs XLA autodiff of the scan."""
    act, cam = _scene(n=80, seed=1)
    bg = jnp.array([0.2, 0.1, 0.0])
    target = jnp.full((H, W, 3), 0.3)

    def make_loss(cfg):
        def loss(means, scales, rots, opa, sh, refl):
            out = rasterize(
                means, scales, rots, opa, refl, cam, bg, cfg,
                sh=sh, sh_degree=0,
            )
            return (
                jnp.sum((out.color - target) ** 2)
                + 0.2 * jnp.sum(out.others[..., 0])   # depth
                + 0.1 * jnp.sum(out.others[..., 6])   # distortion
                + 0.3 * jnp.sum(out.others[..., 2:5]) # normal
                + 0.15 * jnp.sum(out.refl_map)
                + 0.05 * jnp.sum(out.others[..., 5])  # median depth
                + 0.07 * jnp.sum(out.final_T)
            )
        return loss

    args = (act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["sh"], act["refl"])
    g_x = jax.grad(make_loss(XLA), argnums=tuple(range(6)))(*args)
    g_p = jax.grad(make_loss(PAL), argnums=tuple(range(6)))(*args)
    names = ["means", "scales", "rots", "opacity", "sh", "refl"]
    for n, a, b in zip(names, g_x, g_p):
        a, b = np.asarray(a), np.asarray(b)
        assert not np.any(np.isnan(b)), f"NaN in pallas grad {n}"
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-3, err_msg=n)


def test_pallas_train_grads_match_full():
    """grad_channels='train' statically drops the distortion/M1/M2/median
    cotangent chains; for a loss that never touches those channels (the
    reference training loss shape, train.py:168-196) its gradients must be
    identical to the full backward."""
    act, cam = _scene(n=80, seed=5)
    bg = jnp.array([0.1, 0.2, 0.3])
    target = jnp.full((H, W, 3), 0.4)
    trn = RasterConfig(
        max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256,
        chunk=16, backend="pallas", grad_channels="train",
    )

    def make_loss(cfg):
        def loss(means, scales, rots, opa, sh, refl):
            out = rasterize(
                means, scales, rots, opa, refl, cam, bg, cfg,
                sh=sh, sh_degree=0,
            )
            # train-shaped loss: color, alpha (via final_T), normal,
            # expected depth, refl — NO distortion / median / M1 / M2
            return (
                jnp.sum((out.color - target) ** 2)
                + 0.2 * jnp.sum(out.others[..., 0])
                + 0.3 * jnp.sum(out.others[..., 2:5])
                + 0.15 * jnp.sum(out.refl_map)
                + 0.07 * jnp.sum(out.final_T)
            )
        return loss

    args = (act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["sh"], act["refl"])
    g_f = jax.grad(make_loss(PAL), argnums=tuple(range(6)))(*args)
    g_t = jax.grad(make_loss(trn), argnums=tuple(range(6)))(*args)
    for n, a, b in zip(["means", "scales", "rots", "opa", "sh", "refl"], g_f, g_t):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   rtol=1e-5, err_msg=n)


def test_train_grad_channels_requires_zero_depth_ratio():
    with pytest.raises(AssertionError):
        RasterConfig(grad_channels="train", depth_ratio=0.5)


def test_bf16_grads_close_to_exact():
    """RasterConfig.bf16_grads compresses the per-instance grad rows through
    the regroup sort; per-parameter gradients must stay within bf16-rounding
    distance of the exact path (the flag is a training-only optimization,
    certified end-to-end by validate_e2e)."""
    act, cam = _scene(n=100, seed=9)
    bg = jnp.array([0.1, 0.2, 0.3])
    target = jnp.full((H, W, 3), 0.45)

    def make_loss(cfg):
        def loss(means, scales, rots, opa, sh, refl):
            out = rasterize(
                means, scales, rots, opa, refl, cam, bg, cfg,
                sh=sh, sh_degree=0,
            )
            return jnp.sum((out.color - target) ** 2) + 0.1 * jnp.sum(
                out.refl_map
            )
        return loss

    base = dict(max_tiles_per_gaussian=16, max_instances=4096,
                tile_depth=256, chunk=16, backend="pallas")
    exact = RasterConfig(**base)
    comp = RasterConfig(**base, bf16_grads=True)
    args = (act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["sh"], act["refl"])
    g_e = jax.grad(make_loss(exact), argnums=tuple(range(6)))(*args)
    g_c = jax.grad(make_loss(comp), argnums=tuple(range(6)))(*args)
    for n, a, b in zip(["means", "scales", "rots", "opa", "sh", "refl"], g_e, g_c):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        rel = np.abs(a - b).max() / scale
        assert rel < 2e-2, f"{n}: {rel}"
        assert np.isfinite(b).all()


def test_bf16_feats_parity():
    """bf16_feats packs content rows (color/normal/refl/scope) as bf16
    pairs: geometry channels (alpha/T/depth) must be BIT-IDENTICAL, content
    channels within bf16 rounding; grads close in relative terms."""
    import dataclasses
    from tpu_splat.data import random_scene, orbit_camera
    from tpu_splat.raster import rasterize
    from tpu_splat.raster.config import RasterConfig

    H = W = 64
    n = 150
    raw = random_scene(n, seed=9)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.3, elevation=0.2)
    args = (
        jnp.asarray(raw["xyz"]),
        jnp.exp(jnp.asarray(raw["scaling"])),
        jnp.asarray(raw["rotation"]),
        jax.nn.sigmoid(jnp.asarray(raw["opacity"][:, 0])),
        jax.nn.sigmoid(jnp.asarray(raw["refl"][:, 0])),
    )
    sh = jnp.asarray(raw["sh"])
    bg = jnp.zeros(3)
    base = RasterConfig(
        max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256,
        chunk=16, backend="pallas", grad_channels="train", bf16_grads=True,
    )
    cfg16 = dataclasses.replace(base, bf16_feats=True)

    def run(cfg):
        return rasterize(*args, cam, bg, cfg, sh=sh, sh_degree=0)

    a, b = jax.jit(lambda: run(base))(), jax.jit(lambda: run(cfg16))()
    # geometry-derived channels exact
    np.testing.assert_array_equal(np.asarray(a.final_T), np.asarray(b.final_T))
    np.testing.assert_array_equal(
        np.asarray(a.others[..., 0]), np.asarray(b.others[..., 0])  # depth
    )
    np.testing.assert_array_equal(np.asarray(a.n_contrib), np.asarray(b.n_contrib))
    # content channels within bf16 rounding of unit-scale values
    assert float(jnp.abs(a.color - b.color).max()) < 1e-2
    assert float(jnp.abs(a.others[..., 2:5] - b.others[..., 2:5]).max()) < 1e-2
    assert float(jnp.abs(a.refl_map - b.refl_map).max()) < 1e-2

    def loss(cfg):
        def f(xyz, scales, rots, opa, sh):
            out = rasterize(
                xyz, scales, rots, opa, args[4], cam, bg, cfg,
                sh=sh, sh_degree=0,
            )
            return (
                jnp.sum(out.color**2)
                + jnp.sum(out.others[..., 2:5] ** 2)
                + jnp.sum(out.refl_map**2)
            )

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
            args[0], args[1], args[2], args[3], sh
        )

    ga, gb = loss(base), loss(cfg16)
    for x, y, nm in zip(ga, gb, ("xyz", "scales", "rots", "opa", "sh")):
        x, y = np.asarray(x), np.asarray(y)
        assert np.isfinite(y).all(), nm
        scale = np.abs(x).max() + 1e-8
        assert np.abs(x - y).max() / scale < 3e-2, (
            nm, np.abs(x - y).max() / scale
        )


def test_inference_collect_weights_off_image_exact():
    """The collect_weights=False inference path (render_fast/eval_fps/
    bench --forward_only) drops ONLY the wmax writeback ring + gw
    reduction: every image-space output must be bit-identical to the
    weighted path, and gaussian_weights must come back all-zero."""
    act, cam = _scene(n=90, seed=4)
    bg = jnp.array([0.15, 0.25, 0.35])
    o_on = _run(act, cam, PAL, bg)

    def run_off():
        return rasterize(
            act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["refl"], cam, bg, PAL, sh=act["sh"], sh_degree=0,
            collect_weights=False,
        )

    o_off = run_off()
    np.testing.assert_array_equal(np.asarray(o_off.color), np.asarray(o_on.color))
    np.testing.assert_array_equal(np.asarray(o_off.others), np.asarray(o_on.others))
    np.testing.assert_array_equal(
        np.asarray(o_off.refl_map), np.asarray(o_on.refl_map)
    )
    np.testing.assert_array_equal(
        np.asarray(o_off.final_T), np.asarray(o_on.final_T)
    )
    assert float(np.abs(np.asarray(o_off.gaussian_weights)).max()) == 0.0
    assert float(np.abs(np.asarray(o_on.gaussian_weights)).max()) > 0.0
