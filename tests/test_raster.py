"""Rasterizer correctness: production chunked-prefix path vs brute-force oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.core.graphics import Camera
from tpu_splat.data import random_scene, orbit_camera
from tpu_splat.raster import rasterize, RasterOutput
from tpu_splat.raster.config import RasterConfig
from tpu_splat.raster.preprocess import preprocess
from tpu_splat.raster.bruteforce import blend_bruteforce


H = W = 48
CFG = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16)


def _scene(n=120, seed=0):
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


def _run_production(act, cam, bg):
    return rasterize(
        act["means3d"],
        act["scales"],
        act["rotations"],
        act["opacity"],
        act["refl"],
        cam,
        bg,
        CFG,
        sh=act["sh"],
        sh_degree=0,
    )


def _run_bruteforce(act, cam, bg):
    prep = preprocess(
        act["means3d"],
        act["scales"],
        act["rotations"],
        cam.world_view,
        cam.full_proj,
        cam.camera_center,
        H,
        W,
        sh=act["sh"],
        sh_degree=0,
    )
    scope = jnp.ones((act["opacity"].shape[0],), bool)
    return blend_bruteforce(prep, act["opacity"], act["refl"], scope, bg, H, W)


def test_forward_matches_bruteforce():
    act, cam = _scene()
    bg = jnp.array([0.1, 0.2, 0.3])
    out = _run_production(act, cam, bg)
    color_bf, others_bf, refl_bf, T_bf, ncon_bf = _run_bruteforce(act, cam, bg)

    assert not np.any(np.isnan(np.asarray(out.color)))
    np.testing.assert_allclose(out.color, color_bf, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.final_T, T_bf, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.refl_map, refl_bf, atol=2e-5, rtol=1e-4)
    # allmap channels: depth, alpha, normal, median, distortion, mask
    np.testing.assert_allclose(out.others, others_bf, atol=5e-5, rtol=1e-3)
    np.testing.assert_array_equal(out.n_contrib, ncon_bf)


def test_coverage_nontrivial():
    act, cam = _scene()
    bg = jnp.zeros(3)
    out = _run_production(act, cam, bg)
    alpha = np.asarray(out.others[..., 1])
    assert alpha.max() > 0.5  # something rendered
    assert (np.asarray(out.radii) > 0).sum() > 50  # most Gaussians visible
    assert int(out.num_instances) > 100


def test_gradients_match_bruteforce():
    act, cam = _scene(n=60, seed=3)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jnp.zeros((H, W, 3))

    def loss_prod(means, scales, rots, opa, sh):
        out = rasterize(
            means, scales, rots, opa, act["refl"], cam, bg, CFG, sh=sh, sh_degree=0
        )
        return jnp.sum((out.color - target) ** 2) + jnp.sum(out.others[..., 6]) * 0.1

    def loss_bf(means, scales, rots, opa, sh):
        prep = preprocess(
            means, scales, rots, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=0,
        )
        scope = jnp.ones((opa.shape[0],), bool)
        color, others, refl_m, T, _ = blend_bruteforce(
            prep, opa, act["refl"], scope, bg, H, W
        )
        return jnp.sum((color - target) ** 2) + jnp.sum(others[..., 6]) * 0.1

    args = (act["means3d"], act["scales"], act["rotations"], act["opacity"], act["sh"])
    g1 = jax.grad(loss_prod, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_bf, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "rots", "opacity", "sh"]
    for n, a, b in zip(names, g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        assert not np.any(np.isnan(a)), f"NaN in production grad {n}"
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=n)


def test_finite_difference_opacity():
    act, cam = _scene(n=20, seed=5)
    bg = jnp.zeros(3)

    def loss(opa):
        out = rasterize(
            act["means3d"], act["scales"], act["rotations"], opa, act["refl"],
            cam, bg, CFG, sh=act["sh"], sh_degree=0,
        )
        return jnp.sum(out.color)

    opa = act["opacity"]
    g = np.asarray(jax.grad(loss)(opa))
    eps = 1e-3
    rng = np.random.default_rng(0)
    for i in rng.choice(20, size=4, replace=False):
        e = np.zeros_like(opa)
        e[i] = eps
        fd = (float(loss(opa + e)) - float(loss(opa - e))) / (2 * eps)
        assert abs(fd - g[i]) < 5e-2 * max(1.0, abs(fd)), (i, fd, g[i])


def test_screen_offset_probe_gradient():
    """The densification-signal probe must carry nonzero gradient."""
    act, cam = _scene(n=40, seed=7)
    bg = jnp.zeros(3)
    so = jnp.zeros((40, 2))

    def loss(so):
        out = rasterize(
            act["means3d"], act["scales"], act["rotations"], act["opacity"],
            act["refl"], cam, bg, CFG, sh=act["sh"], sh_degree=0, screen_offset=so,
        )
        return jnp.sum((out.color - 0.5) ** 2)

    g = np.asarray(jax.grad(loss)(so))
    assert not np.any(np.isnan(g))
    assert np.abs(g).max() > 0.0


def test_volumetric_mode():
    """3DGS EWA variant: renders, matches an analytic single-splat check."""
    import math
    from tpu_splat.data import orbit_camera

    cam = orbit_camera(H, W, radius=4.0, azimuth=0.0, elevation=0.0)
    # one isotropic gaussian at origin
    means = jnp.zeros((1, 3))
    scales3 = jnp.full((1, 3), 0.1)
    rots = jnp.array([[1.0, 0, 0, 0]])
    opa = jnp.array([0.9])
    refl = jnp.array([0.0])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    out = rasterize(
        means, scales3, rots, opa, refl, cam, jnp.zeros(3), CFG,
        colors=colors, mode="volumetric",
        normals=jnp.array([[0.0, 0.0, 1.0]]),
    )
    img = np.asarray(out.color)
    assert not np.any(np.isnan(img))
    # analytic EWA gaussian: center at ((0+1)*S-1)/2 = 23.5 (half-pixel),
    # var = (focal*s/z)^2 + 0.3 dilation; single splat over black bg ->
    # red = alpha = 0.9 * exp(-0.5 * d^2/var)
    focal = W / (2 * math.tan(cam.fovx / 2))
    var = (focal * 0.1 / 4.0) ** 2 + 0.3
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d2 = (xs - (W - 1) / 2) ** 2 + (ys - (H - 1) / 2) ** 2
    expected = 0.9 * np.exp(-0.5 * d2 / var)
    expected[expected < 1.0 / 255.0] = 0.0  # alpha skip threshold
    np.testing.assert_allclose(img[..., 0], expected, atol=5e-3)
    assert img[..., 1].max() < 1e-3
    # depth map at center equals view-space z (= 4)
    depth = np.asarray(out.others[..., 0]) / np.clip(
        np.asarray(out.others[..., 1]), 1e-6, None
    )
    assert abs(depth[H // 2, W // 2] - 4.0) < 0.05


def test_volumetric_gradients_finite():
    act, cam = _scene(n=30, seed=11)
    scales3 = jnp.concatenate([act["scales"], act["scales"][:, :1]], axis=1)

    def loss(means, sc, rots, opa):
        out = rasterize(
            means, sc, rots, opa, act["refl"], cam, jnp.zeros(3), CFG,
            sh=act["sh"], sh_degree=0, mode="volumetric", antialiasing=True,
        )
        return jnp.sum((out.color - 0.5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(
        act["means3d"], scales3, act["rotations"], act["opacity"]
    )
    for a in g:
        assert not np.any(np.isnan(np.asarray(a)))
        assert np.abs(np.asarray(a)).max() > 0
