"""Multi-chip sharding: tile-sharded render matches single-device, and the
full training step compiles and runs over an 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.config import OptimizationParams
from tpu_splat.data import orbit_camera
from tpu_splat.dist import make_mesh
from tpu_splat.model import init_from_pcd
from tpu_splat.raster.config import RasterConfig
from tpu_splat.renderer import render
from tpu_splat.train.step import TrainState, make_train_step

H = W = 48  # 3x3 = 9 tiles -> padded to 16 for 8 shards
CFG = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16)


def _setup(n=60, capacity=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, capacity=capacity, cubemap_resolution=8)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    return state, cam


def test_eight_devices_present():
    assert jax.device_count() >= 8


def test_sharded_render_matches_single():
    state, cam = _setup()
    mesh = make_mesh(8)
    bg = jnp.array([0.2, 0.1, 0.3])
    out1 = render(state, cam, CFG, bg, initial_stage=False)
    out8 = render(state, cam, CFG, bg, initial_stage=False, mesh=mesh)
    np.testing.assert_allclose(out8.render, out1.render, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out8.alpha, out1.alpha, atol=1e-5)
    np.testing.assert_allclose(out8.normal, out1.normal, atol=1e-4)
    np.testing.assert_allclose(
        out8.gaussian_weights, out1.gaussian_weights, atol=1e-6
    )


def test_sharded_gradients_match_single():
    state, cam = _setup(n=40, capacity=64)
    mesh = make_mesh(8)
    bg = jnp.zeros(3)

    def make_loss(mesh):
        def loss(params):
            s = state.with_params(params)
            o = render(s, cam, CFG, bg, initial_stage=False, mesh=mesh)
            return jnp.mean((o.render - 0.3) ** 2) + 0.1 * jnp.mean(o.dist)

        return loss

    p = state.param_pytree()
    g1 = jax.grad(make_loss(None))(p)
    g8 = jax.grad(make_loss(mesh))(p)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g8[k])
        assert not np.any(np.isnan(b)), k
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4, err_msg=k)


def test_full_train_step_multichip():
    state, cam = _setup()
    mesh = make_mesh(8)
    opt_cfg = OptimizationParams(init_until_iter=0)
    ts = TrainState.create(state, opt_cfg)
    step = jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0, mesh=mesh))
    gt = jnp.full((H, W, 3), 0.4)
    losses = []
    for _ in range(3):
        ts, aux = step(ts, cam, gt, jnp.zeros(3))
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_pallas_matches_single():
    """Pallas kernel pair under 8-way tile sharding == single-device."""
    state, cam = _setup(n=50, capacity=64)
    mesh = make_mesh(8)
    pal = RasterConfig(
        max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256,
        chunk=16, backend="pallas",
    )
    bg = jnp.array([0.2, 0.1, 0.3])
    o1 = render(state, cam, pal, bg, initial_stage=False)
    o8 = render(state, cam, pal, bg, initial_stage=False, mesh=mesh)
    np.testing.assert_allclose(o8.render, o1.render, atol=1e-5)
    np.testing.assert_allclose(o8.gaussian_weights, o1.gaussian_weights, atol=1e-6)

    def loss(params, mesh):
        s = state.with_params(params)
        o = render(s, cam, pal, bg, initial_stage=False, mesh=mesh)
        return jnp.mean((o.render - 0.3) ** 2)

    p = state.param_pytree()
    g1 = jax.grad(loss)(p, None)
    g8 = jax.grad(loss)(p, mesh)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g8[k])
        assert not np.any(np.isnan(b)), k
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-3, err_msg=k)


def test_camera_batch_dp_matches_mean_of_singles():
    """DP step over 8 cameras: loss == mean of per-camera losses, densify
    stats combine like 8 sequential add_stats calls, and params update."""
    from tpu_splat.train.step import make_train_step_dp

    state, _ = _setup()
    mesh = make_mesh(8, axis="dp")
    opt_cfg = OptimizationParams(init_until_iter=0)
    ts = TrainState.create(state, opt_cfg)
    cams = [
        orbit_camera(H, W, radius=4.0, azimuth=0.1 * i, elevation=0.2)
        for i in range(8)
    ]
    cam_b = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    gts = jnp.stack([jnp.full((H, W, 3), 0.3 + 0.05 * i) for i in range(8)])
    bg = jnp.zeros(3)

    dp_step = jax.jit(make_train_step_dp(opt_cfg, CFG, spatial_lr_scale=1.0, mesh=mesh))
    ts2, aux = dp_step(ts, cam_b, gts, bg)
    assert np.isfinite(float(aux.loss))

    step1 = jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0))
    losses, denoms = [], []
    for i in range(8):
        t1, a1 = step1(ts, cams[i], gts[i], bg)
        losses.append(float(a1.loss))
        denoms.append(np.asarray(t1.stats.denom))
    np.testing.assert_allclose(float(aux.loss), np.mean(losses), rtol=1e-5)
    # stats.denom sums per-camera visibilities (B sequential add_stats calls)
    np.testing.assert_allclose(
        np.asarray(ts2.stats.denom), np.sum(denoms, axis=0), atol=1e-5
    )
    # parameters actually moved
    assert not np.allclose(np.asarray(ts2.gaussians.xyz), np.asarray(ts.gaussians.xyz))


def test_sharded_binning_production_switches():
    """The fully-sharded tile-slab pipeline (binning+pack+blend per chip,
    raster/sharded.py) under the PRODUCTION switch set (train-shaped grads,
    bf16 regroup + content rows) matches single-device to bf16 tolerance,
    and per-Gaussian gradient psum is exact across the 8-way mesh."""
    from tpu_splat.raster.config import production_config

    state, cam = _setup(n=50, capacity=64)
    mesh = make_mesh(8)
    prod = production_config(
        max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256,
        chunk=16, backend="pallas",
    )
    bg = jnp.zeros(3)
    o1 = render(state, cam, prod, bg, initial_stage=False)
    o8 = render(state, cam, prod, bg, initial_stage=False, mesh=mesh)
    # bf16 content rows: forward content channels carry ~2^-9 rounding but
    # the INSTANCE SETS must agree, so the images agree to bf16 tolerance
    np.testing.assert_allclose(o8.render, o1.render, atol=5e-3)
    np.testing.assert_allclose(o8.alpha, o1.alpha, atol=1e-5)
    np.testing.assert_allclose(
        o8.gaussian_weights, o1.gaussian_weights, atol=1e-5
    )

    def loss(params, mesh):
        s = state.with_params(params)
        o = render(s, cam, prod, bg, initial_stage=False, mesh=mesh)
        return jnp.mean((o.render - 0.3) ** 2)

    p = state.param_pytree()
    g1 = jax.grad(loss)(p, None)
    g8 = jax.grad(loss)(p, mesh)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g8[k])
        assert not np.any(np.isnan(b)), k
        scale = np.abs(a).max() + 1e-8
        # per-shard bf16 rounding differs from single-device rounding only
        # through which instances share a packed pair — tolerance covers it
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-3, err_msg=k)
