"""Training step, events, densification, checkpoint round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.config import OptimizationParams
from tpu_splat.data import random_scene, orbit_camera
from tpu_splat.model import init_from_pcd
from tpu_splat.model.densify import DensifyStats, densify_and_prune, add_stats
from tpu_splat.model import ops as gops
from tpu_splat.raster.config import RasterConfig
from tpu_splat.train.step import TrainState, make_train_step
from tpu_splat.train.loop import run_scheduled_events
from tpu_splat.train.losses import ssim, psnr

H = W = 48
CFG = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16)


def _setup(n=80, capacity=160, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, capacity=capacity, cubemap_resolution=8)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    return state, cam


def test_train_step_loss_decreases():
    state, cam = _setup()
    opt_cfg = OptimizationParams(init_until_iter=0)
    ts = TrainState.create(state, opt_cfg)
    step = jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0))
    bg = jnp.zeros(3)
    # target: a render from a perturbed model (realizable target)
    gt = jnp.full((H, W, 3), 0.4)
    losses = []
    for _ in range(12):
        ts, aux = step(ts, cam, gt, bg)
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(aux.n_alive) == 80


def test_train_step_stats_accumulate():
    state, cam = _setup()
    opt_cfg = OptimizationParams(init_until_iter=0)
    ts = TrainState.create(state, opt_cfg)
    step = jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0))
    ts, aux = step(ts, cam, jnp.zeros((H, W, 3)), jnp.zeros(3))
    stats = ts.stats
    assert float(jnp.sum(stats.denom)) > 0
    assert float(jnp.sum(stats.accum_w)) > 0
    assert float(jnp.max(stats.max_radii)) > 0
    assert float(jnp.sum(stats.grad_accum)) > 0


def test_densify_clone_and_split():
    state, _ = _setup(n=40, capacity=200)
    from tpu_splat.model.optim import adam_init

    opt = adam_init(state.param_pytree())
    stats = DensifyStats.zeros(200)
    # force: all visible with weight 1 (no weight-prune), big grads on rows<20
    stats = stats._replace(
        grad_accum=jnp.where(jnp.arange(200) < 20, 1.0, 0.0),
        denom=jnp.ones(200),
        accum_w=jnp.ones(200),
        denom_w=jnp.ones(200),
    )
    # paint moments so we can tell kept rows (1.0) from new rows (zeroed)
    opt = opt._replace(mu={**opt.mu, "xyz": jnp.ones_like(opt.mu["xyz"])})
    res = densify_and_prune(
        state,
        opt,
        stats,
        jax.random.PRNGKey(0),
        grad_threshold=0.5,
        percent_dense=0.01,
        extent=5.0,
        cameras_mean=jnp.zeros(3),
        size_prune=False,
    )
    n_clone, n_split = int(res.n_cloned), int(res.n_split)
    assert n_clone + n_split == 20
    # alive count: 40 - split (originals die) + clones + 2*split
    expected = 40 - n_split + n_clone + 2 * n_split
    assert int(jnp.sum(res.state.alive)) == expected
    assert int(res.overflow) == 0
    # new rows (freshly placed, possibly reusing freed slots) have zero
    # moments; surviving rows keep theirs
    mu = np.asarray(res.opt_state.mu["xyz"])[..., 0]
    alive = np.asarray(res.state.alive)
    n_new = int((alive & (mu == 0.0)).sum())
    n_kept = int((alive & (mu == 1.0)).sum())
    assert n_new == n_clone + 2 * n_split
    assert n_kept == expected - n_new


def test_densify_weight_prune():
    state, _ = _setup(n=40, capacity=100)
    from tpu_splat.model.optim import adam_init

    opt = adam_init(state.param_pytree())
    stats = DensifyStats.zeros(100)
    # rows 0..9 have tiny weights -> pruned
    w = jnp.where(jnp.arange(100) < 10, 0.001, 0.5)
    stats = stats._replace(accum_w=w, denom_w=jnp.ones(100))
    res = densify_and_prune(
        state, opt, stats, jax.random.PRNGKey(0),
        grad_threshold=9.9, percent_dense=0.01, extent=5.0,
        cameras_mean=jnp.zeros(3), size_prune=False,
    )
    assert int(jnp.sum(res.state.alive)) == 30
    assert int(res.n_pruned) == 10


def test_scheduled_events_run():
    state, cam = _setup(n=40, capacity=120)
    opt_cfg = OptimizationParams(
        init_until_iter=0, densify_from_iter=0, densification_interval=100
    )
    ts = TrainState.create(state, opt_cfg)
    step = jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0))
    ts, _ = step(ts, cam, jnp.zeros((H, W, 3)), jnp.zeros(3))
    # densify event at iteration 100
    ts2 = run_scheduled_events(
        ts, 100, opt_cfg, cameras_extent=5.0, cameras_mean=np.zeros(3)
    )
    assert int(ts2.gaussians.num_alive) > 0
    # opacity reset at 3000
    ts3 = run_scheduled_events(
        ts2, 3000, opt_cfg, cameras_extent=5.0, cameras_mean=np.zeros(3)
    )
    opa = jax.nn.sigmoid(ts3.gaussians.opacity[:, 0])
    alive = np.asarray(ts3.gaussians.alive)
    assert float(jnp.max(jnp.where(ts3.gaussians.alive, opa, 0))) <= 0.011
    # normal-prop event at 1500 (offset 500, interval 1000)
    ts4 = run_scheduled_events(
        ts3, 1500, opt_cfg, cameras_extent=5.0, cameras_mean=np.zeros(3)
    )
    refl = jax.nn.sigmoid(ts4.gaussians.refl[:, 0])
    assert float(jnp.min(jnp.where(ts4.gaussians.alive, refl, 1.0))) >= (
        opt_cfg.refl_init_value - 1e-5
    )
    # opacity lr pulsed to 0 by normal prop
    assert float(ts4.opacity_lr) == 0.0


def test_model_ops():
    state, _ = _setup(n=30, capacity=64)
    from tpu_splat.model.optim import adam_init

    opt = adam_init(state.param_pytree())
    s2, _ = gops.reset_opacity(state, opt, 0.01)
    assert float(jnp.max(jax.nn.sigmoid(s2.opacity))) <= 0.011
    s3, _ = gops.reset_scale(state, opt, 1.5)
    sc_old = np.exp(np.asarray(state.scaling))
    sc_new = np.exp(np.asarray(s3.scaling))
    ratio = np.sort(sc_new / sc_old, axis=1)
    # exp/log roundtrip costs ~1e-4 relative in f32
    np.testing.assert_allclose(ratio[:, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(ratio[:, 1], 1.5, atol=1e-3)
    s4, _ = gops.dist_color(state, opt, jax.random.PRNGKey(0))
    assert np.abs(np.asarray(s4.features_dc - state.features_dc)).max() <= 0.4
    s5, _ = gops.double_env_map(state, opt)
    assert s5.env.resolution == 16


def test_checkpoint_roundtrip(tmp_path):
    from tpu_splat.model.io import save_checkpoint, load_checkpoint, save_ply, load_ply

    state, cam = _setup(n=30, capacity=64)
    opt_cfg = OptimizationParams()
    ts = TrainState.create(state, opt_cfg)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, ts, 123)
    ts2, it = load_checkpoint(path, ts)
    assert it == 123
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ply = str(tmp_path / "model.ply")
    save_ply(state, ply)
    state2 = load_ply(ply, capacity=64)
    np.testing.assert_allclose(
        np.asarray(state.xyz)[:30], np.asarray(state2.xyz)[:30], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.scaling)[:30], np.asarray(state2.scaling)[:30], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.env.texture), np.asarray(state2.env.texture), rtol=1e-6
    )


def test_ssim_basics():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)) > 0.999
    b = jnp.clip(a + 0.3 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    assert float(ssim(a, b)) < 0.9
    assert float(psnr(a, a + 0.1)) == pytest.approx(20.0, abs=0.1)


def test_train_step_with_isp():
    from tpu_splat.isp import ISPConfig

    state, cam = _setup(n=40, capacity=64)
    opt_cfg = OptimizationParams(init_until_iter=0)
    ts = TrainState.create(state, opt_cfg, num_frames=5)
    step = jax.jit(
        make_train_step(
            opt_cfg, CFG, spatial_lr_scale=1.0, isp_cfg=ISPConfig()
        )
    )
    gt = jnp.full((H, W, 3), 0.4)
    losses = []
    for i in range(6):
        ts, aux = step(ts, cam, gt, jnp.zeros(3), frame_idx=i % 5)
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # ISP parameters moved off identity
    assert float(jnp.abs(ts.isp.gain - jnp.eye(3)).max()) > 0
    # frozen scene: gaussians stop, ISP keeps moving
    g0 = ts.gaussians.xyz
    i0 = ts.isp.gain
    ts, _ = step(ts, cam, gt, jnp.zeros(3), frame_idx=0, frozen=True)
    assert float(jnp.abs(ts.gaussians.xyz - g0).max()) == 0.0
    assert float(jnp.abs(ts.isp.gain - i0).max()) > 0.0
    # spatial (per-camera vignette) params also train through the step
    assert float(jnp.abs(ts.isp.vig_coef).max()) > 0.0


def test_isp_spatial_gradients():
    """The per-pixel vignette surface (pixel_coords/camera_idx signature
    parity with utils/post_process_utils.py:20-41) must route gradients to
    the per-camera spatial params."""
    from tpu_splat.isp import init_isp, apply_isp
    from tpu_splat.isp.ppisp import pixel_coord_grid

    isp = init_isp(num_frames=3, num_cameras=2)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0.1, 0.9, (16, 24, 3)).astype(np.float32))
    coords = pixel_coord_grid(16, 24)

    def loss(p, cam_idx):
        out = apply_isp(p, rgb, frame_idx=1, pixel_coords=coords,
                        resolution=(24, 16), camera_idx=cam_idx)
        return jnp.sum(out**2)

    g = jax.grad(loss)(isp, 1)
    assert float(jnp.abs(g.vig_coef[1]).min()) > 0.0  # a1 and a2 both live
    assert float(jnp.abs(g.vig_center[1]).max()) >= 0.0
    # only the indexed camera's params receive gradient
    assert float(jnp.abs(g.vig_coef[0]).max()) == 0.0
    # vignette actually bends the image spatially once coefs are nonzero
    bent = isp._replace(vig_coef=isp.vig_coef.at[0, 0].set(-0.5))
    out = apply_isp(bent, rgb, frame_idx=-1, camera_idx=0)
    ratio = np.asarray(out / jnp.clip(rgb, 1e-6))
    assert ratio[8, 12].mean() > ratio[0, 0].mean()  # darker at the corner


def test_capacity_growth():
    """grow_capacity pads state/opt/stats; a grown state must keep rendering
    and training identically (dead pad rows are inert), and check_growth
    must fire on near-full diagnostics."""
    from tpu_splat.train.grow import grow_capacity, check_growth

    state, cam = _setup(n=60, capacity=80)
    opt_cfg = OptimizationParams(init_until_iter=0)
    cfg = CFG
    ts = TrainState.create(state, opt_cfg)
    step = jax.jit(make_train_step(opt_cfg, cfg, spatial_lr_scale=1.0))
    gt = jnp.zeros((cam.height, cam.width, 3))
    bg = jnp.zeros(3)
    ts1, aux1 = step(ts, cam, gt, bg)

    ts_big = grow_capacity(ts, 160)
    assert ts_big.gaussians.capacity == 160
    assert int(ts_big.gaussians.num_alive) == int(ts.gaussians.num_alive)
    assert ts_big.opt.mu["xyz"].shape[0] == 160
    assert ts_big.stats.denom.shape[0] == 160
    ts2, aux2 = step(ts_big, cam, gt, bg)
    np.testing.assert_allclose(float(aux2.loss), float(aux1.loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ts2.gaussians.xyz[:80]), np.asarray(ts1.gaussians.xyz),
        atol=1e-6,
    )

    dec = check_growth(
        ts, cfg, n_alive=79, num_instances=10, max_tile_count=1,
        densify_overflow=0,
    )
    assert dec.grew and dec.ts.gaussians.capacity > 80
    dec2 = check_growth(
        ts, cfg,
        n_alive=10,
        num_instances=int(0.95 * cfg.max_instances),
        max_tile_count=1,
        densify_overflow=0,
    )
    assert dec2.grew and dec2.cfg.max_instances > cfg.max_instances
    dec3 = check_growth(
        ts, cfg, n_alive=10, num_instances=10, max_tile_count=1,
        densify_overflow=0,
    )
    assert not dec3.grew
