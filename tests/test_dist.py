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


def test_multihost_init_multiprocess_args(monkeypatch):
    """multihost_init(num_processes>1) must pass the explicit topology to
    jax.distributed.initialize and NOT swallow failures (a bad coordinator
    on a real 2-host run is a misconfiguration, not a fallback)."""
    import jax

    from tpu_splat.dist import mesh as M

    calls = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(
            coordinator=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    idx, cnt = M.multihost_init("10.0.0.1:1234", num_processes=2, process_id=1)
    assert calls == {"coordinator": "10.0.0.1:1234", "n": 2, "pid": 1}
    assert (idx, cnt) == (0, 1)  # single-process test env reports itself

    def failing_init(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", failing_init)
    with pytest.raises(RuntimeError):
        M.multihost_init("10.0.0.1:1234", num_processes=2, process_id=0)
    # single-host: failures are swallowed (already-initialized etc.)
    idx, cnt = M.multihost_init()
    assert (idx, cnt) == (0, 1)


def test_dp_grad_allreduces_are_per_leaf():
    """Comm-backend overlap structure (SURVEY §2.16): the DP step issues
    one all_reduce PER gradient leaf inside the shard_map'd device
    function — not a single monolithic end-of-backward collective — so (a)
    the backend scheduler is free to overlap each leaf's psum with compute
    that does not depend on it, and (b) XLA's all-reduce combiner can
    re-bucket them by byte threshold for the ICI/DCN topology at hand.
    Asserted on the StableHLO lowering (the CPU backend's optimized HLO
    erases collectives into its thread runtime, so the post-optimization
    text is not portable evidence). Matches the reference's NCCL gradient
    path being per-tensor (torch DDP-style bucketing)."""
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
    gts = jnp.stack([jnp.full((H, W, 3), 0.3)] * 8)
    dp_step = make_train_step_dp(opt_cfg, CFG, spatial_lr_scale=1.0, mesh=mesh)
    txt = jax.jit(dp_step).lower(ts, cam_b, gts, jnp.zeros(3)).as_text()
    n_leaves = len(state.param_pytree())
    n_ar = txt.count("stablehlo.all_reduce")
    # >= one per gradient leaf + the 5 loss scalars + densify-stat psums
    assert n_ar >= n_leaves + 5, (n_ar, n_leaves)


def test_host_camera_partition():
    """Per-host camera partition (2-host DP data path, BASELINE.json
    config 5): disjoint, exhaustive, balanced within 1, and the per-epoch
    permutations cover every camera exactly once across hosts."""
    from tpu_splat.dist.mesh import host_camera_indices, host_epoch_permutation

    for n_cam, n_host in [(7, 2), (48, 2), (48, 4), (5, 4)]:
        parts = [host_camera_indices(n_cam, p, n_host) for p in range(n_host)]
        allidx = np.concatenate(parts)
        assert sorted(allidx.tolist()) == list(range(n_cam))
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1
        # strided: each host's subset spans the trajectory
        for p in parts:
            if len(p) > 1:
                assert p[-1] - p[0] >= (len(p) - 1) * n_host - n_host

        for epoch in (0, 3):
            perms = [
                host_epoch_permutation(n_cam, epoch, p, n_host)
                for p in range(n_host)
            ]
            union = np.concatenate(perms)
            assert sorted(union.tolist()) == list(range(n_cam))
        # different epochs give different orders (n_cam > 4)
        if n_cam > 4:
            a = host_epoch_permutation(n_cam, 0, 0, n_host)
            b = host_epoch_permutation(n_cam, 1, 0, n_host)
            assert not np.array_equal(a, b)

    with pytest.raises(ValueError):
        host_camera_indices(10, 2, 2)


def test_camera_pad_to_pixel_exact():
    """Camera.pad_to keeps every original pixel exactly in place: the
    padded render's top-left crop equals the original render bit-for-bit
    modulo tile-count FP (same instance sets, same projection arithmetic
    on the clip rows)."""
    from tpu_splat.renderer import render

    state, _ = _setup()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cam0 = orbit_camera(H, W, radius=4.0, azimuth=0.3, elevation=0.25)
    camp = cam0.pad_to(H + 16, W + 32)
    assert (camp.height, camp.width) == (H + 16, W + 32)

    out0 = jax.jit(lambda s: render(s, cam0, CFG, bg, initial_stage=True))(state)
    outp = jax.jit(lambda s: render(s, camp, CFG, bg, initial_stage=True))(state)
    np.testing.assert_allclose(
        np.asarray(outp.render)[:H, :W], np.asarray(out0.render),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outp.alpha)[:H, :W], np.asarray(out0.alpha),
        atol=2e-5, rtol=1e-4,
    )


def test_camera_batch_dp_mixed_sizes_bucketed():
    """Mixed-resolution DP via bucketing: cameras at two sizes padded to
    one max shape with loss masks — the masked DP loss equals the mean of
    the per-camera ORIGINAL-size losses."""
    from tpu_splat.train.step import make_train_step_dp

    state, _ = _setup()
    mesh = make_mesh(8, axis="dp")
    opt_cfg = OptimizationParams(init_until_iter=0)
    ts = TrainState.create(state, opt_cfg)

    Hs = [H, H - 16] * 4  # two buckets
    Ws = [W, W - 16] * 4
    cams0 = [
        orbit_camera(Hs[i], Ws[i], radius=4.0, azimuth=0.1 * i, elevation=0.2)
        for i in range(8)
    ]
    rng = np.random.default_rng(0)
    gts0 = [
        rng.uniform(0, 1, (Hs[i], Ws[i], 3)).astype(np.float32)
        for i in range(8)
    ]
    bg = jnp.zeros(3)

    # bucket: pad cameras + images, build masks; unify the STATIC fov
    # fields (unused on the surfel path) so the pytrees stack
    f0 = cams0[0]
    cams = [
        c.pad_to(H, W).replace(fovx=f0.fovx, fovy=f0.fovy)
        for c in cams0
    ]
    gts = np.zeros((8, H, W, 3), np.float32)
    masks = np.zeros((8, H, W, 1), np.float32)
    for i in range(8):
        gts[i, : Hs[i], : Ws[i]] = gts0[i]
        masks[i, : Hs[i], : Ws[i]] = 1.0

    cam_b = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    dp_step = jax.jit(
        make_train_step_dp(opt_cfg, CFG, spatial_lr_scale=1.0, mesh=mesh)
    )
    ts2, aux = dp_step(
        ts, cam_b, jnp.asarray(gts), bg, pix_masks=jnp.asarray(masks)
    )
    assert np.isfinite(float(aux.loss))

    # per-camera original-size singles (no mask, native resolution)
    losses = []
    for i in range(8):
        s1 = jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0))
        _, a1 = s1(ts, cams0[i], jnp.asarray(gts0[i]), bg)
        losses.append(float(a1.loss))
    # l1/psnr/normal terms match exactly; ssim differs only in the <11 px
    # window band at the pad boundary -> modest tolerance
    np.testing.assert_allclose(float(aux.loss), np.mean(losses), rtol=2e-2)
    np.testing.assert_allclose(float(aux.l1), np.mean([
        float(jax.jit(make_train_step(opt_cfg, CFG, spatial_lr_scale=1.0))(
            ts, cams0[i], jnp.asarray(gts0[i]), bg)[1].l1) for i in range(8)
    ]), rtol=1e-4)
