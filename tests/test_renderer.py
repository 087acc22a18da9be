"""Deferred-reflection renderer behaviors."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_splat.data import orbit_camera
from tpu_splat.model import init_from_pcd
from tpu_splat.renderer import render, render_fast, render_env_map, depth_to_normal
from tpu_splat.raster.config import RasterConfig

H = W = 48
CFG = RasterConfig(max_tiles_per_gaussian=16, max_instances=4096, tile_depth=256, chunk=16)


def _setup(n=60, capacity=96, seed=0, refl_logit=None):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = init_from_pcd(pts, cols, capacity=capacity, cubemap_resolution=8)
    if refl_logit is not None:
        state = state.replace(refl=jnp.full_like(state.refl, refl_logit))
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    return state, cam


def test_initial_vs_deferred():
    state, cam = _setup(refl_logit=2.0)
    bg = jnp.zeros(3)
    o_init = render(state, cam, CFG, bg, initial_stage=True)
    o_def = render(state, cam, CFG, bg, initial_stage=False)
    # initial = base color; deferred mixes env reflections
    np.testing.assert_allclose(o_init.render, o_init.base_color, atol=1e-6)
    diff = np.abs(np.asarray(o_def.render - o_def.base_color)).max()
    assert diff > 0.05  # high refl -> visible difference
    # compositing identity: final = (1-r)*base + r*env
    manual = (
        (1 - o_def.refl_strength) * o_def.base_color
        + o_def.refl_strength * o_def.refl_color
    )
    np.testing.assert_allclose(o_def.render, manual, atol=1e-6)


def test_traced_initial_stage_is_jittable():
    state, cam = _setup()
    bg = jnp.zeros(3)

    @jax.jit
    def f(s, flag):
        return render(s, cam, CFG, bg, initial_stage=flag).render

    a = f(state, jnp.asarray(True))
    b = f(state, jnp.asarray(False))
    assert a.shape == b.shape  # single compile covers both stages


def test_normals_unit_or_zero():
    state, cam = _setup()
    o = render(state, cam, CFG, jnp.zeros(3))
    n = np.linalg.norm(np.asarray(o.normal), axis=-1)
    covered = np.asarray(o.alpha)[..., 0] > 0.5
    assert np.all((n[covered] > 0.9) & (n[covered] < 1.0 + 1e-3))


def test_env_scope_masking():
    state, cam = _setup(n=60, capacity=96)
    bg = jnp.zeros(3)
    o_all = render(state, cam, CFG, bg, env_scope_center=[0, 0, 0], env_scope_radius=10.0)
    o_none = render(state, cam, CFG, bg, env_scope_center=[99, 99, 99], env_scope_radius=0.1)
    assert float(jnp.max(o_all.scope_mask)) == 1.0
    assert float(jnp.max(o_none.scope_mask)) == 0.0


def test_depth_to_normal_plane():
    """A constant-depth plane facing the camera yields normals along the view."""
    cam = orbit_camera(32, 32, radius=4.0, azimuth=0.0, elevation=0.0)
    depth = jnp.full((32, 32), 2.0)
    n = np.asarray(depth_to_normal(cam, depth))
    inner = n[8:-8, 8:-8]
    norms = np.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # all normals agree (flat surface)
    assert np.abs(inner - inner[0, 0]).max() < 1e-3


def test_render_env_map_shapes():
    state, _ = _setup()
    env = render_env_map(state, 16, 32)
    assert env["env_cood1"].shape == (16, 32, 3)
    assert env["env_cood2"].shape == (16, 32, 3)
    assert float(jnp.min(env["env_cood1"])) >= 0.0
    assert float(jnp.max(env["env_cood1"])) <= 1.0


def test_render_fast_matches_render_happy_path():
    state, cam = _setup(refl_logit=0.0)
    bg = jnp.array([0.1, 0.2, 0.3])
    o1 = render(state, cam, CFG, bg, initial_stage=False)
    o2 = render_fast(state, cam, CFG, bg, initial_stage=False)
    np.testing.assert_allclose(o1.render, o2.render, atol=1e-5)
    np.testing.assert_allclose(o1.normal, o2.normal, atol=1e-5)
