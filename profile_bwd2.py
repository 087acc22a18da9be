"""Backward-side stage profile at bench scale (dev tool).

Times the pieces hidden in the 0.94s step that profile_stages.py's
forward-only stages don't cover: full render fwd, full render fwd+bwd,
rasterize fwd+bwd, pack_features VJP, env-map sample fwd+bwd.
"""
from __future__ import annotations

import numpy as np
from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.raster import rasterize
    from tpu_splat.renderer import render
    from tpu_splat.envmap.cubemap import sample_cubemap

    H, W, n, capacity = 1088, 1920, 1_000_000, 1 << 20
    cfg = RasterConfig(
        max_tiles_per_gaussian=32, max_instances=1 << 22,
        tile_depth=2048, chunk=32, backend="pallas",
    )
    state = build_state(n, capacity)
    cam = orbit_camera(H, W, radius=6.0, azimuth=0.4, elevation=0.3)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    params = state.param_pytree()

    opacity = jax.nn.sigmoid(state.opacity[:, 0])
    refl = jax.nn.sigmoid(state.refl[:, 0])
    scales = jnp.exp(state.scaling)
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)

    def raster_fwd(xyz, scales, rot):
        out = rasterize(xyz, scales, rot, opacity, refl, cam, bg, cfg,
                        sh=sh, sh_degree=3, alive=state.alive)
        return jnp.mean(out.color) + jnp.mean(out.others) + jnp.mean(out.refl_map)

    def raster_fwdbwd(xyz, scales, rot):
        return jax.value_and_grad(raster_fwd, argnums=(0, 1, 2))(xyz, scales, rot)

    timed(raster_fwdbwd, (state.xyz, scales, state.rotation), iters=4,
          name="rasterize fwd+bwd")

    def render_fwd(params):
        s = state.with_params(params)
        out = render(s, cam, cfg, bg, initial_stage=False)
        return jnp.mean(jnp.abs(out.render - gt))

    timed(render_fwd, (params,), iters=4, name="render fwd (full)")

    def render_fwdbwd(params):
        return jax.value_and_grad(render_fwd)(params)

    timed(render_fwdbwd, (params,), iters=4, name="render fwd+bwd (full)")

    # env sampling at full image resolution
    dirs = jnp.asarray(rng.normal(size=(H * W, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    env = state.env

    def env_fwd(tex, dirs):
        return jnp.mean(sample_cubemap(env._replace(texture=tex), dirs))

    timed(env_fwd, (env.texture, dirs), iters=4, name="env sample fwd (2M)")

    def env_fwdbwd(tex, dirs):
        return jax.value_and_grad(env_fwd, argnums=(0, 1))(tex, dirs)

    timed(env_fwdbwd, (env.texture, dirs), iters=4, name="env sample fwd+bwd (2M)")


if __name__ == "__main__":
    main()
