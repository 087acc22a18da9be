"""Chained profile: full render step vs initial-stage (no env) vs env-only.

Isolates the deferred-reflection (cubemap) cost inside the train-style step.
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
    from tpu_splat.renderer import render
    from tpu_splat.envmap.cubemap import sample_cubemap

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        H, W, n, capacity = 1088, 1920, 1_000_000, 1 << 20
        cfg = RasterConfig(
            max_tiles_per_gaussian=32, max_instances=3_670_016,
            tile_depth=2048, chunk=32, backend="pallas",
        )
    else:
        H, W, n, capacity = 256, 256, 20000, 1 << 15
        cfg = RasterConfig(
            max_tiles_per_gaussian=16, max_instances=1 << 16,
            tile_depth=256, chunk=16, backend="pallas",
        )

    state = build_state(n, capacity)
    cam = orbit_camera(H, W, radius=6.0, azimuth=0.4, elevation=0.3)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    params = state.param_pytree()

    def make(initial_stage):
        def loss(params):
            s = state.with_params(params)
            out = render(s, cam, cfg, bg, initial_stage=initial_stage)
            return jnp.mean(jnp.abs(out.render - gt))

        def fwdbwd(params):
            return jax.value_and_grad(loss)(params)

        return fwdbwd

    # pure env-sample chain at image scale: dirs from pixels, loss -> tex+dirs
    dirs = rng.normal(size=(H, W, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    def env_loss(args):
        env, d = args
        s = jax.nn.sigmoid(sample_cubemap(env, d))
        return jnp.mean(jnp.abs(s - gt))

    def env_fwdbwd(args):
        return jax.value_and_grad(env_loss)(args)

    timed(env_fwdbwd, ((state.env, dirs),), name="env sample fwd+bwd (tex+dirs)")

    # rasterize-only fwd+bwd (no renderer post-processing, no env)
    from tpu_splat.raster import rasterize

    def rast_loss(p):
        s = state.with_params(p)
        out = rasterize(
            s.xyz, s.get_scaling(), s.rotation, s.get_opacity(), s.get_refl(),
            cam, bg, cfg, sh=s.get_features(), sh_degree=3, alive=s.alive,
        )
        return (
            jnp.mean(jnp.abs(out.color - gt))
            + jnp.mean(out.others)
            + jnp.mean(out.refl_map)
        )

    def rast_fwdbwd(p):
        return jax.value_and_grad(rast_loss)(p)

    timed(rast_fwdbwd, (params,), name="rasterize-only fwd+bwd")
    timed(make(True), (params,), name="render fwd+bwd initial_stage")
    timed(make(False), (params,), name="render fwd+bwd deferred")


if __name__ == "__main__":
    main()
