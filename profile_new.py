"""Measure the redesigned binning / pack-VJP / cubemap-VJP on TPU (dev tool)."""
from __future__ import annotations

import numpy as np
from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import bin_gaussians
    from tpu_splat.kernels.tile_blend import pack_features
    from tpu_splat.envmap.cubemap import sample_cubemap
    from tpu_splat.renderer import render

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
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)
    scales = jnp.exp(state.scaling)
    opacity = jax.nn.sigmoid(state.opacity[:, 0])
    refl = jax.nn.sigmoid(state.refl[:, 0])
    scope = jnp.ones((capacity,), bool)

    prep = jax.jit(
        lambda xyz, s, r: preprocess(
            xyz, s, r, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=3,
        )
    )(state.xyz, scales, state.rotation)

    def stage_bin(prep):
        return bin_gaussians(prep, H, W, cfg, aligned=True)

    binned = jax.jit(stage_bin)(prep)
    timed(stage_bin, (prep,), iters=4, name="NEW binning (scan expand)")

    def pack_loss(hom, xy, color, nrm, b):
        f = pack_features(
            b.aligned_gid, b.aligned_valid, hom, xy,
            opacity, nrm, color, refl, scope,
            gid_perm=b.gid_perm, gid_sorted=b.gid_sorted,
            seg_start=b.seg_start, seg_end=b.seg_end,
        )
        return jnp.sum(f * 1e-8)

    def pack_bwd(hom, xy, color, nrm, b):
        return jax.grad(pack_loss, argnums=(0, 1, 2, 3))(hom, xy, color, nrm, b)

    jax.jit(pack_bwd)(prep.hom, prep.xy, prep.color, prep.normal_view, binned)
    timed(
        pack_bwd, (prep.hom, prep.xy, prep.color, prep.normal_view, binned),
        iters=4, name="NEW pack_features BWD (segsum)",
    )

    dirs = jax.random.normal(jax.random.PRNGKey(0), (H, W, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def env_bwd(tex, dirs):
        def f(tex, dirs):
            return jnp.sum(
                sample_cubemap(state.env._replace(texture=tex), dirs) * 1e-8
            )
        return jax.grad(f, argnums=(0, 1))(tex, dirs)

    jax.jit(env_bwd)(state.env.texture, dirs)
    timed(env_bwd, (state.env.texture, dirs), iters=4,
          name="NEW cubemap BWD (scan)")

    def full_fwd(params):
        s = state.with_params(params)
        out = render(s, cam, cfg, bg, initial_stage=False)
        return jnp.mean(jnp.abs(out.render - gt))

    params = state.param_pytree()

    def full_fwdbwd(params):
        return jax.value_and_grad(full_fwd)(params)

    timed(full_fwd, (params,), iters=4, name="NEW render fwd (full)")
    timed(full_fwdbwd, (params,), iters=4, name="NEW render fwd+bwd (full)")


if __name__ == "__main__":
    main()
