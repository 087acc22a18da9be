"""Stage-by-stage profile of the render pipeline at bench scale (dev tool).

Times each pipeline stage in isolation using the device-chaining trick from
bench.py (K reps inside one jit; t(K)-t(1) isolates device time).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timed(fn, args, iters=6, name=""):
    """Per-step device time via t(K)-t(1) on a chained fori_loop.

    The accumulator perturbs the FIRST float input each iteration (at 1e-30,
    numerically invisible) so the body is loop-VARIANT — without this XLA
    hoists pure stages out of the loop (LICM) and reports ~0 ms."""
    import jax
    import jax.numpy as jnp

    def chained(k):
        @jax.jit
        def run(*a):
            def perturb(x, eps):
                # float leaves: + eps (1e-30, invisible); int leaves:
                # + int(eps) (0 at runtime, but not provably so -> defeats LICM)
                def f(l):
                    if jnp.issubdtype(l.dtype, jnp.floating):
                        return l + eps.astype(l.dtype)
                    if jnp.issubdtype(l.dtype, jnp.integer):
                        return l + eps.astype(l.dtype)
                    return l

                return jax.tree.map(f, x)

            def body(i, acc):
                a2 = (perturb(a[0], acc * 1e-30),) + a[1:]
                out = fn(*a2)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l.astype(jnp.float32)) * 1e-20 for l in leaves)
                return acc + s

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    run1, runk = chained(1), chained(iters + 1)
    float(run1(*args))
    float(runk(*args))
    t0 = time.perf_counter(); float(run1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(runk(*args)); tk = time.perf_counter() - t0
    dt = max(tk - t1, 1e-9) / iters
    print(f"{name:32s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import bin_gaussians
    from tpu_splat.raster import rasterize
    from tpu_splat.renderer import render
    from tpu_splat.kernels.tile_blend import pack_features, tile_blend_forward, tile_blend_backward

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

    from tpu_splat.model.state import GaussianState

    opacity = jax.nn.sigmoid(state.opacity[:, 0])
    refl = jax.nn.sigmoid(state.refl[:, 0])
    scales = jnp.exp(state.scaling)
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)

    import os as _os

    which = _os.environ.get("PROFILE_STAGES", "full,stages").split(",")

    def full_fwd(params):
        s = state.with_params(params)
        out = render(s, cam, cfg, bg, initial_stage=False)
        return jnp.mean(jnp.abs(out.render - gt))

    params = state.param_pytree()

    def full_fwdbwd(params):
        return jax.value_and_grad(full_fwd)(params)

    if "full" in which:
        timed(full_fwdbwd, (params,), name="render fwd+bwd (full)")
        timed(full_fwd, (params,), name="render fwd (full)")
    if "stages" not in which:
        return

    def stage_prep(xyz, scales, rot):
        return preprocess(
            xyz, scales, rot, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=3,
        )

    prep = jax.jit(stage_prep)(state.xyz, scales, state.rotation)
    timed(stage_prep, (state.xyz, scales, state.rotation), name="preprocess (P=1M)")

    def stage_bin(prep):
        return bin_gaussians(prep, H, W, cfg, aligned=True)

    binned = jax.jit(stage_bin)(prep)
    timed(stage_bin, (prep,), name="binning+sort (4M cap)")

    scope = jnp.ones((capacity,), bool)

    def stage_pack(prep, binned):
        return pack_features(
            binned.aligned_gid, binned.aligned_valid, prep.hom, prep.xy,
            opacity, prep.normal_view, prep.color, refl, scope,
        )

    feats = jax.jit(stage_pack)(prep, binned)
    timed(stage_pack, (prep, binned), name="pack_features")

    from tpu_splat.raster.config import tile_grid, TILE
    ty, tx = tile_grid(H, W)
    t_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    org_x = (t_ids % tx) * TILE
    org_y = (t_ids // tx) * TILE
    al = binned.aligned_starts
    counts = binned.tile_counts

    def stage_blend(feats):
        return tile_blend_forward(feats, al, counts, org_x, org_y)

    out_px, _ = jax.jit(stage_blend)(feats)
    timed(stage_blend, (feats,), name="tile_blend fwd (pallas)")

    ct = jax.tree.map(jnp.ones_like, out_px)

    def stage_bwd(feats, out_px):
        return tile_blend_backward(feats, al, counts, org_x, org_y, out_px, ct)

    jax.jit(stage_bwd)(feats, out_px)
    timed(stage_bwd, (feats, out_px), name="tile_blend bwd (pallas)")

    def stage_raster_fwd(xyz, scales, rot):
        return rasterize(
            xyz, scales, rot, opacity, refl, cam, bg, cfg,
            sh=sh, sh_degree=3, alive=state.alive,
        )

    timed(stage_raster_fwd, (state.xyz, scales, state.rotation), name="rasterize fwd (full)")


if __name__ == "__main__":
    main()
