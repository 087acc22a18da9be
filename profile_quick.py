"""Quick stage profiler: plain jit per stage, enqueue-K-then-block timing.

Async dispatch pipelines K executions on device; one block at the end.
Compile cost is paid once per stage (persistent cache makes reruns cheap).
Usage: python profile_quick.py [stage ...]   (default: all)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timed(fn, args, iters=8, name=""):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig, tile_grid, TILE
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import bin_gaussians
    from tpu_splat.kernels.tile_blend import (
        pack_features,
        tile_blend_forward,
        tile_blend_backward,
        blend_kernel,
    )

    which = set(sys.argv[1:]) or {
        "prep", "bin", "pack", "fwd", "bwd", "packbwd", "raster", "rbwd"
    }

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
    opacity = jax.jit(lambda o: jax.nn.sigmoid(o[:, 0]))(state.opacity)
    refl = jax.jit(lambda r: jax.nn.sigmoid(r[:, 0]))(state.refl)
    scales = jax.jit(jnp.exp)(state.scaling)
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)
    scope = jnp.ones((capacity,), bool)

    def stage_prep(xyz, scales, rot, sh):
        return preprocess(
            xyz, scales, rot, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=3,
        )

    stage_prep = jax.jit(stage_prep)
    prep = jax.block_until_ready(stage_prep(state.xyz, scales, state.rotation, sh))
    if "prep" in which:
        timed(stage_prep, (state.xyz, scales, state.rotation, sh), name="preprocess (P=1M)")

    stage_bin = jax.jit(lambda p: bin_gaussians(p, H, W, cfg, aligned=True))
    binned = jax.block_until_ready(stage_bin(prep))
    print(f"   instances: {int(binned.num_instances)}", flush=True)
    if "bin" in which:
        timed(stage_bin, (prep,), name="binning+sort (4M cap)")

    def stage_pack(prep, binned, opacity, refl):
        return pack_features(
            binned.aligned_gid, binned.aligned_valid, prep.hom, prep.xy,
            opacity, prep.normal_view, prep.color, refl, scope,
        )

    stage_pack = jax.jit(stage_pack)
    feats = jax.block_until_ready(stage_pack(prep, binned, opacity, refl))
    if "pack" in which:
        timed(stage_pack, (prep, binned, opacity, refl), name="pack_features")

    ty, tx = tile_grid(H, W)
    t_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    org_x = (t_ids % tx) * TILE
    org_y = (t_ids // tx) * TILE
    al = binned.aligned_starts
    counts = binned.tile_counts

    stage_fwd = jax.jit(lambda f: tile_blend_forward(f, al, counts, org_x, org_y))
    out_px, _ = jax.block_until_ready(stage_fwd(feats))
    if "fwd" in which:
        timed(stage_fwd, (feats,), name="tile_blend fwd (pallas)")

    ct = jax.tree.map(jnp.ones_like, out_px)
    stage_bwd = jax.jit(
        lambda f, o: tile_blend_backward(f, al, counts, org_x, org_y, o, ct)
    )
    jax.block_until_ready(stage_bwd(feats, out_px))
    if "bwd" in which:
        timed(stage_bwd, (feats, out_px), name="tile_blend bwd (pallas)")

    if "packbwd" in which:
        # pack + kernel fwd+bwd through the custom vjp (incl. gather transpose)
        def pk(prep, binned, opacity, refl):
            f = pack_features(
                binned.aligned_gid, binned.aligned_valid, prep.hom, prep.xy,
                opacity, prep.normal_view, prep.color, refl, scope,
                rank_perm=binned.rank_perm, rank_of=binned.rank_of,
                seg_start=binned.seg_start, seg_end=binned.seg_end,
            )
            out_px, _w = blend_kernel(f, al, counts, org_x, org_y)
            return jnp.sum(out_px)

        g = jax.jit(jax.grad(pk, argnums=(2, 3)))
        jax.block_until_ready(g(prep, binned, opacity, refl))
        timed(g, (prep, binned, opacity, refl), name="pack+kernel fwd+bwd+transpose")

    if "raster" in which or "rbwd" in which:
        from tpu_splat.raster import rasterize

        bg = jnp.zeros(3)

        def full(xyz, scales, rot, sh, opa, rfl):
            out = rasterize(
                xyz, scales, rot, opa, rfl, cam, bg, cfg,
                sh=sh, sh_degree=3, alive=state.alive,
            )
            return out

        rfwd = jax.jit(full)
        jax.block_until_ready(rfwd(state.xyz, scales, state.rotation, sh, opacity, refl))
        if "raster" in which:
            timed(rfwd, (state.xyz, scales, state.rotation, sh, opacity, refl),
                  name="rasterize fwd (full)")

        def loss(xyz, scales, rot, sh, opa, rfl):
            out = rasterize(
                xyz, scales, rot, opa, rfl, cam, bg, cfg,
                sh=sh, sh_degree=3, alive=state.alive,
            )
            return (
                jnp.mean(out.color) + jnp.mean(out.others) + jnp.mean(out.refl_map)
            )

        rbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        jax.block_until_ready(rbwd(state.xyz, scales, state.rotation, sh, opacity, refl))
        if "rbwd" in which:
            timed(rbwd, (state.xyz, scales, state.rotation, sh, opacity, refl),
                  name="rasterize fwd+bwd (full)")


if __name__ == "__main__":
    main()
