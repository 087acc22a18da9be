"""Minimal on-device localization of Pallas-vs-XLA blend divergence.

Runs ONE rasterize at moderate scale on both backends (shared binning
inputs), prints per-tile max color deltas bucketed by the tile's chunk
count — separates geometry/precision errors (all tiles) from DMA-pipeline
errors (multi-chunk or specific tiles) — plus the worst tile's details.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_splat.data import random_scene, orbit_camera
    from tpu_splat.raster.config import RasterConfig, tile_grid, TILE
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import bin_gaussians
    from tpu_splat.raster.blend import blend, blend_pallas

    H = W = 256
    n = 2500
    raw = random_scene(n, seed=0, sh_degree=0)
    cam = orbit_camera(H, W, radius=4.0, azimuth=0.4, elevation=0.3)
    bg = jnp.array([0.1, 0.2, 0.3])
    cfg = RasterConfig(
        max_tiles_per_gaussian=64, max_instances=1 << 18, tile_depth=4096,
        chunk=32, backend="pallas",
    )
    means = jnp.asarray(raw["xyz"])
    scales = jnp.exp(jnp.asarray(raw["scaling"]))
    rots = jnp.asarray(raw["rotation"])
    opa = jax.nn.sigmoid(jnp.asarray(raw["opacity"][:, 0]))
    refl = jax.nn.sigmoid(jnp.asarray(raw["refl"][:, 0]))
    sh = jnp.asarray(raw["sh"])
    scope = jnp.ones((n,), bool)

    @jax.jit
    def run_both(means, scales, rots, opa, refl):
        prep = preprocess(
            means, scales, rots, cam.world_view, cam.full_proj,
            cam.camera_center, H, W, sh=sh, sh_degree=0,
        )
        b_al = bin_gaussians(prep, H, W, cfg, aligned=True)
        b_x = bin_gaussians(prep, H, W, cfg, aligned=False)
        out_p = blend_pallas(
            b_al, prep.hom, prep.xy, opa, prep.normal_view, prep.color,
            refl, scope, bg, H, W,
        )
        out_x = blend(
            b_x.tile_gid, b_x.tile_mask, prep.hom, prep.xy, opa,
            prep.normal_view, prep.color, refl, scope, bg, H, W, cfg,
        )
        return (
            out_p.color, out_x.color, out_p.final_T, out_x.final_T,
            b_al.tile_counts, b_al.num_instances,
        )

    cp, cx, tp, tx_, counts, ninst = map(np.asarray, run_both(
        means, scales, rots, opa, refl
    ))
    ty, tx = tile_grid(H, W)
    print(f"instances {int(ninst)} / {cfg.max_instances}  "
          f"max_tile {counts.max()} / {cfg.tile_depth}", flush=True)
    d = np.abs(cp - cx).max(axis=-1)  # [H, W]
    dT = np.abs(tp - tx_)
    # per-tile max delta
    dt = d[: ty * TILE, : tx * TILE].reshape(ty, TILE, tx, TILE).max((1, 3)).ravel()
    chunks = (counts + 127) // 128
    print(f"global max color delta {d.max():.3e}  final_T delta {dT.max():.3e}")
    for c in range(0, int(chunks.max()) + 1):
        m = chunks == c
        if m.any():
            print(f"  tiles with {c:3d} chunks: {int(m.sum()):4d}  "
                  f"max delta {dt[m].max():.3e}")
    worst = int(np.argmax(dt))
    print(f"worst tile {worst} (chunks {int(chunks[worst])}, count "
          f"{int(counts[worst])}) delta {dt[worst]:.3e}")
    bad = dt > 1e-3
    print(f"tiles over 1e-3: {int(bad.sum())} / {len(dt)}")
    ok = d.max() < 5e-4
    print("KERNEL-REPRO " + ("PASS" if ok else "FAIL"), flush=True)


if __name__ == "__main__":
    main()
