"""Micro-profile of binning internals at bench scale (dev tool)."""
from __future__ import annotations

import time

import numpy as np
from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig, tile_grid
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import INSTANCE_ALIGN

    H, W, n, capacity = 1088, 1920, 1_000_000, 1 << 20
    cfg = RasterConfig(
        max_tiles_per_gaussian=32, max_instances=1 << 22,
        tile_depth=2048, chunk=32, backend="pallas",
    )
    state = build_state(n, capacity)
    cam = orbit_camera(H, W, radius=6.0, azimuth=0.4, elevation=0.3)
    sh = jnp.concatenate([state.features_dc, state.features_rest], axis=1)
    scales = jnp.exp(state.scaling)

    prep = jax.jit(
        lambda xyz, s, r: preprocess(
            xyz, s, r, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh=sh, sh_degree=3,
        )
    )(state.xyz, scales, state.rotation)

    tiles_y, tiles_x = tile_grid(H, W)
    n_tiles = tiles_y * tiles_x
    P = prep.depth.shape[0]
    Kg = cfg.max_tiles_per_gaussian
    cap = cfg.max_instances

    def stage_argsort(depth, valid):
        gkey = jnp.where(valid, depth, jnp.inf)
        return jnp.argsort(gkey, stable=True).astype(jnp.int32)

    gorder = jax.jit(stage_argsort)(prep.depth, prep.valid)
    timed(stage_argsort, (prep.depth, prep.valid), name="depth argsort (1M)")

    area_o = prep.tiles_touched[gorder]
    rect_min_o = prep.rect_min[gorder]
    rect_max_o = prep.rect_max[gorder]

    def stage_emit(area_o, rect_min_o, rect_max_o, gorder):
        offsets = jnp.cumsum(area_o) - area_o
        j = jnp.arange(Kg, dtype=jnp.int32)[None, :]
        rect_w = (rect_max_o[:, 0] - rect_min_o[:, 0])[:, None]
        emit = j < area_o[:, None]
        safe_w = jnp.maximum(rect_w, 1)
        tx = rect_min_o[:, 0:1] + j % safe_w
        ty = rect_min_o[:, 1:2] + j // safe_w
        tile = ty * tiles_x + tx
        pos = offsets[:, None] + j
        pos = jnp.where(emit & (pos < cap), pos, cap)
        gid = jnp.broadcast_to(gorder[:, None], (P, Kg))
        inst_tile = (
            jnp.full((cap + 1,), n_tiles, jnp.int32).at[pos.ravel()].set(tile.ravel())
        )[:cap]
        inst_gid = (
            jnp.zeros((cap + 1,), jnp.int32).at[pos.ravel()].set(gid.ravel())
        )[:cap]
        return inst_tile, inst_gid

    inst_tile, inst_gid = jax.jit(stage_emit)(area_o, rect_min_o, rect_max_o, gorder)
    timed(
        stage_emit, (area_o.astype(jnp.float32).astype(jnp.int32), rect_min_o, rect_max_o, gorder),
        name="emit+scatter (P*Kg=32M)",
    )

    def stage_sort(inst_tile, inst_gid):
        return jax.lax.sort((inst_tile, inst_gid), num_keys=1, is_stable=True)

    sorted_tile, sorted_gid = jax.jit(stage_sort)(inst_tile, inst_gid)
    timed(stage_sort, (inst_tile, inst_gid), name="lax.sort (4M pairs)")

    def stage_ranges(sorted_tile):
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
        return starts, ends - starts

    starts, counts = jax.jit(stage_ranges)(sorted_tile)
    timed(stage_ranges, (sorted_tile,), name="tile ranges (searchsorted)")

    def stage_align(sorted_tile, sorted_gid, starts, counts):
        al = INSTANCE_ALIGN
        aligned_counts = ((counts + al - 1) // al) * al
        aligned_starts = jnp.cumsum(aligned_counts) - aligned_counts
        cap_al = cap + n_tiles * al
        i = jnp.arange(cap, dtype=jnp.int32)
        real = sorted_tile < n_tiles
        t_idx = jnp.clip(sorted_tile, 0, n_tiles - 1)
        new_pos = aligned_starts[t_idx] + (i - starts[t_idx])
        new_pos = jnp.where(real, new_pos, cap_al)
        aligned_gid = (
            jnp.zeros((cap_al + 1,), jnp.int32).at[new_pos].set(sorted_gid)
        )[:cap_al]
        aligned_valid = (
            jnp.zeros((cap_al + 1,), bool).at[new_pos].set(real)
        )[:cap_al]
        return aligned_gid, aligned_valid, aligned_starts

    jax.jit(stage_align)(sorted_tile, sorted_gid, starts, counts)
    timed(
        stage_align, (sorted_tile, sorted_gid, starts, counts),
        name="aligned re-pack (scatter 4M)",
    )


if __name__ == "__main__":
    main()
