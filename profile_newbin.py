"""Sub-stage profile of the NEW binning + pack VJP (dev tool).
All big arrays passed as jit ARGUMENTS (closure constants embed in the axon
compile payload and OOM the compile helper)."""
from __future__ import annotations

import numpy as np
from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_state
    from tpu_splat.data import orbit_camera
    from tpu_splat.raster.config import RasterConfig, tile_grid
    from tpu_splat.raster.preprocess import preprocess
    from tpu_splat.raster.binning import bin_gaussians, INSTANCE_ALIGN
    from tpu_splat.kernels.tile_blend import segment_sum_sorted

    H, W, n, capacity = 1088, 1920, 1_000_000, 1 << 20
    cfg = RasterConfig(
        max_tiles_per_gaussian=32, max_instances=1 << 22,
        tile_depth=2048, chunk=32, backend="pallas",
    )
    state = build_state(n, capacity)
    cam = orbit_camera(H, W, radius=6.0, azimuth=0.4, elevation=0.3)
    scales = jnp.exp(state.scaling)

    prep = jax.jit(
        lambda xyz, s, r: preprocess(
            xyz, s, r, cam.world_view, cam.full_proj, cam.camera_center,
            H, W, sh_degree=0,
            colors=jnp.zeros((capacity, 3)),
        )
    )(state.xyz, scales, state.rotation)

    tiles_y, tiles_x = tile_grid(H, W)
    n_tiles = tiles_y * tiles_x
    cap = cfg.max_instances

    # --- expansion sub-stages ---
    gkey = jnp.where(prep.valid, prep.depth, jnp.inf)
    gorder = jnp.argsort(gkey, stable=True).astype(jnp.int32)
    area_o = prep.tiles_touched[gorder]
    rect_min_o = prep.rect_min[gorder]
    rect_w_o = jnp.maximum(prep.rect_max[gorder][:, 0] - rect_min_o[:, 0], 1)
    offsets = jnp.cumsum(area_o) - area_o
    total = jnp.sum(prep.tiles_touched)

    def stage_mark(offsets):
        mark = jnp.zeros((cap + 1,), jnp.int32).at[jnp.minimum(offsets, cap)].add(1)
        return jnp.cumsum(mark[:cap]) - 1

    gsel = jax.jit(stage_mark)(offsets)
    timed(stage_mark, (offsets,), iters=4, name="mark scatter+cumsum (4M)")

    def stage_derive(gsel, offsets, rect_min_o, rect_w_o, gorder, total):
        i = jnp.arange(cap, dtype=jnp.int32)
        j = i - offsets[gsel]
        slot_valid = i < jnp.minimum(total, cap)
        rw = rect_w_o[gsel]
        tx = rect_min_o[gsel, 0] + j % rw
        ty = rect_min_o[gsel, 1] + j // rw
        inst_tile = jnp.where(slot_valid, ty * tiles_x + tx, n_tiles)
        inst_gid = jnp.where(slot_valid, gorder[gsel], 0)
        return inst_tile, inst_gid

    inst_tile, inst_gid = jax.jit(stage_derive)(
        gsel, offsets, rect_min_o, rect_w_o, gorder, total
    )
    timed(
        stage_derive, (gsel, offsets, rect_min_o, rect_w_o, gorder, total),
        iters=4, name="derive tiles (gathers 4M)",
    )

    sorted_tile, sorted_gid = jax.lax.sort(
        (inst_tile, inst_gid), num_keys=1, is_stable=True
    )
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    counts = (
        jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
        - starts
    )

    def stage_tilegid(sorted_gid, starts, counts):
        k = jnp.arange(cfg.tile_depth, dtype=jnp.int32)[None, :]
        slots = jnp.clip(starts[:, None] + k, 0, cap - 1)
        return sorted_gid[slots], k < jnp.minimum(counts, cfg.tile_depth)[:, None]

    jax.jit(stage_tilegid)(sorted_gid, starts, counts)
    timed(stage_tilegid, (sorted_gid, starts, counts), iters=4,
          name="tile_gid gather (T x 2048)")

    al = INSTANCE_ALIGN
    aligned_counts = ((counts + al - 1) // al) * al
    aligned_starts = (jnp.cumsum(aligned_counts) - aligned_counts).astype(jnp.int32)
    cap_al = cap + n_tiles * al

    def stage_aligned(aligned_starts, starts, counts, sorted_gid):
        s = jnp.arange(cap_al, dtype=jnp.int32)
        t = jnp.searchsorted(aligned_starts, s, side="right").astype(jnp.int32) - 1
        t = jnp.clip(t, 0, n_tiles - 1)
        o = s - aligned_starts[t]
        src = starts[t] + o
        valid = o < counts[t]
        gid = jnp.where(valid, sorted_gid[jnp.clip(src, 0, cap - 1)], 0)
        return gid, valid

    aligned_gid, aligned_valid = jax.jit(stage_aligned)(
        aligned_starts, starts, counts, sorted_gid
    )
    timed(stage_aligned, (aligned_starts, starts, counts, sorted_gid), iters=4,
          name="aligned gather build (5.2M)")

    def stage_group(aligned_gid, aligned_valid):
        key = jnp.where(aligned_valid, aligned_gid, capacity)
        s = jnp.arange(cap_al, dtype=jnp.int32)
        gid_sorted, gid_perm = jax.lax.sort((key, s), num_keys=1, is_stable=True)
        gids = jnp.arange(capacity, dtype=jnp.int32)
        seg_start = jnp.searchsorted(gid_sorted, gids, side="left").astype(jnp.int32)
        seg_end = jnp.searchsorted(gid_sorted, gids, side="right").astype(jnp.int32)
        return gid_perm, gid_sorted, seg_start, seg_end

    gid_perm, gid_sorted, seg_start, seg_end = jax.jit(stage_group)(
        aligned_gid, aligned_valid
    )
    timed(stage_group, (aligned_gid, aligned_valid), iters=4,
          name="by-gid grouping (sort+2 searchsorted)")

    # --- pack VJP core: permute + segmented scan ---
    rng = np.random.default_rng(0)
    d_rows = jnp.asarray(rng.normal(size=(cap_al, 24)).astype(np.float32))

    def stage_segsum(d_rows, gid_perm, gid_sorted, seg_start, seg_end):
        rows = d_rows[gid_perm]
        return segment_sum_sorted(rows, seg_start, seg_end)

    jax.jit(stage_segsum)(d_rows, gid_perm, gid_sorted, seg_start, seg_end)
    timed(stage_segsum, (d_rows, gid_perm, gid_sorted, seg_start, seg_end),
          iters=4, name="permute+segscan (5.2M x 24)")


if __name__ == "__main__":
    main()
