"""Micro-profile of CURRENT binning internals + pack-VJP alternatives (dev).

Times each stage of tpu_splat/raster/binning.py as written today, then the
pack backward (permute + segscan) split into parts, plus candidate
replacements (scatter-add, bf16 gather, sort-with-pads aligned build).
"""
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
    from tpu_splat.raster.binning import bin_gaussians, INSTANCE_ALIGN, _expand_by_offsets
    from tpu_splat.core.segops import segment_sum_sorted

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
            H, W, sh_degree=0, colors=jnp.zeros((capacity, 3)),
        )
    )(state.xyz, scales, state.rotation)

    tiles_y, tiles_x = tile_grid(H, W)
    n_tiles = tiles_y * tiles_x
    cap = cfg.max_instances
    P = capacity
    al = INSTANCE_ALIGN

    # ---------- current binning, stage by stage ----------
    def s_argsort(depth, valid):
        gkey = jnp.where(valid, depth, jnp.inf)
        return jnp.argsort(gkey, stable=True).astype(jnp.int32)

    gorder = jax.jit(s_argsort)(prep.depth, prep.valid)
    timed(s_argsort, (prep.depth, prep.valid), iters=4, name="1 depth argsort (1M)")

    area_o = prep.tiles_touched[gorder]
    offsets = jnp.cumsum(area_o) - area_o
    total = jnp.sum(prep.tiles_touched)

    def s_expand(offsets):
        return _expand_by_offsets(offsets, cap)

    gsel = jax.jit(s_expand)(offsets)
    timed(s_expand, (offsets,), iters=4, name="2 expand marker+cumsum (4M)")

    gmat = jnp.stack(
        [
            offsets,
            prep.rect_min[gorder][:, 0],
            prep.rect_min[gorder][:, 1],
            jnp.maximum(prep.rect_max[gorder][:, 0] - prep.rect_min[gorder][:, 0], 1),
            gorder,
            jnp.zeros_like(gorder),
            jnp.zeros_like(gorder),
            jnp.zeros_like(gorder),
        ],
        axis=1,
    )

    def s_rows(gmat, gsel, total):
        rows = gmat[gsel]
        i = jnp.arange(cap, dtype=jnp.int32)
        j = i - rows[:, 0]
        slot_valid = i < jnp.minimum(total, cap)
        rw = rows[:, 3]
        tx = rows[:, 1] + j % rw
        ty = rows[:, 2] + j // rw
        inst_tile = jnp.where(slot_valid, ty * tiles_x + tx, n_tiles)
        inst_gid = jnp.where(slot_valid, rows[:, 4], 0)
        return inst_tile, inst_gid

    inst_tile, inst_gid = jax.jit(s_rows)(gmat, gsel, total)
    timed(s_rows, (gmat, gsel, total), iters=4, name="3 derive rowgather [4M,8]")

    def s_sort1(inst_tile, inst_gid):
        return jax.lax.sort((inst_tile, inst_gid), num_keys=1, is_stable=True)

    sorted_tile, sorted_gid = jax.jit(s_sort1)(inst_tile, inst_gid)
    timed(s_sort1, (inst_tile, inst_gid), iters=4, name="4 sort1 4M pairs")

    def s_ranges(sorted_tile):
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
        return starts, ends - starts

    starts, counts = jax.jit(s_ranges)(sorted_tile)
    timed(s_ranges, (sorted_tile,), iters=4, name="5 ranges searchsorted")

    aligned_counts = ((counts + al - 1) // al) * al
    aligned_starts = (jnp.cumsum(aligned_counts) - aligned_counts).astype(jnp.int32)
    cap_al = cap + n_tiles * al

    def s_aligned_cur(aligned_starts, starts, counts, sorted_gid):
        s = jnp.arange(cap_al, dtype=jnp.int32)
        t = jnp.clip(_expand_by_offsets(aligned_starts, cap_al), 0, n_tiles - 1)
        tmat = jnp.stack([aligned_starts, starts, counts, counts], axis=1)
        trows = tmat[t]
        o = s - trows[:, 0]
        src = trows[:, 1] + o
        valid = o < trows[:, 2]
        gid = jnp.where(valid, sorted_gid[jnp.clip(src, 0, cap - 1)], 0)
        return gid, valid

    a_gid, a_valid = jax.jit(s_aligned_cur)(aligned_starts, starts, counts, sorted_gid)
    timed(s_aligned_cur, (aligned_starts, starts, counts, sorted_gid), iters=4,
          name="6 aligned cur (expand+2gather)")

    # candidate: sort-with-pads aligned build
    def s_aligned_sortpad(sorted_tile, sorted_gid, counts):
        a_counts = ((counts + al - 1) // al) * al
        pad_counts = a_counts - counts
        pad_off = jnp.cumsum(pad_counts) - pad_counts
        pad_cap = n_tiles * al
        pad_tile = _expand_by_offsets(pad_off, pad_cap)
        npads = jnp.sum(pad_counts)
        pad_valid_slot = jnp.arange(pad_cap, dtype=jnp.int32) < npads
        pad_tile = jnp.where(pad_valid_slot, pad_tile, n_tiles)
        key = jnp.concatenate([sorted_tile, pad_tile])
        gid = jnp.concatenate([sorted_gid, jnp.zeros(pad_cap, jnp.int32)])
        flag = jnp.concatenate(
            [
                (sorted_tile < n_tiles).astype(jnp.int32),
                jnp.zeros(pad_cap, jnp.int32),
            ]
        )
        k2, g2, f2 = jax.lax.sort((key, gid, flag), num_keys=1, is_stable=True)
        return g2, f2 > 0

    jax.jit(s_aligned_sortpad)(sorted_tile, sorted_gid, counts)
    timed(s_aligned_sortpad, (sorted_tile, sorted_gid, counts), iters=4,
          name="6b aligned sort-with-pads")

    def s_group(a_gid, a_valid):
        key = jnp.where(a_valid, a_gid, P)
        s = jnp.arange(cap_al, dtype=jnp.int32)
        gid_sorted, gid_perm = jax.lax.sort((key, s), num_keys=1, is_stable=True)
        gids = jnp.arange(P, dtype=jnp.int32)
        seg_start = jnp.searchsorted(gid_sorted, gids, side="left", method="sort").astype(jnp.int32)
        seg_end = jnp.searchsorted(gid_sorted, gids, side="right", method="sort").astype(jnp.int32)
        return gid_perm, gid_sorted, seg_start, seg_end

    gid_perm, gid_sorted, seg_start, seg_end = jax.jit(s_group)(a_gid, a_valid)
    timed(s_group, (a_gid, a_valid), iters=4, name="7 by-gid group (cur)")

    # ---------- pack VJP pieces ----------
    rng = np.random.default_rng(0)
    d_rows = jnp.asarray(rng.normal(size=(cap_al, 24)).astype(np.float32))
    d_feats = jnp.asarray(rng.normal(size=(24, cap_al)).astype(np.float32))

    def s_transpose(d_feats):
        return d_feats.T.copy() if hasattr(d_feats.T, "copy") else d_feats.T

    timed(lambda x: x.T + 0.0, (d_feats,), iters=4, name="8 transpose [24,5.2M]")

    def s_permute(d_rows, gid_perm):
        return d_rows[gid_perm]

    rows_p = jax.jit(s_permute)(d_rows, gid_perm)
    timed(s_permute, (d_rows, gid_perm), iters=4, name="9 permute rowgather 5.2Mx24")

    def s_segsum(rows_p, seg_start, seg_end):
        return segment_sum_sorted(rows_p, seg_start, seg_end)

    jax.jit(s_segsum)(rows_p, seg_start, seg_end)
    timed(s_segsum, (rows_p, seg_start, seg_end), iters=4, name="10 segsum 5.2Mx24")

    # candidate: scatter-add rows
    def s_scatter(d_rows, a_gid, a_valid):
        rows = jnp.where(a_valid[:, None], d_rows, 0.0)
        return jnp.zeros((P, 24), jnp.float32).at[a_gid].add(rows)

    jax.jit(s_scatter)(d_rows, a_gid, a_valid)
    timed(s_scatter, (d_rows, a_gid, a_valid), iters=4, name="11 scatter-add 5.2Mx24")

    # candidate: bf16 permute + f32 segsum
    d_rows_bf = d_rows.astype(jnp.bfloat16)

    def s_permute_bf(d_rows_bf, gid_perm):
        return d_rows_bf[gid_perm].astype(jnp.float32)

    jax.jit(s_permute_bf)(d_rows_bf, gid_perm)
    timed(s_permute_bf, (d_rows_bf, gid_perm), iters=4, name="12 permute bf16")

    # candidate: sort-payload permute (sort by target rank carrying payload)
    def s_sortpayload(d_rows, a_gid, a_valid):
        key = jnp.where(a_valid, a_gid, P)
        pay = [d_rows[:, i] for i in range(24)]
        out = jax.lax.sort((key, *pay), num_keys=1, is_stable=True)
        return out[1]

    jax.jit(s_sortpayload)(d_rows, a_gid, a_valid)
    timed(s_sortpayload, (d_rows, a_gid, a_valid), iters=4,
          name="13 sort 24-payload 5.2M")


if __name__ == "__main__":
    main()
