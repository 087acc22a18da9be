"""Tile binning: instance expansion + lexicographic depth sort + tile ranges.

Replaces the CUDA tile scheduler (rasterizer_impl.cu:70-138,282-313: CUB
prefix-sum -> duplicateWithKeys -> 64-bit radix sort -> identifyTileRanges)
with static-shape XLA built around the ops that are actually fast on TPU
(measured at 4M instances / 1M Gaussians on a v5e):

- `lax.sort` on millions of elements: ~4 ms/payload column. Big scatters:
  100-500 ms. Per-element SCALAR gathers (and searchsorted's binary-search
  loops over millions of queries): 100-600 ms. ROW gathers amortize:
  ~10 ms per 100 MB.
- So every stage is a sort, a cumsum, or a row-gather:
  * Expansion ("duplicateWithKeys"): a P-element marker scatter + cumsum
    assigns each capacity slot its source Gaussian (scan-based expand);
    per-slot tile derivation reads ONE row-gathered [cap, 8] int matrix.
  * Per-tile front-to-back order: instances are emitted depth-grouped (the
    P Gaussians are depth-argsorted first), then ONE stable single-key sort
    by tile id. Stability preserves emission order within a tile = depth
    order with ties broken by Gaussian index — identical to the reference's
    stable radix order (rasterizer_impl.cu:70-111).
  * The Pallas kernel's 128-aligned exclusive ranges: append per-tile pad
    instances and re-sort by tile id (16 ms) — NOT marker-expand + two
    gathers (64 ms).
  * Per-Gaussian grouping is FREE: each Gaussian's instances are contiguous
    in emission order (run r = [offsets[r], offsets[r]+area[r]) for depth
    rank r), so backward reductions sort values by the emission-index
    payload (aligned_rank; rank-grouped positions = emission order) and
    segment-reduce with these analytic bounds — no by-gid sort, no
    searchsorted, no inverse permutation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_splat.raster.config import RasterConfig, tile_grid
from tpu_splat.raster.preprocess import Preprocessed


class Binned(NamedTuple):
    tile_gid: jnp.ndarray | None  # [T, K] per-tile depth-sorted Gaussian ids
    tile_mask: jnp.ndarray | None  # [T, K] bool (None on the pallas path)
    num_instances: jnp.ndarray  # [] int32 true instance count (overflow check)
    max_area: jnp.ndarray  # [] int32 max tiles touched by one Gaussian
    tile_counts: jnp.ndarray  # [T] int32 instances per tile (pre-truncation)
    sorted_gid: jnp.ndarray  # [cap] instance-sorted Gaussian ids (pallas path)
    tile_starts: jnp.ndarray  # [T_padded] range start per tile in sorted order
    aligned_gid: jnp.ndarray | None  # [cap_al] 128-aligned exclusive layout
    aligned_valid: jnp.ndarray | None  # [cap_al] bool
    aligned_starts: jnp.ndarray | None  # [T_padded]
    # per-Gaussian grouping of the aligned slots (for scatter-free
    # per-Gaussian reductions in the backward): aligned slot -> its depth
    # rank. Rank r's instances occupy exactly the run [seg_start[r],
    # seg_end[r]) after a rank-keyed sort (rank-grouped positions coincide
    # with emission indices), so sorting per-slot values by this ONE
    # payload regroups them at analytic bounds — no inverse permutation,
    # no gather; it doubles as validity (rank < P) and the gw tie-sort
    # key.
    aligned_rank: jnp.ndarray | None  # [cap_al] (P where invalid)
    rank_of: jnp.ndarray | None  # [P] gaussian id -> its depth rank
    seg_start: jnp.ndarray | None  # [P] by rank
    seg_end: jnp.ndarray | None  # [P] by rank
    # [] i32: pads beyond the cfg.pad_per_tile budget (0 = layout exact);
    # check_growth escalates pad_per_tile when nonzero
    pad_overflow: jnp.ndarray | None = None


INSTANCE_ALIGN = 128  # kernels/tile_blend.py CI (lane-tile aligned)

# The expansion formulation now lives in RasterConfig.expand_mode (static,
# hashable, part of the jit cache key) — the former EXPAND_MODE module
# global was trace-context-dependent config smuggled past the static-arg
# design (round-3 advisor finding).


def _expand_by_offsets(offsets: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Scan-based expand: given nondecreasing exclusive range starts
    offsets[G], map each output slot i in [0, n_out) to the covering range
    index (the LAST g with offsets[g] <= i; zero-length ranges share their
    successor's offset and are skipped by construction)."""
    mark = (
        jnp.zeros((n_out + 1,), jnp.int32)
        .at[jnp.minimum(offsets, n_out)]
        .add(1)
    )
    return jnp.cumsum(mark[:n_out]) - 1


def _conic_column_params(prep: Preprocessed):
    """Per-Gaussian parameters of the 3-sigma screen conic for per-column
    y-extent queries: region {rho3d <= CUTOFF^2} = {(x,y): qa x^2 + qb y^2
    + qc xy + qd x + qe y + qf <= 0}, derived from the same homography the
    blend kernel uses (p = x*A + y*B + C, rho3d = (p0^2+p1^2)/p2^2 —
    forward.cu:368-384 in the reference). Returns (ok, xc, yc, alpha,
    gamma, delta): upper boundary V(u) = alpha*u + sqrt(gamma - delta*u^2)
    about the center (xc, yc), with ok=False for degenerate conics
    (camera-plane-crossing splats etc.) which must fall back to the rect."""
    from tpu_splat.raster.config import CUTOFF

    Tu = prep.hom[:, 0, :]
    Tv = prep.hom[:, 1, :]
    Tw = prep.hom[:, 2, :]
    A = jnp.cross(Tv, Tw)
    B = jnp.cross(Tw, Tu)
    C = jnp.cross(Tu, Tv)
    # scale-invariant: (A,B,C) -> (A,B,C)/n keeps rho3d; normalize so the
    # quartic combinations below stay in f32 range for tiny splats
    n = jnp.maximum(
        jnp.max(jnp.abs(jnp.stack([A, B, C], axis=1)), axis=(1, 2)), 1e-30
    )[:, None]
    A, B, C = A / n, B / n, C / n
    cut = CUTOFF * CUTOFF

    def q2(u, v):
        return u[:, 0] * v[:, 0] + u[:, 1] * v[:, 1] - cut * u[:, 2] * v[:, 2]

    qa = q2(A, A)
    qb = q2(B, B)
    qc = 2.0 * q2(A, B)
    qd = 2.0 * q2(A, C)
    qe = 2.0 * q2(B, C)
    qf = q2(C, C)
    det = 4.0 * qa * qb - qc * qc
    ok = (qa > 1e-12) & (qb > 1e-12) & (det > 1e-12)
    sdet = jnp.where(ok, det, 1.0)
    xc = (-2.0 * qb * qd + qc * qe) / sdet
    yc = (-2.0 * qa * qe + qc * qd) / sdet
    R = -(qf + 0.5 * (qd * xc + qe * yc))
    ok = ok & (R > 0) & jnp.isfinite(xc) & jnp.isfinite(yc)
    sqb = jnp.where(ok, qb, 1.0)
    alpha = jnp.where(ok, -qc / (2.0 * sqb), 0.0)
    gamma = jnp.where(ok, R / sqb, 0.0)
    delta = jnp.where(ok, det / (4.0 * sqb * sqb), 1.0)
    return ok, xc, yc, alpha, gamma, delta


def _column_y_range(rows1, j1, tiles_y: int):
    """Per-column tile-row range from the expanded level-1 table.

    rows1 columns: rx, gid, rank, xc, yc, alpha, gamma, delta, rl, px, py.
    Returns (ix, ty0, cnt_tight) where cnt_tight may be 0 (caller floors
    to 1 with an out-of-image dummy row to keep the run-expand >=1-length
    invariant)."""
    from tpu_splat.raster.config import TILE

    rx = rows1[0].astype(jnp.int32)
    xc = rows1[3]
    yc = rows1[4]
    al = rows1[5]
    ga = rows1[6]
    de = jnp.maximum(rows1[7], 1e-20)
    rl = rows1[8]
    # low-pass disk center: the blend kernel's rho2d term (F_AX2/F_AY2) is
    # centered at the PROJECTED mean prep.xy, which under perspective skew
    # diverges from the conic center (xc, yc) — testing the disk about the
    # conic center could cull tiles inside the true low-pass footprint
    # (round-3 advisor finding). The disk is tested about (px, py); the
    # conic stays about (xc, yc).
    px = rows1[9]
    py = rows1[10]

    ix = rx + j1
    x0 = ix.astype(jnp.float32) * TILE
    u0 = x0 - xc
    u1 = u0 + (TILE - 1)
    umax = jnp.sqrt(jnp.maximum(ga / de, 0.0))
    u0c = jnp.maximum(u0, -umax)
    u1c = jnp.minimum(u1, umax)
    ell_on = (u0c <= u1c) & (ga > 0)
    # stationary point of the upper boundary V(u) = al*u + sqrt(ga - de*u^2)
    ut = jnp.sign(al) * jnp.sqrt(
        jnp.maximum(al * al * ga / (de * (de + al * al)), 0.0)
    )

    def V(u):
        return al * u + jnp.sqrt(jnp.maximum(ga - de * u * u, 0.0))

    y_hi_e = yc + V(jnp.clip(ut, u0c, u1c))
    y_lo_e = yc - V(jnp.clip(ut, -u1c, -u0c))
    v0 = x0 - px
    v1 = v0 + (TILE - 1)
    disk_on = (rl >= 0) & (v1 >= -rl) & (v0 <= rl)
    big = jnp.float32(3.4e38)
    y_hi = jnp.maximum(
        jnp.where(ell_on, y_hi_e, -big), jnp.where(disk_on, py + rl, -big)
    )
    y_lo = jnp.minimum(
        jnp.where(ell_on, y_lo_e, big), jnp.where(disk_on, py - rl, big)
    )
    any_on = ell_on | disk_on
    ty0 = jnp.clip(
        jnp.floor(y_lo / TILE).astype(jnp.int32), 0, tiles_y
    )
    ty1 = jnp.clip(
        jnp.floor(y_hi / TILE).astype(jnp.int32) + 1, 0, tiles_y
    )
    cnt = jnp.where(any_on, jnp.maximum(ty1 - ty0, 0), 0)
    ty0 = jnp.where(cnt > 0, ty0, tiles_y)  # dummy rows key past the image
    return ix, ty0, cnt


def bin_gaussians(
    prep: Preprocessed, height: int, width: int, cfg: RasterConfig,
    pad_tiles_to: int = 1,
    aligned: bool = False,
) -> Binned:
    """Invariant: valid rows must have tiles_touched > 0 (preprocess
    guarantees it; slab-clipped callers must clear `valid` for zero-area
    rows). The expansion decode indexes the per-rank table by EMITTING-run
    index, which equals the depth rank only when zero-area rows sort past
    the emitting prefix via the inf depth key."""
    tiles_y, tiles_x = tile_grid(height, width)
    if tiles_x > 1024 or tiles_y > 1024:
        # the packed rect encoding below uses 10-bit x/y fields; beyond 1024
        # tiles per axis (~16K px) the fields would overlap silently
        raise ValueError(
            f"image too large for packed tile coords: grid {tiles_x}x{tiles_y} "
            "(max 1024 tiles per axis = 16384 px)"
        )
    n_tiles = tiles_y * tiles_x
    n_tiles_padded = n_tiles + ((-n_tiles) % pad_tiles_to)
    cap = cfg.max_instances
    P_ = prep.depth.shape[0]

    area = prep.tiles_touched  # [P] int32, 0 for invalid

    # 1. depth-argsort the P Gaussians once (P << instances)
    gkey = jnp.where(prep.valid, prep.depth, jnp.inf)
    gorder = jnp.argsort(gkey, stable=True).astype(jnp.int32)  # [P]
    # ONE [P,2] row gather for everything rank-ordered (P-gathers are
    # per-row-latency bound: fused beats separate): area + the pre-packed
    # rect word (rect.x | rect.y << 10 | rect_width << 20)
    rw_all = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    packed_all = (
        prep.rect_min[:, 0] | (prep.rect_min[:, 1] << 10) | (rw_all << 20)
    )
    ap_o = jnp.stack([area, packed_all], axis=1)[gorder]  # [P, 2]
    area_o = ap_o[:, 0]
    packed = ap_o[:, 1]
    rw_col = packed >> 20
    offsets = jnp.cumsum(area_o) - area_o  # exclusive prefix
    total = jnp.sum(area)

    # 2. expansion: slot i -> covering Gaussian (by depth rank). Row gathers
    # run at ~3 GB/s on TPU, so the gathered matrix is squeezed to TWO i32
    # columns: (rect.x | rect.y << 10 | rect_width << 20) and the Gaussian
    # id; the run start (offsets[gsel]) is recovered gather-free with a
    # cummax over the expansion markers. (Supports images up to 1024 tiles
    # per axis = 16K pixels.)
    # mark scatter: valid Gaussians' offsets are strictly ascending; dead
    # rows (area 0) would collide at the tail, so they scatter to unique
    # past-cap slots — the sorted+unique promise lets XLA vectorize the
    # scatter (measured ~4x faster than the colliding form)
    rank_ids = jnp.arange(P_, dtype=jnp.int32)
    # dead rows AND capacity-overflow rows take unique past-cap slots
    # (mark[:cap] never sees them, matching the old clip-at-cap semantics)
    scat_idx = jnp.where(
        (area_o > 0) & (offsets < cap), offsets, cap + rank_ids
    )
    i = jnp.arange(cap, dtype=jnp.int32)
    mode = cfg.expand_mode
    cap_cols = cfg.max_columns or cap
    tight = bool(cfg.tight_culling) and aligned
    if mode == "kernel" or tight:
        from tpu_splat.kernels.run_expand import BLK as _EXPAND_BLK

        if cap % _EXPAND_BLK:
            tight = False
            if mode == "kernel":
                mode = "gather"
        elif tight and cap_cols % _EXPAND_BLK:
            tight = False
    seg_start_t = seg_end_t = None
    num_inst_diag = None
    max_area_diag = None
    if tight:
        # TWO-LEVEL tight expansion: Gaussians -> tile columns (level 1,
        # area = rect width) -> tiles (level 2, per-column y-extent of the
        # 3-sigma conic union the low-pass disk). See RasterConfig
        # .tight_culling for the parity envelope.
        from tpu_splat.kernels.run_expand import run_expand
        from tpu_splat.raster.config import CUTOFF, FILTER_SIZE, TILE

        mode = "tight"
        ok_c, xc_c, yc_c, al_c, ga_c, de_c = _conic_column_params(prep)
        # degenerate conics fall back to a flat band covering exactly the
        # rect rows: alpha=0, delta~0, gamma=(half height in px)^2
        ry0 = prep.rect_min[:, 1].astype(jnp.float32)
        ry1 = prep.rect_max[:, 1].astype(jnp.float32)
        mid = (ry0 + ry1) * (TILE / 2.0)
        halfh = jnp.maximum((ry1 - ry0) * (TILE / 2.0) - 0.5, 0.0)
        use = ok_c & prep.valid
        xc_c = jnp.where(use, xc_c, prep.xy[:, 0])
        yc_c = jnp.where(use, yc_c, mid)
        al_c = jnp.where(use, al_c, 0.0)
        ga_c = jnp.where(use, ga_c, halfh * halfh)
        de_c = jnp.where(use, de_c, 1e-18)
        rl_c = jnp.where(use, CUTOFF * FILTER_SIZE, -1.0)

        # level 1: expand per-rank conic params to tile columns
        area1_o = jnp.where(area_o > 0, rw_col, 0)
        off1 = jnp.cumsum(area1_o) - area1_o
        total1 = jnp.sum(area1_o)
        scat1 = jnp.where(
            (area1_o > 0) & (off1 < cap_cols), off1, cap_cols + rank_ids
        )
        mark1 = (
            jnp.zeros((cap_cols + P_ + 1,), jnp.int32)
            .at[scat1]
            .add(1, indices_are_sorted=True, unique_indices=True)
        )
        r0_sub1 = jnp.maximum(jnp.cumsum(mark1[:cap_cols])[::128] - 1, 0)
        tab1 = jnp.stack(
            [
                (packed & 0x3FF).astype(jnp.float32),
                gorder.astype(jnp.float32),
                rank_ids.astype(jnp.float32),
                xc_c[gorder],
                yc_c[gorder],
                al_c[gorder],
                ga_c[gorder],
                de_c[gorder],
                rl_c[gorder],
                prep.xy[gorder][:, 0],
                prep.xy[gorder][:, 1],
            ],
            axis=1,
        )
        rows1, j1 = run_expand(
            tab1, jnp.minimum(off1, cap_cols), jnp.minimum(total1, cap_cols),
            r0_sub1, cap_cols,
        )
        icol = jnp.arange(cap_cols, dtype=jnp.int32)
        col_valid = icol < jnp.minimum(total1, cap_cols)
        ix, ty0, cnt_t = _column_y_range(rows1, j1, tiles_y)
        # every REAL column emits >= 1 instance (empty tight ranges emit
        # one out-of-image dummy row) — keeps run-expand's length>=1
        # invariant at level 2
        cnt2 = jnp.where(col_valid, jnp.maximum(cnt_t, 1), 0)
        off2 = jnp.cumsum(cnt2) - cnt2
        total2 = jnp.sum(cnt2)
        scat2 = jnp.where((cnt2 > 0) & (off2 < cap), off2, cap + icol)
        mark2 = (
            jnp.zeros((cap + cap_cols + 1,), jnp.int32)
            .at[scat2]
            .add(1, indices_are_sorted=True, unique_indices=True)
        )
        r0_sub2 = jnp.maximum(jnp.cumsum(mark2[:cap])[::128] - 1, 0)
        tab2 = jnp.stack(
            [
                ix.astype(jnp.float32),
                ty0.astype(jnp.float32),
                rows1[1],  # gid
                rows1[2],  # rank
            ],
            axis=1,
        )
        rows2, j2 = run_expand(
            tab2, jnp.minimum(off2, cap), jnp.minimum(total2, cap),
            r0_sub2, cap,
        )
        slot_valid = i < jnp.minimum(total2, cap)
        ty2 = rows2[1].astype(jnp.int32) + j2
        inst_tile = jnp.where(
            slot_valid,
            ty2 * tiles_x + rows2[0].astype(jnp.int32),
            n_tiles,
        )
        inst_gid = jnp.where(slot_valid, rows2[2].astype(jnp.int32), 0)
        gsel = rows2[3].astype(jnp.int32)
        total = total2
        # per-rank segment bounds: [instances at the rank's first column,
        # instances at the NEXT rank's first column)
        off2_ext = jnp.concatenate([off2, total2[None]])
        segs = jnp.minimum(off2_ext[jnp.minimum(off1, cap_cols)], cap)
        tot2c = jnp.minimum(total2, cap)
        vr = area1_o > 0
        seg_start_t = jnp.where(vr, segs, tot2c).astype(jnp.int32)
        seg_end_t = jnp.concatenate(
            [seg_start_t[1:], tot2c[None].astype(jnp.int32)]
        )
        seg_end_t = jnp.where(vr, seg_end_t, tot2c).astype(jnp.int32)
        # column overflow must also trigger capacity growth: report >= cap.
        # total2 includes the >=1-per-column dummy floor — that is real slot
        # OCCUPANCY (dummies consume capacity and truncation is by slot), so
        # it is the honest growth signal even though it can exceed the true
        # instance load on thin-splat-dominated scenes (round-3 advisor
        # note); reporting sum(cnt_t) instead would let real instances
        # truncate silently once dummies push occupancy past cap.
        num_inst_diag = jnp.where(
            total1 > cap_cols, jnp.maximum(total2, cap), total2
        )
        max_area_diag = jnp.max(seg_end_t - seg_start_t)
    if mode == "kernel":
        from tpu_splat.kernels.run_expand import run_expand

        # run-decode kernel: expand [rx, ry, rw, gid, rank] per depth rank
        # to per-slot rows in one pass; j comes back alongside. Integer
        # columns are exact in f32 (all < 2^23).
        mark = (
            jnp.zeros((cap + P_ + 1,), jnp.int32)
            .at[scat_idx]
            .add(1, indices_are_sorted=True, unique_indices=True)
        )
        gsel_full = jnp.cumsum(mark[:cap]) - 1
        r0_sub = jnp.maximum(gsel_full[::128], 0)
        tab = jnp.stack(
            [
                (packed & 0x3FF).astype(jnp.float32),
                ((packed >> 10) & 0x3FF).astype(jnp.float32),
                rw_col.astype(jnp.float32),
                gorder.astype(jnp.float32),
                rank_ids.astype(jnp.float32),
            ],
            axis=1,
        )
        rows, j = run_expand(
            tab, jnp.minimum(offsets, cap), jnp.minimum(total, cap),
            r0_sub, cap,
        )
        slot_valid = i < jnp.minimum(total, cap)
        rw = jnp.maximum(rows[2].astype(jnp.int32), 1)
        tx = rows[0].astype(jnp.int32) + j % rw
        ty = rows[1].astype(jnp.int32) + j // rw
        inst_tile = jnp.where(slot_valid, ty * tiles_x + tx, n_tiles)
        inst_gid = jnp.where(slot_valid, rows[3].astype(jnp.int32), 0)
        gsel = rows[4].astype(jnp.int32)
    elif mode == "scan":
        # gather-free expansion: scatter run-start values (flag in bit 31)
        # and propagate forward with a hold-last associative scan — three
        # scans replace mark+cumsum+cummax+row-gather (the [cap, 2] gather
        # alone is ~16 ms at bench scale, per-row-latency bound)
        FLAG = jnp.int32(-(2**31))

        def propagate(vals):  # [P] i32 in [0, 2^30) -> [cap] hold-last
            arr = (
                jnp.zeros((cap + P_ + 1,), jnp.int32)
                .at[scat_idx]
                .set(vals | FLAG, indices_are_sorted=True, unique_indices=True)
            )
            out = jax.lax.associative_scan(
                lambda a, b: jnp.where(b < 0, b, a), arr[:cap]
            )
            return out & ~FLAG

        rect_s = propagate(packed)
        gid_s = propagate(gorder)
        # rank and run-start share one column: offsets fits 22 bits and
        # rank 20 bits would overflow together; propagate offsets and
        # recover rank via a cumsum-free trick is not available, so rank
        # rides its own scan
        rank_s = propagate(rank_ids)
        off_s = propagate(offsets)
        gsel = rank_s
        j = i - off_s
        rows0 = rect_s
        rows1 = gid_s
    elif mode == "gather":
        mark = (
            jnp.zeros((cap + P_ + 1,), jnp.int32)
            .at[scat_idx]
            .add(1, indices_are_sorted=True, unique_indices=True)
        )
        gsel = jnp.cumsum(mark[:cap]) - 1  # [cap] depth rank per slot
        start_pos = jax.lax.cummax(jnp.where(mark[:cap] > 0, i, 0))
        j = i - start_pos  # linear index within the Gaussian's tile rect
        # (A quad-row window gather — [cap/4, 8] rows of 4 consecutive
        # ranks + 4-way selects, exploiting gsel's +<=1 step — measured
        # SLOWER than this plain gather on v5e: 6.24M vs 6.35M px/s whole
        # bench; the selects outweigh the row-latency saving.)
        rows = jnp.stack([packed, gorder], axis=1)[gsel]  # [cap, 2] gather
        rows0 = rows[:, 0]
        rows1 = rows[:, 1]
    if mode in ("scan", "gather"):
        slot_valid = i < jnp.minimum(total, cap)
        rw = jnp.maximum(rows0 >> 20, 1)
        tx = (rows0 & 0x3FF) + j % rw
        ty = ((rows0 >> 10) & 0x3FF) + j // rw
        inst_tile = jnp.where(slot_valid, ty * tiles_x + tx, n_tiles)
        inst_gid = jnp.where(slot_valid, rows1, 0)

    # 3. per-tile counts from a SINGLE-KEY sort of the tile ids (payload-free
    # — the aligned path below does its own payload sort, so this stays 1
    # column) + few-query binary search
    sorted_tile_only = jax.lax.sort(inst_tile, is_stable=False)
    # ONE searchsorted over n_tiles+1 integer boundaries: side-left of t+1
    # IS side-right of t for integer keys, so starts and ends share a call
    se = jnp.searchsorted(
        sorted_tile_only,
        jnp.arange(n_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)
    starts = se[:n_tiles]
    ends = se[1:]
    counts = ends - starts

    if n_tiles_padded != n_tiles:
        pad = n_tiles_padded - n_tiles
        starts = jnp.concatenate([starts, jnp.zeros(pad, jnp.int32)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, jnp.int32)])

    tile_gid = tile_mask = None
    sorted_gid = None
    if not aligned:
        # XLA-scan blend path: one payload sort for per-tile depth order,
        # then the dense [T, K] layout (the Pallas path never reads these)
        sorted_tile, sorted_gid = jax.lax.sort(
            (inst_tile, inst_gid), num_keys=1, is_stable=True
        )
        counts_capped = jnp.minimum(counts, cfg.tile_depth)
        k = jnp.arange(cfg.tile_depth, dtype=jnp.int32)[None, :]
        slots = jnp.clip(starts[:, None] + k, 0, cap - 1)
        tile_gid = sorted_gid[slots]  # [T_padded, K]
        tile_mask = k < counts_capped[:, None]

    aligned_gid = aligned_valid = aligned_starts = None
    aligned_rank = rank_of = seg_end = seg_start = None
    pad_overflow = jnp.zeros((), jnp.int32)
    if aligned:
        # 4. ONE stable payload sort directly into the 128-aligned layout:
        # append one pad instance per missing slot (keyed by its tile) to the
        # EMISSION-ordered instances and sort by tile id. Stability keeps
        # depth order within tiles (emission is depth-grouped) and puts pads
        # after each tile's real instances (concat order). This replaces the
        # former two-sort pipeline (payload sort at cap + pad re-sort at
        # cap_al) with a single payload sort at cap_al.
        al = INSTANCE_ALIGN
        aligned_counts = ((counts + al - 1) // al) * al
        aligned_starts = (jnp.cumsum(aligned_counts) - aligned_counts).astype(
            jnp.int32
        )
        pad_counts = aligned_counts - counts
        pad_cap = n_tiles_padded * min(cfg.pad_per_tile, al)
        pad_off = jnp.cumsum(pad_counts) - pad_counts
        pad_tile = _expand_by_offsets(pad_off, pad_cap)
        npads = jnp.sum(pad_counts)
        # budgeted pad capacity (cfg.pad_per_tile < 128): if the realized
        # pad total exceeds it, later tiles' aligned ranges would read other
        # tiles' instances — reported for check_growth to escalate the
        # budget (one bad frame, like instance-capacity truncation)
        pad_overflow = jnp.maximum(npads - pad_cap, 0)
        pad_ok = jnp.arange(pad_cap, dtype=jnp.int32) < npads
        pad_tile = jnp.where(pad_ok, pad_tile, n_tiles_padded)

        key = jnp.concatenate([inst_tile, pad_tile])
        gid_cat = jnp.concatenate([inst_gid, jnp.zeros(pad_cap, jnp.int32)])
        # real instances carry their depth rank (< P); pads (and
        # capacity-overflow slots, keyed to n_tiles+) carry P — ONE payload
        # provides validity, the backward's regroup key (rank-sorted
        # positions land exactly on the analytic [seg_start, seg_end) runs,
        # same as emission order), and the gw tie-sort key.
        # UNSTABLE 2-key sort: (tile, rank) is UNIQUE for real instances
        # (a Gaussian appears once per tile) and rank==P keys pads after
        # every real instance with identical payloads, so the order equals
        # the former stable single-key sort at roughly half the exchange
        # cost (stability ~doubles lax.sort on TPU).
        rank_cat = jnp.concatenate(
            [
                jnp.where(slot_valid, gsel, P_),
                jnp.full(pad_cap, P_, jnp.int32),
            ]
        )
        _, aligned_rank, aligned_gid = jax.lax.sort(
            (key, rank_cat, gid_cat), num_keys=2, is_stable=False
        )
        aligned_valid = aligned_rank < P_

        # 6. per-Gaussian segment bounds are analytic in emission space
        # (rank r's instances ARE expansion slots [offsets[r],
        # offsets[r]+area[r])); rank_of (gaussian id -> rank) unsorts
        # rank-ordered reductions. Instances past the capacity are dropped
        # (the forward never renders them; truncation hits the emission
        # tail = the last ranks, so per-rank surviving counts match the
        # clipped bounds). The backward regroups per-slot values by ONE
        # sort keyed on aligned_rank — rank-grouped positions coincide
        # with emission indices, so the analytic bounds apply directly.
        if seg_start_t is not None:
            seg_start, seg_end = seg_start_t, seg_end_t
        else:
            seg_start = jnp.minimum(offsets, cap).astype(jnp.int32)
            seg_end = jnp.minimum(offsets + area_o, cap).astype(jnp.int32)
        _, rank_of = jax.lax.sort(
            (gorder, jnp.arange(P_, dtype=jnp.int32)), num_keys=1
        )

    return Binned(
        tile_gid=tile_gid,
        tile_mask=tile_mask,
        num_instances=num_inst_diag if num_inst_diag is not None else total,
        max_area=max_area_diag if max_area_diag is not None else jnp.max(area),
        tile_counts=counts[:n_tiles],
        sorted_gid=sorted_gid,
        tile_starts=starts,
        aligned_gid=aligned_gid,
        aligned_valid=aligned_valid,
        aligned_starts=aligned_starts,
        aligned_rank=aligned_rank,
        rank_of=rank_of,
        seg_end=seg_end,
        seg_start=seg_start,
        pad_overflow=pad_overflow,
    )
