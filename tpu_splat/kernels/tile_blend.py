"""Pallas TPU kernel: per-tile alpha-compositing forward sweep.

Speed-of-light replacement for the XLA scan in tpu_splat.raster.blend
(itself the TPU analogue of renderCUDA, forward.cu:258-489). Design:

- Instance attributes are pre-gathered ONCE in depth-sorted instance order
  into a feature-major [F=24, N_cap] array (contiguous — the per-step random
  gathers that dominate the XLA path disappear). Each tile's instance range
  is padded to a 128-instance boundary and ranges are mutually exclusive, so
  every DMA is 256-byte aligned and per-instance outputs never cross tiles.
- grid = (num_tiles,): each program sweeps one 16x16 tile. Per-tile
  (start, count) arrive via scalar prefetch; the chunk loop is a while_loop
  with the tile's REAL trip count — no padded compute — and terminates early
  once every pixel saturates (T < 1e-4), like the CUDA block vote
  (forward.cu:338-340).
- Each iteration DMAs a [24, 128] feature slab HBM->VMEM and evaluates the
  splat math as [64, 256] VPU ops; the sequential "over" operator becomes a
  log2(128)-step Hillis-Steele prefix product over the instance axis.
- Per-pixel state lives in a [16, 256] VMEM accumulator; per-instance max
  blend weights stream back to HBM per chunk (contiguous stores, no atomics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_splat.raster.config import (
    TILE,
    TILE_PIX,
    NEAR_N,
    FAR_N,
    ALPHA_MIN,
    ALPHA_MAX,
    T_EPS,
    FILTER_INV_SQUARE,
)

# feature rows in the packed [F, N] instance array
F_TU = 0  # 0:3
F_TV = 3
F_TW = 6
F_XY = 9  # 9:11
F_OPA = 11
F_COL = 12  # 12:15
F_NRM = 15  # 15:18
F_REFL = 18
F_SCOPE = 19
F_PAD = 24

# packed per-pixel output rows in [T, 16, 256]
O_COL = 0  # 0:3
O_T = 3
O_DEPTH = 4
O_REFL = 5
O_DIST = 6
O_NRM = 7  # 7:10
O_MED = 10
O_SCOPE = 11
O_NCON = 12
O_M1 = 13
O_M2 = 14
O_MEDRANK = 15  # output row 15: median contributor rank (1-based, 0 = none)
S_DONE = 16  # scratch-only row: termination flag

CI = 128  # instances per chunk; lane-tile (128) aligned DMA slabs
L = TILE_PIX


def _incl_cumprod_rows(x):
    """Inclusive cumprod along axis 0 (instances) of [CI, L], Hillis-Steele."""
    ones = jnp.ones_like(x)
    shift = 1
    while shift < CI:
        shifted = jnp.concatenate([ones[:shift], x[:-shift]], axis=0)
        x = x * shifted
        shift *= 2
    return x


def _incl_cumsum_rows(x):
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < CI:
        shifted = jnp.concatenate([zeros[:shift], x[:-shift]], axis=0)
        x = x + shifted
        shift *= 2
    return x


def _tile_blend_kernel(
    # scalar prefetch
    starts_ref,  # [T] i32 (CI-aligned, ranges mutually exclusive)
    counts_ref,  # [T] i32
    orgx_ref,  # [T] i32
    orgy_ref,  # [T] i32
    # inputs
    feats_ref,  # [F_PAD, N_cap] ANY/HBM
    wmax_init_ref,  # [8, N_cap] ANY/HBM zeros (aliased to wmax output)
    # outputs
    out_px_ref,  # block (1, 16, L) VMEM
    wmax_ref,  # [8, N_cap] ANY/HBM (row 0 = wmax; aliased, zero elsewhere)
    # scratch
    state,  # VMEM (24, L); rows 0..15 are the output block, 16+ internal
    fbuf,  # VMEM (F_PAD, CI)
    wbuf,  # VMEM (8, CI)
    dma_sem,
    w_sem,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    pixx = (orgx_ref[t] + lane % TILE).astype(jnp.float32)
    pixy = (orgy_ref[t] + lane // TILE).astype(jnp.float32)

    state[:] = jnp.zeros((24, L), jnp.float32)
    state[O_T, :] = jnp.ones((L,), jnp.float32)
    wbuf[:] = jnp.zeros((2, 8, CI), jnp.float32)

    n_chunks = pl.cdiv(count, CI)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CI, 1), 0)

    def feat_dma(ci, slot):
        base = pl.multiple_of(start + ci * CI, CI)
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(base, CI)], fbuf.at[slot], dma_sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prefetch_first():
        feat_dma(0, 0).start()

    def store_wmax(ci, base, wmax_ci):
        # Mosaic requires full-tile (8,128) slab stores into tiled HBM refs,
        # so wmax rides in row 0 of an [8, CI] slab (rows 1..7 zero).
        # Double-buffered: wait for the copy issued 2 chunks ago on this
        # slot before refilling it.
        slot = ci % 2
        base = pl.multiple_of(base, CI)
        copy = pltpu.make_async_copy(
            wbuf.at[slot], wmax_ref.at[:, pl.ds(base, CI)], w_sem.at[slot]
        )

        @pl.when(ci >= 2)
        def _wait_prev():
            copy.wait()  # same slot, same sem: retires the ci-2 copy

        wbuf[slot, 0, :] = wmax_ci
        copy.start()

    def chunk_body(carry):
        ci, _ = carry
        slot = ci % 2
        base = pl.multiple_of(start + ci * CI, CI)
        feat_dma(ci, slot).wait()

        @pl.when(ci + 1 < n_chunks)
        def _prefetch_next():
            feat_dma(ci + 1, (ci + 1) % 2).start()

        def row(i):
            return fbuf[slot, i, :].reshape(CI, 1)  # [CI,1] broadcast over lanes

        tw0, tw1, tw2 = row(F_TW), row(F_TW + 1), row(F_TW + 2)
        tu0, tu1, tu2 = row(F_TU), row(F_TU + 1), row(F_TU + 2)
        tv0, tv1, tv2 = row(F_TV), row(F_TV + 1), row(F_TV + 2)

        # Ray-splat intersection (2DGS Eqs. 8-10; forward.cu:363-394)
        k0 = pixx * tw0 - tu0
        k1 = pixx * tw1 - tu1
        k2 = pixx * tw2 - tu2
        l0 = pixy * tw0 - tv0
        l1 = pixy * tw1 - tv1
        l2 = pixy * tw2 - tv2
        p0 = k1 * l2 - k2 * l1
        p1 = k2 * l0 - k0 * l2
        p2 = k0 * l1 - k1 * l0
        unstable = jnp.abs(p2) < 1e-4
        inv_p2 = 1.0 / jnp.where(unstable, 1.0, p2)
        sx = jnp.where(unstable, 0.0, p0 * inv_p2)
        sy = jnp.where(unstable, 0.0, p1 * inv_p2)
        rho3d = jnp.where(unstable, 1e8, sx * sx + sy * sy)
        dxm = row(F_XY) - pixx
        dym = row(F_XY + 1) - pixy
        rho2d = FILTER_INV_SQUARE * (dxm * dxm + dym * dym)
        rho = jnp.minimum(rho3d, rho2d)
        depth = sx * tw0 + sy * tw1 + tw2

        alpha = jnp.minimum(ALPHA_MAX, row(F_OPA) * jnp.exp(-0.5 * rho))
        idx = base + row_i
        valid = idx < start + count
        done = state[S_DONE, :].reshape(1, L) > 0.5
        accept = (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & valid & ~done
        a_eff = jnp.where(accept, alpha, 0.0)

        prefix_in = jnp.concatenate(
            [jnp.ones((1, L), jnp.float32), (1.0 - a_eff)[:-1]], axis=0
        )
        prefix = _incl_cumprod_rows(prefix_in)  # exclusive cumprod
        T_carry = state[O_T, :].reshape(1, L)
        T_before = T_carry * prefix
        trigger = accept & (T_before * (1.0 - alpha) < T_EPS)
        trig_f = trigger.astype(jnp.float32)
        term_excl = (_incl_cumsum_rows(trig_f) - trig_f) > 0.0
        contrib = accept & ~term_excl & ~trigger
        w = jnp.where(contrib, alpha * T_before, 0.0)

        a_con = jnp.where(contrib, alpha, 0.0)
        T_new = T_carry * jnp.exp(
            jnp.sum(jnp.log1p(-a_con), axis=0, keepdims=True)
        )
        done_new = done | (jnp.sum(trig_f, axis=0, keepdims=True) > 0.0)

        state[O_COL, :] += jnp.sum(w * row(F_COL), axis=0)
        state[O_COL + 1, :] += jnp.sum(w * row(F_COL + 1), axis=0)
        state[O_COL + 2, :] += jnp.sum(w * row(F_COL + 2), axis=0)
        state[O_NRM, :] += jnp.sum(w * row(F_NRM), axis=0)
        state[O_NRM + 1, :] += jnp.sum(w * row(F_NRM + 1), axis=0)
        state[O_NRM + 2, :] += jnp.sum(w * row(F_NRM + 2), axis=0)
        state[O_DEPTH, :] += jnp.sum(w * depth, axis=0)
        state[O_REFL, :] += jnp.sum(w * row(F_REFL), axis=0)

        # depth distortion (2DGS appendix; forward.cu:419-427)
        safe_depth = jnp.maximum(depth, NEAR_N)
        m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / safe_depth)
        mw = m * w
        m2w = m * m * w
        A = 1.0 - T_before
        M1c = state[O_M1, :].reshape(1, L) + (_incl_cumsum_rows(mw) - mw)
        M2c = state[O_M2, :].reshape(1, L) + (_incl_cumsum_rows(m2w) - m2w)
        state[O_DIST, :] += jnp.sum(
            (m * m * A + M2c - 2.0 * m * M1c) * w, axis=0
        )
        state[O_M1, :] += jnp.sum(mw, axis=0)
        state[O_M2, :] += jnp.sum(m2w, axis=0)

        rank = (idx - start + 1).astype(jnp.float32)  # 1-based
        med_cond = contrib & (T_before > 0.5)
        med_rank = jnp.max(jnp.where(med_cond, rank, 0.0), axis=0, keepdims=True)
        has_med = med_rank > 0.0
        sel = med_cond & (rank == med_rank)
        med_depth_new = jnp.sum(jnp.where(sel, depth, 0.0), axis=0, keepdims=True)
        state[O_MED, :] = jnp.where(
            has_med, med_depth_new, state[O_MED, :].reshape(1, L)
        ).reshape(L)
        state[O_MEDRANK, :] = jnp.where(
            has_med, med_rank, state[O_MEDRANK, :].reshape(1, L)
        ).reshape(L)
        state[O_NCON, :] = jnp.maximum(
            state[O_NCON, :], jnp.max(jnp.where(contrib, rank, 0.0), axis=0)
        )
        state[O_SCOPE, :] = jnp.maximum(
            state[O_SCOPE, :],
            jnp.max(jnp.where(contrib, row(F_SCOPE), 0.0), axis=0),
        )

        state[O_T, :] = T_new.reshape(L)
        state[S_DONE, :] = done_new.astype(jnp.float32).reshape(L)

        store_wmax(ci, base, jnp.max(jnp.where(valid, w, 0.0), axis=1))

        all_done = jnp.min(done_new.astype(jnp.float32)) > 0.5
        return ci + 1, all_done

    def cond(carry):
        ci, all_done = carry
        return (ci < n_chunks) & ~all_done

    ci_f, _done_f = jax.lax.while_loop(
        cond, chunk_body, (jnp.int32(0), jnp.bool_(False))
    )
    # (skipped chunks need no zero-fill: wmax is aliased to a zeros input)

    # retire outstanding copies so the next grid program's semaphores are
    # clean: the early-exit path leaves the ci_f feature prefetch in flight,
    # and the last <=2 wmax stores are always in flight.
    @pl.when(ci_f < n_chunks)
    def _drain_feat():
        feat_dma(ci_f, ci_f % 2).wait()

    def _wdrain(ci):
        return pltpu.make_async_copy(
            wbuf.at[ci % 2],
            wmax_ref.at[:, pl.ds(pl.multiple_of(start, CI), CI)],
            w_sem.at[ci % 2],
        ).wait()

    @pl.when(ci_f >= 1)
    def _drain_w1():
        _wdrain(ci_f - 1)

    @pl.when(ci_f >= 2)
    def _drain_w2():
        _wdrain(ci_f - 2)

    out_px_ref[0, :, :] = state[0:16, :]


def tile_blend_forward(
    feats: jnp.ndarray,  # [F_PAD, N_cap] feature-major instance attributes
    starts: jnp.ndarray,  # [T] i32 CI-aligned exclusive range starts
    counts: jnp.ndarray,  # [T] i32
    org_x: jnp.ndarray,  # [T] i32
    org_y: jnp.ndarray,  # [T] i32
    interpret: bool | None = None,
):
    """-> (out_px [T, 16, 256], wmax [N_cap])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    T = starts.shape[0]
    n_cap = feats.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, L), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, L), jnp.float32),
            pltpu.VMEM((2, F_PAD, CI), jnp.float32),
            pltpu.VMEM((2, 8, CI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # wmax is aliased to a zero input: under tile sharding each shard only
    # writes its own ranges, so unwritten slots must be 0, not garbage
    wmax_init = jnp.zeros((8, n_cap), jnp.float32)
    out_px, wmax = pl.pallas_call(
        _tile_blend_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 16, L), jnp.float32),
            jax.ShapeDtypeStruct((8, n_cap), jnp.float32),
        ],
        input_output_aliases={5: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, org_x, org_y, feats, wmax_init)
    return out_px, wmax[0]


from tpu_splat.core.segops import segment_sum_sorted, segment_max_sorted  # noqa: E402 (re-export for blend.py)


@jax.custom_vjp
def _expand_rows(g24, gid, valid, rank_perm, rank_of, seg_start, seg_end):
    return jnp.where(valid[:, None], g24[gid], 0.0)  # [N_cap, F]


def _expand_rows_fwd(g24, gid, valid, rank_perm, rank_of, seg_start, seg_end):
    out = _expand_rows(g24, gid, valid, rank_perm, rank_of, seg_start, seg_end)
    return out, (valid, rank_perm, rank_of, seg_start, seg_end)


def _expand_rows_bwd(res, d_out):
    # Gather transpose without scatter-add: rank_perm (precomputed in the
    # binning, cotangent-independent, trimmed to the instance capacity)
    # regroups grad rows per Gaussian with ONE row gather; segment bounds
    # are analytic (emission-order runs), and the per-Gaussian sums run in
    # the Pallas segment kernel (one pass, MXU membership matmul) instead
    # of XLA cumsums. Rows at invalid slots are exactly zero (the bwd
    # kernel masks by contribution and d_feats is zero-aliased) and land
    # past every segment, so no masking is needed.
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges

    valid, rank_perm, rank_of, seg_start, seg_end = res
    rows_T = d_out[rank_perm].T  # [F, cap] grouped by rank
    d_g24 = segment_sum_ranges(rows_T, seg_start, seg_end).T[rank_of]
    return d_g24, None, None, None, None, None, None


_expand_rows.defvjp(_expand_rows_fwd, _expand_rows_bwd)


def pack_features(
    sorted_gid: jnp.ndarray,  # [N_cap] (pad slots may hold any id; mask below)
    valid: jnp.ndarray,  # [N_cap] bool
    hom: jnp.ndarray,  # [P,3,3]
    xy: jnp.ndarray,
    opacity: jnp.ndarray,
    normal_view: jnp.ndarray,
    color: jnp.ndarray,
    refl: jnp.ndarray,
    scope_mask: jnp.ndarray,
    rank_perm: jnp.ndarray | None = None,
    rank_of: jnp.ndarray | None = None,
    seg_start: jnp.ndarray | None = None,
    seg_end: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gather per-Gaussian attrs into the kernel's [F_PAD, N_cap] layout.

    ONE row-gather: attributes are first packed per-Gaussian into a [P, 24]
    matrix (cheap, P rows), then gathered by sorted instance id as contiguous
    96-byte rows — orders of magnitude friendlier to the TPU than 24 separate
    element-gathers. Validity masks every row so pad slots (and the backward
    kernel's never-written d_feats tail) cannot leak gradients.

    When the binning's rank grouping (rank_perm/rank_of/seg_*) is given,
    the gather's transpose is a row gather + analytic-run segment sum
    instead of XLA's scatter-add."""
    P_ = opacity.shape[0]
    g24 = jnp.concatenate(
        [
            hom.reshape(P_, 9),
            xy,
            opacity[:, None],
            color,
            normal_view,
            refl[:, None],
            scope_mask.astype(jnp.float32)[:, None],
            jnp.zeros((P_, F_PAD - 20), jnp.float32),
        ],
        axis=1,
    )  # [P, F_PAD]
    if rank_perm is not None:
        feats = _expand_rows(
            g24, sorted_gid, valid, rank_perm, rank_of, seg_start, seg_end
        )
    else:
        feats = jnp.where(valid[:, None], g24[sorted_gid], 0.0)  # [N_cap, F]
    return feats.T


# ---------------------------------------------------------------------------
# Backward kernel: back-to-front sweep with transmittance reconstruction.
#
# Hand-derived reverse of the forward above (the TPU counterpart of
# backward.cu renderCUDA:143-470). Per pixel, for contributing instance i:
#   dL/dalpha_i = T_i * what_i - B_i / (1 - alpha_i)
#   B_i = sum_{j>i} (what_j w_j - dist^ w_j m_j^2 T_j) + T^ * T_final
#   what_i = c^.c_i + n^.n_i + d^ d_i + r^ r_i + m1^ m_i + m2^ m_i^2
#            + dist^ * (m_i^2 A_i + M2_i - 2 m_i M1_i
#                       + m_i^2 W>_i - 2 m_i MW>_i)
# with A_i = 1 - T_i, prefix M1_i/M2_i reconstructed from the saved totals
# minus suffix sums, W>_i / MW>_i suffix sums, and T_i rebuilt by dividing
# T out backward (T_i = T_rev * prod_{j>=i}(1-alpha_j)^-1, log-space).
# Contribution masks are rebuilt from the saved per-pixel n_contrib rank —
# no termination state needs to be stored (reference saves the same,
# rasterizer_impl.cu / backward.cu:198-204).


def _suffix_incl_sum_rows(x):
    """Suffix-inclusive cumsum along axis 0: out_i = sum_{j>=i} x_j."""
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < CI:
        shifted = jnp.concatenate([x[shift:], zeros[:shift]], axis=0)
        x = x + shifted
        shift *= 2
    return x


def _tile_blend_bwd_kernel(
    starts_ref,
    counts_ref,
    orgx_ref,
    orgy_ref,
    feats_ref,  # [F_PAD, N_cap] ANY
    fwd_px_ref,  # block (1, 16, L): forward outputs
    ct_px_ref,  # block (1, 16, L): cotangents of forward outputs
    dfeats_init_ref,  # [F_PAD, N_cap] ANY zeros (aliased to output)
    dfeats_ref,  # [F_PAD, N_cap] ANY output (aliased, zero where unwritten)
    state,  # VMEM (16, L) reverse carries
    fbuf,  # VMEM (F_PAD, CI)
    gbuf,  # VMEM (F_PAD, CI) grad slab
    dma_sem,
    g_sem,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    pixx = (orgx_ref[t] + lane % TILE).astype(jnp.float32)
    pixy = (orgy_ref[t] + lane // TILE).astype(jnp.float32)

    def fw(i):
        return fwd_px_ref[0, i, :].reshape(1, L)

    def ct(i):
        return ct_px_ref[0, i, :].reshape(1, L)

    T_final = fw(O_T)
    ncon = fw(O_NCON)
    M1tot = fw(O_M1)
    M2tot = fw(O_M2)
    med_rank_px = fw(O_MEDRANK)

    ct_c0, ct_c1, ct_c2 = ct(O_COL), ct(O_COL + 1), ct(O_COL + 2)
    ct_T = ct(O_T)
    ct_d = ct(O_DEPTH)
    ct_r = ct(O_REFL)
    ct_dist = ct(O_DIST)
    ct_n0, ct_n1, ct_n2 = ct(O_NRM), ct(O_NRM + 1), ct(O_NRM + 2)
    ct_med = ct(O_MED)
    ct_m1 = ct(O_M1)
    ct_m2 = ct(O_M2)

    # reverse carries rows: 0 T_rev, 1 B, 2 Wsuf, 3 MWsuf, 4 M2Wsuf
    state[:] = jnp.zeros((16, L), jnp.float32)
    state[0, :] = T_final.reshape(L)
    state[1, :] = (ct_T * T_final).reshape(L)

    # last chunk index containing any contributor
    max_ncon = jnp.max(fwd_px_ref[0, O_NCON, :])
    n_chunks = pl.cdiv(count, CI)
    used_chunks = jnp.minimum(
        pl.cdiv(max_ncon.astype(jnp.int32), CI), n_chunks
    )

    row_i = jax.lax.broadcasted_iota(jnp.int32, (CI, 1), 0)

    def feat_dma(ci_rev, slot):
        ci = used_chunks - 1 - ci_rev
        base = pl.multiple_of(start + ci * CI, CI)
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(base, CI)], fbuf.at[slot], dma_sem.at[slot]
        )

    @pl.when(used_chunks > 0)
    def _prefetch_first():
        feat_dma(0, 0).start()

    def grad_copy(ci_rev, base):
        base = pl.multiple_of(base, CI)
        slot = ci_rev % 2
        return pltpu.make_async_copy(
            gbuf.at[slot], dfeats_ref.at[:, pl.ds(base, CI)], g_sem.at[slot]
        )

    def chunk_body(ci_rev, _):
        ci = used_chunks - 1 - ci_rev
        slot = ci_rev % 2
        base = pl.multiple_of(start + ci * CI, CI)
        feat_dma(ci_rev, slot).wait()

        @pl.when(ci_rev + 1 < used_chunks)
        def _prefetch_next():
            feat_dma(ci_rev + 1, (ci_rev + 1) % 2).start()

        # retire the grad write-back issued 2 chunks ago on this slot
        # before the tail of this body refills gbuf[slot]
        @pl.when(ci_rev >= 2)
        def _wait_gprev():
            grad_copy(ci_rev, base).wait()

        def row(i):
            return fbuf[slot, i, :].reshape(CI, 1)

        tw0, tw1, tw2 = row(F_TW), row(F_TW + 1), row(F_TW + 2)
        tu0, tu1, tu2 = row(F_TU), row(F_TU + 1), row(F_TU + 2)
        tv0, tv1, tv2 = row(F_TV), row(F_TV + 1), row(F_TV + 2)

        k0 = pixx * tw0 - tu0
        k1 = pixx * tw1 - tu1
        k2 = pixx * tw2 - tu2
        l0 = pixy * tw0 - tv0
        l1 = pixy * tw1 - tv1
        l2 = pixy * tw2 - tv2
        p0 = k1 * l2 - k2 * l1
        p1 = k2 * l0 - k0 * l2
        p2 = k0 * l1 - k1 * l0
        unstable = jnp.abs(p2) < 1e-4
        inv_p2 = 1.0 / jnp.where(unstable, 1.0, p2)
        sx = jnp.where(unstable, 0.0, p0 * inv_p2)
        sy = jnp.where(unstable, 0.0, p1 * inv_p2)
        rho3d = jnp.where(unstable, 1e8, sx * sx + sy * sy)
        dxm = row(F_XY) - pixx
        dym = row(F_XY + 1) - pixy
        rho2d = FILTER_INV_SQUARE * (dxm * dxm + dym * dym)
        rho = jnp.minimum(rho3d, rho2d)
        depth = sx * tw0 + sy * tw1 + tw2

        oG = row(F_OPA) * jnp.exp(-0.5 * rho)
        alpha = jnp.minimum(ALPHA_MAX, oG)
        idx = base + row_i
        rank = (idx - start + 1).astype(jnp.float32)
        accept_local = (
            (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & (idx < start + count)
        )
        contrib = accept_local & (rank <= ncon)

        # reconstruct T_i (transmittance before instance i)
        lf = jnp.where(contrib, -jnp.log1p(-alpha), 0.0)
        suf_lf = _suffix_incl_sum_rows(lf)  # sum_{j>=i}
        T_rev = state[0, :].reshape(1, L)
        T_i = T_rev * jnp.exp(suf_lf)
        w = jnp.where(contrib, alpha * T_i, 0.0)

        safe_depth = jnp.maximum(depth, NEAR_N)
        m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / safe_depth)
        mw = m * w
        m2w = m * m * w

        # suffix sums (within chunk) + carries from later chunks
        Wsuf = state[2, :].reshape(1, L)
        MWsuf = state[3, :].reshape(1, L)
        M2Wsuf = state[4, :].reshape(1, L)
        W_gt = Wsuf + (_suffix_incl_sum_rows(w) - w)  # sum_{j>i}
        MW_gt = MWsuf + (_suffix_incl_sum_rows(mw) - mw)
        M2W_gt = M2Wsuf + (_suffix_incl_sum_rows(m2w) - m2w)
        M1_i = M1tot - MW_gt - mw  # prefix sum_{j<i} m w
        M2_i = M2tot - M2W_gt - m2w
        A_i = 1.0 - T_i

        c0, c1, c2 = row(F_COL), row(F_COL + 1), row(F_COL + 2)
        n0, n1, n2 = row(F_NRM), row(F_NRM + 1), row(F_NRM + 2)
        r_ = row(F_REFL)

        phi = (
            m * m * A_i
            + M2_i
            - 2.0 * m * M1_i
            + m * m * W_gt
            - 2.0 * m * MW_gt
        )
        what = (
            ct_c0 * c0 + ct_c1 * c1 + ct_c2 * c2
            + ct_n0 * n0 + ct_n1 * n1 + ct_n2 * n2
            + ct_d * depth
            + ct_r * r_
            + ct_m1 * m
            + ct_m2 * m * m
            + ct_dist * phi
        )

        # per-instance content grads (sum over pixels)
        d_c0 = jnp.sum(w * ct_c0, axis=1)
        d_c1 = jnp.sum(w * ct_c1, axis=1)
        d_c2 = jnp.sum(w * ct_c2, axis=1)
        d_n0 = jnp.sum(w * ct_n0, axis=1)
        d_n1 = jnp.sum(w * ct_n1, axis=1)
        d_n2 = jnp.sum(w * ct_n2, axis=1)
        d_r = jnp.sum(w * ct_r, axis=1)

        # depth gradient: direct + via m + median routing
        d_m_tot = (
            ct_m1 * w
            + 2.0 * m * ct_m2 * w
            + ct_dist * 2.0 * w * (m * A_i - M1_i + m * W_gt - MW_gt)
        )
        dm_dd = FAR_N / (FAR_N - NEAR_N) * NEAR_N / (safe_depth * safe_depth)
        dm_dd = jnp.where(depth >= NEAR_N, dm_dd, 0.0)
        is_med = contrib & (rank == med_rank_px)
        d_depth = (
            w * ct_d
            + d_m_tot * dm_dd
            + jnp.where(is_med, ct_med, 0.0)
        )

        # alpha gradient
        B_i = state[1, :].reshape(1, L) + (
            _suffix_incl_sum_rows(what * w - ct_dist * w * m * m * T_i)
            - (what * w - ct_dist * w * m * m * T_i)
        )
        d_alpha = jnp.where(
            contrib, T_i * what - B_i / (1.0 - alpha), 0.0
        )

        gate = (oG < ALPHA_MAX).astype(jnp.float32)
        d_oG = gate * d_alpha
        d_o = jnp.sum(jnp.exp(-0.5 * rho) * d_oG, axis=1)
        d_rho = -0.5 * oG * d_oG

        use3d = (rho3d <= rho2d) & ~unstable
        d_sx = jnp.where(use3d, 2.0 * sx * d_rho, 0.0)
        d_sy = jnp.where(use3d, 2.0 * sy * d_rho, 0.0)
        # depth = sx tw0 + sy tw1 + tw2 (s fixed at 0 when unstable)
        d_sx += jnp.where(unstable, 0.0, tw0 * d_depth)
        d_sy += jnp.where(unstable, 0.0, tw1 * d_depth)
        d_rho2d = jnp.where(use3d, 0.0, d_rho)
        d_xy0 = jnp.sum(2.0 * FILTER_INV_SQUARE * dxm * d_rho2d, axis=1)
        d_xy1 = jnp.sum(2.0 * FILTER_INV_SQUARE * dym * d_rho2d, axis=1)

        d_p0 = d_sx * inv_p2 * jnp.where(unstable, 0.0, 1.0)
        d_p1 = d_sy * inv_p2 * jnp.where(unstable, 0.0, 1.0)
        d_p2 = -(sx * d_sx + sy * d_sy) * inv_p2

        # p = k x l  =>  k^ = l x p^,  l^ = p^ x k
        d_k0 = l1 * d_p2 - l2 * d_p1
        d_k1 = l2 * d_p0 - l0 * d_p2
        d_k2 = l0 * d_p1 - l1 * d_p0
        d_l0 = d_p1 * k2 - d_p2 * k1
        d_l1 = d_p2 * k0 - d_p0 * k2
        d_l2 = d_p0 * k1 - d_p1 * k0

        d_tu0 = jnp.sum(-d_k0, axis=1)
        d_tu1 = jnp.sum(-d_k1, axis=1)
        d_tu2 = jnp.sum(-d_k2, axis=1)
        d_tv0 = jnp.sum(-d_l0, axis=1)
        d_tv1 = jnp.sum(-d_l1, axis=1)
        d_tv2 = jnp.sum(-d_l2, axis=1)
        d_tw0 = jnp.sum(pixx * d_k0 + pixy * d_l0 + sx * d_depth, axis=1)
        d_tw1 = jnp.sum(pixx * d_k1 + pixy * d_l1 + sy * d_depth, axis=1)
        d_tw2 = jnp.sum(pixx * d_k2 + pixy * d_l2 + d_depth, axis=1)

        gbuf[slot] = jnp.zeros((F_PAD, CI), jnp.float32)
        gbuf[slot, F_TU, :] = d_tu0
        gbuf[slot, F_TU + 1, :] = d_tu1
        gbuf[slot, F_TU + 2, :] = d_tu2
        gbuf[slot, F_TV, :] = d_tv0
        gbuf[slot, F_TV + 1, :] = d_tv1
        gbuf[slot, F_TV + 2, :] = d_tv2
        gbuf[slot, F_TW, :] = d_tw0
        gbuf[slot, F_TW + 1, :] = d_tw1
        gbuf[slot, F_TW + 2, :] = d_tw2
        gbuf[slot, F_XY, :] = d_xy0
        gbuf[slot, F_XY + 1, :] = d_xy1
        gbuf[slot, F_OPA, :] = d_o
        gbuf[slot, F_COL, :] = d_c0
        gbuf[slot, F_COL + 1, :] = d_c1
        gbuf[slot, F_COL + 2, :] = d_c2
        gbuf[slot, F_NRM, :] = d_n0
        gbuf[slot, F_NRM + 1, :] = d_n1
        gbuf[slot, F_NRM + 2, :] = d_n2
        gbuf[slot, F_REFL, :] = d_r
        grad_copy(ci_rev, base).start()

        # update reverse carries for the next (earlier) chunk
        state[0, :] = (T_rev * jnp.exp(jnp.sum(lf, axis=0, keepdims=True))).reshape(L)
        state[1, :] = (
            state[1, :].reshape(1, L)
            + jnp.sum(what * w - ct_dist * w * m * m * T_i, axis=0, keepdims=True)
        ).reshape(L)
        state[2, :] = (Wsuf + jnp.sum(w, axis=0, keepdims=True)).reshape(L)
        state[3, :] = (MWsuf + jnp.sum(mw, axis=0, keepdims=True)).reshape(L)
        state[4, :] = (M2Wsuf + jnp.sum(m2w, axis=0, keepdims=True)).reshape(L)
        return _

    jax.lax.fori_loop(0, used_chunks, chunk_body, None)
    # (non-contributing chunks need no zero-fill: d_feats is aliased to zeros)

    # retire the last (up to 2) outstanding grad write-backs; waits only
    # need sem + byte-count, so any CI-slab descriptor on the slot works
    @pl.when(used_chunks >= 1)
    def _drain_g1():
        grad_copy(used_chunks - 1, start).wait()

    @pl.when(used_chunks >= 2)
    def _drain_g2():
        grad_copy(used_chunks - 2, start).wait()


def tile_blend_backward(
    feats: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    org_x: jnp.ndarray,
    org_y: jnp.ndarray,
    fwd_px: jnp.ndarray,  # [T, 16, L]
    ct_px: jnp.ndarray,  # [T, 16, L]
    interpret: bool | None = None,
) -> jnp.ndarray:
    """-> d_feats [F_PAD, N_cap]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    T = starts.shape[0]
    n_cap = feats.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 16, L), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 16, L), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((16, L), jnp.float32),
            pltpu.VMEM((2, F_PAD, CI), jnp.float32),
            pltpu.VMEM((2, F_PAD, CI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dfeats_init = jnp.zeros((F_PAD, n_cap), jnp.float32)
    (d_feats,) = pl.pallas_call(
        _tile_blend_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F_PAD, n_cap), jnp.float32)],
        input_output_aliases={7: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, org_x, org_y, feats, fwd_px, ct_px, dfeats_init)
    return d_feats


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + Pallas backward via custom_vjp.


@jax.custom_vjp
def blend_kernel(feats, starts, counts, org_x, org_y):
    out_px, wmax = tile_blend_forward(feats, starts, counts, org_x, org_y)
    return out_px, jax.lax.stop_gradient(wmax)


def _blend_kernel_fwd(feats, starts, counts, org_x, org_y):
    out_px, wmax = tile_blend_forward(feats, starts, counts, org_x, org_y)
    return (out_px, jax.lax.stop_gradient(wmax)), (
        feats,
        starts,
        counts,
        org_x,
        org_y,
        out_px,
    )


def _blend_kernel_bwd(res, cts):
    feats, starts, counts, org_x, org_y, out_px = res
    d_out_px, _d_wmax = cts
    d_feats = tile_blend_backward(
        feats, starts, counts, org_x, org_y, out_px, d_out_px
    )
    return d_feats, None, None, None, None


blend_kernel.defvjp(_blend_kernel_fwd, _blend_kernel_bwd)
