"""Pallas TPU kernels: per-tile alpha-compositing sweep, MXU formulation.

Speed-of-light replacement for the XLA scan in tpu_splat.raster.blend
(itself the TPU analogue of renderCUDA, forward.cu:258-489). Design:

- The ray-splat intersection is algebraically linear in the pixel: with
  k = x*Tw - Tu and l = y*Tw - Tv, the homogeneous intersection
  p = k x l = x*(Tv x Tw) + y*(Tw x Tu) + (Tu x Tv) — the quadratic term
  cancels. So each instance carries PRECOMPUTED COEFFICIENTS (computed once
  per Gaussian in pack_features, differentiably, then gathered per
  instance), and the kernel evaluates p0/p1/p2, the depth numerator
  p.Tw, and the low-pass screen ellipse as small [3, CI] x [3, 256]
  MATMULS over the tile's pixel basis (x, y, 1) — MXU work in the data's
  native [features, instances] layout, replacing ~20 lane->sublane
  relayout broadcasts per chunk in the elementwise formulation.
- Opacity rides in log space: alpha = exp(min(log .99, max(s3, s2))) with
  s3 = log(opa) - rho3d/2 and s2 = log(opa) - rho2d/2 (the rho2d polynomial
  and log-opacity folded into the same matmul coefficients).
- The sequential "over" operator and the depth-distortion prefix sums run
  as triangular one-hot matmuls: exclusive cumsum = Lstrict @ v on the MXU
  (log-space for the transmittance product), replacing log2(CI)-step
  Hillis-Steele shifts.
- Per-pixel weighted accumulation of color/normal/refl/scope is ONE
  [8, CI] @ [CI, 256] matmul per chunk (features stationary, blend weights
  moving); per-instance gradients in the backward are the transposed
  matmuls [k, 256] x [CI, 256] -> [k, CI], landing directly in the
  feature-major gradient slab layout.
- Instance attributes are pre-gathered ONCE in depth-sorted instance order
  into a feature-major [F=24, N_cap] array; each tile's range is padded to
  a 128-instance boundary, ranges mutually exclusive, so every DMA is
  aligned and per-instance outputs never cross tiles.
- grid = (num_tiles,): per-tile (start, count) via scalar prefetch; the
  chunk loop is a while_loop with the REAL trip count and terminates early
  once every pixel saturates (T < 1e-4), like the CUDA block vote
  (forward.cu:338-340). Double-buffered DMA hides the feature loads.

The backward kernel re-walks each tile back-to-front, reconstructing
transmittance by dividing alphas back out in log space (the TPU analogue of
backward.cu:143-470), with suffix sums as reversed triangular matmuls and a
hand-derived gradient chain into the coefficient space; pack_features'
autodiff VJP carries coefficients back to transMat/xy/opacity per Gaussian.
"""
from __future__ import annotations

import math

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

# feature rows in the packed [F, N] instance array (coefficient space).
# The kernel evaluates every pixel-linear form on a TILE-RECENTERED basis
# (x' = x - cx with cx the tile center, |x'| <= 8): the constant
# coefficients are re-derived in-kernel from the linear ones per tile,
# which keeps f32 cancellation at the oracle's per-pixel conditioning
# instead of O(image width) magnitudes.
F_CP0 = 0  # 0:3   p0 = a x + b y + c   (a, b, c at x=0 origin)
F_CP1 = 3  # 3:6
F_CP2 = 6  # 6:9
F_CDN = 9  # 9:12  depth numerator p . Tw
F_AX2 = 12  # FI * xy.x   (low-pass screen ellipse center)
F_AY2 = 13  # FI * xy.y
F_LO = 14  # log(opa)
F_TW2 = 15  # Tw.z (depth when the intersection is unstable)
F_CON = 16  # 16:24 content: color 3, normal 3, refl, scope
F_PAD = 24

LOG_AMAX = math.log(ALPHA_MAX)

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
O_MEDRANK = 15  # median contributor rank (1-based, 0 = none)
S_DONE = 16  # scratch-only row: termination flag

CI = 128  # instances per chunk; lane-tile (128) aligned DMA slabs
L = TILE_PIX

_HP = jax.lax.Precision.HIGHEST


def _dot_k(rows, rhs):
    """[k, CI] coefficient rows x [k, L] basis -> [CI, L] (contract dim 0)."""
    return jax.lax.dot_general(
        rows, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP,
    )


def _dot_mm(a, b):
    """[M, K] @ [K, N] standard matmul in f32."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP,
    )


def _dot_px(rows, mat):
    """[k, L] x [CI, L] -> [k, CI] (contract the pixel axis)."""
    return jax.lax.dot_general(
        rows, mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP,
    )


USE_SCAN_DOTS = False  # A/B: triangular-matmul scans vs Hillis-Steele shifts


def _incl_cumsum_rows(x):
    """Inclusive cumsum along axis 0 (instances), Hillis-Steele shifts."""
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < CI:
        shifted = jnp.concatenate([zeros[:shift], x[:-shift]], axis=0)
        x = x + shifted
        shift *= 2
    return x


def _suffix_incl_sum_rows(x):
    """Suffix-inclusive cumsum along axis 0: out_i = sum_{j>=i} x_j."""
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < CI:
        shifted = jnp.concatenate([x[shift:], zeros[:shift]], axis=0)
        x = x + shifted
        shift *= 2
    return x


def _dot_scan(tri, x, precision):
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _excl_cumsum(x, ltri, precision=jax.lax.Precision.HIGH):
    if USE_SCAN_DOTS:
        return _dot_scan(ltri, x, precision)
    return _incl_cumsum_rows(x) - x


def _suffix_incl(x, utri, precision=jax.lax.Precision.HIGH):
    if USE_SCAN_DOTS:
        return _dot_scan(utri, x, precision)
    return _suffix_incl_sum_rows(x)


def _ltri_strict():
    """[CI, CI] strict lower-triangular ones: Lstrict @ v = exclusive cumsum."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CI, CI), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CI, CI), 1)
    return (j < i).astype(jnp.float32)


def _utri_incl():
    """[CI, CI] upper-triangular-inclusive ones: U @ v = inclusive suffix sum."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CI, CI), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CI, CI), 1)
    return (j >= i).astype(jnp.float32)


def _chunk_geometry(fb, pixx, pixy, qv, cx, cy):
    """Shared forward geometry on the tile-recentered basis.

    fb: [F_PAD, CI] feature slab value. ONE [F, CI] -> [CI, F] transpose
    puts every coefficient in [CI, 1] broadcast position; the linear forms
    are then plain FMAs against the [1, L] pixel rows (cheaper on this
    hardware than small-K MXU dots, which pad K). Returns [CI, L] arrays."""
    fi = FILTER_INV_SQUARE
    ft = jnp.transpose(fb)  # [CI, F_PAD]

    def col(k):
        return ft[:, k:k + 1]  # [CI, 1]

    def linform(g):
        a, b, c = col(g), col(g + 1), col(g + 2)
        return a * pixx + b * pixy + (c + cx * a + cy * b)

    p0 = linform(F_CP0)
    p1 = linform(F_CP1)
    p2 = linform(F_CP2)
    dn = linform(F_CDN)
    ax2p = col(F_AX2) - fi * cx  # FI * (xy.x - cx)
    ay2p = col(F_AY2) - fi * cy
    lo_c = col(F_LO)
    c2p = -(ax2p * ax2p + ay2p * ay2p) * (0.5 / fi) + lo_c
    s2 = ax2p * pixx + ay2p * pixy + c2p + qv

    unstable = jnp.abs(p2) < 1e-4
    ivp = 1.0 / jnp.where(unstable, 1.0, p2)
    r3h = 0.5 * (p0 * p0 + p1 * p1) * (ivp * ivp)  # rho3d / 2
    s3 = jnp.where(unstable, -1e8, lo_c - r3h)
    s = jnp.maximum(s3, s2)
    a_log = jnp.minimum(LOG_AMAX, s)
    alpha = jnp.exp(a_log)
    depth = jnp.where(unstable, col(F_TW2) * jnp.ones_like(p2), dn * ivp)
    return dict(
        p0=p0, p1=p1, p2=p2, dn=dn, s2=s2, s3=s3, s=s, unstable=unstable,
        ivp=ivp, r3h=r3h, alpha=alpha, depth=depth, ax2p=ax2p, ay2p=ay2p,
        ft=ft,
    )


def _m_of_depth(depth):
    safe_depth = jnp.maximum(depth, NEAR_N)
    m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / safe_depth)
    return m, safe_depth


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
    fbuf,  # VMEM (2, F_PAD, CI)
    wbuf,  # VMEM (2, 8, CI)
    dma_sem,
    w_sem,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    # tile-recentered pixel basis: x' = x - (orgx + 7), |x'| <= 8 (exact ints)
    cx = orgx_ref[t] + 7
    cy = orgy_ref[t] + 7
    pixx = (lane % TILE - 7).astype(jnp.float32)
    pixy = (lane // TILE - 7).astype(jnp.float32)
    cxf = jnp.float32(cx)
    cyf = jnp.float32(cy)
    qv = -0.5 * FILTER_INV_SQUARE * (pixx * pixx + pixy * pixy)  # [1, L]
    ltri = _ltri_strict()

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

        fb = fbuf[slot]
        g = _chunk_geometry(fb, pixx, pixy, qv, cxf, cyf)
        alpha, depth = g["alpha"], g["depth"]

        idx = base + row_i
        valid = idx < start + count
        done = state[S_DONE, :].reshape(1, L) > 0.5
        accept = (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & valid & ~done
        a_eff = jnp.where(accept, alpha, 0.0)

        # exclusive prefix product of (1 - a) as a log-space triangular matmul
        u = jnp.log1p(-a_eff)
        prefix = jnp.exp(_excl_cumsum(u, ltri))
        T_carry = state[O_T, :].reshape(1, L)
        T_before = T_carry * prefix
        trigger = accept & (T_before * (1.0 - alpha) < T_EPS)
        trig_f = trigger.astype(jnp.float32)
        term_excl = _excl_cumsum(trig_f, ltri, jax.lax.Precision.DEFAULT) > 0.0
        contrib = accept & ~term_excl & ~trigger
        w = jnp.where(contrib, alpha * T_before, 0.0)

        u_con = jnp.where(contrib, u, 0.0)
        T_new = T_carry * jnp.exp(jnp.sum(u_con, axis=0, keepdims=True))
        done_new = done | (jnp.sum(trig_f, axis=0, keepdims=True) > 0.0)

        # content accumulation: ONE [8, CI] @ [CI, L] matmul
        cw = _dot_mm(fb[F_CON:F_CON + 8], w)  # [8, L]
        state[O_COL, :] += cw[0]
        state[O_COL + 1, :] += cw[1]
        state[O_COL + 2, :] += cw[2]
        state[O_NRM, :] += cw[3]
        state[O_NRM + 1, :] += cw[4]
        state[O_NRM + 2, :] += cw[5]
        state[O_REFL, :] += cw[6]
        state[O_SCOPE, :] += cw[7]  # thresholded > 0 after the sweep
        state[O_DEPTH, :] += jnp.sum(w * depth, axis=0)

        # depth distortion (2DGS appendix; forward.cu:419-427)
        m, _sd = _m_of_depth(depth)
        mw = m * w
        m2w = m * mw
        pre = _excl_cumsum(jnp.concatenate([mw, m2w], axis=1), ltri)  # [CI, 2L]
        A = 1.0 - T_before
        M1c = state[O_M1, :].reshape(1, L) + pre[:, :L]
        M2c = state[O_M2, :].reshape(1, L) + pre[:, L:]
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

    # scope mask: 1 iff any contributing in-scope instance (w > 0 for every
    # contributor, so the weighted sum is positive exactly then)
    state[O_SCOPE, :] = (state[O_SCOPE, :] > 0.0).astype(jnp.float32)
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
def _expand_rows(g24, gid, valid, emit_key, rank_of, seg_start, seg_end):
    return jnp.where(valid[:, None], g24[gid], 0.0)  # [N_cap, F]


def _expand_rows_fwd(g24, gid, valid, emit_key, rank_of, seg_start, seg_end):
    out = _expand_rows(g24, gid, valid, emit_key, rank_of, seg_start, seg_end)
    return out, (valid, emit_key, rank_of, seg_start, seg_end)


def _expand_rows_bwd(res, d_out):
    # Gather-free transpose: ONE variadic sort keyed on the binning's
    # emission-index payload regroups grad rows per Gaussian (emission
    # indices are gap-free below min(total, cap), so post-sort position ==
    # emission index and the analytic [seg_start, seg_end) runs apply).
    # Measured ~2x cheaper than the row-gather-by-permutation alternative
    # (a [4M, 24] f32 row gather runs at ~3 GB/s on v5e; lax.sort moves
    # ~2.3 ms per payload column — see profile_gather.py). The per-column
    # slices below are free: d_out's physical layout is feature-major (it
    # is the transposed cotangent of the [F, N] kernel output). Rows at
    # invalid slots are exactly zero (the bwd kernel masks by contribution
    # and d_feats is zero-aliased) and carry emit >= cap, sorting past
    # every segment.
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges

    valid, emit_key, rank_of, seg_start, seg_end = res
    F = d_out.shape[1]
    cols = tuple(d_out[:, i] for i in range(F))
    srt = jax.lax.sort((emit_key,) + cols, num_keys=1, is_stable=False)
    rows_T = jnp.stack(srt[1:], axis=0)  # [F, cap_al] emission-grouped
    d_g24 = segment_sum_ranges(rows_T, seg_start, seg_end).T[rank_of]
    return d_g24, None, None, None, None, None, None


_expand_rows.defvjp(_expand_rows_fwd, _expand_rows_bwd)


def gauss_coefficients(hom, xy, opacity):
    """Per-Gaussian pixel-linear coefficients for the MXU kernel.

    hom [P,3,3] (rows Tu, Tv, Tw of the splat->pixel homography,
    forward.cu compute_transmat), xy [P,2] screen center, opacity [P].
    Returns [P, 16]: 9 p-coeffs, 3 depth-numerator coeffs, 2 low-pass
    center coeffs, log-opacity, Tw.z (the constant terms of each linear
    form are re-derived per tile in-kernel on the recentered basis).
    Differentiable (plain jnp) — the kernel's coefficient-space gradients
    chain back through this in the pack VJP."""
    Tu, Tv, Tw = hom[:, 0, :], hom[:, 1, :], hom[:, 2, :]
    A = jnp.cross(Tv, Tw)  # p = x*A + y*B + C
    B = jnp.cross(Tw, Tu)
    C = jnp.cross(Tu, Tv)
    lo = jnp.log(jnp.maximum(opacity, 1e-12))
    fi = FILTER_INV_SQUARE
    cols = [
        A[:, 0], B[:, 0], C[:, 0],
        A[:, 1], B[:, 1], C[:, 1],
        A[:, 2], B[:, 2], C[:, 2],
        jnp.sum(A * Tw, axis=1), jnp.sum(B * Tw, axis=1), jnp.sum(C * Tw, axis=1),
        fi * xy[:, 0], fi * xy[:, 1],
        lo,
        Tw[:, 2],
    ]
    return jnp.stack(cols, axis=1)


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
    emit_key: jnp.ndarray | None = None,
    rank_of: jnp.ndarray | None = None,
    seg_start: jnp.ndarray | None = None,
    seg_end: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gather per-Gaussian attrs into the kernel's [F_PAD, N_cap] layout.

    ONE row-gather: attributes are converted to kernel coefficients per
    Gaussian (P rows, cheap) and packed into a [P, 32] matrix, then gathered
    by sorted instance id as contiguous 128-byte rows — orders of magnitude
    friendlier to the TPU than per-feature element gathers. Validity masks
    every row so pad slots (and the backward kernel's never-written d_feats
    tail) cannot leak gradients.

    When the binning's emission grouping (emit_key/rank_of/seg_*) is given,
    the gather's transpose is a sort-regroup + analytic-run segment sum
    instead of XLA's scatter-add."""
    P_ = opacity.shape[0]
    coeffs = gauss_coefficients(hom, xy, opacity)  # [P, 16]
    g32 = jnp.concatenate(
        [
            coeffs,
            color,
            normal_view,
            refl[:, None],
            scope_mask.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [P, F_PAD]
    if emit_key is not None:
        feats = _expand_rows(
            g32, sorted_gid, valid, emit_key, rank_of, seg_start, seg_end
        )
    else:
        feats = jnp.where(valid[:, None], g32[sorted_gid], 0.0)  # [N_cap, F]
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
# T out backward (log-space suffix matmul). Alpha gradients route to the
# log-opacity/rho coefficients (d_s) and split between the 3D intersection
# (s3) and low-pass (s2) branches exactly as the reference's
# rho3d <= rho2d test; content gradients are [7, L] x [CI, L] matmuls
# landing in feature-major rows. Contribution masks are rebuilt from the
# saved per-pixel n_contrib rank (reference saves the same,
# backward.cu:198-204).


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
    fbuf,  # VMEM (2, F_PAD, CI)
    gbuf,  # VMEM (2, F_PAD, CI) grad slab
    dma_sem,
    g_sem,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    cx = orgx_ref[t] + 7
    cy = orgy_ref[t] + 7
    pixx = (lane % TILE - 7).astype(jnp.float32)
    pixy = (lane // TILE - 7).astype(jnp.float32)
    cxf = jnp.float32(cx)
    cyf = jnp.float32(cy)
    ones1 = jnp.ones((1, L), jnp.float32)
    basis3 = jnp.concatenate([pixx, pixy, ones1], axis=0)
    qv = -0.5 * FILTER_INV_SQUARE * (pixx * pixx + pixy * pixy)
    utri = _utri_incl()

    def fw(i):
        return fwd_px_ref[0, i, :].reshape(1, L)

    def ct(i):
        return ct_px_ref[0, i, :].reshape(1, L)

    T_final = fw(O_T)
    ncon = fw(O_NCON)
    M1tot = fw(O_M1)
    M2tot = fw(O_M2)
    med_rank_px = fw(O_MEDRANK)

    ct_T = ct(O_T)
    ct_d = ct(O_DEPTH)
    ct_dist = ct(O_DIST)
    ct_med = ct(O_MED)
    ct_m1 = ct(O_M1)
    ct_m2 = ct(O_M2)
    # content cotangent rows (order matches F_CON..F_CON+6)
    ct7 = jnp.concatenate(
        [
            ct(O_COL), ct(O_COL + 1), ct(O_COL + 2),
            ct(O_NRM), ct(O_NRM + 1), ct(O_NRM + 2),
            ct(O_REFL),
        ],
        axis=0,
    )  # [7, L]

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

        fb = fbuf[slot]
        g = _chunk_geometry(fb, pixx, pixy, qv, cxf, cyf)
        alpha, depth = g["alpha"], g["depth"]
        unstable, ivp = g["unstable"], g["ivp"]
        p0, p1, p2, dn = g["p0"], g["p1"], g["p2"], g["dn"]
        r3h, s2, s3, s = g["r3h"], g["s2"], g["s3"], g["s"]
        # [CI, 1] slab columns -> [1, CI] rows for the gbuf writes below
        ax2p = jnp.transpose(g["ax2p"])
        ay2p = jnp.transpose(g["ay2p"])

        idx = base + row_i
        rank = (idx - start + 1).astype(jnp.float32)
        accept_local = (
            (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & (idx < start + count)
        )
        contrib = accept_local & (rank <= ncon)

        # reconstruct T_i (transmittance before instance i)
        lf = jnp.where(contrib, -jnp.log1p(-alpha), 0.0)
        suf_lf = _suffix_incl(lf, utri)  # inclusive suffix sum
        T_rev = state[0, :].reshape(1, L)
        T_i = T_rev * jnp.exp(suf_lf)
        w = jnp.where(contrib, alpha * T_i, 0.0)

        m, safe_depth = _m_of_depth(depth)
        mw = m * w
        m2w = m * mw

        # suffix sums (within chunk) + carries from later chunks
        Wsuf = state[2, :].reshape(1, L)
        MWsuf = state[3, :].reshape(1, L)
        M2Wsuf = state[4, :].reshape(1, L)
        suf = _suffix_incl(jnp.concatenate([w, mw, m2w], axis=1), utri)  # [CI, 3L]
        W_gt = Wsuf + (suf[:, :L] - w)  # sum_{j>i}
        MW_gt = MWsuf + (suf[:, L:2 * L] - mw)
        M2W_gt = M2Wsuf + (suf[:, 2 * L:] - m2w)
        M1_i = M1tot - MW_gt - mw  # prefix sum_{j<i} m w
        M2_i = M2tot - M2W_gt - m2w
        A_i = 1.0 - T_i

        # what = content terms + depth/distortion terms; content uses the
        # already-transposed slab ([CI,1] x [1,L] FMAs, no small-K dot)
        ft = g["ft"]
        what_content = ft[:, F_CON:F_CON + 1] * ct7[0:1]
        for r in range(1, 7):
            what_content += ft[:, F_CON + r:F_CON + r + 1] * ct7[r:r + 1]
        phi = (
            m * m * A_i
            + M2_i
            - 2.0 * m * M1_i
            + m * m * W_gt
            - 2.0 * m * MW_gt
        )
        what = (
            what_content
            + ct_d * depth
            + ct_m1 * m
            + ct_m2 * m * m
            + ct_dist * phi
        )

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
        bterm = what * w - ct_dist * w * m * m * T_i
        B_i = state[1, :].reshape(1, L) + (_suffix_incl(bterm, utri) - bterm)
        d_alpha = jnp.where(
            contrib, T_i * what - B_i / (1.0 - alpha), 0.0
        )

        # alpha = exp(min(log a_max, s)); route d_s to the s3/s2 branch
        gate = (s < LOG_AMAX).astype(jnp.float32)
        d_s = alpha * gate * d_alpha
        use3 = (s3 >= s2) & ~unstable  # reference rho3d <= rho2d branch
        d_s3 = jnp.where(use3, d_s, 0.0)
        d_s2 = jnp.where(use3, 0.0, d_s)

        # s3 = lo - 0.5 (p0^2 + p1^2) ivp^2
        d_p0 = -d_s3 * p0 * (ivp * ivp)
        d_p1 = -d_s3 * p1 * (ivp * ivp)
        d_p2 = d_s3 * 2.0 * r3h * ivp

        # depth = dn * ivp (stable) | tw2 (unstable)
        stable_f = (~unstable).astype(jnp.float32)
        d_dn = d_depth * ivp * stable_f
        d_p2 += -dn * (ivp * ivp) * d_depth * stable_f
        d_tw2_mat = jnp.where(unstable, d_depth, 0.0)

        # coefficient gradients: per-form [3, L] x [CI, L] matmuls on the
        # recentered basis (K = L, one MXU pass each; no concat copies),
        # then the per-instance chains back to the stored (origin-based)
        # coefficients: c' = c + cx a + cy b and the low-pass constant
        # c2p = -(ax2p^2 + ay2p^2)/(2 FI) + lo.
        def chain_rc(blk):  # [3, CI] recentered grads -> origin grads
            d_c = blk[2:3]
            return jnp.concatenate(
                [blk[0:1] + cxf * d_c, blk[1:2] + cyf * d_c, d_c], axis=0
            )

        fi = FILTER_INV_SQUARE
        d_cat = jnp.concatenate([d_p0, d_p1, d_p2, d_dn, d_s2], axis=0)
        d_coef = _dot_px(basis3, d_cat)  # [3, 5 CI]
        blk2 = d_coef[:, 4 * CI:5 * CI]
        d_c2p = blk2[2:3]
        small = _dot_px(ones1, jnp.concatenate([d_s3, d_tw2_mat], axis=0))

        gbuf[slot] = jnp.zeros((F_PAD, CI), jnp.float32)
        gbuf[slot, F_CP0:F_CP0 + 3, :] = chain_rc(d_coef[:, 0:CI])
        gbuf[slot, F_CP1:F_CP1 + 3, :] = chain_rc(d_coef[:, CI:2 * CI])
        gbuf[slot, F_CP2:F_CP2 + 3, :] = chain_rc(d_coef[:, 2 * CI:3 * CI])
        gbuf[slot, F_CDN:F_CDN + 3, :] = chain_rc(d_coef[:, 3 * CI:4 * CI])
        gbuf[slot, F_AX2, :] = (blk2[0:1] - d_c2p * ax2p * (1.0 / fi))[0]
        gbuf[slot, F_AY2, :] = (blk2[1:2] - d_c2p * ay2p * (1.0 / fi))[0]
        gbuf[slot, F_LO, :] = small[0, 0:CI] + d_c2p[0]
        gbuf[slot, F_TW2, :] = small[0, CI:2 * CI]
        gbuf[slot, F_CON:F_CON + 7, :] = _dot_px(ct7, w)
        grad_copy(ci_rev, base).start()

        # update reverse carries for the next (earlier) chunk
        state[0, :] = (T_rev * jnp.exp(jnp.sum(lf, axis=0, keepdims=True))).reshape(L)
        state[1, :] = (
            state[1, :].reshape(1, L)
            + jnp.sum(bterm, axis=0, keepdims=True)
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
