"""Pallas TPU kernels: per-tile alpha-compositing sweep, MXU formulation.

Speed-of-light replacement for the XLA scan in tpu_splat.raster.blend
(itself the TPU analogue of renderCUDA, forward.cu:258-489). Design:

- Instances ship RAW per-Gaussian attributes (homography rows Tu/Tv/Tw,
  low-pass center, log-opacity, content) gathered once into a feature-major
  [F=24, N_cap] slab. The ray-splat intersection is algebraically linear in
  the pixel: with k = x*Tw - Tu and l = y*Tw - Tv, the homogeneous
  intersection p = k x l = x*(Tv x Tw) + y*(Tw x Tu) + (Tu x Tv) — the
  quadratic term cancels. The kernel derives the cross-product coefficient
  vectors A, B, C per instance IN-KERNEL on [1, CI] rows (cheap, 1/256 the
  area of a pixel op) and evaluates everything per pixel on the MXU:
    rho3d numerator q = p0^2 + p1^2 is QUADRATIC in the pixel -> one
    [6, CI] x [6, L] dot against the basis (x^2, y^2, xy, x, y, 1);
    p2 / depth-numerator / low-pass exponent are linear -> one batched
    [3, 3*CI] x [3, L] dot. All on a TILE-RECENTERED basis (|x'| <= 8,
    exact small ints) so f32 conditioning matches the per-pixel oracle.
- The sequential "over" operator runs in log space with the exclusive
  prefix sum as a strict-lower-triangular one-hot matmul on the MXU; the
  early-termination mask needs NO second scan: T_after is monotone within
  the accepted subsequence, so `contrib = accept & (T_after >= T_EPS)`
  reproduces the CUDA done/skip semantics (forward.cu:408-416) exactly.
- Per-pixel weighted accumulation of color/normal/refl/scope is ONE
  [8, CI] @ [CI, L] matmul per chunk; full sums over the chunk axis are
  exact f32 VPU sublane-tree reductions (an M=1 ones-row matmul is the
  systolic array's worst case — a pass costs ~K*N/128 cycles regardless
  of M); per-pixel accumulators ride the chunk loop's register carry.
- Cross-tile software pipelining: tile t's first feature chunk is DMA'd by
  tile t-1 (double-buffered head slabs), so the per-tile DMA latency of
  short ranges (1-2 chunks is the common case in trained scenes) is hidden
  behind the previous tile's compute. Per-Gaussian max-weight writebacks
  ride a 4-deep global ring drained only at the final grid step.
- grid = (num_tiles,): per-tile (start, count) via scalar prefetch; the
  chunk loop is a while_loop with the REAL trip count and terminates early
  once every pixel saturates (T < 1e-4), like the CUDA block vote.

The backward kernel re-walks each tile back-to-front, reconstructing
transmittance by dividing alphas back out in log space (the TPU analogue of
backward.cu:143-470) with suffix sums as reversed triangular matmuls, and a
hand-derived gradient chain through the coefficient space back to the RAW
attributes (cross-product VJPs on [1, CI] rows). `full_grads=False`
("train-shaped") statically drops the depth-distortion / M1 / M2 / median
cotangent chains — the reference training loss never uses those channels
(train.py:168-196, depth_ratio=0 default arguments/__init__.py:75) — for a
~40% lighter sweep; render() asserts the config matches.
"""
from __future__ import annotations

import functools
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

# feature rows in the packed [F, N] instance slab (raw attributes; all
# pixel-space coefficients are derived in-kernel on the recentered basis)
F_TU = 0  # 0:3  homography row Tu
F_TV = 3  # 3:6  homography row Tv
F_TW = 6  # 6:9  homography row Tw
F_AX2 = 9  # FILTER_INV_SQUARE * xy.x (low-pass screen ellipse center)
F_AY2 = 10  # FILTER_INV_SQUARE * xy.y
F_LO = 11  # log(opacity)
F_CON = 12  # 12:20 content: color 3, normal 3, refl, scope
N_CON = 8
F_GRAD = 19  # gradient columns 0:19 can be nonzero (scope + pads never)
F_PAD = 24

LOG_AMAX = math.log(ALPHA_MAX)
M_C1 = FAR_N / (FAR_N - NEAR_N)
M_C2 = M_C1 * NEAR_N

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

CI = 128  # instances per chunk; lane-tile (128) aligned DMA slabs
L = TILE_PIX
WSLOT = 4  # wmax / grad writeback ring depth
NFSLOT = 4  # feature-stream ring depth (2 chunks in flight)

_HP = jax.lax.Precision.HIGHEST
# Mosaic lowers only DEFAULT and HIGHEST dot precision (pallas/mosaic/lowering.py
# raises on HIGH). _HI marks the dots where reduced precision is acceptable —
# content accumulation rows, not the exp() transmittance path. DEFAULT (bf16
# inputs, f32 accumulate) keeps the MXU at full rate there.
_HI = jax.lax.Precision.DEFAULT


def _dot_k(rows, rhs, precision=_HP):
    """[k, M] x [k, L] -> [M, L] (contract dim 0; k pads to 8 sublanes)."""
    return jax.lax.dot_general(
        rows, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_mm(a, b, precision=_HP):
    """[M, K] @ [K, N] standard matmul in f32."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_px(rows, mat, precision=_HP):
    """[k, L] x [M, L] -> [k, M] (contract the pixel axis)."""
    return jax.lax.dot_general(
        rows, mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _split3(x):
    """Three-way bf16 split: x == h + m + l exactly for f32 x (8+8+8
    mantissa bits cover f32's 24)."""
    h = x.astype(jnp.bfloat16)
    r1 = x - h.astype(jnp.float32)
    m = r1.astype(jnp.bfloat16)
    l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot_mm_exact01(a01, b):
    """a01 @ b where a01 is EXACTLY bf16-representable (0/1 triangular /
    ones masks): three single-pass bf16 MXU matmuls on a 3-way split of b.
    Every product is exact (x * {0,1}) and accumulation is f32, so the
    result carries full f32 fidelity in 3 MXU passes — vs HIGHEST's 6
    (bf16x6) for the same accuracy. This is the hot-scan formulation: the
    triangular prefix/suffix sums all have an exact-01 left operand."""
    a16 = a01.astype(jnp.bfloat16)
    out = None
    for part in _split3(b):
        d = jax.lax.dot_general(
            a16, part, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _dot_px_exact_lhs(rows_exact, mat):
    """[k, L] x [M, L] -> [k, M] (contract pixels) where rows_exact is
    EXACTLY bf16-representable (the recentered pixel basis: small ints and
    1.0): 3-way split of mat gives exact products + f32 accumulation in 3
    bf16 MXU passes — same fidelity as precision=HIGHEST at half the
    passes."""
    r16 = rows_exact.astype(jnp.bfloat16)
    out = None
    for part in _split3(mat):
        d = jax.lax.dot_general(
            r16, part, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


F_IN_PACKED = 16  # packed-feats slab rows (content pairs in rows 12..15)


def _pack2_bits(a, b):
    """bf16-round two f32 arrays and pack (a=hi16 | b=hi16>>16) into one
    f32-bitcast word (pure i32 bit ops — no 16-bit dtypes in-kernel)."""
    ia = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32
    )
    ib = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32
    )
    lo = jax.lax.shift_right_logical(ib, 16)
    return jax.lax.bitcast_convert_type(
        (ia & jnp.int32(-65536)) | lo, jnp.float32
    )


def _unpack2_bits(p):
    """Inverse of _pack2_bits -> (hi, lo) f32 (exact bf16 values)."""
    u = jax.lax.bitcast_convert_type(p, jnp.int32)
    hi = jax.lax.bitcast_convert_type(u & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(u, 16), jnp.float32
    )
    return hi, lo


def _content_rows(fb, packed: bool):
    """[8, CI] content rows (c0,c1,c2,n0,n1,n2,refl,scope) from the slab.

    Packed slabs carry bf16 pairs (content[k], content[k+4]) in rows
    12..15, so concat(hi, lo) restores the natural row order directly."""
    if not packed:
        return fb[F_CON : F_CON + N_CON]
    hi, lo = _unpack2_bits(fb[12:16])
    return jnp.concatenate([hi, lo], axis=0)


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


def _excl_cumsum(x, ltri, precision=_HI):
    """Exclusive prefix sum along the instance axis via MXU tri-matmul."""
    return _dot_mm(ltri, x, precision=precision)


def _suffix_incl(x, utri, precision=_HI):
    """Inclusive suffix sum along the instance axis via MXU tri-matmul."""
    return _dot_mm(utri, x, precision=precision)


def _cross_rows(a, b):
    """Component rows of a x b; a, b are 3-tuples of [1, CI] rows."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    return (a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _geom_rows(fb, cxf, cyf):
    """Per-instance coefficient derivation on [1, CI] rows (VPU-cheap).

    Returns a dict of coefficient rows on the tile-recentered basis:
    q (6: xx, yy, xy, x, y, 1), p2 (3), dn (3), s2 linear part (3), plus
    the intermediate rows the backward chains need.
    """
    fi = FILTER_INV_SQUARE
    r = lambda k: fb[k : k + 1, :]
    Tu = (r(F_TU), r(F_TU + 1), r(F_TU + 2))
    Tv = (r(F_TV), r(F_TV + 1), r(F_TV + 2))
    Tw = (r(F_TW), r(F_TW + 1), r(F_TW + 2))
    A = _cross_rows(Tv, Tw)  # p = x*A + y*B + C (homogeneous intersection)
    B = _cross_rows(Tw, Tu)
    C = _cross_rows(Tu, Tv)
    # recentered constant terms c' = c + cx*a + cy*b
    cp0 = C[0] + cxf * A[0] + cyf * B[0]
    cp1 = C[1] + cxf * A[1] + cyf * B[1]
    cp2 = C[2] + cxf * A[2] + cyf * B[2]
    # depth numerator p . Tw
    da = _dot3(A, Tw)
    db = _dot3(B, Tw)
    dc = _dot3(C, Tw)
    dcc = dc + cxf * da + cyf * db
    # low-pass exponent s2 = -fi/2 (x^2+y^2) + sx x + sy y + s0
    lo = r(F_LO)
    sx = r(F_AX2) - fi * cxf
    sy = r(F_AY2) - fi * cyf
    s0 = lo - (sx * sx + sy * sy) * (0.5 / fi)
    return dict(
        A=A, B=B, C=C, Tu=Tu, Tv=Tv, Tw=Tw,
        cp0=cp0, cp1=cp1, cp2=cp2, da=da, db=db, dcc=dcc,
        sx=sx, sy=sy, s0=s0, lo=lo,
    )


def _geom_eval(gr, basis3):
    """Evaluate the five pixel-linear fields as [CI,1] x [1,L] FMAs.

    basis3: [3, L] rows (x, y, 1) on the recentered basis. Returns
    (p0, p1, p2, dn, s2lin) as [CI, L] arrays. p0/p1 are evaluated as
    linear forms and squared PER PIXEL (not expanded into quadratic
    coefficients) so rho3d's rounding matches the oracle's — an
    algebraic expansion shifts alpha by ~1e-6, enough to flip the
    T < 1e-4 termination knife-edge on opaque stacks.

    Note: a batched [3,5CI]x[3,L] MXU dot is algebraically equivalent and
    was tried, but Mosaic cannot lane-concatenate the coefficient rows —
    they are fb slices carrying different sublane-offset layouts
    (tpu.concatenate rejects mismatched vpad in_layouts), and a K=3
    contraction wastes the 128-deep systolic array anyway. The broadcast
    FMA form compiles and keeps each coefficient in [CI,1] position."""
    A, B, C = gr["A"], gr["B"], gr["C"]
    px = basis3[0:1, :]  # [1, L]
    py = basis3[1:2, :]
    tp = jnp.transpose

    def field(xc, yc, cc):
        return tp(xc) * px + tp(yc) * py + tp(cc)

    p0 = field(A[0], B[0], gr["cp0"])
    p1 = field(A[1], B[1], gr["cp1"])
    p2 = field(A[2], B[2], gr["cp2"])
    dn = field(gr["da"], gr["db"], gr["dcc"])
    s2lin = field(gr["sx"], gr["sy"], gr["s0"])
    return p0, p1, p2, dn, s2lin


def _alpha_depth(fb, gr, basis3, r2):
    """Shared fwd/bwd field evaluation. Returns dict of [CI, L] arrays."""
    fi = FILTER_INV_SQUARE
    p0, p1, p2, dn, s2lin = _geom_eval(gr, basis3)
    s2 = s2lin - (0.5 * fi) * r2
    unstable = jnp.abs(p2) < 1e-4
    ivp = 1.0 / jnp.where(unstable, 1.0, p2)
    ivp2 = ivp * ivp
    r3h = 0.5 * (p0 * p0 + p1 * p1) * ivp2  # rho3d / 2
    lo_c = jnp.transpose(gr["lo"])  # [CI, 1]
    s3 = jnp.where(unstable, -1e8, lo_c - r3h)
    s = jnp.maximum(s3, s2)
    a_log = jnp.minimum(LOG_AMAX, s)
    alpha = jnp.exp(a_log)
    tw2_c = jnp.transpose(fb[F_TW + 2 : F_TW + 3, :])  # [CI, 1]
    depth = jnp.where(unstable, tw2_c * jnp.ones_like(p2), dn * ivp)
    return dict(
        p0=p0, p1=p1, p2=p2, dn=dn, s2=s2, s3=s3, s=s, unstable=unstable,
        ivp=ivp, ivp2=ivp2, r3h=r3h, alpha=alpha, depth=depth,
    )


def _basis(orgx, orgy):
    """Tile-recentered pixel basis rows. Returns (basis3 [3, L], r2 [1, L],
    cxf, cyf)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    cx = orgx + 7
    cy = orgy + 7
    pixx = (lane % TILE - 7).astype(jnp.float32)
    pixy = (lane // TILE - 7).astype(jnp.float32)
    ones1 = jnp.ones((1, L), jnp.float32)
    basis3 = jnp.concatenate([pixx, pixy, ones1], axis=0)
    r2 = pixx * pixx + pixy * pixy
    return basis3, r2, jnp.float32(cx), jnp.float32(cy)


def _m_of_depth(depth):
    safe_depth = jnp.maximum(depth, NEAR_N)
    m = M_C1 - M_C2 * (1.0 / safe_depth)
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
    hbuf,  # VMEM (2, F_PAD, CI): per-tile head chunk, filled by tile t-1
    fbuf,  # VMEM (NFSLOT, F_PAD, CI): streaming chunks >= 1
    wbuf,  # VMEM (WSLOT, 8, CI)
    wcnt,  # SMEM (1,) i32: global wmax writeback counter
    h_sem,
    f_sem,
    w_sem,
    train_shape: bool = False,
    packed_feats: bool = False,
    collect_wmax: bool = True,
):
    """train_shape=True statically drops the depth-distortion / M1 / M2 /
    median VALUE computation too (~25% of the per-chunk VPU work): the
    reference training loss with depth_ratio=0 reads none of those channels
    (train.py:168-196; surf_depth uses only the expected-depth channel) —
    the forward analogue of the backward's full_grads=False. Those output
    rows stay zero; eval/render paths keep the full shape.

    collect_wmax=False statically drops the per-chunk wmax writeback ring
    (one [8, CI] DMA per chunk): inference (render_fast) never reads the
    per-Gaussian max blend weight the reference only accumulates for
    densification stats (forward.cu:457-459)."""
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    start = starts_ref[t]
    count = counts_ref[t]

    @pl.when(t == 0)
    def _init_ring():
        wcnt[0] = 0

    def head_dma(tile):
        base = pl.multiple_of(starts_ref[tile], CI)
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(base, CI)], hbuf.at[tile % 2],
            h_sem.at[tile % 2],
        )

    @pl.when(t == 0)
    def _prime_own_head():
        @pl.when(count > 0)
        def _():
            head_dma(0).start()

    # cross-tile pipeline: issue tile t+1's first chunk before our own sweep
    @pl.when(t + 1 < n_tiles)
    def _prefetch_next_head():
        @pl.when(counts_ref[t + 1] > 0)
        def _():
            head_dma(t + 1).start()

    basis3, r2, cxf, cyf = _basis(orgx_ref[t], orgy_ref[t])
    ltri = _ltri_strict()

    n_chunks = pl.cdiv(count, CI)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CI, 1), 0)

    def feat_dma(ci):
        base = pl.multiple_of(start + ci * CI, CI)
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(base, CI)], fbuf.at[ci % NFSLOT],
            f_sem.at[ci % NFSLOT],
        )

    # two stream chunks in flight (ring depth 4): chunk compute ~2.5 us is
    # barely above the DMA issue-to-complete latency, so one-deep
    # prefetching exposes part of it on the common short tiles
    @pl.when(n_chunks > 1)
    def _prefetch_second():
        feat_dma(1).start()

    @pl.when(n_chunks > 2)
    def _prefetch_third():
        feat_dma(2).start()

    def store_wmax(base, wmax_ci):
        # Mosaic requires full-tile (8,128) slab stores into tiled HBM refs,
        # so wmax rides in row 0 of an [8, CI] slab (rows 1..7 zero).
        # Global WSLOT-deep ring: wait for the copy issued WSLOT chunks ago
        # on this slot before refilling; drained at the final grid step.
        k = wcnt[0]
        slot = k % WSLOT
        base = pl.multiple_of(base, CI)
        copy = pltpu.make_async_copy(
            wbuf.at[slot], wmax_ref.at[:, pl.ds(base, CI)], w_sem.at[slot]
        )

        @pl.when(k >= WSLOT)
        def _wait_prev():
            copy.wait()  # same slot, same sem: retires the k-WSLOT copy

        wbuf[slot] = jnp.zeros((8, CI), jnp.float32)
        wbuf[slot, 0, :] = wmax_ci
        copy.start()
        wcnt[0] = k + 1

    def chunk_body(carry):
        # accumulators ride the while-loop CARRY (register-resident, ~4
        # vregs) instead of VMEM scratch rows: the former per-row scratch
        # read-modify-writes serialized against the elementwise stream
        if train_shape:
            ci, _ad, T_c, done_f, dep, con, ncon = carry
        else:
            (ci, _ad, T_c, done_f, dep, con, ncon,
             m1, m2, dist, med, medrank) = carry
        base = pl.multiple_of(start + ci * CI, CI)

        # chunk 0 arrives in the head slab (DMA'd by the previous tile);
        # later chunks stream through the double-buffered fbuf
        @pl.when(ci == 0)
        def _wait_head():
            pltpu.make_async_copy(
                feats_ref.at[:, pl.ds(base, CI)], hbuf.at[t % 2],
                h_sem.at[t % 2],
            ).wait()

        @pl.when(ci > 0)
        def _wait_stream():
            feat_dma(ci).wait()

        fb = jnp.where(ci == 0, hbuf[t % 2], fbuf[ci % NFSLOT])

        @pl.when((ci + 2 < n_chunks) & (ci > 0))
        def _prefetch_next():
            feat_dma(ci + 2).start()

        gr = _geom_rows(fb, cxf, cyf)
        g = _alpha_depth(fb, gr, basis3, r2)
        alpha, depth = g["alpha"], g["depth"]

        idx = base + row_i
        valid = idx < start + count
        done = done_f > 0.5  # [1, L]
        accept = (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & valid & ~done
        a_eff = jnp.where(accept, alpha, 0.0)

        # transmittance: exclusive prefix product of (1 - a) in log space.
        # Full f32 fidelity required (a 128-term sum of |u| ~ 4.6 on opaque
        # stacks feeds exp); the exact-01 3-way split delivers it in 3 MXU
        # passes vs HIGHEST's 6.
        u = jnp.log1p(-a_eff)
        prefix = jnp.exp(_dot_mm_exact01(ltri, u))
        T_carry = T_c  # [1, L]
        T_before = T_carry * prefix
        one_m = 1.0 - a_eff
        T_after = T_before * one_m
        # T_after is monotone over the accepted subsequence, so a single
        # threshold reproduces skip-after-termination (forward.cu:408-416)
        contrib = accept & (T_after >= T_EPS)
        w = jnp.where(contrib, alpha * T_before, 0.0)
        u_con = jnp.where(contrib, u, 0.0)

        if not train_shape:
            # depth distortion (2DGS appendix; forward.cu:419-427)
            m, _sd = _m_of_depth(depth)
            mw = m * w
            m2w = m * mw
            pre = _excl_cumsum(jnp.concatenate([mw, m2w], axis=1), ltri)  # [CI, 2L]
            A_ = 1.0 - T_before
            M1c = m1 + pre[:, :L]
            M2c = m2 + pre[:, L:]
            dterm = (m * m * A_ + M2c - 2.0 * m * M1c) * w

        # full chunk-axis sums as VPU sublane-tree reductions: an [1, CI]
        # ones-row MXU matmul is the M=1 worst case (the systolic pass
        # costs ~K*N/128 cycles regardless of M, and the exact-01 f32
        # fidelity needs 3 of them) while the f32 tree sum is exact AND a
        # handful of vector adds
        vsum = lambda x: jnp.sum(x, axis=0, keepdims=True)
        T_all = T_carry * jnp.exp(vsum(u))
        T_new = T_carry * jnp.exp(vsum(u_con))
        done_new = done | (T_all < T_EPS)

        dep = dep + vsum(w * depth)
        if not train_shape:
            m1 = m1 + vsum(mw)
            m2 = m2 + vsum(m2w)
            dist = dist + vsum(dterm)

        # content accumulation: ONE [8, CI] @ [CI, L] matmul
        con = con + _dot_mm(
            _content_rows(fb, packed_feats), w, precision=_HI
        )  # [8, L]

        rank = (idx - start + 1).astype(jnp.float32)  # 1-based
        if not train_shape:
            med_cond = contrib & (T_before > 0.5)
            med_rank = jnp.max(
                jnp.where(med_cond, rank, 0.0), axis=0, keepdims=True
            )
            has_med = med_rank > 0.0
            sel = med_cond & (rank == med_rank)
            med_depth_new = jnp.sum(
                jnp.where(sel, depth, 0.0), axis=0, keepdims=True
            )
            med = jnp.where(has_med, med_depth_new, med)
            medrank = jnp.where(has_med, med_rank, medrank)
        ncon = jnp.maximum(
            ncon, jnp.max(jnp.where(contrib, rank, 0.0), axis=0, keepdims=True)
        )

        T_c = T_new
        done_f = done_new.astype(jnp.float32)

        if collect_wmax:
            store_wmax(base, jnp.max(jnp.where(valid, w, 0.0), axis=1))

        all_done = jnp.min(done_f) > 0.5
        if train_shape:
            return ci + 1, all_done, T_c, done_f, dep, con, ncon
        return (ci + 1, all_done, T_c, done_f, dep, con, ncon,
                m1, m2, dist, med, medrank)

    def cond(carry):
        return (carry[0] < n_chunks) & ~carry[1]

    zrow = jnp.zeros((1, L), jnp.float32)
    init = (
        jnp.int32(0), jnp.bool_(False),
        jnp.ones((1, L), jnp.float32),  # T
        zrow,  # done
        zrow,  # depth
        jnp.zeros((8, L), jnp.float32),  # content
        zrow,  # n_contrib
    )
    if not train_shape:
        init = init + (zrow, zrow, zrow, zrow, zrow)  # m1 m2 dist med medrank
    final = jax.lax.while_loop(cond, chunk_body, init)
    ci_f = final[0]
    _, _, T_c, _done_f, dep, con, ncon = final[:7]
    if train_shape:
        m1 = m2 = dist = med = medrank = zrow
    else:
        m1, m2, dist, med, medrank = final[7:12]
    # (skipped chunks need no zero-fill: wmax is aliased to a zeros input)

    # retire outstanding feature copies so later programs' semaphores are
    # clean: early exit can leave up to two stream prefetches in flight
    # (chunks ci_f and ci_f+1); an unconsumed head (count > 0 but exit
    # before chunk 0) never happens — chunk 0 always runs when count > 0,
    # waiting the head there
    @pl.when((ci_f >= 1) & (ci_f < n_chunks))
    def _drain_feat():
        feat_dma(ci_f).wait()

    @pl.when((ci_f >= 1) & (ci_f + 1 < n_chunks))
    def _drain_feat2():
        feat_dma(ci_f + 1).wait()

    # final grid step: drain the last <= WSLOT wmax writebacks
    if collect_wmax:
        @pl.when(t == n_tiles - 1)
        def _drain_wring():
            k = wcnt[0]

            def body(j, _):
                @pl.when(j < jnp.minimum(k, WSLOT))
                def _():
                    pltpu.make_async_copy(
                        wbuf.at[(k - 1 - j) % WSLOT],
                        wmax_ref.at[:, pl.ds(pl.multiple_of(start, CI), CI)],
                        w_sem.at[(k - 1 - j) % WSLOT],
                    ).wait()

                return _

            jax.lax.fori_loop(0, WSLOT, body, None)

    # scope mask: 1 iff any contributing in-scope instance (w > 0 for every
    # contributor, so the weighted sum is positive exactly then); output
    # rows assembled once from the register carries (order = O_* layout)
    scope_row = (con[7:8] > 0.0).astype(jnp.float32)
    out_px_ref[0, :, :] = jnp.concatenate(
        [
            con[0:3],  # O_COL
            T_c,  # O_T
            dep,  # O_DEPTH
            con[6:7],  # O_REFL
            dist,  # O_DIST
            con[3:6],  # O_NRM
            med,  # O_MED
            scope_row,  # O_SCOPE
            ncon,  # O_NCON
            m1,  # O_M1
            m2,  # O_M2
            medrank,  # O_MEDRANK
        ],
        axis=0,
    )


def tile_blend_forward(
    feats: jnp.ndarray,  # [F_PAD | 16, N_cap] feature-major instance attrs
    starts: jnp.ndarray,  # [T] i32 CI-aligned exclusive range starts
    counts: jnp.ndarray,  # [T] i32
    org_x: jnp.ndarray,  # [T] i32
    org_y: jnp.ndarray,  # [T] i32
    interpret: bool | None = None,
    train_shape: bool = False,
    packed_feats: bool = False,
    collect_wmax: bool = True,
):
    """-> (out_px [T, 16, 256], wmax [N_cap]). train_shape statically drops
    the distortion/median channel computation; collect_wmax=False drops the
    per-chunk wmax writeback (inference; wmax returns all-zero)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    T = starts.shape[0]
    n_cap = feats.shape[1]
    f_in = F_IN_PACKED if packed_feats else F_PAD
    assert feats.shape[0] == f_in, (feats.shape, packed_feats)
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
            pltpu.VMEM((2, f_in, CI), jnp.float32),
            pltpu.VMEM((NFSLOT, f_in, CI), jnp.float32),
            pltpu.VMEM((WSLOT, 8, CI), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((NFSLOT,)),
            pltpu.SemaphoreType.DMA((WSLOT,)),
        ],
    )
    # wmax is aliased to a zero input: under tile sharding each shard only
    # writes its own ranges, so unwritten slots must be 0, not garbage
    wmax_init = jnp.zeros((8, n_cap), jnp.float32)
    out_px, wmax = pl.pallas_call(
        functools.partial(
            _tile_blend_kernel,
            train_shape=train_shape,
            packed_feats=packed_feats,
            collect_wmax=collect_wmax,
        ),
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


def _pack_pair_bf16(a, b):
    """Two f32 columns -> one i32 sort payload of bf16 halves."""
    ia = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    ib = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((ia << 16) | ib, jnp.int32)


def _unpack_pair_bf16(c):
    iu = jax.lax.bitcast_convert_type(c, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        (iu >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        iu.astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return hi, lo


def _pack_g16(g24):
    """[P, F_PAD] -> [P, 16]: geometry rows verbatim, content rows 12..15
    as bf16 pairs (content[k], content[k+4]) — see _content_rows."""
    con = g24[:, F_CON : F_CON + 8]
    pairs = [_pack2_bits(con[:, k], con[:, k + 4]) for k in range(4)]
    return jnp.concatenate(
        [g24[:, :12], jnp.stack(pairs, axis=1)], axis=1
    )


def _regroup_unpack(chunk):
    """[10, CI] i32 packed regroup chunk -> [19, CI] f32 grad rows (VMEM,
    pure i32 bit ops, concat-only layout). Output row order (callers
    un-permute with _REGROUP_PERM): [6 geo hi | 6 geo lo | 4 content hi |
    3 content lo]. _pack_pair_bf16 and the backward kernel's content pair
    words share the (hi16 | lo16) bit layout, so one _unpack2_bits covers
    both."""
    w = jax.lax.bitcast_convert_type(chunk[0:10], jnp.float32)
    hi, lo = _unpack2_bits(w)  # [10, CI] each
    return jnp.concatenate([hi[0:6], lo[0:6], hi[6:10], lo[6:9]], axis=0)


# inverse row order: natural grad column k lives at _REGROUP_PERM[k] of the
# kernel's concat layout (geo interleave hi/lo, then content hi block + lo)
_REGROUP_PERM = tuple(
    [v for k in range(6) for v in (k, 6 + k)] + list(range(12, 19))
)


@functools.lru_cache(maxsize=None)
def _make_expand_rows(bf16_pack: bool, packed_feats: bool = False):
    @jax.custom_vjp
    def expand_rows(g24, gid, valid, group_key, rank_of, seg_start, seg_end):
        g_in = _pack_g16(g24) if packed_feats else g24
        return jnp.where(valid[:, None], g_in[gid], 0.0)  # [N_cap, F|16]

    def fwd(g24, gid, valid, group_key, rank_of, seg_start, seg_end):
        out = expand_rows(g24, gid, valid, group_key, rank_of, seg_start, seg_end)
        return out, (valid, group_key, rank_of, seg_start, seg_end)

    def bwd(res, d_out):
        # Gather-free transpose: ONE variadic sort keyed on the binning's
        # depth-rank payload regroups grad rows per Gaussian (rank-grouped
        # positions coincide with emission indices, which are gap-free
        # below min(total, cap), so the analytic [seg_start, seg_end) runs
        # apply; within-run order is irrelevant to the segment sum). Measured ~2x cheaper than the row-gather-by-permutation
        # alternative (a [4M, 24] f32 row gather runs at ~3 GB/s on v5e;
        # lax.sort moves ~2.3 ms per payload column). Only the F_GRAD
        # columns that can be nonzero (scope and pads never receive
        # gradients from the backward kernel) ride the sort. Rows at
        # invalid slots are exactly zero (the bwd kernel masks by
        # contribution and d_feats is zero-aliased) and carry emit >= cap,
        # sorting past every segment. With bf16_pack, column PAIRS ride as
        # one bitcast-packed i32 payload (halves the sort; per-instance
        # bf16 rounding before the f32 per-Gaussian sum — see
        # RasterConfig.bf16_grads).
        from tpu_splat.kernels.segment_reduce import segment_sum_ranges

        valid, group_key, rank_of, seg_start, seg_end = res
        if packed_feats:
            # d_out is [N, 16]: cols 0..11 f32 geometry grads, cols 12..15
            # bf16 content-grad pairs straight from the backward kernel.
            # Geometry pairs compress for the sort exactly like bf16_pack;
            # content pairs ride AS-IS (already one word per pair). The
            # packed words go STRAIGHT into the segment-sum kernel, which
            # expands them chunk-by-chunk in VMEM (halves its HBM read).
            geo = [
                _pack_pair_bf16(d_out[:, 2 * k], d_out[:, 2 * k + 1])
                for k in range(6)
            ]
            con = [d_out[:, 12 + k] for k in range(4)]
            srt = jax.lax.sort(
                (group_key,) + tuple(geo) + tuple(con),
                num_keys=1, is_stable=False,
            )
            # NOTE: shipping the packed words straight into the segment-sum
            # kernel (segment_sum_ranges unpack=_regroup_unpack) halves its
            # HBM read but measured SLOWER on v5e (71 vs 65 ms whole
            # regroup at bench scale — the per-chunk VMEM unpack sits on
            # the DMA-latency-bound critical path), so the expansion stays
            # outside where XLA fuses it into the sort output.
            rows = []
            for c in srt[1:7]:
                hi, lo = _unpack_pair_bf16(c)
                rows += [hi, lo]  # geometry rows 0..11
            chl = [_unpack2_bits(c) for c in srt[7:11]]
            # content order: c0 c1 c2 n0 (hi halves), n1 n2 refl (lo halves)
            rows += [chl[0][0], chl[1][0], chl[2][0], chl[3][0],
                     chl[0][1], chl[1][1], chl[2][1]]
            rows_T = jnp.stack(rows, axis=0)  # [19, cap_al]
            d_part = segment_sum_ranges(rows_T, seg_start, seg_end).T[rank_of]
            F = F_PAD
            d_g24 = jnp.concatenate(
                [d_part, jnp.zeros((d_part.shape[0], F - 19), d_part.dtype)],
                axis=1,
            )
            return d_g24, None, None, None, None, None, None
        F = d_out.shape[1]
        ncols = min(F, F_GRAD)
        if bf16_pack:
            npair = (ncols + 1) // 2
            packed = []
            for k in range(npair):
                a = d_out[:, 2 * k]
                b = (
                    d_out[:, 2 * k + 1]
                    if 2 * k + 1 < ncols
                    else jnp.zeros_like(a)
                )
                packed.append(_pack_pair_bf16(a, b))
            srt = jax.lax.sort(
                (group_key,) + tuple(packed), num_keys=1, is_stable=False
            )
            up = []
            for c in srt[1:]:
                hi, lo = _unpack_pair_bf16(c)
                up += [hi, lo]
            rows_T = jnp.stack(up[:ncols], axis=0)
        else:
            cols = tuple(d_out[:, i] for i in range(ncols))
            srt = jax.lax.sort((group_key,) + cols, num_keys=1, is_stable=False)
            rows_T = jnp.stack(srt[1:], axis=0)  # [ncols, cap_al]
        d_part = segment_sum_ranges(rows_T, seg_start, seg_end).T[rank_of]
        d_g24 = jnp.concatenate(
            [d_part, jnp.zeros((d_part.shape[0], F - ncols), d_part.dtype)],
            axis=1,
        )
        return d_g24, None, None, None, None, None, None

    expand_rows.defvjp(fwd, bwd)
    return expand_rows


_expand_rows = _make_expand_rows(False)  # back-compat alias (exact path)


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
    group_key: jnp.ndarray | None = None,
    rank_of: jnp.ndarray | None = None,
    seg_start: jnp.ndarray | None = None,
    seg_end: jnp.ndarray | None = None,
    bf16_grads: bool = False,
    bf16_feats: bool = False,
) -> jnp.ndarray:
    """Gather per-Gaussian attrs into the kernel's [F_PAD, N_cap] layout.

    ONE row-gather of RAW attributes (hom rows, low-pass center,
    log-opacity, content); the kernel derives all pixel-space coefficients
    itself, so the only differentiable pre-math here is the log. Validity
    masks every row so pad slots (and the backward kernel's never-written
    d_feats tail) cannot leak gradients.

    When the binning's per-Gaussian grouping (group_key=aligned_rank/rank_of/seg_*) is given,
    the gather's transpose is a sort-regroup + analytic-run segment sum
    instead of XLA's scatter-add."""
    P_ = opacity.shape[0]
    fi = FILTER_INV_SQUARE
    lo = jnp.log(jnp.maximum(opacity, 1e-12))
    g24 = jnp.concatenate(
        [
            hom.reshape(P_, 9),
            fi * xy,
            lo[:, None],
            color,
            normal_view,
            refl[:, None],
            scope_mask.astype(jnp.float32)[:, None],
            jnp.zeros((P_, F_PAD - 20), jnp.float32),
        ],
        axis=1,
    )  # [P, F_PAD]
    if group_key is not None:
        feats = _make_expand_rows(bf16_grads, bf16_feats)(
            g24, sorted_gid, valid, group_key, rank_of, seg_start, seg_end
        )
    else:
        assert not bf16_feats, "bf16_feats requires the grouped (sorted) path"
        feats = jnp.where(valid[:, None], g24[sorted_gid], 0.0)  # [N_cap, F]
    return feats.T


# ---------------------------------------------------------------------------
# Backward kernel: back-to-front sweep with transmittance reconstruction.
#
# Hand-derived reverse of the forward above (the TPU counterpart of
# backward.cu renderCUDA:143-470). Per pixel, for contributing instance i:
#   dL/dalpha_i = T_i * what_i - B_i / (1 - alpha_i)
#   B_i = sum_{j>i} (what_j w_j - dist^ w_j m_j^2 T_j) + T^ * T_final
#   what_i = c^.c_i + n^.n_i + d^ d_i + r^ r_i [+ m1^ m_i + m2^ m_i^2
#            + dist^ * (m_i^2 A_i + M2_i - 2 m_i M1_i
#                       + m_i^2 W>_i - 2 m_i MW>_i)]
# with A_i = 1 - T_i, prefix M1_i/M2_i reconstructed from the saved totals
# minus suffix sums, W>_i / MW>_i suffix sums, and T_i rebuilt by dividing
# T out backward (log-space suffix matmul). Alpha gradients route to the
# exponent branches exactly as the reference's rho3d <= rho2d test, then
# through the quadratic/linear coefficient projections (one [6, L] x
# [6CI, L] MXU dot) and per-instance cross-product VJPs back to the raw
# attribute rows. Bracketed terms exist only when full_grads=True.
# Contribution masks are rebuilt from the saved per-pixel n_contrib rank
# (reference saves the same, backward.cu:198-204).


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel(full_grads: bool, packed_feats: bool = False):
    f_io = F_IN_PACKED if packed_feats else F_PAD

    def kernel(
        starts_ref,
        counts_ref,
        used_ref,  # [T] i32: chunks with any contributor (from fwd n_contrib)
        orgx_ref,
        orgy_ref,
        feats_ref,  # [F_PAD, N_cap] ANY
        fwd_px_ref,  # block (1, 16, L): forward outputs
        ct_px_ref,  # block (1, 16, L): cotangents of forward outputs
        dfeats_init_ref,  # [F_PAD, N_cap] ANY zeros (aliased to output)
        dfeats_ref,  # [F_PAD, N_cap] ANY output (aliased)
        hbuf,  # VMEM (2, F_PAD, CI): per-tile head (last used chunk)
        fbuf,  # VMEM (NFSLOT, F_PAD, CI)
        gbuf,  # VMEM (WSLOT, F_PAD, CI) grad slab ring
        gcnt,  # SMEM (1,) i32
        h_sem,
        f_sem,
        g_sem,
    ):
        t = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        start = starts_ref[t]
        count = counts_ref[t]
        used_chunks = used_ref[t]

        @pl.when(t == 0)
        def _init_ring():
            gcnt[0] = 0

        def head_dma(tile):
            # first-processed chunk of `tile` = its LAST used chunk
            base = pl.multiple_of(
                starts_ref[tile] + (used_ref[tile] - 1) * CI, CI
            )
            return pltpu.make_async_copy(
                feats_ref.at[:, pl.ds(base, CI)], hbuf.at[tile % 2],
                h_sem.at[tile % 2],
            )

        @pl.when(t == 0)
        def _prime_own_head():
            @pl.when(used_chunks > 0)
            def _():
                head_dma(0).start()

        @pl.when(t + 1 < n_tiles)
        def _prefetch_next_head():
            @pl.when(used_ref[t + 1] > 0)
            def _():
                head_dma(t + 1).start()

        basis3, r2, cxf, cyf = _basis(orgx_ref[t], orgy_ref[t])
        utri = _utri_incl()

        def fw(i):
            return fwd_px_ref[0, i, :].reshape(1, L)

        def ct(i):
            return ct_px_ref[0, i, :].reshape(1, L)

        T_final = fw(O_T)
        ncon = fw(O_NCON)
        ct_T = ct(O_T)
        ct_d = ct(O_DEPTH)
        # content cotangent rows (order matches F_CON..F_CON+6)
        ct7 = jnp.concatenate(
            [
                ct(O_COL), ct(O_COL + 1), ct(O_COL + 2),
                ct(O_NRM), ct(O_NRM + 1), ct(O_NRM + 2),
                ct(O_REFL),
            ],
            axis=0,
        )  # [7, L]
        if full_grads:
            M1tot = fw(O_M1)
            M2tot = fw(O_M2)
            med_rank_px = fw(O_MEDRANK)
            ct_dist = ct(O_DIST)
            ct_med = ct(O_MED)
            ct_m1 = ct(O_M1)
            ct_m2 = ct(O_M2)

        # reverse carries (T_rev, B, [full: Wsuf, MWsuf, M2Wsuf]) ride the
        # fori_loop carry in registers (see the forward's carry note)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (CI, 1), 0)

        def feat_dma(ci_rev):
            ci = used_chunks - 1 - ci_rev
            base = pl.multiple_of(start + ci * CI, CI)
            return pltpu.make_async_copy(
                feats_ref.at[:, pl.ds(base, CI)], fbuf.at[ci_rev % NFSLOT],
                f_sem.at[ci_rev % NFSLOT],
            )

        # two stream chunks in flight (see the forward's ring note)
        @pl.when(used_chunks > 1)
        def _prefetch_second():
            feat_dma(1).start()

        @pl.when(used_chunks > 2)
        def _prefetch_third():
            feat_dma(2).start()

        def chunk_body(ci_rev, carry):
            if full_grads:
                T_rev, Bc, Wsuf, MWsuf, M2Wsuf = carry
            else:
                T_rev, Bc = carry
            ci = used_chunks - 1 - ci_rev
            base = pl.multiple_of(start + ci * CI, CI)

            @pl.when(ci_rev == 0)
            def _wait_head():
                pltpu.make_async_copy(
                    feats_ref.at[:, pl.ds(base, CI)], hbuf.at[t % 2],
                    h_sem.at[t % 2],
                ).wait()

            @pl.when(ci_rev > 0)
            def _wait_stream():
                feat_dma(ci_rev).wait()

            fb = jnp.where(ci_rev == 0, hbuf[t % 2], fbuf[ci_rev % NFSLOT])

            @pl.when((ci_rev + 2 < used_chunks) & (ci_rev > 0))
            def _prefetch_next():
                feat_dma(ci_rev + 2).start()

            gr = _geom_rows(fb, cxf, cyf)
            g = _alpha_depth(fb, gr, basis3, r2)
            alpha, depth = g["alpha"], g["depth"]
            unstable, ivp, ivp2 = g["unstable"], g["ivp"], g["ivp2"]
            p0, p1, dn, r3h = g["p0"], g["p1"], g["dn"], g["r3h"]
            s2, s3, s = g["s2"], g["s3"], g["s"]

            idx = base + row_i
            rank = (idx - start + 1).astype(jnp.float32)
            accept_local = (
                (depth >= NEAR_N) & (alpha >= ALPHA_MIN) & (idx < start + count)
            )
            contrib = accept_local & (rank <= ncon)

            # reconstruct T_i (transmittance before instance i)
            lf = jnp.where(contrib, -jnp.log1p(-alpha), 0.0)
            suf_lf = _dot_mm_exact01(utri, lf)
            T_i = T_rev * jnp.exp(suf_lf)
            w = jnp.where(contrib, alpha * T_i, 0.0)

            # what = content terms + depth (+ distortion when full)
            what_content = _dot_k(
                _content_rows(fb, packed_feats)[:7], ct7, precision=_HI
            )
            what = what_content + ct_d * depth
            d_depth = w * ct_d

            if full_grads:
                m, safe_depth = _m_of_depth(depth)
                mw = m * w
                m2w = m * mw
                suf = _suffix_incl(
                    jnp.concatenate([w, mw, m2w], axis=1), utri
                )  # [CI, 3L]
                W_gt = Wsuf + (suf[:, :L] - w)  # sum_{j>i}
                MW_gt = MWsuf + (suf[:, L : 2 * L] - mw)
                M2W_gt = M2Wsuf + (suf[:, 2 * L :] - m2w)
                M1_i = M1tot - MW_gt - mw  # prefix sum_{j<i} m w
                M2_i = M2tot - M2W_gt - m2w
                A_i = 1.0 - T_i
                phi = (
                    m * m * A_i
                    + M2_i
                    - 2.0 * m * M1_i
                    + m * m * W_gt
                    - 2.0 * m * MW_gt
                )
                what = what + ct_m1 * m + ct_m2 * m * m + ct_dist * phi
                d_m_tot = (
                    ct_m1 * w
                    + 2.0 * m * ct_m2 * w
                    + ct_dist * 2.0 * w * (m * A_i - M1_i + m * W_gt - MW_gt)
                )
                dm_dd = M_C2 / (safe_depth * safe_depth)
                dm_dd = jnp.where(depth >= NEAR_N, dm_dd, 0.0)
                is_med = contrib & (rank == med_rank_px)
                d_depth = (
                    d_depth + d_m_tot * dm_dd + jnp.where(is_med, ct_med, 0.0)
                )
                bterm = what * w - ct_dist * w * m * m * T_i
            else:
                bterm = what * w

            # alpha gradient
            B_i = Bc + (_suffix_incl(bterm, utri) - bterm)
            d_alpha = jnp.where(
                contrib, T_i * what - B_i / (1.0 - alpha), 0.0
            )

            # alpha = exp(min(log a_max, s)); route d_s to the s3/s2 branch
            gate = (s < LOG_AMAX).astype(jnp.float32)
            d_s = alpha * gate * d_alpha
            use3 = (s3 >= s2) & ~unstable  # reference rho3d <= rho2d branch
            d_s3 = jnp.where(use3, d_s, 0.0)
            d_s2 = jnp.where(use3, 0.0, d_s)

            # s3 = lo - 0.5 (p0^2+p1^2) ivp^2 ; depth = dn ivp (stable) | tw2
            # Depth-VALUE grads follow the reference branch split
            # (backward.cu:430-471): the full s-chain (dn/p2) only where
            # rho3d <= rho2d; in the low-pass branch s is FROZEN and depth
            # grads hit Tw directly as d_depth * (sx, sy, 1) — the same
            # semantics as raster/blend.py's stop_gradient.
            stable_f = (~unstable).astype(jnp.float32)
            use3_f = use3.astype(jnp.float32)
            lp_f = stable_f - use3_f  # stable AND low-pass branch
            d_p0m = -d_s3 * p0 * ivp2
            d_p1m = -d_s3 * p1 * ivp2
            d_p2m = d_s3 * 2.0 * r3h * ivp - dn * ivp2 * d_depth * use3_f
            d_dnm = d_depth * ivp * use3_f
            d_lp = d_depth * lp_f
            d_lpx = d_lp * p0 * ivp  # = d_depth * sx (frozen-s Tw.x grad)
            d_lpy = d_lp * p1 * ivp
            d_tw2_mat = jnp.where(unstable, d_depth, 0.0) + d_lp

            # project the field gradients onto the pixel basis: ONE
            # [3, L] x [7CI, L] MXU dot -> per-instance coefficient grads.
            # The frozen-s rows need only their plain pixel sums — cheaper
            # as VPU row reductions than as two more projection blocks.
            RHS = jnp.concatenate(
                [d_p0m, d_p1m, d_p2m, d_dnm, d_s2, d_s3, d_tw2_mat], axis=0
            )  # [7CI, L]
            PJ = _dot_px_exact_lhs(basis3, RHS)  # [3, 7CI]
            lp_x = jnp.sum(d_lpx, axis=1)[None, :]  # [1, CI]
            lp_y = jnp.sum(d_lpy, axis=1)[None, :]

            def blk(j):
                return PJ[:, j * CI : (j + 1) * CI]  # [3, CI] rows x, y, 1

            pp0, pp1, pp2, pdn, ps2, ps3, ptw2 = (blk(j) for j in range(7))
            row = lambda M, r: M[r : r + 1, :]  # [1, CI]

            gr_ = gr
            A, Bv, C = gr_["A"], gr_["B"], gr_["C"]
            # p_k = A_k x + B_k y + cp_k : x/y rows are the A/B grads, the
            # constant row is the recentered-constant grad
            d_A0, d_B0, d_cp0 = row(pp0, 0), row(pp0, 1), row(pp0, 2)
            d_A1, d_B1, d_cp1 = row(pp1, 0), row(pp1, 1), row(pp1, 2)
            d_A2, d_B2, d_cp2 = row(pp2, 0), row(pp2, 1), row(pp2, 2)
            d_da, d_db, d_dcc = row(pdn, 0), row(pdn, 1), row(pdn, 2)
            # s2: sx x + sy y + s0 - fi/2 r2 ; s0 = lo - (sx^2+sy^2)/(2 fi)
            fi = FILTER_INV_SQUARE
            d_s0 = row(ps2, 2)
            d_sx = row(ps2, 0) - gr_["sx"] * (1.0 / fi) * d_s0
            d_sy = row(ps2, 1) - gr_["sy"] * (1.0 / fi) * d_s0
            d_lo = row(ps3, 2) + d_s0  # lo enters s3 directly and s0 via +lo
            d_tw2 = row(ptw2, 2)

            # recentered constants: cp = C + cx A + cy B
            d_C0, d_A0b, d_B0b = d_cp0, cxf * d_cp0, cyf * d_cp0
            d_C1, d_A1b, d_B1b = d_cp1, cxf * d_cp1, cyf * d_cp1
            d_C2, d_A2b, d_B2b = d_cp2, cxf * d_cp2, cyf * d_cp2
            # dcc = dc + cx da + cy db
            d_da = d_da + cxf * d_dcc
            d_db = d_db + cyf * d_dcc
            d_dc = d_dcc
            # dn coefficient dots: da = A . Tw etc
            Tw = gr_["Tw"]
            d_A = (
                d_A0 + d_A0b + d_da * Tw[0],
                d_A1 + d_A1b + d_da * Tw[1],
                d_A2 + d_A2b + d_da * Tw[2],
            )
            d_B = (
                d_B0 + d_B0b + d_db * Tw[0],
                d_B1 + d_B1b + d_db * Tw[1],
                d_B2 + d_B2b + d_db * Tw[2],
            )
            d_C = (
                d_C0 + d_dc * Tw[0],
                d_C1 + d_dc * Tw[1],
                d_C2 + d_dc * Tw[2],
            )
            d_Tw_dn = (
                # frozen-s low-pass depth grads land on Tw directly
                d_da * A[0] + d_db * Bv[0] + d_dc * C[0] + lp_x,
                d_da * A[1] + d_db * Bv[1] + d_dc * C[1] + lp_y,
                d_da * A[2] + d_db * Bv[2] + d_dc * C[2] + d_tw2,
            )
            # cross-product VJPs: A = Tv x Tw, B = Tw x Tu, C = Tu x Tv
            Tu, Tv = gr_["Tu"], gr_["Tv"]
            d_Tv_a = _cross_rows(Tw, d_A)
            d_Tw_a = _cross_rows(d_A, Tv)
            d_Tw_b = _cross_rows(Tu, d_B)
            d_Tu_b = _cross_rows(d_B, Tw)
            d_Tu_c = _cross_rows(Tv, d_C)
            d_Tv_c = _cross_rows(d_C, Tu)

            k = gcnt[0]
            slot = k % WSLOT

            def grad_copy(sl, b):
                b = pl.multiple_of(b, CI)
                return pltpu.make_async_copy(
                    gbuf.at[sl], dfeats_ref.at[:, pl.ds(b, CI)], g_sem.at[sl]
                )

            @pl.when(k >= WSLOT)
            def _wait_gprev():
                grad_copy(slot, base).wait()  # retires the k-WSLOT copy

            gbuf[slot] = jnp.zeros((f_io, CI), jnp.float32)
            for c in range(3):
                gbuf[slot, F_TU + c, :] = (d_Tu_b[c] + d_Tu_c[c])[0]
                gbuf[slot, F_TV + c, :] = (d_Tv_a[c] + d_Tv_c[c])[0]
                gbuf[slot, F_TW + c, :] = (d_Tw_a[c] + d_Tw_b[c] + d_Tw_dn[c])[0]
            gbuf[slot, F_AX2, :] = d_sx[0]
            gbuf[slot, F_AY2, :] = d_sy[0]
            gbuf[slot, F_LO, :] = d_lo[0]
            dcon = _dot_px(ct7, w, precision=_HI)  # [7, CI]
            if packed_feats:
                # content-grad PAIRS ship pre-packed (the regroup sort uses
                # them as payload columns directly); pairing matches
                # _content_rows: (k, k+4), slot 15's lo half is the
                # grad-free scope row
                gbuf[slot, 12, :] = _pack2_bits(dcon[0:1], dcon[4:5])[0]
                gbuf[slot, 13, :] = _pack2_bits(dcon[1:2], dcon[5:6])[0]
                gbuf[slot, 14, :] = _pack2_bits(dcon[2:3], dcon[6:7])[0]
                gbuf[slot, 15, :] = _pack2_bits(
                    dcon[3:4], jnp.zeros((1, CI), jnp.float32)
                )[0]
            else:
                gbuf[slot, F_CON : F_CON + 7, :] = dcon
            grad_copy(slot, base).start()
            gcnt[0] = k + 1

            # update reverse carries for the next (earlier) chunk (VPU
            # tree sums — see the forward's M=1-matmul note; exact f32)
            T_rev = T_rev * jnp.exp(jnp.sum(lf, axis=0, keepdims=True))
            Bc = Bc + jnp.sum(bterm, axis=0, keepdims=True)
            if full_grads:
                return (
                    T_rev, Bc,
                    Wsuf + jnp.sum(w, axis=0, keepdims=True),
                    MWsuf + jnp.sum(mw, axis=0, keepdims=True),
                    M2Wsuf + jnp.sum(m2w, axis=0, keepdims=True),
                )
            return T_rev, Bc

        zrow = jnp.zeros((1, L), jnp.float32)
        init = (T_final, ct_T * T_final)
        if full_grads:
            init = init + (zrow, zrow, zrow)
        jax.lax.fori_loop(0, used_chunks, chunk_body, init)
        # (non-contributing chunks need no zero-fill: d_feats is zero-aliased)

        # final grid step: drain the last <= WSLOT grad writebacks
        @pl.when(t == n_tiles - 1)
        def _drain_gring():
            k = gcnt[0]

            def body(j, _):
                @pl.when(j < jnp.minimum(k, WSLOT))
                def _():
                    pltpu.make_async_copy(
                        gbuf.at[(k - 1 - j) % WSLOT],
                        dfeats_ref.at[:, pl.ds(pl.multiple_of(start, CI), CI)],
                        g_sem.at[(k - 1 - j) % WSLOT],
                    ).wait()

                return _

            jax.lax.fori_loop(0, WSLOT, body, None)

    return kernel


def tile_blend_backward(
    feats: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    org_x: jnp.ndarray,
    org_y: jnp.ndarray,
    fwd_px: jnp.ndarray,  # [T, 16, L]
    ct_px: jnp.ndarray,  # [T, 16, L]
    full_grads: bool = True,
    interpret: bool | None = None,
    packed_feats: bool = False,
) -> jnp.ndarray:
    """-> d_feats [F_PAD | 16, N_cap] (packed: content-grad bf16 pairs in
    rows 12..15, matching the packed input layout)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    T = starts.shape[0]
    n_cap = feats.shape[1]
    f_io = F_IN_PACKED if packed_feats else F_PAD
    assert feats.shape[0] == f_io, (feats.shape, packed_feats)
    # chunks per tile that contain any contributor, from the forward's
    # n_contrib map (reference reuses the same saved rank,
    # backward.cu:198-204); computed here so the kernel can software-
    # pipeline the NEXT tile's first (= deepest) chunk DMA
    max_ncon = jnp.max(fwd_px[:, O_NCON, :], axis=1)
    n_chunks = (counts + CI - 1) // CI
    used = jnp.minimum(
        (max_ncon.astype(jnp.int32) + CI - 1) // CI, n_chunks
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 16, L), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 16, L), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, f_io, CI), jnp.float32),
            pltpu.VMEM((NFSLOT, f_io, CI), jnp.float32),
            pltpu.VMEM((WSLOT, f_io, CI), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((NFSLOT,)),
            pltpu.SemaphoreType.DMA((WSLOT,)),
        ],
    )
    dfeats_init = jnp.zeros((f_io, n_cap), jnp.float32)
    (d_feats,) = pl.pallas_call(
        _make_bwd_kernel(full_grads, packed_feats),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((f_io, n_cap), jnp.float32)],
        input_output_aliases={8: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, used, org_x, org_y, feats, fwd_px, ct_px, dfeats_init)
    return d_feats


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + Pallas backward via custom_vjp.


@functools.lru_cache(maxsize=None)
def _make_blend_kernel(
    full_grads: bool, packed_feats: bool = False, collect_wmax: bool = True
):
    # full_grads=False is the train-shaped pair: the forward skips the
    # distortion/median channel VALUES and the backward skips their
    # cotangent chains (both provably unused by the reference training loss)
    ts_ = not full_grads

    @jax.custom_vjp
    def blend_kernel(feats, starts, counts, org_x, org_y):
        out_px, wmax = tile_blend_forward(
            feats, starts, counts, org_x, org_y, train_shape=ts_,
            packed_feats=packed_feats, collect_wmax=collect_wmax,
        )
        return out_px, jax.lax.stop_gradient(wmax)

    def fwd(feats, starts, counts, org_x, org_y):
        out_px, wmax = tile_blend_forward(
            feats, starts, counts, org_x, org_y, train_shape=ts_,
            packed_feats=packed_feats, collect_wmax=collect_wmax,
        )
        return (out_px, jax.lax.stop_gradient(wmax)), (
            feats,
            starts,
            counts,
            org_x,
            org_y,
            out_px,
        )

    def bwd(res, cts):
        feats, starts, counts, org_x, org_y, out_px = res
        d_out_px, _d_wmax = cts
        d_feats = tile_blend_backward(
            feats, starts, counts, org_x, org_y, out_px, d_out_px,
            full_grads=full_grads, packed_feats=packed_feats,
        )
        return d_feats, None, None, None, None

    blend_kernel.defvjp(fwd, bwd)
    return blend_kernel


def blend_kernel(
    feats, starts, counts, org_x, org_y,
    full_grads: bool = True, packed_feats: bool = False,
    collect_wmax: bool = True,
):
    """Differentiable tile sweep. full_grads=False is the train-shaped
    backward: statically drops the distortion/M1/M2/median cotangent chains
    (provably zero for the reference training loss with depth_ratio=0);
    packed_feats consumes the 16-row bf16-content slab layout;
    collect_wmax=False drops the per-chunk wmax writeback (inference)."""
    return _make_blend_kernel(full_grads, packed_feats, collect_wmax)(
        feats, starts, counts, org_x, org_y
    )
