"""Pallas TPU kernel: cubemap texel-gradient accumulation via one-hot matmuls.

The deferred-reflection pass samples the learned cubemap at every pixel
(4 bilinear taps each); its backward must reduce per-tap gradients into the
[6, L, L, C] texture. The reference does this with atomicAdd
(cubemapencoder/src/cubemapencoder.cu backward); the previous TPU
formulation sorted 4*H*W tap indices and segment-summed (~90 ms at 1080p).
This kernel turns texel membership into MXU matmuls instead — deterministic,
no sort, no scatter:

- Texels are factored as (row = face*L + y) x (column-channel j = x*C + c):
  d_tex2[row, j] = sum_i A[i, row] * U[i, j] over taps/pixels i, i.e. ONE
  [R, BN] x [BN, LC] matmul per block of BN pixels, accumulated in VMEM
  across the whole grid (the output block index map is constant, so the
  accumulator lives in VMEM until the final writeback).
- Interior pixels (the vast majority) use the SEPARABLE fast path: their 4
  taps share rows {r0, r1} and columns {c0, c1} with product weights, so one
  matmul with A = (1-wr)*1[r0] + wr*1[r1] and U = ((1-wc)*1[c0] + wc*1[c1])*g
  covers all 4 taps at 1x cost.
- Pixels whose taps cross a face edge (seamless filtering, including the
  3-tap corner average) take a generic 4-tap path: per tap, A_t = w_t*1[row_t],
  U_t = 1[col_t]*g. Blocks with no edge pixels skip it entirely (scalar
  prefetch flag) — edge pixels cluster along face-boundary curves, so most
  blocks skip.
- ROW WINDOWING: in tile order the taps of a block's (separable) pixels
  cluster into a narrow band of texture rows, so the separable matmul runs
  against a WR-row window at a per-block base row (scalar prefetch) instead
  of the full R=6L rows — 3x fewer one-hot cells at L=128. Blocks whose
  separable rows span wider than the window are demoted wholesale to the
  generic full-width path (their pixels' 2x2 weights are reconstructed from
  the stored kx/ky).
- Matmul precision: manual bf16 hi/lo cross products (3 single-pass MXU
  matmuls: hi*hi + hi*lo + lo*hi, relative error ~2^-16) — half the passes
  of HIGHEST with texel-grad-irrelevant rounding; the CPU interpret path
  (what the pytest oracle checks) is exact f32 regardless.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 512  # pixels per block
WR = 256  # separable-path row window (multiple of 8)

# int-pack rows
I_R0, I_R1, I_C0, I_C1 = 0, 1, 2, 3
I_TROW = 4  # 4:8
I_TCOL = 8  # 8:12
NI = 16
# float-pack rows
F_WR, F_WC, F_MSEP = 0, 1, 2
F_TW = 3  # 3:7
F_G = 7  # 7:7+C
NF = 16


def _mm3(A, U):
    """A^T @ U via manual bf16 hi/lo cross terms: 3 single-pass MXU matmuls
    (~2^-16 relative error, vs HIGHEST's 6 passes)."""
    def sp(x):
        h = x.astype(jnp.bfloat16)
        l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        return h, l

    Ah, Al = sp(A)
    Uh, Ul = sp(U)
    d = lambda a, u: jax.lax.dot_general(
        a, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return d(Ah, Uh) + d(Ah, Ul) + d(Al, Uh)


def _tap_accum_kernel(flags_ref, rbase_ref, ints_ref, floats_ref, out_ref,
                      *, R, LC, LCp, C, wr_rows):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        out_ref[:] = jnp.zeros((R, LCp), jnp.float32)

    ints = jnp.transpose(ints_ref[...])  # [BN, NI] i32
    floats = jnp.transpose(floats_ref[...])  # [BN, NF] f32

    def icol(k):
        return ints[:, k : k + 1]  # [BN, 1]

    def fcol(k):
        return floats[:, k : k + 1]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, R), 1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, LCp), 1)
    jdivC = j_iota // C  # column (x) of lane j
    jmodC = j_iota - jdivC * C

    # g3[i, j] = g[i, j % C] for j < LC else 0
    g3 = jnp.zeros((BN, LCp), jnp.float32)
    for c in range(C):
        g3 = g3 + jnp.where((jmodC == c) & (j_iota < LC), fcol(F_G + c), 0.0)

    # separable path against the WR-row window at rbase (wrapper guarantees
    # every separable pixel's r0/r1 falls inside it)
    rb = pl.multiple_of(rbase_ref[b], 8)
    m = fcol(F_MSEP)
    wr = fcol(F_WR)
    wc = fcol(F_WC)
    row_local = jax.lax.broadcasted_iota(jnp.int32, (BN, wr_rows), 1) + rb
    A = (
        jnp.where(row_local == icol(I_R0), (1.0 - wr) * m, 0.0)
        + jnp.where(row_local == icol(I_R1), wr * m, 0.0)
    )
    B3 = (
        jnp.where(jdivC == icol(I_C0), 1.0 - wc, 0.0)
        + jnp.where(jdivC == icol(I_C1), wc, 0.0)
    )
    out_ref[pl.ds(rb, wr_rows), :] += _mm3(A, B3 * g3)

    # generic full-width path: per-tap one-hots, only for blocks containing
    # edge pixels or a too-wide separable row span
    @pl.when(flags_ref[b] != 0)
    def _generic():
        for t in range(4):
            At = jnp.where(row_iota == icol(I_TROW + t), fcol(F_TW + t), 0.0)
            Ut = jnp.where(jdivC == icol(I_TCOL + t), g3, 0.0)
            out_ref[:] += _mm3(At, Ut)


@functools.partial(jax.jit, static_argnames=("L", "C", "interpret"))
def cubemap_tap_accumulate(
    g: jnp.ndarray,  # [N, C] output cotangents per pixel
    tap_row: jnp.ndarray,  # [4, N] i32 row (face*L + y) per tap
    tap_col: jnp.ndarray,  # [4, N] i32 column (x) per tap
    tap_w: jnp.ndarray,  # [4, N] f32 tap weights, ZERO for separable pixels
    sep_r0: jnp.ndarray,  # [N] i32
    sep_r1: jnp.ndarray,
    sep_c0: jnp.ndarray,
    sep_c1: jnp.ndarray,
    sep_wr: jnp.ndarray,  # [N] f32
    sep_wc: jnp.ndarray,
    sep_m: jnp.ndarray,  # [N] f32 1 = separable pixel, 0 = generic (edge)
    L: int,
    C: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """-> d_tex [6*L*L, C] (flat texel rows, matching texture.transpose(
    0,2,3,1).reshape(-1, C))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N = g.shape[0]
    R = 6 * L
    LC = L * C
    LCp = ((LC + 127) // 128) * 128

    n_pad = (-N) % BN
    if n_pad:
        zi = lambda a: jnp.concatenate([a, jnp.zeros((n_pad,), a.dtype)])
        zi4 = lambda a: jnp.concatenate([a, jnp.zeros((4, n_pad), a.dtype)], axis=1)
        g = jnp.concatenate([g, jnp.zeros((n_pad, C), g.dtype)])
        tap_row, tap_col, tap_w = zi4(tap_row), zi4(tap_col), zi4(tap_w)
        sep_r0, sep_r1 = zi(sep_r0), zi(sep_r1)
        sep_c0, sep_c1 = zi(sep_c0), zi(sep_c1)
        sep_wr, sep_wc, sep_m = zi(sep_wr), zi(sep_wc), zi(sep_m)
    Np = N + n_pad
    nb = Np // BN

    # per-block separable row window: blocks whose separable rows span more
    # than WR are demoted wholesale to the generic path (their pixels' 2x2
    # tap weights reconstructed from the stored kx/ky products)
    sep_mask = sep_m.reshape(nb, BN) >= 0.5
    r0b = sep_r0.reshape(nb, BN)
    r1b = sep_r1.reshape(nb, BN)
    rmin = jnp.min(jnp.where(sep_mask, jnp.minimum(r0b, r1b), R), axis=1)
    rmax = jnp.max(jnp.where(sep_mask, jnp.maximum(r0b, r1b), 0), axis=1)
    wr_rows = min(WR, R)  # small cubemaps: window = the whole row range
    wide = rmax - rmin > wr_rows - 8  # window (8-aligned base) can't cover
    # only pixels that WERE separable get reconstructed 2x2 weights — edge
    # pixels in a demoted block keep their true (seam/corner) tap weights
    demote = jnp.repeat(wide, BN)[:Np] & (sep_m >= 0.5)
    sep_m = jnp.where(demote, 0.0, sep_m)
    # reconstructed interior 2x2 weights (tap order t00, t01=x+1, t10=y+1,
    # t11; sep_wr = ky, sep_wc = kx — matches _w4_terms with vert=0)
    a_, b_ = 1.0 - sep_wc, 1.0 - sep_wr
    w_interior = jnp.stack(
        [b_ * a_, b_ * sep_wc, sep_wr * a_, sep_wr * sep_wc]
    )  # [4, Np]
    tap_w = jnp.where(demote[None, :], w_interior, tap_w)
    rbase = jnp.clip((rmin // 8) * 8, 0, max(R - wr_rows, 0)).astype(jnp.int32)

    zi_row = jnp.zeros((Np,), jnp.int32)
    zf_row = jnp.zeros((Np,), jnp.float32)
    ints = jnp.stack(
        [sep_r0, sep_r1, sep_c0, sep_c1,
         tap_row[0], tap_row[1], tap_row[2], tap_row[3],
         tap_col[0], tap_col[1], tap_col[2], tap_col[3],
         zi_row, zi_row, zi_row, zi_row]
    )  # [NI, Np]
    gT = g.T
    frows = [sep_wr, sep_wc, sep_m, tap_w[0], tap_w[1], tap_w[2], tap_w[3]]
    frows += [gT[c] for c in range(C)]
    frows += [zf_row] * (NF - len(frows))
    floats = jnp.stack(frows)  # [NF, Np]
    # block needs the generic path iff any of its pixels is non-separable
    flags = jnp.max(
        (sep_m.reshape(nb, BN) < 0.5).astype(jnp.int32), axis=1
    )

    kern = functools.partial(
        _tap_accum_kernel, R=R, LC=LC, LCp=LCp, C=C, wr_rows=wr_rows
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((NI, BN), lambda b, *_: (0, b)),
            pl.BlockSpec((NF, BN), lambda b, *_: (0, b)),
        ],
        out_specs=pl.BlockSpec((R, LCp), lambda b, *_: (0, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, LCp), jnp.float32),
        interpret=interpret,
    )(flags, rbase, ints, floats)
    # [R, LCp] -> [R, L, C] -> [6*L*L, C]
    return out[:, :LC].reshape(R, L, C).reshape(R * L, C)


def supported_resolution(L: int, C: int) -> bool:
    """VMEM budget check: accumulator [6L, ceil(LC/128)*128] f32 plus the
    [BN, 6L] one-hot must fit comfortably (v5e VMEM ~16 MB)."""
    R = 6 * L
    LCp = ((L * C + 127) // 128) * 128
    acc_bytes = R * LCp * 4
    a_bytes = BN * R * 4
    return C <= 8 and acc_bytes + 2 * a_bytes < 10 * 1024 * 1024
