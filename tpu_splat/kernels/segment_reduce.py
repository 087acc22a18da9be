"""Pallas TPU kernel: dense segmented row-sum over contiguous runs.

Computes out[r] = sum over rows j in [starts[r], ends[r]) of rows_T[:, j],
for P segments whose bounds are ascending (the runs tile a prefix of the
row axis, possibly with gaps). This is the reduction behind every gather
transpose in the framework (per-Gaussian grads from per-instance rows,
cubemap texel grads from per-tap rows) — the XLA formulation
(core/segops.segment_sum_sorted: blocked cumsums + bound gathers) costs
~100 ms at 4M x 24 on a v5e because cumsum makes log(N) full passes and the
bound gathers are latency-bound; this kernel reads each row ONCE and turns
segment membership into an MXU matmul:

- grid over blocks of RB segments; each program sweeps the chunk range
  covering [starts[r0], ends[r0+RB-1]) with an 8-deep ring of async copies
  (the per-chunk matmul is too small to hide DMA latency behind compute,
  so throughput comes from DMA queue depth);
- per chunk: onehot[j, r] = starts[r] <= g_j < ends[r] (a [CI, RB] compare
  against the block's bound vectors), accum += rows_chunk @ onehot on the
  MXU in f32;
- deterministic (pure dense ops, no atomics), exact per-segment sums (each
  row is added exactly once — no cumsum cancellation).

Feature-major [F, N] layout keeps lanes on the (large) row axis; callers
pad F to a multiple of 8 sublanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 512  # segments per program (out block width)
CI = 512  # rows per chunk
NSLOT = 8  # DMA ring depth


FP = 32  # packed feature width (k = 128 // FP rows per packed 128-lane row)


def _segsum_rows_kernel(starts_ref, ends_ref, packed_ref, out_ref, accum, slab, sem):
    k = 128 // FP  # rows packed per 128-lane row
    pr = CI // k  # packed rows per chunk
    starts = starts_ref[:, 0].reshape(RB, 1)
    ends = ends_ref[:, 0].reshape(RB, 1)
    lo = starts_ref[0, 0]
    hi = ends_ref[RB - 1, 0]
    n_packed = packed_ref.shape[0]

    c0 = lo // CI
    c1 = jnp.minimum(pl.cdiv(hi, CI), (n_packed * k) // CI)
    n_chunks = jnp.maximum(c1 - c0, 0)

    accum[:] = jnp.zeros((RB, FP), jnp.float32)

    def dma(i):
        base = pl.multiple_of((c0 + i) * pr, pr)
        slot = i % NSLOT
        return pltpu.make_async_copy(
            packed_ref.at[pl.ds(base, pr), :], slab.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prime():
        def prime_body(i, _):
            @pl.when(i < n_chunks)
            def _():
                dma(i).start()

            return _

        jax.lax.fori_loop(0, NSLOT, prime_body, None)

    def body(i, _):
        dma(i).wait()
        base = (c0 + i) * CI
        chunk = slab[i % NSLOT]  # [pr, 128]: packed row p = rows k*p .. k*p+k-1
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (pr, 1), 0)
        # sub-phase s: rows j = base + k*p + s live in lanes [FP*s, FP*s+FP)
        for s in range(k):
            g = base + k * p_iota + s  # [pr, 1]
            member = ((g >= starts.reshape(1, RB)) & (g < ends.reshape(1, RB))).astype(
                jnp.float32
            )  # [pr, RB]
            # HIGHEST: default MXU precision is bf16 inputs — rounds grad rows
            accum[:] += jax.lax.dot_general(
                member,
                chunk[:, FP * s : FP * (s + 1)],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        @pl.when(i + NSLOT < n_chunks)
        def _next():
            dma(i + NSLOT).start()

        return _

    jax.lax.fori_loop(0, n_chunks, body, None)
    out_ref[:] = accum[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_sum_rows(
    rows: jnp.ndarray,  # [N, F] row-major rows, F <= 32
    starts: jnp.ndarray,  # [P] ascending segment starts
    ends: jnp.ndarray,  # [P] segment ends (ends[r] <= starts[r+1])
    interpret: bool | None = None,
) -> jnp.ndarray:
    """-> [P, F] per-segment sums, row-major in and out.

    Same contract as segment_sum_ranges but consumes the natural [N, F]
    gather layout directly. NOTE: measured on v5e, the [N,F]->[F,N]
    transpose this avoids is FREE (XLA folds it into operand layouts), so
    prefer segment_sum_ranges when the producer is already a gather; this
    variant exists for producers whose row-major layout is forced (e.g.
    kernel outputs consumed without an intervening gather).
    Mosaic DMA slices must be 128-lane aligned, so rows are zero-padded to
    FP=32 features and viewed as [N/4, 128] (4 rows per packed row); the
    kernel runs 4 sub-phase membership matmuls per chunk, one per row
    phase s: accum[RB, FP] += member_s[pr, RB]^T @ chunk[:, 32s:32s+32]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, F = rows.shape
    if F > FP:
        raise ValueError(f"segment_sum_rows supports F <= {FP}, got {F}")
    P_ = starts.shape[0]
    k = 128 // FP
    n_pad = (-N) % CI
    rows = rows.astype(jnp.float32)
    if n_pad or F != FP:
        rows = jnp.pad(rows, ((0, n_pad), (0, FP - F)))
    packed = rows.reshape((N + n_pad) // k, 128)
    p_pad = (-P_) % RB
    if p_pad:
        starts = jnp.concatenate([starts, jnp.full(p_pad, N + n_pad, jnp.int32)])
        ends = jnp.concatenate([ends, jnp.full(p_pad, N + n_pad, jnp.int32)])
    Pp = P_ + p_pad
    clamp = lambda a: jnp.clip(a, 0, N + n_pad).astype(jnp.int32)

    out = pl.pallas_call(
        _segsum_rows_kernel,
        grid=(Pp // RB,),
        in_specs=[
            pl.BlockSpec((RB, 1), lambda i: (i, 0)),
            pl.BlockSpec((RB, 1), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RB, FP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, FP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RB, FP), jnp.float32),
            pltpu.VMEM((NSLOT, CI // k, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        interpret=interpret,
    )(clamp(starts)[:, None], clamp(ends)[:, None], packed)
    return out[:P_, :F]


def _segsum_kernel(starts_ref, ends_ref, rows_ref, out_ref, accum, slab, sem,
                   unpack=None):
    F = accum.shape[0]
    starts = starts_ref[0, :].reshape(1, RB)
    ends = ends_ref[0, :].reshape(1, RB)
    lo = starts_ref[0, 0]
    hi = ends_ref[0, RB - 1]
    n_cap = rows_ref.shape[1]

    c0 = lo // CI
    c1 = jnp.minimum(pl.cdiv(hi, CI), n_cap // CI)
    n_chunks = jnp.maximum(c1 - c0, 0)

    accum[:] = jnp.zeros((F, RB), jnp.float32)

    def dma(i):
        base = pl.multiple_of((c0 + i) * CI, CI)
        slot = i % NSLOT
        return pltpu.make_async_copy(
            rows_ref.at[:, pl.ds(base, CI)], slab.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prime():
        def prime_body(i, _):
            @pl.when(i < n_chunks)
            def _():
                dma(i).start()

            return _

        jax.lax.fori_loop(0, NSLOT, prime_body, None)

    def body(i, _):
        dma(i).wait()
        base = (c0 + i) * CI
        g = base + jax.lax.broadcasted_iota(jnp.int32, (CI, 1), 0)
        onehot = ((g >= starts) & (g < ends)).astype(jnp.float32)  # [CI, RB]
        chunk = slab[i % NSLOT]
        if unpack is not None:
            # packed input: halve the HBM read by shipping bitcast-packed
            # bf16-pair words and expanding to f32 rows in VMEM (pure i32
            # bit ops — see tile_blend's regroup unpack)
            chunk = unpack(chunk)
        # HIGHEST: default MXU precision is bf16 inputs — rounds grad rows
        accum[:] += jnp.dot(
            chunk,
            onehot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(i + NSLOT < n_chunks)
        def _next():
            dma(i + NSLOT).start()

        return _

    jax.lax.fori_loop(0, n_chunks, body, None)
    out_ref[:] = accum[:]


@functools.partial(
    jax.jit, static_argnames=("interpret", "unpack", "f_out")
)
def segment_sum_ranges(
    rows_T: jnp.ndarray,  # [F, N] feature-major rows (N multiple of CI)
    starts: jnp.ndarray,  # [P] ascending segment starts
    ends: jnp.ndarray,  # [P] segment ends (ends[r] <= starts[r+1])
    interpret: bool | None = None,
    unpack=None,  # static: [F_in, CI] chunk -> [f_out, CI] f32 (in VMEM)
    f_out: int | None = None,
) -> jnp.ndarray:
    """-> [F(_out), P] per-segment sums. Requires ascending, non-overlapping
    [start, end) runs (the natural shape of sorted-group reductions).
    With `unpack`, rows_T carries packed words (e.g. bitcast bf16 pairs)
    expanded chunk-by-chunk in VMEM — the HBM read halves."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    F, N = rows_T.shape
    P_ = starts.shape[0]
    Fo = F if unpack is None else f_out
    f_pad = (-F) % 8
    fo_pad = (-Fo) % 8
    n_pad = (-N) % CI
    p_pad = (-P_) % RB
    if f_pad:
        rows_T = jnp.concatenate(
            [rows_T, jnp.zeros((f_pad, rows_T.shape[1]), rows_T.dtype)]
        )
    if n_pad:
        rows_T = jnp.concatenate(
            [rows_T, jnp.zeros((rows_T.shape[0], n_pad), rows_T.dtype)], axis=1
        )
    if p_pad:
        starts = jnp.concatenate([starts, jnp.full(p_pad, N + n_pad, jnp.int32)])
        ends = jnp.concatenate([ends, jnp.full(p_pad, N + n_pad, jnp.int32)])
    Fp = F + f_pad
    Fop = Fo + fo_pad
    Pp = P_ + p_pad
    clamp = lambda a: jnp.clip(a, 0, N + n_pad).astype(jnp.int32)
    ker = _segsum_kernel
    if unpack is not None:
        pad_rows = fo_pad

        def ker(s_ref, e_ref, r_ref, o_ref, accum, slab, sem,
                _u=unpack, _pr=pad_rows):
            def up(chunk):
                rows = _u(chunk)
                if _pr:
                    rows = jnp.concatenate(
                        [rows, jnp.zeros((_pr, rows.shape[1]), rows.dtype)]
                    )
                return rows

            return _segsum_kernel(
                s_ref, e_ref, r_ref, o_ref, accum, slab, sem, unpack=up
            )

    out = pl.pallas_call(
        ker,
        grid=(Pp // RB,),
        in_specs=[
            pl.BlockSpec((1, RB), lambda i: (0, i)),
            pl.BlockSpec((1, RB), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Fop, RB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((Fop, Pp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Fop, RB), jnp.float32),
            pltpu.VMEM(
                (NSLOT, Fp, CI),
                rows_T.dtype if unpack is not None else jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        interpret=interpret,
    )(
        clamp(starts)[None],
        clamp(ends)[None],
        rows_T if unpack is not None else rows_T.astype(jnp.float32),
    )
    return out[:Fo, :P_]
