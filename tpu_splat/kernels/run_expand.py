"""Pallas TPU kernel: expand per-run tables to per-slot rows (run "decode").

The binning expansion ("duplicateWithKeys", rasterizer_impl.cu:70-111)
maps every emission slot i in [0, total) to its covering run r (the depth
rank with offsets[r] <= i < offsets[r+1]) and needs that run's table row
(rect coords, gaussian id, ...) plus the linear index j = i - offsets[r].
The XLA formulations are either a [cap, K] row gather (per-row-latency
bound: ~16 ms for K=2 at 4M slots on v5e) or K hold-last associative scans
(~1.2 ms each plus scatters). This kernel does the whole decode in ONE
bandwidth-bound pass by exploiting the run structure:

- every run in the emitting prefix has length >= 1, so any 128-slot
  window of emission space spans at most 128 CONSECUTIVE runs starting at
  rank_at(window start). Those per-sub-block rank starts (r0_sub, one
  mark-scatter + cumsum + stride slice outside the kernel) arrive via an
  SMEM block; per grid step ONE DMA fetches the table / offsets windows
  covering all SUB sub-blocks;
- per sub-block: onehot[k, j] = (off[r+k] <= i_j < off[r+k+1]) over its
  136-row rank window (an 8-aligned dynamic sublane slice of the step
  slab), then rows_out = onehot^T @ table_window on the MXU (exact-01
  3-way bf16 split: exact for f32 payloads and integers up to ~2^23
  stored as f32); j = i - onehot^T @ offsets rides in the last column.

Slots past the last run (i >= total) decode to all-zero rows with j = i
(callers mask by slot validity, as with the gather formulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32  # 128-slot sub-blocks per grid step
BLK = SUB * 128  # slots per grid step
WIN = BLK + 136  # table rows per step window (rank span <= BLK, +align slack)
KMAX = 8  # table columns (last column carries j)


def _split3(x):
    h = x.astype(jnp.bfloat16)
    r1 = x - h.astype(jnp.float32)
    m = r1.astype(jnp.bfloat16)
    l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot01_k(onehot, b):
    """[R, M] x [R, K] -> [M, K] (contract dim 0) with exact-01 3-way split."""
    a16 = onehot.astype(jnp.bfloat16)
    out = None
    for part in _split3(b):
        d = jax.lax.dot_general(
            a16, part, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _run_expand_kernel(
    r0_step_ref,  # [S] i32 scalar prefetch: 8-aligned window base rank
    r0_sub_ref,  # [S * SUB] i32 scalar prefetch: rank at each sub-block start
    table_ref,  # [Pp, KMAX] f32 ANY
    off_lo_ref,  # [Pp, 1] i32 ANY (offsets)
    off_hi_ref,  # [Pp, 1] i32 ANY (offsets shifted by one)
    out_ref,  # block (BLK, KMAX) f32: expanded rows; col KMAX-1 = j
    tslab,  # VMEM (WIN, KMAX) f32
    lslab,  # VMEM (WIN, 1) i32
    hslab,  # VMEM (WIN, 1) i32
    t_sem,
    l_sem,
    h_sem,
):
    s = pl.program_id(0)
    base = r0_step_ref[s]

    tc = pltpu.make_async_copy(table_ref.at[pl.ds(base, WIN), :], tslab, t_sem)
    lc = pltpu.make_async_copy(off_lo_ref.at[pl.ds(base, WIN), :], lslab, l_sem)
    hc = pltpu.make_async_copy(off_hi_ref.at[pl.ds(base, WIN), :], hslab, h_sem)
    tc.start()
    lc.start()
    hc.start()
    lc.wait()
    hc.wait()
    tc.wait()

    i_base = s * BLK
    for b in range(SUB):
        i0 = i_base + b * 128
        rel8 = ((r0_sub_ref[s * SUB + b] - base) // 8) * 8  # dynamic, 8-aligned
        lo = lslab[pl.ds(rel8, 136), :]  # [136, 1] i32
        hi = hslab[pl.ds(rel8, 136), :]
        ii = i0 + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)  # [1, 128]
        onehot = ((lo <= ii) & (ii < hi)).astype(jnp.float32)  # [136, 128]
        tw = tslab[pl.ds(rel8, 136), :]  # [136, KMAX]
        rows = _dot01_k(onehot, tw)  # [128, KMAX]
        osel = _dot01_k(onehot, lo.astype(jnp.float32))  # [128, 1]
        j = ii.reshape(128, 1).astype(jnp.float32) - osel
        rows = jnp.concatenate([rows[:, : KMAX - 1], j], axis=1)
        out_ref[pl.ds(b * 128, 128), :] = rows


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def run_expand(
    table: jnp.ndarray,  # [P, K] f32 per-run rows (ints as exact f32 < 2^23)
    offsets: jnp.ndarray,  # [P] i32 ascending exclusive run starts
    total: jnp.ndarray,  # [] i32 total slots (terminates the last run)
    r0_sub: jnp.ndarray,  # [n_out // 128] i32 rank at each 128-slot boundary
    n_out: int,  # static slot capacity (multiple of BLK)
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (rows [n_out, K] f32, j [n_out] i32). rows[i] = table[run(i)],
    j[i] = i - offsets[run(i)]; zero rows / j = i past the last run.

    Requires: every run below `total` has length >= 1 (depth ranks with
    zero-area Gaussians pushed past the emitting prefix — what
    bin_gaussians' argsort produces), and r0_sub[k] = the rank covering
    slot 128*k (e.g. cumsum-of-marks sliced at stride 128)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    P_, K = table.shape
    if K > KMAX - 1:
        raise ValueError(f"run_expand supports K <= {KMAX - 1}, got {K}")
    if n_out % BLK:
        raise ValueError(f"n_out must be a multiple of {BLK}, got {n_out}")
    S = n_out // BLK

    table = table.astype(jnp.float32)
    if K < KMAX:
        table = jnp.pad(table, ((0, 0), (0, KMAX - K)))
    pad_rows = WIN + 16
    table = jnp.pad(table, ((0, pad_rows), (0, 0)))
    offp = jnp.concatenate(
        [offsets.astype(jnp.int32), jnp.full((pad_rows,), 1 << 30, jnp.int32)]
    )
    # the sentinel `total` terminates the last real run; rows at and past
    # P_ keep offset 2^30 so they never match
    offp = offp.at[P_].set(jnp.asarray(total, jnp.int32))
    off_lo = offp[:-1]
    off_hi = offp[1:]

    r0 = jnp.clip(r0_sub.astype(jnp.int32), 0, P_)
    r0_step = (r0[::SUB] // 8) * 8
    r0_pad = ((-r0.shape[0]) % SUB)
    if r0_pad:
        raise ValueError("r0_sub length must be n_out // 128")

    rows = pl.pallas_call(
        _run_expand_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BLK, KMAX), lambda s, *_: (s, 0)),
            scratch_shapes=[
                pltpu.VMEM((WIN, KMAX), jnp.float32),
                pltpu.VMEM((WIN, 1), jnp.int32),
                pltpu.VMEM((WIN, 1), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, KMAX), jnp.float32),
        interpret=interpret,
    )(
        r0_step.astype(jnp.int32),
        r0,
        table,
        off_lo[:, None],
        off_hi[:, None],
    )
    return rows[:, :K], rows[:, KMAX - 1].astype(jnp.int32)
