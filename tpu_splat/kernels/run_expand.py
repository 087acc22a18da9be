"""Pallas TPU kernel: expand per-run tables to per-slot rows (run "decode").

The binning expansion ("duplicateWithKeys", rasterizer_impl.cu:70-111)
maps every emission slot i in [0, total) to its covering run r (the depth
rank with offsets[r] <= i < offsets[r+1]) and needs that run's table row
(rect coords, gaussian id, conic params, ...) plus the linear index
j = i - offsets[r]. The XLA formulations are either a [cap, K] row gather
(per-row-latency bound: ~16 ms for K=2 at 4M slots on v5e) or K hold-last
associative scans (~1.2 ms each plus scatters). This kernel does the whole
decode in ONE bandwidth-bound pass by exploiting the run structure:

- every run in the emitting prefix has length >= 1, so any 128-slot
  window of emission space spans at most 128 CONSECUTIVE runs starting at
  rank_at(window start); those per-sub-block rank starts (r0_sub, one
  mark-scatter + cumsum + stride slice outside) ride scalar prefetch;
- Mosaic DMAs want 128-lane-aligned slabs, so the table is LANE-PACKED:
  k = 128/kmax logical rows per physical row ([Ppk, 128] f32), with the
  run offsets riding as the table's last two columns (off_lo, off_hi) so
  every in-kernel lane slice is static. One DMA per grid step fetches the
  window covering all SUB sub-blocks;
- per sub-block and phase s in [0, k): onehot_s[p, j] =
  (off_lo[p,s] <= i_j < off_hi[p,s]) over an 8-aligned dynamic SUBLANE
  slice of the step slab, then rows += onehot_s^T @ slab_s on the MXU
  (exact-01 3-way bf16 split: bit-exact for f32 payloads and integers
  < 2^23 stored as f32). Runs match uniquely (offsets ascending), so
  window slack rows are harmless. j = i - sum_s onehot_s^T @ off_lo_s.

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
WIN = BLK + 512  # logical rows per step window (BLK+127 span + subw*k slack)


def _split3(x):
    h = x.astype(jnp.bfloat16)
    r1 = x - h.astype(jnp.float32)
    m = r1.astype(jnp.bfloat16)
    l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot01_k(vals, onehot):
    """[R, K] x [R, M] -> [K, M] (contract dim 0; onehot is exact 0/1) with
    the exact-01 3-way bf16 split of the f32 values."""
    a16 = onehot.astype(jnp.bfloat16)
    out = None
    for part in _split3(vals):
        d = jax.lax.dot_general(
            part, a16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _run_expand_kernel(
    r0_step_ref,  # [S] i32 scalar prefetch: 128-aligned window base rank
    r0_sub_ref,  # [S * SUB] i32 scalar prefetch: rank at each sub-block start
    packed_ref,  # [Ppk, 128] f32 ANY: lane-packed table (k rows / phys row)
    out_ref,  # block (kmax, BLK) f32 feature-major; row kmax-1 = j
    tslab,  # VMEM (WINP, 128) f32
    vcat,  # VMEM (k*subw, kmax) f32: logically-unpacked sub-window
    ohcat,  # VMEM (k*subw, 128) f32: onehot, phase-major row order
    t_sem,
    *,
    kmax: int,
    subw: int,
):
    k = 128 // kmax
    winp = WIN // k
    s = pl.program_id(0)
    base = r0_step_ref[s]  # logical, multiple of 128
    pbase = base // k  # physical, multiple of 128//k >= 8

    cp = pltpu.make_async_copy(
        packed_ref.at[pl.ds(pl.multiple_of(pbase, 8), winp), :], tslab, t_sem
    )
    cp.start()
    cp.wait()

    i_base = s * BLK

    def sub_block(b, _):
        # fori_loop (not an unrolled Python loop): 32 unrolled sub-blocks'
        # temporaries blow the 16M scoped-vmem stack limit
        i0 = i_base + b * 128
        rel = r0_sub_ref[s * SUB + b] - base  # logical, >= 0
        rp8 = ((rel // k) // 8) * 8  # 8-aligned physical sub-window start
        sub = tslab[pl.ds(rp8, subw), :]  # [subw, 128]
        ii = i0 + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        iif = ii.astype(jnp.float32)
        # phase-major concatenation into scratch, then ONE batched MXU dot
        # (per-phase dots are 48 tiny MXU launches per sub-block — launch
        # overhead dominates; measured 111 ms for the whole binning)
        for ph in range(k):
            lo = sub[:, ph * kmax + kmax - 2 : ph * kmax + kmax - 1]
            hi = sub[:, ph * kmax + kmax - 1 : ph * kmax + kmax]
            ohcat[ph * subw : (ph + 1) * subw, :] = (
                (lo <= iif) & (iif < hi)
            ).astype(jnp.float32)
            vcat[ph * subw : (ph + 1) * subw, :] = sub[
                :, ph * kmax : (ph + 1) * kmax
            ]
        rows_T = _dot01_k(vcat[:], ohcat[:])  # [kmax, 128]
        # off_lo IS table column kmax-2, so the selected run start is
        # already in rows_T — no second dot needed
        j = iif - rows_T[kmax - 2 : kmax - 1, :]
        out_ref[:, pl.ds(b * 128, 128)] = jnp.concatenate(
            [rows_T[: kmax - 1, :], j], axis=0
        )
        return _

    jax.lax.fori_loop(0, SUB, sub_block, None)


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def run_expand(
    table: jnp.ndarray,  # [P, K] f32 per-run rows (ints as exact f32 < 2^23)
    offsets: jnp.ndarray,  # [P] i32 ascending exclusive run starts (< 2^23)
    total: jnp.ndarray,  # [] i32 total slots (terminates the last run)
    r0_sub: jnp.ndarray,  # [n_out // 128] i32 rank at each 128-slot boundary
    n_out: int,  # static slot capacity (multiple of BLK)
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (rows [K, n_out] f32 FEATURE-MAJOR, j [n_out] i32).
    rows[:, i] = table[run(i)], j[i] = i - offsets[run(i)]; zero rows /
    j = i past the last run.

    Requires: every run below `total` has length >= 1 (depth ranks with
    zero-area Gaussians pushed past the emitting prefix — what
    bin_gaussians' argsort produces), and r0_sub[m] = the rank covering
    slot 128*m (e.g. cumsum-of-marks sliced at stride 128)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # run decode is discrete binning structure (like the reference's
    # duplicateWithKeys): non-differentiable by design. Cutting tangent
    # flow here keeps pallas_call (which has no AD rule) off grad traces.
    table = jax.lax.stop_gradient(table)
    P_, K = table.shape
    kmax = 8 if K <= 6 else 16
    if K > kmax - 2:
        raise ValueError(f"run_expand supports K <= 14, got {K}")
    if n_out % BLK:
        raise ValueError(f"n_out must be a multiple of {BLK}, got {n_out}")
    if n_out >= 1 << 23:
        # offsets ride as exact f32 integers; past 2^23 the decode would
        # silently mismatch runs (capacity growth doubles max_instances, so
        # an 8.4M cap is reachable — fail loudly instead)
        raise ValueError(
            f"run_expand capacity {n_out} >= 2^23: run offsets are exact "
            "f32 integers only below 8388608"
        )
    S = n_out // BLK
    k = 128 // kmax
    subw = 8 * -(-(136 // k + 9) // 8)  # 8-aligned sub-window phys rows

    # augment: user cols, zero pad, off_lo, off_hi (f32-exact ints)
    offsets = offsets.astype(jnp.int32)
    off_lo = jnp.minimum(offsets, 1 << 23).astype(jnp.float32)
    off_hi = jnp.concatenate(
        [offsets[1:], jnp.full((1,), 1 << 23, jnp.int32)]
    )
    # the sentinel `total` terminates the last real run
    off_hi = jnp.minimum(
        jnp.where(jnp.arange(P_) == P_ - 1, total, off_hi), 1 << 23
    ).astype(jnp.float32)
    aug = jnp.concatenate(
        [
            table.astype(jnp.float32),
            jnp.zeros((P_, kmax - 2 - K), jnp.float32),
            off_lo[:, None],
            off_hi[:, None],
        ],
        axis=1,
    )  # [P, kmax]
    # pad rows so every window DMA stays in bounds; pad off cols never match
    pad_rows = WIN + 128 + ((-(P_ + WIN + 128)) % 128)
    pad = jnp.zeros((pad_rows, kmax), jnp.float32)
    pad = pad.at[:, kmax - 2 :].set(jnp.float32(1 << 23))
    aug = jnp.concatenate([aug, pad], axis=0)
    Pp = aug.shape[0]
    packed = aug.reshape(Pp // k, 128)

    r0 = jnp.clip(r0_sub.astype(jnp.int32), 0, P_)
    r0_step = (r0[::SUB] // 128) * 128
    if r0.shape[0] != n_out // 128:
        raise ValueError("r0_sub length must be n_out // 128")

    # NOTE: off_hi for the last real run is min(total, off_hi); runs whose
    # offsets were clamped past 2^23 never match (callers keep caps far
    # below 2^23 = 8.4M slots).

    rows = pl.pallas_call(
        functools.partial(_run_expand_kernel, kmax=kmax, subw=subw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((kmax, BLK), lambda s, *_: (0, s)),
            scratch_shapes=[
                pltpu.VMEM((WIN // k, 128), jnp.float32),
                pltpu.VMEM(((128 // kmax) * subw, kmax), jnp.float32),
                pltpu.VMEM(((128 // kmax) * subw, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kmax, n_out), jnp.float32),
        interpret=interpret,
    )(
        r0_step.astype(jnp.int32),
        r0,
        packed,
    )
    return rows[:K, :], rows[kmax - 1, :].astype(jnp.int32)
