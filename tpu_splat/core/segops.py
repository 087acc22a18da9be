"""Scatter-free segmented reductions over pre-grouped (sorted) rows.

TPU scatter-adds at millions of rows are 10-50x slower than sorts/gathers,
and jax.lax.associative_scan at 5M x 24 outgrows the TPU compiler (compile
helper OOM). These segment ops therefore use only cumsums, sorts and row
gathers:

- segment_sum_sorted: two-level block decomposition —
    seg_sum = suffix(first block) + sum(full middle blocks) + prefix(last)
  Within-block terms come from a [B, BLK, F] axis-1 cumsum (error bounded by
  BLK elements); the middle term from a [B, F] block-total cumsum. A segment
  contained in one block uses only within-block differences — no
  cancellation against a global prefix (the failure mode of cumsum+diff).
- segment_max_sorted: one two-key stable sort (key, value) — ascending value
  within each key run puts the segment maximum at the run's end, which
  seg_end already indexes. Exact, no scan at all.

Used for: per-Gaussian grads from per-instance rows (tile_blend backward),
cubemap texel grads from per-tap rows, per-Gaussian max blend weight.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Block length (one 128-lane tile): error of a within-block cumsum diff is
# bounded by ulp(sum of |rows| in ONE block) — smaller blocks, tighter grads.
BLK = 128


def _pad_rows(rows: jnp.ndarray):
    n = rows.shape[0]
    n_pad = (-n) % BLK
    if n_pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n_pad,) + rows.shape[1:], rows.dtype)], axis=0
        )
    return rows, n + n_pad


def segment_sum_sorted(
    rows: jnp.ndarray,  # [N, F] values grouped by segment (contiguous runs)
    seg_start: jnp.ndarray,  # [P] inclusive start rank
    seg_end: jnp.ndarray,  # [P] exclusive end rank
) -> jnp.ndarray:
    """Per-segment sums of contiguous row runs. -> [P, F]."""
    rows, n = _pad_rows(rows)
    F = rows.shape[-1]
    B = n // BLK
    wc = jnp.cumsum(rows.reshape(B, BLK, F), axis=1)  # inclusive, in-block
    bt = wc[:, -1]  # [B, F] block totals
    bp = jnp.cumsum(bt, axis=0)  # [B, F] inclusive block prefix
    wc_flat = wc.reshape(B * BLK, F)

    s0, s1 = seg_start, seg_end
    empty = s1 <= s0
    last = jnp.clip(s1 - 1, 0, n - 1)
    b0, r0 = s0 // BLK, s0 % BLK
    b1, r1 = last // BLK, last % BLK

    pref1 = wc_flat[b1 * BLK + r1]  # in-block inclusive prefix at segment end
    pref0 = jnp.where(  # in-block exclusive prefix at segment start
        (r0 > 0)[:, None], wc_flat[jnp.clip(b0 * BLK + r0 - 1, 0, n - 1)], 0.0
    )

    sum_same = pref1 - pref0  # both in block b0 == b1
    suffix0 = bt[jnp.clip(b0, 0, B - 1)] - pref0
    middle = jnp.where(
        (b1 > b0 + 1)[:, None],
        bp[jnp.clip(b1 - 1, 0, B - 1)] - bp[jnp.clip(b0, 0, B - 1)],
        0.0,
    )
    sum_span = suffix0 + middle + pref1
    out = jnp.where((b0 == b1)[:, None], sum_same, sum_span)
    return jnp.where(empty[:, None], 0.0, out)


def segment_max_sorted(
    vals: jnp.ndarray,  # [N] values grouped by segment (contiguous runs)
    keys: jnp.ndarray,  # [N] the nondecreasing segment keys (int32)
    seg_start: jnp.ndarray,
    seg_end: jnp.ndarray,
    fill: float = 0.0,
) -> jnp.ndarray:
    """Per-segment max via one stable two-key sort: within each key run,
    ascending value order puts the max at the run's end. -> [P].
    Requires DUPLICATED keys per run (e.g. rank keys) — with unique keys the
    value never participates in the ordering and seg_end-1 indexes the run's
    LAST element, not its max."""
    n = vals.shape[0]
    _, vals_sorted = jax.lax.sort(
        (keys, vals.astype(jnp.float32)), num_keys=2, is_stable=False
    )
    last = jnp.clip(seg_end - 1, 0, n - 1)
    out = vals_sorted[last]
    return jnp.where(seg_end > seg_start, out, fill)
