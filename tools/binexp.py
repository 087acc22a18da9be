"""Micro-experiments: binning expansion primitives at bench scale (dev tool).

Attributes the ~28 ms expand stage (mark scatter + cumsum + cummax + row
gather at cap) and measures replacement candidates (blocked two-level
cumsum/cummax, fused variants).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile import timed  # noqa: E402


def blocked_cumsum(x, block=512):
    n = x.shape[0]
    import jax.numpy as jnp

    b = n // block
    xb = x[: b * block].reshape(b, block)
    within = jnp.cumsum(xb, axis=1)
    carry = jnp.cumsum(within[:, -1]) - within[:, -1]
    out = (within + carry[:, None]).reshape(b * block)
    if n > b * block:
        tail = jnp.cumsum(x[b * block:]) + out[-1]
        out = jnp.concatenate([out, tail])
    return out


def blocked_cummax(x, block=512):
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    b = n // block
    xb = x[: b * block].reshape(b, block)
    within = jax.lax.cummax(xb, axis=1)
    carry = jax.lax.cummax(within[:, -1])
    carry = jnp.concatenate([jnp.full((1,), -(2**31), jnp.int32), carry[:-1]])
    out = jnp.maximum(within, carry[:, None]).reshape(b * block)
    if n > b * block:
        tail = jnp.maximum(jax.lax.cummax(x[b * block:]), out[-1])
        out = jnp.concatenate([out, tail])
    return out


def main():
    import tpu_splat

    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    P = 1 << 20
    cap = 3_670_016
    rng = np.random.default_rng(0)
    area = rng.integers(1, 7, P).astype(np.int32)
    offsets_np = np.minimum(np.cumsum(area) - area, cap).astype(np.int32)
    offsets = jnp.asarray(offsets_np)
    mark_np = np.zeros(cap + 1, np.int32)
    np.add.at(mark_np, offsets_np, 1)
    mark = jnp.asarray(mark_np[:cap])
    rows_src = jnp.asarray(rng.integers(0, 1 << 30, (P, 2)).astype(np.int32))
    gsel_np = np.cumsum(mark_np[:cap]) - 1
    gsel = jnp.asarray(gsel_np.astype(np.int32))

    def s_mark(offsets):
        return jnp.zeros((cap + 1,), jnp.int32).at[jnp.minimum(offsets, cap)].add(1)

    def s_cumsum(mark):
        return jnp.cumsum(mark)

    def s_cumsum_blocked(mark):
        return blocked_cumsum(mark)

    def s_cummax(mark):
        i = jnp.arange(cap, dtype=jnp.int32)
        return jax.lax.cummax(jnp.where(mark > 0, i, 0))

    def s_cummax_blocked(mark):
        i = jnp.arange(cap, dtype=jnp.int32)
        return blocked_cummax(jnp.where(mark > 0, i, 0))

    def s_rowgather(rows_src, gsel):
        return rows_src[gsel]

    # sorted+unique scatter variants (the binning now routes dead/overflow
    # rows to unique past-cap slots) + hold-last associative scan — the
    # building blocks of a gather-free expansion
    uniq_idx = jnp.asarray(
        np.where(area > 0, offsets_np, cap + np.arange(P, dtype=np.int32))
    )

    def s_mark_sorted(uniq_idx):
        return (
            jnp.zeros((cap + P + 1,), jnp.int32)
            .at[uniq_idx]
            .add(1, indices_are_sorted=True, unique_indices=True)
        )

    vals = jnp.asarray(rng.integers(0, 1 << 30, P).astype(np.int32))

    def s_set_sorted(uniq_idx, vals):
        return (
            jnp.zeros((cap + P + 1,), jnp.int32)
            .at[uniq_idx]
            .set(vals, indices_are_sorted=True, unique_indices=True)
        )

    arr_scan = jnp.asarray(rng.integers(-(1 << 31), 1 << 30, cap).astype(np.int32))

    def s_holdlast(arr_scan):
        return jax.lax.associative_scan(
            lambda a, b: jnp.where(b < 0, b, a), arr_scan
        )

    timed(s_mark_sorted, (uniq_idx,), name="mark scatter sorted+unique")
    timed(s_set_sorted, (uniq_idx, vals), name="value scatter-set sorted+unique")
    timed(s_holdlast, (arr_scan,), name="hold-last associative_scan [cap]")

    timed(s_mark, (offsets,), name="mark scatter (1M -> cap)")
    timed(s_cumsum, (mark,), name="cumsum [cap] (native)")
    timed(s_cumsum_blocked, (mark,), name="cumsum [cap] (blocked)")
    timed(s_cummax, (mark,), name="cummax [cap] (native)")
    timed(s_cummax_blocked, (mark,), name="cummax [cap] (blocked)")
    timed(s_rowgather, (rows_src, gsel), name="row gather [cap,2] <- [1M,2]")

    # aligned-sort and counts-stage costs at bench scale
    n_tiles = 8160
    inst_tile = jnp.asarray(rng.integers(0, n_tiles, cap).astype(np.int32))
    inst_gid = jnp.asarray(rng.integers(0, P, cap).astype(np.int32))
    pad_cap = n_tiles * 128
    pad_tile = jnp.asarray(rng.integers(0, n_tiles, pad_cap).astype(np.int32))

    def s_count_sort(inst_tile):
        return jax.lax.sort(inst_tile, is_stable=False)

    sorted_tile = jax.jit(s_count_sort)(inst_tile)

    def s_searchsorted(sorted_tile):
        ids = jnp.arange(n_tiles, dtype=jnp.int32)
        return (
            jnp.searchsorted(sorted_tile, ids, side="left"),
            jnp.searchsorted(sorted_tile, ids, side="right"),
        )

    def s_aligned_sort(inst_tile, inst_gid, pad_tile):
        key = jnp.concatenate([inst_tile, pad_tile])
        g = jnp.concatenate([inst_gid, jnp.zeros(pad_cap, jnp.int32)])
        e = jnp.concatenate([inst_gid, jnp.full(pad_cap, cap, jnp.int32)])
        r = jnp.concatenate([inst_gid, jnp.full(pad_cap, P, jnp.int32)])
        return jax.lax.sort((key, g, e, r), num_keys=1, is_stable=True)

    def s_aligned_sort3(inst_tile, inst_gid, pad_tile):
        key = jnp.concatenate([inst_tile, pad_tile])
        g = jnp.concatenate([inst_gid, jnp.zeros(pad_cap, jnp.int32)])
        e = jnp.concatenate([inst_gid, jnp.full(pad_cap, cap, jnp.int32)])
        return jax.lax.sort((key, g, e), num_keys=1, is_stable=True)

    timed(s_count_sort, (inst_tile,), name="counts 1-col sort [cap]")
    timed(s_searchsorted, (sorted_tile,), name="searchsorted 8K queries")
    timed(s_aligned_sort, (inst_tile, inst_gid, pad_tile),
          name="aligned stable sort key+3 [cap_al]")
    timed(s_aligned_sort3, (inst_tile, inst_gid, pad_tile),
          name="aligned stable sort key+2 [cap_al]")

    # regroup-permutation candidates: the backward regroup must reorder
    # [cap_al, 19] grad rows into emission order. Today: ONE sort with 19
    # payload columns (~45 ms). Candidates: row scatter-set at unique
    # (unsorted) destinations, and the same with a sorted-destination
    # second sort of (emit, slot) computed once in binning.
    cap_al = cap + 8160 * 128
    emit_perm = rng.permutation(cap_al).astype(np.int32)
    demit = jnp.asarray(emit_perm)
    rows19 = jnp.asarray(rng.normal(size=(cap_al, 19)).astype(np.float32))

    def r_sort(demit, rows19):
        cols = tuple(rows19[:, i] for i in range(19))
        srt = jax.lax.sort((demit,) + cols, num_keys=1, is_stable=False)
        return jnp.stack(srt[1:], axis=0)

    def r_scatter(demit, rows19):
        return (
            jnp.zeros((cap_al, 19), jnp.float32)
            .at[demit]
            .set(rows19, unique_indices=True)
        )

    def r_gather(demit, rows19):
        # inverse-permutation row gather (perm precomputed: 2-col sort cost
        # belongs to the forward/binning side)
        return rows19[demit]

    timed(r_sort, (demit, rows19), name="regroup: 19-col sort")
    timed(r_scatter, (demit, rows19), name="regroup: unique row scatter-set")
    timed(r_gather, (demit, rows19), name="regroup: row gather by perm")

    # correctness of the blocked variants
    a = np.asarray(jax.jit(s_cumsum)(mark))
    b = np.asarray(jax.jit(s_cumsum_blocked)(mark))
    np.testing.assert_array_equal(a[:cap], b[:cap])
    c = np.asarray(jax.jit(s_cummax)(mark))
    d = np.asarray(jax.jit(s_cummax_blocked)(mark))
    np.testing.assert_array_equal(c, d)
    print("blocked variants exact", flush=True)


if __name__ == "__main__":
    main()
