"""Micro-bench: gather-transpose backward path variants at bench scale.

Compares, at 4.5M x 24 (the d_feats -> per-Gaussian reduction in the
tile_blend backward):
  a) current: rows_T = d_out[perm].T ; segment_sum_ranges(rows_T).T[rank_of]
  b) row-major kernel: segment_sum_rows(d_out[perm])[rank_of]
and the isolated pieces (gather, transpose, kernels).
"""
from __future__ import annotations

import numpy as np

from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.kernels.segment_reduce import segment_sum_ranges, segment_sum_rows

    cap = 4 << 20
    P = 1 << 20
    F = 24
    rng = np.random.default_rng(0)
    d_out = jnp.asarray(rng.normal(size=(cap, F)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(cap).astype(np.int32))
    areas = rng.integers(2, 7, P)
    starts_np = np.minimum(np.cumsum(areas) - areas, cap).astype(np.int32)
    ends_np = np.minimum(starts_np + areas, cap).astype(np.int32)
    starts = jnp.asarray(starts_np)
    ends = jnp.asarray(ends_np)
    rank_of = jnp.asarray(rng.permutation(P).astype(np.int32))

    def path_a(d_out):
        rows_T = d_out[perm].T
        return segment_sum_ranges(rows_T, starts, ends).T[rank_of]

    def path_b(d_out):
        return segment_sum_rows(d_out[perm], starts, ends)[rank_of]

    def gather_only(d_out):
        return d_out[perm]

    def transpose_only(d_out):
        return d_out.T

    g = jax.jit(gather_only)(d_out)

    def kernel_a(rows_T):
        return segment_sum_ranges(rows_T, starts, ends)

    def kernel_b(rows):
        return segment_sum_rows(rows, starts, ends)

    rows_T = jnp.asarray(np.asarray(g).T.copy())

    def gather_T(d_out):
        return d_out[perm].T

    def unrank(x):
        return x.T[rank_of]

    kA = jax.jit(kernel_a)(rows_T)

    import os
    sel = os.environ.get("SEGPROF", "a").split(",")
    if "a" in sel:
        timed(gather_only, (d_out,), name="row gather [4.5M,24]")
        timed(transpose_only, (g,), name="transpose [4.5M,24]->[24,4.5M]")
        timed(gather_T, (d_out,), name="gather+T fused?")
        timed(kernel_a, (rows_T,), name="kernel col-major [24,4.5M]")
        timed(unrank, (kA,), name="unrank .T[rank_of]")
        timed(path_a, (d_out,), name="full path A (gather+T+kernel+unrank)")
    if "b" in sel:
        timed(path_b, (d_out,), name="full path B (gather+rowkernel+unrank)")

    if "cube" not in sel:
        return
    # cubemap d_tex regime: 8.3M taps x 3 channels into 98K texels
    n2 = 8 << 20
    M = 6 * 128 * 128
    d3 = jnp.asarray(rng.normal(size=(n2, 3)).astype(np.float32))
    a2 = rng.integers(0, 2 * n2 // M, M)
    s2 = np.minimum(np.cumsum(a2) - a2, n2).astype(np.int32)
    e2 = np.minimum(s2 + a2, n2).astype(np.int32)
    s2j, e2j = jnp.asarray(s2), jnp.asarray(e2)
    d3T = jnp.asarray(np.asarray(d3).T.copy())

    def k3_col(rows_T):
        return segment_sum_ranges(rows_T, s2j, e2j)

    def k3_row(rows):
        return segment_sum_rows(rows, s2j, e2j)

    def k3_col_full(rows):
        return segment_sum_ranges(rows.T, s2j, e2j).T

    timed(k3_col, (d3T,), name="cube kernel col-major [3,8.3M]")
    timed(k3_row, (d3,), name="cube kernel row-major [8.3M,3]")
    timed(k3_col_full, (d3,), name="cube col-major + both transposes")


if __name__ == "__main__":
    main()
