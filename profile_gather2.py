"""Follow-up: is the width-8 gather fast path real, and does it survive
slicing from a wider source? Also end-to-end alternatives for the bwd
regroup (d_out[rank_perm] at [3.67M, 24]):
  A) one 24-wide gather (current)            ~113 ms
  B) 3x 8-wide gathers from column slices
  C) 3x 8-wide gathers from separate arrays
  D) sort-permute: split 24 cols, lax.sort by inverse perm, restack
"""
from __future__ import annotations

import numpy as np

from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp

    n = 3_670_016
    rng = np.random.default_rng(0)
    perm_np = rng.permutation(n).astype(np.int32)
    perm = jnp.asarray(perm_np)
    inv = jnp.asarray(np.argsort(perm_np).astype(np.int32))
    src = jnp.asarray(rng.normal(size=(n, 24)).astype(np.float32))
    parts = tuple(
        jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32)) for _ in range(3)
    )

    def gA(src):
        return src[perm]

    def gB(src):
        return tuple(src[:, 8 * i : 8 * i + 8][perm] for i in range(3))

    def gC(a, b, c):
        return a[perm], b[perm], c[perm]

    def gD(src):
        cols = tuple(src[:, i] for i in range(24))
        out = jax.lax.sort((inv,) + cols, num_keys=1, is_stable=False)
        return jnp.stack(out[1:], axis=0)  # [24, n] for the segment kernel

    def gD2(src):
        # pack pairs: 12 sorts payloads of 2xf32 bitcast into i64? TPU: no.
        # instead: 24 cols but stacked [24, n] output via concat
        cols = tuple(src[:, i] for i in range(24))
        out = jax.lax.sort((inv,) + cols, num_keys=1, is_stable=False)
        return out[1:]  # no restack (kernel could take tuple? measure cost diff)

    timed(gA, (src,), name="A: gather [n,24]")
    timed(gB, (src,), name="B: 3x gather sliced [n,8]")
    timed(gC, parts, name="C: 3x gather separate [n,8]")
    timed(gD, (src,), name="D: sort 24 cols + stack [24,n]")
    timed(gD2, (src,), name="D2: sort 24 cols (no stack)")

    for F in (4, 8, 12):
        s = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))

        def g(s):
            return s[perm]

        timed(g, (s,), name=f"gather [n,{F}] separate")

    # pack_features regime: gather [cap] rows from a small [1M, F] table
    P = 1 << 20
    gid = jnp.asarray(rng.integers(0, P, n).astype(np.int32))
    for F in (8, 24):
        tab = jnp.asarray(rng.normal(size=(P, F)).astype(np.float32))

        def gt(tab):
            return tab[gid]

        timed(gt, (tab,), name=f"table gather [1M,{F}] -> [n,{F}]")


if __name__ == "__main__":
    main()
