"""Micro-bench: TPU row-gather scaling vs row width / dtype / index pattern.

Decides whether the bwd regroup gather (d_out[rank_perm] at [3.4M, 24] f32)
is row-count-bound (width changes nothing -> only fewer instances help) or
byte-bound (bf16 packing halves it).
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
    # emission-order-ish pattern: sorted-by-tile inverse (windows + small runs)
    win = 66_000
    semi_np = np.argsort(perm_np // win, kind="stable").astype(np.int32)
    semi = jnp.asarray(semi_np)

    for F in (8, 16, 24, 32, 48):
        src = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))

        def g(src):
            return src[perm]

        timed(g, (src,), name=f"gather f32 [{n},{F}] random")

    src24 = jnp.asarray(rng.normal(size=(n, 24)).astype(np.float32))
    src24b = src24.astype(jnp.bfloat16)

    def gb(src):
        return src[perm]

    timed(gb, (src24b,), name="gather bf16 [n,24] random")

    def gsemi(src):
        return src[semi]

    timed(gsemi, (src24,), name="gather f32 [n,24] windowed idx")

    # sort-based permute: key + 24 payload columns in one lax.sort
    cols = tuple(src24[:, i] for i in range(24))

    def gsort(key, *cols):
        out = jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)
        return out[1:]

    inv = jnp.asarray(np.argsort(perm_np).astype(np.int32))
    timed(gsort, (inv,) + cols, name="sort-permute key+24 cols")


if __name__ == "__main__":
    main()
