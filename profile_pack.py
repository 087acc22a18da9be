"""Micro-bench: pack_features gather variants.

The forward packs per-Gaussian coefficients [1M, 24] into instance slots
[4.7M, 24] with one row gather (~39 ms). Width-8 gathers measured 6x
cheaper per byte than 24-wide — test whether that survives slicing from a
24-wide source, and the 3x split end-to-end (output feature-major [24, N]
like pack_features returns).
"""
from __future__ import annotations

import numpy as np

from profile_stages import timed


def main():
    import jax
    import jax.numpy as jnp

    P = 1 << 20
    n = 4_714_496
    rng = np.random.default_rng(0)
    gid = jnp.asarray(rng.integers(0, P, n).astype(np.int32))
    g24 = jnp.asarray(rng.normal(size=(P, 24)).astype(np.float32))
    parts = tuple(
        jnp.asarray(rng.normal(size=(P, 8)).astype(np.float32)) for _ in range(3)
    )

    def gA(g24):
        return g24[gid].T

    def gB(g24):
        return jnp.concatenate(
            [g24[:, 8 * i : 8 * i + 8][gid].T for i in range(3)], axis=0
        )

    def gC(a, b, c):
        return jnp.concatenate([a[gid].T, b[gid].T, c[gid].T], axis=0)

    timed(gA, (g24,), name="pack A: [1M,24] gather .T")
    timed(gB, (g24,), name="pack B: 3x sliced [1M,8] gather")
    timed(gC, parts, name="pack C: 3x separate [1M,8] gather")


if __name__ == "__main__":
    main()
