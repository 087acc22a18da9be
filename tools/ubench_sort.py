"""Micro-bench: lax.sort cost vs payload count at bench scale, plus
segment_sum_ranges and the rank_of row-gather — the regroup components."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from tools.profile import timed


def main():
    import tpu_splat
    tpu_splat.setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges

    cap_al = 3_981_312 + 8160 * 128 - (3_981_312 + 8160 * 128) % 128
    P = 1 << 20
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, P, cap_al, dtype=np.int32))
    cols = [jnp.asarray(rng.integers(-2**31, 2**31 - 1, cap_al, dtype=np.int32))
            for _ in range(12)]

    ks = (1, 3, 10) if len(sys.argv) < 2 else [int(v) for v in sys.argv[1:]]
    for k in ks:
        def f(key, *cs):
            return jax.lax.sort((key,) + cs, num_keys=1, is_stable=False)
        timed(f, (key, *cols[:k]), name=f"sort 1key+{k}payloads")

    rows_T = jnp.asarray(rng.normal(size=(19, cap_al)).astype(np.float32))
    areas = rng.integers(2, 6, P)
    starts = np.minimum(np.cumsum(areas) - areas, cap_al).astype(np.int32)
    ends = np.minimum(starts + areas, cap_al).astype(np.int32)
    starts, ends = jnp.asarray(starts), jnp.asarray(ends)
    timed(lambda r: segment_sum_ranges(r, starts, ends), (rows_T,),
          name="segment_sum_ranges [19,4.2M]")

    tab = jnp.asarray(rng.normal(size=(P, 19)).astype(np.float32))
    rank_of = jnp.asarray(rng.permutation(P).astype(np.int32))
    timed(lambda t: t[rank_of], (tab,), name="rank_of gather [1M,19]")

    # stable vs unstable single-key
    def fs(key, c):
        return jax.lax.sort((key, c), num_keys=1, is_stable=True)
    timed(fs, (key, cols[0]), name="sort stable 1key+1payload")


if __name__ == "__main__":
    main()
