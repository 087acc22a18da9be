"""Segmented reductions (core/segops): exact vs naive reference, including
block-boundary-straddling segments and precision of tiny segments."""
import numpy as np
import pytest


def _random_segments(rng, n, p):
    """Random contiguous partition of [0, n) into p segments (some empty)."""
    cuts = np.sort(rng.integers(0, n + 1, p - 1))
    bounds = np.concatenate([[0], cuts, [n]])
    return bounds[:-1].astype(np.int32), bounds[1:].astype(np.int32)


@pytest.mark.parametrize("n,p", [(1000, 7), (4096, 200), (5000, 50)])
def test_segment_sum_matches_naive(n, p):
    import jax.numpy as jnp

    from tpu_splat.core.segops import segment_sum_sorted

    rng = np.random.default_rng(0)
    rows = rng.normal(size=(n, 5)).astype(np.float32)
    s0, s1 = _random_segments(rng, n, p)
    got = np.asarray(segment_sum_sorted(jnp.asarray(rows), jnp.asarray(s0), jnp.asarray(s1)))
    want = np.stack(
        [rows[a:b].sum(axis=0) if b > a else np.zeros(5) for a, b in zip(s0, s1)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_sum_tiny_segment_precision():
    """A tiny segment deep into a large array must not inherit cancellation
    error from the GLOBAL prefix (the flaw of plain cumsum+diff): the error
    bound is one BLOCK's mass ulp, independent of array length."""
    import jax.numpy as jnp

    from tpu_splat.core.segops import segment_sum_sorted, BLK

    n = 1 << 20  # global prefix mass ~1e6 — global-cumsum diff would be
    rows = np.full((n, 1), 1.0, np.float32)  # hopeless (ulp ~ 0.06)
    pos = 2000 * BLK + 17
    rows[pos] = 1e-6
    rows[pos + 1] = 2e-6
    s0 = np.array([pos], np.int32)
    s1 = np.array([pos + 2], np.int32)
    got = float(
        segment_sum_sorted(jnp.asarray(rows), jnp.asarray(s0), jnp.asarray(s1))[0, 0]
    )
    # error bound: ulp of the in-block prefix (~17 here) ~ 2e-6
    assert abs(got - 3e-6) < 2.5e-6
    # plain global cumsum+diff loses the signal entirely (prefix ~256k,
    # ulp 0.015 absorbs the 1e-6 increments -> returns exactly 0)
    csum = np.cumsum(rows[:, 0], dtype=np.float32)
    naive = csum[pos + 1] - csum[pos - 1]
    assert naive == 0.0


def test_segment_sum_straddles_blocks():
    import jax.numpy as jnp

    from tpu_splat.core.segops import segment_sum_sorted, BLK

    rng = np.random.default_rng(1)
    n = 6 * BLK
    rows = rng.normal(size=(n, 2)).astype(np.float32)
    cases = [
        (BLK - 3, BLK + 5),          # adjacent blocks
        (BLK // 2, 4 * BLK + 7),     # spans full middle blocks
        (0, n),                      # whole array
        (2 * BLK, 2 * BLK),          # empty
        (3 * BLK, 3 * BLK + 1),      # single element at block start
    ]
    s0 = np.array([c[0] for c in cases], np.int32)
    s1 = np.array([c[1] for c in cases], np.int32)
    got = np.asarray(segment_sum_sorted(jnp.asarray(rows), jnp.asarray(s0), jnp.asarray(s1)))
    for i, (a, b) in enumerate(cases):
        want = rows[a:b].sum(axis=0) if b > a else np.zeros(2)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)


def test_segment_max_matches_naive():
    import jax.numpy as jnp

    from tpu_splat.core.segops import segment_max_sorted

    rng = np.random.default_rng(2)
    n, p = 3000, 40
    s0, s1 = _random_segments(rng, n, p)
    keys = np.zeros(n, np.int32)
    for g, (a, b) in enumerate(zip(s0, s1)):
        keys[a:b] = g
    vals = rng.uniform(0, 1, n).astype(np.float32)
    got = np.asarray(
        segment_max_sorted(
            jnp.asarray(vals), jnp.asarray(keys), jnp.asarray(s0), jnp.asarray(s1),
            fill=-1.0,
        )
    )
    for g, (a, b) in enumerate(zip(s0, s1)):
        want = vals[a:b].max() if b > a else -1.0
        assert got[g] == pytest.approx(want), g


def test_segment_sum_ranges_matches_oracle():
    """Pallas segment kernel (interpret on CPU) vs the jnp two-level oracle,
    over tiling runs with gaps, empties, and a clamped tail."""
    import jax.numpy as jnp

    from tpu_splat.core.segops import segment_sum_sorted
    from tpu_splat.kernels.segment_reduce import segment_sum_ranges

    rng = np.random.default_rng(3)
    for n, f, p in [(2048, 24, 300), (1024, 3, 513), (512, 20, 1)]:
        areas = rng.integers(0, 6, p)
        total = min(int(areas.sum()), n)
        starts = np.minimum(np.cumsum(areas) - areas, total).astype(np.int32)
        ends = np.minimum(starts + areas, total).astype(np.int32)
        rows = rng.normal(size=(n, f)).astype(np.float32)
        ref = np.asarray(
            segment_sum_sorted(
                jnp.asarray(rows), jnp.asarray(starts), jnp.asarray(ends)
            )
        )
        got = np.asarray(
            segment_sum_ranges(
                jnp.asarray(rows.T.copy()), jnp.asarray(starts), jnp.asarray(ends)
            )
        ).T
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_segment_sum_rows_matches_oracle():
    """Row-major variant of the Pallas segment kernel vs the jnp oracle."""
    import jax.numpy as jnp

    from tpu_splat.core.segops import segment_sum_sorted
    from tpu_splat.kernels.segment_reduce import segment_sum_rows

    rng = np.random.default_rng(4)
    for n, f, p in [(2048, 24, 300), (1024, 3, 513), (512, 20, 1)]:
        areas = rng.integers(0, 6, p)
        total = min(int(areas.sum()), n)
        starts = np.minimum(np.cumsum(areas) - areas, total).astype(np.int32)
        ends = np.minimum(starts + areas, total).astype(np.int32)
        rows = rng.normal(size=(n, f)).astype(np.float32)
        ref = np.asarray(
            segment_sum_sorted(
                jnp.asarray(rows), jnp.asarray(starts), jnp.asarray(ends)
            )
        )
        got = np.asarray(
            segment_sum_rows(
                jnp.asarray(rows), jnp.asarray(starts), jnp.asarray(ends)
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
