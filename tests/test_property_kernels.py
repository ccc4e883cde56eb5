"""Property-based verification (hypothesis) of the incremental kernels
against their brute-force oracles — randomized streams explore the
push/pop and tie edge space far beyond the hand-written cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nuclei_feature_extraction_spark.functions import kernels, oracle


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 50)),
        min_size=1, max_size=60,
    )
)
def test_hull_prefix_random_streams(pts):
    """Prefix hull == brute-force monotone chain at EVERY prefix for
    arbitrary nondecreasing-x integer streams (heavy tie probability,
    duplicates, collinearity all arise naturally)."""
    xs = np.array(sorted(p[0] for p in pts), dtype=np.float64)
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    first = np.zeros(len(xs), dtype=bool)
    first[0] = True
    area, perim = kernels.hull_prefix(first, xs, ys)
    for t in range(len(xs)):
        wa, wp = oracle.hull_metrics_naive(xs[: t + 1], ys[: t + 1])
        np.testing.assert_allclose(area[t], wa, rtol=1e-9, atol=1e-9,
                                   err_msg=f"area prefix {t}")
        np.testing.assert_allclose(perim[t], wp, rtol=1e-9, atol=1e-9,
                                   err_msg=f"perim prefix {t}")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 4), min_size=1, max_size=50),
    st.lists(st.integers(0, 3), min_size=1, max_size=50),
    st.integers(1, 3),
)
def test_xcooc_prefix_random_streams(a_list, b_list, d):
    n = min(len(a_list), len(b_list))
    a = np.array(a_list[:n], dtype=np.int64)
    b = np.array(b_list[:n], dtype=np.int64)
    conv = np.zeros(n, dtype=np.int64)
    first = np.zeros(n, dtype=bool)
    first[0] = True
    got = kernels.xcooc_prefix(conv, first, a, b, d)
    want = oracle.xcooc_prefix_naive(a, b, d)
    for s in oracle.XCOOC_STATS:
        np.testing.assert_allclose(
            got[s], want[s], rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"stat={s} d={d}",
        )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 3), min_size=1, max_size=60),
    st.integers(2, 5),
)
def test_runlen_prefix_random_streams(xs, g):
    x = np.array(xs, dtype=np.int64) % g
    conv = np.zeros(len(x), dtype=np.int64)
    first = np.zeros(len(x), dtype=bool)
    first[0] = True
    got = kernels.runlen_prefix(conv, first, x, g)
    want = oracle.runlen_prefix_naive(x, g)
    for s in oracle.RUNLEN_STATS:
        np.testing.assert_allclose(
            got[s], want[s], rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"stat={s} G={g}",
        )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=2, max_size=50),
    st.integers(1, 2),
    st.sampled_from([4, 8]),
)
def test_cooc_prefix_random_streams(xs, d, k):
    x = np.array(xs, dtype=np.int64) % k
    conv = np.zeros(len(x), dtype=np.int64)
    first = np.zeros(len(x), dtype=bool)
    first[0] = True
    got = kernels.cooc_prefix(conv, first, x, d, k)
    want = oracle.cooc_prefix_naive(x, d, k)
    for s in oracle.COOC_STATS:
        np.testing.assert_allclose(
            got[s], want[s], rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"stat={s} d={d} k={k}",
        )
