"""Property-based tests (hypothesis) for driver-side math: the quantile
sketch and the gate/health arithmetic hold their invariants for ALL
inputs, not just the goldens."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from codeclone_spark.plans import baseline as bl
from codeclone_spark.plans import health

counts_st = st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=129)


@settings(max_examples=200, deadline=None)
@given(counts=counts_st, q=st.floats(min_value=0.0, max_value=1.0))
def test_sketch_quantile_bounds(counts, q):
    v = bl.sketch_quantile(counts, 25.0, q)
    if sum(counts) == 0:
        assert v is None
    else:
        # within the sketch's value domain
        assert 0.0 <= v <= (len(counts) - 1) * 25.0


@settings(max_examples=200, deadline=None)
@given(counts=counts_st, q1=st.floats(0, 1), q2=st.floats(0, 1))
def test_sketch_quantile_monotone_in_q(counts, q1, q2):
    if sum(counts) == 0:
        return
    lo, hi = sorted((q1, q2))
    assert bl.sketch_quantile(counts, 25.0, lo) <= bl.sketch_quantile(counts, 25.0, hi)


@settings(max_examples=200, deadline=None)
@given(
    counts_a=counts_st.filter(lambda c: sum(c) > 0),
    shift=st.integers(min_value=1, max_value=50),
)
def test_sketch_quantile_shift_monotone(counts_a, shift):
    """Shifting all mass to higher bins never lowers a quantile."""
    n = len(counts_a)
    shifted = [0] * n
    for i, c in enumerate(counts_a):
        shifted[min(i + shift, n - 1)] += c
    for q in (0.5, 0.95, 0.99):
        assert bl.sketch_quantile(shifted, 25.0, q) >= bl.sketch_quantile(
            counts_a, 25.0, q
        )


@settings(max_examples=200, deadline=None)
@given(
    rows=st.integers(min_value=1, max_value=10**12),
    viol=st.integers(min_value=0, max_value=10**9),
    undec=st.integers(min_value=0, max_value=10**6),
)
def test_health_score_bounds_and_monotonicity(rows, viol, undec):
    h = health.health_score(rows, viol, min(undec, viol))
    assert 0.0 <= h["score"] <= 100.0
    assert h["grade"] in "ABCDF"
    # one more violation never raises the score
    h2 = health.health_score(rows, viol + 1, min(undec, viol))
    assert h2["score"] <= h["score"]


@settings(max_examples=200, deadline=None)
@given(
    hist=st.lists(st.integers(0, 1000), min_size=2, max_size=16),
)
def test_psi_and_ks_identity_is_zero(hist):
    assert abs(bl.psi(hist, hist)) < 1e-12
    assert bl.ks_stat(hist, hist) == 0.0


@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.integers(0, 1000), min_size=8, max_size=8),
    b=st.lists(st.integers(0, 1000), min_size=8, max_size=8),
)
def test_ks_bounded_and_symmetric(a, b):
    d = bl.ks_stat(a, b)
    assert 0.0 <= d <= 1.0 + 1e-12
    assert abs(d - bl.ks_stat(b, a)) < 1e-12
