"""Property tests for plans/stats.py: random inputs vs brute-force
references and invariants (hypothesis)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, tuples):
    """tuples: (user_id, seconds, event_type, value)."""
    rows = [
        (i, T0 + dt.timedelta(seconds=s), u, t, float(v))
        for i, (u, s, t, v) in enumerate(tuples)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-500, max_value=500),
        min_size=2, max_size=8,
    ),
    shift=st.integers(min_value=-20, max_value=20),
)
def test_theil_sen_trend_shift_equivariance(spark, vals, shift):
    """Adding an exact linear trend of `shift` dollars/day moves the
    Theil-Sen slope by exactly 100*shift cents/day."""
    from tsaug_spark.plans.stats import theil_sen

    base = [(1, 86400 * d, "a", v) for d, v in enumerate(vals)]
    trended = [
        (1, 86400 * d, "a", v + shift * d)
        for d, v in enumerate(vals)
    ]
    s0 = theil_sen(_ev(spark, base)).collect()[0].slope_cents_per_day
    s1 = theil_sen(
        _ev(spark, trended)).collect()[0].slope_cents_per_day
    # equivariance holds up to one IEEE rounding per pairwise slope
    # ((dc + 100*s*dd)/dd rounds once; dc/dd + 100*s rounds twice)
    assert abs((s1 - s0) - 100.0 * shift) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    ks=st.integers(min_value=0, max_value=10),
    extra=st.integers(min_value=0, max_value=10),
)
def test_wilson_contains_point_estimate(spark, ks, extra):
    """lo <= k/n <= hi and both bounds in [0, 1] for every (k, n)."""
    from tsaug_spark.plans.stats import wilson_interval

    n = ks + extra
    if n == 0:
        return
    rows = [(1, i, "purchase", 1.0) for i in range(ks)]
    rows += [(1, 100 + i, "click", 1.0) for i in range(extra)]
    r = wilson_interval(_ev(spark, rows)).collect()[0]
    p = ks / n
    assert 0.0 <= r.wilson_lo <= p <= r.wilson_hi <= 1.0


@settings(max_examples=8, deadline=None)
@given(
    a=st.lists(st.integers(min_value=0, max_value=20), min_size=1,
               max_size=12),
    b=st.lists(st.integers(min_value=0, max_value=20), min_size=1,
               max_size=12),
)
def test_ks_matches_scipy_free_reference(spark, a, b):
    """KS equals the brute-force two-sample sup over the union grid."""
    from tsaug_spark.plans.stats import ks_distance

    rows = [(1, i, "click", v) for i, v in enumerate(a)]
    rows += [(1, 100 + i, "error", v) for i, v in enumerate(b)]
    r = ks_distance(_ev(spark, rows), "click", "error").collect()[0]
    xs = sorted(set(a) | set(b))
    aa, bb = np.asarray(sorted(a)), np.asarray(sorted(b))
    ks_ref = max(
        abs(
            np.searchsorted(aa, x, "right") / len(a)
            - np.searchsorted(bb, x, "right") / len(b)
        )
        for x in xs
    )
    assert abs(r.ks - ks_ref) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    ts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
                max_size=20),
)
def test_interval_coverage_bounds_and_union(spark, ts):
    """covered_s equals the measure of the union of [t, t+900) (numpy
    reference) and respects the n*ttl / single-ttl bounds."""
    from tsaug_spark.plans.stats import interval_coverage

    rows = [(1, t, "a", 1.0) for t in ts]
    r = interval_coverage(_ev(spark, rows)).collect()[0]
    marks = np.zeros(max(ts) + 901, dtype=bool)
    for t in ts:
        marks[t:t + 900] = True
    assert r.covered_s == int(marks.sum())
    assert 900 <= r.covered_s <= len(ts) * 900
    assert r.n_intervals <= len(ts)


@settings(max_examples=8, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                  max_size=15),
)
def test_active_streaks_partition_property(spark, days):
    """Streak lengths partition the active-day set; the longest run
    matches a brute-force scan."""
    from tsaug_spark.plans.stats import active_streaks

    rows = [(1, 86400 * d + i, "a", 1.0) for i, d in enumerate(days)]
    r = active_streaks(_ev(spark, rows)).collect()[0]
    uniq = sorted(set(days))
    assert r.active_days == len(uniq)
    best = cur = 1
    for p, q in zip(uniq, uniq[1:]):
        cur = cur + 1 if q == p + 1 else 1
        best = max(best, cur)
    assert r.longest_streak == best


@settings(max_examples=6, deadline=None)
@given(
    seq=st.lists(st.sampled_from("abc"), min_size=3, max_size=40),
)
def test_markov_stationary_is_distribution(spark, seq):
    """pi >= 0 and sum(pi) == 1 within float tolerance for any chain
    (power iteration preserves the simplex)."""
    from tsaug_spark.plans.stats import markov_stationary

    rows = [(1, i, t, 1.0) for i, t in enumerate(seq)]
    out = markov_stationary(_ev(spark, rows)).collect()
    if not out:
        return
    pis = [r.pi for r in out]
    assert all(p >= 0.0 for p in pis)
    assert abs(sum(pis) - 1.0) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-100, max_value=100),
                  min_size=1, max_size=15),
)
def test_mad_matches_numpy_style_reference(spark, vals):
    """MAD equals the two-mid-rank reference computed directly."""
    from tsaug_spark.plans.stats import mad_per_type

    rows = [(1, i, "a", v) for i, v in enumerate(vals)]
    r = mad_per_type(_ev(spark, rows)).collect()[0]

    def midmed(xs):
        xs = sorted(xs)
        m = len(xs)
        lo, hi = (m + 1) // 2 - 1, (m + 2) // 2 - 1
        return (xs[lo] + xs[hi]) / 2.0

    med = midmed([100 * v for v in vals])
    mad = midmed([abs(100 * v - med) for v in vals])
    assert r.median_cents == med
    assert r.mad_cents == mad


@settings(max_examples=8, deadline=None)
@given(
    signs=st.lists(st.booleans(), min_size=4, max_size=30),
)
def test_runs_count_reference(spark, signs):
    """Observed runs match a direct scan; runs in [2, n]."""
    from tsaug_spark.plans.stats import runs_test

    if len(set(signs)) < 2:
        return
    rows = [(1, i, "a", 9.0 if s else 1.0)
            for i, s in enumerate(signs)]
    out = runs_test(_ev(spark, rows)).collect()
    # replicate the engine's dichotomization: two-mid-rank median over
    # cents, median-equal samples dropped, THEN signs and runs
    cents = [900 if s else 100 for s in signs]
    xs = sorted(cents)
    m = len(xs)
    med = (xs[(m + 1) // 2 - 1] + xs[(m + 2) // 2 - 1]) / 2.0
    kept = [c > med for c in cents if c != med]
    n1, n2 = sum(kept), len(kept) - sum(kept)
    if n1 == 0 or n2 == 0 or 2 * n1 * n2 <= n1 + n2:
        assert out == []
        return
    r = out[0]
    assert (r.n1, r.n2) == (n1, n2)
    ref_runs = 1 + sum(
        1 for p, q in zip(kept, kept[1:]) if p != q
    )
    assert r.runs == ref_runs
    assert 2 <= r.runs <= len(kept)
