"""Property tests for the round-3 continuation operators: random
inputs vs independent brute-force references (hypothesis)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2024, 1, 1)


def _events_from_counts(spark, counts_by_user):
    """counts_by_user: list of per-day event counts per user id."""
    rows = []
    eid = 0
    for uid, days in enumerate(counts_by_user):
        for d, c in enumerate(days):
            for k in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(days=d, seconds=k), uid)
                )
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


@settings(max_examples=8, deadline=None)
@given(
    days=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=4,
                 max_size=10),
        min_size=1, max_size=3,
    )
)
def test_mann_kendall_property(spark, days):
    """Random small count series: S, tie-corrected z, and Sen slope
    match the O(n^2) reference for every user (users must share a day
    grid, so series are padded to the longest)."""
    from tsaug_spark.plans.metrics import mann_kendall

    T = max(len(d) for d in days)
    days = [d + [0] * (T - len(d)) for d in days]
    if all(sum(d) == 0 for d in days):
        return  # no events at all -> empty frame
    # drop leading/trailing all-zero days to match the observed grid
    lo = min(
        next(i for i, c in enumerate(d) if c) if any(d) else T
        for d in days
    )
    hi = max(
        (len(d) - 1 - next(
            i for i, c in enumerate(reversed(d)) if c
        )) if any(d) else -1
        for d in days
    )
    days = [d[lo:hi + 1] for d in days]
    T = hi + 1 - lo
    df = _events_from_counts(spark, days)
    out = {r.key: r for r in mann_kendall(df, "1d").collect()}
    for uid, x in enumerate(days):
        if uid not in out:
            assert sum(x) == 0
            continue
        n = T
        S = sum(
            (0 if x[j] == x[i] else (1 if x[j] > x[i] else -1))
            for i in range(n) for j in range(i + 1, n)
        )
        slopes = sorted(
            (x[j] - x[i]) / (j - i)
            for i in range(n) for j in range(i + 1, n)
        )
        m = len(slopes)
        sen = (
            slopes[m // 2]
            if m % 2
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        )
        _vals, t = np.unique(np.array(x), return_counts=True)
        var = (n * (n - 1) * (2 * n + 5)
               - int((t * (t - 1) * (2 * t + 5)).sum())) / 18.0
        r = out[uid]
        assert r.s_stat == S and r.n == n
        assert abs(r.sen_slope - sen) < 1e-12
        if var == 0:
            assert r.z is None
        else:
            zz = ((S - 1) if S > 0 else (S + 1) if S < 0 else 0)
            assert abs(r.z - zz / math.sqrt(var)) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=500.0, width=16),
        min_size=3, max_size=60,
    ),
    q=st.sampled_from([0.25, 0.5, 0.9, 0.99]),
)
def test_ddsketch_relative_error_property(spark, vals, q):
    """The DDSketch guarantee holds for arbitrary 2-decimal value sets
    (including zeros, which land in the zero bucket): the q-quantile
    estimate is within alpha of the ceil(q*n)-th smallest value."""
    from tsaug_spark.plans.sketches import (
        DD_ALPHA,
        dd_partial,
        dd_quantile,
    )

    vals = [round(v, 2) for v in vals]
    rows = [
        (i, T0 + dt.timedelta(seconds=i), 1, float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = dd_quantile(dd_partial(df, "1d"), [q]).collect()
    assert len(out) == 1
    exact = sorted(vals)[math.ceil(q * len(vals)) - 1]
    got = out[0].est
    assert abs(got - exact) <= DD_ALPHA * exact + 0.005, (
        vals, q, got, exact,
    )


@settings(max_examples=6, deadline=None)
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=9), min_size=18,
        max_size=30,
    ),
    m=st.sampled_from([3, 4]),
)
def test_motif_pair_property(spark, xs, m):
    """Random integer series: the motif kernel's winning pair equals
    the brute-force scan under the same (dist, i, j) order."""
    from tsaug_spark.plans.metrics import motif_pair

    df = spark.createDataFrame(
        [("u", t, float(v)) for t, v in enumerate(xs)],
        "conv_id string, bucket_idx long, cnt double",
    )
    got = motif_pair(df, m=m).collect()
    x = np.asarray(xs, dtype=float)
    n_sub = len(x) - m + 1
    zs = []
    for i in range(n_sub):
        w = x[i:i + m]
        sig = np.sqrt(m * (w * w).sum() - w.sum() ** 2) / m
        zs.append(np.zeros(m) if sig == 0 else (w - w.sum() / m) / sig)
    best = None
    for i in range(n_sub):
        for j in range(i + m, n_sub):
            d = float(np.sqrt(((zs[i] - zs[j]) ** 2).sum()))
            if best is None or (d, i, j) < best:
                best = (d, i, j)
    if best is None:
        assert got == []
    else:
        assert (got[0].i, got[0].j) == (best[1], best[2])
        assert abs(got[0].dist - best[0]) < 1e-9
