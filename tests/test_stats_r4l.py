"""Round-4l additions: Hoover/Atkinson inequality, HHI concentration,
rolling beta, winsorized mean — pure-Python references."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2024, 1, 1)

_EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def _daily_count_events(spark, counts, key="x"):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(int(c)):
            rows.append(
                (eid, T0 + dt.timedelta(days=d, minutes=eid % 60),
                 1, key, 1.0)
            )
            eid += 1
    return spark.createDataFrame(rows, _EVENT_DDL)


# ------------------------------------------------ hoover / atkinson


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=50),
        min_size=2,
        max_size=25,
    )
)
def test_hoover_and_atkinson_match_reference(spark, counts):
    from tsaug_spark.plans.stats import atkinson_index, hoover_index

    df = _daily_count_events(spark, counts)
    hv = hoover_index(df, key_col="event_type").collect()
    at = atkinson_index(df, key_col="event_type").collect()
    n = len(counts)
    yy = sum(counts)
    hoover = sum(abs(n * y - yy) for y in counts) / (2.0 * n * yy)
    atkinson = 1.0 - math.exp(
        sum(math.log(y) for y in counts) / n
    ) / (yy / n)
    assert len(hv) == 1 and len(at) == 1
    assert hv[0]["n_days"] == at[0]["n_days"] == n
    assert math.isclose(hv[0]["hoover"], hoover, rel_tol=1e-12)
    assert math.isclose(
        at[0]["atkinson"], atkinson, rel_tol=1e-9, abs_tol=1e-12
    )
    # both indices live in [0, 1) and vanish on equal days
    assert 0 <= hv[0]["hoover"] < 1
    assert 0 <= at[0]["atkinson"] < 1


def test_inequality_zero_for_uniform_days(spark):
    from tsaug_spark.plans.stats import atkinson_index, hoover_index

    df = _daily_count_events(spark, [7] * 12)
    assert hoover_index(df, key_col="event_type").collect()[0][
        "hoover"
    ] == 0.0
    assert abs(
        atkinson_index(df, key_col="event_type").collect()[0][
            "atkinson"
        ]
    ) < 1e-12


# ----------------------------------------------------------- hhi


def test_hhi_matches_reference(spark):
    from tsaug_spark.plans.stats import hhi_daily

    mix = {"a": 60, "b": 30, "c": 10}
    rows, eid = [], 0
    for t, c in mix.items():
        for _ in range(c):
            rows.append((eid, T0, 1, t, 1.0))
            eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    r = hhi_daily(df).collect()[0]
    hhi = (60**2 + 30**2 + 10**2) / 100.0**2
    assert r["n_events"] == 100 and r["n_types"] == 3
    assert math.isclose(r["hhi"], hhi, rel_tol=1e-12)
    assert math.isclose(r["effective_types"], 1 / hhi,
                        rel_tol=1e-12)


def test_hhi_bounds(spark):
    from tsaug_spark.plans.stats import hhi_daily

    # day 0: monopoly -> hhi 1; day 1: 4-way even -> hhi 0.25
    rows = [(i, T0, 1, "a", 1.0) for i in range(10)]
    rows += [
        (10 + i, T0 + dt.timedelta(days=1), 1, "abcd"[i % 4], 1.0)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = {r["bucket_s"]: r for r in hhi_daily(df).collect()}
    d0 = int((T0 - dt.datetime(1970, 1, 1)).total_seconds())
    assert got[d0]["hhi"] == 1.0
    assert math.isclose(got[d0 + 86400]["hhi"], 0.25)
    assert math.isclose(got[d0 + 86400]["effective_types"], 4.0)


# -------------------------------------------------- rolling beta


def test_rolling_beta_matches_reference(spark):
    from tsaug_spark.plans.stats import rolling_beta

    rng = np.random.RandomState(53)
    days = 20
    x = rng.randint(5, 30, days)
    y = 2 * x + rng.randint(0, 4, days)
    rows, eid = [], 0
    for d in range(days):
        for typ, c in (("click", int(x[d])), ("purchase", int(y[d]))):
            for _ in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(days=d), 1, typ, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = {r["bucket_s"]: r for r in rolling_beta(df).collect()}
    d0 = int((T0 - dt.datetime(1970, 1, 1)).total_seconds())
    for d in range(2, days):
        lo = max(0, d - 6)
        xs = x[lo:d + 1].astype(float)
        ys = y[lo:d + 1].astype(float)
        n = len(xs)
        den = n * (xs * xs).sum() - xs.sum() ** 2
        if den <= 0:
            assert d0 + 86400 * d not in got
            continue
        beta = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / den
        r = got[d0 + 86400 * d]
        assert r["n_win"] == n
        assert math.isclose(r["beta"], beta, rel_tol=1e-12)
        assert 1.5 < r["beta"] < 2.5  # the planted coupling


# ----------------------------------------------- winsorized mean


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=100),
        min_size=3,
        max_size=30,
    )
)
def test_winsorized_mean_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import winsorized_mean

    df = _daily_count_events(spark, counts)
    got = winsorized_mean(df, key_col="event_type").collect()
    n = len(counts)
    k = n // 10
    s = sorted(counts)
    wins = s[k:n - k] if k else list(s)
    total = sum(wins) + k * s[k] + k * s[n - k - 1]
    wmean = total / n
    assert len(got) == 1
    assert got[0]["n_days"] == n and got[0]["k_clipped"] == k
    assert math.isclose(got[0]["wins_mean"], wmean, rel_tol=1e-12)


def test_winsorized_mean_resists_outlier(spark):
    from tsaug_spark.plans.stats import winsorized_mean

    counts = [10] * 19 + [10000]
    got = winsorized_mean(
        _daily_count_events(spark, counts), key_col="event_type"
    ).collect()[0]
    assert got["k_clipped"] == 2
    assert got["wins_mean"] == 10.0  # the spike is clamped to 10
