"""Round-4k additions: turning-point/difference-sign screens, von
Neumann ratio, Siegel repeated medians — pure-Python references."""

from __future__ import annotations

import datetime as dt
import math
import statistics

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


def _daily_value_events(spark, cents_per_day, key="x"):
    rows = []
    for d, c in enumerate(cents_per_day):
        rows.append(
            (d, T0 + dt.timedelta(days=d), 1, key, c / 100.0)
        )
    return spark.createDataFrame(rows, _EVENT_DDL)


# --------------------------------------------------- turning points


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=20),
        min_size=4,
        max_size=30,
    )
)
def test_turning_points_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import turning_points

    df = _daily_count_events(spark, counts)
    got = turning_points(df, key_col="event_type").collect()
    n = len(counts)
    t = sum(
        1
        for i in range(1, n - 1)
        if (counts[i - 1] < counts[i] > counts[i + 1])
        or (counts[i - 1] > counts[i] < counts[i + 1])
    )
    s = sum(
        1 for i in range(1, n) if counts[i] > counts[i - 1]
    )
    tp_z = (t - 2.0 * (n - 2) / 3.0) / math.sqrt(
        (16.0 * n - 29.0) / 90.0
    )
    ds_z = (s - (n - 1) / 2.0) / math.sqrt((n + 1) / 12.0)
    assert len(got) == 1
    r = got[0]
    assert (r["n_days"], r["n_turning"], r["n_rises"]) == (n, t, s)
    assert math.isclose(r["tp_z"], tp_z, rel_tol=1e-12)
    assert math.isclose(r["ds_z"], ds_z, rel_tol=1e-12)


def test_turning_points_flags_monotone_series(spark):
    from tsaug_spark.plans.stats import turning_points

    up = list(range(1, 25))
    r = turning_points(
        _daily_count_events(spark, up), key_col="event_type"
    ).collect()[0]
    assert r["n_turning"] == 0
    assert r["tp_z"] < -3  # far fewer turns than random
    assert r["ds_z"] > 3  # far more rises than random


# ------------------------------------------------------ von neumann


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-300, max_value=300),
        min_size=3,
        max_size=30,
    )
)
def test_von_neumann_matches_reference(spark, cents):
    from tsaug_spark.plans.stats import von_neumann

    df = _daily_value_events(spark, cents)
    got = von_neumann(df, key_col="event_type").collect()
    n = len(cents)
    sx = sum(cents)
    sxx = sum(c * c for c in cents)
    sd2 = sum(
        (cents[i] - cents[i - 1]) ** 2 for i in range(1, n)
    )
    den = n * sxx - sx * sx
    if den <= 0:
        assert got == []
        return
    vn = n * sd2 / den
    assert len(got) == 1
    assert got[0]["n_days"] == n
    assert math.isclose(got[0]["vn_ratio"], vn, rel_tol=1e-12)


def test_von_neumann_separates_smooth_from_alternating(spark):
    from tsaug_spark.plans.stats import von_neumann

    smooth = [100 + 2 * d for d in range(30)]
    alt = [100 + (50 if d % 2 else -50) for d in range(30)]
    df = _daily_value_events(spark, smooth, key="smooth").unionByName(
        _daily_value_events(spark, alt, key="alt")
    )
    r = {
        row["key"]: row["vn_ratio"]
        for row in von_neumann(df, key_col="event_type").collect()
    }
    assert r["smooth"] < 0.5  # trending: tiny successive diffs
    assert r["alt"] > 3.0  # alternating: diffs dwarf variance


# ------------------------------------------------- siegel slopes


def _siegel_ref(cents):
    n = len(cents)
    meds = []
    for i in range(n):
        sl = sorted(
            (cents[j] - cents[i]) / (j - i)
            for j in range(n)
            if j != i
        )
        m = len(sl)
        meds.append((sl[(m + 1) // 2 - 1] + sl[(m + 2) // 2 - 1]) / 2)
    meds.sort()
    m = len(meds)
    return (meds[(m + 1) // 2 - 1] + meds[(m + 2) // 2 - 1]) / 2


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-200, max_value=200),
        min_size=3,
        max_size=20,
    )
)
def test_siegel_matches_reference(spark, cents):
    from tsaug_spark.plans.stats import siegel_slopes

    df = _daily_value_events(spark, cents)
    got = siegel_slopes(df, key_col="event_type").collect()
    assert len(got) == 1
    assert got[0]["n_days"] == len(cents)
    # reference inner median sorts by slope only; the engine breaks
    # slope ties by dj — the AVERAGED two-middle median is identical
    # either way because tied slopes are equal values
    assert math.isclose(
        got[0]["slope_cents_per_day"],
        _siegel_ref(cents),
        rel_tol=1e-9,
        abs_tol=1e-12,
    )


def test_siegel_resists_half_contamination(spark):
    """50%-ish outliers: repeated medians should hold the clean slope
    where the plain pairwise median (Theil-Sen) degrades."""
    from tsaug_spark.plans.stats import siegel_slopes

    n = 21
    clean = [100 * d for d in range(n)]
    dirty = list(clean)
    rng = np.random.RandomState(3)
    for d in range(1, n, 2):  # corrupt 10 of 21 days
        dirty[d] = int(rng.randint(-50000, 50000))
    df = _daily_value_events(spark, dirty)
    got = siegel_slopes(df, key_col="event_type").collect()[0]
    assert abs(got["slope_cents_per_day"] - 100.0) < 60.0
