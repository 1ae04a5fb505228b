"""Round-4b statistics: Lomb-Scargle periodogram, Friedman test,
Cramer-von Mises uniformity, Grubbs outlier statistic — each checked
against an independent NumPy brute-force reference on randomized
inputs, plus signal-recovery sanity checks."""

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


def _slot_events(spark, slot_values, key="a"):
    """One event per (5-min slot index, value) pair: the slot's cents
    sum is exactly round(value*100)."""
    rows = [
        (i, T0 + dt.timedelta(seconds=300 * int(t5)), 1, key, float(v))
        for i, (t5, v) in enumerate(slot_values)
    ]
    return spark.createDataFrame(rows, _EVENT_DDL)


def _ref_lomb_scargle(t5s, cents, m):
    """NumPy twin of plans/stats.py::lomb_scargle for one key and one
    period: same trig table values, same tau-free quadratic form."""
    t5s = np.asarray(t5s, dtype=np.int64)
    x = np.asarray(cents, dtype=np.float64)
    idx = t5s % m
    c = np.array(
        [math.cos(2.0 * math.pi * i / float(m)) for i in idx]
    )
    s = np.array(
        [math.sin(2.0 * math.pi * i / float(m)) for i in idx]
    )
    n = float(len(x))
    sc, ss = c.sum(), s.sum()
    scc, sss, scs = (c * c).sum(), (s * s).sum(), (c * s).sum()
    sxc, sxs, sx, sx2 = (
        (x * c).sum(), (x * s).sum(), x.sum(), (x * x).sum()
    )
    xbar = sx / n
    yc = sxc - xbar * sc
    ys = sxs - xbar * ss
    cc_ = scc - sc * sc / n
    ss_ = sss - ss * ss / n
    cs_ = scs - sc * ss / n
    det = cc_ * ss_ - cs_ * cs_
    ssy = sx2 - sx * sx / n
    num = yc * yc * ss_ - 2.0 * yc * ys * cs_ + ys * ys * cc_
    return num / (det * ssy)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4000),
            st.floats(
                min_value=0.01, max_value=500.0, allow_nan=False
            ),
        ),
        min_size=12,
        max_size=60,
        unique_by=lambda tv: tv[0],
    )
)
def test_lomb_scargle_matches_numpy(spark, slot_values):
    from tsaug_spark.plans.stats import lomb_scargle

    slot_values = [(t, round(v, 2)) for t, v in slot_values]
    df = _slot_events(spark, slot_values)
    got = {
        r["period_h"]: r["power"]
        for r in lomb_scargle(df).collect()
    }
    t5s = [t for t, _ in slot_values]
    cents = [round(v * 100) for _, v in slot_values]
    for m, ph in ((72, 6), (144, 12), (288, 24)):
        want = _ref_lomb_scargle(t5s, cents, m)
        if ph in got:
            assert abs(got[ph] - want) <= 1e-9 * max(1.0, abs(want))
        # absent => filtered (degenerate det/ssy), which the
        # reference would have made non-finite or the guard caught


def test_lomb_scargle_recovers_planted_24h_cycle(spark):
    from tsaug_spark.plans.stats import lomb_scargle

    rng = np.random.RandomState(7)
    # irregular subset of a 4-day slot grid, pure 24 h sinusoid
    t5s = np.sort(
        rng.choice(np.arange(4 * 288), size=200, replace=False)
    )
    vals = [
        round(100.0 + 50.0 * math.sin(2.0 * math.pi * t / 288.0), 2)
        for t in t5s
    ]
    df = _slot_events(spark, list(zip(t5s.tolist(), vals)))
    got = {
        r["period_h"]: r["power"]
        for r in lomb_scargle(df).collect()
    }
    assert got[24] > 0.999  # noiseless sinusoid: R^2 ~ 1
    assert got[24] > got[6] and got[24] > got[12]


def _daily_events(spark, counts_by_key):
    """counts_by_key: {key: [day0_cnt, day1_cnt, ...]}; every day with
    a positive total gets that many events per key."""
    rows = []
    eid = 0
    for key, counts in counts_by_key.items():
        for d, c in enumerate(counts):
            for j in range(int(c)):
                rows.append(
                    (
                        eid,
                        T0 + dt.timedelta(days=d, seconds=j + 1),
                        1,
                        key,
                        1.0,
                    )
                )
                eid += 1
    return spark.createDataFrame(rows, _EVENT_DDL)


def _ref_friedman(table):
    """table: 2-D array days x keys of counts (dense).  Average-rank
    Friedman Q, no tie correction."""
    table = np.asarray(table, dtype=np.float64)
    n, k = table.shape
    r_sums = np.zeros(k)
    for row in table:
        order = np.argsort(row, kind="mergesort")
        ranks = np.empty(k)
        i = 0
        while i < k:
            j = i
            while (
                j + 1 < k
                and row[order[j + 1]] == row[order[i]]
            ):
                j += 1
            avg = (i + j) / 2.0 + 1.0
            for t in range(i, j + 1):
                ranks[order[t]] = avg
            i = j + 1
        r_sums += ranks
    return 12.0 / (n * k * (k + 1)) * (r_sums ** 2).sum() - 3.0 * n * (
        k + 1
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=3,
            max_size=3,
        ),
        min_size=4,
        max_size=12,
    ).filter(lambda rows: all(sum(r) > 0 for r in rows))
)
def test_friedman_matches_reference(spark, rows):
    from tsaug_spark.plans.stats import friedman_test

    keys = ["a", "b", "c"]
    counts_by_key = {
        key: [row[j] for row in rows] for j, key in enumerate(keys)
    }
    df = _daily_events(spark, counts_by_key)
    got = friedman_test(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_days"] == len(rows)
    assert r["k_types"] == 3
    want = _ref_friedman(rows)
    assert abs(r["q_stat"] - want) <= 1e-9 * max(1.0, abs(want))


def test_friedman_equal_counts_gives_zero(spark):
    from tsaug_spark.plans.stats import friedman_test

    df = _daily_events(spark, {"a": [3] * 6, "b": [3] * 6})
    r = friedman_test(df).collect()[0]
    assert r["q_stat"] == 0.0
    assert r["dof"] == 1


def _micro_events(spark, micros_of_day, key="a", day=0):
    rows = [
        (
            i,
            T0
            + dt.timedelta(days=day)
            + dt.timedelta(microseconds=int(us)),
            1,
            key,
            1.0,
        )
        for i, us in enumerate(micros_of_day)
    ]
    return spark.createDataFrame(rows, _EVENT_DDL)


def _ref_cvm(micros_of_day):
    u = np.sort(
        np.array(micros_of_day, dtype=np.float64) / 86400000000.0
    )
    n = len(u)
    i = np.arange(1, n + 1)
    return 1.0 / (12.0 * n) + (
        (u - (2.0 * i - 1.0) / (2.0 * n)) ** 2
    ).sum()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=86399999999),
        min_size=5,
        max_size=60,
        unique=True,
    )
)
def test_cvm_matches_reference(spark, micros):
    from tsaug_spark.plans.stats import cvm_uniform

    df = _micro_events(spark, micros)
    got = cvm_uniform(df).collect()
    assert len(got) == 1
    want = _ref_cvm(micros)
    assert abs(got[0]["w2"] - want) <= 1e-9 * max(1.0, abs(want))
    assert got[0]["n"] == len(micros)


def test_cvm_uniform_grid_is_minimal(spark):
    """u_(i) exactly at (2i-1)/(2n) minimizes W^2 to 1/(12n)."""
    from tsaug_spark.plans.stats import cvm_uniform

    n = 24
    micros = [
        int((2 * i - 1) * 86400000000 // (2 * n)) for i in range(1, n + 1)
    ]
    got = cvm_uniform(_micro_events(spark, micros)).collect()[0]
    assert got["w2"] < 1.0 / (12.0 * n) + 1e-4


def _ref_grubbs(counts):
    x = np.asarray(counts, dtype=np.float64)
    n = len(x)
    mean = x.sum() / n
    s2 = (
        (x * x).sum() - x.sum() * x.sum() / n
    ) / (n - 1)
    return max(mean - x.min(), x.max() - mean) / math.sqrt(s2)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=30),
        min_size=3,
        max_size=20,
    ).filter(lambda xs: len(set(xs)) > 1)
)
def test_grubbs_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import grubbs_test

    df = _daily_events(spark, {"a": counts})
    got = grubbs_test(df).collect()
    assert len(got) == 1
    want = _ref_grubbs(counts)
    assert abs(got[0]["g_stat"] - want) <= 1e-9 * max(1.0, abs(want))
    x = np.asarray(counts, dtype=np.float64)
    side = "high" if x.max() - x.mean() >= x.mean() - x.min() else "low"
    assert got[0]["side"] == side


def test_grubbs_flags_planted_spike(spark):
    from tsaug_spark.plans.stats import grubbs_test

    counts = [5, 6, 5, 4, 6, 5, 50, 5, 6, 5]
    got = grubbs_test(
        _daily_events(spark, {"a": counts})
    ).collect()[0]
    assert got["g_stat"] > 2.5
    assert got["side"] == "high"


def _hourly_count_events(spark, counts_by_day_hour, key="a"):
    """counts_by_day_hour: {(day, hour): cnt}."""
    rows = []
    eid = 0
    for (d, h), c in sorted(counts_by_day_hour.items()):
        for j in range(int(c)):
            rows.append(
                (
                    eid,
                    T0
                    + dt.timedelta(days=d, hours=h, seconds=j + 1),
                    1,
                    key,
                    1.0,
                )
            )
            eid += 1
    return spark.createDataFrame(rows, _EVENT_DDL)


def _ref_mk_seasonal(table):
    """table: days x 24 array of counts.  Returns (s, var18, z)."""
    table = np.asarray(table, dtype=np.int64)
    n_days, n_seasons = table.shape
    s = 0
    var18 = 0
    for sn in range(n_seasons):
        col = table[:, sn]
        for i in range(n_days):
            for j in range(i + 1, n_days):
                s += int(np.sign(col[j] - col[i]))
        _, t = np.unique(col, return_counts=True)
        tie = int((t * (t - 1) * (2 * t + 5)).sum())
        var18 += n_days * (n_days - 1) * (2 * n_days + 5) - tie
    var = var18 / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var18, z


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=5),
            min_size=24,
            max_size=24,
        ),
        min_size=3,
        max_size=8,
    ).filter(
        lambda rows: sum(rows[0]) > 0 and sum(rows[-1]) > 0
    )
)
def test_mk_seasonal_matches_reference(spark, rows):
    from tsaug_spark.plans.stats import mk_seasonal

    counts = {
        (d, h): rows[d][h]
        for d in range(len(rows))
        for h in range(24)
        if rows[d][h]
    }
    df = _hourly_count_events(spark, counts)
    got = mk_seasonal(df).collect()
    s, var18, z = _ref_mk_seasonal(rows)
    if var18 == 0:
        assert got == []
        return
    assert len(got) == 1
    r = got[0]
    assert r["n_days"] == len(rows)
    assert r["s_stat"] == s
    assert r["var18"] == var18
    assert abs(r["z"] - z) <= 1e-12 * max(1.0, abs(z))


def test_mk_seasonal_ignores_pure_diurnal_cycle(spark):
    """A perfectly repeating diurnal pattern has NO seasonal trend:
    every stratum is constant, so S = 0 and var18 = 0 (all ties) —
    the key is filtered out rather than reported trending."""
    from tsaug_spark.plans.stats import mk_seasonal

    rows = [[(h % 4) + 1 for h in range(24)] for _ in range(5)]
    counts = {
        (d, h): rows[d][h] for d in range(5) for h in range(24)
    }
    got = mk_seasonal(
        _hourly_count_events(spark, counts)
    ).collect()
    assert got == []  # all-tied strata: var18 = 0, no false trend


def _ref_kuiper(micros):
    u = np.sort(
        np.array(micros, dtype=np.float64) / 86400000000.0
    )
    n = len(u)
    i = np.arange(1, n + 1)
    dp = (i / n - u).max()
    dm = (u - (i - 1) / n).max()
    return dp, dm, dp + dm


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=86399999999),
        min_size=5,
        max_size=50,
        unique=True,
    )
)
def test_kuiper_matches_reference(spark, micros):
    from tsaug_spark.plans.stats import kuiper_uniform

    got = kuiper_uniform(_micro_events(spark, micros)).collect()
    assert len(got) == 1
    dp, dm, v = _ref_kuiper(micros)
    r = got[0]
    assert abs(r["d_plus"] - dp) <= 1e-12
    assert abs(r["d_minus"] - dm) <= 1e-12
    assert abs(r["v_stat"] - v) <= 1e-12


def test_kuiper_is_rotation_invariant(spark):
    from tsaug_spark.plans.stats import kuiper_uniform

    rng = np.random.RandomState(3)
    micros = sorted(
        int(x) for x in rng.randint(0, 86400000000, size=40)
    )
    shift = 31_000_000_000
    rotated = sorted(
        (m + shift) % 86400000000 for m in micros
    )
    v0 = kuiper_uniform(
        _micro_events(spark, micros)
    ).collect()[0]["v_stat"]
    v1 = kuiper_uniform(
        _micro_events(spark, rotated)
    ).collect()[0]["v_stat"]
    assert abs(v0 - v1) <= 1e-9


def _ref_newey_west(y, lags=5):
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    sx, sy = t.sum(), y.sum()
    sxy, sxx = (t * y).sum(), (t * t).sum()
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    tbar = sx / n
    den = sxx - sx * sx / n
    e = y - a - b * t
    g = (t - tbar) * e
    s2 = (g * g).sum()
    for l in range(1, lags + 1):
        w = 2.0 * (1.0 - l / float(lags + 1))
        s2 += w * (g[:-l] * g[l:]).sum()
    se_nw = math.sqrt(s2) / den
    se_ols = math.sqrt(((e * e).sum() / (n - 2)) / den)
    return b, se_ols, se_nw


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=12),
        min_size=9,
        max_size=25,
    ).filter(
        lambda xs: xs[0] > 0 and xs[-1] > 0 and len(set(xs)) > 1
    )
)
def test_newey_west_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import newey_west_trend

    df = _daily_events(spark, {"a": counts})
    got = newey_west_trend(df).collect()
    b, se_ols, se_nw = _ref_newey_west(counts)
    if not (se_nw > 0):
        assert got == []
        return
    assert len(got) == 1
    r = got[0]
    assert abs(r["slope"] - b) <= 1e-9 * max(1.0, abs(b))
    assert abs(r["se_ols"] - se_ols) <= 1e-9 * max(1.0, se_ols)
    assert abs(r["se_nw"] - se_nw) <= 1e-9 * max(1.0, se_nw)


def test_newey_west_penalizes_autocorrelation(spark):
    """A smooth AR-like series must get se_nw > se_ols; white noise
    must not get a large penalty."""
    from tsaug_spark.plans.stats import newey_west_trend

    smooth = [
        int(10 + 8 * math.sin(2 * math.pi * d / 14)) for d in range(28)
    ]
    r = newey_west_trend(
        _daily_events(spark, {"a": smooth})
    ).collect()[0]
    assert r["se_nw"] > r["se_ols"]
