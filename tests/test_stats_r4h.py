"""Round-4h additions: Breusch-Pagan, Chow break, Cochran's Q,
ICC(1,1), Cohen's d / Hedges' g, partial correlation, CUSUM of
squares, Higuchi fractal dimension — NumPy / pure-Python references.
"""

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


def _daily_value_events(spark, cents_per_day, key="x"):
    """One event per day carrying the day's value (value = cents/100)."""
    rows = []
    for d, c in enumerate(cents_per_day):
        rows.append(
            (d, T0 + dt.timedelta(days=d), 1, key, c / 100.0)
        )
    return spark.createDataFrame(rows, _EVENT_DDL)


def _ols(x, y):
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = len(x)
    b = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    a = (y.sum() - b * x.sum()) / n
    return a, b


# ------------------------------------------------- breusch-pagan


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-500, max_value=500),
        min_size=6,
        max_size=40,
    )
)
def test_breusch_pagan_matches_numpy(spark, cents):
    from tsaug_spark.plans.stats import breusch_pagan

    df = _daily_value_events(spark, cents)
    got = breusch_pagan(df, key_col="event_type").collect()

    x = np.arange(len(cents), dtype=float)
    y = np.asarray(cents, float)
    a, b = _ols(x, y)
    e = y - (a + b * x)
    u = e * e
    n = len(x)
    duu = n * (u * u).sum() - u.sum() ** 2
    if duu <= 0 or (u * u).sum() <= 0:
        assert got == []
        return
    nu = n * (u * x).sum() - x.sum() * u.sum()
    dxx = n * (x * x).sum() - x.sum() ** 2
    lm = n * nu * nu / (dxx * duu)
    assert len(got) == 1
    assert got[0]["n_days"] == n
    assert math.isclose(got[0]["lm_stat"], lm, rel_tol=1e-9)
    assert got[0]["significant"] == (lm > 3.841)


def test_breusch_pagan_flags_heteroskedastic(spark):
    """Variance growing with time must score far above a flat
    series."""
    from tsaug_spark.plans.stats import breusch_pagan

    rng = np.random.RandomState(7)
    n = 60
    flat = (100 + rng.randint(-5, 6, n)).tolist()
    grow = [
        100 + int(rng.randint(-1 - d // 2, 2 + d // 2))
        for d in range(n)
    ]
    df = _daily_value_events(spark, flat, key="flat").unionByName(
        _daily_value_events(spark, grow, key="grow")
    )
    r = {
        row["key"]: row["lm_stat"]
        for row in breusch_pagan(df, key_col="event_type").collect()
    }
    assert r["grow"] > r["flat"]


# ---------------------------------------------------- chow break


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-300, max_value=300),
        min_size=8,
        max_size=40,
    )
)
def test_chow_break_matches_numpy(spark, cents):
    from tsaug_spark.plans.stats import chow_break

    df = _daily_value_events(spark, cents)
    got = chow_break(df, key_col="event_type").collect()

    x = np.arange(len(cents), dtype=float)
    y = np.asarray(cents, float)
    n = len(x)
    mid = int(x.max()) // 2
    lo = x <= mid
    hi = ~lo

    def sse(xs, ys):
        a, b = _ols(xs, ys)
        e = ys - (a + b * xs)
        return float((e * e).sum())

    ok = True
    for seg in (lo, hi):
        xs = x[seg]
        if len(xs) < 3 or len(set(xs.tolist())) < 2:
            ok = False
    if not ok:
        assert got == []
        return
    ssep = sse(x, y)
    sse1 = sse(x[lo], y[lo])
    sse2 = sse(x[hi], y[hi])
    if sse1 + sse2 <= 0:
        assert got == []
        return
    f = ((ssep - sse1 - sse2) / 2.0) / ((sse1 + sse2) / (n - 4.0))
    assert len(got) == 1
    assert got[0]["break_x"] == mid
    assert math.isclose(got[0]["f_stat"], f, rel_tol=1e-7, abs_tol=1e-9)


def test_chow_detects_slope_flip(spark):
    from tsaug_spark.plans.stats import chow_break

    up_down = [100 + 10 * d for d in range(15)]
    up_down += [up_down[-1] - 10 * d for d in range(1, 16)]
    straight = [100 + 10 * d for d in range(30)]
    df = _daily_value_events(spark, up_down, key="kink").unionByName(
        _daily_value_events(spark, straight, key="line")
    )
    r = {
        row["key"]: row["f_stat"]
        for row in chow_break(df, key_col="event_type").collect()
    }
    assert "line" not in r or r["kink"] > r.get("line", 0.0)


# ----------------------------------------------------- cochran q


def test_cochran_q_matches_reference(spark):
    from tsaug_spark.plans.stats import cochran_q

    # presence matrix: 6 days x 3 types, hand-built
    pres = {
        "a": [1, 1, 1, 0, 1, 1],
        "b": [1, 0, 1, 0, 0, 1],
        "c": [0, 0, 1, 0, 0, 1],
    }
    rows, eid = [], 0
    for t, days in pres.items():
        for d, p in enumerate(days):
            if p:
                rows.append(
                    (eid, T0 + dt.timedelta(days=d), 1, t, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = cochran_q(df).collect()
    assert len(got) == 1
    k = 3
    # day 3 has no events at all -> not a block
    mat = np.array(
        [[pres[t][d] for t in "abc"] for d in range(6) if any(
            pres[t][d] for t in "abc"
        )]
    )
    r_i = mat.sum(axis=1)
    c_j = mat.sum(axis=0)
    nn = int(r_i.sum())
    q = (
        (k - 1)
        * (k * int((c_j * c_j).sum()) - nn * nn)
        / (k * nn - int((r_i * r_i).sum()))
    )
    assert got[0]["k_types"] == k
    assert got[0]["n_days"] == mat.shape[0]
    assert math.isclose(got[0]["q_stat"], q, rel_tol=1e-12)
    assert got[0]["dof"] == k - 1


# ------------------------------------------------------ icc(1,1)


def test_icc_oneway_matches_anova(spark):
    from tsaug_spark.plans.stats import icc_oneway

    rng = np.random.RandomState(11)
    # 8 days, hourly counts with strong day effects
    day_level = rng.randint(5, 50, 8)
    rows, eid = [], 0
    counts = np.zeros((8, 24), dtype=int)
    for d in range(8):
        for h in range(24):
            c = int(day_level[d] + rng.randint(0, 3))
            counts[d, h] = c
            for _ in range(c):
                rows.append(
                    (
                        eid,
                        T0 + dt.timedelta(days=d, hours=h,
                                          seconds=eid % 60),
                        1,
                        "x",
                        1.0,
                    )
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = icc_oneway(df).collect()
    assert len(got) == 1
    n, k = counts.shape
    g = counts.sum(axis=1).astype(float)
    t = counts.sum()
    ssb = (g * g).sum() / k - t * t / (k * n)
    ssw = (counts.astype(float) ** 2).sum() - (g * g).sum() / k
    msb = ssb / (n - 1)
    msw = ssw / (n * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert got[0]["n_days"] == n
    assert math.isclose(got[0]["icc"], icc, rel_tol=1e-9)
    # strong day effects -> high ICC
    assert got[0]["icc"] > 0.9


# ------------------------------------------- cohen's d / hedges g


def test_cohens_d_matches_numpy(spark):
    from tsaug_spark.plans.stats import cohens_d_effect

    rng = np.random.RandomState(3)
    ca = rng.randint(20, 40, 12)
    cb = rng.randint(5, 15, 10)
    df = _daily_count_events(spark, ca, key="click").unionByName(
        _daily_count_events(spark, cb, key="purchase")
    )
    got = cohens_d_effect(df).collect()
    assert len(got) == 1
    na, nb = len(ca), len(cb)
    ma, mb = ca.mean(), cb.mean()
    sp2 = (
        (ca.astype(float) ** 2).sum()
        - ca.sum() ** 2 / na
        + (cb.astype(float) ** 2).sum()
        - cb.sum() ** 2 / nb
    ) / (na + nb - 2)
    d = (ma - mb) / math.sqrt(sp2)
    g = (1 - 3 / (4 * (na + nb) - 9)) * d
    assert got[0]["n_a"] == na and got[0]["n_b"] == nb
    assert math.isclose(got[0]["cohens_d"], d, rel_tol=1e-9)
    assert math.isclose(got[0]["hedges_g"], g, rel_tol=1e-9)
    assert abs(got[0]["hedges_g"]) < abs(got[0]["cohens_d"])


# ---------------------------------------------- partial correlation


def test_partial_corr_matches_numpy(spark):
    from tsaug_spark.plans.stats import partial_corr_day

    rng = np.random.RandomState(5)
    rows, eid = [], 0
    for d in range(30):
        base = rng.randint(10, 30)
        nx = base + rng.randint(0, 5)
        ny = base + rng.randint(0, 5)
        nz = rng.randint(1, 10)
        for typ, cnt in (("click", nx), ("purchase", ny),
                         ("view", nz)):
            for _ in range(cnt):
                rows.append(
                    (eid, T0 + dt.timedelta(days=d,
                                            seconds=eid % 3600),
                     1, typ, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = partial_corr_day(df).collect()
    assert len(got) == 1

    per_day = {}
    for r in rows:
        d = (r[1] - T0).days
        per_day.setdefault(d, [0, 0, 0])
        per_day[d][2] += 1
        if r[3] == "click":
            per_day[d][0] += 1
        elif r[3] == "purchase":
            per_day[d][1] += 1
    arr = np.array([per_day[d] for d in sorted(per_day)], float)
    x, y, z = arr[:, 0], arr[:, 1], arr[:, 2]

    def corr(a, b):
        return float(np.corrcoef(a, b)[0, 1])

    rxy, rxz, ryz = corr(x, y), corr(x, z), corr(y, z)
    pc = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert math.isclose(got[0]["r_xy"], rxy, rel_tol=1e-9)
    assert math.isclose(got[0]["r_xy_given_z"], pc, rel_tol=1e-9)
    # x and y co-move only through the shared base -> the partial
    # correlation must shrink toward zero
    assert abs(got[0]["r_xy_given_z"]) < abs(got[0]["r_xy"])


# ------------------------------------------------ cusum of squares


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-200, max_value=200),
        min_size=4,
        max_size=40,
    )
)
def test_cusum_squares_matches_numpy(spark, cents):
    from tsaug_spark.plans.stats import cusum_squares

    df = _daily_value_events(spark, cents)
    got = cusum_squares(df, key_col="event_type").collect()
    y2 = np.asarray(cents, dtype=object) ** 2
    sn = int(y2.sum())
    if sn <= 0:
        assert got == []
        return
    n = len(cents)
    st_ = np.cumsum(y2)
    dd = np.abs(
        np.array([int(v) for v in st_], float) / sn
        - np.arange(1, n + 1, dtype=float) / n
    )
    best = int(np.argmax(dd))  # numpy argmax = first max = min day
    assert len(got) == 1
    assert got[0]["n_days"] == n
    assert math.isclose(got[0]["cs_stat"], dd[best], rel_tol=1e-12)
    assert got[0]["break_day"] == (T0 - dt.datetime(1970, 1, 1)).days + best


def test_cusum_squares_finds_variance_break(spark):
    from tsaug_spark.plans.stats import cusum_squares

    rng = np.random.RandomState(9)
    quiet = rng.randint(-5, 6, 30)
    loud = rng.randint(-200, 201, 30)
    cents = np.concatenate([quiet, loud]).tolist()
    df = _daily_value_events(spark, cents)
    got = cusum_squares(df, key_col="event_type").collect()
    epoch_day = (T0 - dt.datetime(1970, 1, 1)).days
    # the maximal divergence sits at the regime boundary (+/- 2 days)
    assert abs(got[0]["break_day"] - (epoch_day + 29)) <= 2
    assert got[0]["cs_stat"] > 0.3


# ------------------------------------------------------ higuchi fd


def test_higuchi_matches_numpy(spark):
    from tsaug_spark.plans.stats import higuchi_fd

    rng = np.random.RandomState(13)
    counts = rng.randint(0, 20, 72)
    rows, eid = [], 0
    for h, c in enumerate(counts):
        for _ in range(int(c)):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, seconds=eid % 60),
                 1, "x", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = higuchi_fd(df).collect()
    assert len(got) == 1
    x = counts.astype(int)
    nh = len(x)
    ls = {}
    for k in (1, 2, 4):
        dk = int(np.abs(x[k:] - x[:-k]).sum())
        ls[k] = (nh - 1) * dk / k**3
    hfd = (math.log(ls[1]) - math.log(ls[4])) / (2 * math.log(2))
    assert got[0]["n_hours"] == nh
    for k, col in ((1, "l1"), (2, "l2"), (4, "l4")):
        assert math.isclose(got[0][col], ls[k], rel_tol=1e-12)
    assert math.isclose(got[0]["hfd"], hfd, rel_tol=1e-12)


def test_higuchi_rougher_series_scores_higher(spark):
    from tsaug_spark.plans.stats import higuchi_fd

    rng = np.random.RandomState(17)
    noise = rng.randint(0, 40, 96)
    smooth = (20 + 10 * np.sin(np.arange(96) / 8.0)).astype(int)
    rows, eid = [], 0
    for key, series in (("noise", noise), ("smooth", smooth)):
        for h, c in enumerate(series):
            for _ in range(int(c)):
                rows.append(
                    (eid, T0 + dt.timedelta(hours=h,
                                            seconds=eid % 60),
                     1, key, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    r = {row["key"]: row["hfd"] for row in higuchi_fd(df).collect()}
    assert r["noise"] > r["smooth"]
