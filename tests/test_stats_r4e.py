"""Round-4e time-series statistics: KPSS, permutation entropy,
theta-method forecast, Engle-Granger cointegration — NumPy
brute-force references plus signal-recovery sanity checks."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2024, 1, 1)

_EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def _hourly_events(spark, counts, key="x"):
    """counts[h] events in hour h (dense series == the counts)."""
    rows, eid = [], 0
    for h, c in enumerate(counts):
        for _ in range(int(c)):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, minutes=eid % 50),
                 1, key, 1.0)
            )
            eid += 1
    # anchor both ends so the global grid equals len(counts)
    assert counts[0] > 0 and counts[-1] > 0
    return spark.createDataFrame(rows, _EVENT_DDL)


# ------------------------------------------------------------- kpss


def _ref_kpss(x, lags=12):
    x = np.asarray(x, float)
    t = len(x)
    e = x - x.mean()
    s = np.cumsum(e)
    eta = (s**2).sum() / (t * t)
    g0 = (e * e).sum() / t
    lrv = g0
    for j in range(1, lags + 1):
        w = 2.0 * (1.0 - j / (lags + 1.0))
        lrv += w * (e[:-j] * e[j:]).sum() / t
    return eta / lrv


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=12),
        min_size=16,
        max_size=60,
    )
)
def test_kpss_matches_numpy(spark, counts):
    from tsaug_spark.plans.stats import kpss_level

    df = _hourly_events(spark, counts)
    out = {r["key"]: r for r in kpss_level(df).collect()}
    ref = _ref_kpss(counts)
    if not np.isfinite(ref) or ref <= 0 and "x" not in out:
        return
    x = np.asarray(counts, float)
    e = x - x.mean()
    lrv_check = (e * e).sum()
    if lrv_check == 0:
        assert "x" not in out
        return
    r = out["x"]
    assert r["n_hours"] == len(counts)
    assert math.isclose(r["kpss_stat"], ref, rel_tol=1e-7)


def test_kpss_trend_vs_noise(spark):
    """A trending series scores far above a flat noisy one."""
    from tsaug_spark.plans.stats import kpss_level

    rng = np.random.RandomState(3)
    noise = np.clip(rng.poisson(8, 240), 1, None)
    trend = noise + np.arange(240) // 8
    rows, eid = [], 0
    for key, series in (("flat", noise), ("trend", trend)):
        for h, c in enumerate(series):
            for _ in range(int(c)):
                rows.append(
                    (eid, T0 + dt.timedelta(hours=h, minutes=7),
                     1, key, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    out = {r["key"]: r["kpss_stat"] for r in kpss_level(df).collect()}
    assert out["trend"] > 5 * out["flat"]


# ---------------------------------------------- permutation entropy


def _ref_perm_entropy(x):
    pats = Counter()
    for i in range(len(x) - 2):
        a, b, c = x[i], x[i + 1], x[i + 2]
        ka, kb, kc = (a, 0), (b, 1), (c, 2)
        ra = sum(1 for k in (kb, kc) if k < ka)
        rb = sum(1 for k in (ka, kc) if k < kb)
        rc = sum(1 for k in (ka, kb) if k < kc)
        pats[ra * 9 + rb * 3 + rc] += 1
    n = sum(pats.values())
    h = -sum(
        (c / n) * math.log(c / n) for _, c in sorted(pats.items())
    )
    return n, len(pats), h


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=6),
        min_size=5,
        max_size=50,
    )
)
def test_perm_entropy_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import permutation_entropy

    counts = [max(1, counts[0])] + counts[1:-1] + [max(1, counts[-1])]
    df = _hourly_events(spark, counts)
    out = {r["key"]: r
           for r in permutation_entropy(df).collect()}
    n, k, h = _ref_perm_entropy(counts)
    r = out["x"]
    assert r["n_windows"] == n
    assert r["n_patterns"] == k
    assert math.isclose(r["h_perm"], h, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(
        r["h_norm"], h / math.log(6.0), rel_tol=1e-9, abs_tol=1e-12
    )


def test_perm_entropy_monotone_is_zero(spark):
    """A strictly increasing series has one pattern -> H == 0."""
    from tsaug_spark.plans.stats import permutation_entropy

    df = _hourly_events(spark, list(range(1, 25)))
    r = permutation_entropy(df).collect()[0]
    assert r["n_patterns"] == 1 and r["h_perm"] == 0.0


# -------------------------------------------------- theta forecast


def _ref_theta(days, cents, alpha=0.2):
    x = np.asarray(days, float) - min(days)
    y = np.asarray(cents, float)
    order = np.argsort(x)
    x, y = x[order], y[order]
    n = len(x)
    b = ((n * (x * y).sum() - x.sum() * y.sum())
         / (n * (x * x).sum() - x.sum() ** 2))
    a = (y.sum() - b * x.sum()) / n
    z = 2.0 * y - (a + b * x)
    l = z[0]
    for v in z[1:]:
        l = l * (1 - alpha) + alpha * v
    f1 = 0.5 * (a + b * (x[-1] + 1)) + 0.5 * l
    f7 = 0.5 * (a + b * (x[-1] + 7)) + 0.5 * l
    return b, l, f1, f7


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90),
            st.floats(min_value=0.01, max_value=300.0,
                      allow_nan=False),
        ),
        min_size=3,
        max_size=30,
        unique_by=lambda p: p[0],
    )
)
def test_theta_matches_numpy(spark, day_vals):
    from tsaug_spark.plans.stats import theta_forecast

    day_vals = [(d, round(v, 2)) for d, v in day_vals]
    days = [d for d, _ in day_vals]
    x = np.asarray(days, float) - min(days)
    if (len(x) * (x * x).sum() - x.sum() ** 2) == 0:
        return
    rows = [
        (i, d, 1, "x", v) for i, (d, v) in enumerate(day_vals)
    ]
    data = [
        (i, T0 + dt.timedelta(days=d, minutes=i % 60), u, t, v)
        for (i, d, u, t, v) in rows
    ]
    df = spark.createDataFrame(data, _EVENT_DDL)
    out = {r["key"]: r for r in theta_forecast(df).collect()}
    cents = [round(v * 100) for _, v in day_vals]
    b, l, f1, f7 = _ref_theta(days, cents)
    r = out["x"]
    assert r["n_days"] == len(days)
    assert math.isclose(r["slope"], b, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(r["ses_level"], l, rel_tol=1e-7,
                        abs_tol=1e-7)
    assert math.isclose(r["theta_f1"], f1, rel_tol=1e-7,
                        abs_tol=1e-7)
    assert math.isclose(r["theta_f7"], f7, rel_tol=1e-7,
                        abs_tol=1e-7)


def test_theta_linear_series_forecasts_line(spark):
    """On an exactly linear series the theta forecast extends it."""
    from tsaug_spark.plans.stats import theta_forecast

    data = [
        (i, T0 + dt.timedelta(days=i), 1, "x", float(10 + 2 * i))
        for i in range(20)
    ]
    df = spark.createDataFrame(data, _EVENT_DDL)
    r = theta_forecast(df).collect()[0]
    # cents: 1000 + 200*d.  The trend half extends the line exactly
    # (slope 200); the flat SES half lags the h=1 line value by at
    # most slope/alpha, so the forecast sits in [true - 500, true].
    assert math.isclose(r["slope"], 200.0, rel_tol=1e-9)
    b, l, f1, f7 = _ref_theta(
        list(range(20)), [1000 + 200 * d for d in range(20)]
    )
    assert math.isclose(r["theta_f1"], f1, rel_tol=1e-9)
    assert math.isclose(r["theta_f7"], f7, rel_tol=1e-9)
    assert 5000.0 - 500.0 <= r["theta_f1"] <= 5000.0
    assert math.isclose(
        r["theta_f7"] - r["theta_f1"], 6.0 * 200.0 * 0.5,
        rel_tol=1e-9,
    )


# -------------------------------------------------- engle-granger


def _ref_engle_granger(xs, ys):
    x, y = np.asarray(xs, float), np.asarray(ys, float)
    n = len(x)
    beta = ((n * (x * y).sum() - x.sum() * y.sum())
            / (n * (x * x).sum() - x.sum() ** 2))
    a0 = (y.sum() - beta * x.sum()) / n
    e = y - (a0 + beta * x)
    ep, de = e[:-1], np.diff(e)
    m = len(ep)
    den = m * (ep * ep).sum() - ep.sum() ** 2
    rho = (m * (ep * de).sum() - ep.sum() * de.sum()) / den
    alpha = (de.sum() - rho * ep.sum()) / m
    sse = ((de * de).sum() - alpha * de.sum()
           - rho * (ep * de).sum())
    t = rho / math.sqrt((sse / (m - 2)) * m / den)
    return beta, rho, t


def test_engle_granger_cointegrated_pair(spark):
    """y tracks x plus noise -> strongly negative ADF t; the raw
    statistic matches the NumPy reference."""
    from tsaug_spark.plans.stats import engle_granger

    rng = np.random.RandomState(11)
    xs = np.clip(
        20 + np.cumsum(rng.randint(-3, 4, 60)), 1, None
    )
    ys = np.clip(2 * xs + rng.randint(-2, 3, 60), 1, None)
    rows, eid = [], 0
    for d in range(60):
        for _ in range(int(xs[d])):
            rows.append(
                (eid, T0 + dt.timedelta(days=d, minutes=3),
                 1, "click", 1.0)
            )
            eid += 1
        for _ in range(int(ys[d])):
            rows.append(
                (eid, T0 + dt.timedelta(days=d, minutes=5),
                 1, "purchase", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    r = engle_granger(df).collect()[0]
    beta, rho, t = _ref_engle_granger(xs, ys)
    assert r["n_days"] == 60
    assert math.isclose(r["beta"], beta, rel_tol=1e-9)
    assert math.isclose(r["rho"], rho, rel_tol=1e-7)
    assert math.isclose(r["adf_t"], t, rel_tol=1e-7)
    assert r["adf_t"] < -3.0  # cointegrated: residuals mean-revert
