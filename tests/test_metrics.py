"""Closed-form semantics tests for plans/metrics.py.

Each transform gets a tiny hand-computed fixture so the expected values
are derivable on paper — the large-scale correctness evidence is the
DuckDB oracle twins (twa_1h / counter_rate_1h / m4_daily / ewma_series
/ heartbeat_1h in __spark_entry__.py), which replay the same semantics
over the full events table at sf0.01 and sf0.1.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tsaug_spark.plans.metrics import (
    autocorr_lag1,
    counter_rate,
    ewma,
    heartbeat_uptime,
    lttb,
    m4_downsample,
    time_weighted_avg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (user_id, seconds-offset, value) -> events-shaped frame."""
    data = [
        (i, T0 + dt.timedelta(seconds=off), uid, float(v))
        for i, (uid, off, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, value double"
    )


def test_twa_trapezoid(spark):
    # one user, one hour bucket: samples at t=0 (v=10), t=600 (v=20),
    # t=1800 (v=40).  areas: (10+20)/2*600=9000, (20+40)/2*1200=36000;
    # twa = 45000 / 1800 = 25.0
    df = _ev(spark, [(1, 0, 10), (1, 600, 20), (1, 1800, 40)])
    out = time_weighted_avg(df, "1h").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 3
    assert r["twa"] == pytest.approx(25.0)


def test_twa_single_sample_is_mean(spark):
    df = _ev(spark, [(1, 0, 7.5)])
    r = time_weighted_avg(df, "1h").collect()[0]
    assert r["twa"] == 7.5 and r["n_samples"] == 1


def test_twa_equal_timestamps_degrade_to_mean(spark):
    # two samples at the identical instant: span sum is 0 -> plain mean
    df = _ev(spark, [(1, 0, 4.0), (1, 0, 8.0)])
    r = time_weighted_avg(df, "1h").collect()[0]
    assert r["twa"] == pytest.approx(6.0)


def test_counter_rate_reset_semantics(spark):
    # counter per hour bucket: 10 -> 25 (+15), 25 -> 5 (RESET: +5),
    # 5 -> 30 (+25) => bucket increase 45, 1 reset; first sample
    # contributes 0.
    df = _ev(spark, [(1, 0, 10), (1, 60, 25), (1, 120, 5), (1, 180, 30)])
    r = counter_rate(df, "1h", order_col="event_id").collect()[0]
    assert r["increase"] == pytest.approx(45.0)
    assert r["resets"] == 1
    assert r["n_samples"] == 4
    assert r["rate_ps"] == pytest.approx(45.0 / 3600)


def test_counter_rate_crosses_bucket_boundary(spark):
    # last sample of hour 0 is the baseline for hour 1 (PromQL
    # lookbehind): hour1 increase = 50 - 40 = 10, not 50.
    df = _ev(spark, [(1, 3500, 40), (1, 3700, 50)])
    out = {r["bucket_s"]: r for r in counter_rate(df, "1h").collect()}
    t0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[t0]["increase"] == 0.0
    assert out[t0 + 3600]["increase"] == pytest.approx(10.0)


def test_m4_min_max_first_last(spark):
    df = _ev(
        spark,
        [(1, 0, 5), (1, 10, 99), (1, 20, 1), (1, 30, 42)],
    )
    r = m4_downsample(df, "1d").collect()[0]
    assert (r["vmin"], r["vmax"], r["vfirst"], r["vlast"], r["n"]) == (
        1.0, 99.0, 5.0, 42.0, 4,
    )


def test_m4_tie_broken_by_order_col(spark):
    # identical timestamps: event_id decides first/last
    df = _ev(spark, [(1, 0, 50), (1, 0, 60), (1, 0, 55)])
    r = m4_downsample(df, "1d").collect()[0]
    assert r["vfirst"] == 50.0 and r["vlast"] == 55.0


def test_ewma_recurrence(spark):
    df = spark.createDataFrame(
        [("a", i, float(x)) for i, x in enumerate([1, 2, 3, 4, 5])],
        "conv_id string, bucket_idx int, cnt double",
    )
    out = {
        r["ord"]: r["ewma"]
        for r in ewma(df, alpha=0.25).collect()
    }
    exp = [1.0, 1.25, 1.6875, 2.265625, 2.94921875]
    assert [out[i] for i in range(5)] == pytest.approx(exp, abs=0)


def test_twa_cascade_equals_direct(spark):
    # samples spanning two hours of one day: hourly partials + bridge
    # must reproduce the direct daily trapezoid integral
    from tsaug_spark.plans.metrics import twa_merge, twa_partial

    rows = [(1, 0, 10), (1, 1800, 20), (1, 4000, 50), (1, 5000, 30)]
    df = _ev(spark, rows)
    direct = time_weighted_avg(df, "1d").collect()[0]
    merged = twa_merge(twa_partial(df, "1h"), "1d").collect()[0]
    assert merged["twa"] == pytest.approx(direct["twa"], rel=1e-12)
    assert merged["n_samples"] == direct["n_samples"] == 4
    # paper check: segments (10+20)/2*1800 + (20+50)/2*2200 +
    # (50+30)/2*1000 over t span 5000
    exp = (27000 + 77000 + 40000) / 5000
    assert direct["twa"] == pytest.approx(exp)


def test_twa_cascade_single_sample_day(spark):
    from tsaug_spark.plans.metrics import twa_merge, twa_partial

    df = _ev(spark, [(1, 0, 42.0)])
    merged = twa_merge(twa_partial(df, "1h"), "1d").collect()[0]
    assert merged["twa"] == 42.0


def test_m4_cascade_bit_exact(spark):
    from tsaug_spark.plans.metrics import m4_merge, m4_partial

    rows = [
        (1, 0, 5), (1, 10, 99), (1, 3700, 1), (1, 7300, 42),
        (2, 100, 7), (2, 3800, 3),
    ]
    df = _ev(spark, rows)
    direct = {
        (r["key"], r["bucket_s"]): r
        for r in m4_downsample(df, "1d").collect()
    }
    merged = {
        (r["key"], r["bucket_s"]): r
        for r in m4_merge(m4_partial(df, "1h"), "1d").collect()
    }
    assert direct.keys() == merged.keys()
    for k in direct:
        for c in ("n", "vmin", "vmax", "vfirst", "vlast"):
            assert direct[k][c] == merged[k][c], (k, c)


def test_hist_percentile_within_one_bin_of_exact(spark):
    import numpy as np

    from tsaug_spark.plans.metrics import hist_partial, hist_percentile

    rng = np.random.RandomState(3)
    vals = rng.uniform(0, 100, 2000)
    df = _ev(spark, [(1, i, float(v)) for i, v in enumerate(vals)])
    est = {
        r["q"]: r["est"]
        for r in hist_percentile(
            hist_partial(df, "1d"), [0.5, 0.95]
        ).collect()
    }
    bin_w = 100.0 / 64
    for q in (0.5, 0.95):
        exact = float(np.quantile(vals, q))
        assert abs(est[q] - exact) <= bin_w, (q, est[q], exact)


def test_hist_merge_equals_direct(spark):
    from tsaug_spark.plans.metrics import hist_merge, hist_partial

    rows = [(1, i * 700, float((i * 13) % 97)) for i in range(200)]
    df = _ev(spark, rows)
    direct = {
        (r["key"], r["bucket_s"], r["bin"]): r["cnt"]
        for r in hist_partial(df, "1d").collect()
    }
    merged = {
        (r["key"], r["bucket_s"], r["bin"]): r["cnt"]
        for r in hist_merge(hist_partial(df, "1h"), "1d").collect()
    }
    assert direct == merged


def test_hist_clamps_out_of_range(spark):
    from tsaug_spark.plans.metrics import hist_partial

    df = _ev(spark, [(1, 0, -5.0), (1, 1, 250.0)])
    bins = sorted(
        (r["bin"], r["cnt"]) for r in hist_partial(df, "1d").collect()
    )
    assert bins == [(0, 1), (63, 1)]


def test_rolling_zscore_flags_spike_only(spark):
    # 30 hourly buckets of cnt=10 with one cnt=100 spike: only the
    # spike exceeds |z| > 3 once the window is full.  Drives the REAL
    # production function (plans/metrics.py::rolling_zscore).
    from tsaug_spark.plans.metrics import rolling_zscore

    rows = [(1, i, 100 if i == 27 else 10) for i in range(30)]
    h = spark.createDataFrame(
        rows, "user_id long, bucket_s long, cnt long"
    )
    flagged = rolling_zscore(h, window=24, threshold=3.0).collect()
    assert [r["ord"] for r in flagged] == [27]
    assert flagged[0]["z"] > 4


def test_rolling_zscore_skips_partial_and_flat_windows(spark):
    from tsaug_spark.plans.metrics import rolling_zscore

    # 40 constant buckets: windows are full from bucket 23 on, but
    # variance is zero everywhere -> nothing flagged, nothing divides
    # by zero
    h = spark.createDataFrame(
        [(1, i, 5) for i in range(40)],
        "user_id long, bucket_s long, cnt long",
    )
    assert rolling_zscore(h).count() == 0


def _lttb_reference(y, n_out):
    """Independent plain-Python LTTB (range-based loop, np.mean) used
    only as a test oracle for the kernel's selection."""
    import numpy as np

    T = len(y)
    if T <= n_out:
        return list(range(T))
    nb = n_out - 2
    bkt = [((i - 1) * nb) // (T - 2) + 1 for i in range(1, T - 1)]
    sel = [0]
    for k in range(1, nb + 1):
        members = [i + 1 for i, b in enumerate(bkt) if b == k]
        if k == nb:
            ax, ay = float(T - 1), y[T - 1]
        else:
            nxt = [i + 1 for i, b in enumerate(bkt) if b == k + 1]
            ax = sum(float(i) for i in nxt) / len(nxt)
            ay = sum(y[i] for i in nxt) / len(nxt)
        sx, sy = float(sel[-1]), y[sel[-1]]
        best, best_a = members[0], -1.0
        for i in members:
            a = abs((sx - ax) * (y[i] - sy) - (sx - i) * (ay - sy)) / 2
            if a > best_a:
                best, best_a = i, a
        sel.append(best)
    sel.append(T - 1)
    return sel


def test_lttb_matches_independent_reference(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    for s in range(6):
        y = rng.uniform(-50, 50, 48)
        rows += [(f"s{s}", i, float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx int, cnt double"
    )
    out = lttb(df, 12).collect()
    got = {}
    for r in out:
        got.setdefault(r["key"], []).append(r["ord"])
    for s in range(6):
        y = [v for k, i, v in rows if k == f"s{s}"]
        exp = _lttb_reference(y, 12)
        assert sorted(got[f"s{s}"]) == exp, f"series s{s}"


def test_lttb_short_series_passthrough(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(5)],
        "conv_id string, bucket_idx int, cnt double",
    )
    out = lttb(df, 12).collect()
    assert sorted(r["ord"] for r in out) == list(range(5))


def test_lttb_keeps_endpoints_and_bucket_counts(spark):
    df = spark.createDataFrame(
        [("a", i, float((i * 37) % 11)) for i in range(100)],
        "conv_id string, bucket_idx int, cnt double",
    )
    sel = sorted(r["ord"] for r in lttb(df, 10).collect())
    assert len(sel) == 10 and sel[0] == 0 and sel[-1] == 99
    # exactly one point per interior bucket
    bkts = {((i - 1) * 8) // 98 + 1 for i in sel[1:-1]}
    assert len(bkts) == 8


def test_heartbeat_clipping(spark):
    # hb=300s; beats at t=0 and t=100 (second clips the first to 100s),
    # then t=3500 (clipped by bucket end to 100s).
    # covered = 100 + 300 + 100 = 500 -> uptime 500/3600
    df = _ev(spark, [(1, 0, 0), (1, 100, 0), (1, 3500, 0)])
    r = heartbeat_uptime(df, "1h", heartbeat=300).collect()[0]
    assert r["covered_s"] == pytest.approx(500.0)
    assert r["uptime"] == pytest.approx(500.0 / 3600.0)
    assert r["n_beats"] == 3


def test_heartbeat_duplicate_beats_dedup(spark):
    df = _ev(spark, [(1, 0, 0), (1, 0, 0)])
    r = heartbeat_uptime(df, "1h", heartbeat=300).collect()[0]
    assert r["n_beats"] == 1 and r["covered_s"] == pytest.approx(300.0)


def test_autocorr_alternating_is_minus_one(spark):
    # user 1 fires 2 events in even hours 0,2,4,6,8 and none in odd
    # hours: zero-filled series [2,0,2,0,2,0,2,0,2] -> ACF(1) = -1
    # exactly (n=8, sx=sy=8, sxy=0, sxx=syy=16 -> -64/64).
    rows = [
        (1, h * 3600 + k, 1.0)
        for h in (0, 2, 4, 6, 8)
        for k in (0, 1)
    ]
    out = autocorr_lag1(_ev(spark, rows), "1h").collect()
    assert len(out) == 1 and out[0].acf1 == -1.0


def test_autocorr_constant_series_is_null(spark):
    # one event every hour: zero-variance series -> NULL via NULLIF,
    # never a divide-by-zero NaN/Inf.
    rows = [(1, h * 3600, 1.0) for h in range(6)]
    out = autocorr_lag1(_ev(spark, rows), "1h").collect()
    assert len(out) == 1 and out[0].acf1 is None


def test_autocorr_matches_numpy_on_shared_grid(spark):
    # two users on the GLOBAL [min, max] grid (user 2 zero-filled at
    # the edges user 1 defines); compare against np.corrcoef of the
    # same zero-filled lag pairs.
    import numpy as np

    rows = [(1, h * 3600, 1.0) for h in range(10) for _ in range(h % 3 + 1)]
    rows += [(2, h * 3600, 1.0) for h in (2, 3, 5, 8) for _ in range(2)]
    out = {
        r.key: r.acf1
        for r in autocorr_lag1(_ev(spark, rows), "1h").collect()
    }
    series = {
        1: [h % 3 + 1 for h in range(10)],
        2: [2 if h in (2, 3, 5, 8) else 0 for h in range(10)],
    }
    for uid, xs in series.items():
        expect = np.corrcoef(xs[:-1], xs[1:])[0, 1]
        assert abs(out[uid] - expect) < 1e-12, (uid, out[uid], expect)


def test_seasonal_profile_calendar_mean(spark):
    # user 1 fires 2 events at hour 3 on day 0 and 1 event at hour 3
    # on day 2: span = 3 days, hod-3 mean = 3/3 = 1.0; nothing else.
    from tsaug_spark.plans.metrics import seasonal_profile

    rows = [
        (1, 3 * 3600, 1.0),
        (1, 3 * 3600 + 60, 1.0),
        (1, 2 * 86400 + 3 * 3600, 1.0),
    ]
    out = seasonal_profile(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.key, r.hod, r.n_events, r.n_days) == (1, 3, 3, 3)
    assert r.mean_cnt == 1.0


def test_cusum_finds_level_shift(spark):
    # user 1: 1 event/hour for hours 0-9, then 5/hour for hours 10-19.
    # C_t = prefix - t*mean peaks in magnitude exactly at the shift
    # boundary (t=10, the last pre-shift bucket).
    from tsaug_spark.plans.metrics import cusum_changepoint

    rows = [(1, h * 3600 + k, 1.0) for h in range(10) for k in range(1)]
    rows += [
        (1, h * 3600 + k, 1.0) for h in range(10, 20) for k in range(5)
    ]
    out = cusum_changepoint(_ev(spark, rows), "1h").collect()
    assert len(out) == 1
    r = out[0]
    # peak at bucket hour 9 (t=10): C = 10 - 10*3 = -20
    assert r.bucket_s % 86400 == 9 * 3600
    assert r.cusum == -20.0 and r.n == 20


def test_cusum_tie_breaks_earliest(spark):
    # symmetric series [2,0,0,2]: |C| ties at t=1..3 (|C'|=4);
    # earliest bucket wins deterministically.
    from tsaug_spark.plans.metrics import cusum_changepoint

    rows = [(1, 0, 1.0), (1, 1, 1.0), (1, 3 * 3600, 1.0),
            (1, 3 * 3600 + 1, 1.0)]
    out = cusum_changepoint(_ev(spark, rows), "1h").collect()
    assert len(out) == 1 and out[0].bucket_s % 86400 == 0


def test_seasonal_decompose_matches_numpy(spark):
    """Full decomposition vs a from-scratch NumPy replica of the
    classical algorithm (2x24 centered MA, interior-day phase means,
    centered seasonal) on a deterministic 6-day hourly pattern."""
    import numpy as np

    from tsaug_spark.plans.metrics import seasonal_decompose

    rng = np.random.RandomState(5)
    d0 = 1_700_006_400  # a UTC midnight
    hours = np.arange(6 * 24)
    # diurnal pattern + trend ramp, expressed as event COUNTS by
    # repeating each hour's timestamp cnt times
    cnt = (
        3
        + (hours // 24)
        + np.round(2 * np.sin(2 * np.pi * (hours % 24) / 24)).astype(int)
        + rng.randint(0, 2, size=hours.size)
    ).clip(min=0)
    rows = [
        (int(d0 + h * 3600 + 7),)  # +7s: lands inside the hour bucket
        for h, c in zip(hours, cnt)
        for _ in range(int(c))
    ]
    df = spark.createDataFrame(rows, "t long").select(
        F.lit("k").alias("user_id"),
        F.col("t").cast("timestamp").alias("ts"),
    )
    out = (
        seasonal_decompose(df, key_col="user_id", ts_col="ts")
        .orderBy("bucket_s")
        .collect()
    )
    assert len(out) == hours.size
    got_cnt = np.array([r.cnt for r in out])
    np.testing.assert_array_equal(got_cnt, cnt)

    # NumPy replica
    x = cnt.astype(float)
    trend = np.full(x.size, np.nan)
    for i in range(12, x.size - 12):
        trend[i] = (x[i - 12:i + 12].sum() + x[i - 11:i + 13].sum()) / 48
    D = 6
    interior = (hours // 24 >= 1) & (hours // 24 <= D - 2)
    det = x - trend
    phase_means = np.array([
        det[interior & (hours % 24 == p)].mean() for p in range(24)
    ])
    seasonal = phase_means - phase_means.mean()

    got_trend = np.array(
        [r.trend if r.trend is not None else np.nan for r in out]
    )
    np.testing.assert_allclose(
        got_trend, trend, rtol=1e-12, equal_nan=True
    )
    got_seasonal = np.array([r.seasonal for r in out])
    np.testing.assert_allclose(
        got_seasonal, seasonal[hours % 24], rtol=1e-9
    )
    # reconstruction identity where trend exists
    for r in out:
        if r.trend is not None:
            assert abs(r.cnt - r.trend - r.seasonal - r.resid) < 1e-9
    # seasonal centering: phase effects sum to ~0
    assert abs(got_seasonal[:24].sum()) < 1e-9


def test_crosscorr_matches_numpy(spark):
    """crosscorr(key, lag) == np.corrcoef of the zero-filled count
    series against its lag-shifted partner, for every lag."""
    import numpy as np

    from tsaug_spark.plans.metrics import crosscorr

    rng = np.random.RandomState(9)
    d0 = 1_700_006_400
    n = 72
    # purchases echo clicks two hours later (plus noise)
    clicks = rng.randint(0, 5, size=n)
    purch = np.roll(clicks, 2) + rng.randint(0, 2, size=n)
    purch[:2] = rng.randint(0, 2, size=2)
    rows = []
    for h in range(n):
        ts = d0 + h * 3600 + 13
        rows += [(ts, "click")] * int(clicks[h])
        rows += [(ts, "purchase")] * int(purch[h])
    df = spark.createDataFrame(rows, "t long, event_type string").select(
        F.lit("k").alias("user_id"),
        F.col("t").cast("timestamp").alias("ts"),
        "event_type",
    )
    got = {
        r.lag: (r.n, r.xcorr)
        for r in crosscorr(
            df, "click", "purchase", tier="1h", max_lag=3
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for lag in range(4):
        x = clicks[: n - lag].astype(float)
        y = purch[lag:].astype(float)
        want = np.corrcoef(x, y)[0, 1]
        assert got[lag][0] == n - lag
        assert abs(got[lag][1] - want) < 1e-9, (lag, got[lag], want)
    # the planted 2-hour echo dominates
    assert got[2][1] == max(v for _n, v in got.values())


def test_crosscorr_self_lag0_is_one(spark):
    import numpy as np

    from tsaug_spark.plans.metrics import crosscorr

    rng = np.random.RandomState(3)
    d0 = 1_700_006_400
    rows = []
    for h in range(48):
        rows += [(d0 + h * 3600, "click")] * int(rng.randint(1, 4))
    df = spark.createDataFrame(rows, "t long, event_type string").select(
        F.lit("k").alias("user_id"),
        F.col("t").cast("timestamp").alias("ts"),
        "event_type",
    )
    got = {
        r.lag: r.xcorr
        for r in crosscorr(
            df, "click", "click", tier="1h", max_lag=1
        ).collect()
    }
    assert abs(got[0] - 1.0) < 1e-12


def test_holt_matches_independent_replica(spark):
    """Holt level/trend/fitted vs an independent pure-Python fold on a
    ramp+noise fixture; constant series collapses to level==const,
    trend==0, fitted==const."""
    import numpy as np

    from tsaug_spark.plans.metrics import holt

    rng = np.random.RandomState(17)
    x = 10.0 + 0.5 * np.arange(60) + rng.uniform(-1, 1, size=60)
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(x)],
        "conv_id string, bucket_idx long, cnt double",
    )
    out = {
        r.ord: (r.level, r.trend, r.fitted)
        for r in holt(df, alpha=0.5, beta=0.25).collect()
    }
    l, b = x[0], 0.0
    assert out[0] == (x[0], 0.0, None)
    for t in range(1, 60):
        fitted = l + b
        l_new = 0.5 * x[t] + 0.5 * (l + b)
        b = 0.25 * (l_new - l) + 0.75 * b
        l = l_new
        got = out[t]
        assert got == (l, b, fitted), t  # bit-exact, same fold

    const = spark.createDataFrame(
        [("k", i, 7.0) for i in range(20)],
        "conv_id string, bucket_idx long, cnt double",
    )
    for r in holt(const, alpha=0.5, beta=0.25).collect():
        assert r.level == 7.0 and r.trend == 0.0
        assert r.fitted == (7.0 if r.ord > 0 else None)

    # the planted ramp is learned: late trend approaches 0.5
    late_trend = out[59][1]
    assert abs(late_trend - 0.5) < 0.3


# ------------------------------------------------------------- SAX


def _sax_replica(values, w, bps):
    """Independent numpy SAX: z-normalize, PAA, breakpoint symbols."""
    import numpy as np

    x = np.asarray(values, dtype=float)
    n = len(x)
    mean = x.sum() / n
    var = (n * (x * x).sum() - x.sum() ** 2) / (n * n)
    std = var**0.5
    seg = np.floor(np.arange(n) * w / n).astype(int)
    paa = np.array([x[seg == k].mean() for k in range(w)])
    z = np.zeros(w) if std == 0 else (paa - mean) / std
    letters = "abcd"
    out = []
    for v in z:
        i = 0
        while i < len(bps) and v >= bps[i]:
            i += 1
        out.append(letters[i])
    return "".join(out)


def test_sax_matches_independent_replica(spark):
    from tsaug_spark.plans.metrics import _SAX_BREAKPOINTS, sax_symbols

    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    series = {}
    for key in ["u1", "u2", "u3"]:
        vals = rng.randint(0, 50, size=48).tolist()
        series[key] = vals
        rows += [(key, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    got = {
        r["key"]: r["sax"]
        for r in sax_symbols(df, n_segments=8, alphabet=4).collect()
    }
    bps = _SAX_BREAKPOINTS[4]
    for key, vals in series.items():
        assert got[key] == _sax_replica(vals, 8, bps), key


def test_sax_constant_series_is_all_c(spark):
    # zero variance -> z = 0 for every segment -> symbol 'c' (the
    # first breakpoint >= 0 in the a=4 alphabet is 0.6745)
    from tsaug_spark.plans.metrics import sax_symbols

    rows = [("k", i, 5.0) for i in range(48)]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    out = sax_symbols(df, n_segments=8, alphabet=4).collect()
    assert out[0]["sax"] == "c" * 8


def test_sax_word_length_and_order(spark):
    # a monotone ramp must produce a non-decreasing symbol word of
    # exactly n_segments letters (PAA means rise monotonically)
    from tsaug_spark.plans.metrics import sax_symbols

    rows = [("k", i, float(i)) for i in range(48)]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    word = sax_symbols(df, n_segments=8, alphabet=4).collect()[0]["sax"]
    assert len(word) == 8
    assert list(word) == sorted(word)
    assert word[0] == "a" and word[-1] == "d"


def test_sax_rejects_unknown_alphabet(spark):
    from tsaug_spark.plans.metrics import sax_symbols

    df = spark.createDataFrame(
        [("k", 0, 1.0)], "conv_id string, bucket_idx long, cnt double"
    )
    with pytest.raises(ValueError):
        sax_symbols(df, alphabet=7)


def test_concurrency_curve_sweep_line(spark):
    from tsaug_spark.plans.metrics import concurrency_curve

    # sessions: [0,120], [60,180], [300,300] at 1m buckets ->
    # level 1 from 00:00, 2 from 01:00, 1 from 03:00 (first ends in
    # bucket 2 so its -1 lands at 180), 0 from 04:00, 1 at 05:00, 0 after
    rows = [(0, 120), (60, 180), (300, 300)]
    df = spark.createDataFrame(rows, "start_s long, end_s long")
    out = {
        r["bucket_s"]: (r["delta"], r["concurrent"])
        for r in concurrency_curve(df, "1m").collect()
    }
    assert out == {
        0: (1, 1),
        60: (1, 2),
        180: (-1, 1),
        240: (-1, 0),
        300: (1, 1),
        360: (-1, 0),
    }


def test_transition_counts_markov_bigrams(spark):
    from tsaug_spark.plans.metrics import transition_counts

    # u1: A -> B -> B -> C ; u2: A -> B   (per-key streams never mix)
    rows = [
        ("u1", 1, "A"), ("u1", 2, "B"), ("u1", 3, "B"), ("u1", 4, "C"),
        ("u2", 1, "A"), ("u2", 2, "B"),
    ]
    df = spark.createDataFrame(rows, "user_id string, t long, ev string")
    out = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_counts(
            df, key_col="user_id", ts_col="t", state_col="ev"
        ).collect()
    }
    assert out == {("A", "B"): 2, ("B", "B"): 1, ("B", "C"): 1}


# ---- Mann-Kendall trend + Theil-Sen slope ----


def test_mann_kendall_monotone_and_flat(spark):
    """A strictly increasing count series gives the maximal S =
    n(n-1)/2, a positive z, and the exact Sen slope; a constant series
    gives S = 0 with zero variance -> NULL z."""
    from tsaug_spark.plans.metrics import mann_kendall

    rows = []
    # user 1: day d has d+1 events (strictly increasing, slope 1/day)
    # user 2: exactly 2 events every day (all ties)
    for d in range(5):
        for k in range(d + 1):
            rows.append((1, d * 86400 + k, 1.0))
        rows.append((2, d * 86400, 1.0))
        rows.append((2, d * 86400 + 1, 1.0))
    out = {r.key: r for r in mann_kendall(_ev(spark, rows), "1d").collect()}
    n = 5
    assert out[1].n == n
    assert out[1].s_stat == n * (n - 1) // 2
    assert out[1].z > 0
    assert out[1].sen_slope == 1.0
    assert out[2].s_stat == 0
    assert out[2].z is None  # all-tie series: var_s = 0
    assert out[2].sen_slope == 0.0


def test_mann_kendall_matches_brute_force(spark):
    """Every per-user statistic at sf0.01 equals a numpy O(n^2) pair
    enumeration over the same zero-filled daily grid (S exactly, z and
    Sen slope to float equality)."""
    import numpy as np

    from tsaug_spark.plans.metrics import mann_kendall

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {r.key: r for r in mann_kendall(ev, "1d").collect()}
    pdf = ev.select("user_id", "ts").toPandas()
    b = (pdf.ts.astype("int64") // 10**9 // 86400) * 86400
    lo, hi = int(b.min()), int(b.max())
    T = (hi - lo) // 86400 + 1
    for uid, idxs in b.groupby(pdf.user_id):
        x = np.zeros(T, dtype=np.int64)
        for day, c in idxs.value_counts().items():
            x[(int(day) - lo) // 86400] = c
        s_stat, slopes = 0, []
        for i in range(T):
            d = x[i + 1:] - x[i]
            s_stat += int(np.sign(d).sum())
            slopes.extend(d / np.arange(1, T - i))
        _, t = np.unique(x, return_counts=True)
        var = (T * (T - 1) * (2 * T + 5)
               - int((t * (t - 1) * (2 * t + 5)).sum())) / 18.0
        r = got[uid]
        assert r.n == T and r.s_stat == s_stat
        if var == 0:
            assert r.z is None
        else:
            z = ((s_stat - 1) if s_stat > 0 else
                 (s_stat + 1) if s_stat < 0 else 0) / np.sqrt(var)
            assert abs(r.z - z) < 1e-12
        assert abs(r.sen_slope - float(np.median(slopes))) < 1e-12


# ---- Holt-Winters triple exponential smoothing ----


def test_holt_winters_periodic_is_exact_fit(spark):
    """A perfectly m-periodic series is a fixed point of additive
    Holt-Winters: level stays at the season mean, trend at 0, the
    seasonals never move, and every one-step forecast equals the
    actual value."""
    from tsaug_spark.plans.metrics import holt_winters

    m = 4
    pat = [3.0, 7.0, 1.0, 5.0]  # mean 4.0
    rows = [
        ("a", i, pat[i % m]) for i in range(3 * m)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    out = holt_winters(df, m=m).orderBy("ord").collect()
    assert [r.ord for r in out] == list(range(m, 3 * m))
    for r in out:
        assert r.fitted == pat[r.ord % m]
        assert r.level == 4.0 and r.trend == 0.0
        assert r.season == pat[r.ord % m] - 4.0


def test_holt_winters_warmup_consumed_and_short_series_empty(spark):
    """Rows before t = m are init-only (not emitted); a series no
    longer than one season yields no output."""
    from tsaug_spark.plans.metrics import holt_winters

    rows = [("a", i, float(i)) for i in range(24)] + [
        ("b", i, float(i)) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    got = holt_winters(df, m=24).collect()
    assert {r.key for r in got} == {"b"}
    assert sorted(r.ord for r in got) == list(range(24, 30))


# ---- burstiness: CV^2 of inter-arrivals + Fano factor ----


def test_burstiness_regular_arrivals(spark):
    """Perfectly regular arrivals: CV^2 = 0 (zero gap variance); one
    event per bucket makes the count series constant -> Fano 0."""
    from tsaug_spark.plans.metrics import burstiness

    rows = [(1, h * 3600, 1.0) for h in range(10)]
    out = burstiness(_ev(spark, rows), "1h").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 10 and r.cv2 == 0.0 and r.fano == 0.0


def test_burstiness_matches_numpy(spark):
    """CV^2 and Fano at sf0.01 equal the numpy population-moment
    computation over the same exact-microsecond gaps / zero-filled
    hourly grid."""
    import numpy as np

    from tsaug_spark.plans.metrics import burstiness

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {r.key: r for r in burstiness(ev, "1h").collect()}
    pdf = ev.select("user_id", "ts", "event_id").toPandas()
    t_us = pdf.ts.astype("int64") // 1000
    b = (t_us // 10**6 // 3600) * 3600
    lo, hi = int(b.min()), int(b.max())
    T = (hi - lo) // 3600 + 1
    for uid, grp in pdf.assign(t_us=t_us, b=b).groupby("user_id"):
        g = grp.sort_values(["t_us", "event_id"])
        d = np.diff(g.t_us.to_numpy()).astype(object)  # exact ints
        assert got[uid].n_events == len(g)
        cv2 = float(
            (len(d) * sum(x * x for x in d) - sum(d) ** 2)
            / (sum(d) ** 2)
        )
        assert abs(got[uid].cv2 - cv2) < 1e-9 * max(1.0, cv2)
        c = np.zeros(T, dtype=np.int64)
        for bb, n in g.b.value_counts().items():
            c[(int(bb) - lo) // 3600] = n
        fano = float(
            (T * int((c * c).sum()) - int(c.sum()) ** 2)
            / (T * int(c.sum()))
        )
        assert abs(got[uid].fano - fano) < 1e-9 * max(1.0, fano)


# ---- pairwise correlation matrix between category series ----


def test_corr_matrix_closed_forms(spark):
    """Three synthetic types: 'up' and 'dn' perfectly anti-correlated
    counts, 'up' and 'cp' identical -> corr +1; flat type -> NULL.
    Upper triangle only, all pairs present."""
    from tsaug_spark.plans.metrics import corr_matrix

    rows = []
    for h in range(6):
        for _ in range(h + 1):
            rows.append(("up", h))
            rows.append(("cp", h))
        for _ in range(6 - h):
            rows.append(("dn", h))
        rows.append(("fl", h))
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, h), t)
            for i, (t, h) in enumerate(rows)
        ],
        "event_id long, ts timestamp, event_type string",
    )
    out = {
        (r.cat_a, r.cat_b): r.corr
        for r in corr_matrix(df, "1h").collect()
    }
    assert len(out) == 6  # C(4,2) upper triangle
    assert abs(out[("cp", "up")] - 1.0) < 1e-12
    assert abs(out[("dn", "up")] + 1.0) < 1e-12
    assert out[("fl", "up")] is None  # zero-variance side
    assert all(a < b for a, b in out)


def test_corr_matrix_matches_numpy(spark):
    """All C(5,2) pairs at sf0.01 equal np.corrcoef over the same
    zero-filled hourly grids."""
    import numpy as np

    from tsaug_spark.plans.metrics import corr_matrix

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        (r.cat_a, r.cat_b): (r.n, r.corr)
        for r in corr_matrix(ev, "1h").collect()
    }
    pdf = ev.select("event_type", "ts").toPandas()
    b = (pdf.ts.astype("int64") // 10**9 // 3600) * 3600
    lo, hi = int(b.min()), int(b.max())
    T = (hi - lo) // 3600 + 1
    series = {}
    for cat, grp in b.groupby(pdf.event_type):
        x = np.zeros(T)
        for bb, c in grp.value_counts().items():
            x[(int(bb) - lo) // 3600] = c
        series[cat] = x
    cats = sorted(series)
    assert len(got) == len(cats) * (len(cats) - 1) // 2
    for i, ca in enumerate(cats):
        for cb in cats[i + 1:]:
            n, corr = got[(ca, cb)]
            assert n == T
            ref = float(np.corrcoef(series[ca], series[cb])[0, 1])
            assert abs(corr - ref) < 1e-9


# ---- activity Gini + event-type entropy ----


def test_activity_gini_closed_forms(spark):
    """Uniform counts -> G = 0; maximal concentration (n-1 keys with 1
    event, one key with the rest) approaches the closed form
    (n-1)*(T-n... ) — checked against a direct numpy Gini."""
    import numpy as np

    from tsaug_spark.plans.metrics import activity_gini

    def gini_np(xs):
        xs = np.sort(np.asarray(xs))
        n = len(xs)
        i = np.arange(1, n + 1)
        return float(
            (2 * (i * xs).sum() - (n + 1) * xs.sum())
            / (n * xs.sum())
        )

    uniform = [(u, u * 10 + k, 1.0) for u in range(8) for k in range(5)]
    r = activity_gini(_ev(spark, uniform)).collect()[0]
    assert r.n_keys == 8 and r.total == 40 and r.gini == 0.0

    skewed = [(0, k, 1.0) for k in range(93)] + [
        (u, 2000 + u, 1.0) for u in range(1, 8)
    ]
    r = activity_gini(_ev(spark, skewed)).collect()[0]
    assert abs(r.gini - gini_np([93, 1, 1, 1, 1, 1, 1, 1])) < 1e-12
    assert r.gini > 0.7


def test_type_entropy_closed_forms_and_numpy(spark):
    """Single-type key -> 0 bits; uniform 4-type key -> 2 bits; real
    data matches scipy-free numpy entropy."""
    import numpy as np

    import datetime as _dt

    from tsaug_spark.plans.metrics import type_entropy

    rows = [(1, _dt.datetime(2024, 1, 1), "a")] * 7 + [
        (2, _dt.datetime(2024, 1, 1), t) for t in "abcd" * 3
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t) for i, (u, ts, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {r.key: r for r in type_entropy(df).collect()}
    assert out[1].entropy == 0.0 and out[1].n_types == 1
    assert abs(out[2].entropy - 2.0) < 1e-12 and out[2].n_types == 4

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {r.key: r.entropy for r in type_entropy(ev).collect()}
    pdf = ev.select("user_id", "event_type").toPandas()
    for uid, g in pdf.groupby("user_id"):
        c = g.event_type.value_counts().to_numpy().astype(float)
        p = c / c.sum()
        ref = float(-(p * np.log2(p)).sum())
        assert abs(got[uid] - ref) < 1e-9


# ---- banded DTW distance ----


def test_dtw_closed_forms(spark):
    """Identical channels -> 0; a constant offset c walks the diagonal
    -> T*c; a one-bucket phase shift of a spike costs less than the
    unaligned pointwise distance (the elastic-matching property)."""
    from tsaug_spark.plans.metrics import dtw_distance

    T = 12
    rows = []
    for t in range(T):
        spike_a = 10.0 if t == 5 else 0.0
        spike_b = 10.0 if t == 6 else 0.0
        rows += [
            ("same", t, 3.0, 3.0),
            ("off", t, 2.0, 5.0),
            ("shift", t, spike_a, spike_b),
        ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double, "
        "sum_value double"
    )
    out = {r.key: r.dtw for r in dtw_distance(df, band=3).collect()}
    assert out["same"] == 0.0
    assert out["off"] == T * 3.0
    assert out["shift"] < 20.0  # pointwise would be 20


def test_dtw_matches_full_matrix_numpy(spark):
    """Engine DTW at sf0.01 equals an independent full-matrix numpy DP
    with the same Sakoe-Chiba band, bit for bit."""
    import numpy as np

    import __spark_entry__ as em
    from tsaug_spark.plans.metrics import dtw_distance

    series = em._series_df(spark, "/root/testdata/sf0.01")
    got = {r.key: r.dtw for r in dtw_distance(series, band=8).collect()}
    pdf = series.toPandas()
    for uid, g in pdf.groupby("conv_id"):
        g = g.sort_values("bucket_idx")
        a = g.cnt.to_numpy()
        b = g.sum_value.to_numpy()
        n = len(a)
        inf = float("inf")
        dp = np.full((n + 1, n + 1), inf)
        dp[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                if abs(i - j) > 8:
                    continue
                dp[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                    dp[i - 1, j], dp[i - 1, j - 1], dp[i, j - 1]
                )
        assert got[uid] == dp[n, n], (uid, got[uid], dp[n, n])


# ---- seasonal anomaly flags ----


def test_seasonal_anomaly_planted_burst(spark):
    """A key with a steady 2-events-per-hour-8 rhythm plus one planted
    30-event burst flags exactly the burst bucket; a perfectly
    periodic key flags nothing (zero variance per hour -> z NULL)."""
    from tsaug_spark.plans.metrics import seasonal_anomaly

    rows = []
    for d in range(10):
        for u, n in ((1, 2), (2, 3)):
            cnt = 30 if (u == 1 and d == 7) else n
            for k in range(cnt):
                rows.append((u, d * 86400 + 8 * 3600 + k, 1.0))
    out = seasonal_anomaly(_ev(spark, rows), "1h").collect()
    t0_epoch = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert [(r.key, r.bucket_s) for r in out] == [
        (1, t0_epoch + 7 * 86400 + 8 * 3600)
    ]
    assert out[0].cnt == 30 and out[0].z >= 3


def test_seasonal_anomaly_matches_numpy(spark):
    """Flag set at sf0.01 equals the numpy hour-of-day profile
    z-score computation over the same zero-filled grid."""
    import numpy as np

    from tsaug_spark.plans.metrics import seasonal_anomaly

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        (r.key, r.bucket_s) for r in seasonal_anomaly(ev, "1h").collect()
    }
    pdf = ev.select("user_id", "ts").toPandas()
    b = (pdf.ts.astype("int64") // 10**9 // 3600) * 3600
    lo, hi = int(b.min()), int(b.max())
    grid = np.arange(lo, hi + 1, 3600)
    expected = set()
    for uid, grp in b.groupby(pdf.user_id):
        x = np.zeros(len(grid), dtype=np.int64)
        for bb, c in grp.value_counts().items():
            x[(int(bb) - lo) // 3600] = c
        hod = (grid % 86400) // 3600
        for h in range(24):
            xs = x[hod == h]
            n = len(xs)
            mu = xs.sum() / n
            var_num = n * int((xs * xs).sum()) - int(xs.sum()) ** 2
            if var_num == 0:
                continue
            sigma = np.sqrt(float(var_num)) / n
            for i in np.nonzero(hod == h)[0]:
                if abs((x[i] - mu) / sigma) >= 3.0:
                    expected.add((uid, int(grid[i])))
    assert got == expected and len(got) > 0


# ---- motif discovery (top matrix-profile pair) ----


def test_motif_pair_planted_motif(spark):
    """A series with the same shape planted twice on a noisy-unique
    background recovers exactly that (i, j) pair at distance 0
    (z-normalization makes the scaled copy match too)."""
    from tsaug_spark.plans.metrics import motif_pair

    pat = [1.0, 5.0, 2.0, 7.0, 3.0, 9.0, 4.0, 6.0]
    bg = [float((17 * t * t + 3 * t) % 101) for t in range(48)]
    x = list(bg)
    x[4:12] = pat                      # motif at i=4
    x[30:38] = [2 * p + 10 for p in pat]  # scaled+shifted copy at j=30
    df = spark.createDataFrame(
        [("a", t, v) for t, v in enumerate(x)],
        "conv_id string, bucket_idx long, cnt double",
    )
    r = motif_pair(df, m=8).collect()[0]
    assert (r.i, r.j) == (4, 30)
    assert r.dist < 1e-7


def test_motif_pair_matches_numpy(spark):
    """Engine motif at sf0.01 equals an independent numpy full scan
    (same exclusion zone, same tie order)."""
    import numpy as np

    import __spark_entry__ as em
    from tsaug_spark.plans.metrics import motif_pair

    series = em._series_df(spark, "/root/testdata/sf0.01")
    got = {
        r.key: (r.i, r.j, r.dist)
        for r in motif_pair(series, m=8).collect()
    }
    pdf = series.toPandas()
    m = 8
    for uid, g in pdf.groupby("conv_id"):
        x = g.sort_values("bucket_idx").cnt.to_numpy()
        n_sub = len(x) - m + 1
        zs = []
        for i in range(n_sub):
            w = x[i:i + m]
            mu = w.sum() / m
            sig = np.sqrt(m * (w * w).sum() - w.sum() ** 2) / m
            zs.append(
                np.zeros(m) if sig == 0 else (w - mu) / sig
            )
        best = None
        for i in range(n_sub):
            for j in range(i + m, n_sub):
                d = float(np.sqrt(((zs[i] - zs[j]) ** 2).sum()))
                cand = (d, i, j)
                if best is None or cand < best:
                    best = cand
        bi, bj = got[uid][0], got[uid][1]
        assert (bi, bj) == (best[1], best[2]), (uid, got[uid], best)
        assert abs(got[uid][2] - best[0]) < 1e-9


# ---- query-by-pattern subsequence search ----


def test_pattern_search_planted_exact_match(spark):
    """A series containing the (scaled) query pattern verbatim ranks
    that window first at distance 0."""
    from tsaug_spark.plans.metrics import pattern_search

    pat = [0.0, 0.0, 1.0, 4.0, 9.0, 4.0, 1.0, 0.0]
    bg = [float((13 * t * t + 7 * t) % 97) for t in range(48)]
    x = list(bg)
    x[20:28] = [3 * p + 2 for p in pat]  # scaled copy at i=20
    rows = [("a", t, v) for t, v in enumerate(x)] + [
        ("b", t, v) for t, v in enumerate(bg)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    top = pattern_search(df, pat, top=3).collect()
    assert (top[0].key, top[0].i) == ("a", 20)
    assert top[0].dist < 1e-7 < top[1].dist


def test_pattern_search_matches_numpy_topk(spark):
    """The global top-10 at sf0.01 equals a numpy scan with the same
    z-normalization and the same (dist, key, i) tie order."""
    import numpy as np

    import __spark_entry__ as em
    from tsaug_spark.plans.metrics import pattern_search

    pat = em._SEARCH_PATTERN
    m = len(pat)
    series = em._series_df(spark, "/root/testdata/sf0.01")
    got = [
        (r.key, r.i, r.dist)
        for r in pattern_search(series, pat, top=10).collect()
    ]
    p = np.asarray(pat)
    pmu = p.sum() / m
    psig = np.sqrt(m * (p * p).sum() - p.sum() ** 2) / m
    pz = (p - pmu) / psig
    cands = []
    pdf = series.toPandas()
    for uid, g in pdf.groupby("conv_id"):
        x = g.sort_values("bucket_idx").cnt.to_numpy()
        for i in range(len(x) - m + 1):
            w = x[i:i + m]
            sig = np.sqrt(m * (w * w).sum() - w.sum() ** 2) / m
            z = np.zeros(m) if sig == 0 else (w - w.sum() / m) / sig
            cands.append(
                (float(np.sqrt(((z - pz) ** 2).sum())), uid, i)
            )
    cands.sort()
    ref = [(u, i, d) for d, u, i in cands[:10]]
    assert [(k, i) for k, i, _ in got] == [(k, i) for k, i, _ in ref]
    for (_k, _i, dg), (_k2, _i2, dr) in zip(got, ref):
        assert abs(dg - dr) < 1e-9


def test_transition_latency_hand_chain(spark):
    """Two users' interleaved chains: per-pair counts and exact mean
    microsecond delays from a hand-computed fixture."""
    import datetime as _dt

    from tsaug_spark.plans.metrics import transition_latency

    rows = [
        (1, 0.0, "a"), (1, 1.5, "b"), (1, 4.5, "b"),
        (2, 0.0, "a"), (2, 2.0, "b"),
    ]
    df = spark.createDataFrame(
        [
            (i, _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=s),
             u, t)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r.from_state, r.to_state): r
        for r in transition_latency(df).collect()
    }
    ab = out[("a", "b")]
    assert ab.n == 2 and ab.mean_delay_us == (1.5e6 + 2.0e6) / 2
    assert ab.max_delay_us == 2_000_000
    bb = out[("b", "b")]
    assert bb.n == 1 and bb.mean_delay_us == 3.0e6


def test_burstiness_small_keys_keep_fano(spark):
    """Review fix: a key with < 3 events still appears with its
    well-defined Fano factor; cv2 is NULL (fewer than 2 gaps)."""
    from tsaug_spark.plans.metrics import burstiness

    rows = [(1, 0, 1.0), (1, 7200, 1.0), (2, 0, 1.0)] + [
        (3, h * 600, 1.0) for h in range(30)
    ]
    out = {r.key: r for r in burstiness(_ev(spark, rows), "1h").collect()}
    assert out[1].n_events == 2 and out[1].cv2 is None
    assert out[1].fano is not None
    assert out[2].n_events == 1 and out[2].cv2 is None
    assert out[3].cv2 is not None


def test_pattern_search_skips_short_series(spark):
    """Review fix: series shorter than the pattern are excluded
    instead of crashing element_at or polluting the top-k with
    NULLs."""
    from tsaug_spark.plans.metrics import pattern_search

    pat = [1.0, 2.0, 3.0, 4.0]
    rows = [("long", t, float(t % 5)) for t in range(12)] + [
        ("short", t, 1.0) for t in range(3)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    out = pattern_search(df, pat, top=50).collect()
    assert out and all(r.key == "long" for r in out)
    assert all(r.dist is not None for r in out)


def test_motif_and_pattern_survive_noninteger_values(spark):
    """Review fix: float-cancellation on near-constant non-integer
    windows must not raise a math domain error (variance clamped at
    0)."""
    from tsaug_spark.plans.metrics import motif_pair, pattern_search

    rows = [("a", t, 0.1) for t in range(20)]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_idx long, cnt double"
    )
    m = motif_pair(df, m=4).collect()
    assert len(m) == 1 and m[0].dist == 0.0  # flat windows z to zeros
    p = pattern_search(df, [0.1] * 4, top=3).collect()
    assert len(p) == 3 and all(r.dist == 0.0 for r in p)


def test_session_duration_percentiles_numpy(spark):
    """p50/p90 session durations per user at sf0.01 match a pandas
    re-sessionization with the same rank-selection definitions."""
    import math

    import numpy as np

    import __spark_entry__ as em

    got = {
        r.user_id: r
        for r in em.q_session_duration_p(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .selectExpr(
            "user_id", "event_id", "CAST(unix_timestamp(ts) AS LONG) t"
        )
        .toPandas()
        .sort_values(["user_id", "t", "event_id"])
    )
    for uid, g in ev.groupby("user_id"):
        t = g.t.to_numpy()
        new = np.zeros(len(t), dtype=int)
        new[1:] = (np.diff(t) > 1800).astype(int)
        sid = new.cumsum()
        durs = sorted(
            int(t[sid == s].max() - t[sid == s].min())
            for s in np.unique(sid)
        )
        m = len(durs)
        p50 = (
            durs[m // 2]
            if m % 2
            else (durs[m // 2 - 1] + durs[m // 2]) / 2
        )
        k90 = math.ceil(0.9 * m)
        r = got[uid]
        assert r.n_sessions == m
        assert r.p50_dur_s == p50
        assert r.p90_dur_s == durs[k90 - 1]


def test_rolling_corr_matches_numpy(spark):
    """Rolling 24-bucket correlation at sf0.001 equals np.corrcoef on
    every full window of the zero-filled (count, cents) channels."""
    import numpy as np

    from tsaug_spark.plans.metrics import rolling_corr

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r.key, r.bucket_s): r.corr
        for r in rolling_corr(ev, "1h", window=24).collect()
    }
    pdf = ev.select("user_id", "ts", "value").toPandas()
    b = (pdf.ts.astype("int64") // 10**9 // 3600) * 3600
    lo, hi = int(b.min()), int(b.max())
    T = (hi - lo) // 3600 + 1
    n_checked = 0
    for uid, g in pdf.assign(b=b).groupby("user_id"):
        c = np.zeros(T, dtype=np.int64)
        v = np.zeros(T, dtype=np.int64)
        for bb, gg in g.groupby("b"):
            i = (int(bb) - lo) // 3600
            c[i] = len(gg)
            v[i] = int(round(gg.value.sum() * 100))
        for i in range(23, T):
            wc, wv = c[i - 23:i + 1], v[i - 23:i + 1]
            key = (uid, lo + i * 3600)
            if wc.std() == 0 or wv.std() == 0:
                assert got[key] is None
                continue
            ref = float(np.corrcoef(wc, wv)[0, 1])
            assert abs(got[key] - ref) < 1e-9, (key, got[key], ref)
            n_checked += 1
    assert n_checked > 100


def test_state_dwell_hand_chain(spark):
    """Hand timeline: dwell is attributed to the state HELD (LOCF),
    the final segment contributes nothing."""
    import datetime as _dt

    from tsaug_spark.plans.metrics import state_dwell

    rows = [(1, 0.0, "a"), (1, 2.5, "b"), (1, 3.0, "a"), (1, 10.0, "b")]
    df = spark.createDataFrame(
        [
            (i, _dt.datetime(2024, 1, 1)
             + _dt.timedelta(seconds=s), u, t)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r.key, r.state): r for r in state_dwell(df).collect()
    }
    a = out[(1, "a")]
    assert a.n_segments == 2 and a.dwell_us == int(2.5e6 + 7.0e6)
    b = out[(1, "b")]
    assert b.n_segments == 1 and b.dwell_us == int(0.5e6)


def test_benford_digits_closed_form(spark):
    """Hand values with known first digits: exact counts/shares, zero
    values excluded, chi2 equals the hand-computed statistic."""
    import math

    from tsaug_spark.plans.metrics import benford_digits

    vals = [1.23, 19.99, 0.15, 2.50, 0.0, 999.99]  # digits 1,1,1,2,-,9
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = _ev(spark, rows).withColumn("event_type", F.lit("t"))
    out = {r.digit: r for r in benford_digits(df).collect()}
    assert {d: out[d].n for d in out} == {1: 3, 2: 1, 9: 1}
    assert out[1].share == 3 / 5
    chi = 0.0
    for d, n in ((1, 3), (2, 1), (9, 1)):
        p = math.log10(1 + 1 / d)
        chi += (n - 5 * p) ** 2 / (5 * p)
    # remaining digits have n=0 contributions EXCLUDED (only observed
    # digit rows exist) — assert the engine's sum over observed digits
    obs = sum(
        (out[d].n - 5 * math.log10(1 + 1 / d)) ** 2
        / (5 * math.log10(1 + 1 / d))
        for d in out
    )
    assert abs(out[1].chi2 - obs) < 1e-9


def test_trimmed_mean_resists_outlier(spark):
    """An injected huge outlier moves the plain mean but not the 10%
    trimmed mean (closed-form fixture: 10 values, k=1 trims the
    extremes)."""
    import __spark_entry__ as em

    vals = [10.0] * 9 + [10000.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = _ev(spark, rows)
    import tempfile, os
    d = tempfile.mkdtemp(prefix="trim_")
    df.selectExpr(
        "event_id", "ts", "user_id", "'click' AS event_type",
        "value", "'{}' AS props"
    ).write.parquet(f"{d}/events.parquet")
    out = em.q_trimmed_mean_1d(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 10
    # k=1: drop one 10.0 and the 10000.0 -> mean of eight 10.0s
    assert r.trimmed_mean == 10.0


def test_slo_burn_multiwindow_page(spark):
    import datetime as dt

    # h0: 1/4 errors (burn 1.0, no page); h1: 4/10 (fast 1.6, slow
    # 5/14*4=1.43 -> page); h2: 0/10 (no page); h8: 2/5 (fast 1.6,
    # slow window [h3..h8] holds ONLY h8 -> 1.6 -> page; checks the
    # sparse RANGE window skips hours outside the 6h span).
    from tsaug_spark.plans.metrics import slo_burn

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for hour, tot, err in ((0, 4, 1), (1, 10, 4), (2, 10, 0),
                           (8, 5, 2)):
        for i in range(tot):
            rows.append(
                (len(rows), t0 + dt.timedelta(hours=hour, seconds=i),
                 1, "error" if i < err else "click", 1.0)
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = {r.tot_1h and r.bucket_s: r for r in slo_burn(df).collect()}
    base = int(t0.timestamp())
    assert [out[base + h * 3600].page for h in (0, 1, 2, 8)] == [
        False, True, False, True]
    r1 = out[base + 3600]
    assert (r1.tot_6h, r1.err_6h) == (14, 5)
    assert r1.burn_1h == 1.6 and abs(r1.burn_6h - 5 / 14 * 4) < 1e-12
    r8 = out[base + 8 * 3600]
    assert (r8.tot_6h, r8.err_6h) == (5, 2)  # gap hours excluded


def test_top_paths_sessionizes_and_orders(spark):
    from datetime import datetime, timedelta
    from tsaug_spark.plans.metrics import top_paths
    b = datetime(2024, 1, 1, 12)
    rows = []
    eid = 0
    # user 1: session "a>b", then 40 min gap, session "a>b"
    for t0 in (b, b + timedelta(minutes=45)):
        for i, et in enumerate(("a", "b")):
            rows.append((eid, 1, t0 + timedelta(seconds=i), et)); eid += 1
    # user 2: one session "c"
    rows.append((eid, 2, b, "c")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r.rank: r for r in top_paths(df).collect()}
    assert out[1].path == "a>b" and out[1].sessions == 2
    assert out[2].path == "c" and out[2].sessions == 1


def test_top_paths_prefix_truncation(spark):
    from datetime import datetime, timedelta
    from tsaug_spark.plans.metrics import top_paths
    b = datetime(2024, 1, 1)
    rows = [
        (i, 1, b + timedelta(seconds=i), t)
        for i, t in enumerate("abcdefg")
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = top_paths(df, prefix_len=3).collect()
    assert out[0].path == "a>b>c"


def test_season_strength_periodic_series(spark):
    # exact 24h-periodic counts, 6 days: resid ~ 0 -> seasonal
    # strength ~ 1; flat trend -> trend variance degenerate or tiny
    from datetime import datetime, timedelta
    from tsaug_spark.plans.metrics import season_strength
    b = datetime(2024, 1, 1)
    rows = []
    for d in range(6):
        for h in range(24):
            c = 1 + (h % 12)
            rows += [(1, b + timedelta(days=d, hours=h))] * c
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = season_strength(df).collect()[0]
    assert r.seasonal_strength is not None
    assert r.seasonal_strength > 0.95
    assert r.trend_strength is None or r.trend_strength < 0.6


def test_season_strength_trending_series(spark):
    # exactly linear counts: the centered MA reproduces the series on
    # interior rows, so resid == 0 and seasonal == 0 -> trend strength
    # 1, seasonal variance degenerate (NULL)
    from datetime import datetime, timedelta
    from tsaug_spark.plans.metrics import season_strength
    b = datetime(2024, 1, 1)
    rows = []
    for d in range(6):
        for h in range(24):
            c = 2 + d * 24 + h
            rows += [(1, b + timedelta(days=d, hours=h))] * c
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = season_strength(df).collect()[0]
    assert r.trend_strength is not None and r.trend_strength > 0.99
    assert r.seasonal_strength is None


def test_mase_perfect_seasonal_forecast(spark):
    # exactly 24h-periodic series: seasonal-naive holdout error == 0
    from datetime import datetime, timedelta
    from tsaug_spark.plans.metrics import mase_backtest
    b = datetime(2024, 1, 1)
    rows = []
    for d in range(5):
        for h in range(24):
            rows += [("A", b + timedelta(days=d, hours=h))] * (1 + h % 3)
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = mase_backtest(df).collect()[0]
    assert r.mae_forecast == 0.0 and r.mase == 0.0
    assert r.n_hold == 24


def test_mase_null_when_training_naive_is_perfect(spark):
    # constant training series (err_naive == 0) with a deviating
    # holdout -> mase undefined (NULL), mae_forecast exact
    from datetime import datetime, timedelta
    from tsaug_spark.plans.metrics import mase_backtest
    b = datetime(2024, 1, 1)
    rows = []
    for t in range(96):
        c = 2 if t < 72 else 3   # holdout deviates from its season lag
        rows += [("A", b + timedelta(hours=t))] * c
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = mase_backtest(df).collect()[0]
    assert r.mase is None
    assert abs(r.mae_forecast - 1.0) < 1e-12


def test_cuped_perfect_covariate_equalizes_arms(spark):
    """With post = 2 * pre exactly, theta = 2, rho2 = 1, and both
    arms' adjusted means collapse to 2 * pooled pre mean."""
    from tsaug_spark.plans.metrics import cuped

    rows = []
    eid = 0
    for u in range(20):
        for _ in range(u + 1):  # pre: day 0
            rows.append((eid, T0, u)); eid += 1
        for _ in range(2 * (u + 1)):  # post: day 20
            rows.append((eid, T0 + dt.timedelta(days=20), u)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = cuped(ev).collect()
    assert len(out) == 2
    pooled_x = sum(u + 1 for u in range(20)) / 20.0
    for r in out:
        assert abs(r.theta - 2.0) < 1e-12
        assert abs(r.rho2 - 1.0) < 1e-12
        assert abs(r.mean_y_cuped - 2.0 * pooled_x) < 1e-9


def test_croston_matches_independent_replay(spark):
    """Engine recursion == a from-scratch integer replay in the test,
    including the floor division on a negative step and the
    multi-row-per-day quantity sum."""
    from tsaug_spark.plans.metrics import croston

    demands = [(0, [3.0, 5.0]), (2, [16.0]), (5, [4.0]), (9, [10.0])]
    rows = []
    for day, qs in demands:
        for qv in qs:
            rows.append(
                (1, T0 + dt.timedelta(days=day), qv)
            )
    li = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate timestamp, l_quantity double"
    )
    (r,) = croston(li).collect()

    days = [d for d, _ in demands]
    qty = [int(sum(qs)) for _, qs in demands]
    z, p = qty[0] * 1_000_000, 1_000_000
    for t in range(1, len(qty)):
        z += (qty[t] * 1_000_000 - z) // 8
        p += ((days[t] - days[t - 1]) * 1_000_000 - p) // 8
    assert r.n_obs == 4
    assert r.z_micro == z
    assert r.p_micro == p
    assert r.forecast == float(z) / float(p)


def test_croston_min_obs_filter(spark):
    from tsaug_spark.plans.metrics import croston

    li = spark.createDataFrame(
        [(7, T0 + dt.timedelta(days=d), 5.0) for d in range(3)],
        "l_partkey long, l_shipdate timestamp, l_quantity double",
    )
    assert croston(li).count() == 0  # 3 demand days < min_obs=4


def test_ratio_ci_delta_matches_python_replay(spark):
    """Deterministic md5 arms + exact integer sums: replay the whole
    delta-method pipeline in Python (same bucket rule, same formula)
    and require exact integer equality and 1e-12 float agreement."""
    import hashlib

    from tsaug_spark.plans.metrics import ratio_ci_delta

    # user u: u purchases and (u % 3 + 1) clicks
    rows = []
    for u in range(1, 13):
        rows += [(u, 60 * k, "purchase") for k in range(u)]
        rows += [(u, 7 + 60 * k, "click") for k in range(u % 3 + 1)]
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, t, 1.0)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = {r.arm: r for r in ratio_ci_delta(df).collect()}

    def arm(u):
        h = hashlib.md5(f"{u}exp1".encode()).hexdigest()[:8]
        return "control" if int(h, 16) % 2 == 0 else "treatment"

    agg = {}
    for u in range(1, 13):
        x, y = u, u % 3 + 1
        a = agg.setdefault(arm(u), [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += x * y
        a[5] += y * y
    assert set(out) == set(agg)
    for name, (n, sx, sy, sxx, sxy, syy) in agg.items():
        r = out[name]
        assert (r.n_users, r.numer, r.denom) == (n, sx, sy)
        ratio = sx / sy
        ybar = sy / n
        cxx, cxy, cyy = (
            n * sxx - sx * sx,
            n * sxy - sx * sy,
            n * syy - sy * sy,
        )
        var_u = (cxx - 2.0 * ratio * cxy + ratio * ratio * cyy) / (
            n * n
        )
        se = (var_u / (n * ybar * ybar)) ** 0.5
        assert abs(r.ratio - ratio) < 1e-12
        assert abs(r.se - se) < 1e-12
        assert abs(r.ci_lo - (ratio - 1.96 * se)) < 1e-12
        assert abs(r.ci_hi - (ratio + 1.96 * se)) < 1e-12


def test_ratio_ci_delta_zero_variance_collapses_band(spark):
    """Every user identical (x=2, y=1): the user-level quadratic form
    is exactly 0, so se = 0 and the CI collapses onto the ratio."""
    from tsaug_spark.plans.metrics import ratio_ci_delta

    rows = []
    for u in range(1, 9):
        rows += [(u, 0, "purchase"), (u, 5, "purchase"), (u, 9, "click")]
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, t, 1.0)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    for r in ratio_ci_delta(df).collect():
        assert r.ratio == 2.0
        assert r.se == 0.0
        assert r.ci_lo == 2.0 and r.ci_hi == 2.0


def _md5_treated(u, salt="exp1"):
    import hashlib

    h = hashlib.md5(f"{u}{salt}".encode()).hexdigest()[:8]
    return int(h, 16) % 2


def _evt(spark, rows):
    """rows: (user_id, day-offset-float, event_type, value)."""
    data = [
        (i, T0 + dt.timedelta(days=off), uid, t, float(v))
        for i, (uid, off, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


def test_cmh_odds_matches_python_replay(spark):
    """Two day strata with hand-built (user, day) exposure/conversion
    cells: replay the md5 arms and the fixed-point terms exactly."""
    from tsaug_spark.plans.metrics import cmh_odds

    # day 0: users 1..6 click, odd users purchase too
    # day 1: users 1..4 click, users 1,2 purchase
    rows = []
    for u in range(1, 7):
        rows.append((u, 0.1, "click", 1.0))
        if u % 2 == 1:
            rows.append((u, 0.2, "purchase", 1.0))
    for u in range(1, 5):
        rows.append((u, 1.1, "click", 1.0))
        if u <= 2:
            rows.append((u, 1.2, "purchase", 1.0))
    (r,) = cmh_odds(_evt(spark, rows)).collect()

    cells = {}
    for u, day, conv in (
        [(u, 0, u % 2) for u in range(1, 7)]
        + [(u, 1, 1 if u <= 2 else 0) for u in range(1, 5)]
    ):
        a, b, c, d = cells.setdefault(day, [0, 0, 0, 0])
        i = (1 - _md5_treated(u)) * 2 + (1 - conv)
        cells[day][i] += 1
    num = den = sa = sb = sc = sd = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        num += (a * d * 10**6) // n
        den += (b * c * 10**6) // n
        sa, sb, sc, sd = sa + a, sb + b, sc + c, sd + d
    assert r.n_strata == 2
    assert (r.treated_conv, r.treated_nonconv) == (sa, sb)
    assert (r.control_conv, r.control_nonconv) == (sc, sd)
    assert (r.num_micro, r.den_micro) == (num, den)
    assert r.or_mh == num / den


def test_cmh_simpson_reversal_guard(spark):
    """Both strata inside have OR 1 (treatment does nothing), but the
    marginal table is confounded by volume; CMH must report ~1."""
    from tsaug_spark.plans.metrics import cmh_odds

    # pick users by arm so each stratum is balanced by construction
    treats = [u for u in range(1, 60) if _md5_treated(u)][:8]
    ctrls = [u for u in range(1, 60) if not _md5_treated(u)][:8]
    rows = []
    # day 0 (high conv): 4T+4C click, half of each convert
    for i in range(4):
        for arm_users in (treats, ctrls):
            u = arm_users[i]
            rows.append((u, 0.1, "click", 1.0))
            if i < 2:
                rows.append((u, 0.2, "purchase", 1.0))
    # day 1 (low conv): other 4T+4C click, 1 of each converts
    for i in range(4, 8):
        for arm_users in (treats, ctrls):
            u = arm_users[i]
            rows.append((u, 1.1, "click", 1.0))
            if i == 4:
                rows.append((u, 1.2, "purchase", 1.0))
    (r,) = cmh_odds(_evt(spark, rows)).collect()
    assert r.or_mh == 1.0  # a*d == b*c in every stratum


def test_did_estimate_matches_python_replay(spark):
    """Days 0..9 split at 5; per-user purchase counts replayed with
    the md5 arms; DiD equals the four-cell contrast exactly."""
    from tsaug_spark.plans.metrics import did_estimate

    rows = []
    purchases = {}
    for u in range(1, 9):
        for d in range(10):
            rows.append((u, d + 0.1, "view", 1.0))
            k = (u + d) % 3
            for _ in range(k):
                rows.append((u, d + 0.2, "purchase", 1.0))
            key = (u, 1 if d >= 5 else 0)
            purchases[key] = purchases.get(key, 0) + k
    (r,) = did_estimate(_evt(spark, rows)).collect()
    day0 = int(
        (T0 - dt.datetime(1970, 1, 1)).total_seconds() // 86400
    )
    assert r.split_day == ((day0 + day0 + 9) + 1) // 2
    cells = {}
    for (u, post), x in purchases.items():
        n, sx = cells.setdefault((_md5_treated(u), post), [0, 0])
        cells[(_md5_treated(u), post)] = [n + 1, sx + x]
    m = {
        k: cells[k][1] / cells[k][0]
        for k in cells
    }
    assert (r.n_tpre, r.sx_tpre) == tuple(cells[(1, 0)])
    assert (r.n_cpost, r.sx_cpost) == tuple(cells[(0, 1)])
    want = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert abs(r.did - want) < 1e-15


def test_attribution_models_single_path(spark):
    """view -> click -> view -> purchase inside the window, plus one
    stale view outside it: L=3, all four models hand-checked."""
    from tsaug_spark.plans.metrics import attribution_models

    rows = [
        (1, 0.0, "view", 1.0),     # 3 days before: outside window
        (1, 3.00, "view", 1.0),
        (1, 3.01, "click", 1.0),
        (1, 3.02, "view", 1.0),
        (1, 3.03, "purchase", 1.0),
        (1, 3.04, "click", 1.0),   # after the purchase: no credit
    ]
    out = {
        r.touch: r
        for r in attribution_models(_evt(spark, rows)).collect()
    }
    v, c = out["view"], out["click"]
    assert (v.n_touches, c.n_touches) == (2, 1)
    assert (v.first_micro, v.last_micro) == (10**6, 10**6)
    assert (c.first_micro, c.last_micro) == (0, 0)
    assert v.linear_micro == 2 * (10**6 // 3)
    assert c.linear_micro == 10**6 // 3
    assert v.ushape_micro == 800000 and c.ushape_micro == 200000


def test_attribution_models_short_paths(spark):
    """L=1 gives the lone touch everything; L=2 splits u-shape
    50/50; ties on ts break on event_id (touch before conversion)."""
    from tsaug_spark.plans.metrics import attribution_models

    rows = [
        (1, 1.0, "click", 1.0),
        (1, 1.5, "purchase", 1.0),      # L=1 path: click
        (2, 2.0, "view", 1.0),
        (2, 2.1, "click", 1.0),
        (2, 2.2, "purchase", 1.0),      # L=2 path: view, click
    ]
    out = {
        r.touch: r
        for r in attribution_models(_evt(spark, rows)).collect()
    }
    v, c = out["view"], out["click"]
    assert (c.first_micro, c.last_micro) == (10**6, 2 * 10**6)
    assert (v.first_micro, v.last_micro) == (10**6, 0)
    assert c.ushape_micro == 10**6 + 500000
    assert v.ushape_micro == 500000
    assert c.linear_micro == 10**6 + 500000


def test_rate_ratio_replay(spark):
    """Days 0..9 (split 5): 4 purchases before, 12 after; exposures
    5/5 days; replay RR and the conditional-binomial z exactly."""
    from tsaug_spark.plans.metrics import rate_ratio_test

    rows = []
    for d in range(10):
        rows.append((1, d + 0.1, "view", 1.0))
    for _ in range(4):
        rows.append((2, 1.5, "purchase", 1.0))
    for _ in range(12):
        rows.append((2, 7.5, "purchase", 1.0))
    (r,) = rate_ratio_test(_evt(spark, rows)).collect()
    assert (r.pre_events, r.post_events) == (4, 12)
    assert (r.pre_days, r.post_days) == (5, 5)
    assert r.rate_ratio == (12 / 5) / (4 / 5)
    nn, p0 = 16.0, 0.5
    z = (12.0 - nn * p0) / (nn * p0 * (1 - p0)) ** 0.5
    assert r.z == z
    assert r.significant == (abs(z) > 1.96)


def test_rate_ratio_balanced_is_null(spark):
    """Equal counts over equal exposures: RR = 1, z = 0."""
    from tsaug_spark.plans.metrics import rate_ratio_test

    rows = [(1, 0.1, "view", 1.0), (1, 9.9, "view", 1.0)]
    for d in (1.5, 7.5):
        rows += [(2, d, "purchase", 1.0)] * 6
    (r,) = rate_ratio_test(_evt(spark, rows)).collect()
    assert r.rate_ratio == 1.0 and r.z == 0.0 and not r.significant


def test_rate_ratio_single_day_horizon_degenerates_to_null(spark):
    """ADVICE r3: a single-day horizon gives pre_days = 0; under ANSI
    mode the old expression errored on division by zero — now the
    test statistics degenerate to NULL instead."""
    from tsaug_spark.plans.metrics import rate_ratio_test

    rows = [(1, 0.1, "purchase", 1.0), (2, 0.6, "purchase", 1.0)]
    (r,) = rate_ratio_test(_evt(spark, rows)).collect()
    assert (r.pre_days, r.post_days) == (0, 1)
    assert (r.pre_events, r.post_events) == (0, 2)
    assert r.rate_ratio is None and r.z is None
    assert r.significant is None


def test_rate_ratio_no_outcome_events_is_null(spark):
    """Zero purchases: nn = 0 makes z's denominator 0 — NULL, not an
    ANSI division error."""
    from tsaug_spark.plans.metrics import rate_ratio_test

    rows = [(1, float(d) + 0.1, "view", 1.0) for d in range(10)]
    (r,) = rate_ratio_test(_evt(spark, rows)).collect()
    # the filtered count aggregate sees zero rows, so the whole row
    # degenerates to NULLs (empty-agg semantics) — the point is it
    # does NOT raise an ANSI division error
    assert r.pre_events is None and r.post_events is None
    assert r.rate_ratio is None and r.z is None and r.significant is None


def test_rate_ratio_zero_pre_events_null_rr_valid_z(spark):
    """x1 = 0 with a real two-sided horizon: RR is undefined (NULL)
    but the conditional-binomial z is still finite."""
    from tsaug_spark.plans.metrics import rate_ratio_test

    rows = [(1, 0.1, "view", 1.0), (1, 9.9, "view", 1.0)]
    rows += [(2, 7.5, "purchase", 1.0)] * 8
    (r,) = rate_ratio_test(_evt(spark, rows)).collect()
    assert (r.pre_events, r.post_events) == (0, 8)
    assert r.rate_ratio is None
    nn, p0 = 8.0, 0.5
    assert r.z == (8.0 - nn * p0) / (nn * p0 * (1 - p0)) ** 0.5


def test_kalman_matches_independent_replica(spark):
    """Kalman level/gain/p vs an independent pure-Python fold on a
    ramp+noise fixture (bit-exact, same fold); gain converges to the
    steady-state Riccati solution and a constant series' level stays
    pinned to the constant."""
    import numpy as np

    from tsaug_spark.plans.metrics import kalman_filter

    rng = np.random.RandomState(23)
    x = 5.0 + 0.25 * np.arange(60) + rng.uniform(-1, 1, size=60)
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(x)],
        "conv_id string, bucket_idx long, cnt double",
    )
    out = {
        r.ord: (r.pred, r.gain, r.level, r.p)
        for r in kalman_filter(df, q=0.25, r=1.0).collect()
    }
    assert out[0] == (None, None, x[0], 1.0)
    level, p = x[0], 1.0
    for t in range(1, 60):
        p_pred = p + 0.25
        k = p_pred / (p_pred + 1.0)
        pred = level
        level = level + k * (x[t] - level)
        p = (1.0 - k) * p_pred
        assert out[t] == (pred, k, level, p), t

    # steady-state gain: with P = p_pred*, the Riccati fixpoint is
    # P = rP/(P+r) + q  =>  P^2 - qP - qr = 0, k* = P/(P+r)
    ppred = (0.25 + np.sqrt(0.25**2 + 4 * 0.25 * 1.0)) / 2
    k_star = ppred / (ppred + 1.0)
    assert abs(out[59][1] - k_star) < 1e-12

    const = spark.createDataFrame(
        [("k", i, 7.0) for i in range(20)],
        "conv_id string, bucket_idx long, cnt double",
    )
    rows = kalman_filter(const).collect()
    assert all(r.level == 7.0 for r in rows)
