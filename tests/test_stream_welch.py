"""Streaming Welch A/B continuous aggregate: the caught-up
availableNow sink must equal the batch welch_hourly plan exactly
(the sufficient statistics are algebraic), and the t values must
match a NumPy Welch computed per bucket."""

from __future__ import annotations

import math

import numpy as np


def test_stream_welch_equals_batch(spark, tmp_path):
    from tsaug_spark.plans.stats import welch_hourly
    from tsaug_spark.streaming.stream_rollup import (
        run_stream_welch_once,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    batch = {
        r["bucket_s"]: r
        for r in welch_hourly(
            spark.read.parquet(src)
        ).collect()
    }
    stream = {
        r["bucket_s"]: r
        for r in run_stream_welch_once(
            spark, src, sink_table="stream_welch_test"
        ).collect()
    }
    assert set(batch) == set(stream) and len(batch) > 0
    for k, b in batch.items():
        s = stream[k]
        assert (b["n_a"], b["n_b"]) == (s["n_a"], s["n_b"])
        # identical algebraic state -> identical doubles, bit-exact
        assert b["t_stat"] == s["t_stat"]
        assert b["mean_a"] == s["mean_a"]


def test_welch_hourly_matches_numpy(spark):
    import datetime as dt
    import hashlib

    from tsaug_spark.plans.stats import welch_hourly

    T0 = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(9)
    rows = []
    for i in range(400):
        u = int(rng.randint(0, 40))
        h = int(rng.randint(0, 3))
        v = round(float(rng.uniform(1, 50)), 2)
        rows.append(
            (i, T0 + dt.timedelta(hours=h, minutes=i % 55), u,
             "click", v)
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = {r["bucket_s"]: r for r in welch_hourly(df).collect()}

    def arm(u):
        return int(
            hashlib.md5(f"{u}exp1".encode()).hexdigest()[:8], 16
        ) % 2

    byh = {}
    for (_i, ts, u, _t, v) in rows:
        h = int(ts.timestamp() // 3600 * 3600)
        byh.setdefault(h, ([], []))[arm(u)].append(round(v * 100))
    for h, (a, b) in byh.items():
        if len(a) < 2 or len(b) < 2:
            assert h not in out
            continue
        a, b = np.asarray(a, float), np.asarray(b, float)
        sea = a.var(ddof=1) / len(a)
        seb = b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(sea + seb)
        r = out[h]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        assert math.isclose(r["t_stat"], t, rel_tol=1e-9)
