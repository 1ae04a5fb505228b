"""Cohort LTV curve and the streaming Wilson twin: pure-Python
references plus streaming == batch equality."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

T0 = dt.datetime(2024, 1, 1)

_EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def test_cohort_ltv_matches_reference(spark):
    from tsaug_spark.plans.cohorts import cohort_ltv

    # (user, day, type, value): two cohorts a week apart
    rows = [
        # cohort week 0: users 1, 2 first seen day 0/1
        (1, 0, "view", 0.0),
        (2, 1, "view", 0.0),
        (1, 2, "purchase", 10.00),
        (2, 8, "purchase", 20.00),   # user 2: offset (8-1)//7 = 1
        (1, 15, "purchase", 5.00),   # user 1: offset 15//7 = 2
        # cohort week 1: user 3 first seen day 7
        (3, 7, "view", 0.0),
        (3, 7, "purchase", 7.00),
        (3, 20, "purchase", 3.00),   # offset (20-7)//7 = 1
    ]
    data = [
        (i, T0 + dt.timedelta(days=d, minutes=i), u, t, v)
        for i, (u, d, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, _EVENT_DDL)
    out = {
        (r["cohort_wk_s"], r["offset_w"]): r
        for r in cohort_ltv(df).collect()
    }
    # epoch day of T0
    e0 = (T0 - dt.datetime(1970, 1, 1)).days
    # cohort weeks are floor(first_epoch_day/7)
    first = {1: e0 + 0, 2: e0 + 1, 3: e0 + 7}
    cwk = {u: d // 7 for u, d in first.items()}
    sizes = defaultdict(int)
    for u in first:
        sizes[cwk[u]] += 1
    rev = defaultdict(int)
    for (u, d, t, v) in rows:
        if t == "purchase":
            off = (e0 + d - first[u]) // 7
            rev[(cwk[u], off)] += round(v * 100)
    max_off = max(o for _, o in rev)
    for wk, size in sizes.items():
        cum = 0
        for off in range(0, max_off + 1):
            cum += rev.get((wk, off), 0)
            r = out[(wk * 7 * 86400, off)]
            assert r["cohort_size"] == size
            assert r["rev_cents"] == rev.get((wk, off), 0)
            assert r["cum_cents"] == cum
            assert math.isclose(
                r["ltv_cents_per_user"], cum / size, rel_tol=1e-12
            )
    assert len(out) == len(sizes) * (max_off + 1)


def test_stream_wilson_equals_batch(spark):
    from tsaug_spark.plans.stats import wilson_interval
    from tsaug_spark.streaming.stream_rollup import (
        run_stream_wilson_once,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    batch = {
        (r["key"], r["day"]): r
        for r in wilson_interval(
            spark.read.parquet(src)
        ).collect()
    }
    stream = {
        (r["key"], r["day"]): r
        for r in run_stream_wilson_once(
            spark, src, sink_table="stream_wilson_test"
        ).collect()
    }
    assert set(batch) == set(stream) and len(batch) > 0
    for kk, b in batch.items():
        s = stream[kk]
        assert (b["k"], b["n"]) == (s["k"], s["n"])
        # identical count state -> identical shared float tree
        assert b["wilson_lo"] == s["wilson_lo"]
        assert b["wilson_hi"] == s["wilson_hi"]
