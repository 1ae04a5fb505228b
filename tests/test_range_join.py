"""Bucketed range join: exact parity with the naive BETWEEN join, and
an equi-join physical plan (never a nested-loop / cartesian product)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tsaug_spark.plans.range_join import range_join

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t")
    )


def _busy_intervals(spark, ev):
    hourly = ev.groupBy(
        (F.floor(F.col("t") / 3600) * 3600).cast("long").alias("lo")
    ).agg(F.count(F.lit(1)).alias("c"))
    th = hourly.agg(
        (F.lit(1.2) * F.sum("c") / F.count(F.lit(1))).alias("th")
    )
    return (
        hourly.crossJoin(F.broadcast(th))
        .filter(F.col("c") >= F.col("th"))
        .select("lo", (F.col("lo") + 7199).alias("hi"))
    )


def _pairs(df, cols=("event_id", "lo")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_inner_matches_naive(spark):
    ev = _events(spark)
    iv = _busy_intervals(spark, ev)
    got = range_join(ev, iv, "t", chunk=3600)
    naive = ev.join(
        iv, (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
    )
    assert _pairs(got) == _pairs(naive)


def test_chunk_smaller_than_interval_still_exact(spark):
    """Intervals spanning many chunks replicate but never duplicate a
    match (a point meets an interval only in its own chunk)."""
    ev = _events(spark)
    iv = _busy_intervals(spark, ev)
    got = range_join(ev, iv, "t", chunk=600)
    naive = ev.join(
        iv, (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
    )
    assert _pairs(got) == _pairs(naive)


def test_left_join_keeps_unmatched_points(spark):
    ev = _events(spark)
    iv = _busy_intervals(spark, ev)
    lj = range_join(ev, iv, "t", chunk=3600, how="left")
    # every (point, interval) inner pair appears, plus one NULL row per
    # fully-unmatched point
    inner = range_join(ev, iv, "t", chunk=3600)
    n_unmatched = (
        ev.join(inner.select("event_id").distinct(), "event_id",
                "left_anti").count()
    )
    assert lj.count() == inner.count() + n_unmatched
    assert lj.filter(F.col("lo").isNull()).count() == n_unmatched


def test_key_cols_scope_matches(spark):
    """Per-key intervals: a point only matches intervals of ITS key."""
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [1, 2, 3, 4],
                "k": ["a", "a", "b", "b"],
                "t": [10, 50, 10, 99],
            }
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "b"], "lo": [0, 90], "hi": [20, 120]}
        )
    )
    got = range_join(
        pts, iv, "t", chunk=16, key_cols=["k"]
    )
    assert _pairs(got, ("pid", "lo")) == [(1, 0), (4, 90)]


def test_plan_is_equi_join(spark):
    """The range join itself must be an equi-join.  The busy-interval
    builder's 1-row scalar-threshold broadcast is a legitimate
    BroadcastNestedLoopJoin, so fold the threshold to a literal here to
    isolate the join under test."""
    ev = _events(spark)
    th = _busy_intervals(spark, ev)  # noqa: F841 — shape sanity only
    hourly = ev.groupBy(
        (F.floor(F.col("t") / 3600) * 3600).cast("long").alias("lo")
    ).agg(F.count(F.lit(1)).alias("c"))
    cutoff = float(
        hourly.agg(
            (F.lit(1.2) * F.sum("c") / F.count(F.lit(1)))
        ).first()[0]
    )
    iv = hourly.filter(F.col("c") >= F.lit(cutoff)).select(
        "lo", (F.col("lo") + 7199).alias("hi")
    )
    plan = (
        range_join(ev, iv, "t", chunk=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_unknown_how(spark):
    ev = _events(spark)
    iv = _busy_intervals(spark, ev)
    try:
        range_join(ev, iv, "t", how="full")
    except ValueError as exc:
        assert "inner/left" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")
