"""Bucketed range join: exact parity with the naive BETWEEN join, and
an equi-join physical plan (never a nested-loop / cartesian product)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
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


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                 max_size=40),
    ivs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=200),
                  st.integers(min_value=0, max_value=60)),
        min_size=1, max_size=15,
    ),
    chunk=st.sampled_from([1, 7, 16, 64]),
)
def test_property_matches_bruteforce(spark, pts, ivs, chunk):
    """Arbitrary point/interval sets at arbitrary chunk sizes equal the
    brute-force O(n*m) reference, including duplicate and degenerate
    (lo == hi) intervals."""
    pdf_p = pd.DataFrame({"pid": range(len(pts)), "t": pts})
    pdf_i = pd.DataFrame(
        {
            "iid": range(len(ivs)),
            "lo": [lo for lo, w in ivs],
            "hi": [lo + w for lo, w in ivs],
        }
    )
    got = (
        range_join(
            spark.createDataFrame(pdf_p),
            spark.createDataFrame(pdf_i),
            "t", chunk=chunk,
        )
        .select("pid", "iid")
        .collect()
    )
    want = {
        (p, i)
        for p, t in zip(pdf_p.pid, pdf_p.t)
        for i, lo, hi in zip(pdf_i.iid, pdf_i.lo, pdf_i.hi)
        if lo <= t <= hi
    }
    assert {(r.pid, r.iid) for r in got} == want
    assert len(got) == len(want)  # no duplicate emission


def test_interval_overlap_join_vs_brute_force(spark):
    """Bucketed overlap join == naive overlap predicate, pairs emitted
    exactly once even when a pair shares many chunks."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from tsaug_spark.plans.range_join import interval_overlap_join

    rng = random.Random(11)
    ivs = []
    for i in range(60):
        lo = rng.randrange(0, 50_000)
        ivs.append((i, lo, lo + rng.randrange(0, 20_000)))  # long spans
    a = spark.createDataFrame(
        [(f"a{i}", lo, hi) for i, lo, hi in ivs],
        "id_a string, a_lo long, a_hi long",
    )
    b = spark.createDataFrame(
        [(f"b{i}", lo, hi) for i, lo, hi in ivs],
        "id_b string, b_lo long, b_hi long",
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", chunk=3600
        ).collect()
    )
    want = sorted(
        (f"a{i}", f"b{j}")
        for (i, lo1, hi1), (j, lo2, hi2) in itertools.product(ivs, ivs)
        if lo1 <= hi2 and lo2 <= hi1
    )
    assert got == want  # exactly-once emission (no dup from shared chunks)


def test_interval_overlap_join_rejects_column_collision(spark):
    import pytest

    from tsaug_spark.plans.range_join import interval_overlap_join

    df = spark.createDataFrame([(1, 2)], "lo long, hi long")
    with pytest.raises(ValueError):
        interval_overlap_join(df, df, "lo", "hi", "lo", "hi")
