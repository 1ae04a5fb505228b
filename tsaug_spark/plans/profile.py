"""Data-quality profiling: per-column statistics in one pass.

Every production ingestion pipeline fronts its tables with a profile
job — null rates, cardinalities, value ranges — to catch schema drift
and upstream corruption before it poisons downstream rollups.  This
module computes the profile as ONE wide aggregate (a single scan, all
metrics in the same HashAggregate) and then explodes the per-column
rows out of the aggregated struct — no per-column scans, no driver
loops.

Determinism contract: min/max are stringified only from exact values
(BIGINTs — timestamps via unix microseconds, floats via cents
integerization — and raw strings), never from doubles, so the profile
hashes identically across engines.

Scale: one scan + one zero-key hash aggregate (map-side partials
collapse each partition to a single row); the count-distincts are the
only expensive members — Spark plans them with one Expand (rows x
n_distinct_columns), the standard multi-distinct strategy, which is
linear and shuffle-bounded.  For trillion-row tables swap exact
distinct counts for HLL sketches (see plans/sketches.py) — the
profile schema stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_events(df: DataFrame) -> DataFrame:
    """Profile the canonical events table: one row per column with
    row/null/distinct counts and exact stringified min/max.

    Columns are normalized to exact representations first:
    ``ts -> unix_micros``, ``value -> cents``; ids and strings pass
    through.  Output: col_name, n, n_null, n_distinct, min_s, max_s.
    """
    cols = {
        "event_id": F.col("event_id"),
        "ts": F.unix_micros(F.col("ts").cast("timestamp")),
        "user_id": F.col("user_id"),
        "event_type": F.col("event_type"),
        "value_cents": F.round(F.col("value") * 100).cast("long"),
        "props": F.col("props"),
    }
    aggs = []
    for name, c in cols.items():
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n"),
            F.sum(c.isNull().cast("long")).alias(f"{name}__nulls"),
            F.count_distinct(c).alias(f"{name}__nd"),
            F.min(c).cast("string").alias(f"{name}__min"),
            F.max(c).cast("string").alias(f"{name}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"{name}__n").alias("n"),
                F.col(f"{name}__nulls").alias("n_null"),
                F.col(f"{name}__nd").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_s"),
                F.col(f"{name}__max").alias("max_s"),
            )
            for name in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def top_trigrams(
    df: DataFrame,
    k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Most frequent event-type trigrams across all keys — the
    sequence-mining screen ("which 3-step paths dominate").  Windows
    never cross keys; ranking is exact counts with full lexicographic
    tie-break, so the top-k set is deterministic.

    Scale: one key-window (two lags), one vocabulary-bounded hash
    aggregate (at most |types|^3 groups), one global top-k over that
    bounded table.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    tri = (
        df.select(
            F.lag(F.col(type_col), 2).over(w).alias("t1"),
            F.lag(F.col(type_col), 1).over(w).alias("t2"),
            F.col(type_col).alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rw = Window.orderBy(
        F.col("cnt").desc(),
        F.col("t1").asc(),
        F.col("t2").asc(),
        F.col("t3").asc(),
    )
    return (
        tri.select(
            F.row_number().over(rw).alias("rank"),
            "t1",
            "t2",
            "t3",
            "cnt",
        )
        .filter(F.col("rank") <= k)
    )


def fk_orphans(
    pairs: "list[tuple[str, DataFrame, str, DataFrame, str]]",
) -> DataFrame:
    """Referential-integrity audit over a list of foreign-key edges:
    for each ``(fk_name, child_df, child_col, parent_df, parent_col)``
    report ``(fk_name, n_child, n_orphans, orphan_rate)`` — the gate
    every curation pipeline runs before joins silently drop (or
    fabricate) training rows.  NULL child keys count as orphans (a
    NULL FK can never join).

    Shape per edge: one LEFT ANTI join child->parent on the key plus
    one count — Catalyst broadcasts the parent side when it is small
    (the dimension chain here) and falls back to a shuffled hash join
    for fact-to-fact edges; either way the audit is two scans per
    edge, no row data moved beyond the key column.  All counts exact
    BIGINTs; the rate is one double division.
    """
    outs = []
    for fk_name, child, child_col, parent, parent_col in pairs:
        keys = child.select(F.col(child_col).alias("k"))
        parents = parent.select(F.col(parent_col).alias("k")).distinct()
        n_child = keys.agg(F.count(F.lit(1)).alias("n_child"))
        orphans = (
            keys.join(parents, "k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        outs.append(
            n_child.crossJoin(orphans).select(
                F.lit(fk_name).alias("fk_name"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
                (
                    F.col("n_orphans").cast("double")
                    / F.col("n_child").cast("double")
                ).alias("orphan_rate"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
