"""Explicit skew handling: conversation histograms and salted two-phase
aggregation.

Spark's hash aggregate already does map-side partial aggregation, which
neutralizes skew for the algebraic tier rollups.  Salting matters for the
paths where a whole group must be materialized on one task:

* ``applyInPandas`` series kernels — one hot conversation = one task;
* holistic aggregates (collect_list, exact percentiles).

``salted_two_phase`` splits each group into ``n_salts`` subgroups on a
deterministic hash of ``turn_idx`` (phase 1), aggregates partials, then
merges per real key (phase 2).  ``plan_salts`` sizes the salt factor from
a cheap count histogram — at 100 TB this histogram is itself a rollup
(one shuffle over (conv_id), tiny output) and can be sampled.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conv_histogram(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-key row counts — the driver's skew evidence."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("rows"))


def plan_salts(
    df: DataFrame,
    key: str = "conv_id",
    target_rows_per_task: int = 100_000,
    max_salts: int = 64,
) -> int:
    """Pick a salt factor from the worst group's size (driver action)."""
    top = (
        conv_histogram(df, key)
        .agg(F.max("rows").alias("max_rows"))
        .collect()[0]["max_rows"]
    )
    if not top:
        return 1
    return int(min(max_salts, max(1, -(-top // target_rows_per_task))))


def with_salt(df: DataFrame, n_salts: int, salt_on: str = "turn_idx") -> DataFrame:
    """Attach a deterministic salt column in [0, n_salts)."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    )


def salted_two_phase(
    df: DataFrame,
    group_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_on: str = "turn_idx",
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``partial_aggs`` aggregate raw rows within (keys, salt); ``merge_aggs``
    combine the partials per key.  Both phases are ordinary hash
    aggregates, so the hot key's rows are spread over ``n_salts`` tasks in
    phase 1 and only ``n_salts`` partial rows meet in phase 2.
    """
    salted = with_salt(df, n_salts, salt_on)
    phase1 = salted.groupBy(*group_cols, "salt").agg(*partial_aggs)
    return phase1.groupBy(*group_cols).agg(*merge_aggs)


def rollup_salted(df_raw: DataFrame, tier: str, n_salts: int = 16) -> DataFrame:
    """Skew-proof variant of plans.rollup.rollup_transcripts.

    Same output; used when the input key distribution is pathological
    enough that even map-side partials leave reducer hot spots (e.g. one
    conversation dominating a whole file split range).
    """
    from .rollup import bucket_start

    prepared = df_raw.select(
        "conv_id",
        "turn_idx",
        bucket_start(F.col("ts"), tier).alias("bucket_ts"),
        F.col("tool"),
        F.length("text").alias("text_chars"),
    )
    return salted_two_phase(
        prepared,
        ["conv_id", "bucket_ts"],
        partial_aggs=[
            F.count(F.lit(1)).alias("p_turns"),
            F.count("tool").alias("p_tools"),
            F.coalesce(F.sum("text_chars"), F.lit(0)).alias("p_chars"),
        ],
        merge_aggs=[
            F.sum("p_turns").alias("turn_rate"),
            F.sum("p_tools").alias("tool_usage"),
            F.sum("p_chars").alias("text_len"),
        ],
        n_salts=n_salts,
    )


#: split size for skewed-input scans: small enough that one hot
#: conversation's oversized file fans out over many map tasks instead
#: of riding a single straggler (pair with ``balanced_scan_conf``)
SKEW_SPLIT_BYTES = 16 * 1024 * 1024


def balanced_scan_conf() -> dict:
    """Session conf for the planner's skewed-input scan: see
    :func:`cascade_balanced`."""
    return {"spark.sql.files.maxPartitionBytes": str(SKEW_SPLIT_BYTES)}


def cascade_balanced(df_raw: DataFrame) -> "dict[str, DataFrame]":
    """The planner's SKEW cascade — chosen when :func:`plan_salts`
    returns > 1 for the input.

    The bucket-aligned cascade (plans/rollup.py + a bucketed tier
    store) is the uniform-input fast path, but its one-task-per-bucket
    contract on BOTH the scan and the write side turns a hot
    conversation's bucket into a straggler (measured: a 25%-hot corpus
    runs the 64-task tier write as 63 fast tasks + one 5x-average
    straggler that dominates the wall at full parallelism —
    BENCH/BASELINE.md round 5).  This variant swaps it for:

    * a size-split scan — apply :func:`balanced_scan_conf` (16 MB
      splits) so the hot file fans out over many map tasks;
    * AQE-balanced hash-shuffle aggregation — the (conv, bucket) keys
      are fine-grained, so reducers balance regardless of how hot any
      conversation is;
    * plain time-ordered parquet tier writes (no bucketBy) — write
      tasks follow the balanced shuffle, not the bucket layout.

    Trade-off: coarser tiers re-aggregate through a (cheap) shuffle
    instead of bucket-locally, and per-conversation kernels shuffle on
    read — which they do anyway via the chunked kernels a skewed
    corpus needs (plans/chunked.py).  Output is EXACTLY the plain
    cascade's (same rollup expressions; tested bit-identical).

    Returns the same lazy {tier: DataFrame} dict as
    ``plans.rollup.cascade``.
    """
    from .rollup import cascade

    spark = df_raw.sparkSession
    for k, v in balanced_scan_conf().items():
        spark.conf.set(k, v)
    return cascade(df_raw)


def skew_report(
    df: DataFrame, key: str = "user_id", top: int = 10
) -> DataFrame:
    """Partition-planning skew report: the ``top`` heaviest keys with
    their share and cumulative share of all rows — the number a
    capacity planner reads before choosing salt factors (pairs with
    :func:`plan_salts`, and with ``activity_gini`` for the one-number
    summary).

    One hash aggregate over keys, then the global top-k as an
    ``orderBy().limit()`` — Spark plans that as TakeOrderedAndProject
    (per-partition top-k + a k-row driver merge), NOT a single-
    partition sort of the key population; the rank/cumulative window
    then runs over only the ``top`` surviving rows.  Counts are exact
    integers; shares are single divisions of exact integers, so the
    oracle compares raw doubles.

    Output: rnk, key, cnt, share, cum_share.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    topk = counts.orderBy(F.desc("cnt"), "key").limit(top)
    w = Window.orderBy(F.desc("cnt"), "key")
    cum = Window.orderBy(F.desc("cnt"), "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = (
        topk.withColumn("rnk", F.row_number().over(w))
        .withColumn("cum", F.sum("cnt").over(cum))
        .crossJoin(F.broadcast(total))
    )
    return ranked.select(
        "rnk",
        "key",
        "cnt",
        (F.col("cnt").cast("double") / F.col("total").cast("double"))
        .alias("share"),
        (F.col("cum").cast("double") / F.col("total").cast("double"))
        .alias("cum_share"),
    )
