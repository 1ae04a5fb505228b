"""Cohort retention and funnel conversion over the event stream.

The behavioral-analytics pair every event pipeline ends up needing
(Mixpanel/Amplitude-class queries), expressed as pure Catalyst plans so
they cascade from the same tier tables as the rest of the engine and
replay exactly in the DuckDB oracle.

Scale notes (10^12 events):

* ``cohort_retention`` is two hash aggregates and one equi-join, all
  keyed on the user — co-partitioned under AQE, no broadcast needed on
  the big sides.  The output is bounded by cohorts x offsets (e.g. 365
  x 365 rows for a year of daily cohorts), never by event volume.
* ``funnel`` runs one conditional aggregate per stage plus an equi-join
  per stage transition, again all on the user key, so the whole funnel
  is a chain of co-partitioned shuffles whose intermediate frames
  shrink monotonically (each stage keeps only survivors).  Delays are
  summed as exact integer microseconds so the per-stage mean is one
  shared float division — deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_S = 86400


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention matrix.

    A user's cohort is their first-seen day; for every (cohort day,
    day offset) the matrix counts how many of that cohort's users were
    active ``offset`` days after their first day, plus the cohort size
    and the retention rate.

    Output: cohort_s, offset_d, n_active, cohort_size, retention
    (retention = n_active / cohort_size, one shared float division over
    exact integer counts).
    """
    day = (
        F.floor(F.unix_timestamp(ts_col) / DAY_S) * DAY_S
    ).cast("long")
    active = (
        df.select(F.col(key_col).alias("key"), day.alias("day_s"))
        .distinct()
    )
    cohort = active.groupBy("key").agg(
        F.min("day_s").alias("cohort_s")
    )
    sizes = cohort.groupBy("cohort_s").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        active.join(cohort, "key")
        .groupBy(
            "cohort_s",
            (
                (F.col("day_s") - F.col("cohort_s")) / F.lit(DAY_S)
            )
            .cast("long")
            .alias("offset_d"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_s").select(
        "cohort_s",
        "offset_d",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


def funnel(
    df: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: how many users performed each stage
    STRICTLY AFTER completing the previous one (earliest-qualifying
    timestamps; ties on the exact microsecond do not advance).

    Output: one row per stage — stage_idx, stage, users,
    avg_hours_from_start (mean delay from the user's stage-0 time to
    their qualifying time at this stage; 0.0 for stage 0).  Delays are
    aggregated as exact integer microsecond sums, so the mean is a
    single float division and the result is partitioning-independent.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).cast("timestamp").alias("ets"),
    )
    # exact integer event times: unix_micros here == epoch_us in DuckDB
    us = F.unix_micros
    cur = (
        base.filter(F.col("etype") == stages[0])
        .groupBy("key")
        .agg(F.min(us(F.col("ets"))).alias("t_us"))
        .withColumn("t0_us", F.col("t_us"))
    )
    tiers = [cur]
    for stage in stages[1:]:
        nxt = (
            base.filter(F.col("etype") == stage)
            .join(cur.select("key", "t_us", "t0_us"), "key")
            .filter(us(F.col("ets")) > F.col("t_us"))
            .groupBy("key", "t0_us")
            .agg(F.min(us(F.col("ets"))).alias("t_us"))
            .select("key", "t_us", "t0_us")
        )
        tiers.append(nxt)
        cur = nxt
    rows = None
    for idx, (stage, tier) in enumerate(zip(stages, tiers)):
        agg = tier.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("users"),
            F.sum(F.col("t_us") - F.col("t0_us")).alias("delay_us"),
        )
        rows = agg if rows is None else rows.unionByName(agg)
    return rows.select(
        "stage_idx",
        "stage",
        "users",
        (
            F.col("delay_us").cast("double")
            / F.lit(3_600_000_000.0)
            / F.nullif(F.col("users"), F.lit(0)).cast("double")
        ).alias("avg_hours_from_start"),
    )


def dau_overlap(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-over-day active-user overlap: for each consecutive day
    pair, how many users were active BOTH days, and the Jaccard
    stickiness of the two active sets — the day-N retention pulse a
    growth dashboard tracks between full cohort reports.

    All integers (distinct (user, day) pairs, equi-joined on day+1);
    Jaccard is one shared final division.

    Scale: the distinct pass is one (user, day) hash aggregate; the
    self-join keys on user AND day, so it is co-partitioned and
    linear, never a cross of the day's actives.
    """
    du = df.select(
        F.col(key_col).alias("u"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
    ).distinct()
    per_day = du.groupBy("day").agg(F.count(F.lit(1)).alias("actives"))
    inter = (
        du.alias("a")
        .join(
            du.select(
                F.col("u").alias("u_b"),
                (F.col("day") - 1).alias("day"),
            ).alias("b"),
            (F.col("a.u") == F.col("u_b"))
            & (F.col("a.day") == F.col("b.day")),
        )
        .groupBy("a.day")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    n1 = per_day.select(
        F.col("day"), F.col("actives").alias("actives_d")
    )
    n2 = per_day.select(
        (F.col("day") - 1).alias("day"),
        F.col("actives").alias("actives_next"),
    )
    return (
        n1.join(n2, "day")
        .join(inter, "day", "left")
        .select(
            "day",
            "actives_d",
            "actives_next",
            F.coalesce("both", F.lit(0)).alias("both"),
            (
                F.coalesce("both", F.lit(0)).cast("double")
                / (
                    F.col("actives_d")
                    + F.col("actives_next")
                    - F.coalesce("both", F.lit(0))
                ).cast("double")
            ).alias("jaccard"),
        )
    )
