"""As-of join: for every left row, the most recent right row at or
before it (per key) — the canonical time-series enrichment join.

The reference has no joins at all (SURVEY §2.2); this is an
engine-level operator the retention tiers need (e.g. "which tier bucket
was current when this turn happened").  The implementation is the
scale-safe union+window formulation rather than a range join:

* a range/theta join (``l.ts >= r.ts``) degenerates to a per-key cross
  product that Spark executes as BroadcastNestedLoopJoin or a blown-up
  sort-merge — quadratic in hot keys;
* instead we union both sides tagged, sort per key by (time, side) once
  (a single Exchange + Sort), and carry the last right-side value
  forward with ``last(ignorenulls)`` — linear, whole-stage-codegen'd,
  and skew-bounded by the same salting story as every other window.

``direction='backward'`` matches pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics: ties (equal timestamps) match, because right
rows sort before left rows at the same instant.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    right_time_col: Optional[str] = None,
    tolerance: Optional[int] = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``right`` onto ``left``.

    Returns ``left``'s columns plus, for each ``value_cols`` entry ``v``,
    the value of ``v`` from the latest right row whose time is <= the
    left row's time (``direction='backward'``) or the earliest right row
    whose time is >= it (``'forward'``), per ``key_cols``, else NULL.
    Ties (equal timestamps) match in both directions, as in pandas
    ``merge_asof`` and DuckDB ``ASOF JOIN``.  ``tolerance`` (same units
    as ``time_col``) drops matches farther than the window.

    Both time columns must be mutually comparable (use epoch seconds or
    timestamps on both sides).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    rtime = right_time_col or time_col

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}")
          for v in value_cols],
        F.lit(None).cast(right.schema[rtime].dataType).alias("__r_t"),
    )
    r_tag = right.select(
        *[F.col(c) for c in key_cols],
        F.col(rtime).alias(time_col),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
        F.col(rtime).alias("__r_t"),
    )
    # align schemas: right side lacks the left payload columns
    for c in left.columns:
        if c not in key_cols and c != time_col:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tag = r_tag.select(*l_tag.columns)

    u = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows (side 0) sort before left at equal time, so ties
        # fall inside the [-inf, current] frame
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(time_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # mirrored: right rows sort after left at equal time, frame
        # looks forward, and the FIRST right value wins
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(time_col).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[pick(f"__r_{v}").alias(f"__r_{v}") for v in value_cols],
        pick("__r_t").alias("__r_t"),
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        gap = F.col(time_col).cast("double") - F.col("__r_t").cast("double")
        if direction == "forward":
            gap = -gap
        within = gap <= F.lit(float(tolerance))
        for v in value_cols:
            out = out.withColumn(
                f"__r_{v}", F.when(within, F.col(f"__r_{v}"))
            )
        out = out.withColumn("__r_t", F.when(within, F.col("__r_t")))
    renames = {f"__r_{v}": v for v in value_cols}
    renames["__r_t"] = f"asof_{time_col}"
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out
