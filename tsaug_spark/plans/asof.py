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
  forward with ``last(ignorenulls)`` — linear and whole-stage-codegen'd.

Skew: the plain formulation windows by ``key_cols`` only, so a hot key
buffers its whole union partition in one task.  Pass ``salt_interval``
(seconds) to enable the salted two-pass variant: rows are additionally
chunked by ``floor(time / salt_interval)`` so the window partitions on
(key, chunk); a per-(key, chunk) summary frame (one row per chunk —
tiny) computes the carry-in value from earlier chunks with a second
window, and the final value is ``coalesce(within-chunk, carry-in)``.
Identical results (tests/test_asof.py pins salted == unsalted), but a
hot key's work is spread over ``time_range / salt_interval`` tasks.

``direction='backward'`` matches pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics: ties (equal timestamps) match, because right
rows sort before left rows at the same instant.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _salted_fill(
    u: DataFrame,
    left_cols: Sequence[str],
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    direction: str,
    salt_interval: int,
) -> DataFrame:
    """Skew-safe fill over the tagged union: window on (key, chunk) and
    coalesce with a carry-in computed on a one-row-per-chunk summary.

    The only per-row shuffles key on (key, chunk) — a hot key's rows
    spread over its time chunks — while the cross-chunk dependency runs
    on the summary frame (|keys| x |chunks| rows).
    """
    u = u.withColumn(
        "__chunk",
        F.floor(F.col(time_col) / F.lit(salt_interval)).cast("long"),
    )
    key_chunk = [*key_cols, "__chunk"]
    if direction == "backward":
        w_local = (
            Window.partitionBy(*key_chunk)
            .orderBy(F.col(time_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w_local)  # noqa: E731
        # per-chunk LAST non-null value per column (max_by ignores rows
        # whose ordering expression is NULL) + last right-row time
        summ = lambda v: F.expr(  # noqa: E731
            f"max_by(__r_{v}, CASE WHEN __r_{v} IS NOT NULL "
            f"THEN `{time_col}` END)"
        )
        t_summ = F.max(time_col)
        w_carry = (
            Window.partitionBy(*key_cols)
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_pick = lambda c: F.last(c, ignorenulls=True).over(w_carry)  # noqa: E731
    else:
        w_local = (
            Window.partitionBy(*key_chunk)
            .orderBy(F.col(time_col).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w_local)  # noqa: E731
        summ = lambda v: F.expr(  # noqa: E731
            f"min_by(__r_{v}, CASE WHEN __r_{v} IS NOT NULL "
            f"THEN `{time_col}` END)"
        )
        t_summ = F.min(time_col)
        w_carry = (
            Window.partitionBy(*key_cols)
            .orderBy("__chunk")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry_pick = lambda c: F.first(c, ignorenulls=True).over(w_carry)  # noqa: E731

    rsum = (
        u.filter(F.col("__side") == 0)
        .groupBy(*key_chunk)
        .agg(
            *[summ(v).alias(f"__s_{v}") for v in value_cols],
            t_summ.alias("__s_t"),
        )
    )
    chunks_present = u.select(*key_chunk).distinct()
    csum = chunks_present.join(rsum, key_chunk, "left")
    carry = csum.select(
        *key_chunk,
        *[carry_pick(f"__s_{v}").alias(f"__c_{v}") for v in value_cols],
        carry_pick("__s_t").alias("__c_t"),
    )
    u2 = u.join(carry, key_chunk, "left")
    return u2.select(
        *[F.col(c) for c in left_cols],
        F.col("__side"),
        *[
            F.coalesce(pick(f"__r_{v}"), F.col(f"__c_{v}")).alias(
                f"__r_{v}"
            )
            for v in value_cols
        ],
        F.coalesce(pick("__r_t"), F.col("__c_t")).alias("__r_t"),
    )


def _nearest_of_two_passes(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    right_time_col: Optional[str],
    tolerance: Optional[int],
    salt_interval: Optional[int],
) -> DataFrame:
    """``direction='nearest'`` as backward-then-forward composition —
    used for the salted variant, where each directional pass is itself
    skew-safe.  Ties (equal gaps) resolve backward, like pandas."""
    b = asof_join(
        left, right, key_cols, time_col, value_cols,
        right_time_col, None, "backward", salt_interval,
    )
    for v in value_cols:
        b = b.withColumnRenamed(v, f"__b_{v}")
    b = b.withColumnRenamed(f"asof_{time_col}", "__b_t")
    out = asof_join(
        b, right, key_cols, time_col, value_cols,
        right_time_col, None, "forward", salt_interval,
    )
    t = F.col(time_col).cast("double")
    f_t = F.col(f"asof_{time_col}")
    b_t = F.col("__b_t")
    use_fwd = F.when(b_t.isNull(), F.lit(True)).otherwise(
        f_t.isNotNull()
        & ((f_t.cast("double") - t) < (t - b_t.cast("double")))
    )
    for v in value_cols:
        out = out.withColumn(
            v, F.when(use_fwd, F.col(v)).otherwise(F.col(f"__b_{v}"))
        )
    out = out.withColumn(
        f"asof_{time_col}", F.when(use_fwd, f_t).otherwise(b_t)
    )
    if tolerance is not None:
        within = (
            F.abs(t - F.col(f"asof_{time_col}").cast("double"))
            <= F.lit(float(tolerance))
        )
        for v in value_cols:
            out = out.withColumn(v, F.when(within, F.col(v)))
        out = out.withColumn(
            f"asof_{time_col}",
            F.when(within, F.col(f"asof_{time_col}")),
        )
    return out.drop("__b_t", *[f"__b_{v}" for v in value_cols])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    right_time_col: Optional[str] = None,
    tolerance: Optional[int] = None,
    direction: str = "backward",
    salt_interval: Optional[int] = None,
) -> DataFrame:
    """As-of join of ``right`` onto ``left``.

    Returns ``left``'s columns plus, for each ``value_cols`` entry ``v``,
    the value of ``v`` from the latest right row whose time is <= the
    left row's time (``direction='backward'``), the earliest right row
    whose time is >= it (``'forward'``), or whichever of those two is
    closer in time (``'nearest'``; equal gaps resolve backward), per
    ``key_cols``, else NULL.  Ties (equal timestamps) match in both
    directions, as in pandas ``merge_asof`` and DuckDB ``ASOF JOIN``;
    unsalted ``'nearest'`` is a fused one-pass plan — one sort, a
    backward and a forward frame over it.  ``tolerance`` (same units
    as ``time_col``) drops matches farther than the window.

    Both time columns must be mutually comparable (use epoch seconds or
    timestamps on both sides).  ``salt_interval`` (same units as the
    time columns; numeric times only) enables the skew-safe salted
    variant — same results, hot keys spread over time chunks (module
    docstring).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    rtime = right_time_col or time_col
    if direction == "nearest" and salt_interval is not None:
        # skew-safe nearest = compose the two salted directional passes
        # (each is itself skew-safe), then pick the closer match per
        # row.  Two exchanges instead of one — the price of salting.
        return _nearest_of_two_passes(
            left, right, key_cols, time_col, value_cols,
            right_time_col, tolerance, salt_interval,
        )

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
    if salt_interval is not None:
        filled = _salted_fill(
            u, left.columns, key_cols, time_col, value_cols, direction,
            salt_interval,
        )
    else:
        if direction == "nearest":
            # fused one-pass: ONE sort by (time, side), a backward
            # frame and a forward frame over it, closest match wins
            # (ties -> backward, as in pandas merge_asof).  A same-time
            # right row is already a gap-0 backward match, so the
            # forward frame starting at the left row needs no tie
            # handling of its own.
            w_sort = Window.partitionBy(*key_cols).orderBy(
                F.col(time_col).asc(), F.col("__side").asc()
            )
            w_b = w_sort.rowsBetween(Window.unboundedPreceding, 0)
            w_f = w_sort.rowsBetween(0, Window.unboundedFollowing)
            cols = [*value_cols, "t"]
            picks = {
                c: (
                    F.last(f"__r_{c}", ignorenulls=True).over(w_b),
                    F.first(f"__r_{c}", ignorenulls=True).over(w_f),
                )
                for c in cols
            }
            t = F.col(time_col).cast("double")
            b_t, f_t = picks["t"]
            use_fwd = F.when(b_t.isNull(), F.lit(True)).otherwise(
                f_t.isNotNull()
                & (
                    (f_t.cast("double") - t)
                    < (t - b_t.cast("double"))
                )
            )
            filled = u.select(
                *[F.col(c) for c in left.columns],
                F.col("__side"),
                *[
                    F.when(use_fwd, picks[v][1])
                    .otherwise(picks[v][0])
                    .alias(f"__r_{v}")
                    for v in value_cols
                ],
                F.when(use_fwd, f_t).otherwise(b_t).alias("__r_t"),
            )
        elif direction == "backward":
            # right rows (side 0) sort before left at equal time, so
            # ties fall inside the [-inf, current] frame
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
        if direction != "nearest":
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
        elif direction == "nearest":
            gap = F.abs(gap)
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
