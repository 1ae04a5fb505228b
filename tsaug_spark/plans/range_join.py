"""Bucketed range join: point-in-interval matching as an equi-join.

Naive ``points JOIN intervals ON t BETWEEN lo AND hi`` has no equality
predicate, so Catalyst plans a BroadcastNestedLoopJoin (or a cartesian
product once the intervals side outgrows the broadcast threshold) —
O(points x intervals) comparisons, the classic 100 TB cliff.

The scale-safe formulation chunks the time axis: each interval is
exploded to every chunk it overlaps, each point is tagged with the ONE
chunk containing it, and the join becomes a plain shuffled hash
equi-join on the chunk id (plus any key columns), with the exact
BETWEEN predicate applied as a cheap post-filter.  A (point, interval)
match can only meet in the point's own chunk, so the output needs no
dedup pass.  Shuffle volume is O(points + intervals * avg_chunks_per_
interval); pick ``chunk`` near the typical interval length so the
replication factor stays ~2.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    time_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    chunk: int = 3600,
    key_cols: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with ``lo <= t <= hi``.

    ``time_col``, ``lo_col``, ``hi_col`` are integral (same epoch
    units).  ``key_cols`` adds equality keys shared by both sides
    (e.g. a tenant id), tightening the shuffle partitioning further.
    ``how`` is ``inner`` or ``left`` (left keeps unmatched points with
    NULL interval columns — chunk replication never duplicates an
    unmatched point because the point side carries exactly one chunk).

    Output: all point columns plus the interval's columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    keys = list(key_cols or [])

    iv = intervals.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(chunk)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(chunk)).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "__chunk", F.floor(F.col(time_col) / F.lit(chunk)).cast("long")
    )
    cond = [pt["__chunk"] == iv["__chunk"]] + [
        pt[k].eqNullSafe(iv[k]) for k in keys
    ]
    in_range = (pt[time_col] >= iv[lo_col]) & (pt[time_col] <= iv[hi_col])
    if how == "inner":
        joined = pt.join(iv, cond, "inner").where(in_range)
    else:
        # the range predicate must ride INSIDE the left join, not as a
        # post-filter (a post-filter would also drop unmatched points)
        joined = pt.join(iv, cond + [in_range], "left")
    drop = [pt["__chunk"], iv["__chunk"]] + [iv[k] for k in keys]
    for c in drop:
        joined = joined.drop(c)
    return joined


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    chunk: int = 3600,
    key_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Join every pair of intervals that OVERLAP (``a.lo <= b.hi AND
    b.lo <= a.hi``) — the interval-interval companion to
    :func:`range_join`, same bucketed equi-join shape.

    Both sides are exploded to the chunks they cover; overlapping
    intervals always share the chunk containing ``max(a.lo, b.lo)``,
    and the pair is emitted ONLY in that canonical chunk — so the
    output needs no distinct pass even though a pair may co-occur in
    many chunks.  Shuffle volume is O(sum of interval lengths /
    chunk); per-chunk join work is occupancy², which is the measured
    concurrency of the interval set, not its cardinality.

    Column names must not collide across the two sides (except
    ``key_cols``, which are joined on equality and kept once).
    """
    keys = list(key_cols or [])
    dup = (set(a.columns) & set(b.columns)) - set(keys)
    if dup:
        raise ValueError(
            f"colliding non-key columns across sides: {sorted(dup)}"
        )
    ia = a.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(a_lo) / F.lit(chunk)).cast("long"),
                F.floor(F.col(a_hi) / F.lit(chunk)).cast("long"),
            )
        ),
    )
    ib = b.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(b_lo) / F.lit(chunk)).cast("long"),
                F.floor(F.col(b_hi) / F.lit(chunk)).cast("long"),
            )
        ),
    )
    cond = [ia["__chunk"] == ib["__chunk"]] + [
        ia[k].eqNullSafe(ib[k]) for k in keys
    ]
    overlap = (ia[a_lo] <= ib[b_hi]) & (ib[b_lo] <= ia[a_hi])
    canonical = (
        F.floor(F.greatest(ia[a_lo], ib[b_lo]) / F.lit(chunk)).cast("long")
        == ia["__chunk"]
    )
    joined = ia.join(ib, cond, "inner").where(overlap & canonical)
    for c in [ia["__chunk"], ib["__chunk"]] + [ib[k] for k in keys]:
        joined = joined.drop(c)
    return joined
