"""Token-budget shard packing: deterministic training-shard assignment.

The last step of a curation pipeline writes fixed-token-budget shards
(e.g. "~100M tokens per file") that trainers stream.  True greedy
packing ("open a new shard when adding would overflow") is a
sequential decision and cannot scale; the standard distributed variant
assigns a document to shard ``floor(preceding_cumulative_tokens /
budget)`` — each shard holds ~budget tokens, overflowing by at most
one document, and the assignment is a closed-form window expression:
one shuffle, bit-deterministic, replayable by any engine.

Cumulative sums run per stratum (``strata_col``, e.g. source or
source x date), ordered by ``order_col``.  A stratum's window is a
single task, so strata are assumed numerous and individually bounded —
at 100 TB you partition by (source, ingest_date), thousands of strata
of a few GB each, not one global ordering (a global window would
serialize the whole corpus through one task).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

StrataSpec = Union[str, Sequence[str]]


def _strata(spec: StrataSpec) -> list:
    return [spec] if isinstance(spec, str) else list(spec)


def pack_shards(
    df: DataFrame,
    budget: int,
    strata_col: StrataSpec = "source",
    order_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Add ``shard_id`` (per-stratum, 0-based) and ``n_tokens`` columns.

    ``token_col`` names a precomputed token count; otherwise whitespace
    tokens of ``text_col`` are counted inline.  Documents larger than
    ``budget`` get a shard to themselves (plus whatever the preceding
    remainder allowed), never an error — the trainer's reader handles
    oversize records, the packer must not lose them.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tokens = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.col(text_col), " "))
    )
    w = (
        Window.partitionBy(*_strata(strata_col))
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens).over(w)
    return df.withColumn("n_tokens", tokens).withColumn(
        "shard_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("long"),
    )


def shard_manifest(
    df: DataFrame,
    budget: int,
    strata_col: StrataSpec = "source",
    **kwargs,
) -> DataFrame:
    """Per-shard manifest: (stratum, shard_id, n_docs, n_tokens).

    The write planner consumes this to size output files; integer-only
    aggregates keep it partitioning-invariant.
    """
    packed = pack_shards(df, budget, strata_col=strata_col, **kwargs)
    return packed.groupBy(*_strata(strata_col), "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


def zorder_layout(
    df: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    n_files: int = 16,
    bits: int = 16,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Z-order (Morton-curve) file-layout audit: interleave the bits
    of the entity id and the hour index and tile the curve into
    ``n_files`` equal files, reporting each file's min/max extent on
    BOTH dimensions — the zone-map footprint a reader would prune
    against.  This is the clustering step behind `OPTIMIZE ZORDER BY`
    in lakehouse engines: a time-ordered layout answers time-range
    scans but every file spans ALL users; the Morton layout bounds
    both extents, so point/range predicates on either dimension prune
    most files.  Both layouts are emitted for side-by-side audit.

    Exactness: the Morton code is pure integer bit algebra
    (sum of ((x >> i) & 1) << (2i+/-1) terms); file assignment is
    ntile over the total order (z, tiebreak) — deterministic in any
    engine; extents are integer MIN/MAX.

    Scale: the audit's global ntile is a demo-scale convenience — the
    production write path is ``df.repartitionByRange(n_files, z)``
    followed by a partitioned write, which samples range bounds
    instead of globally sorting through one task.  The hour index is
    rebased to the corpus minimum (one broadcast scalar) so ``bits``
    covers the actual extent.

    Output: layout ('zorder' | 'time'), file_id, n_rows, id_min,
    id_max, hr_min, hr_max.
    """
    mask = (1 << bits) - 1
    lo = df.select(
        F.floor(F.min(F.unix_timestamp(F.col(ts_col))) / 3600)
        .cast("long")
        .alias("lo_hr")
    )
    base = df.crossJoin(F.broadcast(lo)).select(
        F.col(order_tiebreak).alias("tb"),
        (F.col(id_col).cast("long").bitwiseAND(F.lit(mask))).alias("u"),
        (
            F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
            - F.col("lo_hr")
        ).bitwiseAND(F.lit(mask)).alias("hr"),
    )
    z = None
    for i in range(bits):
        ta = F.shiftleft(
            F.shiftright(F.col("u"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        tt = F.shiftleft(
            F.shiftright(F.col("hr"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = ta + tt if z is None else z + ta + tt
    coded = base.withColumn("z", z.cast("long"))

    def _tiled(order_cols, name):
        w = Window.orderBy(*order_cols)
        return (
            coded.withColumn("file_id", F.ntile(int(n_files)).over(w))
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("u").alias("id_min"),
                F.max("u").alias("id_max"),
                F.min("hr").alias("hr_min"),
                F.max("hr").alias("hr_max"),
            )
            .select(
                F.lit(name).alias("layout"),
                F.col("file_id").cast("long").alias("file_id"),
                "n_rows",
                "id_min",
                "id_max",
                "hr_min",
                "hr_max",
            )
        )

    return _tiled([F.col("z"), F.col("tb")], "zorder").unionByName(
        _tiled([F.col("hr"), F.col("tb")], "time")
    )
