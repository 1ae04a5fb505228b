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
