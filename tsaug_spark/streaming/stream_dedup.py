"""Streaming exact dedup: content-hash dropDuplicatesWithinWatermark.

The streaming twin of pipeline.dedup.exact_dedup for a document INGEST
path: as raw documents arrive, keep the first occurrence of each
content fingerprint and drop every later exact replay, across
micro-batches, with state bounded by the watermark horizon.

At 100 TB this is the front door of the dedup cascade: exact replays
(mirrors, re-crawls, retried uploads) are the bulk of duplicate volume
and are removed here for the cost of one md5 projection plus the
streaming state store — the expensive near-dup machinery (MinHash LSH,
SimHash, embedding bands; pipeline/dedup.py) then only sees
first-occurrence survivors.  State is keyed by the 16-byte fingerprint,
not the document text, and `dropDuplicatesWithinWatermark` evicts keys
whose event time falls behind the watermark, so state size is
(arrival rate x horizon), independent of total corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "3650 days",
) -> DataFrame:
    """First-occurrence-wins exact dedup over a document stream.

    Fingerprints ``text_col`` with md5 and drops rows whose fingerprint
    was already seen within the watermark horizon.  Emits the surviving
    rows in append mode (each exactly once).  ``watermark`` is the
    dedup horizon: replays arriving later than this after the original
    are NOT suppressed (their state was evicted) — choose it per
    pipeline SLA; the default is effectively global for backfills.
    """
    return (
        stream_df.withColumn("fp", F.md5(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def run_stream_dedup_once(
    spark,
    source_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sink_table: str = "stream_dedup_out",
    replays: int = 1,
) -> DataFrame:
    """availableNow backfill of the streaming dedup over a parquet table.

    Stages the table into a fresh directory as ``1 + replays`` identical
    parquet files and streams them one file per micro-batch, so every
    batch after the first consists purely of exact replays that the
    dedup state must suppress across batch boundaries.  Because the
    replay files are byte-identical to the original, the surviving rows
    are deterministic regardless of file arrival order.

    The synthetic event time is derived from ``id_col`` (documents
    carry no timestamp); all replays share the original's event time,
    so nothing is late w.r.t. the watermark and every drop is the
    dedup state's doing, not late-data eviction.
    """
    import glob
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="stream_dedup_src_")
    batch = spark.read.parquet(source_path)
    stage_out = f"{staging}/_stage"
    batch.coalesce(1).write.mode("overwrite").parquet(stage_out)
    part = glob.glob(f"{stage_out}/part-*.parquet")[0]
    staged = f"{staging}/copy0.parquet"
    shutil.copyfile(part, staged)
    shutil.rmtree(stage_out)
    for i in range(replays):
        shutil.copyfile(staged, f"{staging}/copy{i + 1}.parquet")

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    # offset the synthetic event time well clear of the epoch: a row
    # whose ts equals the state store's initial (zero) watermark would
    # be discarded as late before the dedup state ever sees it
    deduped = stream_exact_dedup(
        stream.withColumn(
            "ts",
            F.timestamp_seconds(F.col(id_col) + F.lit(1_500_000_000)),
        ),
        text_col=text_col,
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow dedup backfill did not finish in 300s; "
            "the memory sink would be partial — refusing to return it"
        )
    return spark.table(sink_table)
