"""Streaming ingest into the retention store: watermarked stream rollup
-> foreachBatch merge into the RollupJob tier table, with manifest
lineage per micro-batch.

This closes the production loop the north rule describes: the raw
transcript stream maintains the 1m tier incrementally (update-mode
windowed agg, so each emitted row carries the FULL aggregate for its
bucket so far), the coarser tiers re-aggregate batch-side
(``RollupJob.cascade_tier``), and retention/expiry run against the same
tables.  Each micro-batch commit is merge-by-bucket (replace rows whose
(conv_id, bucket_ts) the batch re-emitted, keep the rest), so the
caught-up table equals the batch rollup exactly — proven by test.

Scale note: on Iceberg the merge is a MERGE INTO / dynamic-partition
overwrite keyed on the bucket column; the parquet-snapshot fallback
rewrites the table per batch, which is fine for the availableNow
backfill shape it is used for here.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsaug_spark.sources.checkpoint import RollupJob

from .stream_rollup import stream_rollup


def merge_batch_into_tier(
    job: RollupJob,
    tier: str,
    batch_df: DataFrame,
    batch_id: int,
    stream_id: str = "",
) -> None:
    """foreachBatch body: merge one micro-batch of (conv_id, bucket_ts,
    metrics) rows into the tier table + append a lineage row.

    ``stream_id`` scopes the at-least-once lineage dedup: micro-batch
    ids restart at 0 for every new streaming checkpoint, so without a
    per-stream scope a SECOND stream's early batches would collide with
    a previous stream's manifest rows and skip their lineage appends.
    Pass something stable per checkpoint (run_stream_ingest_once
    derives it from the checkpoint dir)."""
    spark = batch_df.sparkSession
    part_col = F.pmod(
        F.xxhash64("conv_id"), F.lit(job.n_partitions)
    ).cast("int")
    rows = batch_df.withColumn("partition_id", part_col).cache()
    # ONE action materializes the cache and yields count + lineage
    # bounds together (was a count job + a separate min/max job)
    n, lo, wm = rows.agg(
        F.count(F.lit(1)),
        F.min("bucket_ts"),
        F.max("bucket_ts"),
    ).collect()[0]
    if n == 0:
        rows.unpersist()
        return
    t = job.table(f"tier_{tier}")
    if t.exists():
        # partition-scoped merge: only the conversation-bucket
        # partitions the batch touches are rewritten (kept rows of
        # those partitions minus re-emitted (conv_id, bucket_ts) keys,
        # plus the batch rows), committed via the backend's dynamic
        # partition overwrite — write amplification is O(touched
        # partitions), not O(table).  On Iceberg this is
        # overwritePartitions (a MERGE-shaped metadata commit).
        touched = rows.select("partition_id").distinct()
        keys = rows.select("conv_id", "bucket_ts")
        kept = (
            t.read(spark)
            .join(touched, "partition_id", "left_semi")
            .join(keys, ["conv_id", "bucket_ts"], "left_anti")
        )
        t.overwrite_partitions(
            kept.unionByName(rows.select(*kept.columns)),
            "partition_id",
        )
    else:
        t.append(rows)
    # foreachBatch is at-least-once: the merge above is idempotent on
    # retry, but the lineage append is not — skip it when this batch_id
    # already has a manifest row for this tier (ADVICE r2).  The seen
    # set loads from the manifest ONCE per (job, tier, stream) and is
    # maintained in-driver after that — a retry lands in the same
    # driver with the same set, so the per-batch manifest re-read the
    # old code paid is pure overhead (a NEW driver resuming the
    # checkpoint reloads the set from the manifest on its first batch)
    snap = (
        f"stream-batch:{stream_id}:{batch_id}"
        if stream_id
        else f"stream-batch:{batch_id}"
    )
    seen_key = (tier, stream_id)
    seen_all = job.__dict__.setdefault("_stream_seen", {})
    if seen_key not in seen_all:
        prefix = (
            f"stream-batch:{stream_id}:" if stream_id else "stream-batch:"
        )
        seen = set()
        if job.manifest.exists():
            seen = {
                r[0]
                for r in job.manifest.read(spark)
                .filter(
                    (F.col("tier") == tier)
                    & F.col("source_snapshot").startswith(prefix)
                )
                .select("source_snapshot")
                .collect()
            }
        seen_all[seen_key] = seen
    if snap in seen_all[seen_key]:
        rows.unpersist()
        return
    job._append_manifest(
        [
            (
                tier,
                -1,  # streaming commits are not partition-scoped
                snap,
                lo,
                wm,
                int(n),
                0,
                0,
                time.time(),
            )
        ]
    )
    seen_all[seen_key].add(snap)
    rows.unpersist()


def run_stream_ingest_once(
    spark,
    source_dir: str,
    schema,
    job: RollupJob,
    tier: str = "1m",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 4,
    checkpoint_dir: str | None = None,
):
    """availableNow streaming ingest of a transcript file source into
    ``job``'s tier table.  Update output mode + merge-by-bucket: once
    caught up, ``job.read_tier(tier)`` equals the batch rollup."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    rolled = stream_rollup(stream, tier, watermark=watermark)
    import hashlib as _hl

    stream_id = (
        _hl.md5(checkpoint_dir.encode()).hexdigest()[:8]
        if checkpoint_dir
        else ""
    )
    writer = (
        rolled.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: merge_batch_into_tier(
                job, tier, df, bid, stream_id=stream_id
            )
        )
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow ingest did not finish in 300s; tier table "
            "would be partially populated — refusing to proceed"
        )
