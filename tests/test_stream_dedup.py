"""Streaming exact dedup (dropDuplicatesWithinWatermark): the caught-up
sink equals batch distinct-by-fingerprint, and replay suppression
crosses micro-batch boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_stream_dedup_matches_batch_distinct(spark):
    from tsaug_spark.streaming.stream_dedup import run_stream_dedup_once

    out = run_stream_dedup_once(
        spark, f"{SF_DIR}/documents.parquet", sink_table="sd_match"
    )
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.md5("text").alias("fp")
    )
    got = out.select("doc_id", "fp").orderBy("doc_id").toPandas()
    want = batch.orderBy("doc_id").toPandas()
    assert got.equals(want)


def test_stream_dedup_suppresses_cross_batch_replays(spark):
    """Three staged copies -> three micro-batches; batches 2 and 3 are
    pure replays and every one of their rows must be dropped by state
    carried across batches (not within-batch dedup)."""
    from tsaug_spark.streaming.stream_dedup import run_stream_dedup_once

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    out = run_stream_dedup_once(
        spark,
        f"{SF_DIR}/documents.parquet",
        sink_table="sd_replays",
        replays=2,
    )
    assert out.count() == n_docs
    assert out.select("fp").distinct().count() == n_docs


def test_stream_dedup_within_batch_duplicates(spark, tmp_path):
    """Duplicates arriving inside ONE micro-batch collapse to a single
    survivor too (replays=0, duplicated rows in the source table)."""
    import pandas as pd

    from tsaug_spark.streaming.stream_dedup import run_stream_dedup_once

    src = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha", "beta", "alpha", "gamma"],
        }
    ).to_parquet(src, index=False)
    out = run_stream_dedup_once(
        spark, src, sink_table="sd_within", replays=0
    )
    got = out.select("fp").distinct().count()
    assert got == 3
    # first-occurrence-wins: the 'alpha' survivor is one of its two ids
    alpha = out.filter(F.col("fp") == F.md5(F.lit("alpha"))).collect()
    assert len(alpha) == 1 and alpha[0]["doc_id"] in (1, 3)


def test_hash_split_works_on_streams(spark, tmp_path):
    """hash_split/mixture membership is a stateless narrow projection,
    so the same expression drops into a streaming plan unchanged and
    assigns exactly the batch memberships."""
    from tsaug_spark.pipeline.sampling import hash_split

    src = f"{SF_DIR}/documents.parquet"
    batch = spark.read.parquet(src)
    want = {
        (r.doc_id, r.split)
        for r in hash_split(batch, "doc_id").select(
            "doc_id", "split").collect()
    }
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    import shutil

    shutil.copyfile(src, str(tmp_path / "docs.parquet"))
    q = (
        hash_split(stream, "doc_id")
        .select("doc_id", "split")
        .writeStream.format("memory")
        .queryName("split_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r.doc_id, r.split)
        for r in spark.table("split_stream").collect()
    }
    assert got == want
