"""Reliable-checkpoint mode for iterative fixpoints (tsaug_spark/lineage.py).

``truncate_lineage`` is ``localCheckpoint`` by default; with a reliable
checkpoint dir configured (``SparkContext.setCheckpointDir`` or the
``TSAUG_SPARK_CHECKPOINT_DIR`` env var) it becomes
``DataFrame.checkpoint``, whose blocks live in fault-tolerant storage —
the mode a 1000-executor cluster needs so one lost executor cannot kill
20 rounds of truncated lineage.  Both modes must produce identical
results; these tests run the fixpoint operators under each and compare.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F


@contextlib.contextmanager
def _reliable_dir(spark, tmp_path):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "test expects no dir pre-set"
    sc.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    try:
        yield
    finally:
        # SparkContext has no public unset API; the Scala setter maps
        # Option(null) -> None, restoring the no-directory default so
        # later tests see localCheckpoint mode again.
        sc._jsc.sc().setCheckpointDir(None)
        assert sc.getCheckpointDir() is None


def _pairs(spark):
    # two chains and a singleton-free triangle: exercises pointer jumps
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21),
            (21, 22), (20, 22)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _edges(spark):
    # distinct (u < v) BIGINT edges, the pagerank() input contract
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    return spark.createDataFrame(rows, "u long, v long")


def test_truncate_lineage_uses_reliable_checkpoint(spark, tmp_path):
    from tsaug_spark.lineage import truncate_lineage

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    local = truncate_lineage(df)
    assert local.count() == 100
    with _reliable_dir(spark, tmp_path):
        reliable = truncate_lineage(df)
        assert reliable.count() == 100
        ckpt_files = list((tmp_path / "reliable_ckpt").rglob("*"))
        assert ckpt_files, "reliable checkpoint wrote nothing"
    assert sorted(r["v"] for r in reliable.collect()) == sorted(
        r["v"] for r in local.collect()
    )


def test_dedup_clusters_identical_both_modes(spark, tmp_path):
    from tsaug_spark.pipeline.dedup import dedup_clusters

    want = sorted(
        map(tuple, dedup_clusters(_pairs(spark)).collect())
    )
    with _reliable_dir(spark, tmp_path):
        got = sorted(
            map(tuple, dedup_clusters(_pairs(spark)).collect())
        )
    assert got == want
    # chains 1-4 and 10-12 and triangle 20-22 -> min-label components
    comp = {d: c for d, c in want}
    assert comp[4] == 1 and comp[12] == 10 and comp[22] == 20


def test_pagerank_identical_both_modes(spark, tmp_path):
    from tsaug_spark.plans.graph import pagerank

    want = {
        r["node"]: r["pr_micro"]
        for r in pagerank(_edges(spark)).collect()
    }
    with _reliable_dir(spark, tmp_path):
        got = {
            r["node"]: r["pr_micro"]
            for r in pagerank(_edges(spark)).collect()
        }
    # integer PageRank: both modes must agree to the last micro-unit
    assert got == want and len(want) == 5
