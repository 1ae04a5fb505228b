"""File compaction (OPTIMIZE / rewrite_data_files analogue): appends
fragment the current snapshot's file layout; ``compact`` bin-packs it
back without changing row content, preserving time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsaug_spark.sources.tables import ParquetSnapshotTable


def _table_with_fragments(spark, path, n_appends=6):
    tbl = ParquetSnapshotTable(str(path))
    for i in range(n_appends):
        df = spark.range(i * 10, (i + 1) * 10).repartition(4)
        tbl.append(df.withColumn("batch", F.lit(i)))
    return tbl


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    tbl = _table_with_fragments(spark, tmp_path / "t")
    before_files = len(tbl.data_files())
    before_rows = sorted(
        (r.id, r.batch) for r in tbl.read(spark).collect()
    )
    parent = tbl.snapshot_id()
    assert before_files > 4  # appends accumulated fragments

    res = tbl.compact(spark, target_file_mb=128)
    assert res["compacted"] is True
    assert res["before_files"] == before_files
    assert res["after_files"] < before_files
    assert len(tbl.data_files()) == res["after_files"]
    after_rows = sorted(
        (r.id, r.batch) for r in tbl.read(spark).collect()
    )
    assert after_rows == before_rows
    # pure rewrite: the fragmented parent stays time-travelable
    assert tbl.history()[0]["parents"] == [parent]
    assert tbl.read_as_of(spark, parent).count() == len(before_rows)


def test_compact_skips_when_already_packed(spark, tmp_path):
    tbl = ParquetSnapshotTable(str(tmp_path / "t"))
    tbl.overwrite(spark.range(100).coalesce(1))
    snap = tbl.snapshot_id()
    res = tbl.compact(spark, target_file_mb=128)
    assert res["compacted"] is False
    assert tbl.snapshot_id() == snap  # no empty commit


def test_expire_after_compact_gc_frees_fragments(spark, tmp_path):
    tbl = _table_with_fragments(spark, tmp_path / "t")
    parent = tbl.snapshot_id()
    tbl.compact(spark, target_file_mb=128)
    expired = tbl.expire_snapshots(keep_last=1)
    assert parent in expired
    assert tbl.read(spark).count() == 60


def test_rollup_job_compact_tables(spark, transcripts, tmp_path):
    from tsaug_spark.sources.checkpoint import RollupJob

    job = RollupJob(
        spark, str(tmp_path / "c"), n_partitions=2,
        source_snapshot="s1",
    )
    job.run(transcripts, "1m")
    # a second maintenance pass appends manifest rows -> fragments
    job2 = RollupJob(
        spark, str(tmp_path / "c"), n_partitions=2,
        source_snapshot="s2",
    )
    job2.update(transcripts, "1m", grace="1 hour", new_snapshot="s2")
    before = job2.read_tier("1m").count()
    packed = job2.compact_tables(target_file_mb=128, tiers=["1m"])
    assert packed, "at least one table should have compacted"
    for res in packed.values():
        assert res["after_files"] < res["before_files"]
    assert job2.read_tier("1m").count() == before
    # chunk payloads still decode after the rewrite
    chunks = job2.table("tier_1m_chunks").read(spark)
    assert chunks.count() > 0


def test_sorted_compaction_clusters_files(spark, tmp_path):
    """compact(sort_by=...) range-partitions the rewrite: per-file key
    ranges become DISJOINT (decisive min/max pruning for point/range
    reads), row multiset is unchanged, and the previous snapshot stays
    time-travelable."""
    import pyarrow.parquet as pq

    from tsaug_spark.sources.tables import ParquetSnapshotTable

    tb = ParquetSnapshotTable(str(tmp_path / "t"))
    # interleaved keys across 8 shuffled files
    df = (
        spark.range(0, 400000)
        .selectExpr("id % 997 AS k", "id AS v")
        .repartition(8)
    )
    tb.overwrite(df)
    before = tb.snapshot_id()

    def ranges(t):
        out = []
        for p, _sz in t.data_files():
            md = pq.ParquetFile(p).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "k"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    pre = ranges(tb)
    # every pre-compaction file spans nearly the whole key domain
    assert all(hi - lo > 900 for lo, hi in pre)

    res = tb.compact(spark, target_file_mb=1, sort_by=["k"])
    assert res["compacted"]
    post = ranges(tb)
    assert len(post) >= 2
    for (lo1, hi1), (lo2, _hi2) in zip(post, post[1:]):
        assert hi1 <= lo2  # disjoint (range partitioning)

    got = sorted(
        (r.k, r.v) for r in tb.read(spark).collect()
    )
    ref = sorted((r.k, r.v) for r in df.collect())
    assert got == ref
    assert tb.read_as_of(spark, before).count() == 400000
