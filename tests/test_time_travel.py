"""Time-travel surface of ParquetSnapshotTable: history, read_as_of,
rollback, expire_snapshots — the Iceberg VERSION AS OF / rollback /
expire parity the lineage records point into."""

from __future__ import annotations

import pytest

from tsaug_spark.sources.tables import ParquetSnapshotTable


def _vals(df):
    return sorted(r.v for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetSnapshotTable(str(tmp_path / "tt"))
    return t


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int")


def test_history_and_read_as_of(spark, table):
    s1 = table.overwrite(_df(spark, [1]))
    s2 = table.append(_df(spark, [2]))
    s3 = table.overwrite(_df(spark, [9]))
    hist = [m["snapshot_id"] for m in table.history()]
    assert hist == [s3, s2, s1]
    assert _vals(table.read(spark)) == [9]
    assert _vals(table.read_as_of(spark, s2)) == [1, 2]
    assert _vals(table.read_as_of(spark, s1)) == [1]
    # parent lineage chains through the commits
    metas = {m["snapshot_id"]: m for m in table.history()}
    assert metas[s3]["parents"] == [s2]
    assert metas[s2]["parents"] == [s1]


def test_rollback_is_metadata_only_and_chains(spark, table):
    s1 = table.overwrite(_df(spark, [1, 2]))
    table.append(_df(spark, [3]))
    table.rollback(s1)
    assert table.snapshot_id() == s1
    assert _vals(table.read(spark)) == [1, 2]
    # a commit after rollback chains from the rolled-back snapshot
    s3 = table.append(_df(spark, [7]))
    metas = {m["snapshot_id"]: m for m in table.history()}
    assert metas[s3]["parents"] == [s1]
    assert _vals(table.read(spark)) == [1, 2, 7]


def test_expire_keeps_recent_and_current(spark, table):
    snaps = [table.overwrite(_df(spark, [i])) for i in range(4)]
    expired = table.expire_snapshots(keep_last=2)
    assert expired == [snaps[1], snaps[0]]
    # recent snapshots still travel; expired ones raise
    assert _vals(table.read_as_of(spark, snaps[3])) == [3]
    assert _vals(table.read_as_of(spark, snaps[2])) == [2]
    for old in (snaps[0], snaps[1]):
        with pytest.raises(LookupError):
            table.read_as_of(spark, old)


def test_expire_never_drops_current_even_if_old(spark, table):
    s1 = table.overwrite(_df(spark, [1]))
    table.overwrite(_df(spark, [2]))
    table.rollback(s1)  # current is now the OLDEST snapshot
    table.expire_snapshots(keep_last=1)
    assert _vals(table.read(spark)) == [1]


def test_unknown_snapshot_raises(spark, table):
    table.overwrite(_df(spark, [1]))
    with pytest.raises(LookupError):
        table.read_as_of(spark, "0000000000000-deadbeef")
    with pytest.raises(LookupError):
        table.rollback("0000000000000-deadbeef")


def test_rollup_job_snapshot_gc(spark, transcripts, tmp_path):
    """expire_table_snapshots GCs time-travel history across the job's
    tables while the current tier state stays readable and identical."""
    from tsaug_spark.sources.checkpoint import RollupJob

    job = RollupJob(
        spark, str(tmp_path / "gc"), n_partitions=2,
        source_snapshot="s1",
    )
    job.run(transcripts, "1m")
    job.cascade_tier("1m", "1h")
    # a second maintenance pass advances every table's snapshot
    job2 = RollupJob(
        spark, str(tmp_path / "gc"), n_partitions=2,
        source_snapshot="s2",
    )
    job2.update(transcripts, "1m", grace="1 hour", new_snapshot="s2")
    before = job2.read_tier("1m").count()
    tbl = job2.table("tier_1m")
    assert len(tbl.history()) >= 2
    gone = job2.expire_table_snapshots(keep_last=1, tiers=["1m", "1h"])
    assert any(v for v in gone.values())
    assert len(tbl.history()) == 1
    assert job2.read_tier("1m").count() == before
    assert job2.read_tier("1h").count() > 0


# ---- parquet bloom filters on snapshot writes ----


def test_bloom_cols_written_and_reads_identical(spark, tmp_path):
    """A bloom-opted table writes parquet bloom filters for
    high-cardinality columns (footer grows by the filter bytes vs an
    identical bloom-less write; parquet-mr skips the bloom only when a
    chunk stays fully dictionary-encoded) and point lookups return
    identical rows."""
    import os

    from tsaug_spark.sources.tables import ParquetSnapshotTable

    df = spark.range(0, 120000).selectExpr(
        "md5(cast(id as string)) AS conv_id", "id AS v"
    ).coalesce(1)
    tb = ParquetSnapshotTable(
        str(tmp_path / "wb"), bloom_cols=("conv_id",), bloom_ndv=120000
    )
    tb.overwrite(df)
    tn = ParquetSnapshotTable(str(tmp_path / "nb"))
    tn.overwrite(df)

    def data_bytes(t):
        return sum(sz for _p, sz in t.data_files())

    delta = data_bytes(tb) - data_bytes(tn)
    assert delta > 50_000, delta  # ndv=120k -> >=128KiB bloom

    key = df.selectExpr("conv_id").limit(1).collect()[0][0]
    got = tb.read(spark).filter(f"conv_id = '{key}'").collect()
    ref = tn.read(spark).filter(f"conv_id = '{key}'").collect()
    assert got == ref and len(got) == 1


def test_bloom_cols_survive_append_and_compact(spark, tmp_path):
    """Every write path funnels through _commit, so appends and
    compaction rewrites keep emitting blooms (each snapshot's data dir
    carries its own filters)."""
    from tsaug_spark.sources.tables import ParquetSnapshotTable

    tb = ParquetSnapshotTable(
        str(tmp_path / "t"), bloom_cols=("conv_id",), bloom_ndv=60000
    )
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "md5(cast(id as string)) AS conv_id", "id AS v"
    )
    tb.overwrite(mk(0, 60000))
    before = sum(sz for _p, sz in tb.data_files())
    tb.append(mk(60000, 120000))
    after = sum(sz for _p, sz in tb.data_files())
    assert after > 2 * before - before // 4  # both halves carry blooms
    assert tb.read(spark).count() == 120000
    res = tb.compact(spark, target_file_mb=1024)
    assert tb.read(spark).count() == 120000
