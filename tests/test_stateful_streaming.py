"""applyInPandasWithState sessionizer: streaming == batch, including
cross-micro-batch state continuation."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _batch_sessions(spark):
    import __spark_entry__ as em

    return (
        em.q_sessionize(spark, SF_DIR)
        .orderBy("user_id", "session_id")
        .toPandas()
        .reset_index(drop=True)
    )


def _norm(df):
    return (
        df.orderBy("user_id", "session_id")
        .toPandas()
        .reset_index(drop=True)
        .astype("int64")
    )


def test_stream_sessionize_matches_batch(spark):
    from tsaug_spark.streaming.stateful import run_stream_sessionize_once

    got = _norm(
        run_stream_sessionize_once(
            spark, f"{SF_DIR}/events.parquet", sink_table="sess_one"
        )
    )
    want = _batch_sessions(spark).astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_sessionize_state_survives_micro_batches(spark, tmp_path):
    """Split the events into three time-ordered files processed one per
    micro-batch: sessions spanning batch boundaries must continue from
    state, and the caught-up result must equal the batch query."""
    from tsaug_spark.streaming.stateful import run_stream_sessionize_once

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    src = tmp_path / "split"
    src.mkdir()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    parts = [
        ev.filter(F.unix_timestamp("ts") <= cut1),
        ev.filter(
            (F.unix_timestamp("ts") > cut1)
            & (F.unix_timestamp("ts") <= cut2)
        ),
        ev.filter(F.unix_timestamp("ts") > cut2),
    ]
    for i, part in enumerate(parts):
        f = str(src / f"part{i}.parquet")
        part.toPandas().to_parquet(
            f, engine="pyarrow", coerce_timestamps="us"
        )
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))

    got = _norm(
        run_stream_sessionize_once(
            spark,
            str(src),
            sink_table="sess_split",
            max_files_per_trigger=1,
        )
    )
    want = _batch_sessions(spark).astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_ingest_into_tier_table(spark, transcripts, tmp_path, table_cls):
    """Streaming ingest (update-mode rollup + foreachBatch merge) must
    leave the RollupJob tier table equal to the batch rollup, with
    per-batch lineage in the manifest."""
    from tsaug_spark.plans.rollup import rollup_transcripts
    from tsaug_spark.sources.checkpoint import RollupJob
    from tsaug_spark.streaming.stream_sink import run_stream_ingest_once

    src = str(tmp_path / "stream_ingest_src")
    transcripts.write.mode("overwrite").parquet(src)
    job = RollupJob(spark, str(tmp_path / "stream_work"),
                    n_partitions=2, source_snapshot="stream",
                    table_cls=table_cls)
    run_stream_ingest_once(
        spark,
        src,
        transcripts.schema,
        job,
        tier="1m",
        max_files_per_trigger=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = (
        job.read_tier("1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        rollup_transcripts(transcripts, "1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = job.metrics("1m").toPandas()
    assert len(m) >= 1
    assert m["source_snapshot"].str.startswith("stream-batch:").all()
    # the streamed tier feeds the batch cascade like any other
    assert job.cascade_tier("1m", "1h") == 2


def test_stream_ingest_incremental_resume(spark, transcripts, tmp_path):
    """Second ingest run with the SAME streaming checkpoint only
    processes newly arrived files and merges them — the streaming
    late-data path — converging to the full batch rollup."""
    from pyspark.sql import functions as F
    from tsaug_spark.plans.rollup import rollup_transcripts
    from tsaug_spark.sources.checkpoint import RollupJob
    from tsaug_spark.streaming.stream_sink import run_stream_ingest_once

    lo, hi = transcripts.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    cutoff = F.timestamp_seconds(F.lit(int(lo + 0.6 * (hi - lo))))
    early = transcripts.filter(F.col("ts") < cutoff)
    late = transcripts.filter(F.col("ts") >= cutoff)

    src = tmp_path / "inc_src"
    src.mkdir()
    early.toPandas().to_parquet(
        str(src / "a.parquet"), engine="pyarrow", coerce_timestamps="us"
    )
    job = RollupJob(spark, str(tmp_path / "inc_work"), n_partitions=2,
                    source_snapshot="inc")
    ckpt = str(tmp_path / "inc_ckpt")
    run_stream_ingest_once(
        spark, str(src), transcripts.schema, job, tier="1m",
        checkpoint_dir=ckpt,
    )
    n_batches_first = len(job.metrics("1m").toPandas())

    late.toPandas().to_parquet(
        str(src / "b.parquet"), engine="pyarrow", coerce_timestamps="us"
    )
    run_stream_ingest_once(
        spark, str(src), transcripts.schema, job, tier="1m",
        checkpoint_dir=ckpt,
    )
    got = (
        job.read_tier("1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        rollup_transcripts(transcripts, "1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the resumed run appended manifest rows for its new batches only
    assert len(job.metrics("1m").toPandas()) > n_batches_first


def test_merge_batch_retry_is_idempotent_and_partition_scoped(
    spark, tmp_path, table_cls
):
    """foreachBatch is at-least-once: replaying the same (batch_df,
    batch_id) must leave both the tier table AND the manifest unchanged
    (ADVICE r2 lineage-dup finding), and merging a batch touching only
    one partition must not rewrite the other partition's rows."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tsaug_spark.sources.checkpoint import RollupJob
    from tsaug_spark.streaming.stream_sink import merge_batch_into_tier

    job = RollupJob(spark, str(tmp_path / "retry_work"), n_partitions=4,
                    source_snapshot="stream", table_cls=table_cls)
    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "conv_id", "bucket_ts", "turn_rate", "tool_usage",
                "text_len",
            ],
        )
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))

    b0 = mk([("c-1", "2024-01-01 00:01:00", 3, 1, 120),
             ("c-2", "2024-01-01 00:01:00", 2, 0, 80)])
    merge_batch_into_tier(job, "1m", b0, 0)
    before = (
        job.read_tier("1m").orderBy("conv_id", "bucket_ts").toPandas()
    )

    # retry of batch 0: no tier change, no duplicate manifest row
    merge_batch_into_tier(job, "1m", b0, 0)
    after = (
        job.read_tier("1m").orderBy("conv_id", "bucket_ts").toPandas()
    )
    pd.testing.assert_frame_equal(before, after)
    m = job.metrics("1m").toPandas()
    assert (m["source_snapshot"] == "stream-batch:0").sum() == 1

    # batch 1 updates only c-1's bucket; c-2's row must survive the
    # partition-scoped overwrite untouched
    b1 = mk([("c-1", "2024-01-01 00:01:00", 5, 2, 200)])
    merge_batch_into_tier(job, "1m", b1, 1)
    got = (
        job.read_tier("1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
        .set_index("conv_id")
    )
    assert got.loc["c-1", "turn_rate"] == 5
    assert got.loc["c-2", "turn_rate"] == 2


def test_native_session_window_stream_matches_batch(spark, tmp_path):
    """Catalyst-native session_window sessionizer: the SAME operator
    run as an availableNow stream over time-ordered files (sessions
    merge incrementally in the JVM state store) must catch up to its
    own batch result.  Session-window streaming aggs support append
    (finalized-only, the production mode: watermark evicts closed
    sessions) and complete; the equality check runs complete so the
    tail sessions the watermark has not passed are included too."""
    from tsaug_spark.streaming.stateful import sessionize_native

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "ts"
    )
    # time-ordered files with disjoint ts ranges: in-order arrival
    src = str(tmp_path / "sess_native_src")
    (
        ev.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(src)
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_native(stream, gap=1800)
        .writeStream.format("memory")
        .queryName("sess_native_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = (
        spark.table("sess_native_out")
        .orderBy("user_id", "session_start")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        sessionize_native(ev, gap=1800)
        .orderBy("user_id", "session_start")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_ingest_then_incremental_cascade(
    spark, transcripts, tmp_path, table_cls
):
    """The full production loop: streaming ingest maintains the 1m
    tier, cascade_tier builds 1h once, then LATE files arrive, the
    stream resumes from its checkpoint, and cascade_update refreshes
    only the 1h watermark-grace tail — the coarse tier must equal the
    direct re-aggregation of the caught-up fine tier."""
    from pyspark.sql import functions as F

    from tsaug_spark.plans.rollup import reaggregate, rollup_transcripts
    from tsaug_spark.sources.checkpoint import RollupJob
    from tsaug_spark.streaming.stream_sink import run_stream_ingest_once

    lo, hi = transcripts.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    cutoff = F.timestamp_seconds(F.lit(int(lo + 0.6 * (hi - lo))))
    early = transcripts.filter(F.col("ts") < cutoff)
    late = transcripts.filter(F.col("ts") >= cutoff)

    src = tmp_path / "loop_src"
    src.mkdir()
    early.toPandas().to_parquet(
        str(src / "a.parquet"), engine="pyarrow", coerce_timestamps="us"
    )
    job = RollupJob(spark, str(tmp_path / "loop_work"), n_partitions=2,
                    source_snapshot="loop", table_cls=table_cls)
    ckpt = str(tmp_path / "loop_ckpt")
    run_stream_ingest_once(
        spark, str(src), transcripts.schema, job, tier="1m",
        checkpoint_dir=ckpt,
    )
    assert job.cascade_tier("1m", "1h") == 2

    late.toPandas().to_parquet(
        str(src / "b.parquet"), engine="pyarrow", coerce_timestamps="us"
    )
    run_stream_ingest_once(
        spark, str(src), transcripts.schema, job, tier="1m",
        checkpoint_dir=ckpt,
    )
    # the streamed 1m tier is caught up to the batch rollup ...
    got_1m = (
        job.read_tier("1m").orderBy("conv_id", "bucket_ts").toPandas()
    )
    want_1m = (
        rollup_transcripts(transcripts, "1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got_1m.reset_index(drop=True),
        want_1m.reset_index(drop=True),
        check_dtype=False,
    )
    # ... and the incremental cascade refresh converges the 1h tier
    # (grace wide enough to cover the stream's watermark window)
    assert job.cascade_update(
        "1m", "1h", grace="2 hours", new_snapshot="loop2"
    ) > 0
    got_1h = (
        job.read_tier("1h").orderBy("conv_id", "bucket_ts").toPandas()
    )
    want_1h = (
        reaggregate(job.read_tier("1m"), "1m", "1h")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got_1h.reset_index(drop=True),
        want_1h.reset_index(drop=True),
        check_dtype=False,
    )


def test_stream_m4_matches_batch_across_micro_batches(spark, tmp_path):
    """Streaming M4 over >4 source files (maxFilesPerTrigger=4 forces
    multiple micro-batches) must equal the batch m4_downsample — the
    per-(key, window) min/max/min_by/max_by state merges across
    micro-batches."""
    from tsaug_spark.plans.metrics import m4_downsample
    from tsaug_spark.streaming.stream_rollup import run_stream_m4_once

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "ev_files")
    # 6 files -> 2 micro-batches at maxFilesPerTrigger=4
    ev.repartition(6).write.parquet(src)

    streamed = (
        run_stream_m4_once(spark, src, tier="1m",
                           sink_table="t_stream_m4")
        .withColumn("bucket_s", F.unix_timestamp("bucket_ts"))
        .select("key", "bucket_s", "n", "vmin", "vmax", "vfirst",
                "vlast")
        .orderBy("key", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    batch = (
        m4_downsample(ev, "1m")
        .orderBy("key", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        streamed, batch[streamed.columns.tolist()], check_dtype=False
    )


def test_stream_interval_join_equals_batch(spark):
    """Stream-stream inner join (watermarked, interval-bounded)
    drained with availableNow equals the batch interval join row for
    row, and every emitted delay is inside [0, window]."""
    from pyspark.sql import functions as F

    from tsaug_spark.streaming.stream_join import run_stream_join_once

    src = "/root/testdata/sf0.01/events.parquet"
    streamed = run_stream_join_once(
        spark, src, window_s=3600, sink_table="t_stream_join"
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.delay_us)
        for r in streamed.collect()
    }
    ev = spark.read.parquet(src)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("ts").cast("timestamp").alias("ct"),
        F.col("event_id").alias("ci"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("ts").cast("timestamp").alias("pt"),
        F.col("event_id").alias("pi"),
    )
    ref = {
        (r.u, r.ci, r.pi, r.d)
        for r in c.join(
            p,
            (F.col("u") == F.col("pu"))
            & (F.col("pt") >= F.col("ct"))
            & (F.col("pt") <= F.col("ct") + F.expr(
                "INTERVAL 3600 SECONDS")),
        )
        .select(
            "u", "ci", "pi",
            (F.unix_micros("pt") - F.unix_micros("ct")).alias("d"),
        )
        .collect()
    }
    assert got == ref and len(got) > 0
    assert all(0 <= d <= 3600 * 10**6 for *_x, d in got)


def test_stream_kmv_matches_batch_across_micro_batches(spark, tmp_path):
    """Streaming KMV over 6 source files (2 micro-batches at
    maxFilesPerTrigger=4): the caught-up min-per-rank view must equal
    the batch kmv_partial sketch bit for bit — the per-bucket k-array
    state merges across micro-batches in any arrival order."""
    from tsaug_spark.plans.sketches import kmv_partial
    from tsaug_spark.streaming.stateful import run_stream_kmv_once

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "ev_kmv_files")
    ev.repartition(6).write.parquet(src)

    streamed = (
        run_stream_kmv_once(spark, src, sink_table="t_stream_kmv")
        .orderBy("bucket_s", "rn")
        .toPandas()
        .reset_index(drop=True)
    )
    batch = (
        kmv_partial(ev, "1d")
        .orderBy("bucket_s", "rn")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        streamed, batch[streamed.columns.tolist()], check_dtype=False
    )


def test_stream_gapfill_hand_fixture(spark, tmp_path):
    """User with hourly counts at buckets h0(2 events), h0+3(1): the
    two skipped hours must appear as is_gap rows carrying cnt=2, split
    across micro-batches so the fill crosses a state boundary."""
    import datetime as dt

    from tsaug_spark.streaming.stateful import run_stream_gapfill_once

    t0 = dt.datetime(2024, 1, 1)
    h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    batch1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [t0, t0 + dt.timedelta(minutes=30)],
            "user_id": [7, 7],
            "event_type": ["click", "click"],
            "value": [1.0, 1.0],
        }
    )
    batch2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": [t0 + dt.timedelta(hours=3, minutes=10)],
            "user_id": [7],
            "event_type": ["click"],
            "value": [1.0],
        }
    )
    src = tmp_path / "gf_src"
    src.mkdir()
    for i, b in enumerate((batch1, batch2)):
        f = str(src / f"p{i}.parquet")
        b.to_parquet(f, engine="pyarrow", coerce_timestamps="us")
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))
    out = {
        r.bucket_s: r
        for r in run_stream_gapfill_once(
            spark, str(src), sink_table="gf_hand",
            max_files_per_trigger=1,
        ).collect()
    }
    assert set(out) == {h0, h0 + 3600, h0 + 7200, h0 + 10800}
    assert (out[h0].cnt, out[h0].is_gap) == (2, False)
    assert (out[h0 + 3600].cnt, out[h0 + 3600].is_gap) == (2, True)
    assert (out[h0 + 7200].cnt, out[h0 + 7200].is_gap) == (2, True)
    assert (out[h0 + 10800].cnt, out[h0 + 10800].is_gap) == (1, False)


def test_stream_gapfill_matches_batch_locf(spark, tmp_path):
    """Three time-ordered micro-batches over the sf0.001 events: the
    caught-up view equals the batch complete_grid + fill_locf stage
    (including the is_gap flags) row for row."""
    from tsaug_spark.plans.gapfill import complete_grid, fill_locf
    from tsaug_spark.plans.rollup import rollup_events
    from tsaug_spark.streaming.stateful import run_stream_gapfill_once

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    src = tmp_path / "gf_split"
    src.mkdir()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    parts = [
        ev.filter(F.unix_timestamp("ts") <= cut1),
        ev.filter(
            (F.unix_timestamp("ts") > cut1)
            & (F.unix_timestamp("ts") <= cut2)
        ),
        ev.filter(F.unix_timestamp("ts") > cut2),
    ]
    for i, part in enumerate(parts):
        f = str(src / f"part{i}.parquet")
        part.toPandas().to_parquet(
            f, engine="pyarrow", coerce_timestamps="us"
        )
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))

    got = (
        run_stream_gapfill_once(
            spark, str(src), sink_table="gf_batchtwin",
            max_files_per_trigger=1,
        )
        .orderBy("user_id", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    hourly = rollup_events(ev, "1h").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.timestamp_seconds("bucket_s").alias("bucket_ts"),
        "cnt",
    )
    want = (
        fill_locf(complete_grid(hourly, "1h"), ["cnt"])
        .select(
            F.col("conv_id").cast("long").alias("user_id"),
            F.unix_timestamp("bucket_ts").alias("bucket_s"),
            "cnt",
            "is_gap",
        )
        .orderBy("user_id", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_stream_gapfill_interp_two_phase(spark, tmp_path):
    """Counts 4 at h0, gap at h0+1/h0+2, then bucket h0+3 whose count
    arrives over TWO later batches (1 then +2 more): provisional gap
    values from the middle batch must be overwritten by the final
    (higher-seq) blends once the right bracket's count is complete."""
    import datetime as dt

    from tsaug_spark.streaming.stateful import (
        run_stream_gapfill_interp_once,
    )

    t0 = dt.datetime(2024, 1, 1)
    h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())

    def mk(eids, offsets_min):
        return pd.DataFrame(
            {
                "event_id": eids,
                "ts": [
                    t0 + dt.timedelta(minutes=m) for m in offsets_min
                ],
                "user_id": [7] * len(eids),
                "event_type": ["click"] * len(eids),
                "value": [1.0] * len(eids),
            }
        )

    batches = [
        mk([1, 2, 3, 4], [0, 10, 20, 30]),        # h0: 4 events
        mk([5], [180 + 5]),                        # h0+3: 1 event
        mk([6, 7], [180 + 20, 180 + 40]),          # h0+3: +2 events
    ]
    src = tmp_path / "gfi_src"
    src.mkdir()
    for i, b in enumerate(batches):
        f = str(src / f"p{i}.parquet")
        b.to_parquet(f, engine="pyarrow", coerce_timestamps="us")
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))
    out = {
        r.bucket_s: r
        for r in run_stream_gapfill_interp_once(
            spark, str(src), sink_table="gfi_hand",
            max_files_per_trigger=1,
        ).collect()
    }
    assert set(out) == {h0, h0 + 3600, h0 + 7200, h0 + 10800}
    assert (out[h0].val, out[h0].is_gap) == (4.0, False)
    assert (out[h0 + 10800].val, out[h0 + 10800].is_gap) == (3.0, False)
    # final blends: pv=4, nv=3 over a 3-step gap
    f1 = (h0 + 3600 - h0) / (h0 + 10800 - h0)
    f2 = (h0 + 7200 - h0) / (h0 + 10800 - h0)
    assert out[h0 + 3600].val == 4.0 * (1.0 - f1) + 3.0 * f1
    assert out[h0 + 7200].val == 4.0 * (1.0 - f2) + 3.0 * f2
    assert out[h0 + 3600].is_gap and out[h0 + 7200].is_gap


def test_stream_gapfill_interp_matches_batch(spark, tmp_path):
    """Three time-ordered micro-batches over sf0.001: the caught-up
    argmax-seq view equals the batch complete_grid + fill_interpolate
    stage on the count channel bit for bit."""
    from tsaug_spark.plans.gapfill import (
        complete_grid,
        fill_interpolate,
    )
    from tsaug_spark.plans.rollup import rollup_events
    from tsaug_spark.streaming.stateful import (
        run_stream_gapfill_interp_once,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    src = tmp_path / "gfi_split"
    src.mkdir()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    parts = [
        ev.filter(F.unix_timestamp("ts") <= cut1),
        ev.filter(
            (F.unix_timestamp("ts") > cut1)
            & (F.unix_timestamp("ts") <= cut2)
        ),
        ev.filter(F.unix_timestamp("ts") > cut2),
    ]
    for i, part in enumerate(parts):
        f = str(src / f"part{i}.parquet")
        part.toPandas().to_parquet(
            f, engine="pyarrow", coerce_timestamps="us"
        )
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))

    got = (
        run_stream_gapfill_interp_once(
            spark, str(src), sink_table="gfi_batchtwin",
            max_files_per_trigger=1,
        )
        .orderBy("user_id", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    hourly = rollup_events(ev, "1h").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.timestamp_seconds("bucket_s").alias("bucket_ts"),
        F.col("cnt").cast("double").alias("val"),
    )
    want = (
        fill_interpolate(complete_grid(hourly, "1h"), ["val"])
        .select(
            F.col("conv_id").cast("long").alias("user_id"),
            F.unix_timestamp("bucket_ts").alias("bucket_s"),
            "val",
            "is_gap",
        )
        .orderBy("user_id", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_stream_gapfill_ttl_truncates_stale_fill(spark, tmp_path):
    """Observations at h0 and h0+5 with ttl=2 buckets: only h0+1 and
    h0+2 are filled; h0+3 and h0+4 are stale and never emitted."""
    import datetime as dt

    from tsaug_spark.streaming.stateful import (
        run_stream_gapfill_ttl_once,
    )

    t0 = dt.datetime(2024, 1, 1)
    h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [t0, t0 + dt.timedelta(minutes=9)],
            "user_id": [5, 5],
            "event_type": ["click", "click"],
            "value": [1.0, 1.0],
        }
    )
    b2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": [t0 + dt.timedelta(hours=5, minutes=1)],
            "user_id": [5],
            "event_type": ["click"],
            "value": [1.0],
        }
    )
    src = tmp_path / "gft_src"
    src.mkdir()
    for i, b in enumerate((b1, b2)):
        f = str(src / f"p{i}.parquet")
        b.to_parquet(f, engine="pyarrow", coerce_timestamps="us")
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))
    out = {
        r.bucket_s: r
        for r in run_stream_gapfill_ttl_once(
            spark, str(src), sink_table="gft_hand",
            max_files_per_trigger=1,
        ).collect()
    }
    assert set(out) == {h0, h0 + 3600, h0 + 7200, h0 + 18000}
    assert (out[h0].cnt, out[h0].is_gap) == (2, False)
    assert (out[h0 + 3600].cnt, out[h0 + 3600].is_gap) == (2, True)
    assert (out[h0 + 7200].cnt, out[h0 + 7200].is_gap) == (2, True)
    assert (out[h0 + 18000].cnt, out[h0 + 18000].is_gap) == (1, False)


def test_stream_gapfill_ttl_matches_batch(spark, tmp_path):
    """Three time-ordered micro-batches over sf0.001: the caught-up
    view equals the batch fill_locf_ttl non-stale read row for row."""
    from tsaug_spark.plans.gapfill import complete_grid, fill_locf_ttl
    from tsaug_spark.plans.rollup import rollup_events
    from tsaug_spark.streaming.stateful import (
        run_stream_gapfill_ttl_once,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    src = tmp_path / "gft_split"
    src.mkdir()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    parts = [
        ev.filter(F.unix_timestamp("ts") <= cut1),
        ev.filter(
            (F.unix_timestamp("ts") > cut1)
            & (F.unix_timestamp("ts") <= cut2)
        ),
        ev.filter(F.unix_timestamp("ts") > cut2),
    ]
    for i, part in enumerate(parts):
        f = str(src / f"part{i}.parquet")
        part.toPandas().to_parquet(
            f, engine="pyarrow", coerce_timestamps="us"
        )
        os.utime(f, (1_000_000 + i * 100, 1_000_000 + i * 100))

    got = (
        run_stream_gapfill_ttl_once(
            spark, str(src), sink_table="gft_batchtwin",
            max_files_per_trigger=1,
        )
        .orderBy("user_id", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    hourly = rollup_events(ev, "1h").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.timestamp_seconds("bucket_s").alias("bucket_ts"),
        "cnt",
    )
    grid = complete_grid(hourly, "1h")
    want = (
        fill_locf_ttl(grid, ["cnt"], 7200)
        .filter(F.col("cnt").isNotNull())
        .select(
            F.col("conv_id").cast("long").alias("user_id"),
            F.unix_timestamp("bucket_ts").alias("bucket_s"),
            "cnt",
            "is_gap",
        )
        .orderBy("user_id", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
