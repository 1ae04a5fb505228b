"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The streaming twin of the batch sessionize query (a >``gap``-second
silence starts a new session): per-key state carries the open session
(id, start, last-seen, count) across micro-batches, each batch emits the
current snapshot of every session it touched (update mode), and the
caught-up, last-update-per-session view equals the batch result exactly.

Arrival-order contract: results match the batch query when each key's
events arrive in nondecreasing event time across micro-batches (a
replayed log, a time-ordered backfill, or any single-batch
``availableNow`` run).  Rows arriving out of order *within* one
micro-batch are fine (each batch sorts); an event older than the key's
last-seen time in a *previous* batch would need watermark-deep buffering
in state, which this operator intentionally does not do — the engine's
batch path (``RollupJob.update``) is the late-data story, as with the
tier rollups.

State size: one fixed-width row per active key.  In production, swap
``NoTimeout`` for ``GroupStateTimeout.EventTimeTimeout`` and call
``state.setTimeoutTimestamp(last_t + gap)`` so closed sessions evict
when the watermark passes; the backfill harness keeps NoTimeout (state
dies with the query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_DDL = (
    "user_id long, session_id long, n_events long, duration_s long"
)
SESSION_STATE_DDL = (
    "session_id long, start_t long, last_t long, n_events long"
)


def _session_fn(gap: int):
    def fn(key, pdfs, state: GroupState):
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        rows = pd.concat(batches, ignore_index=True)
        t = (
            rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        order = np.lexsort((rows["event_id"].to_numpy(), t))
        t = t[order]

        if state.exists:
            sid0, start0, last0, n0 = state.get
            prev = np.concatenate(([last0], t[:-1]))
        else:
            sid0, start0, n0 = 0, int(t[0]), 0
            prev = np.concatenate(([t[0]], t[:-1]))
        new = (t - prev) > gap
        sids = sid0 + np.cumsum(new)

        uniq, first_idx, counts = np.unique(
            sids, return_index=True, return_counts=True
        )
        out_rows = []
        open_session = None
        for sid, fi, c in zip(uniq, first_idx, counts):
            li = fi + c - 1
            continuing = state.exists and sid == sid0 and not bool(new[0])
            if continuing:
                start, n = start0, n0 + int(c)
            else:
                start, n = int(t[fi]), int(c)
            out_rows.append(
                (int(key[0]), int(sid), n, int(t[li]) - start)
            )
            open_session = (int(sid), start, int(t[li]), n)
        state.update(open_session)
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_id", "n_events", "duration_s"],
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stateful streaming sessionization of an event stream."""
    ev = events.withColumn("ts", events["ts"].cast("timestamp"))
    ev = ev.withWatermark("ts", watermark)
    return (
        ev.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap),
            SESSION_OUT_DDL,
            SESSION_STATE_DDL,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_sessionize_once(
    spark,
    source_path: str,
    gap: int = 1800,
    sink_table: str = "stream_sessions_out",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """availableNow backfill of the stateful sessionizer over a file
    source; returns the caught-up per-session view (last update wins —
    n_events and duration_s grow monotonically, so max == latest)."""
    import os

    from pyspark.sql import functions as F

    schema = spark.read.parquet(source_path).schema
    if os.path.isdir(source_path):
        src_dir, glob = source_path, "*"
    else:
        src_dir = os.path.dirname(source_path)
        glob = os.path.basename(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(src_dir)
    )
    q = (
        sessionize_stream(stream, gap=gap)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow sessionize backfill did not finish in 300s; "
            "the memory sink would be partial — refusing to return it"
        )
    return (
        spark.table(sink_table)
        .groupBy("user_id", "session_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("duration_s").alias("duration_s"),
        )
    )


def sessionize_native(
    events: DataFrame,
    gap: int = 1800,
    watermark: "str | None" = None,
) -> DataFrame:
    """Gap sessionization via Catalyst's native ``session_window`` —
    the JVM-side merging-session-window aggregate (no Python state, no
    UDF; Spark's incremental session merge handles the streaming state
    store).  Works on both batch and streaming DataFrames: pass
    ``watermark`` for streams so closed sessions finalize and evict.

    Boundary semantics are session_window's half-open windows: two
    events merge iff their gap is STRICTLY less than ``gap`` seconds
    (an event exactly ``gap`` later starts a new session), which is the
    standard Spark/Flink session-window contract.  The
    ``applyInPandasWithState`` twin (``sessionize_stream``) keeps the
    reference batch query's inclusive boundary and a per-key session
    counter — the two operators are both tested against their own
    batch formulations.

    Output: user_id, session_start, session_end (last event + gap),
    n_events, duration_s (last event − first event).
    """
    from pyspark.sql import functions as F

    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{gap} seconds")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            (
                F.unix_timestamp("session_window.end")
                - F.unix_timestamp("session_window.start")
                - F.lit(gap)
            ).alias("duration_s"),
        )
    )


KMV_OUT_DDL = "bucket_s long, rn int, hv long"
KMV_STATE_DDL = "hvs array<long>"


def _kmv_fn(k: int):
    def fn(key, pdfs, state: GroupState):
        parts = [p["hv"].to_numpy("int64") for p in pdfs if len(p)]
        if not parts:
            return
        new = np.unique(np.concatenate(parts))
        if state.exists:
            (old,) = state.get
            merged = np.unique(
                np.concatenate([np.asarray(old, dtype="int64"), new])
            )
        else:
            merged = new
        merged = merged[:k]  # np.unique sorts: k smallest distinct
        state.update((merged.tolist(),))
        yield pd.DataFrame(
            {
                "bucket_s": np.int64(key[0]),
                "rn": np.arange(1, len(merged) + 1, dtype="int32"),
                "hv": merged,
            }
        )

    return fn


def kmv_stream(
    events: DataFrame,
    tier_seconds: int = 86400,
    item_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Streaming KMV/theta sketch: the ``applyInPandasWithState`` twin
    of ``plans.sketches.kmv_partial``.

    Per-bucket state is the sorted array of the ``k`` smallest
    DISTINCT 60-bit md5 hashes seen so far (bounded: ``k`` int64s per
    bucket, raw ids never enter state); each micro-batch merges its
    batch-local distinct hashes into the array (one ``np.unique`` —
    the vectorized sorted-merge) and emits the full current sketch.
    Because inserting hashes can only LOWER the value at any rank, the
    per-(bucket, rn) emission sequence is monotone decreasing and the
    caught-up view is ``min(hv)`` per (bucket, rn) — equal to the
    batch sketch EXACTLY, in any arrival order (set union is
    order-free, unlike the sessionizer's in-order contract)."""
    from pyspark.sql import functions as F

    from tsaug_spark.plans.sketches import kmv_hash

    keyed = events.select(
        (
            F.floor(F.unix_timestamp(F.col("ts")) / tier_seconds)
            * tier_seconds
        )
        .cast("long")
        .alias("bucket_s"),
        kmv_hash(F.col(item_col)).alias("hv"),
    )
    return keyed.groupBy("bucket_s").applyInPandasWithState(
        _kmv_fn(k),
        KMV_OUT_DDL,
        KMV_STATE_DDL,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_kmv_once(
    spark,
    source_path: str,
    tier_seconds: int = 86400,
    k: int = 64,
    sink_table: str = "stream_kmv_out",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """availableNow backfill of the streaming KMV sketch; returns the
    caught-up sketch (min per rank — see ``kmv_stream``), which equals
    ``kmv_partial`` built in batch, bit for bit."""
    import os

    from pyspark.sql import functions as F

    schema = spark.read.parquet(source_path).schema
    if os.path.isdir(source_path):
        src_dir, glob = source_path, "*"
    else:
        src_dir = os.path.dirname(source_path)
        glob = os.path.basename(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(src_dir)
    )
    q = (
        kmv_stream(stream, tier_seconds=tier_seconds, k=k)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow KMV backfill did not finish in 300s; the "
            "memory sink would be partial — refusing to return it"
        )
    return (
        spark.table(sink_table)
        .groupBy("bucket_s", "rn")
        .agg(F.min("hv").alias("hv"))
    )


GAPFILL_OUT_DDL = "user_id long, bucket_s long, cnt long, is_gap boolean"
GAPFILL_STATE_DDL = "cur_b long, cur_c long"


def _gapfill_fn(bucket_seconds: int):
    def fn(key, pdfs, state: GroupState):
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        rows = pd.concat(batches, ignore_index=True)
        t = (
            rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        buckets = (t // bucket_seconds) * bucket_seconds
        ubs, counts = np.unique(buckets, return_counts=True)

        if state.exists:
            cur_b, cur_c = (int(v) for v in state.get)
            if int(ubs[0]) < cur_b:
                raise ValueError(
                    "stream_gapfill: event older than the open bucket "
                    f"({int(ubs[0])} < {cur_b}) — arrival-order "
                    "contract violated (see module docstring)"
                )
        else:
            cur_b, cur_c = int(ubs[0]), 0
        out = []
        uid = int(key[0])
        for b, c in zip(ubs, counts):
            b, c = int(b), int(c)
            if b == cur_b:
                cur_c += c
                continue
            out.append((uid, cur_b, cur_c, False))
            for g in range(cur_b + bucket_seconds, b, bucket_seconds):
                out.append((uid, g, cur_c, True))
            cur_b, cur_c = b, c
        out.append((uid, cur_b, cur_c, False))
        state.update((cur_b, cur_c))
        yield pd.DataFrame(
            out, columns=["user_id", "bucket_s", "cnt", "is_gap"]
        )

    return fn


def gapfill_stream(
    events: DataFrame, bucket_seconds: int = 3600
) -> DataFrame:
    """Streaming LOCF gap-fill — the stateful twin of the batch
    ``complete_grid`` + ``fill_locf`` cascade stage (plans/gapfill.py):
    per-key state carries the OPEN bucket's (start, running count);
    when a later bucket first appears, the open bucket finalizes and
    every skipped grid bucket between them is emitted carrying the
    last observation forward (``is_gap = true``), exactly the batch
    ``last_value IGNORE NULLS`` semantics over the per-user min..max
    grid.

    Arrival-order contract: identical to the sessionizer above —
    nondecreasing event time per key ACROSS micro-batches (violations
    raise rather than silently rewriting emitted history); any order
    within a micro-batch.  The open bucket re-emits its growing count
    each touching batch, so the caught-up view is max-per-(key,
    bucket), monotone like the session snapshots.

    State: one fixed-width row per key.  Production eviction:
    EventTimeTimeout at (open bucket + allowed lateness), flushing the
    final row on timeout.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _gapfill_fn(bucket_seconds),
        outputStructType=GAPFILL_OUT_DDL,
        stateStructType=GAPFILL_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_gapfill_once(
    spark,
    source_path: str,
    bucket_seconds: int = 3600,
    sink_table: str = "stream_gapfill_out",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """availableNow backfill of the stateful gap-filler; returns the
    caught-up per-(user, bucket) view (counts grow monotonically, so
    max == latest; gap rows are emitted exactly once)."""
    import os

    from pyspark.sql import functions as F

    schema = spark.read.parquet(source_path).schema
    if os.path.isdir(source_path):
        src_dir, glob = source_path, "*"
    else:
        src_dir = os.path.dirname(source_path)
        glob = os.path.basename(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(src_dir)
    )
    q = (
        gapfill_stream(stream, bucket_seconds=bucket_seconds)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow gapfill backfill did not finish in 300s; "
            "the memory sink would be partial — refusing to return it"
        )
    return (
        spark.table(sink_table)
        .groupBy("user_id", "bucket_s")
        .agg(
            F.max("cnt").alias("cnt"),
            F.max("is_gap").alias("is_gap"),
        )
    )


INTERP_OUT_DDL = (
    "user_id long, bucket_s long, val double, is_gap boolean, seq long"
)
INTERP_STATE_DDL = (
    "prev_b long, prev_c long, cur_b long, cur_c long, seq long"
)


def _gapfill_interp_fn(bucket_seconds: int):
    def fn(key, pdfs, state: GroupState):
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        rows = pd.concat(batches, ignore_index=True)
        t = (
            rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        buckets = (t // bucket_seconds) * bucket_seconds
        ubs, counts = np.unique(buckets, return_counts=True)

        if state.exists:
            prev_b, prev_c, cur_b, cur_c, seq = (
                int(v) for v in state.get
            )
            if int(ubs[0]) < cur_b:
                raise ValueError(
                    "stream_gapfill_interp: event older than the open "
                    f"bucket ({int(ubs[0])} < {cur_b}) — arrival-order "
                    "contract violated (see module docstring)"
                )
        else:
            prev_b, prev_c = -1, 0
            cur_b, cur_c, seq = int(ubs[0]), 0, 0
        seq += 1
        uid = int(key[0])
        out = []

        def gaps(pb, pc, nb, nc):
            # the batch fill_interpolate blend, shape for shape:
            # frac = (t - pt)/(nt - pt);  v = pv*(1-frac) + nv*frac
            pv, nv = float(pc), float(nc)
            for g in range(pb + bucket_seconds, nb, bucket_seconds):
                frac = (g - pb) / (nb - pb)
                out.append(
                    (uid, g, pv * (1.0 - frac) + nv * frac, True, seq)
                )

        for b, c in zip(ubs, counts):
            b, c = int(b), int(c)
            if b == cur_b:
                cur_c += c
                continue
            # cur closes: its count is final, and so is the bracket
            # of every gap between the previously closed bucket and it
            out.append((uid, cur_b, float(cur_c), False, seq))
            if prev_b >= 0:
                gaps(prev_b, prev_c, cur_b, cur_c)
            prev_b, prev_c = cur_b, cur_c
            cur_b, cur_c = b, c
        # provisional tail: the open bucket and the gaps bracketed by
        # its RUNNING count — re-emitted (higher seq) until it closes
        if prev_b >= 0:
            gaps(prev_b, prev_c, cur_b, cur_c)
        out.append((uid, cur_b, float(cur_c), False, seq))
        state.update((prev_b, prev_c, cur_b, cur_c, seq))
        yield pd.DataFrame(
            out,
            columns=["user_id", "bucket_s", "val", "is_gap", "seq"],
        )

    return fn


def gapfill_interp_stream(
    events: DataFrame, bucket_seconds: int = 3600
) -> DataFrame:
    """Streaming LINEAR-INTERPOLATION gap-fill — the stateful twin of
    ``complete_grid`` + ``fill_interpolate`` on the hourly count
    channel.  Unlike LOCF, an interpolated gap needs its RIGHT
    bracket's final value, so emission is two-phase: gaps whose both
    brackets have closed emit once with final values; gaps bracketed
    by the open bucket re-emit with its running count every touching
    micro-batch.  A per-key ``seq`` counter stamps every row so the
    caught-up view is argmax-seq per (key, bucket) — interpolated
    values are NOT monotone, so a max-per-bucket view (the LOCF twin's
    trick) would be wrong here.

    Same arrival-order contract as the sessionizer/LOCF twins; same
    fixed-width one-row state.  The blend is computed shape-for-shape
    as the batch operator (``pv*(1-frac) + nv*frac`` in float64), so
    the caught-up view equals the batch stage bit for bit.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _gapfill_interp_fn(bucket_seconds),
        outputStructType=INTERP_OUT_DDL,
        stateStructType=INTERP_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_gapfill_interp_once(
    spark,
    source_path: str,
    bucket_seconds: int = 3600,
    sink_table: str = "stream_gapfill_interp_out",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """availableNow backfill of the interpolating gap-filler; returns
    the caught-up argmax-seq view per (user, bucket)."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    schema = spark.read.parquet(source_path).schema
    if os.path.isdir(source_path):
        src_dir, glob = source_path, "*"
    else:
        src_dir = os.path.dirname(source_path)
        glob = os.path.basename(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(src_dir)
    )
    q = (
        gapfill_interp_stream(stream, bucket_seconds=bucket_seconds)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow interp backfill did not finish in 300s; "
            "the memory sink would be partial — refusing to return it"
        )
    w = Window.partitionBy("user_id", "bucket_s").orderBy(
        F.col("seq").desc()
    )
    return (
        spark.table(sink_table)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket_s", "val", "is_gap")
    )


def _gapfill_ttl_fn(bucket_seconds: int, ttl_seconds: int):
    def fn(key, pdfs, state: GroupState):
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        rows = pd.concat(batches, ignore_index=True)
        t = (
            rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        buckets = (t // bucket_seconds) * bucket_seconds
        ubs, counts = np.unique(buckets, return_counts=True)

        if state.exists:
            cur_b, cur_c = (int(v) for v in state.get)
            if int(ubs[0]) < cur_b:
                raise ValueError(
                    "stream_gapfill_ttl: event older than the open "
                    f"bucket ({int(ubs[0])} < {cur_b}) — arrival-order "
                    "contract violated (see module docstring)"
                )
        else:
            cur_b, cur_c = int(ubs[0]), 0
        out = []
        uid = int(key[0])
        for b, c in zip(ubs, counts):
            b, c = int(b), int(c)
            if b == cur_b:
                cur_c += c
                continue
            out.append((uid, cur_b, cur_c, False))
            # carry forward only while the observation is fresh:
            # bucket g is filled iff g - cur_b <= ttl (the batch
            # fill_locf_ttl staleness rule); staler grid buckets are
            # simply never emitted
            g = cur_b + bucket_seconds
            while g < b and g - cur_b <= ttl_seconds:
                out.append((uid, g, cur_c, True))
                g += bucket_seconds
            cur_b, cur_c = b, c
        out.append((uid, cur_b, cur_c, False))
        state.update((cur_b, cur_c))
        yield pd.DataFrame(
            out, columns=["user_id", "bucket_s", "cnt", "is_gap"]
        )

    return fn


def gapfill_ttl_stream(
    events: DataFrame,
    bucket_seconds: int = 3600,
    ttl_seconds: int = 7200,
) -> DataFrame:
    """Streaming LOCF gap-fill with a staleness TTL — the stateful
    twin of ``fill_locf_ttl`` (the Prometheus lookback-delta rule): a
    skipped grid bucket is emitted carrying the last observation only
    while that observation is at most ``ttl_seconds`` old; staler
    buckets never appear, exactly the batch query's non-stale read.
    Same state, arrival-order contract and max-per-bucket caught-up
    view as :func:`gapfill_stream` — the TTL only bounds the emission
    loop, which also bounds the per-transition work regardless of how
    long a key goes quiet (the unbounded LOCF twin emits O(gap)
    rows; this one O(ttl/bucket))."""
    return events.groupBy("user_id").applyInPandasWithState(
        _gapfill_ttl_fn(bucket_seconds, ttl_seconds),
        outputStructType=GAPFILL_OUT_DDL,
        stateStructType=GAPFILL_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_gapfill_ttl_once(
    spark,
    source_path: str,
    bucket_seconds: int = 3600,
    ttl_seconds: int = 7200,
    sink_table: str = "stream_gapfill_ttl_out",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """availableNow backfill of the TTL gap-filler; caught-up
    max-per-(user, bucket) view."""
    import os

    from pyspark.sql import functions as F

    schema = spark.read.parquet(source_path).schema
    if os.path.isdir(source_path):
        src_dir, glob = source_path, "*"
    else:
        src_dir = os.path.dirname(source_path)
        glob = os.path.basename(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(src_dir)
    )
    q = (
        gapfill_ttl_stream(
            stream,
            bucket_seconds=bucket_seconds,
            ttl_seconds=ttl_seconds,
        )
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow TTL gapfill backfill did not finish in "
            "300s; the memory sink would be partial — refusing to "
            "return it"
        )
    return (
        spark.table(sink_table)
        .groupBy("user_id", "bucket_s")
        .agg(
            F.max("cnt").alias("cnt"),
            F.max("is_gap").alias("is_gap"),
        )
    )
