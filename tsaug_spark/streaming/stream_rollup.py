"""Streaming tier rollup: readStream -> watermarked tumbling window agg.

The streaming twin of plans.rollup.rollup_transcripts: the same three
metric channels per (conv_id, bucket), maintained incrementally with a
watermark for late turns.  In production this runs in update/append mode
against the raw transcript stream and feeds the 1m tier table; the
coarser tiers re-aggregate batch-side (continuous aggregates), which is
cheaper than nested streaming aggregation and matches the engine's
batch-incremental watermark design (sources/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsaug_spark.plans.rollup import TIERS


def stream_rollup(
    stream_df: DataFrame,
    tier: str = "1m",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup of a transcript stream.

    ``stream_df`` is a streaming DataFrame with the transcript schema.
    Late rows beyond ``watermark`` are dropped (state can be evicted);
    rows within it update their bucket — the streaming analogue of the
    batch job's rollup-watermark re-aggregation window.
    """
    duration = TIERS[tier][0]
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_rate"),
            F.count("tool").alias("tool_usage"),
            F.sum(F.length("text")).alias("text_len"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("bucket_ts"),
            "turn_rate",
            "tool_usage",
            "text_len",
        )
    )


def run_stream_once(
    spark,
    source_dir: str,
    schema,
    tier: str = "1m",
    sink_table: str = "stream_rollup_out",
) -> DataFrame:
    """Drive the streaming rollup over a file source until caught up.

    File-source + ``availableNow`` trigger processes every pending file
    then stops — the test/backfill harness for the streaming path.
    Returns the sink contents as a batch DataFrame.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    rolled = stream_rollup(stream, tier)
    q = (
        rolled.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow rollup backfill did not finish in 300s; "
            "the memory sink would be partial — refusing to return it"
        )
    return spark.table(sink_table)


def stream_rollup_events(
    stream_df: DataFrame,
    tier: str = "1m",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup of an event stream — the
    events-table twin of ``stream_rollup`` (same metric set as
    plans.rollup.rollup_events)."""
    duration = TIERS[tier][0]
    # event-time columns must be TIMESTAMP (watermarks reject NTZ)
    stream_df = stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("bucket_ts"),
            "cnt",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def stream_m4(
    stream_df: DataFrame,
    tier: str = "1m",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Streaming M4 aggregation: the watermarked-window twin of
    plans.metrics.m4_downsample.  min/max/min_by/max_by are all
    algebraic, so Structured Streaming maintains the per-(key, window)
    state as a constant-size sketch — late rows inside the watermark
    update their pixel bucket, rows beyond it are dropped and the
    bucket's four points become final.

    Output: key, bucket_ts, n, vmin, vmax, vfirst, vlast.
    """
    duration = TIERS[tier][0]
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    ordkey = F.struct(
        F.col(ts_col).alias("ts"), F.col(order_col).alias("o")
    )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).alias("key"),
            F.window(ts_col, duration).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(value_col).cast("double")).alias("vmin"),
            F.max(F.col(value_col).cast("double")).alias("vmax"),
            F.min_by(F.col(value_col).cast("double"), ordkey).alias(
                "vfirst"
            ),
            F.max_by(F.col(value_col).cast("double"), ordkey).alias(
                "vlast"
            ),
        )
        .select(
            "key",
            F.col("w.start").alias("bucket_ts"),
            "n",
            "vmin",
            "vmax",
            "vfirst",
            "vlast",
        )
    )


def _run_availablenow_backfill(
    spark,
    source_path: str,
    transform,
    sink_table: str,
    what: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Shared availableNow file-source backfill runner: schema-sniff
    the parquet source (dir, or single file via its parent + glob),
    apply ``transform`` to the stream, drain into a memory sink
    (complete mode for aggregates, append for row-emitting operators
    like stream-stream joins), and refuse to return a partial sink on
    timeout."""
    import os

    schema = spark.read.parquet(source_path).schema
    if os.path.isdir(source_path):
        src_dir, glob = source_path, "*"
    else:
        src_dir = os.path.dirname(source_path)
        glob = os.path.basename(source_path)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", glob)
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"availableNow {what} backfill did not finish in 300s; "
            "the memory sink would be partial — refusing to return it"
        )
    return spark.table(sink_table)


def run_stream_m4_once(
    spark,
    source_path: str,
    tier: str = "1m",
    sink_table: str = "stream_m4_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming M4 aggregation;
    the caught-up complete-mode sink equals plans.metrics.m4_downsample
    on the same data exactly (all components algebraic)."""
    return _run_availablenow_backfill(
        spark, source_path, lambda st: stream_m4(st, tier),
        sink_table, "M4",
    )


def run_stream_events_once(
    spark,
    source_path: str,
    tier: str = "1m",
    sink_table: str = "stream_events_out",
) -> DataFrame:
    """availableNow-trigger backfill of the event-stream rollup.

    Complete output mode: the caught-up sink equals the batch rollup
    exactly (watermark only bounds state eviction in update/append).
    """
    return _run_availablenow_backfill(
        spark, source_path, lambda st: stream_rollup_events(st, tier),
        sink_table, "events rollup",
    )


def stream_cms(
    stream_df: DataFrame,
    tier: str = "1h",
    watermark: str = "10 minutes",
    item_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming count-min sketch: the watermarked-window twin of
    plans.sketches.cms_partial.

    Counters are plain sums, so Structured Streaming maintains each
    (window, r, slot) cell incrementally and the per-window state is
    CONSTANT size — at most ``depth * width`` cells regardless of item
    cardinality.  That is the whole point of sketching the stream: a
    heavy-hitter screen over 10^12 turns holds ~1k cells of state per
    open window where an exact streaming count would hold one row per
    distinct item.  Late rows inside the watermark update their cell;
    beyond it the sketch is final and cascades batch-side
    (plans.sketches.cms_merge — CMS is linear).

    Output: bucket_ts, r, slot, cnt.
    """
    from tsaug_spark.plans.sketches import _slot

    duration = TIERS[tier][0]
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    rs = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.col(item_col).cast("string").alias("item"),
        )
        .select(F.col(ts_col), "item", rs)
        .select(
            F.col(ts_col),
            "r",
            _slot(F.col("item"), F.col("r"), width).alias("slot"),
        )
    )
    return (
        keyed.groupBy(
            F.window(ts_col, duration).alias("w"), "r", "slot"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("bucket_ts"), "r", "slot", "cnt"
        )
    )


def stream_hll_registers(
    stream_df: DataFrame,
    tier: str = "1h",
    watermark: str = "10 minutes",
    item_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming md5-register HLL distinct sketch: the watermarked-
    window twin of plans.sketches.hll_md5_registers.

    Registers take MAX under union, so Structured Streaming maintains
    each (window, reg) cell incrementally with CONSTANT per-window
    state — at most m = 4096 register rows no matter how many distinct
    items the window sees; raw ids never enter state.  Late rows
    inside the watermark can only RAISE a register (max is monotone),
    and the caught-up sink equals the batch build register for
    register — which is what the driver oracle checks.

    Output: bucket_ts, reg, rho.
    """
    from tsaug_spark.plans.sketches import hll_md5_reg_rho

    duration = TIERS[tier][0]
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    reg, rho = hll_md5_reg_rho(F.col(item_col))
    keyed = stream_df.withWatermark(ts_col, watermark).select(
        F.col(ts_col), reg.alias("reg"), rho.alias("rho")
    )
    return (
        keyed.groupBy(F.window(ts_col, duration).alias("w"), "reg")
        .agg(F.max("rho").alias("rho"))
        .select(F.col("w.start").alias("bucket_ts"), "reg", "rho")
    )


def run_stream_hll_once(
    spark,
    source_path: str,
    tier: str = "1h",
    sink_table: str = "stream_hll_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming HLL registers;
    max-merge is exact, so the caught-up sink equals
    plans.sketches.hll_md5_registers register for register."""
    return _run_availablenow_backfill(
        spark, source_path, lambda st: stream_hll_registers(st, tier),
        sink_table, "HLL registers",
    )


def run_stream_cms_once(
    spark,
    source_path: str,
    tier: str = "1h",
    sink_table: str = "stream_cms_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming count-min sketch;
    counters are exact sums, so the caught-up sink equals
    plans.sketches.cms_partial on the same data counter-for-counter."""
    return _run_availablenow_backfill(
        spark, source_path, lambda st: stream_cms(st, tier),
        sink_table, "count-min sketch",
    )


def stream_dd(
    stream_df: DataFrame,
    tier: str = "1h",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming DDSketch: the watermarked-window twin of
    plans.sketches.dd_partial.

    Log-bucket counts are plain sums, so Structured Streaming
    maintains each (window, key, idx) cell incrementally and the
    per-(window, key) state is bounded by the number of DISTINCT
    log-buckets (~ln(max/min)/ln(gamma) cells), not the sample count —
    a streaming p99 over 10^12 turns holds a few hundred cells per
    open window.  Late rows inside the watermark bump their cell;
    beyond it the sketch is final and cascades batch-side
    (plans.sketches.dd_merge — DDSketch is linear).

    Output: key, bucket_ts, idx, cnt.
    """
    from tsaug_spark.plans.sketches import DD_LNG

    duration = TIERS[tier][0]
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    idx = F.when(cents <= 0, F.lit(-1)).otherwise(
        F.ceil(F.log(cents.cast("double")) / F.lit(DD_LNG))
    ).cast("int")
    keyed = stream_df.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.col(key_col).alias("key"),
        idx.alias("idx"),
    )
    return (
        keyed.groupBy(
            F.window(ts_col, duration).alias("w"), "key", "idx"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "key", F.col("w.start").alias("bucket_ts"), "idx", "cnt"
        )
    )


def run_stream_dd_once(
    spark,
    source_path: str,
    tier: str = "1h",
    sink_table: str = "stream_dd_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming DDSketch;
    counters are exact sums, so the caught-up sink equals
    plans.sketches.dd_partial cell for cell."""
    return _run_availablenow_backfill(
        spark, source_path, lambda st: stream_dd(st, tier),
        sink_table, "DDSketch",
    )


def stream_sliding_hll(
    stream_df: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "10 minutes",
    item_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window streaming distinct sketch: md5-register HLL over
    OVERLAPPING windows (width > slide) — "distinct users in the last
    2 h, refreshed hourly", the sliding twin of the tumbling
    ``stream_hll_registers``.

    ``F.window(width, slide)`` assigns each row to width/slide
    windows; registers still merge by MAX, so per-(window, reg) state
    stays constant (≤ 4096 rows per open window) and a caught-up
    backfill equals the batch build over each window's exact row set —
    every event simply contributes to the two windows that cover it.

    Output: bucket_ts (window start), reg, rho.
    """
    from tsaug_spark.plans.sketches import hll_md5_reg_rho

    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    reg, rho = hll_md5_reg_rho(F.col(item_col))
    keyed = stream_df.withWatermark(ts_col, watermark).select(
        F.col(ts_col), reg.alias("reg"), rho.alias("rho")
    )
    return (
        keyed.groupBy(
            F.window(ts_col, width, slide).alias("w"), "reg"
        )
        .agg(F.max("rho").alias("rho"))
        .select(F.col("w.start").alias("bucket_ts"), "reg", "rho")
    )


def run_stream_sliding_hll_once(
    spark,
    source_path: str,
    sink_table: str = "stream_shll_out",
) -> DataFrame:
    """availableNow backfill of the sliding HLL registers."""
    return _run_availablenow_backfill(
        spark, source_path, lambda st: stream_sliding_hll(st),
        sink_table, "sliding HLL registers",
    )


def stream_bitmap_words(
    stream_df: DataFrame,
    tier: str = "1h",
    watermark: str = "10 minutes",
    item_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming EXACT-distinct bitmap: the watermarked-window twin of
    plans.sketches.bitmap_distinct's word build.

    Words merge with bit_or — idempotent and monotone (a late row
    inside the watermark can only SET bits), so Structured Streaming
    maintains each (window, word_idx) cell incrementally and the
    caught-up sink equals the batch word build word for word; state
    per window is bounded by occupied id-space / 64, never by event
    volume, and raw ids never enter state.

    Output: bucket_ts, word_idx, word (sum bit_count downstream for
    the exact distinct count).
    """
    duration = TIERS[tier][0]
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    keyed = stream_df.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        # pmod-based floor division: same negative-id-safe word
        # packing as plans/sketches.py::bitmap_distinct, so streaming
        # words stay mergeable with the batch twin's.
        F.expr(
            f"({item_col} - pmod({item_col}, 64)) div 64"
        ).alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod({item_col}, 64) AS INT))"
        ).alias("bit"),
    )
    return (
        keyed.groupBy(F.window(ts_col, duration).alias("w"), "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .select(F.col("w.start").alias("bucket_ts"), "word_idx", "word")
    )


def run_stream_bitmap_once(
    spark,
    source_path: str,
    tier: str = "1h",
    sink_table: str = "stream_bitmap_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming distinct bitmap;
    bit_or is exact and monotone, so the caught-up sink counts equal
    COUNT(DISTINCT) per bucket exactly."""
    return _run_availablenow_backfill(
        spark, source_path,
        lambda st: stream_bitmap_words(st, tier),
        sink_table, "distinct bitmap",
    )


def stream_count_sketch(
    stream_df: DataFrame,
    tier: str = "1h",
    watermark: str = "10 minutes",
    item_col: str = "user_id",
    depth: int = 5,
    width: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming CountSketch: the watermarked-window twin of
    plans.sketches.count_sketch_partial.

    Signed counters are still plain sums, so the incremental window
    state stays CONSTANT at <= depth * width cells and — like the CMS
    twin — the caught-up sink equals the batch build cell for cell in
    ANY arrival order (sums are order-free).  The signed variant is
    what the unbiased median estimator needs
    (plans.sketches.count_sketch_estimate).

    Output: bucket_ts, r, slot, cnt (signed).
    """
    from tsaug_spark.plans.sketches import _slot, cs_sign

    duration = TIERS[tier][0]
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    rs = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.col(item_col).cast("string").alias("item"),
        )
        .select(F.col(ts_col), "item", rs)
        .select(
            F.col(ts_col),
            "r",
            _slot(F.col("item"), F.col("r"), width).alias("slot"),
            cs_sign(F.col("item"), F.col("r")).alias("sgn"),
        )
    )
    return (
        keyed.groupBy(
            F.window(ts_col, duration).alias("w"), "r", "slot"
        )
        .agg(F.sum("sgn").cast("long").alias("cnt"))
        .select(
            F.col("w.start").alias("bucket_ts"), "r", "slot", "cnt"
        )
    )


def run_stream_count_sketch_once(
    spark,
    source_path: str,
    tier: str = "1h",
    sink_table: str = "stream_count_sketch_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming CountSketch;
    signed counters are exact sums, so the caught-up sink equals
    plans.sketches.count_sketch_partial cell for cell."""
    return _run_availablenow_backfill(
        spark, source_path,
        lambda st: stream_count_sketch(st, tier),
        sink_table, "CountSketch",
    )


def stream_welch(stream_df: DataFrame, watermark: str = "2 hours"):
    """Watermarked streaming twin of plans/stats.py::welch_hourly:
    the SAME six algebraic Welch sufficient-statistic aggregates
    (shared column builder welch_suff_cols) over a 1-hour tumbling
    window — a live A/B significance track whose caught-up
    complete-mode sink equals the batch plan exactly.  State per
    window is six numbers; the watermark bounds it."""
    from pyspark.sql import functions as F

    from tsaug_spark.plans.stats import welch_suff_cols

    # event-time columns must be TIMESTAMP (watermarks reject NTZ)
    stream_df = stream_df.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(*welch_suff_cols())
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "na", "sa", "qa", "nb", "sb", "qb",
        )
    )


def run_stream_welch_once(
    spark,
    source_path: str,
    sink_table: str = "stream_welch_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming Welch A/B
    aggregate; applies the shared readout to the caught-up sink so
    the result equals welch_hourly on the same data exactly."""
    from tsaug_spark.plans.stats import welch_readout

    wide = _run_availablenow_backfill(
        spark, source_path, stream_welch, sink_table, "Welch A/B",
    )
    return welch_readout(wide)


def stream_wilson(
    stream_df: DataFrame,
    success_type: str = "purchase",
    trial_types=("click", "purchase"),
    watermark: str = "2 days",
):
    """Watermarked streaming twin of plans/stats.py::wilson_interval:
    exact per-(user, day-window) success/trial counts — algebraic
    state, two numbers per open window — whose caught-up
    complete-mode sink equals the batch plan exactly; the Wilson CI
    readout (shared wilson_bounds float tree) is applied after the
    sink catches up."""
    from pyspark.sql import functions as F

    stream_df = stream_df.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        stream_df.filter(
            F.col("event_type").isin(list(trial_types))
        )
        .withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id").alias("key"),
            F.window("ts", "1 day").alias("w"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == success_type, 1
                ).otherwise(0)
            ).alias("k"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "key",
            F.floor(F.unix_timestamp(F.col("w.start")) / 86400)
            .cast("long")
            .alias("day"),
            "k",
            "n",
        )
    )


def run_stream_wilson_once(
    spark,
    source_path: str,
    sink_table: str = "stream_wilson_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming Wilson CTR
    aggregate; the shared readout makes the result equal
    wilson_interval on the same data exactly."""
    from pyspark.sql import functions as F

    from tsaug_spark.plans.stats import wilson_bounds

    agg = _run_availablenow_backfill(
        spark, source_path, stream_wilson, sink_table, "Wilson CTR",
    )
    lo, hi = wilson_bounds()
    return agg.select(
        "key", "day", "k", "n",
        lo.alias("wilson_lo"), hi.alias("wilson_hi"),
    )


def stream_psi(stream_df: DataFrame, watermark: str = "2 days"):
    """Watermarked streaming twin of plans/stats.py::psi_daily_fixed:
    per-(1-day window, literal bin) exact counts — algebraic state —
    with the shared PSI readout applied to the caught-up sink."""
    from pyspark.sql import functions as F

    from tsaug_spark.plans.stats import psi_bin_col

    stream_df = stream_df.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        stream_df.select("ts", psi_bin_col("value"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "bin",
            "cnt",
        )
    )


def run_stream_psi_once(
    spark,
    source_path: str,
    sink_table: str = "stream_psi_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming PSI monitor;
    the shared readout makes the result equal psi_daily_fixed on the
    same data exactly."""
    from tsaug_spark.plans.stats import psi_readout

    binned = _run_availablenow_backfill(
        spark, source_path, stream_psi, sink_table, "PSI",
    )
    return psi_readout(binned)


def stream_jb(stream_df: DataFrame, watermark: str = "2 days"):
    """Watermarked streaming twin of plans/stats.py::jb_values_daily:
    the five algebraic Jarque-Bera sufficient statistics per 1-day
    window (shared builder jb_suff_cols)."""
    from pyspark.sql import functions as F

    from tsaug_spark.plans.stats import jb_suff_cols

    stream_df = stream_df.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(*jb_suff_cols("value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "n", "s1", "s2", "s3", "s4",
        )
    )


def run_stream_jb_once(
    spark,
    source_path: str,
    sink_table: str = "stream_jb_out",
) -> DataFrame:
    """availableNow-trigger backfill of the streaming Jarque-Bera
    normality track; shared readout => equals jb_values_daily
    exactly."""
    from tsaug_spark.plans.stats import jb_readout

    wide = _run_availablenow_backfill(
        spark, source_path, stream_jb, sink_table, "Jarque-Bera",
    )
    return jb_readout(wide)
