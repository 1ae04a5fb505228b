"""Stream-stream event-time join: watermarked interval attribution.

The one Structured Streaming join shape the engine's other streaming
operators don't exercise: joining two UNBOUNDED sides (clicks x
purchases) on key + event-time interval.  Spark buffers each side in
state keyed by the join key, bounded by the watermark + the interval
condition (a click older than watermark + window can never match a
future purchase, so its state is evicted) — the standard attribution
topology (Kafka Streams' windowed join, Flink's interval join).

The inner join emits a match as soon as both rows are present, so an
availableNow backfill drained into an append-mode memory sink equals
the batch interval join row for row — which is what the driver oracle
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    stream_df: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    window_s: int = 3600,
    watermark: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key attribution: every ``right_type`` event within
    ``window_s`` seconds AFTER a ``left_type`` event of the same key.

    State bound: both sides carry watermarks and the join condition
    bounds right's event time to [left.ts, left.ts + window_s], so
    Spark evicts left-side state once the right watermark passes
    ``left.ts + window_s`` — per-key state is the last
    watermark + window of rows, independent of stream length.

    Output: user_id, click_id, purchase_id, delay_us (exact integer).
    """
    stream_df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    left = (
        stream_df.filter(F.col("event_type") == left_type)
        .select(
            F.col(key_col).alias("uid_l"),
            F.col(ts_col).alias("ts_l"),
            F.col(id_col).alias("id_l"),
        )
        .withWatermark("ts_l", watermark)
    )
    right = (
        stream_df.filter(F.col("event_type") == right_type)
        .select(
            F.col(key_col).alias("uid_r"),
            F.col(ts_col).alias("ts_r"),
            F.col(id_col).alias("id_r"),
        )
        .withWatermark("ts_r", watermark)
    )
    cond = (
        (F.col("uid_l") == F.col("uid_r"))
        & (F.col("ts_r") >= F.col("ts_l"))
        & (
            F.col("ts_r")
            <= F.col("ts_l") + F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return left.join(right, cond, "inner").select(
        F.col("uid_l").alias("user_id"),
        F.col("id_l").alias("click_id"),
        F.col("id_r").alias("purchase_id"),
        (F.unix_micros("ts_r") - F.unix_micros("ts_l")).alias(
            "delay_us"
        ),
    )


def run_stream_join_once(
    spark,
    source_path: str,
    window_s: int = 3600,
    sink_table: str = "stream_join_out",
) -> DataFrame:
    """availableNow backfill of the attribution join into an
    APPEND-mode memory sink (stream-stream inner joins emit matched
    rows, not aggregates); shares the rollup module's backfill runner,
    including its refuse-partial-sink timeout contract."""
    from tsaug_spark.streaming.stream_rollup import (
        _run_availablenow_backfill,
    )

    return _run_availablenow_backfill(
        spark,
        source_path,
        lambda st: stream_interval_join(st, window_s=window_s),
        sink_table,
        "stream-stream attribution join",
        output_mode="append",
    )
