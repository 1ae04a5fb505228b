"""Chunk-column integration: tier rows <-> Gorilla-compressed chunks.

A *chunk row* packs one conversation's whole tier series into opaque
``binary`` columns — delta-of-delta timestamps + one Gorilla value chunk
per metric channel — the storage layout of the retention tiers.  Encoding
runs per conversation group inside ``applyInPandas`` (Arrow batches,
NumPy bit-packing — no per-row Python); decode is ``mapInPandas`` over
chunk rows, emitting long rows again.

Scale: chunk size is bounded by tier width (see plans/pack.py) and the
chunk table is ~1000x smaller than the long tier, so downstream joins on
it broadcast.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def compress_tier(
    df_tier: DataFrame,
    value_cols: Sequence[str],
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Compress a long tier DataFrame into one chunk row per conversation.

    Output: conv_id, n_points, bytes_raw, bytes_compressed, ts_chunk,
    and a ``<col>_chunk`` binary per metric channel.

    Implementation: repartition + sortWithinPartitions co-locates and
    orders each conversation, then ``mapInPandas`` streams Arrow batches
    through the *grouped* Gorilla encoders — one vectorized bit-assembly
    pass per batch instead of per conversation (tier chunks are small,
    so per-group overhead would dominate).  A carry-over buffer stitches
    conversations that span Arrow batch boundaries.
    """
    value_cols = list(value_cols)
    schema = (
        "conv_id string, n_points long, bytes_raw long, "
        "bytes_compressed long, ts_chunk binary, "
        + ", ".join(f"{c}_chunk binary" for c in value_cols)
    )
    from .gorilla import encode_timestamps_grouped, encode_values_grouped

    out_cols = [
        "conv_id", "n_points", "bytes_raw", "bytes_compressed", "ts_chunk",
    ] + [f"{c}_chunk" for c in value_cols]

    def encode_block(pdf: pd.DataFrame) -> pd.DataFrame:
        convs_arr = pdf["conv_id"].to_numpy()
        convs, starts = np.unique(convs_arr, return_index=True)
        lengths = np.diff(np.append(starts, len(pdf)))
        ts = (pdf[ts_col].astype("int64") // 10 ** 9).to_numpy()
        ts_chunks = encode_timestamps_grouped(ts, lengths)
        data = {
            "conv_id": convs,
            "n_points": lengths,
            "bytes_raw": lengths * 8 * (1 + len(value_cols)),
            "ts_chunk": ts_chunks,
        }
        total = np.array([len(c) for c in ts_chunks], dtype=np.int64)
        for c in value_cols:
            chunks = encode_values_grouped(
                pdf[c].to_numpy(dtype=np.float64), lengths
            )
            data[f"{c}_chunk"] = chunks
            total = total + np.array([len(x) for x in chunks])
        data["bytes_compressed"] = total
        return pd.DataFrame(data, columns=out_cols)

    def encode_stream(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        held: pd.DataFrame | None = None
        for pdf in batches:
            buf = (
                pdf
                if held is None or not len(held)
                else pd.concat([held, pdf], ignore_index=True)
            )
            if not len(buf):
                held = None
                continue
            # hold back the (possibly incomplete) trailing conversation
            last = buf["conv_id"].iloc[-1]
            cut = int(buf["conv_id"].searchsorted(last, side="left"))
            if cut > 0:
                yield encode_block(buf.iloc[:cut])
            held = buf.iloc[cut:].reset_index(drop=True)
        if held is not None and len(held):
            yield encode_block(held)

    # pin the exchange's partition count (see plans/pack.py: AQE would
    # coalesce a bare repartition("conv_id") to 1-2 partitions at this
    # shuffle size, serializing the encoders onto one Python worker)
    n_part = int(
        df_tier.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    prepared = (
        df_tier.select("conv_id", ts_col, *value_cols)
        .repartition(n_part, "conv_id")
        .sortWithinPartitions("conv_id", ts_col)
    )
    return prepared.mapInPandas(encode_stream, schema)


def decompress_tier(
    df_chunks: DataFrame, value_cols: Sequence[str]
) -> DataFrame:
    """Expand chunk rows back into the long tier layout."""
    value_cols = list(value_cols)
    schema = (
        "conv_id string, bucket_ts timestamp, "
        + ", ".join(f"{c} double" for c in value_cols)
    )

    def decode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk_cols = [f"{c}_chunk" for c in value_cols]
        for pdf in batches:
            if not len(pdf):
                continue
            # decode every chunk row, then build ONE frame per batch
            # (itertuples + column-wise concatenation — iterrows costs
            # ~100x more per row)
            convs, ts_parts = [], []
            val_parts: List[List[np.ndarray]] = [[] for _ in value_cols]
            for row in pdf[["conv_id", "ts_chunk"] + chunk_cols].itertuples(
                index=False
            ):
                ts = decode_timestamps(bytes(row[1]))
                convs.append(np.repeat(row[0], len(ts)))
                ts_parts.append(ts)
                for k in range(len(value_cols)):
                    val_parts[k].append(decode_values(bytes(row[2 + k])))
            data = {
                "conv_id": np.concatenate(convs),
                "bucket_ts": pd.to_datetime(
                    np.concatenate(ts_parts), unit="s"
                ),
            }
            for k, c in enumerate(value_cols):
                data[c] = np.concatenate(val_parts[k])
            yield pd.DataFrame(data)

    return df_chunks.mapInPandas(decode_rows, schema)
