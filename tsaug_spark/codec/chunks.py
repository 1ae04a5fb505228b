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
    """
    value_cols = list(value_cols)
    schema = (
        "conv_id string, n_points long, bytes_raw long, "
        "bytes_compressed long, ts_chunk binary, "
        + ", ".join(f"{c}_chunk binary" for c in value_cols)
    )

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = (pdf[ts_col].astype("int64") // 10 ** 9).to_numpy()
        row = {
            "conv_id": key[0],
            "n_points": len(pdf),
            "bytes_raw": int(len(pdf) * 8 * (1 + len(value_cols))),
        }
        ts_chunk = encode_timestamps(ts)
        total = len(ts_chunk)
        row["ts_chunk"] = ts_chunk
        for c in value_cols:
            chunk = encode_values(
                pdf[c].to_numpy(dtype=np.float64)
            )
            row[f"{c}_chunk"] = chunk
            total += len(chunk)
        row["bytes_compressed"] = total
        return pd.DataFrame(
            [row],
            columns=["conv_id", "n_points", "bytes_raw", "bytes_compressed",
                     "ts_chunk"] + [f"{c}_chunk" for c in value_cols],
        )

    return df_tier.groupBy("conv_id").applyInPandas(encode_group, schema)


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
        for pdf in batches:
            outs: List[pd.DataFrame] = []
            for _, row in pdf.iterrows():
                ts = decode_timestamps(bytes(row["ts_chunk"]))
                data = {
                    "conv_id": row["conv_id"],
                    "bucket_ts": pd.to_datetime(ts, unit="s"),
                }
                for c in value_cols:
                    data[c] = decode_values(bytes(row[f"{c}_chunk"]))
                outs.append(pd.DataFrame(data))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return df_chunks.mapInPandas(decode_rows, schema)
