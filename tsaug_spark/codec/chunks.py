"""Chunk-column integration: tier rows <-> Gorilla-compressed chunks.

A *chunk row* packs one conversation's whole tier series into opaque
``binary`` columns — delta-of-delta timestamps + one Gorilla value chunk
per metric channel — the storage layout of the retention tiers.  Encoding
and decoding both run over raw Arrow batches (``mapInArrow`` + NumPy
bit-packing — no per-row Python and no pandas materialization; conv_id
strings move via Arrow ``take`` without ever becoming Python objects).

Scale: chunk size is bounded by tier width (see plans/pack.py) and the
chunk table is ~1000x smaller than the long tier, so downstream joins on
it broadcast.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import DataFrame

from .gorilla import decode_timestamps, decode_values


def compress_tier(
    df_tier: DataFrame,
    value_cols: Sequence[str],
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Compress a long tier DataFrame into one chunk row per conversation.

    Output: conv_id, n_points, bytes_raw, bytes_compressed, ts_chunk,
    and a ``<col>_chunk`` binary per metric channel.

    Implementation: repartition + sortWithinPartitions co-locates and
    orders each conversation, then ``mapInArrow`` streams raw Arrow
    batches through the *grouped* Gorilla encoders — one vectorized
    bit-assembly pass per batch instead of per conversation (tier
    chunks are small, so per-group overhead would dominate).  A
    carry-over buffer stitches conversations that span batch
    boundaries.
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

    import pyarrow as pa
    import pyarrow.compute as pc

    def encode_block(tbl: "pa.Table") -> "pa.RecordBatch":
        conv = tbl.column("conv_id").combine_chunks()
        n = tbl.num_rows
        # sorted input: boundaries are a linear Arrow-side comparison
        # (the pandas formulation paid np.unique over object strings)
        if n > 1:
            neq = pc.not_equal(
                conv.slice(1), conv.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        else:
            starts = np.array([0], dtype=np.int64)
        lengths = np.diff(np.append(starts, n))
        ts = (
            tbl.column(ts_col)
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 10 ** 6  # arrow timestamps are microseconds
        )
        ts_chunks = encode_timestamps_grouped(ts, lengths)
        total = np.array([len(c) for c in ts_chunks], dtype=np.int64)
        arrays = {
            "conv_id": pc.take(conv, pa.array(starts, type=pa.int64())),
            "n_points": pa.array(lengths.astype(np.int64)),
            "bytes_raw": pa.array(
                (lengths * 8 * (1 + len(value_cols))).astype(np.int64)
            ),
            "ts_chunk": pa.array(ts_chunks, type=pa.binary()),
        }
        for c in value_cols:
            chunks = encode_values_grouped(
                tbl.column(c)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64, copy=False),
                lengths,
            )
            arrays[f"{c}_chunk"] = pa.array(chunks, type=pa.binary())
            total = total + np.array([len(x) for x in chunks])
        arrays["bytes_compressed"] = pa.array(total)
        return pa.RecordBatch.from_arrays(
            [arrays[c] for c in out_cols], names=out_cols
        )

    def encode_stream(batches):
        held: "pa.Table | None" = None
        for rb in batches:
            t = pa.Table.from_batches([rb])
            buf = (
                t
                if held is None or held.num_rows == 0
                else pa.concat_tables([held, t]).combine_chunks()
            )
            n = buf.num_rows
            if n == 0:
                held = None
                continue
            # hold back the (possibly incomplete) trailing conversation
            conv = buf.column("conv_id").combine_chunks()
            if n > 1:
                neq = pc.not_equal(
                    conv.slice(1), conv.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
                bounds = np.flatnonzero(neq) + 1
                cut = int(bounds[-1]) if len(bounds) else 0
            else:
                cut = 0
            if cut > 0:
                yield encode_block(buf.slice(0, cut))
            held = buf.slice(cut)
        if held is not None and held.num_rows:
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
    return prepared.mapInArrow(encode_stream, schema)


def decompress_tier(
    df_chunks: DataFrame, value_cols: Sequence[str]
) -> DataFrame:
    """Expand chunk rows back into the long tier layout."""
    value_cols = list(value_cols)
    schema = (
        "conv_id string, bucket_ts timestamp, "
        + ", ".join(f"{c} double" for c in value_cols)
    )

    import pyarrow as pa
    import pyarrow.compute as pc

    names = ["conv_id", "bucket_ts", *value_cols]

    def decode_rows(batches):
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            n = tbl.num_rows
            if n == 0:
                continue
            conv = tbl.column("conv_id").combine_chunks()
            ts_col_a = tbl.column("ts_chunk").combine_chunks()
            val_cols_a = [
                tbl.column(f"{c}_chunk").combine_chunks()
                for c in value_cols
            ]
            # one decoder call per chunk row (a chunk row IS a whole
            # conversation), then one concatenated output batch — the
            # conv strings fan out via Arrow take, never via Python
            ts_parts: List[np.ndarray] = []
            val_parts: List[List[np.ndarray]] = [[] for _ in value_cols]
            lens = np.empty(n, dtype=np.int64)
            for i in range(n):
                ts = decode_timestamps(ts_col_a[i].as_py())
                ts_parts.append(ts)
                lens[i] = len(ts)
                for k in range(len(value_cols)):
                    val_parts[k].append(
                        decode_values(val_cols_a[k][i].as_py())
                    )
            idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            arrays = [
                pc.take(conv, pa.array(idx)),
                pa.array(
                    np.concatenate(ts_parts).astype(np.int64) * 10 ** 6,
                    type=pa.int64(),
                ).cast(pa.timestamp("us")),
                *[
                    pa.array(np.concatenate(val_parts[k]))
                    for k in range(len(value_cols))
                ],
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df_chunks.mapInArrow(decode_rows, schema)
