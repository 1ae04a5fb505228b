"""Halo-chunked execution for windowed kernels on very long series.

A single pathological conversation (years of 1m buckets, 10^7+ rows)
would otherwise ride into one ``applyInPandas`` task (SURVEY.md §7.4 R6).
``convolve_chunked`` splits every series into aligned chunks of
``chunk_len`` buckets, ships each chunk with halo rows wide enough for
the window's reach, convolves per (conversation, chunk) in parallel, and
keeps only the chunk-owned outputs.  Reflect boundary handling applies
only at the true series edges — interior chunk edges see real halo data,
so the result is bit-identical to whole-series convolution (tested).

The halo duplication is the explode of at most ``(W-1)/chunk_len``
extra copies per row — <1% overhead for realistic windows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsaug_spark.functions.interpolate import convolve_reflect
from tsaug_spark.operators.pool import Pool


def convolve_chunked(
    df_long: DataFrame,
    taps: np.ndarray,
    value_cols: Sequence[str],
    chunk_len: int = 1024,
    idx_col: str = "bucket_idx",
) -> DataFrame:
    """Normalized windowed smoothing of arbitrarily long series.

    Output: (conv_id, bucket_idx, *value_cols) — same rows as input,
    values convolved with ``taps`` (reflect at series edges) and
    normalized by ``taps.sum()``, matching the Convolve operator with a
    deterministic window.
    """
    value_cols = list(value_cols)
    W = len(taps)
    center = W // 2 if W % 2 else W // 2 - 1
    reach_left, reach_right = center, W - 1 - center
    taps_arr = np.asarray(taps, dtype=np.float64)

    wp = Window.partitionBy("conv_id")
    with_t = df_long.withColumn("_T", F.max(idx_col).over(wp) + 1)

    # every row is needed by chunks floor((idx-reach_right)/L) ..
    # floor((idx+reach_left)/L); explode that (tiny) range
    idx = F.col(idx_col)
    first_chunk = F.greatest(
        F.floor((idx - reach_right) / chunk_len).cast("long"), F.lit(0)
    )
    last_chunk = F.least(
        F.floor((idx + reach_left) / chunk_len).cast("long"),
        F.floor((F.col("_T") - 1) / chunk_len).cast("long"),
    )
    exploded = with_t.withColumn(
        "_chunk", F.explode(F.sequence(first_chunk, last_chunk))
    )

    schema = (
        "conv_id string, bucket_idx int, "
        + ", ".join(f"{c} double" for c in value_cols)
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid, chunk = key[0], int(key[1])
        pdf = pdf.sort_values(idx_col)
        T = int(pdf["_T"].iloc[0])
        lo, hi = chunk * chunk_len, min((chunk + 1) * chunk_len, T)
        ids = pdf[idx_col].to_numpy()
        vals = pdf[value_cols].to_numpy(dtype=np.float64)

        # convolve_reflect pads the buffer symmetrically: at a true
        # series edge that IS the reflect semantics; at an interior
        # chunk edge it only corrupts outputs inside the halo, and
        # those rows are discarded below (dense-grid input required)
        own = (ids >= lo) & (ids < hi)
        smoothed = convolve_reflect(vals.T, taps_arr) / taps_arr.sum()
        out = pd.DataFrame(smoothed.T[own], columns=value_cols)
        out.insert(0, "bucket_idx", ids[own].astype(np.int32))
        out.insert(0, "conv_id", cid)
        return out

    return exploded.groupBy("conv_id", "_chunk").applyInPandas(
        kernel, schema
    )


def pool_chunked(
    df_long: DataFrame,
    kind: str,
    size: int,
    value_cols: Sequence[str],
    chunk_len: int = 1024,
    idx_col: str = "bucket_idx",
) -> DataFrame:
    """Block-aligned chunked Pool for arbitrarily long series.

    ``chunk_len`` is rounded UP to a multiple of ``size``, so no pool
    block ever crosses a chunk boundary; the trailing partial block
    (pooled as one unit — reference pool.py:126-181 semantics) cannot
    contain a boundary either, because boundaries are multiples of
    ``size`` and the tail [size*floor(T/size), T) holds no interior
    multiple of ``size``.  Each (conversation, chunk) task therefore
    pools its segment independently with the SAME ``Pool.pool_rows``
    kernel and the result is bit-identical to whole-series pooling —
    with ZERO row duplication (unlike the convolve halo, pooling needs
    no neighbor data once chunks are block-aligned).

    Requires a dense per-series grid on ``idx_col`` (same contract as
    ``convolve_chunked``).  Scalar ``size`` only: the chunk alignment
    is a property of the block size, so the randomized-size variant
    must ride the whole-series path.
    """
    if not isinstance(size, int) or size < 1:
        raise ValueError("pool_chunked requires a scalar size >= 1")
    value_cols = list(value_cols)
    L = -(-chunk_len // size) * size  # ceil to a block multiple

    chunked = df_long.withColumn(
        "_chunk", F.floor(F.col(idx_col) / L).cast("long")
    )

    schema = (
        "conv_id string, bucket_idx int, "
        + ", ".join(f"{c} double" for c in value_cols)
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = key[0]
        pdf = pdf.sort_values(idx_col)
        ids = pdf[idx_col].to_numpy()
        # rows = channels: pool_rows pools each (R, T) row blockwise.
        # A final chunk shorter than ``size`` is entirely the series
        # tail — one pool unit — which equals pool_rows with block
        # size = segment length (one full block, same reduction order).
        flat = pdf[value_cols].to_numpy(dtype=np.float64).T.copy()
        block = np.full(flat.shape[0], min(size, flat.shape[1]))
        pooled = Pool.pool_rows(flat, block, kind)
        out = pd.DataFrame(pooled.T, columns=value_cols)
        out.insert(0, "bucket_idx", ids.astype(np.int32))
        out.insert(0, "conv_id", cid)
        return out

    return chunked.groupBy("conv_id", "_chunk").applyInPandas(
        kernel, schema
    )
