"""Gap-fill: complete bucket grids + locf / bfill / mean / constant /
linear-interpolation fills — the DataFrame-level twin of the Dropout fill
modes and the Resize interpolation math.

Scale notes: the grid is generated per conversation with
``sequence(min_bucket, max_bucket)`` + ``explode`` — no driver loop, no
cross-conversation shuffle beyond the one groupBy; the join back to
observed buckets is an equi-join on ``(conv_id, bucket_ts)`` that AQE
plans as a sort-merge (both sides share the key).  Window fills partition
by ``conv_id`` and order by ``bucket_ts`` — one shuffle, reused by every
fill column.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIERS


def complete_grid(df_tier: DataFrame, tier: str) -> DataFrame:
    """Reindex each conversation onto its full tier bucket grid.

    Missing buckets appear as rows with NULL metric values plus an
    ``is_gap`` flag — the rectangular-series precondition for the
    parity kernels (the reference assumes regular sampling).
    """
    seconds = TIERS[tier][1]
    value_cols = [
        c for c in df_tier.columns if c not in ("conv_id", "bucket_ts")
    ]
    bounds = df_tier.groupBy("conv_id").agg(
        F.min("bucket_ts").alias("first_b"),
        F.max("bucket_ts").alias("last_b"),
    )
    grid = bounds.select(
        "conv_id",
        F.explode(
            F.sequence(
                "first_b",
                "last_b",
                F.expr(f"INTERVAL {seconds} SECONDS"),
            )
        ).alias("bucket_ts"),
    )
    joined = grid.join(df_tier, ["conv_id", "bucket_ts"], "left")
    return joined.withColumn(
        "is_gap", F.col(value_cols[0]).isNull() if value_cols else F.lit(False)
    )


def _series_window(ordered: bool = True) -> Window:
    w = Window.partitionBy("conv_id")
    return w.orderBy("bucket_ts") if ordered else w


def fill_locf(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Last-observation-carried-forward (the Dropout 'ffill' semantics)."""
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def fill_locf_ttl(
    df: DataFrame, cols: Iterable[str], ttl_seconds: int
) -> DataFrame:
    """LOCF with a staleness bound (Prometheus-style lookback delta).

    A gap bucket is filled from the last observation only while the
    observation is at most ``ttl_seconds`` old; beyond that the series
    is considered stale and the bucket stays NULL.  Same single window
    pass as :func:`fill_locf` — the carried value and the carried
    observation timestamp share one (conv_id, bucket_ts) sort, so the
    TTL costs no extra shuffle.
    """
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    ts_sec = F.unix_timestamp("bucket_ts")
    for c in cols:
        obs_ts = F.when(F.col(c).isNotNull(), ts_sec)
        last_v = F.last(c, ignorenulls=True).over(w)
        last_t = F.last(obs_ts, ignorenulls=True).over(w)
        # own observations are age 0; no prior observation => NULL age
        # => NULL out (never filled), matching the stale semantics
        df = df.withColumn(
            c, F.when(ts_sec - last_t <= F.lit(int(ttl_seconds)), last_v)
        )
    return df


def fill_bfill(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Next-observation-carried-backward (the Dropout 'bfill' semantics)."""
    w = _series_window().rowsBetween(0, Window.unboundedFollowing)
    for c in cols:
        df = df.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return df


def fill_mean(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Fill gaps with the per-conversation mean of observed values."""
    w = _series_window(ordered=False)
    for c in cols:
        df = df.withColumn(c, F.coalesce(c, F.avg(c).over(w)))
    return df


def fill_const(df: DataFrame, cols: Iterable[str], value) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.coalesce(c, F.lit(value)))
    return df


def fill_interpolate(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Linear interpolation between the neighbouring observed samples.

    Same two-point weighted blend as the Resize operator
    (tsaug_spark/operators/resize.py — reference resize.py:98-107):
    ``v = v_prev * (1 - w) + v_next * w`` with ``w`` the fractional
    position of the gap between its bracketing observations.  Leading /
    trailing gaps (no bracket on one side) fall back to the available
    side (locf / bfill).
    """
    w_back = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = _series_window().rowsBetween(0, Window.unboundedFollowing)
    ts_sec = F.unix_timestamp("bucket_ts")
    for c in cols:
        obs_ts = F.when(F.col(c).isNotNull(), ts_sec)
        # materialize the four window results once per column — inlining
        # them into the CASE expression would replicate each window
        # function several times inside the Window operator
        df = (
            df.withColumn(f"_pv_{c}", F.last(c, ignorenulls=True).over(w_back))
            .withColumn(f"_nv_{c}", F.first(c, ignorenulls=True).over(w_fwd))
            .withColumn(
                f"_pt_{c}", F.last(obs_ts, ignorenulls=True).over(w_back)
            )
            .withColumn(
                f"_nt_{c}", F.first(obs_ts, ignorenulls=True).over(w_fwd)
            )
        )
        prev_v, next_v = F.col(f"_pv_{c}"), F.col(f"_nv_{c}")
        prev_t, next_t = F.col(f"_pt_{c}"), F.col(f"_nt_{c}")
        frac = (ts_sec - prev_t) / (next_t - prev_t)
        interp = prev_v * (1 - frac) + next_v * frac
        df = df.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(
                prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
                interp,
            )
            .otherwise(F.coalesce(prev_v, next_v)),
        ).drop(f"_pv_{c}", f"_nv_{c}", f"_pt_{c}", f"_nt_{c}")
    return df
