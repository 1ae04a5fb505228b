"""Gauge/counter metric transforms over irregular samples.

The rollup cascade (plans/rollup.py) treats every channel as an
algebraic sum/count aggregate.  Production time-series stores add a
second family of bucket transforms whose semantics depend on the
*spacing* of samples inside a bucket, not just their values — the
TimescaleDB toolkit's ``time_weight``/``heartbeat_agg`` and PromQL's
``rate``/``increase`` are the canonical set.  This module implements
that family as pure Catalyst plans:

* :func:`time_weighted_avg` — trapezoidal time-weighted mean per bucket
  (irregular gauges: a sample that holds for 50 minutes counts 50x a
  sample that holds for one);
* :func:`counter_rate` — monotone-counter increase/rate per bucket with
  PromQL reset semantics (a drop in the raw counter is a restart: the
  post-reset sample contributes its full value, not a negative delta);
* :func:`m4_downsample` — the M4 visualization aggregation (Jugel et
  al., VLDB 2014): per pixel-bucket keep min / max / first / last, the
  four points that make a width-w line plot pixel-exact;
* :func:`heartbeat_uptime` — bucket-local liveness ratio: each sample
  asserts liveness for ``heartbeat`` seconds (clipped at the next
  sample and the bucket end), uptime = covered seconds / bucket length.

Scale notes (10^12 turns): every transform here is ONE shuffle — either
a (key, bucket) hash aggregate or a (key) ordered window whose state is
a single lag/lead row.  No UDFs, no driver collects; map-side partial
aggregation applies to the M4 min/max, and the lag/lead windows carry
O(1) state per key so hot keys cost time, not memory.  All four are
sum-/merge-reaggregable per bucket, so they cascade through retention
tiers the same way the algebraic rollups do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsaug_spark.plans.rollup import TIERS, bucket_epoch_s


def _micros(ts_col: str) -> F.Column:
    # testdata timestamps are TIMESTAMP_NTZ; unix_micros requires an
    # instant, and under the engine's fixed UTC session timezone the
    # NTZ -> TIMESTAMP cast is epoch-preserving (session.py pins UTC).
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


# tier bucketing shared with the rollup cascade (one definition, one
# oracle form: floor(epoch(ts)/sec)*sec)
_bucket_s = bucket_epoch_s


def time_weighted_avg(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Trapezoidal time-weighted average per (key, bucket).

    For consecutive samples (t_i, v_i), (t_{i+1}, v_{i+1}) inside one
    bucket the segment contributes area (v_i + v_{i+1})/2 * (t_{i+1} -
    t_i); the bucket's TWA is total area / (t_last - t_first).  A
    bucket with a single sample (or zero elapsed time) degrades to the
    plain mean — matching the TimescaleDB ``time_weight('linear')``
    edge case.

    Output: key, bucket_s, n_samples, twa (double).

    Plan shape: one lead() window over (key, bucket) then one hash
    aggregate on the same key — Catalyst plans both over a single
    Exchange because the window partition keys prefix the groupBy keys.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        (_micros(ts_col) / F.lit(1e6)).alias("t"),
        F.col(order_col).alias("o") if order_col else F.lit(0).alias("o"),
        F.col(value_col).cast("double").alias("v"),
    )
    # order_col breaks duplicate-timestamp ties; without it, tied
    # samples make the trapezoid chain order-dependent (zero-width
    # segments are fine, but the NEIGHBORING segments' endpoint values
    # depend on which tied row sorts first)
    w = Window.partitionBy("key", "bucket_s").orderBy("t", "o")
    seg = base.select(
        "key",
        "bucket_s",
        "v",
        (
            (F.lead("v").over(w) + F.col("v"))
            / F.lit(2.0)
            * (F.lead("t").over(w) - F.col("t"))
        ).alias("area"),
        (F.lead("t").over(w) - F.col("t")).alias("span"),
    )
    return (
        seg.groupBy("key", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.when(
                F.coalesce(F.sum("span"), F.lit(0.0)) > 0,
                F.sum("area") / F.sum("span"),
            )
            .otherwise(F.avg("v"))
            .alias("twa"),
        )
    )


def twa_partial(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Mergeable partial state for the time-weighted average — the
    continuous-aggregate form of :func:`time_weighted_avg`.

    Per (key, fine bucket) this keeps, besides the within-bucket
    trapezoid sums, the BOUNDARY samples (first/last timestamp and
    value): merging consecutive buckets to a coarser tier then only
    needs the bridge trapezoid between bucket i's last sample and
    bucket i+1's first sample — which is exactly the segment a direct
    coarse computation would integrate.  This is how TimescaleDB's
    ``time_weight`` aggregate rolls up through continuous aggregates.

    Output: key, bucket_s, n_samples, sum_v, area, span,
    t_first, v_first, t_last, v_last.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        (_micros(ts_col) / F.lit(1e6)).alias("t"),
        F.col(order_col).alias("o") if order_col else F.lit(0).alias("o"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = Window.partitionBy("key", "bucket_s").orderBy("t", "o")
    seg = base.select(
        "key",
        "bucket_s",
        "t",
        "o",
        "v",
        (
            (F.lead("v").over(w) + F.col("v"))
            / F.lit(2.0)
            * (F.lead("t").over(w) - F.col("t"))
        ).alias("area"),
        (F.lead("t").over(w) - F.col("t")).alias("span"),
    )
    return seg.groupBy("key", "bucket_s").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("v").alias("sum_v"),
        F.coalesce(F.sum("area"), F.lit(0.0)).alias("area"),
        F.coalesce(F.sum("span"), F.lit(0.0)).alias("span"),
        F.min("t").alias("t_first"),
        F.min_by("v", F.struct("t", "o")).alias("v_first"),
        F.max("t").alias("t_last"),
        F.max_by("v", F.struct("t", "o")).alias("v_last"),
    )


def twa_merge(
    partial: DataFrame,
    to_tier: str,
) -> DataFrame:
    """Re-aggregate :func:`twa_partial` rows to a coarser tier.

    Bridge segments between consecutive fine buckets inside the same
    coarse bucket contribute (v_last_i + v_first_{i+1})/2 *
    (t_first_{i+1} - t_last_i) — after which the merged TWA equals the
    direct coarse computation trapezoid-for-trapezoid (the oracle for
    ``twa_cascade_1d`` is literally the direct daily SQL).  Zero total
    span degrades to the plain mean, same as the direct form.

    One lead() window + one hash aggregate, both on the coarse key —
    a single Exchange, so the cascade costs the same as the algebraic
    tier rollups.
    """
    sec = TIERS[to_tier][1]
    base = partial.withColumn(
        "coarse_s",
        F.floor(F.col("bucket_s") / F.lit(sec)).cast("long")
        * F.lit(sec),
    )
    w = Window.partitionBy("key", "coarse_s").orderBy("bucket_s")
    bridged = base.select(
        "key",
        "coarse_s",
        "n_samples",
        "sum_v",
        "span",
        "area",
        (
            (F.lead("v_first").over(w) + F.col("v_last"))
            / F.lit(2.0)
            * (F.lead("t_first").over(w) - F.col("t_last"))
        ).alias("bridge_area"),
        (F.lead("t_first").over(w) - F.col("t_last")).alias(
            "bridge_span"
        ),
    )
    tot_area = F.sum("area") + F.coalesce(
        F.sum("bridge_area"), F.lit(0.0)
    )
    tot_span = F.sum("span") + F.coalesce(
        F.sum("bridge_span"), F.lit(0.0)
    )
    return bridged.groupBy("key", F.col("coarse_s").alias("bucket_s")).agg(
        F.sum("n_samples").alias("n_samples"),
        F.when(tot_span > 0, tot_area / tot_span)
        .otherwise(F.sum("sum_v") / F.sum("n_samples"))
        .alias("twa"),
    )


def hist_partial(
    df: DataFrame,
    tier: str = "1h",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 64,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-bin histogram sketch per (key, bucket) — the mergeable
    quantile state for percentile cascades (the role t-digest/KLL play
    in TimescaleDB/Druid, in the deterministic equi-width form that a
    SQL oracle can replay exactly).

    Values are clamped into [lo, hi) — estimates are only within one
    bin width of exact for values INSIDE the range, so size [lo, hi)
    to the data (a p95 above ``hi`` saturates at the last bin edge);
    bin width w = (hi-lo)/n_bins;
    the sketch is LONG format (key, bucket_s, bin, cnt) so merging to
    a coarser tier is a plain sum — one hash aggregate, map-side
    combinable, and per-bucket state is at most ``n_bins`` rows.
    Quantile estimates from the sketch are within one bin width of the
    exact value (gated in tests).
    """
    w = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(w)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(
            F.col(key_col).alias("key"),
            _bucket_s(ts_col, tier),
            F.col(value_col).cast("double").alias("v"),
        )
        .withColumn("bin", bin_col)
        .groupBy("key", "bucket_s", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(partial: DataFrame, to_tier: str) -> DataFrame:
    """Merge histogram sketches to a coarser tier: elementwise count
    sum — exactly equal to building the coarse histogram directly,
    since binning is per-sample."""
    sec = TIERS[to_tier][1]
    coarse = F.floor(F.col("bucket_s") / F.lit(sec)).cast(
        "long"
    ) * F.lit(sec)
    return (
        partial.groupBy("key", coarse.alias("bucket_s"), "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_percentile(
    hist: DataFrame,
    qs: list[float],
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 64,
) -> DataFrame:
    """Interpolated percentile estimates from a histogram sketch.

    For each q: target = q * total; the estimate sits in the first bin
    whose cumulative count reaches the target, linearly interpolated
    inside the bin: est = lo + w * (bin + (target - cum_prev) / cnt).
    Every float op replays identically in SQL (counts are exact
    integers, one shared expression) so the oracle compares raw
    doubles.

    Output: key, bucket_s, q, est.
    """
    w = (hi - lo) / n_bins
    win = Window.partitionBy("key", "bucket_s").orderBy("bin")
    tot = Window.partitionBy("key", "bucket_s")
    h = hist.select(
        "key",
        "bucket_s",
        "bin",
        "cnt",
        F.sum("cnt").over(win).alias("cum"),
        F.sum("cnt").over(tot).alias("total"),
    )
    qdf = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    sel = (
        h.select("*", qdf)
        .filter(
            F.col("cum") >= F.col("q") * F.col("total")
        )
        .groupBy("key", "bucket_s", "q")
        .agg(
            F.min_by(
                F.struct("bin", "cnt", "cum"), "bin"
            ).alias("s"),
            F.first("total").alias("total"),
        )
    )
    est = F.lit(lo) + F.lit(w) * (
        F.col("s.bin")
        + (F.col("q") * F.col("total") - (F.col("s.cum") - F.col("s.cnt")))
        / F.col("s.cnt")
    )
    return sel.select("key", "bucket_s", "q", est.alias("est"))


def m4_partial(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """:func:`m4_downsample` plus the merge keys (the (ts, order)
    structs at which vfirst/vlast were taken), making M4 a mergeable
    sketch: coarser tiers re-aggregate exactly (``m4_merge``)."""
    ordkey = F.struct(
        F.col(ts_col).alias("ts"), F.col(order_col).alias("o")
    )
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        ordkey.alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key", "bucket_s").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.min_by("v", "ord").alias("vfirst"),
        F.max_by("v", "ord").alias("vlast"),
        F.min("ord").alias("ord_first"),
        F.max("ord").alias("ord_last"),
    )


def m4_merge(partial: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate :func:`m4_partial` rows to a coarser tier — every
    component is algebraic (sum/min/max/min_by/max_by), so this is one
    partial+final hash aggregate and matches the direct coarse M4
    bit-for-bit (``m4_cascade_1d``'s oracle is the direct daily SQL)."""
    sec = TIERS[to_tier][1]
    coarse = F.floor(F.col("bucket_s") / F.lit(sec)).cast(
        "long"
    ) * F.lit(sec)
    return (
        partial.groupBy("key", coarse.alias("bucket_s"))
        .agg(
            F.sum("n").alias("n"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.min_by("vfirst", "ord_first").alias("vfirst"),
            F.max_by("vlast", "ord_last").alias("vlast"),
            # keep the merge keys so merged rows are themselves
            # mergeable (1m -> 1h -> 1d chains without re-partialing)
            F.min("ord_first").alias("ord_first"),
            F.max("ord_last").alias("ord_last"),
        )
    )


def counter_rate(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """PromQL-style per-bucket ``increase`` and ``rate`` for counters.

    Per key ordered by time, each sample's contribution is its delta
    from the previous sample — unless the counter went DOWN, which is a
    reset: the sample then contributes its full value (the counter
    restarted from zero and climbed back).  The first sample of a key
    contributes nothing (no baseline).  Contributions are summed per
    tumbling bucket; ``rate_ps`` divides by the bucket length.

    Deltas are computed against the previous sample even across bucket
    boundaries (PromQL semantics: the lookbehind window sees the
    previous scrape), so a bucket's increase accounts for the rise
    since the last pre-bucket sample.

    Pass ``order_col`` whenever timestamps can tie within a key: with
    the default constant tiebreaker, tied samples (e.g. 100 then 5 at
    the same instant) make contrib/resets order-dependent.

    Output: key, bucket_s, n_samples, resets, increase, rate_ps.
    """
    sec = TIERS[tier][1]
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        _micros(ts_col).alias("t"),
        F.col(order_col).alias("o") if order_col else F.lit(0).alias("o"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = Window.partitionBy("key").orderBy("t", "o")
    delta = base.withColumn("prev_v", F.lag("v").over(w)).select(
        "key",
        "bucket_s",
        F.when(F.col("prev_v").isNull(), F.lit(0.0))
        .when(F.col("v") < F.col("prev_v"), F.col("v"))
        .otherwise(F.col("v") - F.col("prev_v"))
        .alias("contrib"),
        (F.col("v") < F.col("prev_v")).cast("int").alias("is_reset"),
    )
    return (
        delta.groupBy("key", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.coalesce(F.sum("is_reset"), F.lit(0)).alias("resets"),
            F.sum("contrib").alias("increase"),
            (F.sum("contrib") / F.lit(float(sec))).alias("rate_ps"),
        )
    )


def m4_downsample(
    df: DataFrame,
    tier: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """M4 aggregation: per (key, pixel-bucket) the min, max, first and
    last values — the lossless downsampling for line visualization
    (Jugel et al., "M4: A Visualization-Oriented Time Series Data
    Aggregation", VLDB 2014).

    ``order_col`` breaks timestamp ties deterministically (first/last
    are defined by (ts, order_col) lexicographic order).

    Output: key, bucket_s, n, vmin, vmax, vfirst, vlast.

    Plan shape: a single hash aggregate — min/max are algebraic and
    min_by/max_by on the (ts, order) struct are too, so the map side
    emits one partial row per (key, bucket) and hot keys never skew the
    shuffle.
    """
    ordkey = F.struct(
        F.col(ts_col).alias("ts"), F.col(order_col).alias("o")
    )
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        ordkey.alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return (
        base.groupBy("key", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.min_by("v", "ord").alias("vfirst"),
            F.max_by("v", "ord").alias("vlast"),
        )
    )


def ewma(
    df: DataFrame,
    alpha: float,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """Exponentially-weighted moving average per series.

    The recurrence y_0 = x_0, y_t = alpha*x_t + (1-alpha)*y_{t-1}
    (pandas ``ewm(alpha, adjust=False)``) is inherently sequential, so
    it runs as a grouped Arrow kernel: one hash partition on the series
    key, then the vectorized pandas C path per group — no per-row
    Python.  Like Drift/TimeWarp, a series must fit one executor's
    Arrow batch (documented series-length cap, README §limits); the
    windowed transforms in this module have no such cap.

    Output: key, order, value, ewma — input rows preserved.
    """
    import pandas as pd  # noqa: F401  (documents the kernel dependency)

    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, ord long, v double, "
        "ewma double"
    )

    def _kernel(pdf):
        pdf = pdf.sort_values("ord")
        pdf["ewma"] = (
            pdf["v"].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf[["key", "ord", "v", "ewma"]]

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def rolling_zscore(
    hourly: DataFrame,
    window: int = 24,
    threshold: float = 3.0,
    key_col: str = "user_id",
    order_col: str = "bucket_s",
    value_col: str = "cnt",
) -> DataFrame:
    """Flag buckets whose integer count deviates more than ``threshold``
    sigma from the trailing-``window``-bucket mean.

    Mean and variance come from EXACT integer window sums (S = sum cnt,
    Q = sum cnt^2 — exact in double for realistic counts), so the z
    expression — and therefore the flagged ROW SET, where a borderline
    value could otherwise flip between engines — replays bit-identically
    in SQL.  Only full windows are scored; zero-variance windows are
    skipped.

    Output: key, ord, v, z — flagged rows only.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    g = hourly.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("ord"),
        F.col(value_col).alias("v"),
        F.count(F.lit(1)).over(w).alias("nw"),
        F.sum(value_col).over(w).alias("s1"),
        F.sum(F.col(value_col) * F.col(value_col)).over(w).alias("s2"),
    ).filter(F.col("nw") == window)
    dn = F.lit(float(window))
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / dn
    ) / F.lit(float(window - 1))
    z = (F.col("v") - F.col("s1") / dn) / F.sqrt(var)
    return (
        g.filter(var > 0)
        .select("key", "ord", "v", z.alias("z"))
        .filter(F.abs("z") > F.lit(float(threshold)))
    )


def lttb(
    df: DataFrame,
    n_out: int,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series
    (Steinarsson 2013): keep the first and last points; split the
    interior into ``n_out - 2`` buckets by floor scaling
    (bucket(idx) = ((idx-1)*(n_out-2)) // (T-2) + 1); from each bucket
    keep the point forming the largest triangle with the PREVIOUSLY
    SELECTED point and the next bucket's mean (the global last point
    for the final interior bucket).  Series with T <= n_out pass
    through unchanged.

    The selection recurrence is sequential per series, so this runs as
    a grouped Arrow kernel (one hash partition on the key; same
    series-length cap policy as Drift/TimeWarp).  Every float op is
    written to replay exactly in SQL — bucket means are LEFT-FOLD sums
    (np.cumsum, == DuckDB list_aggregate 'sum'), the area expression
    keeps one operand order, and argmax takes the first maximum — so
    the recursive-CTE oracle (`lttb_48to12`) matches raw doubles with
    no rounding.

    Output: key, ord, v — the selected rows only.
    """
    import numpy as np

    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, ord long, v double"
    )

    def _kernel(pdf):
        pdf = pdf.sort_values("ord")
        y = pdf["v"].to_numpy(dtype=float)
        T = len(y)
        if T <= n_out:
            return pdf[["key", "ord", "v"]]
        # x = the actual order values (not positions): series with
        # gaps in order_col keep true triangle geometry.  Buckets stay
        # equal-COUNT (standard LTTB), only areas/means use real x.
        x = pdf["ord"].to_numpy(dtype=float)
        nb = n_out - 2
        bkt = ((np.arange(1, T - 1) - 1) * nb) // (T - 2) + 1
        sel = [0]
        for k in range(1, nb + 1):
            members = np.nonzero(bkt == k)[0] + 1
            if k == nb:
                ax, ay = x[T - 1], y[T - 1]
            else:
                nxt = np.nonzero(bkt == k + 1)[0] + 1
                # left-fold mean (cumsum is sequential) == the SQL
                # list_aggregate('sum') fold — NOT np.mean's pairwise
                ax = x[nxt].cumsum()[-1] / len(nxt)
                ay = y[nxt].cumsum()[-1] / len(nxt)
            sx, sy = x[sel[-1]], y[sel[-1]]
            xs, ys = x[members], y[members]
            areas = np.abs(
                (sx - ax) * (ys - sy) - (sx - xs) * (ay - sy)
            ) * 0.5
            sel.append(int(members[int(np.argmax(areas))]))
        sel.append(T - 1)
        return pdf.iloc[sel][["key", "ord", "v"]]

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def heartbeat_uptime(
    df: DataFrame,
    tier: str = "1h",
    heartbeat: int = 300,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Bucket-local liveness ratio from heartbeat samples.

    Each sample asserts the key was alive for ``heartbeat`` seconds,
    clipped at the next sample in the same bucket and at the bucket
    end; covered seconds never double-count overlap because equal-width
    intervals sorted by start can only overlap their immediate
    successor.  ``uptime = covered / bucket_seconds``.

    This is the *bucket-local* variant (liveness does not carry across
    bucket boundaries) — the cheap form that needs only a lead() within
    (key, bucket).  The carry-across form is a gap-fill problem and is
    served by plans/gapfill.py.

    Output: key, bucket_s, n_beats, covered_s, uptime.
    """
    sec = TIERS[tier][1]
    w = Window.partitionBy("key", "bucket_s").orderBy("t_us")
    base = (
        df.select(
            F.col(key_col).alias("key"),
            _bucket_s(ts_col, tier),
            _micros(ts_col).alias("t_us"),
        )
        # duplicate-timestamp dedup via lag in the SAME window
        # partitioning (not .distinct(), which would add a second
        # Exchange on (key, bucket, t)); the follow-up lead() reuses
        # the partitioning so the whole transform is one shuffle.
        .withColumn("dup", F.lag("t_us").over(w) == F.col("t_us"))
        .filter(~F.coalesce("dup", F.lit(False)))
    )
    bucket_end_us = (F.col("bucket_s") + F.lit(sec)) * F.lit(1_000_000)
    seg = base.select(
        "key",
        "bucket_s",
        F.least(
            F.coalesce(
                F.lead("t_us").over(w) - F.col("t_us"),
                F.lit(1 << 62),
            ),
            F.lit(heartbeat * 1_000_000),
            bucket_end_us - F.col("t_us"),
        ).alias("covered_us"),
    )
    return (
        seg.groupBy("key", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_beats"),
            (F.sum("covered_us") / F.lit(1e6)).alias("covered_s"),
            (F.sum("covered_us") / F.lit(sec * 1e6)).alias("uptime"),
        )
    )


def _dense_count_series(
    df: DataFrame,
    tier: str,
    key_col: str,
    ts_col: str,
    cat: bool = False,
) -> DataFrame:
    """Shared dense-series builder: each key's event count per
    ``tier`` bucket on the COMPLETE global [min, max] grid,
    zero-filled — the contract autocorr/Mann-Kendall/burstiness/
    correlation-matrix/seasonal-anomaly all share (one definition, one
    set of edge-case semantics).

    Output columns: key, lo (the global grid origin), bucket_s,
    x (int64 count).
    """
    sec = TIERS[tier][1]
    base = df.select(
        F.col(key_col).alias("key"), _bucket_s(ts_col, tier)
    )
    counts = base.groupBy("key", "bucket_s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bounds = base.agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            "lo",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(sec))
            ).alias("bucket_s"),
        )
    )
    return grid.join(counts, ["key", "bucket_s"], "left").select(
        "key",
        "lo",
        "bucket_s",
        F.coalesce("cnt", F.lit(0).cast("long")).alias("x"),
    )


def autocorr_lag1(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Lag-1 autocorrelation of each key's bucket-count series —
    the basic seasonality/burstiness diagnostic (an ACF(1) near 1 means
    smooth load; near 0, Poisson-like arrivals; negative, alternation).

    The series is each key's event count per ``tier`` bucket on the
    COMPLETE global [min, max] bucket grid, zero-filled — lag-1 is only
    well-defined on a dense series, and the zero-filled form is what
    monitoring stores (PromQL ``absent``-aware functions) operate on.

    Oracle-exactness: counts are exact integers, so n, Σx, Σy, Σxy,
    Σx², Σy² are order-independent integer sums; the correlation is ONE
    shared float expression over them:

        acf1 = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))

    which replays bit-identically in DuckDB (the exact-integer-sums
    pattern that made rolling_zscore's flag set deterministic).  A
    zero-variance side yields NULL via NULLIF, both engines.

    Scale: one count aggregate, one grid join, one per-key window whose
    state is a single lead row, one per-key aggregate.  The dense grid
    is keys × buckets rows — bounded by retention (e.g. 30 d of hourly
    buckets = 720/key), not by event volume.
    """
    w = Window.partitionBy("key").orderBy("bucket_s")
    series = (
        _dense_count_series(df, tier, key_col, ts_col)
        .withColumn("y", F.lead("x").over(w))
        .filter(F.col("y").isNotNull())
    )
    s = series.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "key", (num / F.nullif(den, F.lit(0.0))).alias("acf1")
    )


def seasonal_profile(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Hour-of-day seasonal profile: each key's mean event count per
    hour-of-day slot across the table's day span — the baseline a
    deseasonalized anomaly rule subtracts before flagging.

    The mean is over ALL days in the global [min, max] day span
    (zero-filled semantics: a day with no events still counts), so it
    is one exact integer count divided by one exact integer day count
    — a single shared float division that replays bit-identically in
    the oracle.  Days at the span edges count fully even if partially
    observed; the profile is a calendar baseline, not a coverage
    average.

    Output: key, hod (0-23), n_events, n_days, mean_cnt.
    """
    day = (
        F.floor(F.unix_timestamp(ts_col) / F.lit(86400)) * F.lit(86400)
    ).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        day.alias("day_s"),
        F.hour(ts_col).alias("hod"),
    )
    bounds = base.agg(
        (
            (F.max("day_s") - F.min("day_s")) / F.lit(86400) + F.lit(1)
        )
        .cast("long")
        .alias("n_days")
    )
    return (
        base.groupBy("key", "hod")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            "hod",
            "n_events",
            "n_days",
            (
                F.col("n_events").cast("double")
                / F.col("n_days").cast("double")
            ).alias("mean_cnt"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Offline CUSUM changepoint locator: for each key, the bucket
    where the cumulative deviation from the series mean peaks —
    argmax_t |sum_{i<=t}(x_i - mean)| over the zero-filled bucket grid.
    A level shift at time T makes |C_t| peak at T; a stationary series
    peaks nowhere in particular with small magnitude.

    Determinism is the whole design: with n buckets and total S, the
    statistic scales to C'_t = n * prefix_t - t * S — EXACT integers —
    so the argmax (and its tie-break: earliest bucket) is decided on
    integer comparisons and replays bit-identically in SQL.  The
    reported ``cusum`` is C'_t / n, one shared float division.

    Output: key, bucket_s (peak location), cusum (signed peak value),
    n (series length).
    """
    sec = TIERS[tier][1]
    base = df.select(
        F.col(key_col).alias("key"), _bucket_s(ts_col, tier)
    )
    counts = base.groupBy("key", "bucket_s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bounds = base.agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(sec))
            ).alias("bucket_s"),
        )
    )
    w = Window.partitionBy("key").orderBy("bucket_s")
    wtot = Window.partitionBy("key")
    series = (
        grid.join(counts, ["key", "bucket_s"], "left")
        .withColumn("x", F.coalesce("cnt", F.lit(0).cast("long")))
        .withColumn(
            "prefix",
            F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("t", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wtot))
        .withColumn("s", F.sum("x").over(wtot))
        .withColumn(
            "c_scaled",
            F.col("n") * F.col("prefix") - F.col("t") * F.col("s"),
        )
    )
    pick = Window.partitionBy("key").orderBy(
        F.abs(F.col("c_scaled")).desc(), F.col("bucket_s").asc()
    )
    return (
        series.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "key",
            "bucket_s",
            (
                F.col("c_scaled").cast("double")
                / F.col("n").cast("double")
            ).alias("cusum"),
            "n",
        )
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classical additive seasonal decomposition (statsmodels
    ``seasonal_decompose``, period = 24 h) of each key's hourly event
    counts on the zero-filled grid over the table's global day span:
    ``cnt = trend + seasonal + resid``.

    * **trend**: centered 2x24 moving average — the standard
      even-period form, computed as the sum of two 24-wide integer
      window sums divided by 48; NULL at the 12/11 edge rows.
    * **seasonal**: phase (hour-of-day) means of the detrended series
      over INTERIOR COMPLETE days only (day 1 .. D-2), so every phase
      averages exactly D-2 rows, then centered to sum to zero.  Using
      ``detrended = cnt - s48/48``, the phase mean folds to
      ``(48*sum(cnt) - sum(s48)) / (48*(D-2))`` — all-integer
      numerators, so both the phase term and the centering term are
      single divisions of exact integers and replay bit-identically
      in the SQL oracle (no float-accumulation order sensitivity).
    * **resid**: ``cnt - trend - seasonal``; NULL where trend is.

    Scale: one hash aggregate for counts, one per-key window pass,
    one (key, phase) aggregate — the grid explode is a projection
    (``sequence`` + ``explode``), never a join against a generated
    table.

    Output: key, bucket_s, cnt, trend, seasonal, resid.
    """
    hour = (
        F.floor(F.unix_timestamp(ts_col) / F.lit(3600)) * F.lit(3600)
    ).cast("long")
    base = df.select(F.col(key_col).alias("key"), hour.alias("bucket_s"))
    counts = base.groupBy("key", "bucket_s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bounds = (
        base.agg(
            (F.floor(F.min("bucket_s") / F.lit(86400)) * F.lit(86400))
            .cast("long")
            .alias("d0"),
            (F.floor(F.max("bucket_s") / F.lit(86400)) * F.lit(86400))
            .cast("long")
            .alias("d1"),
        )
        .select(
            "d0",
            "d1",
            ((F.col("d1") - F.col("d0")) / F.lit(86400) + F.lit(1))
            .cast("long")
            .alias("n_days"),
        )
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            "d0",
            "n_days",
            F.explode(
                F.sequence(
                    F.col("d0"),
                    F.col("d1") + F.lit(86400 - 3600),
                    F.lit(3600),
                )
            ).alias("bucket_s"),
        )
    )
    wa = (
        Window.partitionBy("key")
        .orderBy("bucket_s")
        .rowsBetween(-12, 11)
    )
    wb = (
        Window.partitionBy("key")
        .orderBy("bucket_s")
        .rowsBetween(-11, 12)
    )
    g = (
        grid.join(counts, ["key", "bucket_s"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
        .withColumn(
            "s48",
            (F.sum("cnt").over(wa) + F.sum("cnt").over(wb)).cast(
                "long"
            ),
        )
        .withColumn(
            "full",
            (F.count(F.lit(1)).over(wa) == 24)
            & (F.count(F.lit(1)).over(wb) == 24),
        )
        .withColumn(
            "day_idx",
            ((F.col("bucket_s") - F.col("d0")) / F.lit(86400)).cast(
                "long"
            ),
        )
        .withColumn(
            "phase",
            (F.col("bucket_s") / F.lit(3600)).cast("long") % 24,
        )
    )
    ph = (
        g.filter(
            (F.col("day_idx") >= 1)
            & (F.col("day_idx") <= F.col("n_days") - 2)
        )
        .groupBy("key", "phase", "n_days")
        .agg(
            (
                F.lit(48) * F.sum("cnt") - F.sum("s48")
            ).alias("num")
        )
    )
    tot = ph.groupBy("key").agg(F.sum("num").alias("ntot"))
    den = (F.col("n_days") - F.lit(2)).cast("double")
    sea = ph.join(tot, "key").select(
        "key",
        "phase",
        (
            F.col("num").cast("double") / (F.lit(48.0) * den)
            - F.col("ntot").cast("double") / (F.lit(1152.0) * den)
        ).alias("seasonal"),
    )
    trend = F.when(F.col("full"), F.col("s48") / F.lit(48.0))
    return (
        g.join(sea, ["key", "phase"], "left")
        .select(
            "key",
            "bucket_s",
            "cnt",
            trend.alias("trend"),
            "seasonal",
            (F.col("cnt") - trend - F.col("seasonal")).alias("resid"),
        )
    )


def crosscorr(
    df: DataFrame,
    type_a: str,
    type_b: str,
    tier: str = "1h",
    max_lag: int = 3,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Lagged cross-correlation between two event types per key:
    ``xcorr(key, lag) = corr(cnt_a[t], cnt_b[t + lag])`` for
    lag 0..max_lag on the zero-filled global bucket grid — the
    lead/lag diagnostic behind "do clicks drive purchases, and how
    many hours later?".

    Same exactness contract as ``autocorr_lag1``: counts are exact
    integers, all six sufficient statistics are integer sums, and the
    correlation is one shared float expression, so the whole output
    replays bit-identically in SQL.  Zero-variance sides yield NULL.

    Scale: one hash aggregate over (key, bucket) with both counts as
    conditional sums, one per-key window pass producing the max_lag+1
    leads, one ``stack`` projection (no join, no explode blow-up —
    max_lag+1 rows per grid point), one (key, lag) aggregate.

    Output: key, lag, n, xcorr.
    """
    sec = TIERS[tier][1]
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        F.col(type_col).alias("etype"),
    )
    counts = base.groupBy("key", "bucket_s").agg(
        F.sum(
            F.when(F.col("etype") == type_a, 1).otherwise(0)
        ).alias("xa"),
        F.sum(
            F.when(F.col("etype") == type_b, 1).otherwise(0)
        ).alias("xb"),
    )
    bounds = base.agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(sec))
            ).alias("bucket_s"),
        )
    )
    w = Window.partitionBy("key").orderBy("bucket_s")
    series = (
        grid.join(counts, ["key", "bucket_s"], "left")
        .withColumn("xa", F.coalesce("xa", F.lit(0).cast("long")))
        .withColumn("xb", F.coalesce("xb", F.lit(0).cast("long")))
    )
    for lag in range(max_lag + 1):
        series = series.withColumn(
            f"y{lag}", F.lead("xb", lag).over(w)
        )
    stack = F.expr(
        "stack("
        + str(max_lag + 1)
        + ", "
        + ", ".join(f"{lag}, y{lag}" for lag in range(max_lag + 1))
        + ") AS (lag, y)"
    )
    pairs = series.select("key", "xa", stack).filter(
        F.col("y").isNotNull()
    )
    s = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("xa") * F.col("y")).alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "key",
        F.col("lag").cast("int").alias("lag"),
        "n",
        (num / F.nullif(den, F.lit(0.0))).alias("xcorr"),
    )


def holt(
    df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per
    series — the one-step-ahead forecaster a capacity alert compares
    actual load against:

        l_0 = x_0,  b_0 = 0
        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        fitted_t = l_{t-1} + b_{t-1}   (NULL at t = 0)

    Inherently sequential like ``ewma``, so it runs as a grouped Arrow
    kernel (one hash partition on the key; the documented series-
    length cap applies).  With exact-binary alpha/beta the kernel's
    operation order is mirrored token-for-token by the oracle's
    recursive-CTE fold, so outputs are raw doubles — bit-identical,
    no rounding.

    Output: key, ord, v, level, trend, fitted.
    """
    a, one_a = float(alpha), 1.0 - float(alpha)
    b_, one_b = float(beta), 1.0 - float(beta)
    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, ord long, v double, "
        "level double, trend double, fitted double"
    )

    def _kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values("ord").reset_index(drop=True)
        x = pdf["v"].to_numpy()
        n = x.size
        level = np.empty(n)
        trend = np.empty(n)
        fitted = np.full(n, np.nan)
        l_prev, b_prev = x[0], 0.0
        level[0], trend[0] = l_prev, b_prev
        for t in range(1, n):
            fitted[t] = l_prev + b_prev
            l_new = a * x[t] + one_a * (l_prev + b_prev)
            b_prev = b_ * (l_new - l_prev) + one_b * b_prev
            l_prev = l_new
            level[t], trend[t] = l_prev, b_prev
        pdf["level"] = level
        pdf["trend"] = trend
        pdf["fitted"] = fitted
        return pdf[["key", "ord", "v", "level", "trend", "fitted"]]

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def kalman_filter(
    df: DataFrame,
    q: float = 0.25,
    r: float = 1.0,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """1-D Kalman filter (local-level model) per series — the optimal
    online smoother for a noisy constant-drift level, the classic
    alternative to EWMA when the noise split (process ``q`` vs
    measurement ``r``) is known:

        l_0 = x_0,  p_0 = 1.0
        t >= 1:  p_pred = p_{t-1} + q
                 k      = p_pred / (p_pred + r)
                 pred_t = l_{t-1}              (prior mean)
                 l_t    = l_{t-1} + k*(x_t - l_{t-1})
                 p_t    = (1 - k) * p_pred

    Inherently sequential like ``holt``/``ewma``, so it runs as a
    grouped Arrow kernel (one hash partition per key, bounded series
    length).  With exact-binary ``q``/``r`` the fold is mirrored
    token-for-token by the oracle's recursive CTE, so outputs are raw
    doubles — bit-identical, no rounding.

    Output: key, ord, v, pred (NULL at t=0), gain (NULL at t=0),
    level, p.
    """
    qf, rf = float(q), float(r)
    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, ord long, v double, "
        "pred double, gain double, level double, p double"
    )

    def _kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values("ord").reset_index(drop=True)
        x = pdf["v"].to_numpy()
        n = x.size
        level = np.empty(n)
        pvar = np.empty(n)
        pred = np.full(n, np.nan)
        gain = np.full(n, np.nan)
        l_prev, p_prev = x[0], 1.0
        level[0], pvar[0] = l_prev, p_prev
        for t in range(1, n):
            p_pred = p_prev + qf
            k = p_pred / (p_pred + rf)
            pred[t] = l_prev
            gain[t] = k
            l_prev = l_prev + k * (x[t] - l_prev)
            p_prev = (1.0 - k) * p_pred
            level[t], pvar[t] = l_prev, p_prev
        pdf["pred"] = pred
        pdf["gain"] = gain
        pdf["level"] = level
        pdf["p"] = pvar
        return pdf[["key", "ord", "v", "pred", "gain", "level", "p"]]

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


# SAX breakpoints: standard-normal quantiles splitting the z axis into
# equiprobable regions (Lin et al. 2003, "A Symbolic Representation of
# Time Series").  Literal doubles so the SQL oracle replays them
# token-for-token.
_SAX_BREAKPOINTS = {
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [
        -0.8416212335729142,
        -0.2533471031357997,
        0.2533471031357997,
        0.8416212335729142,
    ],
}


def sax_symbols(
    df: DataFrame,
    n_segments: int = 8,
    alphabet: int = 4,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """SAX symbolization (Lin et al. 2003): PAA + Gaussian-breakpoint
    symbols, one word per series — the building block for symbolic
    motif/novelty search over a fleet of conversation series.

    Pipeline (pure Catalyst, two co-keyed hash aggregates + one
    equi-join on the series key):

    1. per-series sufficient statistics from EXACT integer sums
       (``sum x``, ``sum x^2`` as BIGINT) — mean and population std
       are then correctly-rounded doubles, identical in any engine;
    2. PAA: segment ``floor(ord * w / T)`` means, again exact integer
       sums divided once — normalization is affine so z-scoring the
       PAA means equals PAA over z-scores in real arithmetic, and this
       order keeps every float op a deterministic function of exact
       integers (no order-dependent float accumulation anywhere);
    3. symbols by half-open breakpoint intervals, assembled in segment
       order with ``array_sort`` over (segment, symbol) structs.

    Constant series (zero variance) map to z = 0.  Input values must
    be integer-valued (counts); the cast to BIGINT truncates, matching
    the oracle's CAST semantics only on exact integers.

    Scale: the join is key-to-key (same partitioning both sides, no
    broadcast needed), segments-per-series is a constant, and the
    final word assembly is one ``collect_list`` of ``n_segments``
    structs per series — O(w) state per key.
    """
    if alphabet not in _SAX_BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {list(_SAX_BREAKPOINTS)}")
    bps = _SAX_BREAKPOINTS[alphabet]
    letters = [chr(ord("a") + i) for i in range(alphabet)]

    x = F.col(value_col).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        x.alias("x"),
    )
    stats = base.groupBy("key").agg(
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    # segment index over the per-series length: T is constant per the
    # rectangular-series precondition, so floor(ord * w / T)
    sized = base.withColumn(
        "T", F.count(F.lit(1)).over(Window.partitionBy("key"))
    ).withColumn(
        "seg",
        F.floor(F.col("ord") * F.lit(n_segments) / F.col("T")).cast("int"),
    )
    paa = sized.groupBy("key", "seg").agg(
        F.sum("x").alias("ss"), F.count(F.lit(1)).alias("sc")
    )
    j = paa.join(stats, "key")
    mean = F.col("s1").cast("double") / F.col("n")
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    std = F.sqrt(var_num.cast("double")) / F.col("n")
    z = F.when(var_num == 0, F.lit(0.0)).otherwise(
        (F.col("ss").cast("double") / F.col("sc") - mean) / std
    )
    sym = F.when(z < F.lit(bps[0]), F.lit(letters[0]))
    for i in range(1, alphabet - 1):
        sym = sym.when(z < F.lit(bps[i]), F.lit(letters[i]))
    sym = sym.otherwise(F.lit(letters[-1]))
    words = (
        j.select("key", "seg", sym.alias("sym"))
        .groupBy("key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg", "sym"))
                    ),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("sax")
        )
    )
    return words


def concurrency_curve(
    sessions: DataFrame,
    tier: str,
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """Active-interval concurrency per tier bucket — the sweep line
    over session intervals ("how many conversations were live each
    minute"), gaps-and-islands' dual.

    A session [s, e] is active in every bucket it overlaps, so it
    contributes +1 at ``floor(s / w)`` and -1 at ``floor(e / w) + 1``;
    the running sum of bucket deltas is the concurrency step function
    (sparse: rows only where the level changes — the value holds until
    the next row's bucket).

    Scale shape: the deltas are hash-aggregated per bucket FIRST
    (map-side combine, one narrow explode of two structs per session),
    so the ordered running-sum window sees one row per distinct bucket
    — bounded by time-range / tier-width (525 600 rows per YEAR at
    1m), never by session count.  The single-partition window over
    that pre-aggregated axis is deliberate and safe; for multi-decade
    ranges run the curve at a coarser tier.  All arithmetic is
    integer, so the result is partitioning-independent and exact.
    """
    sec = TIERS[tier][1]
    b_start = (F.floor(F.col(start_col) / sec) * sec).cast("long")
    b_end_excl = ((F.floor(F.col(end_col) / sec) + 1) * sec).cast("long")
    deltas = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    b_start.alias("bucket_s"), F.lit(1).alias("d")
                ),
                F.struct(
                    b_end_excl.alias("bucket_s"), F.lit(-1).alias("d")
                ),
            )
        ).alias("e")
    ).select("e.bucket_s", "e.d")
    agg = deltas.groupBy("bucket_s").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("bucket_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return agg.withColumn("concurrent", F.sum("delta").over(w))


def transition_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts over per-key ordered state
    streams: how often state A is immediately followed by state B
    within a key's timeline ("tool X then tool Y" patterns over agent
    transcripts).

    One lag() window per key (O(1) state per row) then one hash
    aggregate with at most |states|^2 groups — map-side combine makes
    the shuffle payload the transition matrix itself, independent of
    row count.  ``order_col`` breaks duplicate-timestamp ties so the
    lag chain is deterministic.  Output: from_state, to_state, n.
    """
    cols = [F.col(ts_col)]
    if order_col:
        cols.append(F.col(order_col))
    w = Window.partitionBy(key_col).orderBy(*cols)
    prev = F.lag(state_col).over(w)
    return (
        df.select(
            prev.alias("from_state"), F.col(state_col).alias("to_state")
        )
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def mann_kendall(
    df: DataFrame,
    tier: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope per key over its
    zero-filled bucket-count series — the standard nonparametric "is
    this series trending?" pair (Mann 1945, Kendall 1975; Sen 1968),
    robust to outliers and needing no distributional assumptions.

    Per key the series is its event count on the COMPLETE global
    [min, max] ``tier`` bucket grid, zero-filled (same dense-series
    contract as ``autocorr_lag1``).  Statistics:

    * ``s_stat = Σ_{i<j} sign(x_j − x_i)`` — an exact integer.
    * ``var_s = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18`` with the
      standard tie correction (t = size of each tied value group);
      the numerator is an exact integer, so ``var_s`` and the z score

          z = (s_stat ∓ 1) / sqrt(var_s)   (continuity-corrected)

      are ONE shared float expression both engines evaluate on
      identical integer inputs.
    * ``sen_slope`` = median over all pair slopes
      ``(x_j − x_i)/(j − i)`` (bucket-index units).  The median is an
      explicit rank selection — rows ``(m+1) div 2`` and
      ``(m+2) div 2`` of the slope sort, averaged — not an
      engine-specific percentile, so DuckDB replays it exactly
      (equal-slope ties make the row_number order immaterial).

    Scale: the pair self-join is quadratic in the SERIES LENGTH (n =
    buckets in retention, e.g. 30 daily or 720 hourly points), not in
    event volume, and embarrassingly parallel across keys — keys ×
    n²/2 pair rows through one equi-join partitioned by key.  For
    multi-year series at fine tiers, switch to the O(n log n)
    merge-sort inversion-count form; at rollup tiers the closed
    quadratic form is smaller than one shuffle of the raw data.

    Output: key, n, s_stat, z (NULL when var_s = 0), sen_slope.
    """
    sec = TIERS[tier][1]
    series = _dense_count_series(df, tier, key_col, ts_col).select(
        "key",
        ((F.col("bucket_s") - F.col("lo")) / F.lit(sec))
        .cast("long")
        .alias("idx"),
        "x",
    )
    a, b = series.alias("a"), series.alias("b")
    pairs = a.join(
        b,
        (F.col("a.key") == F.col("b.key"))
        & (F.col("a.idx") < F.col("b.idx")),
    ).select(
        F.col("a.key").alias("key"),
        F.when(F.col("b.x") > F.col("a.x"), F.lit(1))
        .when(F.col("b.x") < F.col("a.x"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("sgn"),
        (
            (F.col("b.x") - F.col("a.x")).cast("double")
            / (F.col("b.idx") - F.col("a.idx")).cast("double")
        ).alias("slope"),
    )
    sw = Window.partitionBy("key").orderBy("slope")
    cw = Window.partitionBy("key")
    ranked = pairs.select(
        "key",
        "sgn",
        "slope",
        F.row_number().over(sw).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("m"),
    )
    mid_lo = F.expr("(m + 1) div 2")
    mid_hi = F.expr("(m + 2) div 2")
    stats = ranked.groupBy("key").agg(
        F.sum("sgn").alias("s_stat"),
        F.avg(
            F.when(
                (F.col("rn") == mid_lo) | (F.col("rn") == mid_hi),
                F.col("slope"),
            )
        ).alias("sen_slope"),
    )
    ties = (
        series.groupBy("key", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("key")
        .agg(
            F.sum(F.lit(1) * F.col("t")).alias("n"),
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tie_term"),
        )
    )
    j = stats.join(ties, "key")
    n = F.col("n")
    var_num = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    ).cast("double")
    sd = F.nullif(F.sqrt(var_num / F.lit(18.0)), F.lit(0.0))
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / sd,
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / sd,
        )
        .otherwise(F.lit(0.0) * sd)
    )
    return j.select(
        "key",
        n.cast("long").alias("n"),
        "s_stat",
        z.alias("z"),
        "sen_slope",
    )


def holt_winters(
    df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    m: int = 24,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """Holt–Winters additive triple exponential smoothing (level +
    trend + length-``m`` season) per series — the seasonal load
    forecaster (Winters 1960).  Classic init over the first season:
    ``l = mean(x[0:m])``, ``b = 0``, ``s_i = x_i − mean``; then for
    t ≥ m::

        fitted_t = l + b + s_{t−m}
        l_t = alpha·(x_t − s_{t−m}) + (1−alpha)·(l + b)
        b_t = beta·(l_t − l) + (1−beta)·b
        s_t = gamma·(x_t − l_t) + (1−gamma)·s_{t−m}

    Rows before ``t = m`` are consumed by initialization and not
    emitted.  Inherently sequential (like ``holt``/``ewma``) so it
    runs as a grouped Arrow kernel — one hash partition per key, the
    documented series-length cap applies.  With exact-binary
    coefficients and integer-valued inputs (the init mean is an exact
    integer sum / m), every step is mirrored token-for-token by the
    oracle's recursive CTE carrying the rolling seasonal list, so
    outputs are raw doubles — bit-identical, no rounding.

    Output: key, ord, v, level, trend, season, fitted   (t >= m).
    """
    a, one_a = float(alpha), 1.0 - float(alpha)
    b_, one_b = float(beta), 1.0 - float(beta)
    g_, one_g = float(gamma), 1.0 - float(gamma)
    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, ord long, v double, "
        "level double, trend double, season double, fitted double"
    )

    def _kernel(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("ord").reset_index(drop=True)
        x = pdf["v"].to_numpy()
        n = x.size
        if n <= m:
            return pdf.iloc[0:0].assign(
                level=0.0, trend=0.0, season=0.0, fitted=0.0
            )[["key", "ord", "v", "level", "trend", "season",
               "fitted"]]
        mean = float(np.sum(x[:m])) / float(m)
        seas = [x[i] - mean for i in range(m)]
        l_prev, b_prev = mean, 0.0
        rows = []
        for t in range(m, n):
            s_old = seas[t - m]
            fitted = l_prev + b_prev + s_old
            l_new = a * (x[t] - s_old) + one_a * (l_prev + b_prev)
            b_new = b_ * (l_new - l_prev) + one_b * b_prev
            s_new = g_ * (x[t] - l_new) + one_g * s_old
            seas.append(s_new)
            rows.append(
                (pdf["key"].iloc[0], int(pdf["ord"].iloc[t]), x[t],
                 l_new, b_new, s_new, fitted)
            )
            l_prev, b_prev = l_new, b_new
        return pd.DataFrame(
            rows,
            columns=["key", "ord", "v", "level", "trend", "season",
                     "fitted"],
        )

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def burstiness(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Arrival-process burstiness per key: the squared coefficient of
    variation of inter-arrival times (CV² = 1 for Poisson, > 1 bursty,
    < 1 regular) and the Fano factor of the zero-filled ``tier``
    bucket counts (variance-to-mean; again 1 = Poisson) — the two
    standard dispersion diagnostics for event streams.

    Exactness: inter-arrival deltas are exact integer MICROSECONDS;
    their squares are summed as DECIMAL(38,0) (a 30-day gap squared
    overflows int64 but has ~25 decimal digits), and bucket-count
    statistics are plain int64 sums.  Both engines then evaluate ONE
    shared float expression over identically-rounded casts of the same
    exact integers::

        cv2  = (g·Σd² − (Σd)²) / ((Σd)·(Σd))          g = n_events−1
        fano = (n·Σc² − (Σc)²) / (n·Σc)               n = grid size

    so results are raw doubles, no rounding.  ``cv2`` is NULL when
    undefined (fewer than 2 gaps, or zero total gap); the Fano factor
    is defined for EVERY key with events, so every such key gets a
    row.

    Plan shape: one lag window per key (O(1) state) + two hash
    aggregates, one of them on the bounded dense grid — same
    single-shuffle contract as ``autocorr_lag1``.

    Output: key, n_events, cv2, fano.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        _micros(ts_col).alias("t_us"),
        F.col(order_col).alias("o"),
    )
    w = Window.partitionBy("key").orderBy("t_us", "o")
    d = (F.col("t_us") - F.lag("t_us").over(w)).alias("d")
    gaps = base.select("key", d).filter(F.col("d").isNotNull())
    d_dec = F.col("d").cast("decimal(18,0)")
    ia = gaps.groupBy("key").agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("d").alias("sd"),
        F.sum(d_dec * d_dec).alias("sd2"),
    )
    gd, sdd, sd2d = (
        F.col("g").cast("double"),
        F.col("sd").cast("double"),
        F.col("sd2").cast("double"),
    )
    cv2 = F.when(
        F.col("g") >= 2,
        (gd * sd2d - sdd * sdd) / F.nullif(sdd * sdd, F.lit(0.0)),
    )
    ia = ia.select("key", cv2.alias("cv2"))
    series = _dense_count_series(df, tier, key_col, ts_col)
    fa = series.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sc"),
        F.sum(F.col("x") * F.col("x")).alias("sc2"),
    )
    nd, scd, sc2d = (
        F.col("n").cast("double"),
        F.col("sc").cast("double"),
        F.col("sc2").cast("double"),
    )
    fano = (nd * sc2d - scd * scd) / F.nullif(
        nd * scd, F.lit(0.0)
    )
    fa = fa.select(
        "key", F.col("sc").alias("n_events"), fano.alias("fano")
    )
    return fa.join(ia, "key", "left").select(
        "key", "n_events", "cv2", "fano"
    )


def corr_matrix(
    df: DataFrame,
    tier: str = "1h",
    cat_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Pairwise Pearson correlation matrix between category count
    series — which event types co-move hour-to-hour (the all-pairs
    generalization of :func:`crosscorr` at lag 0, upper triangle
    only).

    Each category's series is its count per ``tier`` bucket on the
    COMPLETE global [min, max] grid, zero-filled; the matrix join is
    a self-equi-join on ``bucket_s`` with ``cat_a < cat_b`` — at most
    |categories|² · grid rows, independent of event volume.  All six
    sufficient statistics are exact integer sums; the correlation is
    the same ONE shared float expression as ``autocorr_lag1``, so the
    oracle compares raw doubles (NULL for a zero-variance side).

    Output: cat_a, cat_b, n, corr.
    """
    series = _dense_count_series(df, tier, cat_col, ts_col).select(
        F.col("key").alias("cat"), "bucket_s", "x"
    )
    a, b = series.alias("a"), series.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket_s") == F.col("b.bucket_s"))
        & (F.col("a.cat") < F.col("b.cat")),
    ).select(
        F.col("a.cat").alias("cat_a"),
        F.col("b.cat").alias("cat_b"),
        F.col("a.x").alias("x"),
        F.col("b.x").alias("y"),
    )
    s = pairs.groupBy("cat_a", "cat_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "cat_a",
        "cat_b",
        "n",
        (num / F.nullif(den, F.lit(0.0))).alias("corr"),
    )


def activity_gini(
    df: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Gini coefficient of per-key activity — how unequally events
    concentrate across keys (0 = uniform, →1 = one key dominates);
    the standard skew summary a capacity planner reads before picking
    a partitioning strategy.

    Closed form over counts sorted ascending with 1-based rank i::

        G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x)

    Computed WITHOUT ranking individual keys: ties share equal x, so
    a distinct activity level x with multiplicity m occupies one
    contiguous rank block and contributes
    ``x · (offset·m + m(m+1)/2)`` to Σ i·x_i.  The plan is therefore
    key-count aggregate → count-of-counts aggregate (rows = DISTINCT
    activity levels, typically thousands even at 10^9 keys) → one
    ordered window over that tiny frame — no global sort of the key
    population.  Every sum is an exact integer and G is one float
    division — raw doubles, both engines.

    Output: one row — n_keys, total, gini.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("x")
    )
    levels = counts.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    w = (
        Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = levels.select(
        "x",
        "m",
        (F.sum("m").over(w) - F.col("m")).alias("offset"),
    )
    # all-integer block contribution (m(m+1) is even, `div` keeps the
    # arithmetic in int64; at extreme key populations Σ i·x_i needs a
    # DECIMAL widening — int64 holds it through ~10^8 keys)
    six_term = F.expr(
        "x * (offset * m + (m * (m + 1)) div 2)"
    )
    s = blocks.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("x") * F.col("m")).alias("sx"),
        F.sum(six_term).alias("six"),
    )
    g = (
        (2 * F.col("six") - (F.col("n") + 1) * F.col("sx"))
        .cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
    )
    return s.select(
        F.col("n").alias("n_keys"),
        F.col("sx").alias("total"),
        g.alias("gini"),
    )


def type_entropy(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
) -> DataFrame:
    """Shannon entropy (bits) of each key's category mix — behavioral
    diversity (0 = single-category key, log2(|categories|) = uniform).

    ``H = log2(n) − (Σ c·log2 c)/n`` over the key's per-category
    counts.  The Σ term folds a SORTED (by category) list left to
    right, so both engines accumulate the handful of float terms in
    the same order; counts are exact integers underneath.

    Output: key, n_events, n_types, entropy.
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"), F.col(cat_col).alias("cat")
    ).agg(F.count(F.lit(1)).alias("c"))
    term = (
        F.col("c").cast("double")
        * F.log2(F.col("c").cast("double"))
    ).alias("term")
    per = counts.select("key", "cat", "c", term)
    agg = per.groupBy("key").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("cat", "term"))
            ),
            F.lit(0.0),
            lambda a, s: a + s["term"],
        ).alias("sumterm"),
    )
    ent = F.log2(F.col("n").cast("double")) - F.col(
        "sumterm"
    ) / F.col("n").cast("double")
    return agg.select(
        "key",
        F.col("n").alias("n_events"),
        "n_types",
        ent.alias("entropy"),
    )


def dtw_distance(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    col_a: str = "cnt",
    col_b: str = "sum_value",
    band: int = 8,
) -> DataFrame:
    """Banded dynamic-time-warping distance between two equal-length
    channels of each series (Sakoe & Chiba 1978) — the elastic shape
    similarity the time-series classification / motif literature is
    built on (here: how closely a conversation's turn-rate curve
    tracks its value curve, tolerating phase shifts up to ``band``
    buckets).

    Classic DP with absolute-difference cost and a Sakoe–Chiba band::

        dp[i][j] = |a_i − b_j| + min(dp[i−1][j], dp[i−1][j−1],
                                     dp[i][j−1]),   |i−j| ≤ band

    Inherently sequential per series, so it runs as a grouped Arrow
    kernel — O(T·band) per key, embarrassingly parallel across keys
    (the production contract for rollup-tier series lengths; the
    whole-series cap policy documented for Drift/TimeWarp applies).
    Every DP op is an IEEE add or exact min of identically-derived
    doubles, so the oracle's cell-by-cell recursive CTE replays the
    distance bit-exactly.

    Output: key, T, dtw.
    """
    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, T long, dtw double"
    )
    w = int(band)

    def _kernel(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("ord").reset_index(drop=True)
        a = pdf["va"].to_numpy()
        b = pdf["vb"].to_numpy()
        n = a.size
        inf = float("inf")
        prev = np.full(n + 1, inf)
        prev[0] = 0.0
        for i in range(1, n + 1):
            cur = np.full(n + 1, inf)
            for j in range(max(1, i - w), min(n, i + w) + 1):
                cost = abs(a[i - 1] - b[j - 1])
                cur[j] = cost + min(prev[j], prev[j - 1], cur[j - 1])
            prev = cur
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "T": [n],
             "dtw": [prev[n]]}
        )

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(col_a).cast("double").alias("va"),
        F.col(col_b).cast("double").alias("vb"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def seasonal_anomaly(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    z_thresh: float = 3.0,
) -> DataFrame:
    """Seasonality-aware anomaly flags: buckets whose count deviates
    from the key's OWN hour-of-day profile by more than ``z_thresh``
    population standard deviations — the composite a monitoring stack
    wires from its seasonal baseline + z-score primitives (a 3 a.m.
    burst is anomalous even when 3 p.m. sees that load every day).

    The profile is per (key, hour-of-day) over the zero-filled global
    grid, so mean/std are over the full retention window including
    silent days.  Sufficient statistics are exact integer sums; mu,
    sigma, and z are single shared float expressions, and the flag
    comparison runs on identically-derived doubles — so the flagged
    row set is deterministic across engines (zero-variance hours flag
    only via the mu side, z NULL).

    Plan: counts aggregate → grid join (bounded) → one (key, hod)
    aggregate joined back — two shuffles over grid-bounded frames.

    Output: key, bucket_s, cnt, mu, z   (only flagged rows).
    """
    sec = TIERS[tier][1]
    series = _dense_count_series(df, tier, key_col, ts_col).select(
        "key",
        "bucket_s",
        "x",
        ((F.col("bucket_s") % 86400) / F.lit(sec))
        .cast("int")
        .alias("hod"),
    )
    prof = series.groupBy("key", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / nd
    sigma = (
        F.sqrt(
            (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
            .cast("double")
        )
        / nd
    )
    prof = prof.select(
        "key", "hod", mu.alias("mu"), F.nullif(sigma, F.lit(0.0)).alias("sigma")
    )
    j = series.join(prof, ["key", "hod"])
    z = (F.col("x").cast("double") - F.col("mu")) / F.col("sigma")
    return (
        j.select(
            "key",
            "bucket_s",
            F.col("x").alias("cnt"),
            "mu",
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) >= F.lit(float(z_thresh)))
    )


def motif_pair(
    df: DataFrame,
    m: int = 8,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """Top motif per series: the pair of NON-OVERLAPPING length-``m``
    subsequences with the smallest z-normalized Euclidean distance —
    the matrix-profile primitive (Yeh et al., ICDM 2016) behind motif
    discovery ("which load pattern does this conversation repeat?").

    Each subsequence is z-normalized by its own mean/std (population;
    a flat window z-scores to all-zeros by convention), then::

        d(i, j) = sqrt(Σ_k (z_i[k] − z_j[k])²),   j ≥ i + m

    All subsequence statistics are single float functions of exact
    integer window sums; the distance folds the m squared differences
    left-to-right, and the winning pair is an argmin under the total
    order (d, i, j) — every step replayed token-for-token by the
    oracle, so the selected motif is bit-deterministic.

    O(T²·m) per key as a grouped Arrow kernel (T = rollup-tier series
    length, bounded by retention), embarrassingly parallel across
    keys; the STOMP O(T²) recurrence is the constant-factor upgrade at
    longer T.

    Output: key, i, j, dist   (0-based window starts).
    """
    mm = int(m)
    out_schema = (
        f"key {dict(df.dtypes)[key_col]}, i long, j long, dist double"
    )

    def _kernel(pdf):
        from math import sqrt

        import pandas as pd

        pdf = pdf.sort_values("ord").reset_index(drop=True)
        x = pdf["v"].tolist()
        n = len(x)
        n_sub = n - mm + 1
        if n_sub < mm + 1:
            return pd.DataFrame(
                columns=["key", "i", "j", "dist"]
            ).astype({"i": "int64", "j": "int64", "dist": "float64"})
        mus, sigs = [], []
        for i in range(n_sub):
            sx = 0.0
            sx2 = 0.0
            for k in range(mm):
                sx = sx + x[i + k]
                sx2 = sx2 + x[i + k] * x[i + k]
            mu = sx / mm
            # max(0, .) guards float cancellation on non-integer
            # windows (mirrored by greatest() in the SQL oracle)
            sigs.append(sqrt(max(0.0, mm * sx2 - sx * sx)) / mm)
            mus.append(mu)

        def z(i, k):
            return (
                0.0
                if sigs[i] == 0.0
                else (x[i + k] - mus[i]) / sigs[i]
            )

        best = None
        for i in range(n_sub):
            for j in range(i + mm, n_sub):
                acc = 0.0
                for k in range(mm):
                    d = z(i, k) - z(j, k)
                    acc = acc + d * d
                dist = sqrt(acc)
                cand = (dist, i, j)
                if best is None or cand < best:
                    best = cand
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "i": [best[1]],
             "j": [best[2]], "dist": [best[0]]}
        )

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).cast("long").alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def pattern_search(
    df: DataFrame,
    pattern: "list[float]",
    top: int = 10,
    key_col: str = "conv_id",
    order_col: str = "bucket_idx",
    value_col: str = "cnt",
) -> DataFrame:
    """Query-by-pattern subsequence search: the ``top`` closest
    z-normalized matches to ``pattern`` across ALL series — the
    cross-corpus companion to :func:`motif_pair` ("find every
    conversation whose load ever looked like THIS"), and the shape
    UCR-style similarity search takes.

    Pure Catalyst, no kernel: each series is packed to an ordered
    array once, window starts explode from a bounded ``sequence``,
    window statistics and the distance are left-to-right ``aggregate``
    folds against the BROADCAST z-normalized pattern literal, and the
    global top-k is ``orderBy().limit()`` — TakeOrderedAndProject, no
    single-partition sort.  Work is keys × (T−m+1) fold evaluations of
    length m — linear in corpus size, embarrassingly parallel.

    Determinism: window sums are exact integers; mu/sigma/distance are
    the same single-IEEE-op chains the motif kernel uses (flat windows
    z-score to zeros), and the pattern constants are Python floats
    embedded identically in both engines, so the ranked result is
    bit-deterministic under the (dist, key, i) total order.

    Output: user... key, i, dist — ``top`` rows, sorted.
    """
    from math import sqrt as _sqrt

    m = len(pattern)
    psx = 0.0
    psx2 = 0.0
    for v in pattern:
        psx = psx + float(v)
        psx2 = psx2 + float(v) * float(v)
    pmu = psx / m
    psig = _sqrt(max(0.0, m * psx2 - psx * psx)) / m
    pz = [
        0.0 if psig == 0.0 else (float(v) - pmu) / psig
        for v in pattern
    ]

    packed = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(order_col).cast("long").alias("ord"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy("key")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "v"))),
                lambda s: s["v"],
            ).alias("xs"),
            F.count(F.lit(1)).alias("T"),
        )
    )
    win = (
        packed.filter(F.col("T") >= F.lit(m))  # sub-pattern series
        .select(
            "key",
            "xs",
            F.explode(
                F.sequence(F.lit(0), (F.col("T") - F.lit(m)).cast("int"))
            ).alias("i"),
        )
    )

    ks = F.sequence(F.lit(0), F.lit(m - 1))

    def elem(k):
        return F.element_at(F.col("xs"), F.col("i") + k + 1)

    sx = F.aggregate(ks, F.lit(0.0), lambda acc, k: acc + elem(k))
    sx2 = F.aggregate(
        ks, F.lit(0.0), lambda acc, k: acc + elem(k) * elem(k)
    )
    st = win.select(
        "key", "xs", "i", sx.alias("sx"), sx2.alias("sx2")
    ).select(
        "key",
        "xs",
        "i",
        (F.col("sx") / F.lit(m)).alias("mu"),
        (
            F.sqrt(
                F.greatest(
                    F.lit(m) * F.col("sx2")
                    - F.col("sx") * F.col("sx"),
                    F.lit(0.0),
                )
            )
            / F.lit(m)
        ).alias("sig"),
    )
    pz_arr = F.array(*[F.lit(z) for z in pz])

    def zdiff(k):
        zw = F.when(F.col("sig") == 0.0, F.lit(0.0)).otherwise(
            (elem(k) - F.col("mu")) / F.col("sig")
        )
        return zw - F.element_at(pz_arr, k + 1)

    dist2 = F.aggregate(
        ks, F.lit(0.0), lambda acc, k: acc + zdiff(k) * zdiff(k)
    )
    return (
        st.select("key", "i", F.sqrt(dist2).alias("dist"))
        .orderBy("dist", "key", "i")
        .limit(top)
    )


def transition_latency(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Dwell-time statistics per state transition: for each (from,
    to) pair, how long keys take between consecutive events — the
    latency companion to :func:`transition_counts` ("how long after a
    click does the purchase come?", tool-to-tool turnaround in agent
    transcripts).

    Same single lag window (O(1) state per row), then one hash
    aggregate with at most |states|² groups.  Delays are exact integer
    microseconds; mean/min/max are single functions of exact sums, so
    DuckDB matches raw doubles.

    Output: from_state, to_state, n, mean_delay_us, max_delay_us.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev_state = F.lag(state_col).over(w)
    prev_t = F.lag(_micros(ts_col)).over(w)
    seg = df.select(
        prev_state.alias("from_state"),
        F.col(state_col).alias("to_state"),
        (_micros(ts_col) - prev_t).alias("d"),
    ).filter(F.col("from_state").isNotNull())
    return seg.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("d").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_delay_us"),
        F.max("d").alias("max_delay_us"),
    )


def rolling_corr(
    df: DataFrame,
    tier: str = "1h",
    window: int = 24,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Rolling Pearson correlation between a key's event-count and
    value-sum channels over a sliding ``window`` of dense ``tier``
    buckets — "is this conversation's turn rate still tracking its
    value?" as a continuously-updated series (the multivariate rolling
    statistic TimescaleDB's ``stats_agg`` rolling API exposes).

    Channels per bucket: c = count, v = round(sum(value)*100) — the
    cents integerization makes v exact despite float bucket sums (the
    true sum is k/100 and the double error is orders below the 0.5
    rounding margin).  All five windowed sufficient statistics are
    then exact integer sliding sums (ROWS BETWEEN window-1 PRECEDING)
    and the correlation is the ONE shared float expression of
    ``autocorr_lag1`` — raw doubles both engines, NULL for a
    zero-variance side.  Only full windows are emitted.

    One shuffle: the five sums and the row counter share the same
    (key ORDER BY bucket) window frame.

    Output: key, bucket_s, corr.
    """
    sec = TIERS[tier][1]
    base = df.select(
        F.col(key_col).alias("key"),
        _bucket_s(ts_col, tier),
        F.col(value_col).cast("double").alias("val"),
    )
    counts = base.groupBy("key", "bucket_s").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("val") * 100).cast("long").alias("v"),
    )
    bounds = base.agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(sec))
            ).alias("bucket_s"),
        )
    )
    series = grid.join(counts, ["key", "bucket_s"], "left").select(
        "key",
        "bucket_s",
        F.coalesce("cnt", F.lit(0).cast("long")).alias("c"),
        F.coalesce("v", F.lit(0).cast("long")).alias("v"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_s")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    rn = Window.partitionBy("key").orderBy("bucket_s")
    stats = series.select(
        "key",
        "bucket_s",
        F.row_number().over(rn).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("c").over(w).alias("sc"),
        F.sum("v").over(w).alias("sv"),
        F.sum(F.col("c") * F.col("v")).over(w).alias("scv"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("scc"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("svv"),
    ).filter(F.col("rn") >= window)
    num = (
        F.col("n") * F.col("scv") - F.col("sc") * F.col("sv")
    ).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc"))
        .cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv"))
        .cast("double")
    )
    return stats.select(
        "key",
        "bucket_s",
        (num / F.nullif(den, F.lit(0.0))).alias("corr"),
    )


def state_dwell(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Time-in-state aggregation: each event's state holds until the
    key's next event; total dwell per (key, state) — "how long did
    this conversation sit in each tool" over agent transcripts, the
    step-interpolated (LOCF) twin of the trapezoidal TWA.

    The final open-ended segment has no successor and contributes
    zero (reporting time-in-state for unclosed segments is the
    caller's watermark policy).  One lead window (O(1) state per row)
    + one hash aggregate bounded by keys × states; dwells are exact
    integer microseconds.

    Output: key, state, n_segments, dwell_us.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    seg = df.select(
        F.col(key_col).alias("key"),
        F.col(state_col).alias("state"),
        (
            F.lead(_micros(ts_col)).over(w) - _micros(ts_col)
        ).alias("d"),
    ).filter(F.col("d").isNotNull())
    return seg.groupBy("key", "state").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("d").alias("dwell_us"),
    )


def benford_digits(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """First-significant-digit distribution per group vs Benford's law
    — the classic fabricated-/synthetic-data screen (naturally
    occurring multi-scale amounts follow log10(1 + 1/d); uniform or
    manufactured values don't).

    The digit is extracted EXACTLY: values are cents-integerized
    (exact for 2-decimal amounts) and the first character of the
    integer's decimal string is the first significant digit — no
    log10 float boundaries.  Zero values carry no leading digit and
    are excluded.  Output shares and the per-group chi² statistic
    (summed over OBSERVED digits; an absent digit at large N is
    itself a red flag worth a dedicated check) are single float
    expressions of exact integer counts.

    Output: grp, digit, n, share, benford_share, chi2 (group-level,
    repeated per digit row for a flat schema).
    """
    import math

    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    digits = df.select(
        F.col(group_col).alias("grp"),
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("d"),
    ).filter(F.col("d") > 0)
    counts = digits.groupBy("grp", "d").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("grp")
    benford = F.element_at(
        F.array(
            *[
                F.lit(math.log10(1.0 + 1.0 / d))
                for d in range(1, 10)
            ]
        ),
        F.col("d"),
    )
    per = counts.select(
        "grp",
        "d",
        "n",
        F.sum("n").over(tot).alias("tot_n"),
        benford.alias("p"),
    ).select(
        "grp",
        "d",
        "n",
        "tot_n",
        "p",
        (
            (
                F.col("n").cast("double")
                - F.col("tot_n").cast("double") * F.col("p")
            )
            * (
                F.col("n").cast("double")
                - F.col("tot_n").cast("double") * F.col("p")
            )
            / (F.col("tot_n").cast("double") * F.col("p"))
        ).alias("term"),
    )
    # chi2 folds the nine digit terms in DIGIT order (sorted fold) so
    # both engines accumulate identically — bit-exact, not just close
    chi = per.groupBy("grp").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("d", "term"))),
            F.lit(0.0),
            lambda a, s: a + s["term"],
        ).alias("chi2")
    )
    return per.join(chi, "grp").select(
        "grp",
        F.col("d").alias("digit"),
        "n",
        (F.col("n").cast("double") / F.col("tot_n").cast("double"))
        .alias("share"),
        F.col("p").alias("benford_share"),
        "chi2",
    )


def lcs_pairs(
    df: DataFrame,
    T: int = 32,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Longest-common-subsequence length between ADJACENT keys'
    event-type sequences (key k paired with key k+1) over each key's
    first ``T`` events — the discrete-symbol sequence-alignment
    companion to :func:`dtw_distance` (DTW aligns continuous curves;
    LCS aligns behavioral step sequences, the similarity primitive
    behind session-clustering and bot-pattern detection).

    Classic O(n_a * n_b) integer DP::

        dp[i][j] = dp[i-1][j-1] + 1              if a_i == b_j
                   max(dp[i-1][j], dp[i][j-1])   otherwise

    run as an Arrow ``mapInPandas`` kernel over independent pair rows
    (each row carries both bounded sequences; no grouping state).
    All-integer arithmetic — the oracle's cell-by-cell recursive CTE
    replays it exactly.

    Scale: sequences are truncated to T events at the source (the
    window + filter prune before the pair join), the pairing is an
    equi-join on key+1, and each pair costs <= T^2 integer ops —
    embarrassingly parallel, no shuffle after the join.
    """
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    r = df.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("et"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= T)
    seqs = r.groupBy("key").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "et"))),
            lambda x: x["et"],
        ).alias("seq"),
        F.count(F.lit(1)).alias("n"),
    )
    a = seqs.select(
        F.col("key").alias("id_a"),
        F.col("seq").alias("sa"),
        F.col("n").alias("n_a"),
    )
    b = seqs.select(
        (F.col("key") - 1).alias("id_a"),
        F.col("key").alias("id_b"),
        F.col("seq").alias("sb"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(b, "id_a")

    out_schema = (
        "id_a long, id_b long, n_a long, n_b long, lcs_len long"
    )

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            lens = []
            for sa, sb in zip(pdf["sa"], pdf["sb"]):
                na, nb = len(sa), len(sb)
                prev = [0] * (nb + 1)
                for i in range(1, na + 1):
                    cur = [0]
                    ai = sa[i - 1]
                    for j in range(1, nb + 1):
                        if ai == sb[j - 1]:
                            cur.append(prev[j - 1] + 1)
                        else:
                            cur.append(max(prev[j], cur[j - 1]))
                    prev = cur
                lens.append(prev[nb])
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "n_a": pdf["n_a"],
                    "n_b": pdf["n_b"],
                    "lcs_len": lens,
                }
            )

    return pairs.mapInPandas(_kernel, out_schema)


def slo_burn(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_type: str = "error",
    slo: float = 0.75,
    fast_threshold: float = 1.1,
    slow_threshold: float = 1.02,
) -> DataFrame:
    """Multi-window error-budget burn-rate alerts — the SRE-workbook
    paging rule: page only when BOTH a fast window (1 h) and a slow
    window (6 h) burn the error budget faster than their thresholds,
    so a brief spike (fast-only) or a long slow leak (slow-only)
    doesn't page by itself.

    Burn rate is ``error_share / (1 - slo)``; with a 1 h fast window
    and a 6 h trailing slow window the classic thresholds scale with
    the budget.  Error/total counts per hour are exact BIGINTs; the
    6 h counts are RANGE-window integer sums over the hour index
    (hours with zero events contribute zero to both numerator and
    denominator, so the sparse form equals the dense form); each burn
    rate is ONE float division over exact integers, so the flags
    replay bit-identically in the oracle.

    Scale: one hour-grain hash aggregate over raw events (map-side
    partial, output rows = hours in retention), then one ordered
    window over that tiny hourly series.  The expensive pass is the
    first aggregate, which is exactly the 1h rollup tier the cascade
    already maintains — in production this reads the tier, not raw.
    """
    budget = 1.0 - slo
    hourly = df.select(
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
        .cast("long")
        .alias("hour"),
        (F.col(type_col) == error_type).cast("long").alias("is_err"),
    ).groupBy("hour").agg(
        F.count(F.lit(1)).alias("tot_1h"),
        F.sum("is_err").alias("err_1h"),
    )
    w6 = (
        Window.orderBy("hour").rangeBetween(-5, 0)
    )
    burn_f = (
        F.col("err_1h").cast("double")
        / F.col("tot_1h").cast("double")
        / F.lit(budget)
    )
    burn_s = (
        F.col("err_6h").cast("double")
        / F.col("tot_6h").cast("double")
        / F.lit(budget)
    )
    return (
        hourly.select(
            (F.col("hour") * 3600).alias("bucket_s"),
            "hour",
            "tot_1h",
            "err_1h",
            F.sum("tot_1h").over(w6).alias("tot_6h"),
            F.sum("err_1h").over(w6).alias("err_6h"),
        )
        .select(
            "bucket_s",
            "tot_1h",
            "err_1h",
            "tot_6h",
            "err_6h",
            burn_f.alias("burn_1h"),
            burn_s.alias("burn_6h"),
            (
                (burn_f > F.lit(fast_threshold))
                & (burn_s > F.lit(slow_threshold))
            ).alias("page"),
        )
    )


def top_paths(
    df: DataFrame,
    gap_seconds: int = 1800,
    prefix_len: int = 5,
    top_k: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Top-k session-opening paths: sessionize each key's event stream
    on an inactivity gap, take the first ``prefix_len`` event types of
    every session in time order, and count sessions per path string —
    the "how do journeys start" report behind funnel design.

    Determinism: session boundaries are exact integer second
    comparisons; the path is built by sorting (rank, type) structs and
    joining — never a collect_list ordering assumption; top-k ranks on
    (sessions DESC, path ASC).

    Scale: one key-window sessionize (islands), one (key, session)
    aggregate whose payload is a <= prefix_len struct array, one
    bounded path-count aggregate (path vocabulary, not session count),
    one global top-k over that bounded table.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("oid"),
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.lag(ts_col).over(w))
                > gap_seconds
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w2 = Window.partitionBy("key").orderBy("ts", "oid")
    sess = flagged.select(
        "key",
        "etype",
        "ts",
        "oid",
        F.sum("new_s")
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    w3 = Window.partitionBy("key", "sid").orderBy("ts", "oid")
    prefix = sess.select(
        "key",
        "sid",
        "etype",
        F.row_number().over(w3).alias("rn"),
    ).filter(F.col("rn") <= prefix_len)
    paths = prefix.groupBy("key", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "etype"))),
                lambda s: s["etype"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("sessions")
    )
    wt = Window.orderBy(F.col("sessions").desc(), F.col("path").asc())
    return counts.select(
        "path",
        "sessions",
        F.row_number().over(wt).alias("rank"),
    ).filter(F.col("rank") <= top_k)


def season_strength(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trend and seasonal STRENGTH (Hyndman tsfeatures / STL features)
    of each key's hourly series, from the classical decomposition:

        F_trend    = max(0, 1 - Var(resid) / Var(trend + resid))
        F_seasonal = max(0, 1 - Var(resid) / Var(seasonal + resid))

    — the two numbers a forecasting triage uses to route series
    (strongly seasonal -> seasonal model, strong trend -> drift term,
    neither -> mean reverter).

    Determinism: the decomposition components are single divisions of
    exact integers (see :func:`seasonal_decompose`), so both engines
    hold bit-identical doubles; each component is floor-quantized to
    milli-units and the three variances are exact BIGINT
    ``n*sum(x^2) - sum(x)^2`` forms; the strength ratios are shared
    final expressions.

    Scale: everything seasonal_decompose costs, plus one per-key hash
    aggregate.
    """
    dec = seasonal_decompose(df, key_col=key_col, ts_col=ts_col).filter(
        F.col("resid").isNotNull()
    )
    t = dec.select(
        "key",
        F.floor(F.lit(1000.0) * F.col("resid")).cast("long").alias("rm"),
        F.floor(F.lit(1000.0) * (F.col("trend") + F.col("resid")))
        .cast("long")
        .alias("dtm"),
        F.floor(F.lit(1000.0) * (F.col("seasonal") + F.col("resid")))
        .cast("long")
        .alias("dsm"),
    )
    a = t.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rm").alias("sr"),
        F.sum(F.col("rm") * F.col("rm")).alias("srr"),
        F.sum("dtm").alias("st"),
        F.sum(F.col("dtm") * F.col("dtm")).alias("stt"),
        F.sum("dsm").alias("ss"),
        F.sum(F.col("dsm") * F.col("dsm")).alias("sss"),
    )
    vr = F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")
    vdt = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    vds = F.col("n") * F.col("sss") - F.col("ss") * F.col("ss")
    return a.select(
        "key",
        "n",
        F.when(
            vdt > 0,
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - vr.cast("double") / vdt.cast("double"),
            ),
        ).alias("trend_strength"),
        F.when(
            vds > 0,
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - vr.cast("double") / vds.cast("double"),
            ),
        ).alias("seasonal_strength"),
    )


def mase_backtest(
    df: DataFrame,
    season: int = 24,
    holdout: int = 24,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Seasonal-naive forecast backtest scored by MASE (Hyndman &
    Koehler 2006) per key: the last ``holdout`` hours are predicted by
    the value one season earlier, and the mean absolute error is
    scaled by the in-sample one-step naive MAE — the scale-free
    yardstick every forecasting bakeoff starts from (MASE < 1 beats
    the naive forecaster).

    All error sums are exact BIGINT (|integer - integer|); the two
    means and their ratio are shared final expressions.

    Scale: one dense-grid window pass per key (lag(season) + lag(1)),
    two bounded aggregates.
    """
    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
            .cast("long")
            .alias("hour"),
        )
        .groupBy("key", "hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bounds = hourly.groupBy("key").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    grid = bounds.select(
        "key",
        F.col("hi"),
        F.explode(
            F.sequence(F.col("lo").cast("int"), F.col("hi").cast("int"))
        ).alias("hour_i"),
    ).select("key", "hi", F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, ["key", "hour"], "left").select(
        "key", "hi", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("key").orderBy("hour")
    lagged = dense.select(
        "key",
        "hi",
        "hour",
        "cnt",
        F.lag("cnt", season).over(w).alias("season_lag"),
        F.lag("cnt", 1).over(w).alias("prev"),
    )
    is_hold = F.col("hour") > F.col("hi") - F.lit(holdout)
    agg = lagged.groupBy("key").agg(
        F.sum(
            F.when(
                is_hold & F.col("season_lag").isNotNull(),
                F.abs(F.col("cnt") - F.col("season_lag")),
            )
        ).alias("err_f"),
        F.sum(
            F.when(is_hold & F.col("season_lag").isNotNull(), F.lit(1))
        ).alias("n_hold"),
        F.sum(
            F.when(
                (~is_hold) & F.col("prev").isNotNull(),
                F.abs(F.col("cnt") - F.col("prev")),
            )
        ).alias("err_naive"),
        F.sum(
            F.when((~is_hold) & F.col("prev").isNotNull(), F.lit(1))
        ).alias("n_train"),
    )
    mae_f = F.col("err_f").cast("double") / F.col("n_hold").cast("double")
    mae_n = (
        F.col("err_naive").cast("double")
        / F.col("n_train").cast("double")
    )
    return agg.filter(
        (F.col("n_hold") > 0) & (F.col("n_train") > 0)
    ).select(
        "key",
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_hold").cast("long").alias("n_hold"),
        mae_f.alias("mae_forecast"),
        F.when(F.col("err_naive") > 0, mae_f / mae_n).alias("mase"),
    )


def cuped(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    pre_days: int = 15,
    salt: str = "exp1",
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    "Improving the Sensitivity of Online Controlled Experiments"):
    adjust each arm's post-period metric by the pooled pre-period
    covariate, the standard trick that cuts A/B confidence intervals
    30-50% when pre activity predicts post activity.

        theta    = cov(X, Y) / var(X)          (pooled, pre vs post)
        Y'_arm   = mean(Y_a) - theta * (mean(X_a) - mean(X_pool))

    Arms are assigned deterministically by the repo's md5-bucket idiom
    (pipeline/sampling.py::hash_bucket, 2 buckets) so both engines
    place every user identically.  X = user's event count in the first
    ``pre_days`` days, Y = count after — exact BIGINTs, so theta and
    the adjusted means are single shared float expressions of exact
    integer sums (n*Sxy - Sx*Sy over n*Sxx - Sx*Sx etc.), identical in
    both engines.  Also reports the pooled variance-reduction factor
    rho^2 = cov^2/(var_x*var_y).

    Scale: two hash aggregates (user grain, then arm grain) plus one
    broadcast of the 1-row pooled stats — no window, no iteration.

    Output: arm, n_users, mean_y, mean_y_cuped, theta, rho2.
    """
    from tsaug_spark.pipeline.sampling import hash_bucket

    lo = df.select(F.min(F.unix_timestamp(F.col(ts_col))).alias("lo"))
    per_user = (
        df.crossJoin(F.broadcast(lo))
        .select(
            F.col(user_col).alias("u"),
            (
                F.floor((F.unix_timestamp(F.col(ts_col)) - F.col("lo"))
                        / 86400)
                < F.lit(int(pre_days))
            ).alias("is_pre"),
        )
        .groupBy("u")
        .agg(
            F.sum(F.when(F.col("is_pre"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("is_pre"), 0).otherwise(1))
            .cast("long")
            .alias("y"),
        )
        .withColumn(
            "arm",
            F.when(
                hash_bucket("u", salt=salt, n_buckets=2) == 0,
                F.lit("control"),
            ).otherwise(F.lit("treatment")),
        )
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).select(
        # cov/var factors cast to double BEFORE multiplying: the
        # n*Sxy - Sx*Sy terms are exact int64 (linear in user count),
        # but their SQUARES would overflow int64 at ~1e6 users — the
        # float product of exact-int-derived doubles is identical in
        # both engines and overflow-free.
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("double")
        ).alias("theta"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                .cast("double")
            )
        ).alias("rho2"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "mean_x_pool"
        ),
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("x").alias("sx_a"),
            F.sum("y").alias("sy_a"),
        )
        .crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            "n_users",
            (F.col("sy_a").cast("double") / F.col("n_users").cast("double"))
            .alias("mean_y"),
            (
                F.col("sy_a").cast("double") / F.col("n_users").cast("double")
                - F.col("theta")
                * (
                    F.col("sx_a").cast("double")
                    / F.col("n_users").cast("double")
                    - F.col("mean_x_pool")
                )
            ).alias("mean_y_cuped"),
            "theta",
            "rho2",
        )
    )


def croston(
    df: DataFrame,
    key_col: str = "l_partkey",
    ts_col: str = "l_shipdate",
    qty_col: str = "l_quantity",
    alpha_div: int = 8,
    max_obs: int = 24,
    min_obs: int = 4,
) -> DataFrame:
    """Croston's method for intermittent demand (Croston 1972): the
    standard forecaster when a series is MOSTLY ZEROS — per-part daily
    ship quantities here — where plain EWMA/Holt systematically lag.
    Two coupled exponential smoothers run only on demand OCCURRENCES:

        z_t = z_{t-1} + (q_t - z_{t-1}) / 8     (demand size)
        p_t = p_{t-1} + (i_t - p_{t-1}) / 8     (inter-demand interval)
        forecast per day = z_t / p_t

    Exactness: quantities are integral and intervals are day counts,
    so with micro-unit state (1e6) and alpha = 1/8 as an integer FLOOR
    division the whole recursion is BIGINT — the page_hinkley idiom;
    the oracle replays each of the <= ``max_obs`` steps in a recursive
    CTE (all keys advance together per iteration, the proven fixed-K
    pattern), with the explicit negative-remainder floor correction
    for DuckDB's truncating division.  Only the final forecast is a
    float: ONE shared division of exact integers.

    Determinism / bound: each key's first ``max_obs`` demand days (by
    day order) feed the recursion — a stated policy cap that bounds
    oracle iterations and kernel state alike; keys need ``min_obs``
    demand days to report.

    Scale: one hash aggregate to (key, day) totals, one ranked window
    to cap, one grouped Arrow kernel with O(1) integer state per key.

    Output: key, n_obs, z_micro, p_micro, forecast.
    """
    import pandas as pd  # noqa: F401  (kernel import)

    q = 1_000_000
    a = int(alpha_div)
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.col(qty_col),
        )
        .groupBy("key", "day")
        .agg(F.round(F.sum(qty_col)).cast("long").alias("qty"))
    )
    w = Window.partitionBy("key").orderBy("day")
    capped = (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(int(max_obs)))
        .withColumn("prev_day", F.lag("day").over(w))
    )
    eligible = (
        capped.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .filter(F.col("n_obs") >= F.lit(int(min_obs)))
        .select("key", "n_obs")
    )
    base = capped.join(eligible, "key").select(
        "key", "n_obs", "rn", "qty",
        F.coalesce(F.col("day") - F.col("prev_day"), F.lit(1))
        .cast("long")
        .alias("gap"),
    )

    out_schema = (
        "key long, n_obs long, z_micro long, p_micro long, "
        "forecast double"
    )

    def _kernel(pdf):
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        z = int(pdf["qty"].iloc[0]) * q
        p = q  # first interval defined as 1 day
        for t in range(1, len(pdf)):
            z = z + (int(pdf["qty"].iloc[t]) * q - z) // a
            p = p + (int(pdf["gap"].iloc[t]) * q - p) // a
        return pd.DataFrame(
            {
                "key": [int(pdf["key"].iloc[0])],
                "n_obs": [int(pdf["n_obs"].iloc[0])],
                "z_micro": [z],
                "p_micro": [p],
                "forecast": [float(z) / float(p)],
            }
        )

    return base.groupBy("key").applyInPandas(_kernel, out_schema)


def ratio_ci_delta(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    num_type: str = "purchase",
    den_type: str = "click",
    salt: str = "exp1",
    z_x100: int = 196,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric per
    experiment arm (Deng et al. 2017, "Trustworthy Analysis of Online
    A/B Tests"): the per-arm conversion ratio R = sum(x_u)/sum(y_u)
    is a ratio of user-level sums, so its variance is NOT the binomial
    one — the randomization unit (user) differs from the analysis unit
    (event), and the Taylor/delta expansion

        Var(R) ~= ( Sxx - 2R*Sxy + R^2*Syy ) / (n * ybar^2)

    (S** = sample covariances of the user-level numerators/denominators)
    is the standard correction every experimentation platform ships.

    Arms are the repo's deterministic md5 buckets (same idiom as
    :func:`cuped`).  x_u (purchases) and y_u (clicks) are exact
    BIGINTs; n, Sx, Sy, Sxx, Sxy, Syy are exact int64 sums, and R, the
    variance, and the z*se band are single shared float expression
    trees of those integers — identical in both engines.  The n*Sab -
    Sa*Sb factors are cast to double BEFORE multiplying (the cuped
    overflow rule).

    Scale: one user-grain hash aggregate, one arm-grain hash
    aggregate; 2-row output.
    """
    from tsaug_spark.pipeline.sampling import hash_bucket

    per_user = (
        df.select(
            F.col(user_col).alias("u"),
            F.when(F.col(type_col) == num_type, 1)
            .otherwise(0)
            .alias("xi"),
            F.when(F.col(type_col) == den_type, 1)
            .otherwise(0)
            .alias("yi"),
        )
        .groupBy("u")
        .agg(
            F.sum("xi").cast("long").alias("x"),
            F.sum("yi").cast("long").alias("y"),
        )
        .filter(F.col("y") > 0)
        .withColumn(
            "arm",
            F.when(
                hash_bucket("u", salt=salt, n_buckets=2) == 0,
                F.lit("control"),
            ).otherwise(F.lit("treatment")),
        )
    )
    sums = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nf = F.col("n").cast("double")
    r = F.col("sx").cast("double") / F.col("sy").cast("double")
    ybar = F.col("sy").cast("double") / nf
    cxx = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
    )
    cxy = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
    )
    cyy = (
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
    )
    var_u = (cxx - F.lit(2.0) * r * cxy + r * r * cyy) / (nf * nf)
    se = F.sqrt(var_u / (nf * ybar * ybar))
    z = F.lit(int(z_x100)).cast("double") / F.lit(100.0)
    return sums.select(
        "arm",
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("numer"),
        F.col("sy").cast("long").alias("denom"),
        r.alias("ratio"),
        se.alias("se"),
        (r - z * se).alias("ci_lo"),
        (r + z * se).alias("ci_hi"),
    )


def cmh_odds(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    exposure_type: str = "click",
    outcome_type: str = "purchase",
    salt: str = "exp1",
    scale: int = 10**6,
) -> DataFrame:
    """Cochran-Mantel-Haenszel common odds ratio across day strata
    (Mantel & Haenszel 1959): does treatment lift the click->purchase
    conversion odds CONSISTENTLY once the day-of-launch mix is
    stratified out?  The unstratified ("marginal") odds ratio is
    Simpson's-paradox bait when arms ramp unevenly across days — CMH
    is the standard fix every experimentation platform reports.

    Unit: a (user, day) cell with >= 1 exposure event that day;
    success = >= 1 outcome event the same day; arm = the repo's
    deterministic md5 bucket of the user.  Per stratum i the 2x2 is
    (a=treated successes, b=treated failures, c=control successes,
    d=control failures), n_i the stratum total, and

        OR_mh = Sum_i (a_i d_i / n_i)  /  Sum_i (b_i c_i / n_i)

    computed in FIXED POINT: each term is the exact int64
    ``(a*d*scale) div n`` so the sums commute and both engines agree
    bit-exactly; the single float is the final ratio.  Bound: a*d <=
    (n/2)^2, so n_i < ~3e6 per stratum keeps a*d*scale < 2^63 — at
    larger per-day volume, stratify finer (day x region) or drop
    scale, which only coarsens the quantization identically in both
    engines.

    Scale plan: one (user, day) hash aggregate absorbs event volume,
    one (day, arm) aggregate to the 2x2s, one scalar fold — no joins.
    """
    from tsaug_spark.pipeline.sampling import hash_bucket

    ud = (
        df.filter(F.col(type_col).isin([exposure_type, outcome_type]))
        .select(
            F.col(user_col).alias("u"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            (F.col(type_col) == exposure_type)
            .cast("long")
            .alias("is_exp"),
            (F.col(type_col) == outcome_type)
            .cast("long")
            .alias("is_out"),
        )
        .groupBy("u", "day")
        .agg(
            F.max("is_exp").alias("exposed"),
            F.max("is_out").alias("converted"),
        )
        .filter(F.col("exposed") == 1)
        .withColumn(
            "treated",
            (hash_bucket("u", salt=salt, n_buckets=2) == 1).cast(
                "long"
            ),
        )
    )
    cells = ud.groupBy("day").agg(
        F.sum(
            F.col("treated") * F.col("converted")
        ).alias("a"),
        F.sum(
            F.col("treated") * (F.lit(1) - F.col("converted"))
        ).alias("b"),
        F.sum(
            (F.lit(1) - F.col("treated")) * F.col("converted")
        ).alias("c"),
        F.sum(
            (F.lit(1) - F.col("treated"))
            * (F.lit(1) - F.col("converted"))
        ).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    agg = cells.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum("c").alias("sc_"),
        F.sum("d").alias("sd"),
        F.sum(F.expr(f"(a * d * {int(scale)}) div n")).alias(
            "num_micro"
        ),
        F.sum(F.expr(f"(b * c * {int(scale)}) div n")).alias(
            "den_micro"
        ),
    )
    return agg.select(
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("sa").cast("long").alias("treated_conv"),
        F.col("sb").cast("long").alias("treated_nonconv"),
        F.col("sc_").cast("long").alias("control_conv"),
        F.col("sd").cast("long").alias("control_nonconv"),
        F.col("num_micro").cast("long").alias("num_micro"),
        F.col("den_micro").cast("long").alias("den_micro"),
        F.when(
            F.col("den_micro") > 0,
            F.col("num_micro").cast("double")
            / F.col("den_micro").cast("double"),
        ).otherwise(F.lit(0.0)).alias("or_mh"),
    )


def did_estimate(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    outcome_type: str = "purchase",
    salt: str = "exp1",
) -> DataFrame:
    """Difference-in-differences point estimate (Card & Krueger 1994
    canon): split the horizon at its integer midpoint day, compute the
    mean outcome count per ACTIVE user in each (arm, period) cell, and
    report

        DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre)

    — the parallel-trends-adjusted lift that survives a level
    difference between arms that existed before the launch.

    Determinism: the split day is the exact integer
    ``(min_day + max_day + 1) div 2`` broadcast from a 1-row global
    aggregate; activity counts and outcome counts are exact BIGINTs
    per (user, period); each cell mean is ONE float division and the
    DiD is a fixed-shape tree of those four leaves, identical in both
    engines.

    Scale: one scalar aggregate (broadcast), one (user, period) hash
    aggregate, one 4-row cell aggregate, one pivot of 4 rows.
    """
    from tsaug_spark.pipeline.sampling import hash_bucket

    dayc = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast(
        "long"
    )
    span = df.agg(
        F.min(dayc).alias("mnd"), F.max(dayc).alias("mxd")
    ).select(F.expr("(mnd + mxd + 1) div 2").alias("split_day"))
    up = (
        df.crossJoin(F.broadcast(span))
        .select(
            F.col(user_col).alias("u"),
            (dayc >= F.col("split_day")).cast("long").alias("post"),
            (F.col(type_col) == outcome_type)
            .cast("long")
            .alias("is_out"),
            "split_day",
        )
        .groupBy("u", "post")
        .agg(
            F.sum("is_out").alias("x"),
            F.min("split_day").alias("split_day"),
        )
        .withColumn(
            "treated",
            (hash_bucket("u", salt=salt, n_buckets=2) == 1).cast(
                "long"
            ),
        )
    )
    cells = up.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.min("split_day").alias("split_day"),
    )
    wide = cells.agg(
        F.min("split_day").alias("split_day"),
        *[
            F.sum(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p),
                    F.col(c),
                ).otherwise(F.lit(0))
            ).alias(f"{c}_{'t' if t else 'c'}{'post' if p else 'pre'}")
            for t in (1, 0)
            for p in (1, 0)
            for c in ("n", "sx")
        ],
    )
    def mean(tag: str):
        return F.col(f"sx_{tag}").cast("double") / F.col(
            f"n_{tag}"
        ).cast("double")

    did = (mean("tpost") - mean("tpre")) - (
        mean("cpost") - mean("cpre")
    )
    return wide.select(
        F.col("split_day").cast("long").alias("split_day"),
        *[
            F.col(f"{c}_{tag}").cast("long").alias(f"{c}_{tag}")
            for tag in ("tpre", "tpost", "cpre", "cpost")
            for c in ("n", "sx")
        ],
        mean("tpre").alias("mean_t_pre"),
        mean("tpost").alias("mean_t_post"),
        mean("cpre").alias("mean_c_pre"),
        mean("cpost").alias("mean_c_post"),
        did.alias("did"),
    )


def attribution_models(
    df: DataFrame,
    touch_types: tuple = ("click", "view"),
    conv_type: str = "purchase",
    window_s: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    scale: int = 10**6,
) -> DataFrame:
    """Multi-touch attribution under four standard credit models at
    once — first-touch, last-touch, linear, U-shaped (40/20/40) — per
    touch event type: the marketing-analytics workhorse that decides
    budget, computed over the lookback window before each conversion.

    Per conversion, its path is every touch event of the same user
    within ``window_s`` seconds strictly before it (ties broken on
    ``order_col``); positions come from row_number over (ts, order)
    within the path.  Credits are INTEGERS in 1/scale units so sums
    are fold-order-free and both engines agree exactly:

        first:  scale to position 1
        last:   scale to position L
        linear: scale div L to every touch (remainder discarded —
                documented, identical in both engines)
        ushape: L=1 -> scale; L=2 -> scale/2 each; else 40% ends,
                (20% div (L-2)) middles

    Scale plan: the touch-to-conversion pairing is a per-user
    interval join — production buckets it by (user, day) exactly like
    plans/range_join.py so each conversion probes only its own and
    the preceding bucket; path length is bounded by the lookback
    window.  One window pass per conversion path, one vocabulary-
    grain aggregate.
    """
    t = df.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("tts"),
        F.col(order_col).alias("tid"),
        F.col(type_col).alias("touch"),
    )
    c = df.filter(F.col(type_col) == conv_type).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("cts"),
        F.col(order_col).alias("cid"),
    )
    paired = t.join(c, "u").filter(
        (
            (F.col("tts") < F.col("cts"))
            | (
                (F.col("tts") == F.col("cts"))
                & (F.col("tid") < F.col("cid"))
            )
        )
        & (
            F.unix_timestamp("tts")
            >= F.unix_timestamp("cts") - F.lit(int(window_s))
        )
    )
    wp = Window.partitionBy("cid").orderBy("tts", "tid")
    wl = Window.partitionBy("cid")
    pos = paired.select(
        "touch",
        F.row_number().over(wp).alias("r"),
        F.count(F.lit(1)).over(wl).alias("len"),
    )
    sc = int(scale)
    first_c = F.when(F.col("r") == 1, F.lit(sc)).otherwise(F.lit(0))
    last_c = F.when(F.col("r") == F.col("len"), F.lit(sc)).otherwise(
        F.lit(0)
    )
    linear_c = F.expr(f"{sc} div len")
    ushape_c = (
        F.when(F.col("len") == 1, F.lit(sc))
        .when(F.col("len") == 2, F.lit(sc // 2))
        .otherwise(
            F.when(
                (F.col("r") == 1) | (F.col("r") == F.col("len")),
                F.lit(sc * 4 // 10),
            ).otherwise(F.expr(f"{sc * 2 // 10} div (len - 2)"))
        )
    )
    return (
        pos.groupBy("touch")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(first_c).alias("first_micro"),
            F.sum(last_c).alias("last_micro"),
            F.sum(linear_c).alias("linear_micro"),
            F.sum(ushape_c).alias("ushape_micro"),
        )
        .select(
            "touch",
            F.col("n_touches").cast("long").alias("n_touches"),
            F.col("first_micro").cast("long").alias("first_micro"),
            F.col("last_micro").cast("long").alias("last_micro"),
            F.col("linear_micro").cast("long").alias("linear_micro"),
            F.col("ushape_micro").cast("long").alias("ushape_micro"),
        )
    )


def rate_ratio_test(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    outcome_type: str = "purchase",
) -> DataFrame:
    """Two-period Poisson rate-ratio test around the horizon's integer
    midpoint day — "did the purchase RATE change after the launch?"
    by the exact-conditional construction (Przyborowski & Wilenski
    1940): given N = x1 + x2 total events, x2 ~ Binomial(N, p0) under
    H0 with p0 = n2/(n1+n2) the post-period's share of exposure days,
    so

        z = (x2 - N*p0) / sqrt(N * p0 * (1 - p0))

    Everything left of the float tree is an exact BIGINT: the split
    day, the day-count exposures n1/n2, and the two event counts.  p0
    and z are fixed-shape expressions of those integers.

    Scale: one scalar span aggregate (broadcast), one filtered count
    aggregate; 1-row output.
    """
    dayc = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast(
        "long"
    )
    span = df.agg(
        F.min(dayc).alias("mnd"), F.max(dayc).alias("mxd")
    ).select(
        "mnd",
        "mxd",
        F.expr("(mnd + mxd + 1) div 2").alias("split_day"),
    )
    counts = (
        df.filter(F.col(type_col) == outcome_type)
        .crossJoin(F.broadcast(span))
        .agg(
            F.sum(
                (dayc < F.col("split_day")).cast("long")
            ).alias("x1"),
            F.sum(
                (dayc >= F.col("split_day")).cast("long")
            ).alias("x2"),
            F.min("mnd").alias("mnd"),
            F.min("mxd").alias("mxd"),
            F.min("split_day").alias("split_day"),
        )
    )
    n1 = (F.col("split_day") - F.col("mnd")).cast("long")
    n2 = (F.col("mxd") - F.col("split_day") + 1).cast("long")
    nn = (F.col("x1") + F.col("x2")).cast("double")
    p0 = n2.cast("double") / (n1 + n2).cast("double")
    # Degenerate-horizon guards (ANSI mode turns /0 into an error, not
    # inf): n1 = 0 on a single-day horizon (p0 = 1, z denominator 0,
    # pre-rate undefined) and nn = 0 when there are no outcome events.
    # Both branches yield NULL test statistics instead of erroring —
    # n2 >= 1 always (split_day <= mxd by construction).
    ok = (n1 > F.lit(0)) & (nn > F.lit(0.0))
    z = F.when(
        ok,
        (F.col("x2").cast("double") - nn * p0)
        / F.sqrt(nn * p0 * (F.lit(1.0) - p0)),
    )
    rr = F.when(
        ok & (F.col("x1") > F.lit(0)),
        (F.col("x2").cast("double") / n2.cast("double"))
        / (F.col("x1").cast("double") / n1.cast("double")),
    )
    return counts.select(
        F.col("x1").cast("long").alias("pre_events"),
        F.col("x2").cast("long").alias("post_events"),
        n1.alias("pre_days"),
        n2.alias("post_days"),
        rr.alias("rate_ratio"),
        z.alias("z"),
        F.when(ok, F.abs(z) > F.lit(1.96)).alias("significant"),
    )


def littles_law(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: int = 1800,
) -> DataFrame:
    """Per-day Little's-law audit of the session stream: measured
    time-average concurrency L vs the lambda*W the law predicts
    (Little 1961) — the queueing sanity check an ops dashboard runs
    over :func:`concurrency` and the sessionizer ("if these disagree,
    your session definition or your load balancer is lying").

    Sessions are the repo-standard gap sessions (break at
    diff >= gap, matching sessionize_native's half-open contract);
    a session is "in system" over [first_event, last_event].  Per
    day d:

        busy_s    = sum over sessions of overlap with day d (BIGINT)
        started_s = sum of durations of sessions STARTING in d
        L         = busy_s / 86400,   lambda*W = started_s / 86400,
        ratio     = busy_s / started_s

    ratio ~ 1 when arrivals are stationary; boundary-crossing
    sessions push it off 1 exactly as queueing theory says.  ALL
    sums are exact BIGINT second counts; the three readouts are one
    float division each.

    Scale: one user-ordered window (the sessionizer), one
    (user, session) aggregate, one bounded day-span explode
    (sessions are gap-bounded, so the span is tiny), two day
    aggregates merged by one co-partitioned join on day.

    Output: bucket_s, n_started, busy_s, started_s, l_avg,
    lambda_w, ratio.
    """
    ev = df.select(
        F.col(user_col).alias("u"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("s"),
    )
    wo = Window.partitionBy("u").orderBy("s")
    brk = F.when(
        F.lag("s").over(wo).isNull()
        | (F.col("s") - F.lag("s").over(wo) >= F.lit(int(gap))),
        1,
    ).otherwise(0)
    marked = ev.select(
        "u", "s", F.sum(brk).over(wo).alias("sid")
    )
    sess = marked.groupBy("u", "sid").agg(
        F.min("s").alias("st"), F.max("s").alias("en")
    )
    span = sess.select(
        "st",
        "en",
        F.floor(F.col("st") / 86400).cast("long").alias("d0"),
        F.floor(F.col("en") / 86400).cast("long").alias("d1"),
    )
    days = span.select(
        "st",
        "en",
        F.explode(
            F.sequence(F.col("d0").cast("int"), F.col("d1").cast("int"))
        ).alias("di"),
    ).select("st", "en", F.col("di").cast("long").alias("d"))
    busy = days.select(
        "d",
        (
            F.least(F.col("en"), (F.col("d") + 1) * 86400)
            - F.greatest(F.col("st"), F.col("d") * 86400)
        ).alias("ov"),
    ).groupBy("d").agg(F.sum("ov").alias("busy_s"))
    started = span.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).alias("n_started"),
        F.sum(F.col("en") - F.col("st")).alias("started_s"),
    )
    # FULL join: a day can hold only carried-over sessions (busy with
    # nothing started — the midnight tail) or only zero-length starts
    j = started.join(busy, "d", "full").select(
        "d",
        F.coalesce("n_started", F.lit(0)).alias("n_started"),
        F.coalesce("started_s", F.lit(0)).alias("started_s"),
        F.coalesce("busy_s", F.lit(0)).alias("busy_s"),
    )
    return j.select(
        (F.col("d") * 86400).alias("bucket_s"),
        F.col("n_started").cast("long").alias("n_started"),
        F.col("busy_s").cast("long").alias("busy_s"),
        F.col("started_s").cast("long").alias("started_s"),
        (F.col("busy_s").cast("double") / F.lit(86400.0)).alias(
            "l_avg"
        ),
        (F.col("started_s").cast("double") / F.lit(86400.0)).alias(
            "lambda_w"
        ),
        F.when(
            F.col("started_s") > 0,
            F.col("busy_s").cast("double")
            / F.col("started_s").cast("double"),
        ).alias("ratio"),
    )
