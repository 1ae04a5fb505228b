"""Robust / distributional statistics over the event series.

The rollup family (plans/rollup.py) and the gauge transforms
(plans/metrics.py) cover the algebraic and spacing-sensitive bucket
aggregates.  This module adds the *statistical screening* layer a
production telemetry store runs on top of those series — robust trend
estimation, distribution drift, proportion confidence intervals, peak
detection, and activity streaks:

* :func:`theil_sen` — Theil–Sen robust slope per key over its daily
  totals (median of all pairwise slopes; a 29% contamination breakdown
  point vs 0% for OLS);
* :func:`ks_distance` — two-sample Kolmogorov–Smirnov statistic per
  key between the value distributions of two event types (distribution
  drift / A-B divergence screen);
* :func:`wilson_interval` — Wilson score 95% confidence interval for a
  per-(key, day) success proportion (the small-n-safe replacement for
  the normal-approximation interval);
* :func:`peak_detect` — strict local maxima with prominence on the
  dense zero-filled hourly count series per key;
* :func:`active_streaks` — gaps-and-islands longest consecutive-day
  activity streak per key.

Determinism contract (shared with every oracled query in the repo):
inputs are integerized first (cents = round(value*100) as BIGINT, day
and hour indexes as BIGINT), every aggregate runs on exact integers,
and each float appears as ONE shared arithmetic expression evaluated
identically by Spark and DuckDB — medians are rank-selected, never
engine percentiles.

Scale notes (10^12 turns): each transform is one (key)- or (key,
bucket)-hash shuffle plus at most one ordered window with O(1)-row
state.  ``theil_sen`` is the only superlinear one — O(d^2) pairs per
key where d = number of active DAYS, which is bounded by the retention
horizon (e.g. 730 for two years), never by event volume; the self-join
is co-partitioned on the key so no pair ever crosses executors.
``ks_distance`` is linear in distinct values per key.  No UDFs, no
driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsaug_spark.lineage import truncate_lineage, truncate_lineage_lazy


def _day_cents(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exact per-(key, day) integer totals: the shared integerized base."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("key", "day")
        .agg(F.sum("cents").alias("cents"))
    )


def theil_sen(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Theil–Sen slope of each key's daily total, in cents/day.

    Slope = median over all day-pairs (i < j) of
    (cents_j - cents_i) / (day_j - day_i).  Each pairwise slope is one
    division of exact BIGINTs (deterministic double); the median is
    rank-selected with (slope, day_i, day_j) tie-break and averages the
    two middle ranks for even pair counts — bit-reproducible, never an
    engine PERCENTILE.

    Scale: daily totals per key are bounded by the retention horizon
    (d days -> d(d-1)/2 pairs), so the self-join after the (key, day)
    rollup is a co-partitioned quadratic in DAYS, linear in events.
    One shuffle for the rollup, one for the key-join (AQE coalesced).
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    a = d.select(
        "key",
        F.col("day").alias("d1"),
        F.col("cents").alias("c1"),
    )
    b = d.select(
        "key",
        F.col("day").alias("d2"),
        F.col("cents").alias("c2"),
    )
    pairs = (
        a.join(b, "key")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "key",
            "d1",
            "d2",
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("key").orderBy("slope", "d1", "d2")
    cw = Window.partitionBy("key")
    ranked = pairs.select(
        "key",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("m"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    )
    days = d.groupBy("key").agg(F.count(F.lit(1)).alias("n_days"))
    med = mid.groupBy("key").agg(
        F.first("m").alias("n_pairs"),
        (F.sum("slope") / F.count(F.lit(1))).alias("slope_cents_per_day"),
    )
    return days.join(med, "key").select(
        "key", "n_days", "n_pairs", "slope_cents_per_day"
    )


def ks_distance(
    df: DataFrame,
    type_a: str,
    type_b: str,
    key_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Two-sample KS statistic per key between two event types' values.

    Values are cents-integerized; per (key, cents) the counts of each
    sample are cumulated along the sorted value axis, the two ECDFs are
    each one exact-integer division, and KS = max |F_a - F_b| over the
    union of observed values (where the step functions change — the
    sup over all x).  Keys missing either sample are dropped (KS is
    undefined there).

    Scale: one (key, cents) hash aggregate, one per-key ordered window
    with O(1) running state, one per-key max — a single shuffle chain
    partitioned on the key, linear in distinct values.
    """
    ev = df.filter(
        F.col(type_col).isin([type_a, type_b])
    ).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    per_val = ev.groupBy("key", "cents").agg(
        F.sum(
            F.when(F.col("etype") == type_a, F.lit(1)).otherwise(F.lit(0))
        ).alias("ca"),
        F.sum(
            F.when(F.col("etype") == type_b, F.lit(1)).otherwise(F.lit(0))
        ).alias("cb"),
    )
    w = Window.partitionBy("key").orderBy("cents")
    cw = Window.partitionBy("key")
    cum = per_val.select(
        "key",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(cw).alias("n_a"),
        F.sum("cb").over(cw).alias("n_b"),
    )
    return (
        cum.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "key",
            "n_a",
            "n_b",
            F.abs(
                F.col("cum_a").cast("double") / F.col("n_a").cast("double")
                - F.col("cum_b").cast("double")
                / F.col("n_b").cast("double")
            ).alias("d"),
        )
        .groupBy("key")
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max("d").alias("ks"),
        )
    )


def wilson_interval(
    df: DataFrame,
    success_type: str = "purchase",
    trial_types: tuple[str, ...] = ("click", "purchase"),
    z: float = 1.96,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Wilson score 95% CI for the per-(key, day) success proportion.

    k = successes, n = trials (both exact BIGINT counts); the bounds

        (k + z^2/2 -+ z * sqrt(k*(n-k)/n + z^2/4)) / (n + z^2)

    are one shared float expression — written identically in the
    DuckDB oracle so the doubles match bit-for-bit.  Unlike the normal
    approximation, the Wilson interval never leaves [0, 1] and stays
    calibrated at n = 1.

    Scale: exactly one (key, day) hash aggregate with map-side partial
    counts, then a projection.
    """
    ev = df.filter(F.col(type_col).isin(list(trial_types))).select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
        F.when(F.col(type_col) == success_type, F.lit(1))
        .otherwise(F.lit(0))
        .alias("succ"),
    )
    agg = ev.groupBy("key", "day").agg(
        F.sum("succ").alias("k"), F.count(F.lit(1)).alias("n")
    )
    lo, hi = wilson_bounds(z)
    return agg.select(
        "key", "day", "k", "n",
        lo.alias("wilson_lo"), hi.alias("wilson_hi"),
    )


def wilson_bounds(z: float = 1.96):
    """The Wilson score bound expressions over exact (k, n) count
    columns — the one shared float tree, used by the batch
    :func:`wilson_interval` AND the watermarked streaming twin
    (streaming/stream_rollup.py::stream_wilson); counts are algebraic,
    so the CI is a legal streaming aggregate readout."""
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    zl = F.lit(z)
    half = zl * F.sqrt(kd * (nd - kd) / nd + zl * zl / F.lit(4.0))
    denom = nd + zl * zl
    return (
        (kd + zl * zl / F.lit(2.0) - half) / denom,
        (kd + zl * zl / F.lit(2.0) + half) / denom,
    )


def peak_detect(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    min_prominence: int = 1,
) -> DataFrame:
    """Strict local maxima on the dense zero-filled hourly count series.

    Per key the hourly counts are placed on the full [min, max] hour
    grid (missing hours count 0 — a gap next to a spike must read as a
    valley, not be skipped), then a bucket is a peak when its count is
    strictly greater than both neighbours and its prominence
    (cnt - max(left, right)) is at least ``min_prominence``.  Grid
    edges are excluded (no one-sided peaks).  All-integer arithmetic.

    Scale: one (key, hour) count aggregate, one bounded grid explode
    (``sequence`` over the key's own hour span — retention-bounded),
    one lag/lead window per key.  Single shuffle chain on the key.
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
        F.explode(
            F.sequence(
                F.col("lo").cast("int"), F.col("hi").cast("int")
            )
        ).alias("hour_i"),
    ).select("key", F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, ["key", "hour"], "left").select(
        "key", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("key").orderBy("hour")
    lagged = dense.select(
        "key",
        "hour",
        "cnt",
        F.lag("cnt").over(w).alias("prev"),
        F.lead("cnt").over(w).alias("nxt"),
    )
    return lagged.filter(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("cnt") > F.col("prev"))
        & (F.col("cnt") > F.col("nxt"))
        & (
            F.col("cnt") - F.greatest("prev", "nxt")
            >= F.lit(min_prominence)
        )
    ).select(
        "key",
        (F.col("hour") * 3600).alias("bucket_s"),
        "cnt",
        "prev",
        "nxt",
        (F.col("cnt") - F.greatest("prev", "nxt")).alias("prominence"),
    )


def allan_variance(
    df: DataFrame,
    taus: tuple[str, ...] = ("1h", "2h", "4h"),
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Allan variance of the per-bucket mean value at several
    averaging times — the clock-stability statistic
    AVAR(tau) = (1/(2M)) * sum_i (ybar_{i+1} - ybar_i)^2 over the M
    ADJACENT bucket pairs (bucket index differs by exactly 1; a gap
    breaks the pair, it is never bridged).

    Bucket means are one division of exact integers (cents sum /
    count); each squared difference is deterministic; the cross-pair
    sum folds in bucket order (sorted fold) so both engines accumulate
    bit-identically, and the final /(2M) is one more shared division.

    Scale: per tau one (key, bucket) hash aggregate + one lag window +
    one per-key fold whose list length is retention-bounded (buckets,
    not events).  The taus union is a handful of such chains.
    """
    tau_s = {"1m": 60, "1h": 3600, "2h": 7200, "4h": 14400,
             "1d": 86400}
    out = None
    for tau in taus:
        sec = tau_s[tau]
        b = (
            df.select(
                F.col(key_col).alias("key"),
                F.floor(F.unix_timestamp(F.col(ts_col)) / sec)
                .cast("long")
                .alias("bucket"),
                F.round(F.col(value_col) * 100)
                .cast("long")
                .alias("cents"),
            )
            .groupBy("key", "bucket")
            .agg(
                (
                    F.sum("cents").cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("ybar")
            )
        )
        w = Window.partitionBy("key").orderBy("bucket")
        d = b.select(
            "key",
            "bucket",
            "ybar",
            F.lag("bucket").over(w).alias("pb"),
            F.lag("ybar").over(w).alias("py"),
        ).filter(F.col("pb") == F.col("bucket") - 1)
        terms = d.select(
            "key",
            "bucket",
            (
                (F.col("ybar") - F.col("py"))
                * (F.col("ybar") - F.col("py"))
            ).alias("term"),
        )
        agg = terms.groupBy("key").agg(
            F.count(F.lit(1)).alias("m_pairs"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bucket", "term"))),
                F.lit(0.0),
                lambda a, s: a + s["term"],
            ).alias("ssd"),
        )
        res = agg.select(
            "key",
            F.lit(sec).cast("long").alias("tau_s"),
            "m_pairs",
            (
                F.col("ssd")
                / (F.lit(2.0) * F.col("m_pairs").cast("double"))
            ).alias("avar"),
        )
        out = res if out is None else out.unionByName(res)
    return out


def interval_coverage(
    df: DataFrame,
    ttl_s: int = 900,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Merged activity coverage per key: every event claims the
    interval [t, t + ttl_s); overlapping or touching claims merge into
    islands (classic sweep: an event starts a new island iff its start
    exceeds the running max end of all earlier events), and per key we
    report total covered seconds, the merged-interval count, and the
    raw event count — the de-overlapped "time actually active" that a
    naive SUM(ttl) over-counts.

    All integer arithmetic; the sweep is one ordered window with O(1)
    state (running max), one island aggregate, one key aggregate.
    """
    ev = df.select(
        F.col(key_col).alias("key"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("t"),
        F.col(order_col).alias("oid"),
    ).withColumn("hi", F.col("t") + F.lit(ttl_s))
    w = Window.partitionBy("key").orderBy("t", "oid")
    prev_max = F.max("hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.select(
        "key",
        "t",
        "hi",
        "oid",
        F.when(
            prev_max.isNull() | (F.col("t") > prev_max), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    islands = flagged.select(
        "key",
        "t",
        "hi",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    per_island = islands.groupBy("key", "island").agg(
        F.min("t").alias("lo"),
        F.max("hi").alias("hi"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_island.groupBy("key").agg(
        F.sum(F.col("hi") - F.col("lo")).alias("covered_s"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("n_events").alias("n_events"),
    )


def active_streaks(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-day activity streak per key (gaps & islands).

    Distinct active days per key; island id = day - row_number (equal
    within each unbroken run); per key report the longest streak, the
    number of distinct streaks, and total active days.  All integers.

    Scale: one distinct-(key, day) aggregate, one per-key ordered
    window (row_number), two hash re-aggregates — the island trick
    needs no self-join and no iteration.
    """
    days = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("key").orderBy("day")
    islands = days.select(
        "key",
        "day",
        (F.col("day") - F.row_number().over(w)).alias("island"),
    )
    runs = islands.groupBy("key", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("key").agg(
        F.max("run_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("run_len").alias("active_days"),
    )


def ols_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Classical least-squares trend per key over its daily totals —
    slope, intercept and R^2, the parametric companion to
    :func:`theil_sen` (compare the two to spot outlier-driven trends:
    a large OLS/Theil–Sen disagreement flags contaminated series).

    x is the day offset from the key's first active day (small exact
    integers), y the daily cents total; all five sufficient statistics
    (Sx, Sy, Sxy, Sxx, Syy) are exact BIGINT sums, the slope is one
    division of exact integers, and R^2 casts the exact integer
    moments to double only at the final products (which would overflow
    BIGINT) — every float is one shared expression.  Keys need >= 2
    distinct days and a non-constant x; a constant-y key gets R^2
    NULL (0/0 is undefined, not 1).

    Scale: one (key, day) rollup, one key-window for the day offset,
    one key aggregate — two shuffles on the same key.
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    w = Window.partitionBy("key")
    o = d.select(
        "key",
        (F.col("day") - F.min("day").over(w)).alias("x"),
        F.col("cents").alias("y"),
    )
    agg = o.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 2)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / dxx.cast("double")
    return agg.filter(dxx > 0).select(
        "key",
        "n",
        slope.alias("slope_cents_per_day"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept_cents"),
        F.when(
            dyy > 0,
            (num.cast("double") * num.cast("double"))
            / (dxx.cast("double") * dyy.cast("double")),
        ).alias("r2"),
    )


def spectral_diurnal(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Single-bin DFT (Goertzel-style) of the hourly count series at
    the diurnal frequency (period 24 h) per key — the spectral
    "how circadian is this key" screen behind seasonality detection.

        re = sum_h cnt_h * cos(2*pi*(h mod 24)/24)
        im = sum_h cnt_h * sin(2*pi*(h mod 24)/24)
        amp = 2 * sqrt(re^2 + im^2) / span_h

    Missing hours carry cnt = 0 and contribute exactly 0, so no dense
    grid is materialized.  The 24 cosine/sine values are computed ONCE
    in Python and embedded as double literals in BOTH engines (the
    folded-constants idiom), each product term is deterministic, and
    the two sums fold in hour order (sorted fold) — bit-identical
    accumulation.  Over a whole number of 24 h periods this equals the
    mean-removed DFT bin (the mean's projection on a full period is
    exactly zero); partial trailing periods are a documented edge.

    Scale: one (key, hour) count aggregate + one per-key sorted fold
    whose list length is retention-bounded (hours, not events).
    """
    import math

    cos_tab = [math.cos(2.0 * math.pi * i / 24.0) for i in range(24)]
    sin_tab = [math.sin(2.0 * math.pi * i / 24.0) for i in range(24)]
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
    idx = (F.col("hour") % 24).cast("int")
    carr = F.array(*[F.lit(c) for c in cos_tab])
    sarr = F.array(*[F.lit(s) for s in sin_tab])
    terms = hourly.select(
        "key",
        "hour",
        (F.col("cnt").cast("double") * F.element_at(carr, idx + 1))
        .alias("tre"),
        (F.col("cnt").cast("double") * F.element_at(sarr, idx + 1))
        .alias("tim"),
    )
    agg = terms.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_hours"),
        (F.max("hour") - F.min("hour") + 1).alias("span_h"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("hour", "tre"))),
            F.lit(0.0),
            lambda a, s: a + s["tre"],
        ).alias("re"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("hour", "tim"))),
            F.lit(0.0),
            lambda a, s: a + s["tim"],
        ).alias("im"),
    )
    return agg.select(
        "key",
        "n_hours",
        "span_h",
        "re",
        "im",
        (
            F.lit(2.0)
            * F.sqrt(F.col("re") * F.col("re") + F.col("im") * F.col("im"))
            / F.col("span_h").cast("double")
        ).alias("diurnal_amp"),
    )


def basket_lift(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
) -> DataFrame:
    """Association lift between event types co-occurring in the same
    (key, hour) basket — the market-basket screen ("which activities
    travel together") over the activity stream.

        lift(a, b) = N * c_ab / (c_a * c_b)

    with N = total baskets, c_x = baskets containing x, c_ab = baskets
    containing both.  Counts are exact; the integer products N*c_ab
    and c_a*c_b are exact BIGINTs; lift and support are one division
    each.

    Scale: baskets are distinct (key, hour, item) triples — one
    distinct aggregate; the pair join is a self-equi-join on the
    basket id whose per-basket fan-out is bounded by the ITEM
    VOCABULARY (event types), not by event volume, so the candidate
    volume is at most |baskets| * |types|^2 with tiny |types|.
    """
    items = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
        .cast("long")
        .alias("hour"),
        F.col(item_col).alias("item"),
    ).distinct()
    # scalar N stays in the plan (1-row broadcast), never a driver action
    n_baskets = (
        items.select("key", "hour")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = items.select("key", "hour", F.col("item").alias("item_a"))
    b = items.select("key", "hour", F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, ["key", "hour"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("c").alias("c_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("c").alias("c_b")
    )
    return (
        pair_counts.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            "c_a",
            "c_b",
            (
                (F.col("n_baskets") * F.col("c_ab")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
            (
                F.col("c_ab").cast("double")
                / F.col("n_baskets").cast("double")
            ).alias("support"),
        )
    )


def entropy_rate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Conditional (bigram) entropy of the event-type sequence, per
    FROM-state: how predictable is the next event given the current
    one — the sequence-predictability counterpart to the unigram
    ``type_entropy``.

        H(next | cur = x) = sum_y (c_xy / c_x) * log2(c_x / c_xy)

    quantized with the per-TYPE centibit idiom: each transition's
    ``cb_xy = floor(100 * (log2(c_x) - log2(c_xy)))`` is an exact
    integer computed once per (x, y) pair, the weighted sum
    ``sum_y c_xy * cb_xy`` is exact BIGINT arithmetic, and the final
    rate is one division — bit-reproducible (a 1-ulp log2 skew would
    need to land within ~1e-13 of an integer, per-PAIR probability
    ~1e-9).

    Bigrams follow each key's (ts, order_col) order and never cross
    keys.  Scale: one key-window lag + one (x, y) vocabulary-bounded
    hash aggregate.
    """
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    bi = (
        df.select(
            F.lag(F.col(type_col)).over(w).alias("x"),
            F.col(type_col).alias("y"),
        )
        .filter(F.col("x").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    cx = bi.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    scored = bi.join(F.broadcast(cx), "x").select(
        "x",
        "y",
        "c_xy",
        "c_x",
        F.floor(
            F.lit(100.0)
            * (
                F.log2(F.col("c_x").cast("double"))
                - F.log2(F.col("c_xy").cast("double"))
            )
        )
        .cast("long")
        .alias("cb"),
    )
    return scored.groupBy("x").agg(
        F.first("c_x").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_next_types"),
        F.sum(F.col("c_xy") * F.col("cb")).alias("sum_cb"),
        (
            F.sum(F.col("c_xy") * F.col("cb")).cast("double")
            / F.first("c_x").cast("double")
        ).alias("h_centibits"),
    )


def markov_stationary(
    df: DataFrame,
    n_iters: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain by
    POWER ITERATION — ``pi_{k+1} = pi_k P`` for ``n_iters`` steps from
    the uniform vector — the long-run "where does a session spend its
    time" summary, and the engine's iterative-algorithm template (the
    chain is declared once; each step is one more lazy join+aggregate
    layer, no driver-side state).

    The state space is the set of FROM-states; transitions into
    states never seen as a source are dropped and the row re-
    normalized; a source whose kept row would be EMPTY (all its
    targets are non-sources) is a dangling state and redistributes
    uniformly, the PageRank convention — the restricted chain stays
    stochastic and pi always sums to 1.  Determinism:
    each p_xy is one division of exact counts, pi_0 = 1/S is one
    shared division, and every pi_{k+1}(y) folds its incoming terms
    in SOURCE-INDEX order (sorted fold) — absent transitions
    contribute exactly 0.0, so the sparse Spark fold and the dense
    DuckDB recursive-CTE fold accumulate bit-identically.

    Scale: the transition matrix is vocabulary-bounded (|types|^2
    rows), so every per-iteration join/aggregate moves a constant-
    size frame; the only data-sized work is the single bigram count.
    """
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    bi = (
        df.select(
            F.lag(F.col(type_col)).over(w).alias("x"),
            F.col(type_col).alias("y"),
        )
        .filter(F.col("x").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    froms = bi.select("x").distinct()
    states = froms.select(
        F.col("x").alias("state"),
        (F.row_number().over(Window.orderBy("x")) - 1).alias("idx"),
    )
    kept = bi.join(
        froms.select(F.col("x").alias("y")), "y", "left_semi"
    )
    cx = kept.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    p = (
        kept.join(cx, "x")
        .join(
            F.broadcast(states.select(F.col("state").alias("x"),
                                      F.col("idx").alias("xi"))),
            "x",
        )
        .join(
            F.broadcast(states.select(F.col("state").alias("y"),
                                      F.col("idx").alias("yi"))),
            "y",
        )
        .select(
            "xi",
            "yi",
            (
                F.col("c_xy").cast("double")
                / F.col("c_x").cast("double")
            ).alias("p"),
        )
    )
    n = states.agg(F.count(F.lit(1)).alias("s"))
    # dangling sources (every kept outgoing transition was dropped)
    # redistribute uniformly — the PageRank convention — so the chain
    # stays stochastic and pi remains a distribution
    dang = (
        froms.join(cx.select("x"), "x", "left_anti")
        .join(
            F.broadcast(states.select(F.col("state").alias("x"),
                                      F.col("idx").alias("xi"))),
            "x",
        )
        .select("xi")
    )
    p_dang = (
        dang.crossJoin(F.broadcast(states.select(F.col("idx").alias("yi"))))
        .crossJoin(F.broadcast(n))
        .select(
            "xi",
            "yi",
            (F.lit(1.0) / F.col("s").cast("double")).alias("p"),
        )
    )
    p = p.unionByName(p_dang)
    v = states.crossJoin(F.broadcast(n)).select(
        "idx", (F.lit(1.0) / F.col("s").cast("double")).alias("prob")
    )
    for _ in range(n_iters):
        contrib = v.join(p, v["idx"] == p["xi"]).select(
            "yi", "xi", (F.col("prob") * F.col("p")).alias("term")
        )
        nxt = contrib.groupBy("yi").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("xi", "term"))),
                F.lit(0.0),
                lambda a, s: a + s["term"],
            ).alias("prob")
        )
        v = (
            states.select("idx")
            .join(nxt, states["idx"] == nxt["yi"], "left")
            .select(
                "idx", F.coalesce("prob", F.lit(0.0)).alias("prob")
            )
        )
    return states.join(v, "idx").select(
        "state", "idx", F.col("prob").alias("pi")
    )


def mad_per_type(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Median absolute deviation per event type — the robust scale
    estimator (breakdown point 50%) that pairs with the trimmed mean:
    sigma_robust ~ 1.4826 * MAD for Gaussian data, immune to the fat
    tails that wreck a plain stddev.

    Two rank-selected medians (never engine percentiles): the value
    median over exact cents (two-mid-rank average — exact .0/.5
    halves), then the median of |cents - median| (deviations are
    exact .0/.5 doubles, so ordering and the second two-mid-rank
    average are still exact arithmetic).  Ties break on the order
    column.

    Scale: two ordered windows partitioned by the type (vocabulary-
    bounded partitions — for a skewed single-type table switch to the
    histogram sketch in plans/metrics.py), two hash aggregates.
    """
    ev = df.select(
        F.col(type_col).alias("grp"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.col(order_col).alias("oid"),
    )
    w = Window.partitionBy("grp").orderBy("cents", "oid")
    cw = Window.partitionBy("grp")
    ranked = ev.select(
        "grp",
        "cents",
        "oid",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("m"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
        )
        .groupBy("grp")
        .agg(
            F.first("m").alias("n"),
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("med_cents"),
        )
    )
    dev = ev.join(F.broadcast(med), "grp").select(
        "grp",
        "n",
        "med_cents",
        F.abs(F.col("cents").cast("double") - F.col("med_cents"))
        .alias("dev"),
        "oid",
    )
    w2 = Window.partitionBy("grp").orderBy("dev", "oid")
    ranked2 = dev.select(
        "grp",
        "n",
        "med_cents",
        "dev",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("m"),
    )
    return (
        ranked2.filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
        )
        .groupBy("grp")
        .agg(
            F.first("n").alias("n"),
            F.first("med_cents").alias("median_cents"),
            (
                F.sum("dev") / F.count(F.lit(1)).cast("double")
            ).alias("mad_cents"),
        )
    )


def runs_test(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Wald–Wolfowitz runs test per key: is the sign sequence of
    values-above/below-the-key-median random, or does it cluster
    (trending / regime-switching series fail it)?

        z = (R - mu) / sigma,  mu = 2 n1 n2 / n + 1,
        sigma^2 = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1))

    R = observed runs over the (ts, order) sequence with median-equal
    values dropped (the standard dichotomization).  Counts are exact;
    the key's median is rank-selected; mu/sigma/z are one shared
    float expression.  Keys with n1 = 0 or n2 = 0 or n < 2 are
    dropped (the statistic is undefined).

    Scale: one median window chain + one lag window + one key
    aggregate, all partitioned by the key.
    """
    ev = df.select(
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("oid"),
    )
    w = Window.partitionBy("key").orderBy("cents", "oid")
    cw = Window.partitionBy("key")
    ranked = ev.select(
        "key",
        "cents",
        "ts",
        "oid",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("m"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
        )
        .groupBy("key")
        .agg(
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("med")
        )
    )
    signed = (
        ev.join(med, "key")
        .filter(F.col("cents").cast("double") != F.col("med"))
        .select(
            "key",
            "ts",
            "oid",
            F.when(F.col("cents").cast("double") > F.col("med"), 1)
            .otherwise(0)
            .alias("sgn"),
        )
    )
    sw = Window.partitionBy("key").orderBy("ts", "oid")
    runs = signed.select(
        "key",
        "sgn",
        F.when(
            F.lag("sgn").over(sw).isNull()
            | (F.lag("sgn").over(sw) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.groupBy("key").agg(
        F.sum("sgn").alias("n1"),
        F.sum(F.lit(1) - F.col("sgn")).alias("n2"),
        F.sum("new_run").alias("r"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / n + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n)
        / (n * n * (n - F.lit(1.0)))
    )
    return agg.filter(
        (F.col("n1") > 0)
        & (F.col("n2") > 0)
        # exact-integer variance guard: sigma^2 > 0 iff 2*n1*n2 > n
        & (
            F.lit(2) * F.col("n1") * F.col("n2")
            > F.col("n1") + F.col("n2")
        )
    ).select(
        "key",
        "n1",
        "n2",
        F.col("r").alias("runs"),
        ((F.col("r").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


def kleinberg_bursts(
    df: DataFrame,
    gamma_micro: int = 1_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Two-state burst detection on the dense hourly count series per
    key — Kleinberg's burst automaton (KDD 2002) in its discrete
    two-rate form: state 0 emits at the key's baseline rate r0 =
    total/T, state 1 (burst) at r1 = 3*r0; entering the burst state
    costs ``gamma``; Viterbi picks the minimum-cost state path.

    The Poisson negative log-likelihood cost (``r - x*ln(r)``, the
    x!-term cancels between states) is INTEGER-QUANTIZED to micro-nats
    once per key: ``c_s = floor(1e6*r_s) - x*floor(1e6*ln(r_s))`` —
    only TWO transcendental evaluations per key, each floor-quantized
    (the per-key cross-engine flip probability is ~1e-9, the same
    argument as the centibit idiom), and the whole DP then runs in
    exact BIGINT arithmetic: bit-reproducible min/argmin with the
    documented tie rule (prefer the baseline-state parent, prefer the
    baseline final state).

    Output per key: T (grid hours), total_cnt, cost (micro-nats,
    integer), n_burst (hours labeled burst on the optimal path).

    Scale: dense grid explode is retention-bounded; the DP is a
    grouped Arrow kernel, O(T) integer ops per key, embarrassingly
    parallel across keys.
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
        F.explode(
            F.sequence(
                F.col("lo").cast("int"), F.col("hi").cast("int")
            )
        ).alias("hour_i"),
    ).select("key", F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, ["key", "hour"], "left").select(
        "key", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )

    key_type = dict(df.dtypes)[key_col]
    out_schema = (
        f"key {key_type}, T long, total_cnt long, cost long, "
        "n_burst long"
    )
    g = int(gamma_micro)

    def _kernel(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("hour").reset_index(drop=True)
        x = pdf["cnt"].astype(int).tolist()
        T = len(x)
        total = sum(x)
        r0 = total / T
        r1 = 3.0 * r0
        # floor (not round): Python rounds half-to-even, SQL engines
        # half-away — floor is the only half-free quantizer shared by
        # every replay engine
        e0 = math.floor(1e6 * r0)
        e1 = math.floor(1e6 * r1)
        l0 = math.floor(1e6 * math.log(r0))
        l1 = math.floor(1e6 * math.log(r1))
        d0 = e0 - x[0] * l0
        d1 = g + e1 - x[0] * l1
        b0, b1 = 0, 1
        for t in range(1, T):
            c00, c10 = d0, d1               # into state 0: no charge
            c01, c11 = d0 + g, d1           # into state 1: gamma up
            if c00 <= c10:
                nd0, nb0 = c00, b0
            else:
                nd0, nb0 = c10, b1
            if c01 <= c11:
                nd1, nb1 = c01, b0 + 1
            else:
                nd1, nb1 = c11, b1 + 1
            d0 = nd0 + e0 - x[t] * l0
            d1 = nd1 + e1 - x[t] * l1
            b0, b1 = nb0, nb1
        if d0 <= d1:
            cost, nb = d0, b0
        else:
            cost, nb = d1, b1
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "T": [T],
                "total_cnt": [total],
                "cost": [cost],
                "n_burst": [nb],
            }
        )

    return dense.groupBy("key").applyInPandas(_kernel, out_schema)


def emd_distance(
    df: DataFrame,
    type_a: str,
    type_b: str,
    key_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """1-D Wasserstein (earth mover's) distance per key between two
    event types' value distributions — the L1 companion to
    :func:`ks_distance` (KS is the sup of the CDF gap; EMD integrates
    it, so it also sees HOW FAR mass moved, not just whether it did).

        EMD = integral |F_a(x) - F_b(x)| dx
            = sum_i |cumA_i * n_b - cumB_i * n_a| * gap_i / (n_a*n_b)

    The cross-multiplied form keeps EVERY term an exact BIGINT
    (cumulative counts x sample sizes x integer cent gaps); the single
    division at the end is the only float.  Exact, order-free
    (integer addition commutes), and in natural cents units.

    Scale: identical shape to ks_distance — one (key, cents) hash
    aggregate, one per-key ordered window, one per-key sum.
    """
    ev = df.filter(
        F.col(type_col).isin([type_a, type_b])
    ).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    per_val = ev.groupBy("key", "cents").agg(
        F.sum(
            F.when(F.col("etype") == type_a, F.lit(1)).otherwise(F.lit(0))
        ).alias("ca"),
        F.sum(
            F.when(F.col("etype") == type_b, F.lit(1)).otherwise(F.lit(0))
        ).alias("cb"),
    )
    w = Window.partitionBy("key").orderBy("cents")
    cw = Window.partitionBy("key")
    cum = per_val.select(
        "key",
        "cents",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(cw).alias("n_a"),
        F.sum("cb").over(cw).alias("n_b"),
        (F.lead("cents").over(w) - F.col("cents")).alias("gap"),
    )
    terms = cum.filter(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & F.col("gap").isNotNull()
    ).select(
        "key",
        "n_a",
        "n_b",
        (
            F.abs(
                F.col("cum_a") * F.col("n_b")
                - F.col("cum_b") * F.col("n_a")
            )
            * F.col("gap")
        ).alias("term"),
    )
    return terms.groupBy("key").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        (
            F.sum("term").cast("double")
            / (F.first("n_a") * F.first("n_b")).cast("double")
        ).alias("emd_cents"),
    )


def type_runs(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Run-length statistics of each key's event-type sequence: how
    long does the key stay on one activity before switching?  High
    ``longest_run`` with few runs flags scripted/batch traffic; runs
    near 1 flag thrashing.  (Also the run-length-encoding size model
    for a dictionary+RLE codec on the type column.)

    Gaps-and-islands on type CHANGES (new run when the lagged type
    differs), all integers: n_events, n_runs, longest_run, and
    mean_run as one exact division.

    Scale: one key-window lag + cumulative sum, two hash aggregates —
    the standard islands chain, no self-join.
    """
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("et"),
        F.when(
            F.lag(F.col(type_col)).over(w).isNull()
            | (F.lag(F.col(type_col)).over(w) != F.col(type_col)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("oid"),
    )
    w2 = Window.partitionBy("key").orderBy("ts", "oid")
    runs = flagged.select(
        "key",
        F.sum("new_run")
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    ).groupBy("key", "run_id").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("key").agg(
        F.sum("len").alias("n_events"),
        F.count(F.lit(1)).alias("n_runs"),
        F.max("len").alias("longest_run"),
        (
            F.sum("len").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_run"),
    )


def decayed_score(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exponentially time-decayed activity leaderboard: each event is
    worth ``2^-(age_days)`` at the corpus's last active day, so
    yesterday counts half of today — the freshness-weighted ranking
    signal feeds/leaderboards use.

    EXACT arithmetic trick: with a half-life of one day the weights
    are powers of two, so the per-key score is accumulated as the
    exact BIGINT ``sum(cnt * 2^(36 - age))`` (every term a shifted
    count) and converted once at the end by multiplying with the
    shared literal ``2^-36`` — no float accumulation at all.  Ages
    beyond 36 days are clamped to weight 0 (< 2^-36 of today's
    weight); the 36-bit shift budget leaves 2^63/2^36 = 134M daily
    events per key of headroom under ANSI BIGINT arithmetic.

    Scale: one (key, day) rollup, one global max-day broadcast, one
    key aggregate.
    """
    days = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
    )
    per_day = days.groupBy("key", "day").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    last = per_day.agg(F.max("day").alias("last_day"))
    aged = per_day.crossJoin(F.broadcast(last)).select(
        "key",
        "cnt",
        (F.col("last_day") - F.col("day")).alias("age"),
    )
    scaled = aged.select(
        "key",
        "cnt",
        F.when(
            F.col("age") <= 36,
            F.col("cnt")
            * F.expr("shiftleft(1L, cast(36 - age as int))"),
        )
        .otherwise(F.lit(0))
        .alias("w"),
    )
    return scaled.groupBy("key").agg(
        F.sum("cnt").alias("n_events"),
        F.sum("w").alias("scaled_score"),
        (
            F.sum("w").cast("double")
            * F.lit(2.0) ** F.lit(-36)
        ).alias("decayed_score"),
    )


def persistent_hitters(
    df: DataFrame,
    top_k: int = 10,
    min_days: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Persistence mining: keys that appear in the DAILY top-``top_k``
    by event count on at least ``min_days`` distinct days — the
    "reliably heavy" cut that one-shot heavy-hitter lists miss (a
    single viral day makes the global top-k; showing up every day
    does not).

    Exact integer counts; the per-day ranking tie-breaks on the key,
    so membership is deterministic.  Output per surviving key: days
    in the top-k, best (lowest) rank, total events on those days.

    Scale: one (day, key) count aggregate, one per-day top-k window
    (partitioned by day — never a global sort), one key aggregate.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("day", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    ranked = daily.select(
        "day", "key", "cnt", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= top_k)
    return (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("days_in_topk"),
            F.min("rnk").alias("best_rank"),
            F.sum("cnt").alias("events_on_those_days"),
        )
        .filter(F.col("days_in_topk") >= min_days)
    )


def hellinger_distance(
    df: DataFrame,
    type_a: str,
    type_b: str,
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 640.0,
    key_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hellinger distance per key between two event types' value
    HISTOGRAMS (fixed bins over [lo, hi), clamped edges) — the
    bounded-[0,1] divergence that, unlike KS/EMD, is symmetric in
    probability space and robust to support mismatch.

        H^2 = 1 - sum_b sqrt(p_b * q_b)

    Bin counts are exact integers; each term is ONE shared expression
    ``sqrt((ca*cb)/(na*nb))`` (the product ratio computed as exact
    integers cast once), folded in bin order (sorted fold) so both
    engines accumulate bit-identically; the final ``sqrt(1 - bc)`` is
    shared too (clamped at 0 for rounding).

    Scale: one (key, bin) hash aggregate over a BOUNDED bin set, one
    per-key fold.
    """
    width = (hi - lo) / n_bins
    ev = df.filter(
        F.col(type_col).isin([type_a, type_b])
    ).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
                .cast("int"),
            ),
        ).alias("bin"),
    )
    per_bin = ev.groupBy("key", "bin").agg(
        F.sum(
            F.when(F.col("etype") == type_a, F.lit(1)).otherwise(F.lit(0))
        ).alias("ca"),
        F.sum(
            F.when(F.col("etype") == type_b, F.lit(1)).otherwise(F.lit(0))
        ).alias("cb"),
    )
    cw = Window.partitionBy("key")
    terms = per_bin.select(
        "key",
        "bin",
        F.sum("ca").over(cw).alias("n_a"),
        F.sum("cb").over(cw).alias("n_b"),
        "ca",
        "cb",
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    scored = terms.select(
        "key",
        "bin",
        "n_a",
        "n_b",
        F.sqrt(
            (F.col("ca") * F.col("cb")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("term"),
    )
    agg = scored.groupBy("key").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "term"))),
            F.lit(0.0),
            lambda a, s: a + s["term"],
        ).alias("bc"),
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        F.col("bc").alias("bhattacharyya"),
        F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - F.col("bc")))
        .alias("hellinger"),
    )


def quantile_drift(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Week-over-week median drift per event type — the monitoring
    series a data-quality dashboard alerts on: each (type, ISO-epoch
    week) gets its rank-selected median value, then a lag window
    yields the delta from the previous observed week.

    Medians are two-mid-rank over exact cents (tie-break on the order
    column); the delta is a subtraction of two such exact .0/.5
    doubles — deterministic.  Weeks with no events are skipped (the
    delta spans to the previous OBSERVED week; the gap length is
    reported so consumers can treat long gaps differently).

    Scale: one (type, week) ordered-window median chain (vocabulary x
    weeks partitions), one per-type lag window.
    """
    ev = df.select(
        F.col(type_col).alias("grp"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 604800)
        .cast("long")
        .alias("week"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.col(order_col).alias("oid"),
    )
    w = Window.partitionBy("grp", "week").orderBy("cents", "oid")
    cw = Window.partitionBy("grp", "week")
    ranked = ev.select(
        "grp",
        "week",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("m"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
        )
        .groupBy("grp", "week")
        .agg(
            F.first("m").alias("n"),
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("med_cents"),
        )
    )
    lw = Window.partitionBy("grp").orderBy("week")
    return med.select(
        "grp",
        "week",
        "n",
        "med_cents",
        (F.col("med_cents") - F.lag("med_cents").over(lw)).alias(
            "delta_cents"
        ),
        (F.col("week") - F.lag("week").over(lw)).alias("weeks_gap"),
    )


def chi2_independence(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Chi-squared test of independence between event type and
    hour-of-day (is the traffic mix time-invariant?), plus Cramer's V
    effect size — the screen that separates "statistically detectable
    at N=10^12 but irrelevant" from real composition drift.

    Uses the zero-cell-free identity  chi2 = N * sum_cells o^2/(rt*ct)
    - N  (absent cells contribute exactly 0 to the sum), so no
    contingency grid is materialized.  o, rt, ct, N are exact BIGINTs;
    each cell term ``o^2 / (rt*ct)`` is division-only double arithmetic
    (IEEE-deterministic, no libm), quantized to pico-units
    (floor(1e12 * term)) and summed as BIGINT so both engines
    accumulate bit-identically; chi2 and V are shared final
    expressions.

    Scale: one (type, hour) hash aggregate to a vocabulary x 24 cell
    table; everything after runs on that bounded table.  (At 10^12
    rows the BIGINT o^2 would overflow past ~3e9 per cell; the cell
    counts would first be down-scaled by a common factor — the
    statistic is scale-covariant.)
    """
    cells = df.select(
        F.col(type_col).alias("etype"),
        F.hour(F.col(ts_col)).cast("long").alias("hr"),
    ).groupBy("etype", "hr").agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("etype")
    wc = Window.partitionBy("hr")
    wn = Window.partitionBy()
    t = cells.select(
        "etype",
        "hr",
        "o",
        F.sum("o").over(wr).alias("rt"),
        F.sum("o").over(wc).alias("ct"),
        F.sum("o").over(wn).alias("n"),
        F.size(F.collect_set("etype").over(wn)).alias("r_levels"),
        F.size(F.collect_set("hr").over(wn)).alias("c_levels"),
    ).select(
        "n",
        "r_levels",
        "c_levels",
        F.floor(
            F.lit(1e12)
            * (
                (F.col("o") * F.col("o")).cast("double")
                / (F.col("rt").cast("double") * F.col("ct").cast("double"))
            )
        ).cast("long").alias("pico"),
    )
    agg = t.groupBy("n", "r_levels", "c_levels").agg(
        F.sum("pico").alias("s")
    )
    chi2 = (
        F.col("n").cast("double") * F.col("s").cast("double") / F.lit(1e12)
        - F.col("n").cast("double")
    )
    dof = (F.col("r_levels") - 1) * (F.col("c_levels") - 1)
    mindim = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    return agg.select(
        F.col("n").alias("n_events"),
        "r_levels",
        "c_levels",
        dof.cast("long").alias("dof"),
        chi2.alias("chi2"),
        F.sqrt(
            F.greatest(F.lit(0.0), chi2)
            / (F.col("n").cast("double") * mindim.cast("double"))
        ).alias("cramers_v"),
    )


def spearman_pairs(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Spearman rank correlation between every pair of event types'
    daily value totals — the monotone-association screen that survives
    outliers and nonlinear couplings Pearson misses (do error volumes
    track click volumes day over day?).

    Pairing is on common active days (inner join of the two daily
    series).  Ranks are tie-aware DOUBLED average ranks — for a value
    with min rank m in a group of t ties, avg rank = m + (t-1)/2, so
    2*avg = 2m + t - 1 is an exact BIGINT — and rho is Pearson on the
    doubled ranks (scale-invariant), with every sufficient statistic
    an exact BIGINT sum and ONE shared final slope/sqrt expression.

    Scale: one (type, day) hash aggregate (vocabulary x horizon rows),
    one day-keyed self-join bounded by vocabulary^2 x horizon, windows
    partitioned per pair.  Event volume only touches the first
    aggregate.
    """
    d = df.select(
        F.col(type_col).alias("etype"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    ).groupBy("etype", "day").agg(F.sum("cents").alias("cents"))
    a = d.select(
        F.col("etype").alias("ta"),
        "day",
        F.col("cents").alias("ca"),
    )
    b = d.select(
        F.col("etype").alias("tb"),
        "day",
        F.col("cents").alias("cb"),
    )
    j = a.join(b, "day").filter(F.col("ta") < F.col("tb"))
    wa = Window.partitionBy("ta", "tb").orderBy("ca")
    wat = Window.partitionBy("ta", "tb", "ca")
    wb = Window.partitionBy("ta", "tb").orderBy("cb")
    wbt = Window.partitionBy("ta", "tb", "cb")
    ranked = j.select(
        "ta",
        "tb",
        (
            F.lit(2) * F.rank().over(wa)
            + F.count(F.lit(1)).over(wat)
            - F.lit(1)
        ).alias("rx"),
        (
            F.lit(2) * F.rank().over(wb)
            + F.count(F.lit(1)).over(wbt)
            - F.lit(1)
        ).alias("ry"),
    )
    agg = ranked.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.filter((dxx > 0) & (dyy > 0)).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n").alias("n_days"),
        (
            num.cast("double")
            / F.sqrt(dxx.cast("double") * dyy.cast("double"))
        ).alias("spearman_rho"),
    )


def js_divergence(
    df: DataFrame,
    type_a: str,
    type_b: str,
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 640.0,
    key_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Jensen-Shannon divergence (bits) per key between two event
    types' value histograms — the smoothed, symmetric, always-finite
    KL relative that completes the drift toolkit next to Hellinger
    (geometric), KS (sup-norm), and EMD (transport):

        JSD = 0.5 * sum_b [ p_b log2(2 p_b / (p_b+q_b))
                          + q_b log2(2 q_b / (p_b+q_b)) ]

    Bin counts are exact integers and every log argument is an exact
    integer RATIO (2*ca*nb / (ca*nb + cb*na)), so the only
    engine-variant operation is log2 itself; each bin term is
    quantized to micro-bits (floor(1e6 * term), BIGINT sum) which
    makes a cross-engine last-ULP log2 difference flip a term with
    probability ~1e-10 — the centibit idiom at 10^4 finer grain.
    Absent bins contribute exactly 0 (0*log term), so only observed
    bins are summed.

    Scale: one (key, bin) hash aggregate over a BOUNDED bin set, one
    per-key sum.
    """
    width = (hi - lo) / n_bins
    ev = df.filter(
        F.col(type_col).isin([type_a, type_b])
    ).select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
                .cast("int"),
            ),
        ).alias("bin"),
    )
    per_bin = ev.groupBy("key", "bin").agg(
        F.sum(
            F.when(F.col("etype") == type_a, F.lit(1)).otherwise(F.lit(0))
        ).alias("ca"),
        F.sum(
            F.when(F.col("etype") == type_b, F.lit(1)).otherwise(F.lit(0))
        ).alias("cb"),
    )
    cw = Window.partitionBy("key")
    t = per_bin.select(
        "key",
        "ca",
        "cb",
        F.sum("ca").over(cw).alias("na"),
        F.sum("cb").over(cw).alias("nb"),
    ).filter((F.col("na") > 0) & (F.col("nb") > 0))
    mix = (
        F.col("ca") * F.col("nb") + F.col("cb") * F.col("na")
    ).cast("double")
    term_a = F.when(
        F.col("ca") > 0,
        F.floor(
            F.lit(1e6)
            * (F.col("ca").cast("double") / F.col("na").cast("double"))
            * F.log2(
                (F.lit(2) * F.col("ca") * F.col("nb")).cast("double") / mix
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    term_b = F.when(
        F.col("cb") > 0,
        F.floor(
            F.lit(1e6)
            * (F.col("cb").cast("double") / F.col("nb").cast("double"))
            * F.log2(
                (F.lit(2) * F.col("cb") * F.col("na")).cast("double") / mix
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    agg = t.select(
        "key",
        "na",
        "nb",
        (term_a + term_b).alias("micro"),
    ).groupBy("key").agg(
        F.first("na").alias("n_a"),
        F.first("nb").alias("n_b"),
        F.sum("micro").alias("micro"),
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        (F.col("micro").cast("double") / F.lit(2e6)).alias("jsd_bits"),
    )


def page_hinkley(
    df: DataFrame,
    delta_micro: int = 500_000,
    lambda_micro: int = 2_000_000,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Page-Hinkley sequential changepoint detection (Page 1954,
    Hinkley 1971) on the dense hourly count series per key — the
    streaming-drift monitor that fires ONLINE, cumulating evidence
    step by step, where CUSUM here scans offline for the single best
    split.  Both directions are tracked:

        U_t = U_{t-1} + (x_t - mean_t - delta),  alarm if U_t - min U > lambda
        V_t = V_{t-1} + (x_t - mean_t + delta),  alarm if max V - V_t > lambda

    with mean_t the RUNNING mean since the last alarm; on alarm the
    statistic fully restarts (classic reset semantics), so ``n_inc`` /
    ``n_dec`` count distinct detected shifts.

    Exactness: counts are integers, so ``x_t - mean_t`` is the exact
    rational (t*x_t - S_t)/t; it is quantized per step by ONE integer
    FLOOR division into micro-units (no floats, no libm anywhere —
    stronger than the kleinberg idiom, which needs two quantized logs)
    and the whole recursion, minima and thresholds included, runs in
    BIGINT.  Python's ``//`` floors; the oracle corrects DuckDB's
    truncating ``//`` with an explicit negative-remainder step so both
    replays are bit-identical.

    Scale: dense grid explode is retention-bounded; the recursion is a
    grouped Arrow kernel, O(T) integer ops per key, parallel across
    keys.
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
        F.explode(
            F.sequence(F.col("lo").cast("int"), F.col("hi").cast("int"))
        ).alias("hour_i"),
    ).select("key", F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, ["key", "hour"], "left").select(
        "key", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )

    key_type = dict(df.dtypes)[key_col]
    out_schema = (
        f"key {key_type}, T long, total_cnt long, n_inc long, "
        "n_dec long, excess_inc long, excess_dec long"
    )
    q = 1_000_000
    dq = int(delta_micro)
    lq = int(lambda_micro)

    def _kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("hour").reset_index(drop=True)
        xs = pdf["cnt"].astype(int).tolist()
        s = tl = u = mu = v = mv = 0
        ninc = ndec = 0
        for x in xs:
            tl += 1
            s += x
            d = (q * (tl * x - s)) // tl  # exact integer floor
            u += d - dq
            mu = min(mu, u)
            v += d + dq
            mv = max(mv, v)
            if u - mu > lq:
                ninc += 1
                s = tl = u = mu = v = mv = 0
            elif mv - v > lq:
                ndec += 1
                s = tl = u = mu = v = mv = 0
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "T": [len(xs)],
                "total_cnt": [int(pdf["cnt"].sum())],
                "n_inc": [ninc],
                "n_dec": [ndec],
                "excess_inc": [u - mu],
                "excess_dec": [mv - v],
            }
        )

    return dense.groupBy("key").applyInPandas(_kernel, out_schema)


def kruskal_types(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Kruskal-Wallis H test: do the event types draw their values
    from the same distribution?  The rank-based one-way ANOVA that
    needs no normality assumption — the k-sample completion of the
    two-sample KS screen.

    Scale trick: ranks are NEVER computed by sorting the rows.  Values
    are integer cents, so the joint ranking collapses to the BOUNDED
    distinct-cents domain: one hash aggregate to (cents, count), one
    ordered window over distinct cents for cumulative counts, and the
    tie-aware DOUBLED average rank of every row with value c is the
    exact BIGINT  D(c) = 2*cum_before(c) + cnt(c) + 1.  Per-type rank
    sums join (type, cents) counts against that table — event volume
    only ever touches hash aggregates.

    The per-type term (D_j/2)^2 / n_j is one shared double expression
    folded in type order (sorted fold); tie correction
    C = 1 - sum(t^3 - t)/(N^3 - N) uses an exact BIGINT tie sum; the
    final H = (12*S/(N(N+1)) - 3(N+1)) / C is a shared expression.
    (At 10^12 rows D_j^2 and N^3 move to double products — noted, the
    expressions already compute them as casts.)

    Output: one row — n_events, k_types, dof, h_stat, and the
    epsilon-squared effect size (H - k + 1)/(N - k).
    """
    ev = df.select(
        F.col(type_col).alias("etype"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    cc = ev.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt_c"))
    wo = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranks = cc.select(
        "cents",
        "cnt_c",
        (
            F.lit(2) * (F.sum("cnt_c").over(wo) - F.col("cnt_c"))
            + F.col("cnt_c")
            + F.lit(1)
        ).alias("d2"),
    )
    tc = ev.groupBy("etype", "cents").agg(
        F.count(F.lit(1)).alias("cnt_tc")
    )
    per_type = (
        tc.join(ranks, "cents")
        .groupBy("etype")
        .agg(
            F.sum("cnt_tc").alias("n_j"),
            F.sum(F.col("cnt_tc") * F.col("d2")).alias("dj"),
        )
    )
    ties = cc.agg(
        F.sum(
            F.col("cnt_c") * F.col("cnt_c") * F.col("cnt_c")
            - F.col("cnt_c")
        ).alias("tie_sum")
    )
    agg = per_type.select(
        "etype",
        "n_j",
        "dj",
        (
            F.col("dj").cast("double")
            * F.col("dj").cast("double")
            / (F.lit(4.0) * F.col("n_j").cast("double"))
        ).alias("term"),
    ).agg(
        F.sum("n_j").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("etype", "term"))),
            F.lit(0.0),
            lambda a, s: a + s["term"],
        ).alias("s"),
    )
    j = agg.crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h_raw = (
        F.lit(12.0) * F.col("s") / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        nd * nd * nd - nd
    )
    h = F.when(corr > 0, h_raw / corr)
    return j.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("k_types"),
        (F.col("k") - 1).cast("long").alias("dof"),
        h.alias("h_stat"),
        F.when(
            (corr > 0) & (F.col("n") > F.col("k")),
            (h_raw / corr - F.col("k").cast("double") + F.lit(1.0))
            / (nd - F.col("k").cast("double")),
        ).alias("epsilon_sq"),
    )


def pacf_profile(
    df: DataFrame,
    max_lag: int = 24,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Partial autocorrelation function (lags 1..``max_lag``) of each
    key's dense hourly count series, via the Levinson-Durbin
    recursion — the classic AR-order fingerprint (which lags carry
    DIRECT memory once shorter lags are controlled for; a daily cycle
    shows as a spike at 24 that plain ACF smears everywhere).

    Exactness: deviations are pre-scaled to integers (y_t = T*x_t -
    S, so no float mean), autocovariance numerators c_k are exact
    BIGINT sums, r_k quantizes to micro-units by ONE integer floor
    division per lag, and the entire Durbin recursion — convolution
    terms, reflection coefficient, coefficient updates — runs in
    BIGINT with per-step floor divisions (positive divisors; the
    negative-numerator floor correction is explicit in the oracle).
    Total quantization drift vs the float recursion is ~1e-5 per
    lag; cross-engine it is ZERO, every division replayed exactly.
    The recursion stops early (emitting fewer lags) if the innovation
    denominator hits <= 0 — degenerate/nonstationary input.

    Scale: the c_k lag products are a Catalyst lag-explode equi-join
    bounded by T * max_lag rows per key; the recursion is a grouped
    Arrow kernel over max_lag+1 AGGREGATED rows per key (never raw
    events).
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
        F.explode(
            F.sequence(F.col("lo").cast("int"), F.col("hi").cast("int"))
        ).alias("hour_i"),
    ).select("key", F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, ["key", "hour"], "left").select(
        "key", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    cw = Window.partitionBy("key")
    y = dense.select(
        "key",
        "hour",
        (
            F.count(F.lit(1)).over(cw) * F.col("cnt")
            - F.sum("cnt").over(cw)
        ).alias("y"),
    )
    lags = y.select(
        "key",
        "hour",
        F.col("y").alias("ya"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(max_lag)))
        ).alias("k"),
    )
    ck = (
        lags.join(
            y.select(
                F.col("key").alias("key_b"),
                F.col("hour").alias("hour_b"),
                F.col("y").alias("yb"),
            ),
            (F.col("key_b") == F.col("key"))
            & (F.col("hour_b") == F.col("hour") + F.col("k")),
        )
        .groupBy("key", "k")
        .agg(F.sum(F.col("ya") * F.col("yb")).alias("c"))
    )

    key_type = dict(df.dtypes)[key_col]
    out_schema = f"key {key_type}, lag long, pacf_micro long, pacf double"
    M = 1_000_000
    K = int(max_lag)

    def _kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("k").reset_index(drop=True)
        c = pdf["c"].astype(int).tolist()
        rows = []
        if len(c) < 2 or c[0] <= 0:
            return pd.DataFrame(
                {"key": [], "lag": [], "pacf_micro": [], "pacf": []}
            ).astype(
                {"lag": "int64", "pacf_micro": "int64", "pacf": "float64"}
            )
        import math

        # division-only double ratio, floor-quantized to micro units:
        # IEEE division is correctly rounded, so both engines see the
        # same bits (and it cannot overflow, unlike M*c as BIGINT)
        r = [int(math.floor(M * (ci / c[0]))) for ci in c]
        kmax = min(K, len(c) - 1)
        phi = [r[1]]
        rows.append(r[1])
        for m in range(2, kmax + 1):
            conv = sum(phi[j] * r[m - 1 - j] for j in range(m - 1))
            deni = sum(phi[j] * r[j + 1] for j in range(m - 1))
            num = r[m] - conv // M
            den = M - deni // M
            if den <= 0:
                break
            pk = (M * num) // den
            phi = [
                phi[j] - (pk * phi[m - 2 - j]) // M
                for j in range(m - 1)
            ] + [pk]
            rows.append(pk)
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]] * len(rows),
                "lag": list(range(1, len(rows) + 1)),
                "pacf_micro": rows,
                "pacf": [p / M for p in rows],
            }
        )

    return ck.groupBy("key").applyInPandas(_kernel, out_schema)


def value_deciles(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Rank-selected decile boundaries of each event type's value
    distribution — the equi-depth histogram edges a monitoring UI
    draws, and the bin plan an equi-depth partitioner would use.

    Boundary i (i = 1..9) is the value at joint rank ceil(i*n/10)
    (exact integer index arithmetic, (i*n + 9) DIV 10), selected with
    the repo's deterministic convention: exact cents, ties broken on
    the order column — never an engine percentile.

    Scale: one ordered window per type (same cost class as the other
    rank-selected medians); the 9 index rows join back on (type,
    rank), a broadcast-scale dimension.
    """
    ev = df.select(
        F.col(type_col).alias("etype"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.col(order_col).alias("oid"),
    )
    w = Window.partitionBy("etype").orderBy("cents", "oid")
    cw = Window.partitionBy("etype")
    ranked = ev.select(
        "etype",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    idx = (
        ranked.groupBy("etype")
        .agg(F.max("n").alias("n"))
        .select(
            "etype",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile"),
        )
        .select(
            "etype",
            "n",
            "decile",
            F.floor(
                (F.col("decile") * F.col("n") + F.lit(9)) / F.lit(10)
            ).cast("long").alias("rn"),
        )
    )
    return ranked.join(F.broadcast(idx), ["etype", "rn"]).select(
        "etype",
        F.col("decile").cast("long").alias("decile"),
        idx["n"].alias("n"),
        F.col("cents").alias("boundary_cents"),
        (F.col("cents").cast("double") / F.lit(100.0)).alias("boundary"),
    )


def rank_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact tie-aware AUC (= Mann-Whitney U / (n_pos * n_neg)) of an
    integer score against a binary label, distributed without a
    global row sort: ranks collapse to the BOUNDED distinct-score
    domain (one hash aggregate to (score, pos_cnt, neg_cnt), one
    ordered window over distinct scores), and the tie-averaged rank
    sum uses DOUBLED ranks so every sufficient statistic is an exact
    BIGINT:

        AUC = (D_pos - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)

    with D_pos the doubled rank sum of positives — ties get the 0.5
    credit automatically.  One shared final division; the row-sort-
    free construction is the same trick as :func:`kruskal_types`.
    """
    sc = df.select(
        F.col(score_col).cast("long").alias("s"),
        F.when(F.col(label_col).cast("int") > 0, 1)
        .otherwise(0)
        .alias("y"),
    )
    per_s = sc.groupBy("s").agg(
        F.sum("y").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).alias("neg"),
    )
    wo = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_s.select(
        "s",
        "pos",
        "neg",
        (
            F.lit(2)
            * (
                F.sum(F.col("pos") + F.col("neg")).over(wo)
                - (F.col("pos") + F.col("neg"))
            )
            + (F.col("pos") + F.col("neg"))
            + F.lit(1)
        ).alias("d2"),
    )
    agg = ranked.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(F.col("pos") * F.col("d2")).alias("d_pos"),
    )
    return agg.filter(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    ).select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        (
            (
                F.col("d_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (F.lit(2.0) * F.col("n_pos").cast("double")
               * F.col("n_neg").cast("double"))
        ).alias("auc"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Reliability table for an integer score vs a binary label: the
    observed positive rate at each score value — AUC's companion
    (:func:`rank_auc` measures ranking power; this measures whether
    the score's LEVELS mean what they say).

    Pure exact-integer aggregation over the bounded score domain with
    one shared rate division per row, plus each bucket's lift over the
    global base rate (one more shared expression).
    """
    sc = df.select(
        F.col(score_col).cast("long").alias("s"),
        F.when(F.col(label_col).cast("int") > 0, 1)
        .otherwise(0)
        .alias("y"),
    )
    per_s = sc.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    cw = Window.partitionBy()
    return per_s.select(
        F.col("s").alias("score"),
        "n",
        "pos",
        (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
            "rate"
        ),
        (
            (F.col("pos").cast("double") / F.col("n").cast("double"))
            / (
                F.sum("pos").over(cw).cast("double")
                / F.sum("n").over(cw).cast("double")
            )
        ).alias("lift"),
    )


def psi_weekly(
    df: DataFrame,
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 640.0,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Population Stability Index between each week's value histogram
    and the PREVIOUS week's — the ML-monitoring drift score (rule of
    thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 act):

        PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

    Only bins populated in BOTH weeks contribute (the standard
    finite-PSI convention; a bin appearing or vanishing outright is
    reported via ``n_oneside_bins`` instead of an infinite term).

    Exactness: bin counts are integers, p/q is the exact integer ratio
    (ca*nb)/(cb*na), (p - q) is the exact rational (ca*nb - cb*na) /
    (na*nb), and each term is floor-quantized to micro-units before an
    exact BIGINT sum (ln is the only libm call — the JSD idiom).

    Scale: one (week, bin) hash aggregate over a bounded bin set, one
    week-lag join on the bounded (week, bin) table.
    """
    width = (hi - lo) / n_bins
    binned = df.select(
        F.floor(F.unix_timestamp(F.col(ts_col)) / 604800)
        .cast("long")
        .alias("week"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
                .cast("int"),
            ),
        ).alias("bin"),
    ).groupBy("week", "bin").agg(F.count(F.lit(1)).alias("c"))
    cw = Window.partitionBy("week")
    cur = binned.select(
        "week",
        "bin",
        F.col("c").alias("ca"),
        F.sum("c").over(cw).alias("na"),
    )
    prev = cur.select(
        (F.col("week") + 1).alias("week"),
        F.col("bin"),
        F.col("ca").alias("cb"),
        F.col("na").alias("nb"),
    )
    j = cur.join(prev, ["week", "bin"], "full_outer").filter(
        F.col("week").isNotNull()
    )
    both = F.col("ca").isNotNull() & F.col("cb").isNotNull()
    term = F.when(
        both,
        F.floor(
            F.lit(1e6)
            * (
                (
                    F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
                ).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            )
            * F.log(
                (F.col("ca") * F.col("nb")).cast("double")
                / (F.col("cb") * F.col("na")).cast("double")
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    agg = j.groupBy("week").agg(
        F.sum(term).alias("micro"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_common_bins"),
        F.sum(F.when(~both, 1).otherwise(0)).alias("n_oneside_bins"),
        F.max(F.when(both, F.col("na"))).alias("n_cur"),
        F.max(F.when(both, F.col("nb"))).alias("n_prev"),
    )
    return agg.filter(F.col("n_common_bins") > 0).select(
        "week",
        F.col("n_cur").alias("n_cur"),
        F.col("n_prev").alias("n_prev"),
        F.col("n_common_bins").cast("long").alias("n_common_bins"),
        F.col("n_oneside_bins").cast("long").alias("n_oneside_bins"),
        (F.col("micro").cast("double") / F.lit(1e6)).alias("psi"),
    )


def breakpoint_daily(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Optimal single structural break per event type: the breakpoint
    ``b`` that minimizes the total SSE of TWO independent OLS lines
    fitted to the daily-count series split at ``b`` — the classic
    two-segment piecewise-linear changepoint (Bai-Perron with m=1),
    complementing the sequential detectors (CUSUM, Page-Hinkley) with
    the retrospective globally-optimal break.

    Determinism contract: daily counts are exact BIGINTs; every
    candidate split's segment statistics come from BIGINT prefix sums
    (one ordered window over the bounded day axis), each segment SSE
    is ``(n*Syy - Sy^2)/n - (n*Sxy - Sx*Sy)^2 / (n*(n*Sxx - Sx^2))``
    — two divisions of exact int64s and one subtraction, the same
    expression tree in both engines, so left+right SSE is bit-
    identical and the (sse ASC, b ASC) argmin needs no tolerance.
    Segments must span >= 2 days (distinct x, so Sxx_c > 0).

    Scale: the data-sized work is ONE hash aggregate to daily counts;
    everything after runs on the vocabulary-bounded (type, day) grid —
    candidate splits are the grid rows themselves, evaluated from
    prefix sums in a single projection (no per-candidate scan).
    """
    daily = (
        df.select(
            F.col(type_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("typ", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    wo = Window.partitionBy("typ").orderBy("day")
    wall = Window.partitionBy("typ")
    xd = daily.select(
        "typ",
        "day",
        "y",
        (F.row_number().over(wo) - 1).alias("x"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    pre = xd.select(
        "typ",
        "day",
        "x",
        "n",
        F.sum("y").over(wo).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wo).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wo).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(wo).alias("syy"),
        F.sum("x").over(wo).alias("sx"),
        F.sum("y").over(wall).alias("ty"),
        F.sum(F.col("x") * F.col("y")).over(wall).alias("txy"),
        F.sum(F.col("x") * F.col("x")).over(wall).alias("txx"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("tyy"),
        F.sum("x").over(wall).alias("tx"),
    )

    def _sse(n, sx, sy, sxx, syy, sxy):
        nc = n.cast("double")
        syy_c = (n * syy - sy * sy).cast("double") / nc
        num = (n * sxy - sx * sy).cast("double")
        den = (n * (n * sxx - sx * sx)).cast("double")
        return syy_c - (num * num) / den

    # candidate split AFTER row x: left = rows [0..x], right = rest;
    # both segments need >= 2 points
    nl = F.col("x") + 1
    nr = F.col("n") - nl
    cand = pre.filter((nl >= 2) & (nr >= 2)).select(
        "typ",
        "n",
        (F.col("x") + 1).alias("b"),
        F.col("day").alias("last_left_day"),
        (
            _sse(nl, F.col("sx"), F.col("sy"), F.col("sxx"),
                 F.col("syy"), F.col("sxy"))
            + _sse(
                nr,
                F.col("tx") - F.col("sx"),
                F.col("ty") - F.col("sy"),
                F.col("txx") - F.col("sxx"),
                F.col("tyy") - F.col("syy"),
                F.col("txy") - F.col("sxy"),
            )
        ).alias("sse_total"),
    )
    wr = Window.partitionBy("typ").orderBy(
        F.col("sse_total").asc(), F.col("b").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.col("typ").alias("event_type"),
            F.col("n").cast("long").alias("n_days"),
            F.col("b").cast("long").alias("break_idx"),
            "last_left_day",
            "sse_total",
        )
    )


def pettitt(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Pettitt rank-based changepoint test per event type (Pettitt
    1979): the nonparametric complement to :func:`breakpoint_daily` —
    it needs no linear model and is immune to outliers, flagging the
    day where the daily-count distribution most plausibly shifts.

        U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
        K   = max_t |U_t|,   p ~= 2*exp(-6K^2 / (n^3 + n^2))

    Exactness: counts are BIGINTs so every ``sgn`` is an exact -1/0/+1;
    by antisymmetry ``sum_{i<=t} sum_{j<=t} sgn = 0``, hence
    ``U_t = sum_{i<=t} V_i`` where ``V_i = sum_{j=1..n} sgn(x_i-x_j)``
    — one within-type day-by-day self-join plus one ordered prefix
    sum, ALL in integers; the approximate p-value is the single shared
    float expression (one exp of a division of exact BIGINTs).
    Ties in ``|U_t|`` break to the earliest day.

    Scale: the data-sized work is one hash aggregate to daily counts;
    the self-join is O(d^2) per type where d is bounded by the
    retention horizon (theil_sen's documented bound), co-partitioned
    on the type key — no pair crosses executors.
    """
    daily = (
        df.select(
            F.col(type_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("typ", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    v = (
        a.join(b, F.col("a.typ") == F.col("b.typ"))
        .groupBy(F.col("a.typ").alias("typ"), F.col("a.day").alias("day"))
        .agg(
            F.sum(
                F.signum(F.col("a.y") - F.col("b.y")).cast("long")
            ).alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w = Window.partitionBy("typ").orderBy("day")
    u = v.select(
        "typ",
        "day",
        "n",
        F.sum("v").over(w).alias("u_t"),
        F.row_number().over(w).alias("t"),
    ).filter(F.col("t") < F.col("n"))
    rk = Window.partitionBy("typ").orderBy(
        F.abs(F.col("u_t")).desc(), F.col("day").asc()
    )
    return (
        u.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            F.col("typ").alias("event_type"),
            F.col("n").cast("long").alias("n_days"),
            F.col("day").alias("break_day"),
            F.abs(F.col("u_t")).cast("long").alias("k_stat"),
            (
                F.lit(2.0)
                * F.exp(
                    (F.lit(-6.0) * F.col("u_t") * F.col("u_t"))
                    / (
                        F.col("n") * F.col("n") * F.col("n")
                        + F.col("n") * F.col("n")
                    ).cast("double")
                )
            ).alias("p_approx"),
        )
    )


# SPRT log-likelihood-ratio increments, quantized to integer PICO
# units (1e12) so the cumulative statistic is an exact BIGINT sum.
# H0: p = 0.4 vs H1: p = 0.5 on the Bernoulli outcome value >= 40.0;
# alpha = beta = 0.05.  Derivations (round(ln(x) * 1e12)):
#   success:  ln(0.5/0.4)  = ln(1.25) -> 223143551314
#   failure:  ln(0.5/0.6)  = ln(5/6)  -> -182321556794
#   bounds:   ln(0.95/0.05) = ln(19)  -> +/- 2944438979166
SPRT_SUCC_PICO = 223143551314
SPRT_FAIL_PICO = -182321556794
SPRT_BOUND_PICO = 2944438979166


def sprt(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 40.0,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per event type: walk
    the event stream in time order and STOP at the first crossing of
    the log-likelihood-ratio bounds — the minimal-expected-sample
    test, and the sequential complement to the fixed-horizon screens
    (wilson_interval, chi2).  Success = ``value >= threshold``;
    H0: p=0.4 vs H1: p=0.5 at alpha = beta = 0.05.

    Exactness: a Bernoulli LLR step takes only TWO values, so both are
    pre-quantized module constants in pico units (SPRT_SUCC_PICO /
    SPRT_FAIL_PICO) and the cumulative LLR is an exact BIGINT prefix
    sum over the (ts, event_id) total order — the first bound crossing
    is an integer comparison, no tolerance anywhere.

    Scale: one hash partition per type, one ordered window with O(1)
    state, one min-rank select — no iteration, no driver state.

    Output: event_type, decision ('accept_h0' | 'reject_h0' |
    'continue'), n_at_decision, llr_pico.
    """
    base = df.select(
        F.col(type_col).alias("typ"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.when(F.col(value_col) >= F.lit(threshold), F.lit(SPRT_SUCC_PICO))
        .otherwise(F.lit(SPRT_FAIL_PICO))
        .alias("step"),
    )
    w = Window.partitionBy("typ").orderBy("ts", "eid")
    cum = base.select(
        "typ",
        F.row_number().over(w).alias("rn"),
        F.sum("step").over(w).alias("llr"),
    )
    crossed = cum.filter(
        (F.col("llr") >= F.lit(SPRT_BOUND_PICO))
        | (F.col("llr") <= F.lit(-SPRT_BOUND_PICO))
    )
    first = Window.partitionBy("typ").orderBy("rn")
    decided = (
        crossed.withColumn("k", F.row_number().over(first))
        .filter(F.col("k") == 1)
        .select(
            "typ",
            F.when(F.col("llr") >= SPRT_BOUND_PICO, F.lit("reject_h0"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            F.col("rn").cast("long").alias("n_at_decision"),
            F.col("llr").alias("llr_pico"),
        )
    )
    last = Window.partitionBy("typ").orderBy(F.col("rn").desc())
    undecided = (
        cum.withColumn("k", F.row_number().over(last))
        .filter(F.col("k") == 1)
        .join(decided.select("typ"), "typ", "left_anti")
        .select(
            "typ",
            F.lit("continue").alias("decision"),
            F.col("rn").cast("long").alias("n_at_decision"),
            F.col("llr").alias("llr_pico"),
        )
    )
    return decided.unionByName(undecided).withColumnsRenamed(
        {"typ": "event_type"}
    )


def hampel(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    half_window: int = 3,
    k_x10000: int = 44478,
) -> DataFrame:
    """Hampel identifier over the hourly count series per event type:
    the robust outlier filter (rolling median +/- k * MAD) that survives
    the level shifts and fat tails that wreck a rolling z-score — the
    standard pre-cleaning step before fitting anything to an ops
    series (reference analogue: tsaug's AddNoise/Dropout corruptions
    are exactly what this filter is built to undo,
    /root/reference/src/tsaug/_augmenter/add_noise.py:1).

    Exactness: hourly counts are BIGINTs.  The centered window of
    2*half_window+1 counts is materialized as a sorted array; the
    median is the LOWER middle element (exact integer selection, no
    interpolation), MAD is the same selection over |x_i - med|, and
    the decision  |x - med| * 10000 > k_x10000 * MAD  (k = 3 * 1.4826
    by default) is a pure int64 comparison — zero float arithmetic, so
    both engines agree bit-exactly everywhere including the shrunken
    edge windows.

    Scale: one hash aggregate to the (type, hour) grain, then a
    7-element rolling array per row of a BOUNDED frame (types x
    retention hours) — the collect_list window runs on the rolled-up
    series, never on raw events.  Output grain = input grain, ready to
    feed the gap-fill / rollup cascade in place of the raw series.
    """
    hourly = (
        df.select(
            F.col(type_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
            .cast("long")
            .alias("hr"),
        )
        .groupBy("typ", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = (
        Window.partitionBy("typ")
        .orderBy("hr")
        .rowsBetween(-half_window, half_window)
    )
    arr = F.array_sort(F.collect_list("y").over(w))
    with_med = hourly.select(
        "typ",
        "hr",
        "y",
        arr.alias("win"),
        F.element_at(
            arr, F.floor((F.size(arr) + 1) / 2).cast("int")
        ).alias("med"),
    )
    dev = F.array_sort(
        F.transform("win", lambda v: F.abs(v - F.col("med")))
    )
    scored = with_med.select(
        "typ",
        "hr",
        "y",
        "med",
        F.element_at(
            dev, F.floor((F.size(dev) + 1) / 2).cast("int")
        ).alias("mad"),
        F.size("win").cast("long").alias("n_win"),
    ).select(
        "typ",
        "hr",
        "y",
        "med",
        "mad",
        "n_win",
        (
            F.abs(F.col("y") - F.col("med")) * F.lit(10000)
            > F.lit(int(k_x10000)) * F.col("mad")
        ).alias("is_outlier"),
    )
    return scored.select(
        F.col("typ").alias("event_type"),
        "hr",
        "y",
        "med",
        "mad",
        "n_win",
        "is_outlier",
        F.when(F.col("is_outlier"), F.col("med"))
        .otherwise(F.col("y"))
        .alias("filtered"),
    )


def fdr_bh(
    df: DataFrame,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-type Pettitt
    changepoint p-values (Benjamini & Hochberg 1995): with hundreds of
    event types, "which series REALLY shifted?" needs multiple-testing
    correction or ~5% of stable series get flagged every run.

    Procedure: sort the m per-type p-values ascending; reject
    H0 for every rank i <= i* where i* = max{ i : p_(i) <= i*alpha/m }.

    Determinism: the p-values come from :func:`pettitt`, whose p_approx
    is a single shared exp() expression of exact BIGINTs (already
    oracle-proven bit-equal); the BH comparison multiplies p by the
    exact integers m*alpha_den and compares against i*alpha_num — the
    float products are the same two-operand expressions in both
    engines, and rank ties break on the type name.

    Scale: runs entirely on the m-row (one per type) Pettitt output —
    a single global-window pass over a vocabulary-bounded frame.
    """
    p = pettitt(df).select(
        "event_type",
        F.col("p_approx").alias("p"),
        F.col("break_day"),
    )
    wr = Window.orderBy(F.col("p").asc(), F.col("event_type").asc())
    wall = Window.partitionBy()
    ranked = p.select(
        "event_type",
        "break_day",
        "p",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("m"),
    ).select(
        "*",
        F.when(
            F.col("p") * (F.col("m") * F.lit(int(alpha_den)))
            <= (F.col("i") * F.lit(int(alpha_num))).cast("double"),
            F.col("i"),
        )
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    return ranked.select(
        "event_type",
        "break_day",
        "p",
        F.col("i").cast("long").alias("p_rank"),
        F.col("m").cast("long").alias("m_tests"),
        (F.col("i") <= F.max("hit").over(wall)).alias("rejected"),
    )


def kendall_pairs(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Kendall's tau-b between every pair of event types' daily value
    totals — the concordance-counting rank correlation whose pairwise
    definition is EXACT integer arithmetic end to end (Kendall 1938;
    tau-b tie correction per Agresti), completing the association
    toolkit next to :func:`spearman_pairs` (average ranks) and the
    Pearson rolling correlations.

    Pairing is on common active days; every unordered day pair
    (d_i < d_j) is classified by the sign pair of (x_i - x_j,
    y_i - y_j): concordant, discordant, x-tied, y-tied.  With
    n0 = D*(D-1)/2, n1 = #x-tied pairs, n2 = #y-tied pairs (both
    INCLUDING jointly-tied pairs, matching the Sum t_k*(t_k-1)/2
    group form exactly),

        tau_b = (nc - nd) / sqrt((n0 - n1) * (n0 - n2))

    — one shared float division/sqrt of exact BIGINTs, so both
    engines agree to the last bit.

    Scale: one (type, day) hash aggregate absorbs event volume; the
    day self-join is vocabulary^2 x horizon^2 over the ROLLED-UP
    frame (types x days), never the raw events — bounded by the
    retention horizon, the same contract as the Pettitt U-statistic.
    """
    d = df.select(
        F.col(type_col).alias("etype"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    ).groupBy("etype", "day").agg(F.sum("cents").alias("cents"))
    a = d.select(
        F.col("etype").alias("ta"), "day", F.col("cents").alias("ca")
    )
    b = d.select(
        F.col("etype").alias("tb"), "day", F.col("cents").alias("cb")
    )
    j = a.join(b, "day").filter(F.col("ta") < F.col("tb"))
    p1 = j.select(
        "ta", "tb", F.col("day").alias("d1"),
        F.col("ca").alias("x1"), F.col("cb").alias("y1"),
    )
    p2 = j.select(
        "ta", "tb", F.col("day").alias("d2"),
        F.col("ca").alias("x2"), F.col("cb").alias("y2"),
    )
    pairs = p1.join(p2, ["ta", "tb"]).filter(F.col("d1") < F.col("d2"))
    dx = F.signum((F.col("x1") - F.col("x2")).cast("double"))
    dy = F.signum((F.col("y1") - F.col("y2")).cast("double"))
    cls = pairs.select(
        "ta",
        "tb",
        (dx * dy > 0).cast("long").alias("is_c"),
        (dx * dy < 0).cast("long").alias("is_d"),
        (dx == 0).cast("long").alias("is_tx"),
        (dy == 0).cast("long").alias("is_ty"),
    )
    counts = cls.groupBy("ta", "tb").agg(
        F.sum("is_c").alias("nc"),
        F.sum("is_d").alias("nd"),
        F.sum("is_tx").alias("n1"),
        F.sum("is_ty").alias("n2"),
        F.count(F.lit(1)).alias("n0"),
    )
    denom = (
        (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n2"))
    ).cast("double")
    return counts.filter(denom > 0).select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("concordant"),
        F.col("nd").cast("long").alias("discordant"),
        F.col("n1").cast("long").alias("x_tied"),
        F.col("n2").cast("long").alias("y_tied"),
        (
            (F.col("nc") - F.col("nd")).cast("double") / F.sqrt(denom)
        ).alias("tau_b"),
    )


def absorbing_conversion(
    df: DataFrame,
    target: str = "purchase",
    n_iters: int = 12,
    scale: int = 10**6,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """P(the chain hits ``target`` before the session ends | current
    event type) by bounded VALUE ITERATION on the empirical event-type
    Markov chain with two absorbing states — ``target`` (value 1) and
    the terminal END pseudo-state appended after each user's last
    event (value 0).  This is the "how close is each state to
    converting" complement of :func:`markov_stationary`'s long-run
    occupancy.

    Determinism: probabilities are integers in units of 1/scale.
    With c_xy the exact bigram counts (rows FROM ``target`` excluded —
    it absorbs) and base_x = scale * c_{x,target}:

        v_{k+1}(x) = (base_x + Sum_y c_xy * v_k(y)) div c_x

    summed over SOURCE states y only — transitions to END or to
    never-a-source states contribute exactly 0 (they dead-end), and
    the int64 product sum is fold-order-free, so the oracle replays
    the identical recurrence with a plain GROUP BY SUM in a recursive
    CTE.  A zero-count self-loop is unioned under every source so a
    state whose targets are all absorbing still survives the inner
    join each round.  Bounds: v <= scale, so each product <=
    c_xy * scale and the sum <= c_x * scale ~ 1e6 * events — far
    below 2^63 for any vocabulary-bounded chain.

    Scale: the transition frame is vocabulary-bounded (|types|^2
    rows); each of the ``n_iters`` rounds joins and aggregates that
    constant-size frame.  Only the bigram count touches event volume.
    """
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    bi = (
        df.select(
            F.col(type_col).alias("x"),
            F.lead(F.col(type_col), 1, "__END__").over(w).alias("y"),
        )
        .filter(F.col("x") != target)
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    src = bi.select("x").distinct()
    bse = bi.groupBy("x").agg(
        (
            F.sum(
                F.when(F.col("y") == target, F.col("c_xy")).otherwise(
                    F.lit(0)
                )
            )
            * F.lit(int(scale))
        ).alias("b"),
        F.sum("c_xy").alias("c_x"),
    )
    c2 = (
        bi.join(
            src.select(F.col("x").alias("y")), "y", "left_semi"
        ).select("x", "y", "c_xy")
        .unionByName(
            src.select(
                "x",
                F.col("x").alias("y"),
                F.lit(0).cast("long").alias("c_xy"),
            )
        )
        .transform(truncate_lineage_lazy)
    )
    v = src.select("x", F.lit(0).cast("long").alias("v"))
    for i in range(n_iters):
        vy = v.select(F.col("x").alias("y"), F.col("v").alias("vy"))
        s = (
            c2.join(vy, "y")
            .groupBy("x")
            .agg(F.sum(F.col("c_xy") * F.col("vy")).alias("s"))
        )
        v = s.join(bse, "x").select(
            "x",
            F.expr("(b + s) div c_x").alias("v"),
        )
        if (i + 1) % 4 == 0 and i + 1 < n_iters:
            v = v.transform(truncate_lineage_lazy)
    return v.join(bse, "x").select(
        F.col("x").alias("event_type"),
        F.col("c_x").cast("long").alias("n_out"),
        F.col("v").cast("long").alias("p_micro"),
        (F.col("v").cast("double") / F.lit(float(scale))).alias(
            "p_convert"
        ),
    )


def ar2_forecast(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_obs: int = 5,
) -> DataFrame:
    """AR(2) fit by Yule-Walker over each type's hourly count series,
    plus the one-step-ahead forecast — the minimal autoregressive
    model whose closed form needs no iteration (Box & Jenkins ch. 3):

        phi1 = g1 (g0 - g2) / (g0^2 - g1^2)
        phi2 = (g0 g2 - g1^2) / (g0^2 - g1^2)
        yhat = ybar + phi1 (y_n - ybar) + phi2 (y_{n-1} - ybar)

    Exactness: with m = sum(y) and n the series length, the lag-k
    autocovariance NUMERATORS are computed as exact BIGINTs
    g_k = Sum_t (n*y_t - m)(n*y_{t+k} - m) — every common scale
    cancels in the phi ratios, so the only floats are the fixed-shape
    trees above over three exact integers (g0^2 can exceed int64, so
    the SQUARES are taken in double — same two-operand products both
    engines).  The series is the type's observed hourly sequence in
    hour order (row-adjacent lags, the standard gap-skipping ACF
    convention used by :func:`autocorr` here).

    Scale: one (type, hour) hash aggregate absorbs event volume; lags
    are two window passes over the rolled-up, horizon-bounded frame;
    the fit is a per-type 1-row aggregate.
    """
    hourly = (
        df.select(
            F.col(type_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
            .cast("long")
            .alias("hr"),
        )
        .groupBy("typ", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    tot = hourly.groupBy("typ").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("m")
    )
    w = Window.partitionBy("typ").orderBy("hr")
    wlast = Window.partitionBy("typ").orderBy(F.col("hr").desc())
    z = (
        hourly.join(tot, "typ")
        .select(
            "typ",
            "hr",
            "y",
            "n",
            "m",
            (F.col("n") * F.col("y") - F.col("m")).alias("z"),
        )
        .select(
            "*",
            F.lag("z", 1).over(w).alias("z1"),
            F.lag("z", 2).over(w).alias("z2"),
            F.row_number().over(wlast).alias("rlast"),
        )
    )
    agg = z.groupBy("typ").agg(
        F.min("n").alias("n"),
        F.min("m").alias("m"),
        F.sum(F.col("z") * F.col("z")).alias("g0"),
        F.sum(F.col("z") * F.col("z1")).alias("g1"),
        F.sum(F.col("z") * F.col("z2")).alias("g2"),
        F.max(F.when(F.col("rlast") == 1, F.col("y"))).alias("y_n"),
        F.max(F.when(F.col("rlast") == 2, F.col("y"))).alias("y_n1"),
    ).filter(F.col("n") >= int(min_obs))
    g0 = F.col("g0").cast("double")
    g1 = F.col("g1").cast("double")
    g2 = F.col("g2").cast("double")
    den = g0 * g0 - g1 * g1
    phi1 = (g1 * (g0 - g2)) / den
    phi2 = (g0 * g2 - g1 * g1) / den
    ybar = F.col("m").cast("double") / F.col("n").cast("double")
    yhat = (
        ybar
        + phi1 * (F.col("y_n").cast("double") - ybar)
        + phi2 * (F.col("y_n1").cast("double") - ybar)
    )
    return agg.filter(den > 0).select(
        F.col("typ").alias("event_type"),
        F.col("n").cast("long").alias("n_hours"),
        F.col("g0").cast("long").alias("g0"),
        F.col("g1").cast("long").alias("g1"),
        F.col("g2").cast("long").alias("g2"),
        phi1.alias("phi1"),
        phi2.alias("phi2"),
        ybar.alias("y_mean"),
        yhat.alias("forecast"),
    )


def isotonic_rate(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of a binary
    label's rate on an integer score — the PAV-fitted calibrator
    (Barlow et al. 1972; Zadrozny & Elkan 2002) that
    :func:`calibration_curve` diagnoses the need for, computed via
    the MINIMAX closed form instead of the sequential
    pool-adjacent-violators sweep:

        iso(i) = max_{j <= i} min_{k >= i} pos(j..k) / n(j..k)

    which equals the PAVA solution exactly and is pure relational
    algebra: prefix sums over the BOUNDED score domain, one
    (j, k)-grid of weighted segment averages (each ONE float division
    of exact BIGINT prefix differences), a right-running min per j,
    and a max per i — min/max of floats are selections, not folds,
    so both engines agree bit-exactly.

    Scale: event volume hits only the first (score) hash aggregate;
    the B^2 segment grid lives on the bounded score domain (B distinct
    scores), the standard calibration regime of B <= a few hundred.
    """
    sc = df.select(
        F.col(score_col).cast("long").alias("s"),
        F.when(F.col(label_col).cast("int") > 0, 1)
        .otherwise(0)
        .alias("y"),
    )
    per_s = sc.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wi = Window.orderBy("s")
    wp = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    b = per_s.select(
        "s",
        "n",
        "pos",
        F.row_number().over(wi).alias("i"),
        F.sum("n").over(wp).alias("pn"),
        F.sum("pos").over(wp).alias("pp"),
    )
    j = b.select(
        F.col("i").alias("j"),
        (F.col("pn") - F.col("n")).alias("pn_j0"),
        (F.col("pp") - F.col("pos")).alias("pp_j0"),
    )
    k = b.select(
        F.col("i").alias("k"),
        F.col("pn").alias("pn_k"),
        F.col("pp").alias("pp_k"),
    )
    grid = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("pp_k") - F.col("pp_j0")).cast("double")
            / (F.col("pn_k") - F.col("pn_j0")).cast("double")
        ).alias("avg_jk"),
    )
    wmin = (
        Window.partitionBy("j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = grid.select(
        "j",
        F.col("k").alias("i"),
        F.min("avg_jk").over(wmin).alias("min_k"),
    )
    iso = m.groupBy("i").agg(F.max("min_k").alias("iso_rate"))
    return b.join(iso, "i").select(
        F.col("s").alias("score"),
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("pos"),
        (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
            "raw_rate"
        ),
        F.col("iso_rate"),
    )


def moments(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Skewness and excess kurtosis per event type from EXACT integer
    power sums — the shape diagnostics (is the value distribution
    heavy-tailed? lopsided?) behind every "can I use a z-score here"
    decision, computed without a second pass or float accumulation.

    Values are quantized once to integer units (round(value)); s1..s4
    are exact BIGINT sums of its powers, and the central moments come
    from the standard raw-to-central identities evaluated as ONE
    fixed-shape float tree over (n, s1..s4):

        m2 = s2/n - mean^2
        m3 = s3/n - 3 mean s2/n + 2 mean^3
        m4 = s4/n - 4 mean s3/n + 6 mean^2 s2/n - 3 mean^4
        skew = m3 / m2^1.5,   ex_kurt = m4 / m2^2 - 3

    Bound: unit^4 * n < 2^63 — with values <= ~2000 units that holds
    to ~5e8 rows per type; beyond that, pre-aggregate counts per
    distinct unit (the domain is bounded) and weight the powers.

    Scale: one hash aggregate, map-side combined; 5-integer state per
    type.
    """
    u = F.round(F.col(value_col), 0).cast("long")
    agg = (
        df.select(F.col(type_col).alias("etype"), u.alias("u"))
        .groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("u").alias("s1"),
            F.sum(F.col("u") * F.col("u")).alias("s2"),
            F.sum(F.col("u") * F.col("u") * F.col("u")).alias("s3"),
            F.sum(
                F.col("u") * F.col("u") * F.col("u") * F.col("u")
            ).alias("s4"),
        )
    )
    nf = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nf
    r2 = F.col("s2").cast("double") / nf
    r3 = F.col("s3").cast("double") / nf
    r4 = F.col("s4").cast("double") / nf
    m2 = r2 - mean * mean
    m3 = r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean
    m4 = (
        r4
        - F.lit(4.0) * mean * r3
        + F.lit(6.0) * mean * mean * r2
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return agg.filter(m2 > 0).select(
        F.col("etype").alias("event_type"),
        F.col("n").cast("long").alias("n"),
        F.col("s1").cast("long").alias("s1"),
        F.col("s2").cast("long").alias("s2"),
        F.col("s3").cast("long").alias("s3"),
        F.col("s4").cast("long").alias("s4"),
        mean.alias("mean_u"),
        m2.alias("m2"),
        (m3 / F.sqrt(m2 * m2 * m2)).alias("skewness"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("ex_kurtosis"),
    )


def wilcoxon_prepost(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    outcome_type: str = "purchase",
) -> DataFrame:
    """Wilcoxon signed-rank test of per-user outcome counts before vs
    after the horizon's integer midpoint day — the nonparametric
    paired test (Wilcoxon 1945) that asks "did the TYPICAL user shift"
    where a paired t-test would be dragged by whales.

    Exactness: differences d_u = post - pre are exact BIGINTs; zeros
    drop (the standard convention); |d| gets the tie-aware DOUBLED
    average rank 2m + t - 1 (the :func:`spearman_pairs` idiom — an
    exact BIGINT), and the statistic uses the exact identities

        W2+ = Sum_{d>0} r2_u,   E[W2+] = Sum r2 / 2,
        Var(W2+) = Sum r2^2 / 4

    (the conditional-signs variance, which absorbs tie corrections
    automatically), so z = (W2+ - Sum r2/2) / sqrt(Sum r2^2 / 4) is
    one fixed float tree over three exact integers.

    Scale: one (user, period) hash aggregate absorbs event volume;
    ranking is one window over the user-grain frame.  Output is one
    row: n_users, the integer sufficient statistics, z, and the
    |z| > 1.96 flag.
    """
    dayc = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast(
        "long"
    )
    span = df.agg(
        F.min(dayc).alias("mnd"), F.max(dayc).alias("mxd")
    ).select(F.expr("(mnd + mxd + 1) div 2").alias("split_day"))
    d = (
        df.crossJoin(F.broadcast(span))
        .select(
            F.col(user_col).alias("u"),
            F.when(
                (F.col(type_col) == outcome_type)
                & (dayc >= F.col("split_day")),
                1,
            )
            .when(
                (F.col(type_col) == outcome_type)
                & (dayc < F.col("split_day")),
                -1,
            )
            .otherwise(0)
            .alias("signed"),
        )
        .groupBy("u")
        .agg(F.sum("signed").alias("d"))
        .filter(F.col("d") != 0)
    )
    wr = Window.orderBy(F.abs(F.col("d")))
    wt = Window.partitionBy(F.abs(F.col("d")))
    ranked = d.select(
        "u",
        "d",
        (
            F.lit(2) * F.rank().over(wr)
            + F.count(F.lit(1)).over(wt)
            - F.lit(1)
        ).alias("r2"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(0)).alias(
            "w2_plus"
        ),
        F.sum("r2").alias("sum_r2"),
        F.sum(F.col("r2") * F.col("r2")).alias("sum_r2sq"),
    )
    z = (
        F.col("w2_plus").cast("double")
        - F.col("sum_r2").cast("double") / F.lit(2.0)
    ) / F.sqrt(F.col("sum_r2sq").cast("double") / F.lit(4.0))
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("w2_plus").cast("long").alias("w2_plus"),
        F.col("sum_r2").cast("long").alias("sum_r2"),
        F.col("sum_r2sq").cast("long").alias("sum_r2sq"),
        z.alias("z"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


def overdispersion(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_days: int = 3,
) -> DataFrame:
    """Index-of-dispersion test per event type's daily counts — the
    "is this really Poisson?" gate (Fisher 1950) that decides whether
    a plain rate alert threshold is valid or the series is bursty and
    needs a negative-binomial / robust treatment.

        D = s^2 / ybar = (n*S2 - S1^2) / ((n - 1) * S1)

    with S1, S2 exact BIGINT sums of the daily counts and their
    squares — ONE float expression over three exact integers.  Under
    H0 (Poisson), (n-1)*D ~ chi2(n-1); the normal-approx flag uses
    the standard two-sigma band  D > 1 + 2*sqrt(2/(n-1)).

    Scale: one (type, day) hash aggregate absorbs event volume, one
    per-type fold over the horizon-bounded day frame.
    """
    daily = (
        df.select(
            F.col(type_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("typ", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    agg = daily.groupBy("typ").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    ).filter(F.col("n") >= int(min_days))
    disp = (
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (
            (F.col("n") - 1) * F.col("s1")
        ).cast("double")
    )
    thresh = F.lit(1.0) + F.lit(2.0) * F.sqrt(
        F.lit(2.0) / (F.col("n") - 1).cast("double")
    )
    return agg.select(
        F.col("typ").alias("event_type"),
        F.col("n").cast("long").alias("n_days"),
        F.col("s1").cast("long").alias("sum_y"),
        F.col("s2").cast("long").alias("sum_y2"),
        disp.alias("dispersion"),
        ((F.col("n") - 1).cast("double") * disp).alias("chi2_stat"),
        (disp > thresh).alias("overdispersed"),
    )


def granger_daily(
    df: DataFrame,
    target_type: str = "purchase",
    driver_type: str = "click",
    ts_col: str = "ts",
    type_col: str = "event_type",
    f_crit_x100: int = 384,
) -> DataFrame:
    """Lag-1 Granger causality test: do yesterday's DRIVER counts
    improve today's TARGET forecast beyond the target's own history
    (Granger 1969)?  Fits y_t = a + b*y_{t-1} + c*x_{t-1} and the
    restricted y_t = a + b*y_{t-1} by closed-form OLS and reports

        F = (SSE_r - SSE_f) / (SSE_f / (n - 3))

    Exactness: the Gram sums (n, SY, SA, SB, SYY, SAA, SBB, SAB, SAY,
    SBY over y_t, y_{t-1}, x_{t-1}) are exact BIGINTs; the centered
    cross-products c** = n*S** - S*S* are exact int64 (counts up to
    ~1e6/day x 3-year horizons stay under 2^63 — beyond that, cast
    the leaves first); the normal-equation solution (Cramer), both
    SSEs and F are one fixed-shape float tree, identical in both
    engines.  Adjacency is row-adjacent on the common-day inner join,
    the gap-skipping convention shared with :func:`ar2_forecast`.

    Scale: one (type, day) hash aggregate, one day-keyed inner join of
    two horizon-bounded series, one window lag pass, one 1-row fold.
    """
    daily = (
        df.filter(F.col(type_col).isin([target_type, driver_type]))
        .select(
            F.col(type_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("typ", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    y = daily.filter(F.col("typ") == target_type).select(
        "day", F.col("c").alias("yv")
    )
    x = daily.filter(F.col("typ") == driver_type).select(
        "day", F.col("c").alias("xv")
    )
    both = y.join(x, "day")
    w = Window.orderBy("day")
    lagged = both.select(
        F.col("yv").alias("yt"),
        F.lag("yv", 1).over(w).alias("a"),
        F.lag("xv", 1).over(w).alias("b"),
    ).filter(F.col("a").isNotNull())
    g = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yt").alias("sy"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("yt") * F.col("yt")).alias("syy"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("yt")).alias("say"),
        F.sum(F.col("b") * F.col("yt")).alias("sby"),
    )
    n = F.col("n")
    cyy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    caa = (n * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    cbb = (n * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    cab = (n * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    cay = (n * F.col("say") - F.col("sa") * F.col("sy")).cast("double")
    cby = (n * F.col("sby") - F.col("sb") * F.col("sy")).cast("double")
    det = caa * cbb - cab * cab
    bcoef = (cay * cbb - cby * cab) / det
    ccoef = (cby * caa - cay * cab) / det
    sse_f = cyy - bcoef * cay - ccoef * cby
    sse_r = cyy - (cay / caa) * cay
    fstat = (sse_r - sse_f) / (
        sse_f / (n.cast("double") - F.lit(3.0))
    )
    crit = F.lit(int(f_crit_x100)).cast("double") / F.lit(100.0)
    # a PERFECT full fit (sse_f == 0) has no finite F — and ANSI mode
    # makes the division an error, not an inf — so it is filtered out
    # like the det-singular case (document: trivially "significant")
    return g.filter((det > 0) & (n > 3) & (sse_f > 0)).select(
        n.cast("long").alias("n_days"),
        bcoef.alias("coef_target_lag"),
        ccoef.alias("coef_driver_lag"),
        sse_f.alias("sse_full"),
        sse_r.alias("sse_restricted"),
        fstat.alias("f_stat"),
        (fstat > crit).alias("granger_significant"),
    )


def holm_bonferroni(
    df: DataFrame,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> DataFrame:
    """Holm step-DOWN FWER control over the per-type Pettitt p-values
    (Holm 1979) — the family-wise companion to :func:`fdr_bh`'s FDR
    control: reject while p_(i) <= alpha / (m - i + 1), stop at the
    first failure.  Holm controls the stricter criterion (ANY false
    rejection) and is what "we alert on-call on this" families want.

    Determinism: the step-down prefix is  i <= min{ i : p_i * (m - i
    + 1) * alpha_den > i... } — implemented as a running-AND via a
    window MIN over the per-rank pass/fail flag: rejected(i) = every
    rank <= i passed p_(j) * (m - j + 1) * alpha_den <= alpha_num
    (one shared float product per rank, rank ties broken on the type
    name, exactly the :func:`fdr_bh` idiom).

    Scale: runs on the m-row Pettitt output; one global window pass.
    """
    p = pettitt(df).select(
        "event_type",
        F.col("p_approx").alias("p"),
        F.col("break_day"),
    )
    wr = Window.orderBy(F.col("p").asc(), F.col("event_type").asc())
    wall = Window.partitionBy()
    wpre = Window.orderBy(
        F.col("p").asc(), F.col("event_type").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = p.select(
        "event_type",
        "break_day",
        "p",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("m"),
    ).select(
        "*",
        F.when(
            F.col("p")
            * ((F.col("m") - F.col("i") + 1) * F.lit(int(alpha_den)))
            <= F.lit(int(alpha_num)).cast("double"),
            1,
        )
        .otherwise(0)
        .alias("passed"),
    )
    return ranked.select(
        "event_type",
        "break_day",
        "p",
        F.col("i").cast("long").alias("p_rank"),
        F.col("m").cast("long").alias("m_tests"),
        (F.min("passed").over(wpre) == 1).alias("rejected"),
    )


def markov_attribution(
    df: DataFrame,
    target: str = "purchase",
    n_iters: int = 12,
    scale: int = 10**6,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Markov-chain attribution by REMOVAL EFFECT (Anderl et al. 2016
    — the data-driven alternative to the positional credit rules in
    metrics.py::attribution_models): for each candidate channel c,
    delete it from the empirical event-type chain (paths through it
    fail) and measure how much the start-weighted conversion
    probability drops:

        removal_effect(c) = 1 - P_removed-c(convert) / P(convert)

    Built on the :func:`absorbing_conversion` integer value iteration:
    the state space gains a ``removed`` dimension (one replica of the
    vocabulary-bounded chain per candidate channel plus the baseline),
    transitions INTO the removed state contribute exactly 0 (absorbed
    at failure), rows FROM it are dropped, and all replicas iterate in
    the SAME joins — adding channels widens a bounded frame, it never
    adds passes.  P(convert) aggregates the per-state values over the
    exact first-event distribution: sum(n_first(s) * v(s)) div
    sum(n_first) — all int64, fold-order-free, so the oracle replays
    the identical recurrence in one recursive CTE over (removed,
    state).

    Output per channel: the baseline and removed start-weighted
    conversion probabilities (micro units + floats) and the removal
    effect — the budget-split weights after normalization.
    """
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    seq = df.select(
        F.col(key_col).alias("k"),
        F.col(type_col).alias("x"),
        F.lead(F.col(type_col), 1, "__END__").over(w).alias("y"),
        F.row_number().over(w).alias("rn"),
    )
    bi = (
        seq.filter(F.col("x") != target)
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    first = (
        seq.filter(F.col("rn") == 1)
        .filter(F.col("x") != target)
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    src = bi.select("x").distinct()
    channels = src.filter(
        ~F.col("x").isin([target, "__END__"])
    ).select(F.col("x").alias("removed"))
    reps = channels.unionByName(
        src.sparkSession.createDataFrame(
            [("__none__",)], "removed string"
        )
    ).transform(truncate_lineage_lazy)
    # replicate the chain per removal: drop rows FROM the removed
    # state; transitions INTO it are handled below (worth 0, so they
    # simply never join) — the zero self-loop keeps every survivor
    # source alive in the inner join
    rbi = reps.crossJoin(bi).filter(F.col("x") != F.col("removed"))
    bse = rbi.groupBy("removed", "x").agg(
        (
            F.sum(
                F.when(F.col("y") == target, F.col("c_xy")).otherwise(
                    F.lit(0)
                )
            )
            * F.lit(int(scale))
        ).alias("b"),
        F.sum("c_xy").alias("c_x"),
    )
    rsrc = bse.select("removed", "x")
    c2 = (
        rbi.join(
            rsrc.select("removed", F.col("x").alias("y")),
            ["removed", "y"],
            "left_semi",
        )
        .select("removed", "x", "y", "c_xy")
        .unionByName(
            rsrc.select(
                "removed",
                "x",
                F.col("x").alias("y"),
                F.lit(0).cast("long").alias("c_xy"),
            )
        )
        .transform(truncate_lineage_lazy)
    )
    v = rsrc.select("removed", "x", F.lit(0).cast("long").alias("v"))
    for i in range(n_iters):
        vy = v.select(
            "removed", F.col("x").alias("y"), F.col("v").alias("vy")
        )
        s = (
            c2.join(vy, ["removed", "y"])
            .groupBy("removed", "x")
            .agg(F.sum(F.col("c_xy") * F.col("vy")).alias("s"))
        )
        v = s.join(bse, ["removed", "x"]).select(
            "removed", "x", F.expr("(b + s) div c_x").alias("v")
        )
        if (i + 1) % 4 == 0 and i + 1 < n_iters:
            v = v.transform(truncate_lineage_lazy)
    # start-weighted conversion per replica over the exact first-event
    # distribution (first events on the removed channel count as
    # failed starts in that replica — weight kept, value 0)
    starts = reps.crossJoin(first).select(
        F.col("removed").alias("rem"),
        F.col("x").alias("sx"),
        F.col("n_first").alias("nf"),
    )
    pconv = (
        starts.join(
            v,
            (starts["sx"] == v["x"]) & (starts["rem"] == v["removed"]),
            "left",
        )
        .select(
            "rem",
            "nf",
            F.coalesce(v["v"], F.lit(0)).alias("vv"),
        )
        .groupBy("rem")
        .agg(
            F.sum("nf").alias("n_starts"),
            F.expr("sum(nf * vv) div sum(nf)").alias("p_micro"),
        )
    )
    base = pconv.filter(F.col("rem") == "__none__").select(
        F.col("p_micro").alias("base_micro")
    )
    return (
        pconv.filter(F.col("rem") != "__none__")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("rem").alias("channel"),
            F.col("n_starts").cast("long").alias("n_starts"),
            F.col("base_micro").cast("long").alias("base_micro"),
            F.col("p_micro").cast("long").alias("removed_micro"),
            (
                F.lit(1.0)
                - F.col("p_micro").cast("double")
                / F.col("base_micro").cast("double")
            ).alias("removal_effect"),
        )
    )


# ---------------------------------------------------------------------------
# round 4: long-memory / stationarity / complexity screening + the
# distributed bootstrap.  Same determinism contract as the rest of the
# module: integer sufficient statistics, one shared float expression.
# ---------------------------------------------------------------------------


def _dense_hourly(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Dense zero-filled hourly count series per key with a 0-based
    hour index ``t`` (shared by hurst/variance-ratio/dickey-fuller/
    ljung-box below; same grid contract as metrics._dense_count_series
    — the global [min, max] hour span, every key zero-filled)."""
    from tsaug_spark.plans.metrics import _dense_count_series

    s = _dense_count_series(df, "1h", key_col, ts_col)
    return s.select(
        "key",
        ((F.col("bucket_s") - F.col("lo")) / F.lit(3600))
        .cast("long")
        .alias("t"),
        "x",
    )


def hurst_rs(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    block_sizes: tuple[int, ...] = (8, 16, 32, 64),
) -> DataFrame:
    """Hurst exponent per key by rescaled-range (R/S) analysis of the
    dense hourly count series — the long-memory screen (H ~ 0.5 random
    walk increments, H > 0.5 persistent/trending load, H < 0.5
    mean-reverting).

    For each block size n, the series splits into consecutive complete
    blocks; per block the range R of cumulative mean-deviations over
    the standard deviation S gives R/S, and H is the least-squares
    slope of ln(mean R/S) on ln(n).

    Exactness: with per-block sums kept as integers, the cumulative
    deviation scaled by n is z_i = n*csum_i - (i+1)*S_n (exact BIGINT),
    so R_int = max z - min z = n*R and SS = n*sumx2 - S_n^2 = n^2*var
    are exact, and R/S = R_int / sqrt(SS) is ONE shared float division
    per block.  Blocks with SS = 0 are dropped (R/S undefined), as are
    keys with fewer than two usable sizes.

    Scale: the dense grid is keys x retention-bounded hours; each block
    statistic is one ordered window partitioned by (key, size, block)
    plus one aggregate — no self-joins, no UDFs.  Fan-out is
    len(block_sizes) x the grid, a constant factor.
    """
    sizes = F.array(*[F.lit(int(n)) for n in block_sizes])
    s = _dense_hourly(df, key_col, ts_col).select(
        "key", "t", "x", F.explode(sizes).alias("bs")
    )
    s = s.withColumn("bn", (F.col("t") / F.col("bs")).cast("long"))
    wb = Window.partitionBy("key", "bs", "bn")
    wo = (
        Window.partitionBy("key", "bs", "bn")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = s.select(
        "key",
        "bs",
        "bn",
        "x",
        F.count(F.lit(1)).over(wb).alias("m"),
        F.sum("x").over(wb).alias("sn"),
        F.sum("x").over(wo).alias("cs"),
        F.row_number()
        .over(Window.partitionBy("key", "bs", "bn").orderBy("t"))
        .alias("i"),
    ).filter(F.col("m") == F.col("bs"))
    z = rows.select(
        "key",
        "bs",
        "bn",
        "x",
        "sn",
        (F.col("bs") * F.col("cs") - F.col("i") * F.col("sn")).alias(
            "z"
        ),
    )
    blk = z.groupBy("key", "bs", "bn").agg(
        F.max("z").alias("zmax"),
        F.min("z").alias("zmin"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.first("sn").alias("sn"),
    )
    blk = blk.select(
        "key",
        "bs",
        (F.col("zmax") - F.col("zmin")).alias("r_int"),
        (F.col("bs") * F.col("sxx") - F.col("sn") * F.col("sn")).alias(
            "ss"
        ),
    ).filter(F.col("ss") > 0)
    per_size = (
        blk.select(
            "key",
            "bs",
            (
                F.col("r_int").cast("double")
                / F.sqrt(F.col("ss").cast("double"))
            ).alias("rs"),
        )
        .groupBy("key", "bs")
        .agg(F.sum("rs").alias("srs"), F.count(F.lit(1)).alias("nb"))
        .select(
            "key",
            F.log(F.col("bs").cast("double")).alias("u"),
            F.log(F.col("srs") / F.col("nb").cast("double")).alias(
                "v"
            ),
        )
    )
    fit = per_size.groupBy("key").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
        F.sum(F.col("u") * F.col("v")).alias("suv"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
    )
    return fit.filter(F.col("k") >= 2).select(
        "key",
        F.col("k").cast("long").alias("n_sizes"),
        (
            (F.col("k") * F.col("suv") - F.col("su") * F.col("sv"))
            / (
                F.col("k") * F.col("suu")
                - F.col("su") * F.col("su")
            )
        ).alias("hurst"),
    )


def variance_ratio(
    df: DataFrame,
    q: int = 4,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Lo–MacKinlay variance-ratio test per key on the dense hourly
    count series: VR(q) = Var(q-hour increments) / (q * Var(1-hour
    increments)) with overlapping q-increments — the random-walk /
    mean-reversion screen (VR < 1 mean-reverting, > 1 trending).

    Both increment families are exact integer differences of counts,
    so every sufficient statistic (n, sums, sums of squares) is an
    exact BIGINT and VR plus its asymptotic z statistic

        z = (VR - 1) / sqrt(2(2q-1)(q-1) / (3qT))

    are ONE shared float expression.  Keys whose 1-hour increment
    variance is zero are dropped (VR undefined).

    Scale: two lag windows partitioned by key over the retention-
    bounded grid, one aggregate.  No self-joins, no UDFs.
    """
    w = Window.partitionBy("key").orderBy("t")
    s = _dense_hourly(df, key_col, ts_col).select(
        "key",
        "t",
        "x",
        (F.col("x") - F.lag("x", 1).over(w)).alias("d1"),
        (F.col("x") - F.lag("x", int(q)).over(w)).alias("dq"),
    )
    agg = s.groupBy("key").agg(
        F.count(F.lit(1)).alias("tt"),
        F.sum("d1").alias("s1"),
        F.sum(F.col("d1") * F.col("d1")).alias("s11"),
        F.count("d1").alias("n1"),
        F.sum("dq").alias("sq"),
        F.sum(F.col("dq") * F.col("dq")).alias("sqq"),
        F.count("dq").alias("nq"),
    )
    n1 = F.col("n1").cast("double")
    nq = F.col("nq").cast("double")
    var1 = (
        F.col("s11").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / n1
    ) / n1
    varq = (
        F.col("sqq").cast("double")
        - F.col("sq").cast("double") * F.col("sq") / nq
    ) / nq
    vr = varq / (F.lit(float(q)) * var1)
    se = F.sqrt(
        F.lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q))
        / F.col("tt").cast("double")
    )
    return agg.filter(
        (F.col("nq") > 0)
        & (
            F.col("n1") * F.col("s11") - F.col("s1") * F.col("s1")
            > 0
        )
    ).select(
        "key",
        F.col("tt").cast("long").alias("n_hours"),
        vr.alias("vr"),
        ((vr - F.lit(1.0)) / se).alias("z"),
    )


def dickey_fuller(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Dickey–Fuller stationarity screen per key on the dense hourly
    count series: the OLS regression dx_t = alpha + rho * x_{t-1} with
    the t statistic on rho (strongly negative t -> mean-reverting /
    stationary; t near 0 -> unit root).  The no-lagged-difference form
    (DF, not augmented) keeps every sufficient statistic an exact
    integer sum: x and dx are BIGINTs, so n, Sy, Sd, Syd, Syy, Sdd are
    exact, and

        rho = (n*Syd - Sy*Sd) / (n*Syy - Sy^2)
        t   = rho / sqrt( (SSE/(n-2)) * n / (n*Syy - Sy^2) )

    is ONE shared float expression (SSE via the standard identity).
    Keys with zero lag-variance or n <= 2 are dropped.

    Scale: one lag window + one aggregate per key over the retention-
    bounded grid.
    """
    w = Window.partitionBy("key").orderBy("t")
    s = (
        _dense_hourly(df, key_col, ts_col)
        .select(
            "key",
            "x",
            F.lag("x", 1).over(w).alias("y"),
        )
        .filter(F.col("y").isNotNull())
        .select("key", "y", (F.col("x") - F.col("y")).alias("d"))
    )
    agg = s.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("d").alias("sd"),
        F.sum(F.col("y") * F.col("d")).alias("syd"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    n = F.col("n").cast("double")
    den_i = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = (
        F.col("n") * F.col("syd") - F.col("sy") * F.col("sd")
    ).cast("double") / den_i.cast("double")
    alpha = (F.col("sd").cast("double") - rho * F.col("sy")) / n
    sse = (
        F.col("sdd").cast("double")
        - alpha * F.col("sd").cast("double")
        - rho * F.col("syd").cast("double")
    )
    t = rho / F.sqrt(
        (sse / (n - F.lit(2.0))) * n / den_i.cast("double")
    )
    return agg.filter((F.col("n") > 2) & (den_i > 0)).select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        rho.alias("rho"),
        t.alias("t_stat"),
    )


def ljung_box(
    df: DataFrame,
    max_lag: int = 12,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ljung–Box portmanteau whiteness test per key on the dense
    hourly count series: Q = T(T+2) * sum_{k=1..h} acf_k^2 / (T-k).
    Large Q -> the series is autocorrelated (NOT white noise); the
    standard residual-diagnostic companion to the AR fits.

    Exactness: with S = sum(x) and T the grid length, the centered
    series scaled by T is y_t = T*x_t - S (exact BIGINT), and each
    autocorrelation is the exact-integer ratio

        acf_k = sum_{t<=T-k} y_t*y_{t+k} / sum_t y_t^2

    so Q is ONE shared float expression over integer sums.  Constant
    series (zero denominator) are dropped.

    Scale: ``max_lag`` lead windows partitioned by key (one pass), one
    aggregate.  max_lag is a small constant; the grid is retention-
    bounded.
    """
    base = _dense_hourly(df, key_col, ts_col)
    kw = Window.partitionBy("key")
    y = base.select(
        "key",
        "t",
        (
            F.count(F.lit(1)).over(kw) * F.col("x")
            - F.sum("x").over(kw)
        ).alias("y"),
        F.count(F.lit(1)).over(kw).alias("tt"),
    )
    w = Window.partitionBy("key").orderBy("t")
    lead_cols = [
        (F.col("y") * F.lead("y", k).over(w)).alias(f"p{k}")
        for k in range(1, int(max_lag) + 1)
    ]
    p = y.select("key", "tt", "y", *lead_cols)
    agg = p.groupBy("key").agg(
        F.first("tt").alias("tt"),
        F.sum(F.col("y") * F.col("y")).alias("c0"),
        *[F.sum(f"p{k}").alias(f"c{k}") for k in range(1, int(max_lag) + 1)],
    )
    tt = F.col("tt").cast("double")
    q_expr = None
    for k in range(1, int(max_lag) + 1):
        # explicit rho*rho, not pow(rho, 2) — libm pow need not equal
        # the multiplication bit-for-bit across engines
        rho = F.col(f"c{k}").cast("double") / F.col("c0").cast(
            "double"
        )
        rho2 = rho * rho / (tt - F.lit(float(k)))
        q_expr = rho2 if q_expr is None else q_expr + rho2
    q_expr = tt * (tt + F.lit(2.0)) * q_expr
    return agg.filter(F.col("c0") > 0).select(
        "key",
        F.col("tt").cast("long").alias("n_hours"),
        F.lit(int(max_lag)).cast("long").alias("max_lag"),
        q_expr.alias("q_stat"),
    )


def sample_entropy_how(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sample entropy (m = 2, r = 0.2 sigma) per key over its
    hour-of-week activity profile — the regularity/complexity screen
    (low SampEn = repetitive weekly rhythm, high = irregular).

    SampEn is inherently O(L^2) in the series length, so the scalable
    design reduces the unbounded event stream FIRST to a fixed
    168-slot hour-of-week count profile (one aggregate), then runs the
    quadratic template match on that constant-size profile — 14k pairs
    per key regardless of data volume.

    Exactness: profile counts are exact integers; the tolerance test
    |a - b| <= 0.2*sigma is evaluated as the EXACT integer comparison
    25 * 168^2 * (a-b)^2 <= 168 * SS  (sigma^2 = SS/168^2 with
    SS = 168*sumx2 - S^2), so the template counts A (length m+1) and
    B (length m) are exact integers and SampEn = ln(B) - ln(A) is ONE
    shared float expression.  Keys with A = 0 or B = 0 are dropped
    (SampEn undefined).
    """
    counts = (
        df.select(
            F.col(key_col).alias("key"),
            (
                F.floor(
                    (
                        F.unix_timestamp(ts_col)
                        - F.lit(345600)
                    )
                    / 3600
                )
                % 168
            ).alias("w"),
        )
        .groupBy("key", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = (
        counts.select("key")
        .distinct()
        .select(
            "key",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(167).cast("long")
                )
            ).alias("w"),
        )
    )
    prof = grid.join(counts, ["key", "w"], "left").select(
        "key",
        "w",
        F.coalesce("cnt", F.lit(0).cast("long")).alias("p"),
    )
    kw = Window.partitionBy("key")
    ow = Window.partitionBy("key").orderBy("w")
    prof = prof.select(
        "key",
        "w",
        "p",
        F.lead("p", 1).over(ow).alias("p1"),
        F.lead("p", 2).over(ow).alias("p2"),
        (
            F.count(F.lit(1)).over(kw) * F.sum(F.col("p") * F.col("p")).over(kw)
            - F.sum("p").over(kw) * F.sum("p").over(kw)
        ).alias("ss"),
        F.count(F.lit(1)).over(kw).alias("ll"),
    )
    a = prof.alias("a")
    b = prof.alias("b")
    pairs = a.join(
        b,
        (F.col("a.key") == F.col("b.key"))
        & (F.col("b.w") > F.col("a.w")),
    ).filter(
        F.col("a.p2").isNotNull() & F.col("b.p2").isNotNull()
    )
    d0 = F.col("a.p") - F.col("b.p")
    d1 = F.col("a.p1") - F.col("b.p1")
    d2 = F.col("a.p2") - F.col("b.p2")
    ll = F.col("a.ll")
    thresh = ll * F.col("a.ss")
    lim = F.lit(25) * ll * ll
    m0 = lim * d0 * d0 <= thresh
    m1 = lim * d1 * d1 <= thresh
    m2 = lim * d2 * d2 <= thresh
    cnt = pairs.groupBy(F.col("a.key").alias("key")).agg(
        F.sum(F.when(m0 & m1, 1).otherwise(0)).alias("b_cnt"),
        F.sum(F.when(m0 & m1 & m2, 1).otherwise(0)).alias("a_cnt"),
    )
    return cnt.filter(
        (F.col("a_cnt") > 0) & (F.col("b_cnt") > 0)
    ).select(
        "key",
        F.col("b_cnt").cast("long").alias("b_cnt"),
        F.col("a_cnt").cast("long").alias("a_cnt"),
        (
            F.log(F.col("b_cnt").cast("double"))
            - F.log(F.col("a_cnt").cast("double"))
        ).alias("sampen"),
    )


#: Poisson(1) CDF thresholds scaled to 2^60 (exact integers), used by
#: the deterministic Poisson bootstrap: a 60-bit md5-derived uniform u
#: maps to weight w = #{thresholds <= u}.
_POIS1_CDF_2P60 = (
    424136118829305344,   # P(X<=0)
    848272237658610688,   # P(X<=1)
    1060340297073263360,  # P(X<=2)
    1131029650211480960,  # P(X<=3)
    1148701988496035328,  # P(X<=4)
    1152236456152946176,  # P(X<=5)
)


def poisson_bootstrap_ci(
    df: DataFrame,
    n_boot: int = 200,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Distributed 95% bootstrap CI for the per-key mean value via the
    Poisson bootstrap — THE cluster-scale bootstrap: instead of
    resampling rows (impossible without materializing n draws), each
    row independently receives a Poisson(1) replicate weight, which
    converges to multinomial resampling as n grows.  One pass, fully
    map-side until the (key, replicate) aggregate.

    Determinism: the replicate weight is a pure function of
    (id, replicate) — a 60-bit uniform from the first 15 hex chars of
    md5(id || ':' || b), cut against exact integer Poisson(1) CDF
    thresholds — so both engines draw the SAME bootstrap.  Replicate
    means are exact integer ratios (sum of w*cents / sum of w); the CI
    picks rank-5 and rank-196 of the 200 sorted replicate means
    (2.5% / 97.5% order statistics), ties broken by replicate id for
    total determinism.

    Scale: the b-fold explode happens map-side and collapses into the
    partial aggregate before any shuffle — the exchange carries only
    keys x n_boot rows.  No collects, no UDFs.
    """
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(int(n_boot) - 1))
    ).alias("b")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).cast("string").alias("rid"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    ).select("key", "rid", "cents", reps)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("rid"), F.lit(":"), F.col("b"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w_expr = F.lit(6)
    for i in range(len(_POIS1_CDF_2P60) - 1, -1, -1):
        w_expr = F.when(
            u < F.lit(_POIS1_CDF_2P60[i]), F.lit(i)
        ).otherwise(w_expr)
    weighted = base.select("key", "b", "cents", w_expr.alias("w"))
    rep_means = (
        weighted.groupBy("key", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "key",
            "b",
            (
                F.col("swc").cast("double")
                / F.col("sw").cast("double")
                / F.lit(100.0)
            ).alias("mean_b"),
        )
    )
    rw = Window.partitionBy("key").orderBy("mean_b", "b")
    ranked = rep_means.select(
        "key",
        "mean_b",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("nb"),
    )
    # 2.5% order-statistic ranks via exact integer ceil-division
    # (ceil(nb/40) = (nb+39) div 40) — float 0.025 is DECIMAL in
    # DuckDB but binary double in Spark, so a float rank expression
    # could disagree at exact-integer boundaries; integers cannot.
    lo_rn = F.greatest(F.lit(1), F.expr("(nb + 39) div 40"))
    hi_rn = F.least(
        F.col("nb"), F.expr("nb - ((nb + 39) div 40) + 1")
    )
    ci = ranked.groupBy("key").agg(
        F.max(
            F.when(F.col("rn") == lo_rn, F.col("mean_b"))
        ).alias("ci_lo"),
        F.max(
            F.when(F.col("rn") == hi_rn, F.col("mean_b"))
        ).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_boot"),
    )
    full = df.groupBy(F.col(key_col).alias("key")).agg(
        (
            F.sum(
                F.round(F.col(value_col) * 100).cast("long")
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("mean_full")
    )
    return full.join(ci, "key").select(
        "key",
        "mean_full",
        "ci_lo",
        "ci_hi",
        F.col("n_boot").cast("long").alias("n_boot"),
    )


def pot_exceedance(
    df: DataFrame,
    pct: int = 95,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Peaks-over-threshold extreme-value screen per key on the dense
    hourly count series: threshold u = the rank-selected ``pct``-th
    percentile of the key's hourly counts, then the exceedance count,
    mean excess (the quantity a GPD tail fit starts from) and the
    maximum observed count.

    Exactness: u is an order statistic (rank ceil(pct*T/100) via exact
    integer ceil-division, never an engine percentile), counts and
    excesses are exact integers, and mean excess is ONE shared float
    division.  Keys with no exceedances are dropped (mean excess
    undefined).

    Scale: one ordered window per key over the retention-bounded grid
    + two aggregates.
    """
    base = _dense_hourly(df, key_col, ts_col)
    w = Window.partitionBy("key").orderBy("x", "t")
    kw = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(kw).alias("tt"),
    )
    thr = (
        ranked.filter(
            F.col("rn")
            == F.expr(f"({pct} * tt + 99) div 100")
        )
        .groupBy("key")
        .agg(F.min("x").alias("thr"), F.min("tt").alias("tt"))
    )
    exc = (
        base.join(thr, "key")
        .filter(F.col("x") > F.col("thr"))
        .groupBy("key")
        .agg(
            F.min("thr").alias("thr"),
            F.min("tt").alias("n_hours"),
            F.count(F.lit(1)).alias("n_exceed"),
            F.sum(F.col("x") - F.col("thr")).alias("sum_excess"),
            F.max("x").alias("max_count"),
        )
    )
    return exc.select(
        "key",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("thr").cast("long").alias("thr"),
        F.col("n_exceed").cast("long").alias("n_exceed"),
        (
            F.col("sum_excess").cast("double")
            / F.col("n_exceed").cast("double")
        ).alias("mean_excess"),
        F.col("max_count").cast("long").alias("max_count"),
    )


def effective_n(
    df: DataFrame,
    max_lag: int = 12,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Autocorrelation-adjusted effective sample size per key:
    n_eff = T / (1 + 2 * sum_{k=1..h} acf_k) — how many INDEPENDENT
    hourly observations the correlated series is worth (the correction
    every CI over a time series needs before dividing by sqrt(n)).

    Same exact-integer ACF machinery as :func:`ljung_box` (centered
    series y = T*x - S, each acf_k an exact integer ratio); the lag
    sum adds in ascending k (one shared expression) and n_eff is one
    float division, floored at 1.0 when strong negative correlation
    drives the denominator under 1.  Constant series are dropped.
    """
    base = _dense_hourly(df, key_col, ts_col)
    kw = Window.partitionBy("key")
    y = base.select(
        "key",
        "t",
        (
            F.count(F.lit(1)).over(kw) * F.col("x")
            - F.sum("x").over(kw)
        ).alias("y"),
        F.count(F.lit(1)).over(kw).alias("tt"),
    )
    w = Window.partitionBy("key").orderBy("t")
    lead_cols = [
        (F.col("y") * F.lead("y", k).over(w)).alias(f"p{k}")
        for k in range(1, int(max_lag) + 1)
    ]
    p = y.select("key", "tt", "y", *lead_cols)
    agg = p.groupBy("key").agg(
        F.first("tt").alias("tt"),
        F.sum(F.col("y") * F.col("y")).alias("c0"),
        *[
            F.sum(f"p{k}").alias(f"c{k}")
            for k in range(1, int(max_lag) + 1)
        ],
    )
    rho_sum = None
    for k in range(1, int(max_lag) + 1):
        r = F.col(f"c{k}").cast("double") / F.col("c0").cast("double")
        rho_sum = r if rho_sum is None else rho_sum + r
    denom = F.lit(1.0) + F.lit(2.0) * rho_sum
    tt = F.col("tt").cast("double")
    return agg.filter(F.col("c0") > 0).select(
        "key",
        F.col("tt").cast("long").alias("n_hours"),
        rho_sum.alias("rho_sum"),
        (tt / F.greatest(denom, F.lit(1.0))).alias("n_eff"),
    )


#: candidate periods (hours) scanned by dominant_period — the usual
#: telemetry rhythms: quarter-day, third-day, half-day, day, week.
_PERIOD_CANDIDATES = (6, 8, 12, 24, 168)


def dominant_period(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    periods: tuple[int, ...] = _PERIOD_CANDIDATES,
) -> DataFrame:
    """Dominant seasonality per key: single-bin DFT (Goertzel) power
    at each candidate period of the hourly count series, reporting the
    argmax period and its power — generalizes
    :func:`spectral_diurnal` from the fixed 24 h bin to a small scan.

    Missing hours contribute exactly 0, so no dense grid is needed.
    Per period p: re = sum_h cnt_h*cos(2*pi*(h mod p)/p) (same for im)
    with the p cosine/sine doubles computed ONCE in Python and embedded
    as literals in BOTH engines (folded constants), sums folding in
    hour order (sorted fold — bit-identical accumulation), and
    power = re^2 + im^2.  The argmax compares the same doubles in both
    engines; ties break toward the SHORTEST period.  Power is
    normalized by span^2 so keys are comparable.

    Scale: one (key, hour) aggregate + len(periods) sorted folds whose
    list length is retention-bounded (hours, not events).
    """
    import math

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
    term_cols = []
    for p in periods:
        cos_tab = [
            math.cos(2.0 * math.pi * i / float(p)) for i in range(p)
        ]
        sin_tab = [
            math.sin(2.0 * math.pi * i / float(p)) for i in range(p)
        ]
        idx = (F.col("hour") % p).cast("int")
        carr = F.array(*[F.lit(c) for c in cos_tab])
        sarr = F.array(*[F.lit(s) for s in sin_tab])
        term_cols.append(
            (F.col("cnt").cast("double") * F.element_at(carr, idx + 1))
            .alias(f"tre{p}")
        )
        term_cols.append(
            (F.col("cnt").cast("double") * F.element_at(sarr, idx + 1))
            .alias(f"tim{p}")
        )
    terms = hourly.select("key", "hour", *term_cols)
    def _fold(col_name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("hour", col_name))),
            F.lit(0.0),
            lambda a, s: a + s[col_name],
        )

    folds = []
    for p in periods:
        for part in ("tre", "tim"):
            folds.append(_fold(f"{part}{p}").alias(f"{part}{p}_s"))
    agg = terms.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_hours"),
        (F.max("hour") - F.min("hour") + 1).alias("span_h"),
        *folds,
    )
    span2 = (
        F.col("span_h").cast("double") * F.col("span_h").cast("double")
    )
    pw = agg.select(
        "key",
        "n_hours",
        "span_h",
        *[
            (
                (
                    F.col(f"tre{p}_s") * F.col(f"tre{p}_s")
                    + F.col(f"tim{p}_s") * F.col(f"tim{p}_s")
                )
                / span2
            ).alias(f"pow{p}")
            for p in periods
        ],
    )
    best = F.greatest(*[F.col(f"pow{p}") for p in periods])
    period_expr = None
    for p in periods:
        cond = F.col(f"pow{p}") == best
        period_expr = (
            F.when(cond, F.lit(p))
            if period_expr is None
            else period_expr.when(cond, F.lit(p))
        )
    return pw.select(
        "key",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("span_h").cast("long").alias("span_h"),
        period_expr.cast("long").alias("best_period_h"),
        best.alias("best_power"),
        F.col("pow24").alias("power_24h"),
    )


def mann_whitney(
    df: DataFrame,
    type_a: str = "click",
    type_b: str = "error",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Mann–Whitney U rank-sum test between the value distributions of
    two event types — the two-sample companion of the k-group
    Kruskal–Wallis screen (same null: identical distributions; no
    normality assumed).

    Midranks are exact half-integers handled as DOUBLED ranks
    (dr = 2*C_prev + t + 1 for a tie group of size t starting after
    C_prev earlier values) so every sufficient statistic — 2*R_a, U_a,
    the tie correction sum(t^3 - t) — is an exact BIGINT.  The normal
    approximation with tie correction

        z = (U_a - n_a*n_b/2) /
            sqrt(n_a*n_b/12 * ((N+1) - sum(t^3-t)/(N*(N-1))))

    is ONE shared float expression (2U - n_a*n_b kept integer).

    Scale: one groupBy over distinct cents values + one ordered
    cumulative window over values (bounded by value cardinality, not
    rows) + a 1-row aggregate.
    """
    ev = df.select(
        F.col(key_col).alias("k"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    ).filter(F.col("k").isin(type_a, type_b))
    per_val = ev.groupBy("cents").agg(
        F.sum(F.when(F.col("k") == type_a, 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("k") == type_b, 1).otherwise(0)).alias(
            "cb"
        ),
    )
    w = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_val.select(
        "cents",
        "ca",
        "cb",
        (
            F.sum(F.col("ca") + F.col("cb")).over(w)
            - (F.col("ca") + F.col("cb"))
        ).alias("cprev"),
    )
    t = F.col("ca") + F.col("cb")
    stats = cum.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (F.lit(2) * F.col("cprev") + t + F.lit(1))
        ).alias("two_ra"),
        F.sum(t * t * t - t).alias("ties"),
    )
    na = F.col("na")
    nb = F.col("nb")
    nn = na + nb
    two_u = F.col("two_ra") - na * (na + 1)
    nad = na.cast("double")
    nbd = nb.cast("double")
    nnd = nn.cast("double")
    sigma = F.sqrt(
        nad
        * nbd
        / F.lit(12.0)
        * (
            (nnd + F.lit(1.0))
            - F.col("ties").cast("double")
            / (nnd * (nnd - F.lit(1.0)))
        )
    )
    return stats.filter((na > 0) & (nb > 0) & (nn > 1)).select(
        F.lit(type_a).alias("type_a"),
        F.lit(type_b).alias("type_b"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        (two_u.cast("double") / F.lit(2.0)).alias("u_a"),
        (
            (two_u - na * nb).cast("double")
            / (F.lit(2.0) * sigma)
        ).alias("z"),
    )


#: 5-minute slots per cycle scanned by :func:`lomb_scargle` — the
#: 6 h / 12 h / 24 h telemetry rhythms at 300 s resolution.
_LS_PERIOD_SLOTS = (72, 144, 288)


def lomb_scargle(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    period_slots: tuple[int, ...] = _LS_PERIOD_SLOTS,
    slot_seconds: int = 300,
    min_slots: int = 8,
) -> DataFrame:
    """Floating-mean Lomb–Scargle periodogram per key over the
    UNEVENLY-sampled 5-minute value series — the spectral tool for
    irregular grids (Lomb 1976; Scargle 1982; floating-mean /
    generalized form per Zechmeister & Kürster 2009, A&A 496).

    :func:`dominant_period` needs nothing but counts because missing
    hours contribute zero to a count spectrum; a VALUE series has no
    such luxury — absent slots are *unknown*, not zero, and a plain
    DFT over the observed slots aliases badly.  Lomb–Scargle is the
    classical fix: least-squares fit of ``a·cos(wt) + b·sin(wt) + c``
    at the OBSERVED times only.  The reported ``power`` is the R² of
    that 3-parameter fit — the fraction of the series variance the
    sinusoid at each candidate period explains — computed in the
    tau-free quadratic form

        P = [YC²·SS − 2·YC·YS·CS + YS²·CC] / [(CC·SS − CS²)·SSY]

    with the centered moments YC = Σx̃c, YS = Σx̃s, CC = Σc² − (Σc)²/n
    etc., which is algebraically identical to the classical
    tau-rotated expression (the rotation merely diagonalizes the
    2×2 normal matrix) but needs no runtime trig on computed doubles.

    Determinism: the signal is integerized (x = Σ cents per slot —
    exact BIGINT), every cos/sin comes from a Python-precomputed
    table at integer phase ``t5 mod m`` broadcast-joined in (both
    engines consume the SAME IEEE doubles), and each of the nine
    per-(key, period) sums folds in slot order (sorted fold), so the
    whole statistic is one shared float expression.

    Scale: one (key, slot) hash aggregate over the raw events, a
    broadcast join against a 504-row trig table, and one (key,
    period) aggregate whose fold length is the retention horizon in
    slots (~105k/year) — never event volume.  No UDFs, no collects.
    """
    import math

    spark = df.sparkSession
    trig_rows = [
        (
            m,
            i,
            math.cos(2.0 * math.pi * i / float(m)),
            math.sin(2.0 * math.pi * i / float(m)),
        )
        for m in period_slots
        for i in range(m)
    ]
    trig = spark.createDataFrame(
        trig_rows, "m int, idx int, c double, s double"
    )

    slots = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(
                F.unix_timestamp(F.col(ts_col)) / slot_seconds
            ).cast("long").alias("t5"),
            F.round(F.col(value_col) * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("key", "t5")
        .agg(F.sum("cents").alias("x"))
    )
    expanded = slots.select(
        "key",
        "t5",
        "x",
        F.explode(
            F.array(*[F.lit(m) for m in period_slots])
        ).alias("m"),
    ).withColumn("idx", (F.col("t5") % F.col("m")).cast("int"))
    joined = expanded.join(F.broadcast(trig), ["m", "idx"])

    xd = F.col("x").cast("double")
    c = F.col("c")
    s = F.col("s")
    terms = joined.select(
        "key",
        "m",
        "t5",
        c.alias("tc"),
        s.alias("ts_"),
        (c * c).alias("tcc"),
        (s * s).alias("tss"),
        (c * s).alias("tcs"),
        (xd * c).alias("txc"),
        (xd * s).alias("txs"),
        xd.alias("tx"),
        (xd * xd).alias("tx2"),
    )

    def _fold(col_name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("t5", col_name))),
            F.lit(0.0),
            lambda a, r: a + r[col_name],
        )

    agg = terms.groupBy("key", "m").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            _fold(t).alias(t[1:].rstrip("_") + "_s")
            for t in (
                "tc", "ts_", "tcc", "tss", "tcs", "txc", "txs",
                "tx", "tx2",
            )
        ],
    )
    nd = F.col("n").cast("double")
    xbar = F.col("x_s") / nd
    yc = F.col("xc_s") - xbar * F.col("c_s")
    ys = F.col("xs_s") - xbar * F.col("s_s")
    cc_ = F.col("cc_s") - (F.col("c_s") * F.col("c_s")) / nd
    ss_ = F.col("ss_s") - (F.col("s_s") * F.col("s_s")) / nd
    cs_ = F.col("cs_s") - (F.col("c_s") * F.col("s_s")) / nd
    det = cc_ * ss_ - cs_ * cs_
    ssy = F.col("x2_s") - (F.col("x_s") * F.col("x_s")) / nd
    num = (
        yc * yc * ss_
        - F.lit(2.0) * yc * ys * cs_
        + ys * ys * cc_
    )
    return (
        agg.filter(
            (F.col("n") >= min_slots) & (det != 0) & (ssy > 0)
        )
        .select(
            "key",
            (F.col("m") * F.lit(slot_seconds) / F.lit(3600))
            .cast("long")
            .alias("period_h"),
            F.col("n").cast("long").alias("n_slots"),
            (num / (det * ssy)).alias("power"),
        )
    )


def friedman_test(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Friedman rank test: do the event types differ consistently in
    daily volume, blocking on the day?  (The nonparametric repeated-
    measures ANOVA — Friedman 1937.)  Blocks = days, treatments = the
    k event types, response = the daily count (missing (day, type)
    cells are true zeros for a count series, so the design is always
    complete).

    Within each day the k counts are average-ranked; doubled ranks
    ``r2 = 2·rank_min + ties − 1`` keep every sufficient statistic an
    exact BIGINT (the :func:`mann_whitney` midrank trick).  With
    R2_j = Σ_days r2_j the uncorrected statistic is

        Q = 3·Σ_j R2_j² / (n·k·(k+1)) − 3·n·(k+1)

    (algebra: R_j = R2_j/2 folded into the classical
    12/(n k (k+1))·ΣR_j² − 3n(k+1)); Q ~ χ²(k−1) under the null.
    The single float division happens once, identically in both
    engines.

    Scale: one (day, key) count aggregate, a broadcast dense grid
    (days × k, retention-bounded), two ordered windows partitioned by
    day (k rows each), and two tiny aggregates.  No UDFs.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    days = daily.select("day").distinct()
    keys = daily.select("key").distinct()
    grid = days.join(F.broadcast(keys))
    dense = grid.join(daily, ["key", "day"], "left").select(
        "key", "day", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w_rank = Window.partitionBy("day").orderBy("cnt")
    w_tie = Window.partitionBy("day", "cnt")
    ranked = dense.select(
        "key",
        "day",
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1)
        ).cast("long").alias("r2"),
    )
    per_key = ranked.groupBy("key").agg(
        F.sum("r2").alias("r2_sum"), F.count(F.lit(1)).alias("n")
    )
    total = per_key.agg(
        F.max("n").alias("n_days"),
        F.count(F.lit(1)).alias("k_types"),
        F.sum(F.col("r2_sum") * F.col("r2_sum")).alias("sum_r2sq"),
    )
    n = F.col("n_days")
    k = F.col("k_types")
    q = (
        F.lit(3.0) * F.col("sum_r2sq").cast("double")
        / (n * k * (k + F.lit(1))).cast("double")
        - F.lit(3.0) * (n * (k + F.lit(1))).cast("double")
    )
    return total.filter((n > 1) & (k > 1)).select(
        n.cast("long").alias("n_days"),
        k.cast("long").alias("k_types"),
        F.col("sum_r2sq").cast("long").alias("sum_r2sq"),
        q.alias("q_stat"),
        (k - F.lit(1)).cast("long").alias("dof"),
    )


def cvm_uniform(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    min_n: int = 5,
) -> DataFrame:
    """Cramér–von Mises statistic per (key, day) that the event
    *times of day* are uniform — the goodness-of-fit screen for "is
    this stream diurnally flat or rhythmic?" (a changing W² trend is
    an early seasonality/incident signal).

        W² = 1/(12n) + Σ_i (u_(i) − (2i−1)/(2n))²

    with u = microsecond-of-day / 86400e6 (an exact integer→double
    division — no rounding ambiguity) and i the rank of u within the
    (key, day) group, tie-broken on event_id so both engines rank
    identically.  The squared deviations fold in rank order (sorted
    fold), making W² one shared float expression.

    Scale: one window + one aggregate, both hash-partitioned on
    (key, day); group size is a single key's single-day volume.  The
    fold list is that same bounded group.  No UDFs.
    """
    us_day = F.lit(86400000000)
    base = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
        (
            (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                % us_day
            ).cast("double")
            / us_day.cast("double")
        ).alias("u"),
        F.col("event_id"),
    )
    w = Window.partitionBy("key", "day").orderBy("u", "event_id")
    wn = Window.partitionBy("key", "day")
    ranked = base.select(
        "key",
        "day",
        "u",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    d = F.col("u") - (
        (F.lit(2) * F.col("i") - F.lit(1)).cast("double")
        / (F.lit(2) * F.col("n")).cast("double")
    )
    terms = ranked.select(
        "key", "day", "i", "n", (d * d).alias("sq")
    )
    folded = terms.groupBy("key", "day").agg(
        F.max("n").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", "sq"))),
            F.lit(0.0),
            lambda a, r: a + r["sq"],
        ).alias("sq_sum"),
    )
    w2 = (
        F.lit(1.0) / (F.lit(12) * F.col("n")).cast("double")
        + F.col("sq_sum")
    )
    return folded.filter(F.col("n") >= min_n).select(
        "key",
        (F.col("day") * 86400).cast("long").alias("day_s"),
        F.col("n").cast("long").alias("n"),
        w2.alias("w2"),
    )


def grubbs_test(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Grubbs' outlier statistic per key over its observed daily
    totals: G = max|x − x̄| / s (Grubbs 1950) — "does this series
    contain at least one day wildly out of line?"  The caller
    compares G against the t-based critical value offline; the engine
    reports the exact statistic and the deviation side.

    max|x − x̄| needs no per-row pass: it is
    ``greatest(x̄ − min x, max x − x̄)``, so one aggregate of exact
    integer sums (n, Σx, Σx², min, max) suffices.  s is the sample
    standard deviation via the shared expression
    ``sqrt((Σx² − (Σx)²/n)/(n−1))`` — sqrt is IEEE-exact, so both
    engines agree bitwise.

    Scale: two hash aggregates, integer state.  No UDFs.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sx2"),
        F.min("cnt").alias("mn"),
        F.max("cnt").alias("mx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    s2 = (
        F.col("sx2").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / nd
    ) / (F.col("n") - F.lit(1)).cast("double")
    dev_lo = mean - F.col("mn").cast("double")
    dev_hi = F.col("mx").cast("double") - mean
    g = F.greatest(dev_lo, dev_hi) / F.sqrt(s2)
    return agg.filter((F.col("n") >= 3) & (s2 > 0)).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        mean.alias("mean_cnt"),
        g.alias("g_stat"),
        F.when(dev_hi >= dev_lo, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("side"),
    )


def mk_seasonal(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Seasonal Mann–Kendall trend test per key (Hirsch & Slack 1984):
    the Mann–Kendall S statistic computed WITHIN each hour-of-day
    stratum of the zero-filled daily-by-hour count grid, then summed —
    so a strong diurnal cycle cannot masquerade as (or mask) a
    monotone trend, the failure mode of the unstratified test on
    telemetry.

    Per (key, season s = hour-of-day, day): x = event count on the
    complete global [min, max] day grid (zero-filled).  Then

        S = Σ_s Σ_{i<j} sign(x_{s,j} − x_{s,i})                (exact int)
        var·18 = Σ_s [ n_s(n_s−1)(2n_s+5) − Σ_t t(t−1)(2t+5) ] (exact int)

    with t the tied-group sizes inside each (key, season), and the
    continuity-corrected z = (S ∓ 1)/sqrt(var·18 / 18.0) is ONE shared
    float expression.

    Scale: the pair join is quadratic in DAYS (retention-bounded,
    e.g. 730), linear in seasons and keys, co-partitioned on
    (key, season) — never a pass over raw events beyond the first
    rollup.  No UDFs.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
        F.floor(
            (F.unix_timestamp(F.col(ts_col)) % 86400) / 3600
        ).cast("int").alias("season"),
    )
    counts = base.groupBy("key", "day", "season").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bounds = base.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"))
            ).alias("day"),
        )
        .crossJoin(
            F.broadcast(
                df.sparkSession.range(24).select(
                    F.col("id").cast("int").alias("season")
                )
            )
        )
    )
    dense = grid.join(counts, ["key", "day", "season"], "left").select(
        "key",
        "season",
        "day",
        F.coalesce("cnt", F.lit(0)).alias("x"),
    )
    a, b = dense.alias("a"), dense.alias("b")
    s_per = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.season") == F.col("b.season"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .select(
            F.col("a.key").alias("key"),
            F.col("a.season").alias("season"),
            F.when(F.col("b.x") > F.col("a.x"), F.lit(1))
            .when(F.col("b.x") < F.col("a.x"), F.lit(-1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("sgn"),
        )
        .groupBy("key", "season")
        .agg(F.sum("sgn").alias("s_s"))
    )
    nn = F.col("n_s")
    ties = (
        dense.groupBy("key", "season", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("key", "season")
        .agg(
            F.sum("t").alias("n_s"),
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tie_term"),
        )
        .select(
            "key",
            "season",
            "n_s",
            (
                nn * (nn - 1) * (2 * nn + 5) - F.col("tie_term")
            ).alias("var18_s"),
        )
    )
    per_season = s_per.join(ties, ["key", "season"])
    agg = per_season.groupBy("key").agg(
        F.max("n_s").alias("n_days"),
        F.sum("s_s").alias("s_stat"),
        F.sum("var18_s").alias("var18"),
    )
    s = F.col("s_stat")
    var = F.col("var18").cast("double") / F.lit(18.0)
    z = (
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(var))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return agg.filter(F.col("var18") > 0).select(
        "key",
        F.col("n_days").cast("long").alias("n_days"),
        s.cast("long").alias("s_stat"),
        F.col("var18").cast("long").alias("var18"),
        z.alias("z"),
    )


def kuiper_uniform(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    min_n: int = 5,
) -> DataFrame:
    """Kuiper's V statistic per (key, day) that the event times of
    day are uniform — the rotation-invariant companion to
    :func:`cvm_uniform`: V = D⁺ + D⁻ is unchanged when the whole
    distribution is rotated around the circle, so a rhythm peaking at
    midnight scores exactly like the same rhythm peaking at noon
    (where the KS/CvM forms lose power at the wrap-around).

        D⁺ = max_i ( i/n − u_(i) ),  D⁻ = max_i ( u_(i) − (i−1)/n )

    with u = microsecond-of-day / 86400e6 (exact integer→double
    division) and i the (u, event_id)-ordered rank.  max() is
    order-free, so no folds are even needed — the whole statistic is
    two windowed maxima over exact per-row expressions.

    Scale: one window + one aggregate on (key, day).  No UDFs.
    """
    us_day = F.lit(86400000000)
    base = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
        (
            (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                % us_day
            ).cast("double")
            / us_day.cast("double")
        ).alias("u"),
        F.col("event_id"),
    )
    w = Window.partitionBy("key", "day").orderBy("u", "event_id")
    wn = Window.partitionBy("key", "day")
    ranked = base.select(
        "key",
        "day",
        "u",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    nd = F.col("n").cast("double")
    d_plus = F.col("i").cast("double") / nd - F.col("u")
    d_minus = F.col("u") - (F.col("i") - F.lit(1)).cast("double") / nd
    agg = ranked.groupBy("key", "day").agg(
        F.max("n").alias("n"),
        F.max(d_plus).alias("dp"),
        F.max(d_minus).alias("dm"),
    )
    return agg.filter(F.col("n") >= min_n).select(
        "key",
        (F.col("day") * 86400).cast("long").alias("day_s"),
        F.col("n").cast("long").alias("n"),
        F.col("dp").alias("d_plus"),
        F.col("dm").alias("d_minus"),
        (F.col("dp") + F.col("dm")).alias("v_stat"),
    )


#: Bartlett-kernel lags used by newey_west_trend; weights 1 - l/(L+1)
#: are computed once in Python and embedded as identical IEEE doubles
#: in both engines.
_NW_LAGS = 5


def newey_west_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    lags: int = _NW_LAGS,
) -> DataFrame:
    """OLS daily-count trend per key with a Newey–West (1987) HAC
    standard error — the honest version of :func:`ols_daily` for
    autocorrelated series: consecutive days of telemetry are never
    independent, so the classical s.e. overstates significance; the
    Bartlett-weighted long-run variance fixes the t statistic without
    changing the slope.

    Over the zero-filled daily count series (dense global [min, max]
    day grid, t = 0..n−1):

        b  = (nΣty − ΣtΣy)/(nΣt² − (Σt)²)          (exact-int ratio)
        e_t = y_t − a − b·t,   g_t = (t − t̄)·e_t
        γ_l = Σ_t g_t·g_{t+l}                       (sorted folds)
        s²_NW = γ_0 + Σ_{l=1..L} 2(1 − l/(L+1))·γ_l
        se_NW = sqrt(s²_NW) / Σ(t − t̄)²,  t_NW = b/se_NW

    All integer sums are exact; a, b, t̄ join back to the rows as one
    shared float expression; the lag products use ``lead`` over the
    key-partitioned day order with missing leads contributing 0, and
    every Σ folds in day order.  se_OLS is reported alongside so the
    autocorrelation penalty is visible (se_NW/se_OLS > 1 on positively
    autocorrelated series).

    Scale: one (key, day) rollup, the dense grid, one key equi-join of
    the 1-row-per-key OLS fit, one window, one fold aggregate — all
    co-partitioned on key; series length is retention-bounded.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
    )
    counts = base.groupBy("key", "day").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bounds = base.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    dense = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence(F.lit(0), F.col("hi") - F.col("lo"))
            ).alias("t"),
            F.col("lo"),
        )
        .withColumn("day", F.col("lo") + F.col("t"))
        .join(
            counts.select("key", "day", F.col("cnt").alias("y")),
            ["key", "day"],
            "left",
        )
        .select(
            "key", "t", F.coalesce("y", F.lit(0)).alias("y")
        )
    )
    fit = (
        dense.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("t") * F.col("y")).alias("sxy"),
            F.sum(F.col("t") * F.col("t")).alias("sxx"),
        )
        .filter(
            (F.col("n") > lags + 2)
            & (
                F.col("n") * F.col("sxx")
                - F.col("sx") * F.col("sx")
                > 0
            )
        )
    )
    nd = F.col("n").cast("double")
    bb = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
    )
    fit = fit.select(
        "key",
        "n",
        bb.alias("b"),
        (
            (F.col("sy").cast("double") - bb * F.col("sx").cast("double"))
            / nd
        ).alias("a"),
        (F.col("sx").cast("double") / nd).alias("tbar"),
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / nd
        ).alias("den"),
    )
    rows = dense.join(fit, "key").select(
        "key",
        "t",
        "n",
        "b",
        "den",
        (
            (F.col("t").cast("double") - F.col("tbar"))
            * (
                F.col("y").cast("double")
                - F.col("a")
                - F.col("b") * F.col("t").cast("double")
            )
        ).alias("g"),
        (
            (
                F.col("y").cast("double")
                - F.col("a")
                - F.col("b") * F.col("t").cast("double")
            )
            * (
                F.col("y").cast("double")
                - F.col("a")
                - F.col("b") * F.col("t").cast("double")
            )
        ).alias("e2"),
    )
    wlead = Window.partitionBy("key").orderBy("t")
    lag_cols = [
        (
            F.col("g")
            * F.coalesce(F.lead("g", l).over(wlead), F.lit(0.0))
        ).alias(f"gl{l}")
        for l in range(lags + 1)
    ]
    terms = rows.select(
        "key", "t", "n", "b", "den", "e2", *lag_cols
    )

    def _fold(col_name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", col_name))),
            F.lit(0.0),
            lambda acc, r: acc + r[col_name],
        )

    agg = terms.groupBy("key").agg(
        F.max("n").alias("n"),
        F.max("b").alias("b"),
        F.max("den").alias("den"),
        _fold("e2").alias("se2"),
        *[_fold(f"gl{l}").alias(f"g{l}") for l in range(lags + 1)],
    )
    s2_nw = F.col("g0")
    for l in range(1, lags + 1):
        w_l = 2.0 * (1.0 - l / float(lags + 1))
        s2_nw = s2_nw + F.lit(w_l) * F.col(f"g{l}")
    den = F.col("den")
    se_nw = F.sqrt(s2_nw) / den
    se_ols = F.sqrt(
        (F.col("se2") / (F.col("n") - F.lit(2)).cast("double")) / den
    )
    return agg.filter(s2_nw > 0).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        F.col("b").alias("slope"),
        se_ols.alias("se_ols"),
        se_nw.alias("se_nw"),
        (F.col("b") / se_nw).alias("t_nw"),
    )


def welch_ttest(
    df: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    salt: str = "exp1",
) -> DataFrame:
    """Two-sample Welch t-test of the per-event value between two
    deterministic md5-bucket arms, per key — the unequal-variance
    A/B significance readout (Welch 1947) next to :func:`cuped`'s
    variance-reduced point estimate.

        t   = (m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b)
        dof = (s2_a/n_a + s2_b/n_b)^2
              / ((s2_a/n_a)^2/(n_a-1) + (s2_b/n_b)^2/(n_b-1))

    Arms come from the repo's md5-bucket idiom (2 buckets, same salt
    as ``cuped`` so readouts line up).  Per (key, arm) the sufficient
    statistics n, S = sum(cents), Q = sum(cents^2) are exact BIGINTs;
    mean and variance cast the integers to double only at the final
    products (the ols_daily overflow idiom), so every float is ONE
    shared expression in both engines.

    Scale: one hash aggregate at (key, arm) grain, then a 2-row
    pivot per key — no window, no join, no iteration.

    Output: key, n_a, n_b, mean_a, mean_b, t_stat, dof.
    """
    from tsaug_spark.pipeline.sampling import hash_bucket

    per_arm = (
        df.select(
            F.col(key_col).alias("key"),
            hash_bucket(user_col, salt, 2).alias("arm"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            # decimal(38,0) accumulation: exact to 1e38, so the
            # quadratic power sum cannot overflow at 10^12-row scale
            # (int64 would saturate near 1e19); DuckDB's SUM already
            # widens to HUGEINT, so both engines stay exact and the
            # double casts below see identical integers
            F.sum(
                F.col("c").cast("decimal(19,0)")
                * F.col("c").cast("decimal(19,0)")
            ).alias("q"),
        )
    )
    arm = lambda col, a: F.max(F.when(F.col("arm") == a, F.col(col)))
    wide = per_arm.groupBy("key").agg(
        arm("n", 0).alias("na"), arm("s", 0).alias("sa"),
        arm("q", 0).alias("qa"), arm("n", 1).alias("nb"),
        arm("s", 1).alias("sb"), arm("q", 1).alias("qb"),
    ).filter((F.col("na") >= 2) & (F.col("nb") >= 2))
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / nad
    mb = F.col("sb").cast("double") / nbd
    va = (
        F.col("qa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double") / nad
    ) / (nad - F.lit(1.0))
    vb = (
        F.col("qb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double") / nbd
    ) / (nbd - F.lit(1.0))
    sea = va / nad
    seb = vb / nbd
    se2 = sea + seb
    return wide.filter(se2 > 0).select(
        "key",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        ((ma - mb) / F.sqrt(se2)).alias("t_stat"),
        (
            se2 * se2
            / (
                sea * sea / (nad - F.lit(1.0))
                + seb * seb / (nbd - F.lit(1.0))
            )
        ).alias("dof"),
    )


def jarque_bera(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Jarque–Bera normality test of each key's daily event counts —
    the standard "is this series Gaussian enough for z-scores"
    pre-check in front of :func:`grubbs_test` / Hampel screens
    (Jarque & Bera 1980).

        JB = n/6 * (g1^2 + (g2)^2/4)

    with g1 = m3/m2^1.5 the sample skewness and g2 = m4/m2^2 - 3 the
    excess kurtosis.  The four raw power sums S1..S4 of the daily
    counts are exact BIGINTs (counts are small integers; S4 stays
    far under 2^63 at retention-bounded day counts), the central
    moments expand the raw moments in ONE shared float expression
    each, and m2^1.5 is written m2*sqrt(m2) identically in both
    engines.

    Scale: one (key, day) count rollup then one key aggregate — two
    hash shuffles on the same key, no window, no pairs.

    Output: key, n_days, skew_g1, kurt_g2, jb_stat.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    y = F.col("y")
    # decimal(38,0) for the cubic/quartic sums: y*y stays BIGINT-safe
    # to y < 3e9/day (far above 1e12 rows spread over a retention
    # horizon), and the decimal products keep y^3 <= 2.7e28 and
    # y^4 <= 8.1e37 under the 1e38 precision cap; DuckDB's SUM widens
    # to HUGEINT, so both engines stay exact
    y2d = (y * y).cast("decimal(19,0)")
    yd = y.cast("decimal(19,0)")
    agg = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("s1"),
        F.sum(y * y).alias("s2"),
        F.sum(y2d * yd).alias("s3"),
        F.sum(y2d * y2d).alias("s4"),
    ).filter(F.col("n") >= 4)
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m2 = r2 - m * m
    m3 = r3 - F.lit(3.0) * m * r2 + F.lit(2.0) * m * m * m
    m4 = (
        r4
        - F.lit(4.0) * m * r3
        + F.lit(6.0) * m * m * r2
        - F.lit(3.0) * m * m * m * m
    )
    g1 = m3 / (m2 * F.sqrt(m2))
    g2 = m4 / (m2 * m2) - F.lit(3.0)
    return agg.filter(m2 > 0).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        g1.alias("skew_g1"),
        g2.alias("kurt_g2"),
        (nd / F.lit(6.0) * (g1 * g1 + g2 * g2 / F.lit(4.0)))
        .alias("jb_stat"),
    )


def durbin_watson(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Durbin–Watson first-order autocorrelation statistic of the
    residuals from each key's daily-cents OLS trend — the classic
    "are the trend residuals serially correlated" diagnostic
    (Durbin & Watson 1950) that says when :func:`ols_daily`'s naive
    standard errors lie and :func:`newey_west_trend` is needed.

        DW = sum_t (e_t - e_{t-1})^2 / sum_t e_t^2     (~2 = none)

    x is the day offset, y the daily cents; the OLS slope/intercept
    come from the exact BIGINT sufficient statistics (the ols_daily
    idiom), each residual e = y - (a + b*x) is ONE shared float
    expression of exact integers, and both quadratic-form sums fold
    in day order (sorted fold) so accumulation is bit-identical in
    both engines.

    Scale: one (key, day) rollup, one key aggregate for the OLS fit,
    one co-partitioned equi-join back, one key-ordered window for the
    lag, then per-key sorted folds whose list length is the
    retention-bounded day count — never event volume.

    Output: key, n_days, slope, dw_stat.
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    w = Window.partitionBy("key")
    o = d.select(
        "key",
        (F.col("day") - F.min("day").over(w)).alias("x"),
        F.col("cents").alias("y"),
    )
    fit = (
        o.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .filter(F.col("n") >= 3)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = fit.filter(dxx > 0).select(
        "key",
        "n",
        (num.cast("double") / dxx.cast("double")).alias("b"),
        (
            (
                F.col("sy").cast("double")
                - (num.cast("double") / dxx.cast("double"))
                * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("a"),
    )
    res = o.join(fit, "key").select(
        "key",
        "n",
        "x",
        (
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("x").cast("double"))
        ).alias("e"),
    )
    wo = Window.partitionBy("key").orderBy("x")
    terms = res.select(
        "key",
        "n",
        "x",
        (F.col("e") * F.col("e")).alias("e2"),
        F.when(
            F.lag("e").over(wo).isNotNull(),
            (F.col("e") - F.lag("e").over(wo))
            * (F.col("e") - F.lag("e").over(wo)),
        ).otherwise(F.lit(0.0)).alias("de2"),
    )
    fold = lambda c: F.aggregate(
        F.array_sort(F.collect_list(F.struct("x", c))),
        F.lit(0.0),
        lambda acc, s: acc + s[c],
    )
    agg = terms.groupBy("key").agg(
        F.max("n").alias("n"),
        fold("e2").alias("se2"),
        fold("de2").alias("sde2"),
    )
    return agg.filter(F.col("se2") > 0).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        (F.col("sde2") / F.col("se2")).alias("dw_stat"),
    )


def anova_f(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One-way ANOVA F across the keys on per-event cents — the
    parametric k-sample mean-difference omnibus next to the
    rank-based :func:`kruskal_types` twin (equal-variance Fisher
    form; :func:`brown_forsythe` checks that assumption).

        F = (SSB/(k-1)) / (SSW/(N-k))

    Per-group n, S = sum(cents), Q = sum(cents^2) are exact BIGINTs;
    the grand N, S, Q are exact integer sums of those.  The only
    order-sensitive float reduction, T = sum_g S_g^2/n_g, folds over
    the groups in key order (sorted fold over a k-element list), then
    SSB = T - S^2/N and SSW = Q - T are single shared expressions.

    Scale: one hash aggregate at key grain, then a k-row fold on one
    final row — group count is the type vocabulary, not event volume.

    Output (1 row): k_groups, n_total, ssb, ssw, f_stat.
    """
    g = (
        df.select(
            F.col(key_col).alias("key"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            # decimal(38,0): overflow-safe exact quadratic sum (see
            # welch_ttest); DuckDB SUM widens to HUGEINT likewise
            F.sum(
                F.col("c").cast("decimal(19,0)")
                * F.col("c").cast("decimal(19,0)")
            ).alias("q"),
        )
        .filter(F.col("n") >= 2)
    )
    terms = g.select(
        "key",
        "n",
        "s",
        "q",
        (
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("t_g"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("key", "t_g"))),
            F.lit(0.0),
            lambda acc, s: acc + s["t_g"],
        ).alias("t"),
    )
    nd = F.col("nn").cast("double")
    ssb = F.col("t") - F.col("ss").cast("double") * F.col("ss").cast("double") / nd
    ssw = F.col("qq").cast("double") - F.col("t")
    kd = F.col("k").cast("double")
    return agg.filter(
        (F.col("k") >= 2) & (F.col("nn") > F.col("k"))
    ).select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        F.when(
            ssw > 0,
            (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd)),
        ).alias("f_stat"),
    )


def brown_forsythe(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test that the keys'
    value distributions share a variance — the robust
    homoscedasticity check guarding :func:`anova_f`'s equal-variance
    assumption (Brown & Forsythe 1974; the median form keeps its
    level under heavy tails where the mean form breaks).

    The spread score is z = |c - median_g(c)|; we compute on
    z2 = |2c - m2_g| with m2 = lower + upper rank-selected median
    (an exact BIGINT — rank selection, never an engine percentile),
    which is 2z exactly, and the F statistic is invariant under that
    positive rescaling.  Per-group n, S = sum(z2), Q = sum(z2^2) are
    exact BIGINTs and the one order-sensitive reduction
    T = sum_g S_g^2/n_g folds in key order, exactly as in
    :func:`anova_f`.

    Scale: one per-key ordered window for the median ranks, one hash
    aggregate at key grain, one k-row fold — the window is the only
    event-volume pass.

    Output (1 row): k_groups, n_total, f_stat.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * 100).cast("long").alias("c"),
    )
    wr = Window.partitionBy("key").orderBy("c")
    wn = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "c",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.ceil((F.col("n") + 1) / 2)
    med = (
        ranked.filter((F.col("i") == lo) | (F.col("i") == hi))
        .groupBy("key")
        .agg(
            (
                F.when(F.max("i") > F.min("i"), F.sum("c"))
                .otherwise(F.lit(2) * F.max("c"))
            ).alias("m2")
        )
    )
    z = base.join(med, "key").select(
        "key", F.abs(F.lit(2) * F.col("c") - F.col("m2")).alias("z2")
    )
    g = (
        z.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("z2").alias("s"),
            F.sum(
                F.col("z2").cast("decimal(19,0)")
                * F.col("z2").cast("decimal(19,0)")
            ).alias("q"),
        )
        .filter(F.col("n") >= 2)
    )
    terms = g.select(
        "key",
        "n",
        "s",
        "q",
        (
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("t_g"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("key", "t_g"))),
            F.lit(0.0),
            lambda acc, s: acc + s["t_g"],
        ).alias("t"),
    )
    nd = F.col("nn").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("t") - F.col("ss").cast("double") * F.col("ss").cast("double") / nd
    ssw = F.col("qq").cast("double") - F.col("t")
    return agg.filter(
        (F.col("k") >= 2) & (F.col("nn") > F.col("k"))
    ).select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        F.when(
            ssw > 0,
            (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd)),
        ).alias("f_stat"),
    )


def cramers_v(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cramér's V association strength for the key x hour-of-day
    contingency table — the [0, 1]-normalized effect size that makes
    :func:`chi2_type_hour`'s raw statistic comparable across tables
    of different size and shape (Cramér 1946).

        V = sqrt( chi2 / (N * (min(r, c) - 1)) )

    Cell, row and column counts are exact BIGINTs; each cell's
    expected count E = row*col/N casts the exact integer product to
    double in one shared expression, and chi2 folds the (O-E)^2/E
    terms in (key, hour) order — a sorted fold over at most r*c
    cells (vocabulary-bounded, here <= 24*|types|).

    Scale: one hash aggregate at (key, hour) grain, two broadcast
    joins of the r- and c-row margins, one tiny fold — the contingency
    table never leaves vocabulary size regardless of event volume.

    Output (1 row): n_total, r_levels, c_levels, chi2, cramers_v.
    """
    cells = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(
                (F.unix_timestamp(F.col(ts_col)) % 86400) / 3600
            ).cast("int").alias("hr"),
        )
        .groupBy("key", "hr")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows = cells.groupBy("key").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("hr").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("nn"))
    e = (
        cells.join(F.broadcast(rows), "key")
        .join(F.broadcast(cols), "hr")
        .crossJoin(F.broadcast(tot))
        .select(
            "key",
            "hr",
            "nn",
            (
                F.col("rt").cast("double") * F.col("ct").cast("double")
                / F.col("nn").cast("double")
            ).alias("exp"),
            F.col("o").cast("double").alias("od"),
        )
        .select(
            "key",
            "hr",
            "nn",
            (
                (F.col("od") - F.col("exp"))
                * (F.col("od") - F.col("exp"))
                / F.col("exp")
            ).alias("term"),
        )
    )
    agg = e.agg(
        F.max("nn").alias("nn"),
        F.count_distinct("key").alias("r"),
        F.count_distinct("hr").alias("c"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("key", "hr", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("chi2"),
    )
    dmin = F.least(F.col("r"), F.col("c")).cast("double") - F.lit(1.0)
    return agg.filter((F.col("r") >= 2) & (F.col("c") >= 2)).select(
        F.col("nn").cast("long").alias("n_total"),
        F.col("r").cast("long").alias("r_levels"),
        F.col("c").cast("long").alias("c_levels"),
        F.col("chi2").alias("chi2"),
        F.sqrt(F.col("chi2") / (F.col("nn").cast("double") * dmin))
        .alias("cramers_v"),
    )


def chao1_daily(
    df: DataFrame,
    ts_col: str = "ts",
    species_col: str = "user_id",
) -> DataFrame:
    """Bias-corrected Chao1 species-richness estimate of the TRUE
    distinct-user count per day (Chao 1984) — "how many users were
    really active, counting the ones we never sampled", the
    ecology-borrowed completeness check next to the exact/HLL
    distinct counters in plans/sketches.py.

        chao1 = D + f1*(f1 - 1) / (2*(f2 + 1))

    with D observed distinct species, f1/f2 the singleton/doubleton
    species counts.  The bias-corrected form is used unconditionally
    (it is defined for f2 = 0 too), so the estimate is ONE shared
    float division of exact BIGINTs.

    Scale: one hash aggregate at (day, species) grain then one at day
    grain — the frequency-of-frequencies table per day is tiny.

    Output: day_s, d_obs, f1, f2, chao1.
    """
    per = (
        df.select(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.col(species_col).alias("sp"),
        )
        .groupBy("day", "sp")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    agg = per.groupBy("day").agg(
        F.count(F.lit(1)).alias("d_obs"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).alias("f2"),
    )
    return agg.select(
        (F.col("day") * 86400).cast("long").alias("day_s"),
        F.col("d_obs").cast("long").alias("d_obs"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        (
            F.col("d_obs").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (F.lit(2) * (F.col("f2") + 1)).cast("double")
        ).alias("chao1"),
    )


def good_turing(
    df: DataFrame,
    key_col: str = "event_type",
    species_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Good–Turing unseen-mass and singleton-discount estimates per
    key over its user-frequency spectrum (Good 1953) — the "what
    fraction of the next batch will be brand-new users" screen, the
    same machinery LLM-pipeline token-frequency smoothing uses.

        p0  = N1 / N          (probability mass of unseen species)
        r1* = 2 * N2 / N1     (smoothed true count of once-seen ones)

    N = total events, N1/N2 = species seen exactly once/twice — all
    exact BIGINTs; the two estimates are single shared divisions.
    The species unit is the (user, day) cell, not the bare user, so
    singletons survive at every data scale (a heavy user is a new
    species each day; with bare users the spectrum degenerates to
    all-frequent as volume grows and N1 hits 0).

    Scale: one hash aggregate at (key, species, day) grain then one
    at key grain.

    Output: key, n_events, d_species, n1, n2, p0_unseen, r1_smooth.
    """
    per = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(species_col).alias("sp"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "sp", "day")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    agg = per.groupBy("key").agg(
        F.sum("f").alias("n"),
        F.count(F.lit(1)).alias("d"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).alias("n2"),
    )
    return agg.filter(F.col("n1") > 0).select(
        "key",
        F.col("n").cast("long").alias("n_events"),
        F.col("d").cast("long").alias("d_species"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.col("n1").cast("double") / F.col("n").cast("double"))
        .alias("p0_unseen"),
        (
            F.lit(2.0) * F.col("n2").cast("double")
            / F.col("n1").cast("double")
        ).alias("r1_smooth"),
    )


def kpss_level(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    lags: int = 12,
) -> DataFrame:
    """KPSS level-stationarity statistic per key on the dense hourly
    count series (Kwiatkowski, Phillips, Schmidt & Shin 1992) — the
    null-reversed companion to :func:`dickey_fuller`: here the NULL is
    stationarity, so a LARGE statistic rejects it; running both closes
    the "inconclusive unit-root screen" gap.

        KPSS = T^-2 * sum_t S_t^2 / s^2(L)

    with S_t the partial sums of the demeaned series and s^2(L) the
    Bartlett long-run variance at ``lags`` lags.  Integerization: with
    S = sum(x) and T the grid length, T*e_t = T*x_t - S and
    T*S_t = T*cum_t - (t+1)*S are exact BIGINTs, every lag covariance
    numerator c_j = sum_t (T*e_t)(T*e_{t+j}) is an exact BIGINT sum
    (the ljung_box magnitude envelope), the Bartlett weights
    1 - j/(L+1) are Python-folded double literals, and the one
    order-sensitive float reduction eta = sum_t (T*S_t)^2 folds in t
    order.  The powers of T cancel to

        KPSS = eta / (T * (c_0 + 2*sum_j w_j*c_j)).

    Scale: ``lags`` lead windows + one cumulative window per key over
    the retention-bounded grid, one aggregate — identical plan shape
    to ljung_box.

    Output: key, n_hours, lrv_num, kpss_stat.
    """
    base = _dense_hourly(df, key_col, ts_col)
    kw = Window.partitionBy("key")
    ow = Window.partitionBy("key").orderBy("t")
    s = base.select(
        "key",
        "t",
        F.count(F.lit(1)).over(kw).alias("tt"),
        (
            F.count(F.lit(1)).over(kw) * F.col("x")
            - F.sum("x").over(kw)
        ).alias("e"),
        (
            F.count(F.lit(1)).over(kw) * F.sum("x").over(ow)
            - (F.col("t") + 1) * F.sum("x").over(kw)
        ).alias("p"),
    )
    # decimal(38,0) residual products: e = T*x - S reaches ~1e10 on
    # hot keys at 1e12-row scale, so e*e (~1e20) overflows BIGINT;
    # the decimal cast keeps every product exact under the 1e38 cap
    # (DuckDB's SUM widens to HUGEINT likewise)
    ed = F.col("e").cast("decimal(19,0)")
    lead_cols = [
        (ed * F.lead("e", j).over(ow).cast("decimal(19,0)"))
        .alias(f"g{j}")
        for j in range(1, int(lags) + 1)
    ]
    pd_ = F.col("p").cast("double")
    terms = s.select(
        "key", "t", "tt", "e", (pd_ * pd_).alias("sq"), *lead_cols
    )
    ed2 = F.col("e").cast("decimal(19,0)")
    agg = terms.groupBy("key").agg(
        F.first("tt").alias("tt"),
        F.sum(ed2 * ed2).alias("c0"),
        *[F.sum(f"g{j}").alias(f"c{j}") for j in range(1, int(lags) + 1)],
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", "sq"))),
            F.lit(0.0),
            lambda acc, r: acc + r["sq"],
        ).alias("eta"),
    )
    lrv = F.col("c0").cast("double")
    for j in range(1, int(lags) + 1):
        w_j = 2.0 * (1.0 - j / float(lags + 1))
        lrv = lrv + F.lit(w_j) * F.col(f"c{j}").cast("double")
    return agg.filter((lrv > 0) & (F.col("tt") > lags + 2)).select(
        "key",
        F.col("tt").cast("long").alias("n_hours"),
        lrv.alias("lrv_num"),
        (F.col("eta") / (F.col("tt").cast("double") * lrv)).alias(
            "kpss_stat"
        ),
    )


def permutation_entropy(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Order-3 permutation entropy per key on the dense hourly count
    series (Bandt & Pompe 2002) — the complexity screen that is
    invariant to any monotone rescaling of the load: low for
    predictable ramps/cycles, ~1 for white noise.

    Each consecutive triple maps to its ordinal pattern with ties
    broken by time of occurrence (the standard Bandt–Pompe rule,
    realized as exact lexicographic (value, position) rank sums —
    pure integer comparisons).  Pattern frequencies are exact BIGINTs
    and the entropy folds its <= 6 terms in pattern-code order:

        H = -sum_p (n_p/N) ln(n_p/N),   h_norm = H / ln 6.

    Scale: two lead windows per key + a (key, pattern) aggregate
    whose fan-in is at most 6 rows per key.

    Output: key, n_windows, n_patterns, h_perm, h_norm.
    """
    import math

    base = _dense_hourly(df, key_col, ts_col)
    ow = Window.partitionBy("key").orderBy("t")
    trip = base.select(
        "key",
        "t",
        F.col("x").alias("a"),
        F.lead("x", 1).over(ow).alias("b"),
        F.lead("x", 2).over(ow).alias("c"),
    ).filter(F.col("c").isNotNull())
    i_ = lambda cond: F.when(cond, 1).otherwise(0)
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    rank_a = i_(b < a) + i_(c < a)
    rank_b = i_(a <= b) + i_(c < b)
    rank_c = i_(a <= c) + i_(b <= c)
    coded = trip.select(
        "key", (rank_a * 9 + rank_b * 3 + rank_c).alias("code")
    )
    per = coded.groupBy("key", "code").agg(
        F.count(F.lit(1)).alias("np")
    )
    kw = Window.partitionBy("key")
    terms = per.select(
        "key",
        "code",
        F.sum("np").over(kw).alias("nw"),
        (
            -(
                F.col("np").cast("double")
                / F.sum("np").over(kw).cast("double")
            )
            * F.log(
                F.col("np").cast("double")
                / F.sum("np").over(kw).cast("double")
            )
        ).alias("term"),
    )
    agg = terms.groupBy("key").agg(
        F.max("nw").alias("n_windows"),
        F.count(F.lit(1)).alias("n_patterns"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("code", "term"))),
            F.lit(0.0),
            lambda acc, r: acc + r["term"],
        ).alias("h"),
    )
    return agg.select(
        "key",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_patterns").cast("long").alias("n_patterns"),
        F.col("h").alias("h_perm"),
        (F.col("h") / F.lit(math.log(6.0))).alias("h_norm"),
    )


def theta_forecast(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Theta-method forecast of each key's daily cents total
    (Assimakopoulos & Nikolopoulos 2000; the M3 competition winner):
    the average of the theta=0 line (the OLS trend, pure long-run
    direction) and an SES-smoothed theta=2 line (2y - trend, doubled
    local curvature), read out at horizons h = 1 and 7.

        z_t      = 2*y_t - (a + b*x_t)
        l        = SES_alpha(z),  l_1 = z_1  (seeded, then folded)
        yhat(h)  = 0.5*(a + b*(x_last + h)) + 0.5*l

    a, b come from exact BIGINT OLS sums; each z_t is one shared
    float expression; the SES recursion folds over the day-ordered
    list seeded with the first element (Spark: slice+init aggregate,
    DuckDB: seedless list_reduce — the identical recursion).

    Scale: one (key, day) rollup, one key aggregate, one bounded
    fold — list length is the retention-bounded day count.

    Output: key, n_days, slope, ses_level, theta_f1, theta_f7.
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    w = Window.partitionBy("key")
    o = d.select(
        "key",
        (F.col("day") - F.min("day").over(w)).alias("x"),
        F.col("cents").alias("y"),
    )
    fit = (
        o.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.max("x").alias("xmax"),
        )
        .filter(F.col("n") >= 3)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = fit.filter(dxx > 0).select(
        "key",
        "n",
        "xmax",
        (num.cast("double") / dxx.cast("double")).alias("b"),
        (
            (
                F.col("sy").cast("double")
                - (num.cast("double") / dxx.cast("double"))
                * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("a"),
    )
    z = o.join(fit, "key").select(
        "key",
        "n",
        "xmax",
        "a",
        "b",
        "x",
        (
            F.lit(2.0) * F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("x").cast("double"))
        ).alias("z"),
    )
    agg = z.groupBy("key").agg(
        F.max("n").alias("n"),
        F.max("xmax").alias("xmax"),
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.array_sort(F.collect_list(F.struct("x", "z"))).alias("arr"),
    )
    al = float(alpha)
    ses = F.aggregate(
        F.slice(F.col("arr"), 2, F.size(F.col("arr")) - 1),
        F.element_at(F.col("arr"), 1)["z"],
        lambda acc, r: acc * F.lit(1.0 - al) + F.lit(al) * r["z"],
    )
    out = agg.select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        F.col("b").alias("slope"),
        ses.alias("ses_level"),
        "a",
        "xmax",
    )
    fc = lambda h: (
        F.lit(0.5)
        * (
            F.col("a")
            + F.col("slope")
            * (F.col("xmax") + F.lit(h)).cast("double")
        )
        + F.lit(0.5) * F.col("ses_level")
    )
    return out.select(
        "key",
        "n_days",
        "slope",
        "ses_level",
        fc(1).alias("theta_f1"),
        fc(7).alias("theta_f7"),
    )


def engle_granger(
    df: DataFrame,
    x_type: str = "click",
    y_type: str = "purchase",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Engle–Granger two-step cointegration screen between two event
    types' daily count series (Engle & Granger 1987): regress y on x,
    then Dickey–Fuller-test the residuals — a strongly negative ADF t
    says the two series share a common stochastic trend (they never
    drift apart), the time-series upgrade over plain correlation.

    Step 1 is exact-integer OLS on the zero-filled global day grid.
    Step 2's regression de_t = alpha + rho*e_{t-1} runs on FLOAT
    residuals, so all six of its sufficient statistics fold in day
    order (sorted folds over the retention-bounded grid) and every
    derived quantity is one shared expression — the dickey_fuller
    algebra, float-hardened.

    Scale: one (type, day) rollup, a broadcast of the global day
    bounds, one two-column day grid, one 1-row fit broadcast, one
    bounded fold — days, never events.

    Output (1 row): n_days, beta, rho, adf_t.
    """
    daily = (
        df.filter(F.col(key_col).isin([x_type, y_type]))
        .select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    xy = (
        grid.join(
            daily.filter(F.col("key") == x_type).select(
                "day", F.col("cnt").alias("x")
            ),
            "day",
            "left",
        )
        .join(
            daily.filter(F.col("key") == y_type).select(
                "day", F.col("cnt").alias("y")
            ),
            "day",
            "left",
        )
        .select(
            "day",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    fit = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = fit.filter((F.col("n") >= 4) & (dxx > 0)).select(
        F.col("n").alias("n_days"),
        (num.cast("double") / dxx.cast("double")).alias("beta"),
        (
            (
                F.col("sy").cast("double")
                - (num.cast("double") / dxx.cast("double"))
                * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("a0"),
    )
    res = xy.crossJoin(F.broadcast(fit)).select(
        "day",
        "n_days",
        "beta",
        (
            F.col("y").cast("double")
            - (F.col("a0") + F.col("beta") * F.col("x").cast("double"))
        ).alias("e"),
    )
    ow = Window.orderBy("day")
    dd = res.select(
        "day",
        "n_days",
        "beta",
        F.lag("e", 1).over(ow).alias("ep"),
        (F.col("e") - F.lag("e", 1).over(ow)).alias("de"),
    ).filter(F.col("ep").isNotNull())
    fold = lambda expr, name: F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("day"), expr.alias(name)))),
        F.lit(0.0),
        lambda acc, r: acc + r[name],
    )
    agg = dd.agg(
        F.count(F.lit(1)).alias("m"),
        F.max("n_days").alias("n_days"),
        F.max("beta").alias("beta"),
        fold(F.col("ep"), "v").alias("se"),
        fold(F.col("de"), "v").alias("sd"),
        fold(F.col("ep") * F.col("de"), "v").alias("sed"),
        fold(F.col("ep") * F.col("ep"), "v").alias("see"),
        fold(F.col("de") * F.col("de"), "v").alias("sdd"),
    )
    m = F.col("m").cast("double")
    den = m * F.col("see") - F.col("se") * F.col("se")
    rho = (m * F.col("sed") - F.col("se") * F.col("sd")) / den
    alpha = (F.col("sd") - rho * F.col("se")) / m
    sse = F.col("sdd") - alpha * F.col("sd") - rho * F.col("sed")
    t = rho / F.sqrt((sse / (m - F.lit(2.0))) * m / den)
    return agg.filter((F.col("m") > 2) & (den > 0)).select(
        F.col("n_days").cast("long").alias("n_days"),
        "beta",
        rho.alias("rho"),
        t.alias("adf_t"),
    )


def mi_type_hour(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Mutual information (and its normalized form) between the key
    and the hour-of-day — the information-theoretic twin of
    :func:`cramers_v`: how many nats knowing the hour tells you about
    WHAT happens, comparable across tables via NMI in [0, 1].

        MI  = sum_ij (n_ij/N) ln(N n_ij / (r_i c_j))
        NMI = MI / sqrt(H_row * H_col)

    Cell and margin counts are exact BIGINTs, N*n_ij and r_i*c_j are
    exact integer products, each cell/margin term is ONE shared float
    expression, and all three order-sensitive reductions fold in
    (key, hour) / key / hour order — vocabulary-bounded lists.

    Scale: one (key, hour) hash aggregate, two tiny margin
    aggregates, three bounded folds — identical plan family to
    cramers_v.

    Output (1 row): n_total, mi_nats, h_row, h_col, nmi.
    """
    cells = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(
                (F.unix_timestamp(F.col(ts_col)) % 86400) / 3600
            ).cast("int").alias("hr"),
        )
        .groupBy("key", "hr")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows = cells.groupBy("key").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("hr").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("nn"))
    j = (
        cells.join(F.broadcast(rows), "key")
        .join(F.broadcast(cols), "hr")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = (
        F.col("o").cast("double") / F.col("nn").cast("double")
    ) * F.log(
        F.col("nn").cast("double") * F.col("o").cast("double")
        / (F.col("rt").cast("double") * F.col("ct").cast("double"))
    )
    mi = j.select("key", "hr", "nn", mi_term.alias("term")).groupBy().agg(
        F.max("nn").alias("nn"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("key", "hr", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("mi"),
    )
    ent = lambda margins, mcol, ocol: margins.crossJoin(
        F.broadcast(tot)
    ).select(
        F.col(mcol).alias("k"),
        (
            -(F.col(ocol).cast("double") / F.col("nn").cast("double"))
            * F.log(
                F.col(ocol).cast("double") / F.col("nn").cast("double")
            )
        ).alias("term"),
    ).groupBy().agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("k", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("h"),
    )
    hr_ = ent(rows, "key", "rt").select(F.col("h").alias("h_row"))
    hc_ = ent(cols, "hr", "ct").select(F.col("h").alias("h_col"))
    out = mi.crossJoin(F.broadcast(hr_)).crossJoin(F.broadcast(hc_))
    return out.filter(
        (F.col("h_row") > 0) & (F.col("h_col") > 0)
    ).select(
        F.col("nn").cast("long").alias("n_total"),
        F.col("mi").alias("mi_nats"),
        "h_row",
        "h_col",
        (
            F.col("mi") / F.sqrt(F.col("h_row") * F.col("h_col"))
        ).alias("nmi"),
    )


def chapman_estimate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Chapman bias-corrected capture–recapture population estimate
    from each consecutive-day active-user pair (Chapman 1951) — treat
    day d as the marking visit and day d+1 as the recapture: how big
    is the TRUE user population the two samples were drawn from?  The
    mark-recapture companion to :func:`chao1_daily`'s abundance
    estimator.

        N_hat = (n1 + 1)(n2 + 1)/(m + 1) - 1

    n1/n2 = actives on the two days, m = users active on both — exact
    distinct integers via a (user, day)-co-partitioned equi-join (the
    dau_overlap join shape); the estimate is ONE shared float
    expression and the integer products are exact BIGINTs.

    Scale: one distinct (user, day) aggregate + one co-partitioned
    self-join — linear, never a cross of the actives.

    Output: day_s, n1, n2, m_both, chapman_n.
    """
    du = df.select(
        F.col(key_col).alias("u"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
    ).distinct()
    per_day = du.groupBy("day").agg(F.count(F.lit(1)).alias("actives"))
    inter = (
        du.alias("a")
        .join(
            du.select(
                F.col("u").alias("u_b"),
                (F.col("day") - 1).alias("day"),
            ).alias("b"),
            (F.col("a.u") == F.col("u_b"))
            & (F.col("a.day") == F.col("b.day")),
        )
        .groupBy("a.day")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    n1 = per_day.select("day", F.col("actives").alias("n1"))
    n2 = per_day.select(
        (F.col("day") - 1).alias("day"), F.col("actives").alias("n2")
    )
    out = (
        n1.join(n2, "day")
        .join(inter, "day", "left")
        .withColumn("m", F.coalesce("m", F.lit(0)))
    )
    return out.select(
        (F.col("day") * 86400).cast("long").alias("day_s"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("m").cast("long").alias("m_both"),
        (
            (F.col("n1") + 1).cast("double")
            * (F.col("n2") + 1).cast("double")
            / (F.col("m") + 1).cast("double")
            - F.lit(1.0)
        ).alias("chapman_n"),
    )


def spectral_entropy(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    periods: tuple[int, ...] = _PERIOD_CANDIDATES,
) -> DataFrame:
    """Spectral entropy of the candidate-period Goertzel power
    spectrum per key — "is the rhythm concentrated in one period
    (H -> 0, e.g. pure diurnal) or spread across all candidates
    (H -> 1, arrhythmic)?"; the spectral sibling of
    :func:`permutation_entropy` over the same hourly series and the
    summary statistic on top of :func:`dominant_period`'s argmax.

        p_k = P_k / sum_k P_k,   H = -sum_k p_k ln p_k / ln K

    Each P_k = re_k^2 + im_k^2 reuses dominant_period's machinery:
    trig tables folded ONCE in Python as double literals, hour-ordered
    sorted folds for re/im, so every P_k is bit-identical in both
    engines; the K-term total and entropy then add in the FIXED
    period order (compile-time expression chain, no data-dependent
    order), with exact-zero powers contributing exactly 0.

    Scale: one (key, hour) aggregate + 2*K bounded folds — identical
    plan to dominant_period.

    Output: key, n_hours, p_total, h_spec, h_norm.
    """
    import math

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
    term_cols = []
    for p in periods:
        cos_tab = [
            math.cos(2.0 * math.pi * i / float(p)) for i in range(p)
        ]
        sin_tab = [
            math.sin(2.0 * math.pi * i / float(p)) for i in range(p)
        ]
        idx = (F.col("hour") % p).cast("int")
        carr = F.array(*[F.lit(c) for c in cos_tab])
        sarr = F.array(*[F.lit(s) for s in sin_tab])
        term_cols.append(
            (F.col("cnt").cast("double") * F.element_at(carr, idx + 1))
            .alias(f"tre{p}")
        )
        term_cols.append(
            (F.col("cnt").cast("double") * F.element_at(sarr, idx + 1))
            .alias(f"tim{p}")
        )
    terms = hourly.select("key", "hour", *term_cols)

    def _fold(col_name):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("hour", col_name))),
            F.lit(0.0),
            lambda a, s: a + s[col_name],
        )

    agg = terms.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_hours"),
        *[
            _fold(f"tre{p}").alias(f"re{p}")
            for p in periods
        ],
        *[
            _fold(f"tim{p}").alias(f"im{p}")
            for p in periods
        ],
    )
    pw = agg.select(
        "key",
        "n_hours",
        *[
            (
                F.col(f"re{p}") * F.col(f"re{p}")
                + F.col(f"im{p}") * F.col(f"im{p}")
            ).alias(f"p{p}")
            for p in periods
        ],
    )
    tot = None
    for p in periods:
        tot = F.col(f"p{p}") if tot is None else tot + F.col(f"p{p}")
    pw = pw.select(
        "key",
        "n_hours",
        *[F.col(f"p{p}") for p in periods],
        tot.alias("p_total"),
    ).filter(F.col("p_total") > 0)
    h = None
    for p in periods:
        frac = F.col(f"p{p}") / F.col("p_total")
        term = F.when(
            F.col(f"p{p}") > 0, -frac * F.log(frac)
        ).otherwise(F.lit(0.0))
        h = term if h is None else h + term
    return pw.select(
        "key",
        F.col("n_hours").cast("long").alias("n_hours"),
        "p_total",
        h.alias("h_spec"),
        (h / F.lit(math.log(float(len(periods))))).alias("h_norm"),
    )


def tukey_fences(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Tukey box-plot outlier screen per key on its daily counts
    (Tukey 1977): days outside [H1 - 1.5*IQR, H3 + 1.5*IQR] where
    H1/H3 are the Tukey hinges (medians of the lower/upper halves) —
    the nonparametric companion to :func:`grubbs_test`'s normal-theory
    maximum test.

    EXACT integer arithmetic throughout: with the doubled hinges
    m1 = 2*H1, m3 = 2*H3 (rank-selected lower+upper medians of each
    half, BIGINTs) and iqr2 = m3 - m1 = 2*IQR, the fence tests
    rewrite as

        low:  4*cnt < 2*m1 - 3*iqr2
        high: 4*cnt > 2*m3 + 3*iqr2

    so not a single float enters the outlier decision; the reported
    hinge/fence columns are exact quarter-integers.

    Scale: one (key, day) rollup, one per-key ordered window for the
    half-ranks, two tiny hinge aggregates joined back on key.

    Output: key, n_days, h1, h3, fence_lo, fence_hi, n_low, n_high.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wr = Window.partitionBy("key").orderBy("cnt", "day")
    wn = Window.partitionBy("key")
    ranked = daily.select(
        "key",
        "cnt",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).filter(F.col("n") >= 4)
    half = F.ceil(F.col("n") / 2)

    def _hinge(sub, lo_rank, hi_rank):
        return (
            sub.filter(
                (F.col("j") == lo_rank) | (F.col("j") == hi_rank)
            )
            .groupBy("key")
            .agg(
                F.when(F.max("j") > F.min("j"), F.sum("cnt"))
                .otherwise(F.lit(2) * F.max("cnt"))
                .alias("m2")
            )
        )

    lower = ranked.select(
        "key", "cnt", F.col("i").alias("j"), half.alias("h")
    ).filter(F.col("j") <= F.col("h"))
    upper = ranked.select(
        "key",
        "cnt",
        (F.col("i") - (F.col("n") - half)).alias("j"),
        half.alias("h"),
    ).filter(F.col("j") >= 1)
    h1 = _hinge(
        lower, F.floor((F.col("h") + 1) / 2), F.ceil((F.col("h") + 1) / 2)
    ).withColumnRenamed("m2", "m1")
    h3 = _hinge(
        upper, F.floor((F.col("h") + 1) / 2), F.ceil((F.col("h") + 1) / 2)
    ).withColumnRenamed("m2", "m3")
    j = daily.join(h1, "key").join(h3, "key")
    iqr2 = F.col("m3") - F.col("m1")
    lo_i = 2 * F.col("m1") - 3 * iqr2
    hi_i = 2 * F.col("m3") + 3 * iqr2
    agg = j.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("m1").alias("m1"),
        F.max("m3").alias("m3"),
        F.sum(
            F.when(4 * F.col("cnt") < lo_i, 1).otherwise(0)
        ).alias("n_low"),
        F.sum(
            F.when(4 * F.col("cnt") > hi_i, 1).otherwise(0)
        ).alias("n_high"),
    )
    iqr2o = F.col("m3") - F.col("m1")
    return agg.select(
        "key",
        F.col("n_days").cast("long").alias("n_days"),
        (F.col("m1").cast("double") / F.lit(2.0)).alias("h1"),
        (F.col("m3").cast("double") / F.lit(2.0)).alias("h3"),
        (
            (2 * F.col("m1") - 3 * iqr2o).cast("double") / F.lit(4.0)
        ).alias("fence_lo"),
        (
            (2 * F.col("m3") + 3 * iqr2o).cast("double") / F.lit(4.0)
        ).alias("fence_hi"),
        F.col("n_low").cast("long").alias("n_low"),
        F.col("n_high").cast("long").alias("n_high"),
    )


def odds_ratio(
    df: DataFrame,
    a_type: str = "click",
    b_type: str = "purchase",
    key_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Odds ratio (with the Woolf log CI) that a user-day with an
    ``a_type`` event also carries a ``b_type`` event — the
    epidemiologist's 2x2 readout next to :func:`rate_ratio_test`'s
    Poisson form.  The unit is the (user, day) cell (the
    good_turing species convention) so all four cells stay populated
    at every data scale; at whole-user grain heavy users saturate
    both exposures and the table degenerates.

        OR = (n11 * n00) / (n10 * n01)
        CI = exp(ln OR -+ 1.96 * sqrt(1/n11 + 1/n10 + 1/n01 + 1/n00))

    The four cells are exact BIGINTs from one cell-grain aggregate;
    the integer cross-products are exact, and ln/exp/sqrt compose one
    shared float expression per bound.  Zero cells drop the row (the
    classic undefined-OR case) rather than silently Haldane-correct.

    Scale: one (user, day) hash aggregate, one 4-cell global
    aggregate — no joins, no windows.

    Output (1 row): n11, n10, n01, n00, or_, ci_lo, ci_hi.
    """
    per_user = (
        df.groupBy(
            F.col(user_col).alias("u"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .agg(
            F.max(
                F.when(F.col(key_col) == a_type, 1).otherwise(0)
            ).alias("a"),
            F.max(
                F.when(F.col(key_col) == b_type, 1).otherwise(0)
            ).alias("b"),
        )
    )
    cells = per_user.agg(
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)
        ).alias("n11"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0)
        ).alias("n10"),
        F.sum(
            F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0)
        ).alias("n01"),
        F.sum(
            F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0)
        ).alias("n00"),
    )
    orr = (
        F.col("n11").cast("double") * F.col("n00").cast("double")
    ) / (F.col("n10").cast("double") * F.col("n01").cast("double"))
    se = F.sqrt(
        F.lit(1.0) / F.col("n11").cast("double")
        + F.lit(1.0) / F.col("n10").cast("double")
        + F.lit(1.0) / F.col("n01").cast("double")
        + F.lit(1.0) / F.col("n00").cast("double")
    )
    return cells.filter(
        (F.col("n11") > 0)
        & (F.col("n10") > 0)
        & (F.col("n01") > 0)
        & (F.col("n00") > 0)
    ).select(
        F.col("n11").cast("long").alias("n11"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n00").cast("long").alias("n00"),
        orr.alias("or_"),
        F.exp(F.log(orr) - F.lit(1.96) * se).alias("ci_lo"),
        F.exp(F.log(orr) + F.lit(1.96) * se).alias("ci_hi"),
    )


def mcnemar_weeks(
    df: DataFrame,
    target_type: str = "purchase",
    key_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """McNemar's paired test of week-1 vs week-2 conversion
    (McNemar 1947): did the per-user probability of doing
    ``target_type`` CHANGE between the first two weeks of the
    horizon?  Pairing on the user removes the between-user variance
    a two-sample test would drown in.

        chi2_cc = (|b - c| - 1)^2 / (b + c)

    b/c are the discordant-pair counts (did-then-didn't vs
    didn't-then-did) — exact BIGINTs from one per-user aggregate over
    the md5-free deterministic week split (day offset // 7); the
    continuity-corrected statistic is ONE shared float expression.

    Scale: one user-grain hash aggregate + one 4-cell global
    aggregate — the dual of :func:`odds_ratio` on the time axis.

    Output (1 row): n_users, n_concordant, b_yes_no, c_no_yes, chi2_cc.
    """
    lo = df.select(
        F.min(F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)).alias(
            "lo"
        )
    )
    base = df.crossJoin(F.broadcast(lo)).select(
        F.col(user_col).alias("u"),
        F.floor(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / 86400) - F.col("lo"))
            / 7
        ).alias("week"),
        F.when(F.col(key_col) == target_type, 1).otherwise(0).alias("hit"),
    ).filter(F.col("week") <= 1)
    per_user = base.groupBy("u").agg(
        F.max(F.when(F.col("week") == 0, F.col("hit")).otherwise(0)).alias(
            "w1"
        ),
        F.max(F.when(F.col("week") == 1, F.col("hit")).otherwise(0)).alias(
            "w2"
        ),
    )
    cells = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("w1") == F.col("w2"), 1).otherwise(0)
        ).alias("conc"),
        F.sum(
            F.when((F.col("w1") == 1) & (F.col("w2") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("w1") == 0) & (F.col("w2") == 1), 1).otherwise(0)
        ).alias("c"),
    )
    bc = (F.col("b") + F.col("c")).cast("double")
    d = F.abs(F.col("b") - F.col("c")).cast("double") - F.lit(1.0)
    return cells.filter(F.col("b") + F.col("c") > 0).select(
        F.col("n").cast("long").alias("n_users"),
        F.col("conc").cast("long").alias("n_concordant"),
        F.col("b").cast("long").alias("b_yes_no"),
        F.col("c").cast("long").alias("c_no_yes"),
        (d * d / bc).alias("chi2_cc"),
    )


def gumbel_weekly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    return_weeks: int = 52,
) -> DataFrame:
    """Gumbel extreme-value fit of the weekly-maximum daily count per
    key, by the method of moments, with the ``return_weeks`` return
    level — "how bad is the once-a-year worst day?", the block-maxima
    companion to :func:`pot_exceedance`'s peaks-over-threshold view.

        beta  = s * sqrt(6)/pi
        mu    = xbar - gamma * beta          (gamma = Euler-Mascheroni)
        x_T   = mu - beta * ln(-ln(1 - 1/T))

    Weekly maxima are exact BIGINTs; mean and sample s^2 come from
    exact sums (the ols_daily overflow idiom) and the three constants
    (sqrt(6)/pi, gamma, the T-quantile of the standard Gumbel) are
    Python-folded double literals identical in both engines.

    Scale: a (key, day) rollup, a (key, week) max, a key aggregate —
    three hash shuffles on the same key, no windows, no pairs.

    Output: key, n_weeks, mean_max, beta, mu, return_level.
    """
    import math

    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    weekly = daily.groupBy(
        "key", F.floor(F.col("day") / 7).alias("wk")
    ).agg(F.max("cnt").alias("mx"))
    agg = weekly.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s"),
        # decimal(38,0): overflow-safe exact quadratic sum (see
        # welch_ttest); DuckDB SUM widens to HUGEINT likewise
        F.sum(
            F.col("mx").cast("decimal(19,0)")
            * F.col("mx").cast("decimal(19,0)")
        ).alias("q"),
    ).filter(F.col("n") >= 4)
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    k_beta = math.sqrt(6.0) / math.pi
    euler_gamma = 0.5772156649015329
    t_quant = -math.log(-math.log(1.0 - 1.0 / float(return_weeks)))
    beta = F.sqrt(var) * F.lit(k_beta)
    mu = mean - F.lit(euler_gamma) * beta
    return agg.filter(var > 0).select(
        "key",
        F.col("n").cast("long").alias("n_weeks"),
        mean.alias("mean_max"),
        beta.alias("beta"),
        mu.alias("mu"),
        (mu + beta * F.lit(t_quant)).alias("return_level"),
    )


def bartlett_test(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Bartlett's chi-square test that the keys' value variances are
    equal (Bartlett 1937) — the normal-theory, high-power companion
    to the robust :func:`brown_forsythe`; read them together
    (Bartlett fires on heavy tails alone, Brown–Forsythe does not).

        T = [(N-k) ln s_p^2 - sum_i (n_i-1) ln s_i^2] / C
        C = 1 + (sum_i 1/(n_i-1) - 1/(N-k)) / (3(k-1))

    Per-group n, S, Q are exact BIGINTs; each s_i^2 and its ln is one
    shared float expression and the two order-sensitive reductions
    (the ln sum and the 1/(n_i-1) sum) fold in key order.

    Scale: one key-grain hash aggregate + one k-row fold — the
    anova_f plan shape exactly.

    Output (1 row): k_groups, n_total, t_stat, c_factor.
    """
    g = (
        df.select(
            F.col(key_col).alias("key"),
            F.round(F.col(value_col) * 100).cast("long").alias("c"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            # decimal(38,0): overflow-safe exact quadratic sum (see
            # welch_ttest); DuckDB SUM widens to HUGEINT likewise
            F.sum(
                F.col("c").cast("decimal(19,0)")
                * F.col("c").cast("decimal(19,0)")
            ).alias("q"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    s2 = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    terms = g.filter(s2 > 0).select(
        "key",
        "n",
        ((nd - F.lit(1.0)) * F.log(s2)).alias("lns"),
        (
            (nd - F.lit(1.0)) * s2
        ).alias("ssw"),
        (F.lit(1.0) / (nd - F.lit(1.0))).alias("inv"),
    )
    fold = lambda c: F.aggregate(
        F.array_sort(F.collect_list(F.struct("key", c))),
        F.lit(0.0),
        lambda acc, r: acc + r[c],
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        fold("lns").alias("sum_lns"),
        fold("ssw").alias("sum_ssw"),
        fold("inv").alias("sum_inv"),
    )
    kd = F.col("k").cast("double")
    nd_ = F.col("nn").cast("double")
    dof = nd_ - kd
    sp2 = F.col("sum_ssw") / dof
    t_num = dof * F.log(sp2) - F.col("sum_lns")
    c_f = F.lit(1.0) + (
        F.col("sum_inv") - F.lit(1.0) / dof
    ) / (F.lit(3.0) * (kd - F.lit(1.0)))
    return agg.filter(
        (F.col("k") >= 2) & (F.col("nn") > F.col("k"))
    ).select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        (t_num / c_f).alias("t_stat"),
        c_f.alias("c_factor"),
    )


def welch_suff_cols(user_col: str = "user_id",
                    value_col: str = "value",
                    salt: str = "exp1"):
    """The six Welch sufficient-statistic aggregate columns (per-arm
    n / sum(cents) / sum(cents^2)) shared VERBATIM by the batch
    :func:`welch_hourly` and the streaming twin
    (streaming/stream_rollup.py::stream_welch) — all algebraic
    (commutative monoid state), which is exactly what makes the
    t-test a legal watermarked streaming aggregate."""
    from tsaug_spark.pipeline.sampling import hash_bucket

    arm = hash_bucket(user_col, salt, 2)
    c = F.round(F.col(value_col) * 100).cast("long")
    cd = F.round(F.col(value_col) * 100).cast("decimal(19,0)")
    a0 = arm == 0
    return [
        F.sum(F.when(a0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(a0, c)).alias("sa"),
        F.sum(F.when(a0, cd * cd)).alias("qa"),
        F.sum(F.when(~a0, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(~a0, c)).alias("sb"),
        F.sum(F.when(~a0, cd * cd)).alias("qb"),
    ]


def welch_readout(wide: DataFrame) -> DataFrame:
    """Shared t/dof readout over the six Welch sufficient statistics
    (the welch_ttest float tree, verbatim)."""
    wide = wide.filter((F.col("na") >= 2) & (F.col("nb") >= 2))
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    ma = F.col("sa").cast("double") / nad
    mb = F.col("sb").cast("double") / nbd
    va = (
        F.col("qa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double") / nad
    ) / (nad - F.lit(1.0))
    vb = (
        F.col("qb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double") / nbd
    ) / (nbd - F.lit(1.0))
    sea = va / nad
    seb = vb / nbd
    se2 = sea + seb
    return wide.filter(se2 > 0).select(
        "bucket_s",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        ((ma - mb) / F.sqrt(se2)).alias("t_stat"),
    )


def welch_hourly(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    salt: str = "exp1",
) -> DataFrame:
    """The Welch A/B t statistic as an hourly CONTINUOUS AGGREGATE —
    the experiment dashboard's live significance track, one t per
    hour bucket between the deterministic md5 arms.  The per-arm
    sufficient statistics are algebraic (n, S, Q sums), so this same
    aggregation runs unchanged as a watermarked streaming query
    (streaming/stream_rollup.py::stream_welch) whose caught-up sink
    equals this batch plan EXACTLY — the mergeable-sketch property,
    for inference.

    Scale: one hash aggregate at hour grain (map-side combined,
    6-number state per bucket), then a stateless readout projection.

    Output: bucket_s, n_a, n_b, mean_a, mean_b, t_stat.
    """
    wide = (
        df.groupBy(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) * 3600)
            .cast("long")
            .alias("bucket_s")
        )
        .agg(*welch_suff_cols(user_col, value_col, salt))
    )
    return welch_readout(wide)


#: fixed literal cent-bin edges for the PSI drift monitor — static by
#: design (a drift monitor needs a frozen binning; both engines embed
#: the same literals)
PSI_BIN_EDGES = (500, 1500, 3000, 6000, 12000)


def psi_bin_col(value_col: str = "value"):
    """The literal-edged PSI bin id (0..len(edges)) over exact cents
    — shared by the batch :func:`psi_daily_fixed` and the streaming
    twin (streaming/stream_rollup.py::stream_psi)."""
    c = F.round(F.col(value_col) * 100).cast("long")
    b = None
    for i, e in enumerate(PSI_BIN_EDGES):
        cond = c < F.lit(int(e))
        b = F.when(cond, i) if b is None else b.when(cond, i)
    return b.otherwise(len(PSI_BIN_EDGES)).alias("bin")


def psi_readout(binned: DataFrame) -> DataFrame:
    """PSI-vs-uniform readout over per-(bucket_s, bin) exact counts:

        PSI = sum_i (p_i - q) * ln(p_i / q),   q = 1/K

    Empty bins are zero-filled with the documented epsilon-free
    convention p_i -> (n_i + 0.5)/(N + K/2) (the Laplace-smoothed
    form, so ln never sees 0); the K terms add in FIXED bin order.
    Shared by batch and streaming (identical caught-up counts)."""
    k = len(PSI_BIN_EDGES) + 1
    wide = binned.groupBy("bucket_s").agg(
        F.sum("cnt").alias("nn"),
        *[
            F.sum(F.when(F.col("bin") == i, F.col("cnt")).otherwise(0))
            .alias(f"b{i}")
            for i in range(k)
        ],
    )
    q = 1.0 / k
    nd = F.col("nn").cast("double") + F.lit(k / 2.0)
    psi = None
    for i in range(k):
        p = (F.col(f"b{i}").cast("double") + F.lit(0.5)) / nd
        term = (p - F.lit(q)) * F.log(p / F.lit(q))
        psi = term if psi is None else psi + term
    return wide.filter(F.col("nn") > 0).select(
        "bucket_s",
        F.col("nn").cast("long").alias("n"),
        psi.alias("psi"),
    )


def psi_daily_fixed(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily PSI (population stability index) of the value
    distribution against the FIXED uniform reference over literal
    cent bins — the classic model-input drift alarm (PSI > 0.2 =
    investigate), as a continuous aggregate.  Bin counts are
    algebraic, so the identical aggregation runs as a watermarked
    streaming query (streaming/stream_rollup.py::stream_psi) whose
    caught-up sink equals this batch plan exactly.

    Scale: one (day, bin) hash aggregate (map-side combined, K+1
    cells per day) + a stateless K-term readout.

    Output: bucket_s, n, psi.
    """
    binned = (
        df.select(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
            psi_bin_col(value_col),
        )
        .groupBy("bucket_s", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return psi_readout(binned)


def jb_suff_cols(value_col: str = "value"):
    """The five algebraic Jarque–Bera sufficient statistics over
    exact cents (decimal(38,0) power sums — overflow-safe and exact;
    DuckDB SUM widens to HUGEINT) — shared by :func:`jb_values_daily`
    and the streaming twin (stream_rollup.py::stream_jb)."""
    c = F.round(F.col(value_col) * 100).cast("long")
    cd = F.round(F.col(value_col) * 100).cast("decimal(19,0)")
    c2 = cd * cd
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c2).alias("s2"),
        F.sum(c2 * cd).alias("s3"),
        F.sum(c2 * c2).alias("s4"),
    ]


def jb_readout(wide: DataFrame) -> DataFrame:
    """The Jarque–Bera float tree over (n, s1..s4) — the
    :func:`jarque_bera` raw-to-central expansion, shared verbatim by
    the batch daily track and the streaming twin."""
    wide = wide.filter(F.col("n") >= 4)
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m2 = r2 - m * m
    m3 = r3 - F.lit(3.0) * m * r2 + F.lit(2.0) * m * m * m
    m4 = (
        r4
        - F.lit(4.0) * m * r3
        + F.lit(6.0) * m * m * r2
        - F.lit(3.0) * m * m * m * m
    )
    g1 = m3 / (m2 * F.sqrt(m2))
    g2 = m4 / (m2 * m2) - F.lit(3.0)
    return wide.filter(m2 > 0).select(
        "bucket_s",
        F.col("n").cast("long").alias("n"),
        g1.alias("skew_g1"),
        g2.alias("kurt_g2"),
        (nd / F.lit(6.0) * (g1 * g1 + g2 * g2 / F.lit(4.0)))
        .alias("jb_stat"),
    )


def jb_values_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily Jarque–Bera normality track of the per-event value
    distribution — "did today's payments stop looking like
    yesterday's?", as a continuous aggregate.  The five sufficient
    statistics are algebraic (decimal power sums), so the identical
    aggregation runs as a watermarked streaming query
    (stream_rollup.py::stream_jb) whose caught-up sink equals this
    batch plan exactly.

    Scale: one day-grain hash aggregate (5-number state) + a
    stateless readout.

    Output: bucket_s, n, skew_g1, kurt_g2, jb_stat.
    """
    wide = df.groupBy(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 86400) * 86400)
        .cast("long")
        .alias("bucket_s")
    ).agg(*jb_suff_cols(value_col))
    return jb_readout(wide)


def jb_cascade_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily Jarque–Bera track computed BY MERGING hourly partials —
    the retention-tier cascade applied to inference: the five
    sufficient statistics are a commutative monoid, so the 1h tier
    can be stored and the 1d tier re-aggregated from it without
    touching raw events, exactly like the rollup cascade.  The result
    equals :func:`jb_values_daily`'s direct computation bit-for-bit
    (integer/decimal partials, shared readout), which is what the
    driver oracle asserts.

    Scale: the hourly partial pass is the only event-volume pass; the
    merge is 24 rows -> 1 per day.

    Output: bucket_s, n, skew_g1, kurt_g2, jb_stat.
    """
    hourly = df.groupBy(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) * 3600)
        .cast("long")
        .alias("h")
    ).agg(*jb_suff_cols(value_col))
    daily = hourly.groupBy(
        (F.floor(F.col("h") / 86400) * 86400)
        .cast("long")
        .alias("bucket_s")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").alias("s3"),
        F.sum("s4").alias("s4"),
    )
    return jb_readout(daily)


def welch_cascade_daily(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    salt: str = "exp1",
) -> DataFrame:
    """Daily Welch A/B t computed by merging hourly per-arm partials
    (the :func:`jb_cascade_daily` cascade pattern on the welch_1h
    state): store the 1h tier, merge 24 rows per day, shared
    readout — equals the direct daily aggregation exactly.

    Output: bucket_s, n_a, n_b, mean_a, mean_b, t_stat.
    """
    hourly = df.groupBy(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) * 3600)
        .cast("long")
        .alias("h")
    ).agg(*welch_suff_cols(user_col, value_col, salt))
    daily = hourly.groupBy(
        (F.floor(F.col("h") / 86400) * 86400)
        .cast("long")
        .alias("bucket_s")
    ).agg(
        F.sum("na").alias("na"),
        F.sum("sa").alias("sa"),
        F.sum("qa").alias("qa"),
        F.sum("nb").alias("nb"),
        F.sum("sb").alias("sb"),
        F.sum("qb").alias("qb"),
    )
    return welch_readout(daily)


def psi_cascade_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily PSI drift monitor computed by merging hourly per-bin
    partial counts (the cascade pattern on the psi_daily state) —
    equals :func:`psi_daily_fixed` exactly.

    Output: bucket_s, n, psi.
    """
    hourly = (
        df.select(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) * 3600)
            .cast("long")
            .alias("h"),
            psi_bin_col(value_col),
        )
        .groupBy("h", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    daily = (
        hourly.groupBy(
            (F.floor(F.col("h") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
            "bin",
        )
        .agg(F.sum("cnt").alias("cnt"))
    )
    return psi_readout(daily)


# --------------------------------------------------------------------
# round-4n inference batch: regression diagnostics, agreement, effect
# sizes, and fractal/variance structure — all on the exact-integer /
# sorted-fold determinism contract shared by the rest of this module.
# --------------------------------------------------------------------


def _day_ols_residuals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
):
    """Shared base for the residual-diagnostic family: per-key daily
    cents, day offset x, the exact OLS sufficient statistics, and
    each residual e = y - (a + b*x) as ONE float expression —
    exactly the durbin_watson idiom, factored so breusch_pagan /
    chow_break reuse one plan shape.

    The quadratic-magnitude sums (x*y, x*x) and the cross terms
    (n*sxy, sx*sy) accumulate in decimal(38,0): x*y is day-offset
    times daily cents, and while Spark BIGINT arithmetic wraps
    silently past ~9.2e18, DuckDB's SUM promotes to HUGEINT and
    stays exact — the decimal path keeps both engines identical at
    any retention the module claims (see von_neumann / jarque_bera,
    the same hardening).

    Returns (o, fit): o = (key, x, y) day rows, fit = (key, n, a, b).
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    w = Window.partitionBy("key")
    o = d.select(
        "key",
        (F.col("day") - F.min("day").over(w)).alias("x"),
        F.col("cents").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    fit = (
        o.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(dec("x") * dec("y")).alias("sxy"),
            F.sum(dec("x") * dec("x")).alias("sxx"),
        )
        .filter(F.col("n") >= 3)
    )
    num = (
        F.col("n").cast("decimal(19,0)") * F.col("sxy")
        - F.col("sx").cast("decimal(19,0)")
        * F.col("sy").cast("decimal(19,0)")
    )
    dxx = (
        F.col("n").cast("decimal(19,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(19,0)")
        * F.col("sx").cast("decimal(19,0)")
    )
    fit = fit.filter(dxx > 0).select(
        "key",
        "n",
        "sx",
        "sxx",
        (num.cast("double") / dxx.cast("double")).alias("b"),
        (
            (
                F.col("sy").cast("double")
                - (num.cast("double") / dxx.cast("double"))
                * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("a"),
    )
    return o, fit


def _sorted_fold(order_col: str, value_col: str):
    """Sum a float column in ``order_col`` order via a sorted fold —
    bit-identical to DuckDB's ``list_reduce(list(v ORDER BY o))``."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(order_col, value_col))),
        F.lit(0.0),
        lambda acc, s: acc + s[value_col],
    )


def breusch_pagan(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Breusch–Pagan heteroskedasticity LM test of each key's daily
    OLS trend (Breusch & Pagan 1979; Koenker's studentized n*R^2
    form): regress the squared residuals u = e^2 back on the day
    offset x and report LM = n * R^2 ~ chi^2(1).  The companion to
    :func:`durbin_watson` — DW asks "are the residuals correlated",
    BP asks "does their variance drift", and either failing means
    ols_daily's naive standard errors lie.

    The OLS fit comes from exact BIGINT sufficient statistics
    (:func:`_day_ols_residuals`); u, u*x and u^2 are per-row float
    expressions of exact integers, summed with per-key sorted folds
    (day order) so accumulation is bit-identical in both engines;
    R^2 of the auxiliary regression is the one shared closed form
        R^2 = (n*Sux - sx*Su)^2 / ((n*sxx - sx^2) * (n*Suu - Su^2)).

    Scale: one (key, day) rollup, one key aggregate, one
    co-partitioned join back, per-key folds over retention-bounded
    day counts — never event volume.

    Output: key, n_days, lm_stat, significant (5% chi^2_1).
    """
    o, fit = _day_ols_residuals(df, key_col, ts_col, value_col)
    res = o.join(fit, "key").select(
        "key",
        "n",
        "sx",
        "sxx",
        "x",
        (
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("x").cast("double"))
        ).alias("e"),
    )
    terms = res.select(
        "key",
        "n",
        "sx",
        "sxx",
        "x",
        (F.col("e") * F.col("e")).alias("u"),
        (F.col("e") * F.col("e") * F.col("x").cast("double")).alias(
            "ux"
        ),
        (
            F.col("e") * F.col("e") * (F.col("e") * F.col("e"))
        ).alias("uu"),
    )
    agg = terms.groupBy("key").agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.max("sxx").alias("sxx"),
        _sorted_fold("x", "u").alias("su"),
        _sorted_fold("x", "ux").alias("sux"),
        _sorted_fold("x", "uu").alias("suu"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    nu = nd * F.col("sux") - sxd * F.col("su")
    # sxx is the decimal(38,0) exact sum from _day_ols_residuals;
    # keep the recomputed denominator in decimal until the division
    dxx = (
        (
            F.col("n").cast("decimal(19,0)") * F.col("sxx")
            - F.col("sx").cast("decimal(19,0)")
            * F.col("sx").cast("decimal(19,0)")
        )
        .cast("double")
    )
    duu = nd * F.col("suu") - F.col("su") * F.col("su")
    lm = nd * (nu * nu) / (dxx * duu)
    return agg.filter(F.col("suu") > 0).filter(duu > 0).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        lm.alias("lm_stat"),
        (lm > F.lit(3.841)).alias("significant"),
    )


def chow_break(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Chow structural-break F-test of each key's daily trend at the
    horizon midpoint (Chow 1960): fit the pooled OLS line and a
    separate line per half, and test whether the pooled fit is a
    significantly worse description,

        F = ((SSE_p - SSE_1 - SSE_2) / 2) / ((SSE_1 + SSE_2) / (n-4)).

    The confirmatory twin to the nonparametric changepoint screens
    (:func:`pettitt_changepoint` finds *where*, Chow confirms *that*
    the two regimes have different linear structure at a known split).

    All three fits come from exact BIGINT sufficient statistics; each
    SSE is a per-key sorted fold (day order) of the squared-residual
    float expressions, so accumulation is bit-identical in both
    engines.  Split at x <= x_max div 2 (integer midpoint).

    Scale: one (key, day) rollup, two key aggregates (pooled +
    per-half fits), one co-partitioned join back, bounded folds.

    Output: key, n_days, break_x, f_stat.
    """
    o, fit_p = _day_ols_residuals(df, key_col, ts_col, value_col)
    wk = Window.partitionBy("key")
    o2 = o.select(
        "key",
        "x",
        "y",
        (
            F.col("x")
            <= F.floor(F.max("x").over(wk) / 2).cast("long")
        ).alias("lo"),
        F.floor(F.max("x").over(wk) / 2).cast("long").alias("break_x"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    seg = (
        o2.groupBy("key", "lo")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("x").alias("tx"),
            F.sum("y").alias("ty"),
            F.sum(dec("x") * dec("y")).alias("txy"),
            F.sum(dec("x") * dec("x")).alias("txx"),
        )
    )
    # decimal(38,0) cross terms — same overflow hardening as the
    # pooled fit in _day_ols_residuals
    mnum = dec("m") * F.col("txy") - dec("tx") * dec("ty")
    mdxx = dec("m") * F.col("txx") - dec("tx") * dec("tx")
    seg = seg.filter((F.col("m") >= 3) & (mdxx > 0)).select(
        "key",
        "lo",
        "m",
        (mnum.cast("double") / mdxx.cast("double")).alias("bs"),
        (
            (
                F.col("ty").cast("double")
                - (mnum.cast("double") / mdxx.cast("double"))
                * F.col("tx").cast("double")
            )
            / F.col("m").cast("double")
        ).alias("as_"),
    )
    both = (
        o2.join(fit_p, "key")
        .join(seg, ["key", "lo"])
        .select(
            "key",
            "n",
            "x",
            "lo",
            "break_x",
            (
                F.col("y").cast("double")
                - (
                    F.col("a")
                    + F.col("b") * F.col("x").cast("double")
                )
            ).alias("ep"),
            (
                F.col("y").cast("double")
                - (
                    F.col("as_")
                    + F.col("bs") * F.col("x").cast("double")
                )
            ).alias("es"),
        )
    )
    terms = both.select(
        "key",
        "n",
        "x",
        "break_x",
        (F.col("ep") * F.col("ep")).alias("ep2"),
        F.when(F.col("lo"), F.col("es") * F.col("es"))
        .otherwise(F.lit(0.0))
        .alias("e1"),
        F.when(~F.col("lo"), F.col("es") * F.col("es"))
        .otherwise(F.lit(0.0))
        .alias("e2"),
    )
    agg = terms.groupBy("key").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("nboth"),
        F.max("break_x").alias("break_x"),
        _sorted_fold("x", "ep2").alias("ssep"),
        _sorted_fold("x", "e1").alias("sse1"),
        _sorted_fold("x", "e2").alias("sse2"),
    )
    # nboth == n: every day row joined a segment fit (both halves had
    # >= 3 days and positive x-variance) — the balanced-design gate.
    nd = F.col("n").cast("double")
    fstat = (
        (F.col("ssep") - F.col("sse1") - F.col("sse2")) / F.lit(2.0)
    ) / ((F.col("sse1") + F.col("sse2")) / (nd - F.lit(4.0)))
    return (
        agg.filter(
            (F.col("nboth") == F.col("n"))
            & (F.col("n") >= 6)
            & (F.col("sse1") + F.col("sse2") > 0)
        )
        .select(
            "key",
            F.col("n").cast("long").alias("n_days"),
            F.col("break_x").cast("long").alias("break_x"),
            fstat.alias("f_stat"),
        )
    )


def cochran_q(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cochran's Q omnibus test (Cochran 1950) that the k event types
    are "present on a day" at the same rate — the k-treatment
    generalization of :func:`mcnemar_weeks` over the day-by-type
    presence matrix (blocks = days, treatments = types,
    x_ij = 1 iff type j fired on day i),

        Q = (k-1) * (k * sum_j C_j^2 - N^2) / (k*N - sum_i R_i^2)

    with R_i the types present on day i, C_j the days type j was
    present, N = sum R_i.  Q ~ chi^2(k-1) under exchangeability.
    ENTIRELY integer sufficient statistics (presence is 0/1, the
    sums are BIGINT-exact), one float division at the end.

    Scale: one distinct (day, type) projection, two bounded
    aggregates (per-day and per-type marginals), a single-row
    reduce — retention-bounded, never event volume.

    Output: one row — k_types, n_days, q_stat, dof, significant.
    """
    p = (
        df.select(
            F.col(key_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    rows = p.groupBy("day").agg(F.count(F.lit(1)).alias("r"))
    cols = p.groupBy("typ").agg(F.count(F.lit(1)).alias("c"))
    ra = rows.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("r").alias("nn"),
        F.sum(F.col("r") * F.col("r")).alias("sr2"),
    )
    ca = cols.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    j = ra.crossJoin(F.broadcast(ca))
    den = F.col("k") * F.col("nn") - F.col("sr2")
    q = (
        (F.col("k") - 1)
        * (F.col("k") * F.col("sc2") - F.col("nn") * F.col("nn"))
    ).cast("double") / den.cast("double")
    # 5% critical value of chi^2(dof) at arbitrary dof via the
    # Wilson–Hilferty cube approximation (z_0.95 = 1.6448536...),
    # the same closed form on both engines so the boolean agrees
    dofd = (F.col("k") - 1).cast("double")
    wh = dofd * F.pow(
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dofd)
        + F.lit(1.6448536269514722)
        * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd)),
        F.lit(3.0),
    )
    return j.select(
        F.col("k").cast("long").alias("k_types"),
        F.col("n_days").cast("long").alias("n_days"),
        F.when(den > 0, q).alias("q_stat"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.coalesce(F.when(den > 0, q > wh), F.lit(False)).alias(
            "significant"
        ),
    )


def icc_oneway(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1)
    (Shrout & Fleiss 1979) of each key's hourly counts within days:
    days are the random groups, the 24 hour-of-day counts the
    measurements — "how much of hourly volume variance is explained
    by which day it is" (high ICC = day-level regime shifts dominate;
    low = within-day noise dominates).  The variance-decomposition
    companion to :func:`seasonal_profile`'s mean diurnal shape.

        ICC = (MSB - MSW) / (MSB + (k-1)*MSW),   k = 24

    from the one-way ANOVA sums with missing hours counted as the
    zeros they are (the grid is dense by construction: G_i is the
    day's total, sum y^2 only gets contributions from present
    hours).  Quadratic sums are decimal(38,0) (the jarque_bera
    hardening: exact far past int64 at 1e12-row scale); every float
    appears once.

    Scale: one (key, day, hour) count rollup, one (key, day)
    aggregate, one key aggregate.  Single shuffle chain on the key.

    Output: key, n_days, icc.
    """
    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            (
                F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) % 24
            ).cast("long").alias("hr"),
        )
        .groupBy("key", "day", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    yd = F.col("y").cast("decimal(19,0)")
    daily = hourly.groupBy("key", "day").agg(
        F.sum("y").alias("g"),
        F.sum(yd * yd).alias("q"),
    )
    gd = F.col("g").cast("decimal(19,0)")
    agg = (
        daily.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("t"),
            F.sum(gd * gd).alias("sg2"),
            F.sum("q").alias("sq"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    k = F.lit(24.0)
    t2 = F.col("t").cast("double") * F.col("t").cast("double")
    sg2 = F.col("sg2").cast("double")
    sq = F.col("sq").cast("double")
    ssb = sg2 / k - t2 / (k * nd)
    ssw = sq - sg2 / k
    msb = ssb / (nd - F.lit(1.0))
    msw = ssw / (nd * F.lit(23.0))
    icc = (msb - msw) / (msb + F.lit(23.0) * msw)
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        F.when(msb + F.lit(23.0) * msw > 0, icc).alias("icc"),
    )


def cohens_d_effect(
    df: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohen's d and Hedges' g standardized effect size between the
    daily count distributions of two event types — the magnitude
    companion to :func:`welch_ttest`'s significance (a 1e12-row
    pipeline makes everything "significant"; d says whether anyone
    should care).

        d = (m_a - m_b) / s_pooled,   g = J * d,
        J = 1 - 3 / (4*(n_a + n_b) - 9)          (Hedges 1981)

    with s_pooled^2 = ((q_a - s_a^2/n_a) + (q_b - s_b^2/n_b)) /
    (n_a + n_b - 2) from exact BIGINT power sums of the daily counts.

    Scale: one (type, day) count rollup filtered to two types, one
    two-row aggregate, a single-row reduce.

    Output: one row — n_a, n_b, mean_a, mean_b, cohens_d, hedges_g.
    """
    daily = (
        df.filter(F.col(key_col).isin([type_a, type_b]))
        .select(
            F.col(key_col).alias("typ"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("typ", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("typ").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    a = s.filter(F.col("typ") == type_a).select(
        F.col("n").alias("na"),
        F.col("s1").alias("sa"),
        F.col("s2").alias("qa"),
    )
    b = s.filter(F.col("typ") == type_b).select(
        F.col("n").alias("nb"),
        F.col("s1").alias("sb"),
        F.col("s2").alias("qb"),
    )
    j = a.crossJoin(F.broadcast(b))
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    sad = F.col("sa").cast("double")
    sbd = F.col("sb").cast("double")
    ma = sad / nad
    mb = sbd / nbd
    sp2 = (
        (F.col("qa").cast("double") - sad * sad / nad)
        + (F.col("qb").cast("double") - sbd * sbd / nbd)
    ) / (nad + nbd - F.lit(2.0))
    d = (ma - mb) / F.sqrt(sp2)
    jcorr = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (nad + nbd) - F.lit(9.0)
    )
    return j.filter(
        (F.col("na") >= 2) & (F.col("nb") >= 2) & (sp2 > 0)
    ).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        d.alias("cohens_d"),
        (jcorr * d).alias("hedges_g"),
    )


def partial_corr_day(
    df: DataFrame,
    type_x: str = "click",
    type_y: str = "purchase",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """First-order partial correlation of two event types' daily
    counts controlling for total daily volume — does click co-move
    with purchase beyond both just tracking overall traffic?  The
    confounder-adjusted refinement of the raw Pearson in
    :func:`crosscorr_pair`:

        r_xy.z = (r_xy - r_xz*r_zy) / sqrt((1-r_xz^2)*(1-r_zy^2))

    Day spine = every day with any events (x/y zero-filled via the
    spine join); each pairwise Pearson comes from exact BIGINT
    sufficient statistics in the standard
    (n*Sxy - SxSy) / (sqrt(n*Sxx-Sx^2) * sqrt(n*Syy-Sy^2)) form —
    every float shared verbatim by both engines.

    Scale: one (day, type) count rollup, one day-spine aggregate, a
    single-row reduce over retention-bounded day counts.

    Output: one row — n_days, r_xy, r_xz, r_yz, r_xy_given_z.
    """
    byday = (
        df.select(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.col(key_col).alias("typ"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("z"),
            F.sum(
                F.when(F.col("typ") == type_x, 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("typ") == type_y, 1).otherwise(0)
            ).alias("y"),
        )
    )
    agg = byday.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    ).filter(F.col("n") >= 3)

    def _r(sab, saa, sbb, sa, sb):
        num = (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)).cast(
            "double"
        )
        da = (
            F.col("n") * F.col(saa) - F.col(sa) * F.col(sa)
        ).cast("double")
        db = (
            F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb)
        ).cast("double")
        return num / (F.sqrt(da) * F.sqrt(db))

    rxy = _r("sxy", "sxx", "syy", "sx", "sy")
    rxz = _r("sxz", "sxx", "szz", "sx", "sz")
    ryz = _r("syz", "syy", "szz", "sy", "sz")
    pc = (rxy - rxz * ryz) / (
        F.sqrt(F.lit(1.0) - rxz * rxz)
        * F.sqrt(F.lit(1.0) - ryz * ryz)
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        rxy.alias("r_xy"),
        rxz.alias("r_xz"),
        ryz.alias("r_yz"),
        F.when(
            (F.lit(1.0) - rxz * rxz > 0)
            & (F.lit(1.0) - ryz * ryz > 0),
            pc,
        ).alias("r_xy_given_z"),
    )


def cusum_squares(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM-of-squares variance-changepoint statistic per key
    (Brown, Durbin & Evans 1975): on the daily cents series,

        stat = max_t | S_t / S_n  -  t / n |,
        S_t = running sum of cents^2 in day order,

    locating where the series' *second moment* breaks — the variance
    twin of :func:`cusum_changepoint`'s mean-shift screen.  Running
    sums are decimal(38,0)-exact (order-defined window accumulation,
    no float folds at all); each D_t is one shared float expression,
    and the break day is the earliest argmax (D desc, day asc).

    Scale: one (key, day) rollup, one ordered window per key, one
    row_number — retention-bounded rows after the first aggregate.

    Output: key, n_days, cs_stat, break_day.
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    cd = F.col("cents").cast("decimal(19,0)")
    sq = d.select(
        "key", "day", (cd * cd).alias("y2")
    )
    wo = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy("key")
    run = sq.select(
        "key",
        "day",
        F.sum("y2").over(wo).alias("st"),
        F.sum("y2").over(wk).alias("sn"),
        F.row_number()
        .over(Window.partitionBy("key").orderBy("day"))
        .alias("t"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    dt = F.abs(
        F.col("st").cast("double") / F.col("sn").cast("double")
        - F.col("t").cast("double") / F.col("n").cast("double")
    )
    scored = run.filter(
        (F.col("n") >= 4) & (F.col("sn") > 0)
    ).select("key", "day", "n", dt.alias("d"))
    pick = Window.partitionBy("key").orderBy(
        F.col("d").desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "key",
            F.col("n").cast("long").alias("n_days"),
            F.col("d").alias("cs_stat"),
            F.col("day").alias("break_day"),
        )
    )


def higuchi_fd(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Higuchi-style fractal dimension of each key's dense
    zero-filled hourly count series (Higuchi 1988, the simplified
    single-origin curve-length form): for lags k in {1, 2, 4},

        L(k) = (N - 1) * sum_i |x_{i+k} - x_i| / k^3,

    and HFD is the slope of ln L(k) on ln(1/k) — roughness between
    :func:`hurst_rs`'s long-memory exponent (HFD ~ 2 - H for fGn)
    and :func:`sample_entropy`'s irregularity.  The absolute-
    difference sums are exact BIGINTs on the dense grid (the
    peak_detect zero-fill: a missing hour is a real zero), each
    ln L(k) is one shared float expression, and the 3-point slope is
    the closed form  slope = sum(a_i - abar)*b_i / sum(a_i - abar)^2
    with a = ln(1/k) constants folded to literals.

    Scale: one (key, hour) rollup, one bounded grid explode, three
    lag windows in one pass, one key aggregate.

    Output: key, n_hours, l1, l2, l4, hfd.
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
        F.explode(
            F.sequence(
                F.col("lo").cast("int"), F.col("hi").cast("int")
            )
        ).alias("hour_i"),
    ).select("key", F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, ["key", "hour"], "left").select(
        "key", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("key").orderBy("hour")
    lagged = dense.select(
        "key",
        "cnt",
        F.lag("cnt", 1).over(w).alias("p1"),
        F.lag("cnt", 2).over(w).alias("p2"),
        F.lag("cnt", 4).over(w).alias("p4"),
    )
    agg = lagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(F.abs(F.col("cnt") - F.col("p1"))).alias("d1"),
        F.sum(F.abs(F.col("cnt") - F.col("p2"))).alias("d2"),
        F.sum(F.abs(F.col("cnt") - F.col("p4"))).alias("d4"),
    ).filter(
        (F.col("nh") >= 8)
        & (F.col("d1") > 0)
        & (F.col("d2") > 0)
        & (F.col("d4") > 0)
    )
    nm1 = (F.col("nh") - 1).cast("double")
    l1 = nm1 * F.col("d1").cast("double") / F.lit(1.0)
    l2 = nm1 * F.col("d2").cast("double") / F.lit(8.0)
    l4 = nm1 * F.col("d4").cast("double") / F.lit(64.0)
    # a = ln(1/k) for k in {1,2,4}: {0, -ln2, -2ln2}; abar = -ln2;
    # sum (a_i - abar)^2 = 2 ln2^2; slope = (ln2*b1 - ln2*b3)/(2 ln2^2)
    # = (ln L(1) - ln L(4)) / (2 ln 2)
    hfd = (F.log(l1) - F.log(l4)) / F.lit(2.0 * 0.6931471805599453)
    return agg.select(
        "key",
        F.col("nh").cast("long").alias("n_hours"),
        l1.alias("l1"),
        l2.alias("l2"),
        l4.alias("l4"),
        hfd.alias("hfd"),
    )


# --------------------------------------------------------------------
# round-4j inference batch: trend signs, reliability, concordance,
# directed information flow, and transition symmetry.
# --------------------------------------------------------------------


def cox_stuart(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cox–Stuart sign test for monotone trend per key (Cox & Stuart
    1955): pair each day in the first half of the daily-count series
    with its shifted twin ceil(n/2) later, count rising vs falling
    pairs, and score the binomial z

        z = (S+ - m/2) / sqrt(m/4),   m = S+ + S-   (ties dropped).

    The "is there ANY monotone drift" screen that needs even less
    than :func:`mk_trend_daily` (no rank sums at all — just signs),
    and the standard cheap pre-filter in front of it.  ENTIRELY
    integer counts; z is one shared float expression.

    Scale: one (key, day) rollup, one key-ordered row_number, one
    self-equi-join on (key, idx + offset) — both sides are
    retention-bounded day rows.

    Output: key, n_days, n_pairs, n_pos, n_neg, z.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    wo = Window.partitionBy("key").orderBy("day")
    wk = Window.partitionBy("key")
    idx = daily.select(
        "key",
        "y",
        (F.row_number().over(wo) - 1).alias("i"),
        F.count(F.lit(1)).over(wk).alias("n"),
    )
    lead = idx.select(
        "key",
        F.col("n").alias("n2"),
        (F.col("i") - (F.col("n") - F.floor(F.col("n") / 2)
                       .cast("long"))).alias("i"),
        F.col("y").alias("y2"),
    )
    pairs = idx.filter(
        F.col("i") < F.floor(F.col("n") / 2).cast("long")
    ).join(lead, ["key", "i"])
    agg = pairs.groupBy("key").agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("y2") > F.col("y"), 1).otherwise(0))
        .alias("pos"),
        F.sum(F.when(F.col("y2") < F.col("y"), 1).otherwise(0))
        .alias("neg"),
    )
    m = F.col("pos") + F.col("neg")
    md = m.cast("double")
    z = (
        F.col("pos").cast("double") - md / F.lit(2.0)
    ) / F.sqrt(md / F.lit(4.0))
    return agg.filter((F.col("n") >= 4) & (m > 0)).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        m.cast("long").alias("n_pairs"),
        F.col("pos").cast("long").alias("n_pos"),
        F.col("neg").cast("long").alias("n_neg"),
        z.alias("z"),
    )


def cronbach_alpha(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient per key
    (Cronbach 1951) treating the 24 hour-of-day counts as the items
    and days as the cases,

        alpha = k/(k-1) * (1 - sum_h var_h / var_total),   k = 24

    — "do the hours of the day tell one coherent volume story"; the
    reliability companion to :func:`icc_oneway` (alpha is exactly the
    Spearman-Brown-stepped ICC under the one-way model).  Item and
    total variances come from exact integer power sums (decimal(38,0)
    quadratics, the jarque_bera hardening); each var_h is one shared
    float expression and the 24-term item-variance sum folds in hour
    order (sorted fold).

    Scale: one (key, day, hour) rollup, one (key, hour) and one
    (key, day) aggregate, one broadcast-sized join on key.

    Output: key, n_days, item_var_sum, total_var, alpha.
    """
    cells = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            (
                F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) % 24
            ).cast("long").alias("hr"),
        )
        .groupBy("key", "day", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    yd = F.col("y").cast("decimal(19,0)")
    daily = cells.groupBy("key", "day").agg(
        F.sum("y").alias("g")
    )
    gd = F.col("g").cast("decimal(19,0)")
    keyagg = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.sum(gd * gd).alias("sg2"),
    ).filter(F.col("n") >= 2)
    hr_sums = cells.groupBy("key", "hr").agg(
        F.sum("y").alias("sh"),
        F.sum(yd * yd).alias("qh"),
    )
    nd = F.col("n").cast("double")
    hv = hr_sums.join(keyagg, "key").select(
        "key",
        "hr",
        (
            (
                F.col("n").cast("decimal(19,0)") * F.col("qh")
                - F.col("sh").cast("decimal(19,0)")
                * F.col("sh").cast("decimal(19,0)")
            ).cast("double")
            / (nd * (nd - F.lit(1.0)))
        ).alias("vh"),
    )
    vsum = hv.groupBy("key").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("hr", "vh"))),
            F.lit(0.0),
            lambda acc, s: acc + s["vh"],
        ).alias("vh_sum")
    )
    out = keyagg.join(vsum, "key")
    vt = (
        F.col("n").cast("decimal(19,0)") * F.col("sg2")
        - F.col("sg").cast("decimal(19,0)")
        * F.col("sg").cast("decimal(19,0)")
    ).cast("double") / (nd * (nd - F.lit(1.0)))
    alpha = (F.lit(24.0) / F.lit(23.0)) * (
        F.lit(1.0) - F.col("vh_sum") / vt
    )
    return out.filter(vt > 0).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        F.col("vh_sum").alias("item_var_sum"),
        vt.alias("total_var"),
        alpha.alias("alpha"),
    )


def kendalls_w(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Kendall's coefficient of concordance W with tie correction
    (Kendall & Babington Smith 1939): each day ranks the k event
    types by daily count — do the days agree on the volume ordering?
    The k-object generalization of day-to-day rank stability,
    reported with the chi^2 = m(k-1)W large-sample statistic.

    Ranks are DOUBLED average ranks (2*avg = min_rank*2 + (ties-1)),
    so everything stays integer:

        W = (3*sum_j R2_j^2 - 3 m^2 k (k+1)^2)
            / (m^2 k (k^2-1) - m * sum_i T_i),

    T_i = sum over tie groups of (t^3 - t) on day i.  The day-by-type
    grid is dense (a type with no events that day competes with count
    0 — otherwise the ranking is over shifting contestant sets).
    ENTIRELY integer sufficient statistics; W and chi2 are single
    shared float expressions.

    Scale: one (day, type) rollup, one bounded grid (m*k rows, both
    retention/vocabulary-bounded), two window ranks, three bounded
    aggregates.

    Output: one row — m_days, k_types, w_stat, chi2.
    """
    counts = (
        df.select(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.col(key_col).alias("typ"),
        )
        .groupBy("day", "typ")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    days = counts.select("day").distinct()
    typs = counts.select("typ").distinct()
    grid = days.crossJoin(F.broadcast(typs))
    dense = grid.join(counts, ["day", "typ"], "left").select(
        "day", "typ", F.coalesce("y", F.lit(0)).alias("v")
    )
    wd = Window.partitionBy("day").orderBy("v")
    wt = Window.partitionBy("day", "v")
    ranked = dense.select(
        "day",
        "typ",
        "v",
        (
            F.rank().over(wd) * 2
            + (F.count(F.lit(1)).over(wt) - 1)
        ).alias("r2"),
        F.count(F.lit(1)).over(wt).alias("t"),
    )
    per_typ = ranked.groupBy("typ").agg(
        F.sum("r2").alias("r2j"), F.count(F.lit(1)).alias("m")
    )
    s_r2 = per_typ.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("m").alias("m"),
        F.sum(F.col("r2j") * F.col("r2j")).alias("sr2sq"),
    )
    ties = (
        ranked.select("day", "v", "t")
        .distinct()
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tsum")
        )
    )
    j = s_r2.crossJoin(F.broadcast(ties))
    num = (
        F.lit(3) * F.col("sr2sq")
        - F.lit(3)
        * F.col("m")
        * F.col("m")
        * F.col("k")
        * (F.col("k") + 1)
        * (F.col("k") + 1)
    )
    den = F.col("m") * F.col("m") * F.col("k") * (
        F.col("k") * F.col("k") - 1
    ) - F.col("m") * F.col("tsum")
    w = num.cast("double") / den.cast("double")
    chi2 = (
        F.col("m") * (F.col("k") - 1)
    ).cast("double") * w
    return j.filter((den > 0) & (F.col("k") >= 2)).select(
        F.col("m").cast("long").alias("m_days"),
        F.col("k").cast("long").alias("k_types"),
        w.alias("w_stat"),
        chi2.alias("chi2"),
    )


def _te_direction(dense: DataFrame, src: str, dst: str):
    """Lag-1 binary transfer entropy src -> dst over the dense
    hourly frame (columns: hour, bx_<src>, bx_<dst> already
    binarized).  Returns a 1-row frame (n, te)."""
    wo = Window.orderBy("hour")
    tri = dense.select(
        F.col(f"b_{dst}").alias("b"),
        F.col(f"b_{src}").alias("c"),
        F.lead(f"b_{dst}").over(wo).alias("a"),
        "hour",
    ).filter(F.col("a").isNotNull())
    cells = tri.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("nabc")
    )
    wb = Window.partitionBy("b")
    wbc = Window.partitionBy("b", "c")
    wab = Window.partitionBy("a", "b")
    terms = cells.select(
        "a",
        "b",
        "c",
        "nabc",
        F.sum("nabc").over(wb).alias("nb"),
        F.sum("nabc").over(wbc).alias("nbc"),
        F.sum("nabc").over(wab).alias("nab"),
    ).select(
        "a",
        "b",
        "c",
        "nabc",
        (
            F.col("nabc").cast("double")
            * F.log(
                (F.col("nabc") * F.col("nb")).cast("double")
                / (F.col("nbc") * F.col("nab")).cast("double")
            )
        ).alias("term"),
    )
    return terms.agg(
        F.sum("nabc").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("a", "b", "c", "term"))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("tsum"),
    ).select(
        "n",
        (F.col("tsum") / F.col("n").cast("double")).alias("te"),
    )


def transfer_entropy(
    df: DataFrame,
    type_x: str = "click",
    type_y: str = "purchase",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Lag-1 binary transfer entropy between two event types' hourly
    activity (Schreiber 2000), both directions:

        TE(X->Y) = sum p(y', y, x) ln[ p(y'|y,x) / p(y'|y) ]

    estimated from the 2x2x2 contingency of (next-Y, Y, X) after
    binarizing each dense zero-filled hourly count series at its own
    rank-selected lower median.  The *directed* companion to
    :func:`granger_click_purchase` — Granger is linear, TE catches
    any lag-1 dependence, and the asymmetry TE(X->Y) vs TE(Y->X) is
    the direction signal.  Cell counts and all three marginals are
    exact BIGINTs; each of the <= 8 cell terms is one shared float
    expression folded in (a, b, c) order.

    Scale: one (hour, type) rollup, one bounded grid, two global
    hour-ordered windows on the retention-bounded dense series (the
    documented single-partition pattern of the spectral family), one
    8-row aggregate per direction.

    Output: one row — n_transitions, te_x_to_y, te_y_to_x.
    """
    hourly = (
        df.filter(F.col(key_col).isin([type_x, type_y]))
        .select(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
            .cast("long")
            .alias("hour"),
            F.col(key_col).alias("typ"),
        )
        .groupBy("hour")
        .agg(
            F.sum(
                F.when(F.col("typ") == type_x, 1).otherwise(0)
            ).alias("xr"),
            F.sum(
                F.when(F.col("typ") == type_y, 1).otherwise(0)
            ).alias("yr"),
        )
    )
    bounds = hourly.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo").cast("int"), F.col("hi").cast("int")
            )
        ).alias("hour_i")
    ).select(F.col("hour_i").cast("long").alias("hour"))
    dense = grid.join(hourly, "hour", "left").select(
        "hour",
        F.coalesce("xr", F.lit(0)).alias("x"),
        F.coalesce("yr", F.lit(0)).alias("y"),
    )

    def lower_median(col):
        wv = Window.orderBy(col, "hour")
        wn = Window.partitionBy()
        return (
            dense.select(
                F.col(col).alias("v"),
                F.row_number().over(wv).alias("r"),
                F.count(F.lit(1)).over(wn).alias("n"),
            )
            .filter(
                F.col("r")
                == F.floor((F.col("n") + 1) / 2).cast("int")
            )
            .select(F.col("v").alias(f"med_{col}"))
        )
    med = lower_median("x").crossJoin(lower_median("y"))
    b = dense.crossJoin(F.broadcast(med)).select(
        "hour",
        (F.col("x") > F.col("med_x")).cast("int").alias("b_x"),
        (F.col("y") > F.col("med_y")).cast("int").alias("b_y"),
    )
    xy = _te_direction(b, "x", "y").select(
        "n", F.col("te").alias("te_x_to_y")
    )
    yx = _te_direction(b, "y", "x").select(
        F.col("te").alias("te_y_to_x")
    )
    return xy.crossJoin(yx).select(
        F.col("n").cast("long").alias("n_transitions"),
        "te_x_to_y",
        "te_y_to_x",
    )


def bowker_symmetry(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Bowker's test of transition-matrix symmetry (Bowker 1948) over
    the per-user consecutive event-type transitions — McNemar's k-state
    generalization: is i -> j as common as j -> i, or does the event
    flow have a direction?

        B = sum_{i<j} (n_ij - n_ji)^2 / (n_ij + n_ji) ~ chi^2(dof),

    dof = number of (i, j) pairs with n_ij + n_ji > 0.  Transition
    counts are exact BIGINTs from the (ts, event_id)-ordered lag
    window (the event_transitions contract); each pair term is one
    shared float expression folded in (i, j) order.

    Scale: one user-ordered lag window, one transition-matrix
    aggregate (|states|^2 rows), one self-join of the tiny matrix on
    the swapped key, one fold over <= k^2/2 terms.

    Output: one row — n_pairs, dof, bowker_stat.
    """
    from tsaug_spark.plans.metrics import transition_counts

    ev = df.select(
        key_col,
        order_col,
        state_col,
        F.unix_timestamp(F.col(ts_col)).alias("t"),
    )
    tc = transition_counts(
        ev,
        key_col=key_col,
        ts_col="t",
        state_col=state_col,
        order_col=order_col,
    )
    a = tc.select(
        F.col("from_state").alias("i"),
        F.col("to_state").alias("j"),
        F.col("n").alias("nij"),
    ).filter(F.col("i") < F.col("j"))
    bb = tc.select(
        F.col("to_state").alias("i"),
        F.col("from_state").alias("j"),
        F.col("n").alias("nji"),
    ).filter(F.col("i") < F.col("j"))
    pairs = a.join(bb, ["i", "j"], "full").select(
        "i",
        "j",
        F.coalesce("nij", F.lit(0)).alias("nij"),
        F.coalesce("nji", F.lit(0)).alias("nji"),
    )
    diff = F.col("nij") - F.col("nji")
    term = (diff * diff).cast("double") / (
        F.col("nij") + F.col("nji")
    ).cast("double")
    scored = pairs.filter(
        F.col("nij") + F.col("nji") > 0
    ).select("i", "j", term.alias("term"))
    return scored.agg(
        F.count(F.lit(1)).alias("dof"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", "j", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("b"),
    ).select(
        F.col("dof").cast("long").alias("dof"),
        F.col("b").alias("bowker_stat"),
    )


# --------------------------------------------------------------------
# round-4k inference batch: randomness screens and the repeated-
# medians robust slope.
# --------------------------------------------------------------------


def turning_points(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The two classical IID-randomness screens on each key's daily
    count series (Kendall & Stuart ch. 45): the turning-point test

        E[T] = 2(n-2)/3,  Var[T] = (16n - 29)/90,

    (T = strict interior local extrema) and the difference-sign test

        E[S] = (n-1)/2,   Var[S] = (n+1)/12,

    (S = rises between consecutive days).  Too many turning points
    means over-differencing / oscillation, too few means trend — the
    cheap pre-screen in front of :func:`runs_test` (which needs a
    median) and :func:`ljung_box` (which needs autocorrelations).
    ENTIRELY integer counts; the two z-scores are single shared
    float expressions.

    Scale: one (key, day) rollup, one lag/lead window per key, one
    key aggregate.

    Output: key, n_days, n_turning, tp_z, n_rises, ds_z.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("key").orderBy("day")
    lagged = daily.select(
        "key",
        "y",
        F.lag("y").over(w).alias("p"),
        F.lead("y").over(w).alias("q"),
    )
    turn = (
        F.col("p").isNotNull()
        & F.col("q").isNotNull()
        & (
            ((F.col("p") < F.col("y")) & (F.col("y") > F.col("q")))
            | ((F.col("p") > F.col("y")) & (F.col("y") < F.col("q")))
        )
    )
    rise = F.col("p").isNotNull() & (F.col("y") > F.col("p"))
    agg = lagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(turn, 1).otherwise(0)).alias("t"),
        F.sum(F.when(rise, 1).otherwise(0)).alias("s"),
    ).filter(F.col("n") >= 4)
    nd = F.col("n").cast("double")
    tp_z = (
        F.col("t").cast("double")
        - F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    ) / F.sqrt(
        (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    )
    ds_z = (
        F.col("s").cast("double") - (nd - F.lit(1.0)) / F.lit(2.0)
    ) / F.sqrt((nd + F.lit(1.0)) / F.lit(12.0))
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        F.col("t").cast("long").alias("n_turning"),
        tp_z.alias("tp_z"),
        F.col("s").cast("long").alias("n_rises"),
        ds_z.alias("ds_z"),
    )


def von_neumann(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Von Neumann successive-difference ratio per key on the daily
    cents series (von Neumann 1941),

        VN = sum_t (x_t - x_{t-1})^2 / sum_t (x_t - xbar)^2
           = n * SUM(d^2) / (n * SUM(x^2) - SUM(x)^2),

    ~ 2 for white noise, << 2 under positive serial correlation —
    the no-regression sibling of :func:`durbin_watson` (DW is VN on
    OLS residuals).  The rewrite keeps EVERYTHING integer
    (decimal(38,0) quadratics) until one float division.

    Scale: one (key, day) rollup, one lag window, one key aggregate.

    Output: key, n_days, vn_ratio.
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    w = Window.partitionBy("key").orderBy("day")
    cd = F.col("cents").cast("decimal(19,0)")
    lagged = d.select(
        "key",
        "cents",
        cd.alias("cd"),
        (cd - F.lag(cd).over(w)).alias("dd"),
    )
    agg = lagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cd") * F.col("cd")).alias("sxx"),
        F.sum(F.col("dd") * F.col("dd")).alias("sd2"),
    ).filter(F.col("n") >= 3)
    den = (
        F.col("n").cast("decimal(19,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(19,0)")
        * F.col("sx").cast("decimal(19,0)")
    )
    vn = (
        (F.col("n").cast("decimal(19,0)") * F.col("sd2"))
        .cast("double")
        / den.cast("double")
    )
    return agg.filter(den.cast("double") > 0).select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        vn.alias("vn_ratio"),
    )


def siegel_slopes(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Siegel repeated-medians slope per key (Siegel 1982): for each
    anchor day i take the median of its pairwise slopes to every
    other day, then the median of those per-anchor medians — a 50%
    breakdown point vs Theil-Sen's 29% (:func:`theil_sen`), the
    robust trend of last resort when half the days are outliers.

    Each pairwise slope is one division of exact BIGINTs; BOTH
    median layers are rank-selected with deterministic tie-breaks
    ((slope, other-day) inner, (med, anchor-day) outer) and average
    the two middle ranks on even counts — never an engine
    percentile.

    Scale: the theil_sen day-pair self-join (quadratic in the
    retention-bounded day count, linear in events), two window
    rank-selections.

    Output: key, n_days, slope_cents_per_day.
    """
    d = _day_cents(df, key_col, ts_col, value_col)
    a = d.select(
        "key", F.col("day").alias("di"), F.col("cents").alias("ci")
    )
    b = d.select(
        "key", F.col("day").alias("dj"), F.col("cents").alias("cj")
    )
    pairs = (
        a.join(b, "key")
        .filter(F.col("di") != F.col("dj"))
        .select(
            "key",
            "di",
            "dj",
            (
                (F.col("cj") - F.col("ci")).cast("double")
                / (F.col("dj") - F.col("di")).cast("double")
            ).alias("s"),
        )
    )
    wi = Window.partitionBy("key", "di").orderBy("s", "dj")
    ci = Window.partitionBy("key", "di")
    r1 = pairs.select(
        "key",
        "di",
        "s",
        F.row_number().over(wi).alias("rn"),
        F.count(F.lit(1)).over(ci).alias("m"),
    )
    inner = r1.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    ).groupBy("key", "di").agg(
        (F.sum("s") / F.count(F.lit(1))).alias("med_i")
    )
    wo = Window.partitionBy("key").orderBy("med_i", "di")
    co = Window.partitionBy("key")
    r2 = inner.select(
        "key",
        "med_i",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(co).alias("m"),
    )
    outer = r2.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    ).groupBy("key").agg(
        F.max("m").alias("n_days"),
        (F.sum("med_i") / F.count(F.lit(1))).alias(
            "slope_cents_per_day"
        ),
    )
    return outer.filter(F.col("n_days") >= 2).select(
        "key",
        F.col("n_days").cast("long").alias("n_days"),
        "slope_cents_per_day",
    )


# --------------------------------------------------------------------
# round-4l batch: inequality / concentration indices, rolling hedge
# ratio, winsorized location.
# --------------------------------------------------------------------


def hoover_index(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Hoover (Robin Hood) index of each key's daily-volume
    inequality: the share of total volume that would have to move
    between days to equalize them,

        H = sum_i |n*y_i - Y| / (2 * n * Y),

    the L1 companion to :func:`activity_gini` — Gini weighs all
    transfers, Hoover answers the capacity question ("how much
    buffer does the peak day need").  The scaled form keeps the
    numerator an EXACT integer (|n*y_i - Y| of BIGINTs, summed),
    one float division at the end.

    Scale: one (key, day) rollup, one key aggregate for (n, Y), one
    co-partitioned join back, one key aggregate — no folds, no
    windows.

    Output: key, n_days, hoover.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    tot = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("yy")
    ).filter((F.col("n") >= 2) & (F.col("yy") > 0))
    j = daily.join(tot, "key")
    num = j.groupBy("key").agg(
        F.max("n").alias("n"),
        F.max("yy").alias("yy"),
        F.sum(
            F.abs(F.col("n") * F.col("y") - F.col("yy"))
        ).alias("s"),
    )
    return num.select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        (
            F.col("s").cast("double")
            / (F.lit(2.0) * (F.col("n") * F.col("yy")).cast("double"))
        ).alias("hoover"),
    )


def atkinson_index(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Atkinson inequality index (epsilon = 1) of each key's daily
    volumes (Atkinson 1970):

        A = 1 - geomean(y) / mean(y)
          = 1 - exp(sum ln y / n) / (Y / n),

    the welfare-theoretic member of the inequality triple next to
    Gini and Hoover — epsilon = 1 weights transfers at the bottom of
    the distribution hardest.  Daily counts are >= 1 by construction
    (a day is present only if it had events), so ln is total; the
    ln sum folds in day order (sorted fold), everything else is
    exact integers with one float readout.

    Scale: one (key, day) rollup, one key aggregate with a
    retention-bounded fold.

    Output: key, n_days, atkinson.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    lg = daily.select(
        "key",
        "day",
        F.log(F.col("y").cast("double")).alias("ly"),
        "y",
    )
    agg = lg.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("yy"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "ly"))),
            F.lit(0.0),
            lambda acc, s: acc + s["ly"],
        ).alias("slog"),
    ).filter((F.col("n") >= 2) & (F.col("yy") > 0))
    nd = F.col("n").cast("double")
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        (
            F.lit(1.0)
            - F.exp(F.col("slog") / nd)
            / (F.col("yy").cast("double") / nd)
        ).alias("atkinson"),
    )


def hhi_daily(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily Herfindahl-Hirschman concentration of event-type shares:

        HHI = sum_j (c_j / C)^2 = sum_j c_j^2 / C^2,

    with the effective-type count 1/HHI (the "perplexity" of the
    type mix) — the concentration dual of :func:`type_entropy`'s
    diversity track (HHI is the Renyi-2 collision probability where
    entropy is Renyi-1).  ENTIRELY integer sufficient statistics
    (decimal quadratics for 1e12-row days), two float readouts.

    Scale: one (day, type) rollup, one day aggregate.

    Output: bucket_s, n_events, n_types, hhi, effective_types.
    """
    c = (
        df.select(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.col(key_col).alias("typ"),
        )
        .groupBy("day", "typ")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cd = F.col("c").cast("decimal(19,0)")
    agg = c.groupBy("day").agg(
        F.sum("c").alias("cc"),
        F.count(F.lit(1)).alias("k"),
        F.sum(cd * cd).alias("c2"),
    ).filter(F.col("cc") > 0)
    ccd = F.col("cc").cast("double")
    hhi = F.col("c2").cast("double") / (ccd * ccd)
    return agg.select(
        (F.col("day") * 86400).alias("bucket_s"),
        F.col("cc").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("n_types"),
        hhi.alias("hhi"),
        (F.lit(1.0) / hhi).alias("effective_types"),
    )


def rolling_beta(
    df: DataFrame,
    type_x: str = "click",
    type_y: str = "purchase",
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window OLS hedge ratio of two event types' daily
    counts (y on x over the last ``window_days`` days) — the local
    coupling track that :func:`crosscorr_pair`'s single global
    correlation hides:

        beta_d = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)   over [d-6, d].

    All five windowed sums are EXACT integers accumulated by a
    RANGE frame on the integer day axis (missing spine days simply
    contribute nothing — the frame is calendar-correct, not
    row-sliding); each beta is one shared float expression.

    Scale: one (day, type) rollup to the day spine, one ordered
    range window — retention-bounded rows.

    Output: bucket_s, n_win, beta.
    """
    byday = (
        df.filter(F.col(key_col).isin([type_x, type_y]))
        .select(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
            F.col(key_col).alias("typ"),
        )
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("typ") == type_x, 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("typ") == type_y, 1).otherwise(0)
            ).alias("y"),
        )
    )
    w = (
        Window.orderBy("day")
        .rangeBetween(-(window_days - 1), 0)
    )
    sums = byday.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / den.cast("double")
    )
    return sums.filter((F.col("n") >= 3) & (den > 0)).select(
        (F.col("day") * 86400).alias("bucket_s"),
        F.col("n").cast("long").alias("n_win"),
        beta.alias("beta"),
    )


def winsorized_mean(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tenths_clipped: int = 1,
) -> DataFrame:
    """10%-winsorized mean of each key's daily counts: the k = n div
    10 smallest days are pulled up to the (k+1)-th order statistic
    and the k largest pulled down to the (n-k)-th, then averaged —
    the location estimate that KEEPS the tail observations (at
    clamped weight) where :func:`trimmed_mean` deletes them.

        wmean = (sum_{k<rn<=n-k} y_(rn) + k*y_(k+1) + k*y_(n-k)) / n

    Order statistics are rank-selected ((y, day) tie-break), every
    sum is an exact BIGINT, one float division.

    Scale: one (key, day) rollup, one rank window, one key
    aggregate.

    Output: key, n_days, k_clipped, wins_mean.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            .cast("long")
            .alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("key").orderBy("y", "day")
    ck = Window.partitionBy("key")
    r = daily.select(
        "key",
        "y",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(ck).alias("n"),
    ).withColumn(
        "k", F.floor(F.col("n") * tenths_clipped / 10).cast("long")
    )
    agg = r.groupBy("key").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.sum(
            F.when(
                (F.col("rn") > F.col("k"))
                & (F.col("rn") <= F.col("n") - F.col("k")),
                F.col("y"),
            ).otherwise(0)
        ).alias("smid"),
        F.sum(
            F.when(F.col("rn") == F.col("k") + 1, F.col("y"))
            .otherwise(0)
        ).alias("vlo"),
        F.sum(
            F.when(F.col("rn") == F.col("n") - F.col("k"),
                   F.col("y")).otherwise(0)
        ).alias("vhi"),
    ).filter(F.col("n") >= 3)
    total = (
        F.col("smid")
        + F.col("k") * F.col("vlo")
        + F.col("k") * F.col("vhi")
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("k_clipped"),
        (total.cast("double") / F.col("n").cast("double")).alias(
            "wins_mean"
        ),
    )
