"""Mergeable frequency sketches for the retention cascade.

The tier cascade already carries three kinds of mergeable state:
algebraic sum/count rollups (plans/rollup.py), boundary-sample TWA and
M4 partials, and fixed-bin histogram quantile sketches
(plans/metrics.py).  This module adds two more classics: a
**count-min sketch** (Cormode & Muthukrishnan 2005) — the bounded-size
frequency summary behind heavy-hitter queries in Druid/Spark's own
``count_min_sketch`` aggregate — built here as a pure Catalyst plan so
the DuckDB oracle can replay every hash and counter exactly; and a
**mergeable HLL distinct cascade** over Spark's Apache DataSketches
aggregates (``hll_sketch_agg`` / ``hll_union_agg``), whose binary
sketches cascade hourly -> daily by register union.

Design for 10^12 turns:

* The sketch is LONG format ``(bucket_s, r, slot, cnt)`` — at most
  ``depth * width`` rows per time bucket regardless of item
  cardinality.  Building it is ONE hash aggregate over rows exploded
  ``depth`` ways, with map-side partial aggregation collapsing each
  mapper's output to the sketch size before the shuffle; raw items
  never travel.
* Merging to a coarser tier is a plain ``SUM`` group-by (count-min is
  linear), identical to the histogram sketch's cascade — so hourly
  sketches roll to daily without touching raw data, and the cascaded
  sketch is bit-equal to one built directly at the coarse tier.
* Point queries join a (usually tiny, broadcastable) probe-item dim
  against the sketch on ``(r, slot)`` and take ``min`` over the
  ``depth`` rows — the classic ``est >= true`` one-sided estimate with
  ``P[est > true + eps*N] <= (1/2)^depth`` at ``width = e/eps``.

Hashing is the repo's engine-independent md5 idiom
(pipeline/sampling.py): first 8 hex chars of ``md5(item ':' r)``
parsed base-16, mod ``width`` — replayed verbatim in DuckDB as
``('0x' || substr(md5(item || ':' || r), 1, 8))::BIGINT % width``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsaug_spark.plans.rollup import TIERS, bucket_epoch_s


def _slot(item: F.Column, r: F.Column, width: int) -> F.Column:
    """Hash row ``r``'s slot for ``item``: md5-prefix base-16 mod width
    (32-bit unsigned prefix, so the mod is on a non-negative value in
    every engine)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", item, r)), 1, 8), 16, 10
        ).cast("long")
        % F.lit(width)
    ).cast("int")


def cms_partial(
    df: DataFrame,
    tier: str = "1h",
    item_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """Count-min sketch per time bucket: ``(bucket_s, r, slot, cnt)``.

    One narrow projection explodes each row into ``depth`` (r, slot)
    increments, then a single hash aggregate counts per cell.  Output
    is at most ``depth * width`` rows per bucket.
    """
    item = F.col(item_col).cast("string")
    rs = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    return (
        df.select(item.alias("item"), bucket_epoch_s(ts_col, tier))
        .select("item", "bucket_s", rs)
        .select(
            "bucket_s",
            "r",
            _slot(F.col("item"), F.col("r"), width).alias("slot"),
        )
        .groupBy("bucket_s", "r", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(partial: DataFrame, to_tier: str) -> DataFrame:
    """Merge sketches to a coarser tier: elementwise counter sum.

    Count-min is linear, so the cascaded sketch equals the one built
    directly at the coarse tier — the property the oracle checks by
    replaying the direct build.
    """
    sec = TIERS[to_tier][1]
    coarse = F.floor(F.col("bucket_s") / F.lit(sec)).cast(
        "long"
    ) * F.lit(sec)
    return (
        partial.groupBy(coarse.alias("bucket_s"), "r", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
    item_col: str = "item",
) -> DataFrame:
    """Point-query frequency estimates: ``(item, bucket_s, est)``.

    The probe dim is hashed the same way the sketch was built,
    broadcast (it is the small side by construction — a candidate list,
    not the corpus), crossed with the sketch's buckets, and left-joined
    so an absent cell reads as 0; ``est = min`` over the ``depth``
    rows.  ``est >= true`` always; collisions only inflate it.
    """
    item = F.col(item_col).cast("string")
    rs = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    probe = (
        probes.select(item.alias("item"))
        .distinct()
        .select("item", rs)
        .select(
            "item",
            "r",
            _slot(F.col("item"), F.col("r"), width).alias("slot"),
        )
    )
    buckets = sketch.select("bucket_s").distinct()
    grid = buckets.crossJoin(F.broadcast(probe))
    return (
        grid.join(sketch, ["bucket_s", "r", "slot"], "left")
        .withColumn(
            "cell", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
        )
        .groupBy("item", "bucket_s")
        .agg(F.min("cell").alias("est"))
    )


def hll_partial(
    df: DataFrame,
    tier: str = "1h",
    item_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable HLL distinct sketch per time bucket: ``(bucket_s,
    sk)`` with ``sk`` an Apache DataSketches HllSketch binary
    (Spark's ``hll_sketch_agg``) — KB-size state per bucket, map-side
    combinable, raw ids never shuffled."""
    return (
        df.select(
            F.col(item_col).cast("string").alias("item"),
            bucket_epoch_s(ts_col, tier),
        )
        .groupBy("bucket_s")
        .agg(F.hll_sketch_agg("item", F.lit(lg_k)).alias("sk"))
    )


def hll_merge(partial: DataFrame, to_tier: str) -> DataFrame:
    """Merge HLL sketches to a coarser tier (``hll_union_agg``).

    HLL registers take elementwise max under union, so the cascaded
    daily sketch estimates the same distinct count as one built
    directly at the daily tier — the property that lets the retention
    cascade answer "distinct users per day" from hourly state without
    re-reading raw data.
    """
    sec = TIERS[to_tier][1]
    coarse = F.floor(F.col("bucket_s") / F.lit(sec)).cast(
        "long"
    ) * F.lit(sec)
    return partial.groupBy(coarse.alias("bucket_s")).agg(
        F.hll_union_agg("sk").alias("sk")
    )


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """Materialize estimates: ``(bucket_s, approx_distinct)``."""
    return sketch.select(
        "bucket_s",
        F.hll_sketch_estimate("sk").alias("approx_distinct"),
    )


# --- engine-independent md5-register HLL -------------------------------
#
# The DataSketches cascade above is the production path, but its binary
# sketch is engine-specific, so the driver can only rows-check it.  The
# functions below are the oracled twin: classic HLL registers built from
# the repo's md5 idiom, entirely in Catalyst expressions DuckDB replays
# verbatim — register index = first 3 md5 hex chars (p=12, m=4096),
# rho = 1-based position of the first set bit in the next 52 hash bits.
# Registers are exact integers, merging is elementwise MAX (associative,
# so hourly->daily max-merge is bit-equal to a direct daily build), and
# the raw estimator divides a float constant by an EXACT integer sum
# (terms scaled by 2^53), so the result is order-independent — no
# float-accumulation flakes in the value hash.

_HLL_P = 12
_HLL_M = 1 << _HLL_P  # 4096 registers; rel. error ~1.04/sqrt(m) = 1.6%
_HLL_SCALE = 2 ** 53  # 2^(-rho) terms scaled to exact integers
# alpha_m * m^2 * 2^53 with alpha_m = 0.7213 / (1 + 1.079/m)
_HLL_NUMER = 1.0897106820939319e23


def hll_md5_reg_rho(item: F.Column) -> "tuple[F.Column, F.Column]":
    """(register index, rank) columns for one item: reg = first 3 md5
    hex chars (12 bits), rho = 1-based first-set-bit position of the
    next 52 bits.  Shared by the batch build and the streaming twin."""
    h = F.md5(item.cast("string"))
    v = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(53))
        .otherwise(F.instr(F.lpad(F.bin(v), 52, "0"), "1"))
        .cast("int")
    )
    reg = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    return reg, rho


def hll_md5_registers(
    df: DataFrame,
    tier: str = "1h",
    item_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """HLL registers per time bucket: ``(bucket_s, reg, rho)``.

    One narrow projection + one hash aggregate (map-side combinable:
    MAX) — at most ``m`` rows per bucket regardless of item
    cardinality, raw ids never shuffled.  Same scale contract as
    ``hll_partial``."""
    reg, rho = hll_md5_reg_rho(F.col(item_col))
    return (
        df.select(
            bucket_epoch_s(ts_col, tier),
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("bucket_s", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_md5_merge(regs: DataFrame, to_tier: str) -> DataFrame:
    """Max-merge registers to a coarser tier — the HLL union."""
    sec = TIERS[to_tier][1]
    coarse = F.floor(F.col("bucket_s") / F.lit(sec)).cast(
        "long"
    ) * F.lit(sec)
    return regs.groupBy(coarse.alias("bucket_s"), "reg").agg(
        F.max("rho").alias("rho")
    )


def hll_md5_estimate(regs: DataFrame) -> DataFrame:
    """HLL estimate per bucket: ``(bucket_s, regs_used,
    est_distinct)``.

    ``sum(2^-rho)`` is computed as an exact DECIMAL sum of
    ``2^(53-rho)`` integers (absent registers contribute ``2^53``), so
    the raw estimate is one float division of exact integers —
    deterministic under any aggregation order.  Small-range regime
    uses the standard LinearCounting branch ``m * ln(m / empty)``
    (Flajolet et al. 2007) when ``raw <= 2.5m`` and empty registers
    exist; the branch condition itself is a function of exact
    integers, so both engines take the same branch, and ``ln`` of an
    identical argument agrees far inside the oracle's 9-significant-
    digit hash tolerance."""
    term = F.expr("CAST(shiftleft(1L, 53 - rho) AS DECIMAL(38,0))")
    used = F.count("*")
    empty_regs = (F.lit(_HLL_M) - used).cast("long")
    empty = empty_regs.cast("decimal(38,0)") * F.lit(
        _HLL_SCALE
    ).cast("decimal(38,0)")
    raw = F.lit(_HLL_NUMER) / (F.sum(term) + empty).cast("double")
    lc = F.lit(float(_HLL_M)) * F.log(
        F.lit(float(_HLL_M)) / empty_regs.cast("double")
    )
    est = F.when(
        (empty_regs > 0) & (raw <= F.lit(2.5 * _HLL_M)), lc
    ).otherwise(raw)
    return regs.groupBy("bucket_s").agg(
        used.cast("long").alias("regs_used"),
        est.alias("est_distinct"),
    )


# --- DDSketch log-bucket quantile cascade ------------------------------
#
# The fixed-bin histogram sketch (plans/metrics.py) answers percentile
# cascades with ABSOLUTE error one bin width — the right tool when the
# value range is known.  DDSketch (Masson, Rim & Lee, VLDB 2019; the
# quantile summary behind Datadog's metrics store) gives a RELATIVE
# error guarantee instead: bucket i holds values in
# (gamma^(i-1), gamma^i] with gamma = (1+alpha)/(1-alpha), so the
# estimate 2*gamma^i/(gamma+1) (the bucket's harmonic midpoint) is
# within alpha of the true quantile at EVERY magnitude — no range
# sizing, and the index space is logarithmic (values spanning 6 decades
# at alpha=0.01 need only ~700 buckets).
#
# Engine form mirrors the histogram sketch: LONG format
# ``(key, bucket_s, idx, cnt)`` built by one narrow projection + one
# map-side-combinable hash aggregate; merging to a coarser tier is a
# plain SUM (DDSketch is linear), so the hourly->daily cascade is
# bit-equal to a direct daily build; per (key, bucket) state is bounded
# by the number of DISTINCT log-buckets, not the sample count.
#
# Oracle determinism: values are integerized first (cents =
# round(value*100), exact for the 2-decimal event values), so
# ``ceil(ln(cents)/ln(gamma))`` is evaluated on exact integer
# arguments; a 1-ulp ``ln`` disagreement between engines could only
# flip the ceil if ln(c)/ln(gamma) sat within ~1e-15 of an integer,
# which for integer c and irrational gamma does not occur in the data
# (and the divisor ln(gamma) is passed as an identical Python float
# literal to both engines).

import math

DD_ALPHA = 0.01
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
DD_LNG = math.log(DD_GAMMA)


def dd_partial(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """DDSketch per (key, time bucket): ``(key, bucket_s, idx, cnt)``.

    ``idx = ceil(ln(cents)/ln(gamma))`` over the integerized positive
    value (cents >= 1 → idx >= 0); non-positive values land in the
    classic DDSketch ZERO bucket, encoded as ``idx = -1`` so it sorts
    below every log bucket and the quantile walk naturally counts it
    first (estimate 0.0).
    """
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    idx = F.when(cents <= 0, F.lit(-1)).otherwise(
        F.ceil(F.log(cents.cast("double")) / F.lit(DD_LNG))
    ).cast("int")
    return (
        df.select(
            F.col(key_col).alias("key"),
            bucket_epoch_s(ts_col, tier),
            idx.alias("idx"),
        )
        .groupBy("key", "bucket_s", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_merge(partial: DataFrame, to_tier: str) -> DataFrame:
    """Merge DDSketches to a coarser tier: elementwise count sum —
    bit-equal to building the coarse sketch directly, since bucketing
    is per-sample."""
    sec = TIERS[to_tier][1]
    coarse = F.floor(F.col("bucket_s") / F.lit(sec)).cast(
        "long"
    ) * F.lit(sec)
    return (
        partial.groupBy("key", coarse.alias("bucket_s"), "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def dd_quantile(sketch: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from a DDSketch: ``(key, bucket_s, q, est)``.

    For each q the estimate lives in the first log-bucket whose
    cumulative count reaches ``q * total``; the returned value is the
    bucket's harmonic midpoint ``2*gamma^idx/(gamma+1)`` de-integerized
    back to value units — within ``alpha`` relative error of the exact
    quantile (gated in tests).  Counts are exact integers and the
    estimator is one float expression of the selected integer idx, so
    the DuckDB oracle compares raw doubles.
    """
    from pyspark.sql.window import Window

    win = Window.partitionBy("key", "bucket_s").orderBy("idx")
    tot = Window.partitionBy("key", "bucket_s")
    h = sketch.select(
        "key",
        "bucket_s",
        "idx",
        F.sum("cnt").over(win).alias("cum"),
        F.sum("cnt").over(tot).alias("total"),
    )
    qdf = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    sel = (
        h.select("*", qdf)
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy("key", "bucket_s", "q")
        .agg(F.min("idx").alias("idx"))
    )
    est = F.when(F.col("idx") < 0, F.lit(0.0)).otherwise(
        F.lit(2.0)
        * F.pow(F.lit(DD_GAMMA), F.col("idx"))
        / F.lit(DD_GAMMA + 1.0)
        / F.lit(100.0)
    )
    return sel.select("key", "bucket_s", "q", est.alias("est"))


def bitmap_distinct(
    df: DataFrame,
    width: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT distinct-count per bucket via bitmap aggregation — the
    ClickHouse/Druid ``groupBitmap`` pattern, the exact complement to
    the HLL entries: each integer id sets one bit in a 64-bit word
    keyed by ``id DIV 64``, words merge with ``bit_or`` (map-side
    combinable, associative), and the count is ``sum(bit_count(word))``.

    Why it scales: the shuffle payload per bucket is bounded by the
    OCCUPIED id-space / 64 (dense ids: 1 word per 64 users), not by
    event volume, and — unlike COUNT(DISTINCT) — the partial state is
    mergeable, so the same words roll up to coarser tiers or wider
    scopes by further bit_or without touching raw ids again.  All
    integer ops; results are exactly COUNT(DISTINCT).
    """
    secs = {"1m": 60, "1h": 3600, "1d": 86400}[width]
    base = df.select(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs)
        .cast("long")
        .alias("bucket_s"),
        F.col(key_col).alias("id"),
    )
    words = (
        base.select(
            "bucket_s",
            # floor division via pmod so NEGATIVE ids land in their
            # own words (id % 64 is negative for id < 0, which made
            # shiftleft undefined and truncating id/64 silently merge
            # words -64..63 into word 0); id - pmod(id,64) is an
            # exact multiple of 64, so `div` here IS floor division
            # and everything stays int64 (no double rounding above
            # 2^53).
            F.expr("(id - pmod(id, 64)) div 64").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(id, 64) AS INT))"
            ).alias("bit"),
        )
        .groupBy("bucket_s", "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    return (
        words.groupBy("bucket_s")
        .agg(
            F.sum(F.bit_count("word")).cast("long").alias("n_distinct")
        )
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch — order-statistics distinct counting
# ---------------------------------------------------------------------------

KMV_SPACE = 1 << 60  # md5 15-hex-char prefix: hashes uniform in [0, 2^60)


def kmv_hash(item: F.Column) -> F.Column:
    """60-bit uniform hash: first 15 hex chars of md5, base-16 — the
    engine-independent idiom (non-negative, fits int64, replayed in
    DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_partial(
    df: DataFrame,
    tier: str = "1d",
    item_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 64,
) -> DataFrame:
    """KMV (theta) sketch per time bucket: the ``k`` smallest DISTINCT
    60-bit item hashes, long format ``(bucket_s, rn, hv)`` — the
    order-statistics distinct sketch (Bar-Yossef et al. 2002; the
    DataSketches theta family).  Complements the HLL entries with the
    one thing HLL cannot do: set INTERSECTION estimates
    (``kmv_intersect``), because the retained hashes form a uniform
    sample of the hash space below a known theta.

    Scale shape: a salted two-phase prune — phase 1 takes the ``k``
    smallest distinct hashes per (bucket, ``hv % 64`` salt) with a
    ``dense_rank`` window (64-way parallel, duplicate-safe: dense_rank
    keeps all copies of the k smallest distinct values), so at most
    ``64 * k`` candidate rows per bucket survive to the global phase —
    raw cardinality never reaches the final per-bucket sort.  Phase 2
    dedups and re-ranks the bounded candidates.  Merging sketches to a
    coarser tier is union + re-rank (``kmv_merge``) — the sketch is
    mergeable by construction.
    """
    base = df.select(
        bucket_epoch_s(ts_col, tier),
        kmv_hash(F.col(item_col)).alias("hv"),
    )
    local_w = Window.partitionBy(
        "bucket_s", F.col("hv") % 64
    ).orderBy("hv")
    cand = (
        base.withColumn("dr", F.dense_rank().over(local_w))
        .filter(F.col("dr") <= k)
        .select("bucket_s", "hv")
        .distinct()
    )
    global_w = Window.partitionBy("bucket_s").orderBy("hv")
    return (
        cand.withColumn("rn", F.row_number().over(global_w))
        .filter(F.col("rn") <= k)
        .select("bucket_s", F.col("rn").cast("int").alias("rn"), "hv")
    )


def kmv_merge(partial: DataFrame, to_tier: str, k: int = 64) -> DataFrame:
    """Union KMV sketches to a coarser tier: pool the retained hashes,
    dedup, keep the ``k`` smallest per coarse bucket.  Exactly the
    sketch that would have been built directly at the coarse tier —
    the same every-partial-is-a-candidate property as the TWA/M4
    boundary samples in the cascade."""
    sec = TIERS[to_tier][1]
    coarse = (
        F.floor(F.col("bucket_s") / F.lit(sec)).cast("long") * F.lit(sec)
    ).alias("bucket_s")
    pooled = partial.select(coarse, "hv").distinct()
    w = Window.partitionBy("bucket_s").orderBy("hv")
    return (
        pooled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("bucket_s", F.col("rn").cast("int").alias("rn"), "hv")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct estimate per bucket: ``(bucket_s, n_kept, theta_hv,
    est_distinct)``.

    Unsaturated sketch (fewer than ``k`` distinct hashes): the count
    is EXACT.  Saturated: the classic unbiased KMV estimator
    ``(k-1) / normalized kth hash`` — here one double division of
    exact integers (``(k-1) * 2^60`` is an exact double: k-1 fits the
    mantissa), so the estimate is bit-identical under any execution
    order."""
    num = float(k - 1) * float(KMV_SPACE)
    return sketch.groupBy("bucket_s").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("hv").alias("theta_hv"),
        F.when(
            F.count(F.lit(1)) < k,
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(num) / F.max("hv").cast("double"))
        .alias("est_distinct"),
    )


def kmv_intersect(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-sketch intersection estimate per bucket — the estimator
    HLL structurally cannot provide.

    theta = min(theta_a, theta_b), where an UNSATURATED side's theta
    is the full hash space (its sketch is its exact set).  Hashes
    common to both sketches and below theta are a uniform sample of
    the intersection at sampling rate theta / 2^60, so
    ``est = n_common * 2^60 / theta``; all inputs to the final
    division are exact integers.  Columns: ``(bucket_s, n_common,
    theta_hv, est_common)``."""

    def _theta(s: DataFrame, side: str) -> DataFrame:
        return s.groupBy("bucket_s").agg(
            F.when(F.count(F.lit(1)) < k, F.lit(KMV_SPACE))
            .otherwise(F.max("hv"))
            .alias(f"theta_{side}")
        )
    thetas = _theta(a, "a").join(_theta(b, "b"), "bucket_s").select(
        "bucket_s",
        F.least("theta_a", "theta_b").alias("theta_hv"),
    )
    common = (
        a.select("bucket_s", "hv")
        .join(b.select("bucket_s", "hv"), ["bucket_s", "hv"])
        .join(thetas, "bucket_s")
        .filter(F.col("hv") < F.col("theta_hv"))
        .groupBy("bucket_s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        thetas.join(common, "bucket_s", "left")
        .select(
            "bucket_s",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            "theta_hv",
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                * F.lit(float(KMV_SPACE))
                / F.col("theta_hv").cast("double")
            ).alias("est_common"),
        )
    )


def kmv_anotb(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-sketch A-NOT-B estimate per bucket (the DataSketches
    set-difference operation), completing the KMV set algebra
    (:func:`kmv_estimate` union/cardinality, :func:`kmv_intersect`).

    theta = min(theta_a, theta_b) as in intersection; A's retained
    hashes below theta are a uniform theta/2^60-rate sample of A, and
    membership in B is decidable from B's sketch for every hash below
    theta (B's sketch IS B's hash sample below theta_b >= theta), so
    ``est = n_a_only * 2^60 / theta`` with one LEFT ANTI join and one
    exact-integer division.  Columns: ``(bucket_s, n_a_only,
    theta_hv, est_diff)``."""

    def _theta(s: DataFrame, side: str) -> DataFrame:
        return s.groupBy("bucket_s").agg(
            F.when(F.count(F.lit(1)) < k, F.lit(KMV_SPACE))
            .otherwise(F.max("hv"))
            .alias(f"theta_{side}")
        )

    thetas = _theta(a, "a").join(_theta(b, "b"), "bucket_s").select(
        "bucket_s",
        F.least("theta_a", "theta_b").alias("theta_hv"),
    )
    only = (
        a.select("bucket_s", "hv")
        .join(thetas, "bucket_s")
        .filter(F.col("hv") < F.col("theta_hv"))
        .join(b.select("bucket_s", "hv"), ["bucket_s", "hv"],
              "left_anti")
        .groupBy("bucket_s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_a_only"))
    )
    return (
        thetas.join(only, "bucket_s", "left")
        .select(
            "bucket_s",
            F.coalesce("n_a_only", F.lit(0)).alias("n_a_only"),
            "theta_hv",
            (
                F.coalesce("n_a_only", F.lit(0)).cast("double")
                * F.lit(float(KMV_SPACE))
                / F.col("theta_hv").cast("double")
            ).alias("est_diff"),
        )
    )


def cs_sign(item: F.Column, r: F.Column) -> F.Column:
    """CountSketch's +/-1 sign for ``item`` in row ``r``: parity of an
    md5 prefix drawn with a '#' separator so it is independent of the
    ':'-separated slot hash (:func:`_slot`) — both replay verbatim in
    any engine with md5."""
    return (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", item, r)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 2
        )
        * 2
        - 1
    ).cast("long")


def count_sketch_partial(
    df: DataFrame,
    tier: str = "1h",
    item_col: str = "user_id",
    depth: int = 5,
    width: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """CountSketch per time bucket (Charikar-Chen-Farach-Colton 2002):
    ``(bucket_s, r, slot, cnt)`` where ``cnt`` is the SIGNED counter
    sum — the unbiased cousin of count-min (:func:`cms_partial`):
    collisions cancel in expectation instead of always inflating, and
    the median-of-rows estimator is two-sided.  Linear like CMS, so
    :func:`cms_merge` merges it and cascade == direct exactly.
    """
    item = F.col(item_col).cast("string")
    rs = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    return (
        df.select(item.alias("item"), bucket_epoch_s(ts_col, tier))
        .select("item", "bucket_s", rs)
        .select(
            "bucket_s",
            "r",
            _slot(F.col("item"), F.col("r"), width).alias("slot"),
            cs_sign(F.col("item"), F.col("r")).alias("sgn"),
        )
        .groupBy("bucket_s", "r", "slot")
        .agg(F.sum("sgn").cast("long").alias("cnt"))
    )


def count_sketch_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = 5,
    width: int = 256,
    item_col: str = "item",
) -> DataFrame:
    """Point-query estimates ``(item, bucket_s, est)`` from a
    CountSketch: ``est = median_r(sign_r(item) * C[r, slot_r(item)])``
    — with odd ``depth`` the median is the rank-(depth//2 + 1) element
    under the total order (value, r), an exact integer selection both
    engines replay identically (no averaging, no tolerance).  Absent
    cells read 0 via the left join, as in :func:`cms_query`.
    """
    item = F.col(item_col).cast("string")
    rs = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    probe = (
        probes.select(item.alias("item"))
        .distinct()
        .select("item", rs)
        .select(
            "item",
            "r",
            _slot(F.col("item"), F.col("r"), width).alias("slot"),
            cs_sign(F.col("item"), F.col("r")).alias("sgn"),
        )
    )
    buckets = sketch.select("bucket_s").distinct()
    grid = buckets.crossJoin(F.broadcast(probe))
    per_r = grid.join(sketch, ["bucket_s", "r", "slot"], "left").select(
        "item",
        "bucket_s",
        "r",
        (
            F.col("sgn")
            * F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
        ).alias("est_r"),
    )
    w = Window.partitionBy("item", "bucket_s").orderBy("est_r", "r")
    return (
        per_r.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == F.lit(depth // 2 + 1))
        .select("item", "bucket_s", F.col("est_r").cast("long").alias("est"))
    )
