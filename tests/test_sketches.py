"""HLL sketch distinct: estimate accuracy vs exact, and
partitioning-independence of the merged registers."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_within_2pct_of_exact(spark):
    import __spark_entry__ as em

    approx = {
        r.day: r.approx_users
        for r in em.q_sketch_distinct_daily(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r.day: r.n
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for day, n in exact.items():
        assert abs(approx[day] - n) / n <= 0.02, (day, approx[day], n)


def test_sketch_partitioning_independent(spark):
    """HLL register merge is commutative: any partitioning yields the
    identical estimate (the property that lets the sketch aggregate
    map-side at 100 TB)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def est(df):
        return {
            r.day: r.a
            for r in df.groupBy(F.to_date("ts").alias("day"))
            .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
            .collect()
        }

    assert est(ev) == est(ev.repartition(29)) == est(ev.repartition(3))


# ---- count-min sketch (plans/sketches.py) ----


def _cms_daily(spark):
    from tsaug_spark.plans.sketches import cms_merge, cms_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev, cms_merge(cms_partial(ev, "1h", item_col="user_id"), "1d")


def test_cms_estimate_one_sided_and_tight(spark):
    """est >= exact for EVERY (user, day) — the count-min guarantee —
    and with 150 items in a 4x256 sketch, nearly all estimates are
    exact (collisions in all 4 rows are rare)."""
    from tsaug_spark.plans.sketches import cms_query

    ev, daily = _cms_daily(spark)
    probes = ev.select(F.col("user_id").cast("string").alias("item"))
    est = {
        (r.item, r.bucket_s): r.est
        for r in cms_query(daily, probes).collect()
    }
    exact = {
        (str(r.user_id), r.bucket_s): r.n
        for r in ev.groupBy(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(exact) <= set(est)
    overs = []
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
        overs.append(est[k] - n)
    # at this occupancy the sketch should be exact for >=90% of cells
    assert sum(1 for o in overs if o == 0) / len(overs) >= 0.9
    # absent (user, day) cells estimate 0 unless all 4 rows collide
    absent = [v for k, v in est.items() if k not in exact]
    assert absent and sum(1 for v in absent if v == 0) / len(absent) >= 0.9


def test_cms_cascade_equals_direct_build(spark):
    """CMS is linear: hourly sketches summed to daily == the sketch
    built directly at the daily tier, counter for counter — the
    property that lets sketches cascade through retention tiers
    without re-reading raw data."""
    from tsaug_spark.plans.sketches import cms_partial

    ev, daily = _cms_daily(spark)
    direct = cms_partial(ev, "1d", item_col="user_id")
    key = lambda r: (r.bucket_s, r.r, r.slot)  # noqa: E731
    assert {key(r): r.cnt for r in daily.collect()} == {
        key(r): r.cnt for r in direct.collect()
    }


def test_cms_size_bounded_and_partitioning_independent(spark):
    """Per-bucket sketch size is capped at depth*width rows no matter
    the item cardinality, and the counters are exact integer sums —
    identical under any input partitioning (map-side combinable)."""
    from tsaug_spark.plans.sketches import cms_partial

    ev, daily = _cms_daily(spark)
    per_bucket = daily.groupBy("bucket_s").count().collect()
    assert per_bucket and all(r["count"] <= 4 * 256 for r in per_bucket)
    rep = cms_partial(ev.repartition(13), "1d", item_col="user_id")
    direct = cms_partial(ev, "1d", item_col="user_id")
    key = lambda r: (r.bucket_s, r.r, r.slot)  # noqa: E731
    assert {key(r): r.cnt for r in rep.collect()} == {
        key(r): r.cnt for r in direct.collect()
    }


def test_heavy_hitters_equals_exact_having(spark):
    """The sketch screen has no false negatives, so shortlist+verify
    returns EXACTLY the plain GROUP BY / HAVING heavy-hitter set."""
    import __spark_entry__ as em

    got = {
        (r.user_id, r.bucket_s): r.n
        for r in em.q_heavy_hitters_1d(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        (r.user_id, r.bucket_s): r.n
        for r in ev.groupBy(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 6)
        .collect()
    }
    assert got == exact and exact  # non-trivial fixture


def test_heavy_hitter_shortlist_is_superset(spark):
    """est >= exact cell-for-cell, so every true heavy cell survives
    the screen — the property the exact-verify pass relies on."""
    from tsaug_spark.plans.sketches import cms_query

    ev, daily = _cms_daily(spark)
    probes = ev.select(F.col("user_id").cast("string").alias("item"))
    screened = {
        (r.item, r.bucket_s)
        for r in cms_query(daily, probes)
        .filter(F.col("est") >= 6)
        .collect()
    }
    heavy = {
        (str(r.user_id), r.bucket_s)
        for r in ev.groupBy(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 6)
        .collect()
    }
    assert heavy <= screened and heavy


def test_stream_cms_equals_batch_partial(spark):
    """Streaming==batch for the sketch: the availableNow-backfilled
    watermarked window agg equals cms_partial counter for counter
    (counts are algebraic; watermark only bounds state eviction)."""
    from tsaug_spark.plans.sketches import cms_partial
    from tsaug_spark.streaming.stream_rollup import run_stream_cms_once

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = cms_partial(ev, "1h", item_col="user_id")
    streamed = run_stream_cms_once(
        spark, f"{SF_DIR}/events.parquet", tier="1h",
        sink_table="t_stream_cms",
    ).select(
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        "r", "slot", "cnt",
    )
    key = lambda r: (r.bucket_s, r.r, r.slot)  # noqa: E731
    assert {key(r): r.cnt for r in streamed.collect()} == {
        key(r): r.cnt for r in batch.collect()
    }


# ---- mergeable HLL distinct cascade (plans/sketches.py) ----


def test_hll_cascade_equals_direct_estimates(spark):
    """HLL registers take elementwise max under union: hourly sketches
    unioned to daily estimate the same distinct count as a sketch
    built directly at the daily tier."""
    from tsaug_spark.plans.sketches import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cascaded = {
        r.bucket_s: r.approx_distinct
        for r in hll_estimate(
            hll_merge(hll_partial(ev, "1h"), "1d")
        ).collect()
    }
    direct = {
        r.bucket_s: r.approx_distinct
        for r in hll_estimate(hll_partial(ev, "1d")).collect()
    }
    assert cascaded == direct and cascaded


def test_hll_cascade_within_2pct_of_exact(spark):
    from pyspark.sql import functions as F2

    from tsaug_spark.plans.sketches import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    est = {
        r.bucket_s: r.approx_distinct
        for r in hll_estimate(
            hll_merge(hll_partial(ev, "1h"), "1d")
        ).collect()
    }
    exact = {
        r.bucket_s: r.n
        for r in ev.groupBy(
            (F2.floor(F2.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s")
        )
        .agg(F2.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for day, n in exact.items():
        assert abs(est[day] - n) / n <= 0.02, (day, est[day], n)


def test_hll_md5_cascade_bit_equal_to_direct(spark):
    """The oracled md5-register twin: hourly registers max-merged to
    daily are BIT-equal to registers built directly at the daily tier
    (max is associative), and so are the estimates."""
    from tsaug_spark.plans.sketches import (
        hll_md5_estimate,
        hll_md5_merge,
        hll_md5_registers,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cascaded = hll_md5_merge(hll_md5_registers(ev, "1h"), "1d")
    direct = hll_md5_registers(ev, "1d")
    as_map = lambda df: {
        (r.bucket_s, r.reg): r.rho for r in df.collect()
    }
    assert as_map(cascaded) == as_map(direct) and cascaded.count()
    est = lambda df: {
        r.bucket_s: (r.regs_used, r.est_distinct)
        for r in hll_md5_estimate(df).collect()
    }
    assert est(cascaded) == est(direct)


def test_hll_md5_estimate_within_5pct_of_exact(spark):
    """Raw estimator (no bias corrections) at m=4096 on ~100-500
    distinct/day: relative error well inside 5%."""
    from tsaug_spark.plans.sketches import (
        hll_md5_estimate,
        hll_md5_merge,
        hll_md5_registers,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    est = {
        r.bucket_s: r.est_distinct
        for r in hll_md5_estimate(
            hll_md5_merge(hll_md5_registers(ev, "1h"), "1d")
        ).collect()
    }
    exact = {
        r.bucket_s: r.n
        for r in ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for day, n in exact.items():
        assert abs(est[day] - n) / n <= 0.05, (day, est[day], n)


def test_hll_md5_registers_match_numpy_reference(spark):
    """Registers agree with a from-scratch NumPy HLL on the same md5
    bit layout — pins the Catalyst expressions to the algorithm, not
    just to the DuckDB replay of the same expressions."""
    import hashlib

    from tsaug_spark.plans.sketches import hll_md5_registers

    items = [str(i) for i in range(3000)]
    df = spark.createDataFrame(
        [(it, "2024-01-01 00:00:00") for it in items],
        "user_id string, ts string",
    ).select("user_id", F.col("ts").cast("timestamp"))
    got = {
        (r.reg, r.rho)
        for r in hll_md5_registers(df, "1d").collect()
    }
    regs: dict = {}
    for it in items:
        h = hashlib.md5(it.encode()).hexdigest()
        reg = int(h[:3], 16)
        v = int(h[3:16], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == set(regs.items())


def test_stream_hll_equals_batch_registers(spark):
    """Streaming==batch for the md5-register HLL: the availableNow-
    backfilled watermarked window MAX equals hll_md5_registers
    register for register, and so do the estimates."""
    from tsaug_spark.plans.sketches import (
        hll_md5_estimate,
        hll_md5_registers,
    )
    from tsaug_spark.streaming.stream_rollup import (
        run_stream_hll_once,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = hll_md5_registers(ev, "1h")
    streamed = run_stream_hll_once(
        spark, f"{SF_DIR}/events.parquet", tier="1h",
        sink_table="t_stream_hll",
    ).select(
        F.unix_timestamp("bucket_ts").alias("bucket_s"), "reg", "rho"
    )
    as_map = lambda df: {  # noqa: E731
        (r.bucket_s, r.reg): r.rho for r in df.collect()
    }
    assert as_map(streamed) == as_map(batch)
    est = lambda df: {  # noqa: E731
        r.bucket_s: (r.regs_used, r.est_distinct)
        for r in hll_md5_estimate(df).collect()
    }
    assert est(streamed) == est(batch)


# ---- DDSketch log-bucket quantile cascade (plans/sketches.py) ----


def test_dd_quantile_within_alpha_relative(spark):
    """The DDSketch guarantee: every (user, day, q) estimate is within
    alpha = 1% RELATIVE error of the exact quantile (the ceil(q*n)-th
    smallest sample — the same rank the sketch's cum >= q*total walk
    selects), at every magnitude."""
    import math

    from tsaug_spark.plans.sketches import (
        DD_ALPHA,
        dd_partial,
        dd_quantile,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    est = {
        (r.key, r.bucket_s, r.q): r.est
        for r in dd_quantile(dd_partial(ev, "1d"), [0.5, 0.95]).collect()
    }
    rows = ev.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
        .cast("long")
        .alias("bucket_s"),
        "value",
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r.user_id, r.bucket_s), []).append(r.value)
    assert len(est) == 2 * len(groups)
    for (uid, b), vals in groups.items():
        vals.sort()
        for q in (0.5, 0.95):
            exact = vals[math.ceil(q * len(vals)) - 1]
            got = est[(uid, b, q)]
            assert abs(got - exact) <= DD_ALPHA * exact + 1e-12, (
                uid, b, q, got, exact,
            )


def test_dd_cascade_bit_equal_to_direct(spark):
    """DDSketch is linear: hourly sketches summed to daily are
    bit-equal to the direct daily build (bucketing is per-sample)."""
    from tsaug_spark.plans.sketches import dd_merge, dd_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    direct = {
        (r.key, r.bucket_s, r.idx): r.cnt
        for r in dd_partial(ev, "1d").collect()
    }
    cascaded = {
        (r.key, r.bucket_s, r.idx): r.cnt
        for r in dd_merge(dd_partial(ev, "1h"), "1d").collect()
    }
    assert direct == cascaded


def test_dd_state_bounded_and_partition_independent(spark):
    """Per (key, bucket) state is the number of distinct log-buckets —
    bounded by ~ln(max/min)/ln(gamma) (~540 for cents in [1, 5e4])
    regardless of sample count — and the sketch is identical under any
    input partitioning (hash-agg of exact integers)."""
    import math

    from tsaug_spark.plans.sketches import DD_LNG, dd_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sk = dd_partial(ev, "1d").collect()
    per_group: dict = {}
    for r in sk:
        per_group[(r.key, r.bucket_s)] = per_group.get(
            (r.key, r.bucket_s), 0
        ) + 1
    bound = math.ceil(math.log(50000) / DD_LNG) + 2
    assert max(per_group.values()) <= bound
    again = dd_partial(ev.repartition(17), "1d").collect()
    assert sorted(map(tuple, sk)) == sorted(map(tuple, again))


def test_stream_dd_equals_batch_partial(spark):
    """Streaming==batch for the DDSketch: the availableNow-backfilled
    watermarked window agg equals dd_partial cell for cell (counts are
    algebraic; watermark only bounds state eviction)."""
    from tsaug_spark.plans.sketches import dd_partial
    from tsaug_spark.streaming.stream_rollup import run_stream_dd_once

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = dd_partial(ev, "1h")
    streamed = run_stream_dd_once(
        spark, f"{SF_DIR}/events.parquet", tier="1h",
        sink_table="t_stream_dd",
    ).select(
        "key",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        "idx", "cnt",
    )
    key = lambda r: (r.key, r.bucket_s, r.idx)  # noqa: E731
    assert {key(r): r.cnt for r in streamed.collect()} == {
        key(r): r.cnt for r in batch.collect()
    }


def test_stream_sliding_hll_covers_two_windows(spark):
    """Sliding (2h, 1h) streaming registers: each event lands in
    exactly the two covering windows, and every window's registers
    equal the batch build over that window's row set (estimate within
    5% on full-occupancy windows)."""
    from tsaug_spark.plans.sketches import hll_md5_estimate
    from tsaug_spark.streaming.stream_rollup import (
        run_stream_sliding_hll_once,
    )

    streamed = run_stream_sliding_hll_once(
        spark, f"{SF_DIR}/events.parquet",
        sink_table="t_stream_shll",
    ).select(
        F.unix_timestamp("bucket_ts").alias("bucket_s"), "reg", "rho"
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").cast("string").alias("item"),
        F.unix_timestamp("ts").alias("t"),
    )
    ests = {
        r.bucket_s: r.est_distinct
        for r in hll_md5_estimate(streamed).collect()
    }
    import random

    for ws in random.Random(0).sample(sorted(ests), 10):
        exact = (
            ev.filter(
                (F.col("t") >= ws) & (F.col("t") < ws + 7200)
            )
            .select("item")
            .distinct()
            .count()
        )
        assert abs(ests[ws] - exact) / max(exact, 1) <= 0.05, (
            ws, ests[ws], exact,
        )


def test_bitmap_distinct_equals_count_distinct(spark):
    from pyspark.sql import functions as F
    from tsaug_spark.plans.sketches import bitmap_distinct
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r.bucket_s: r.n_distinct
           for r in bitmap_distinct(ev, "1h").collect()}
    want = {
        r.bucket_s: r.nd
        for r in ev.select(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long").alias("bucket_s"),
            "user_id",
        ).groupBy("bucket_s").agg(
            F.countDistinct("user_id").alias("nd")
        ).collect()
    }
    assert got == want


def test_bitmap_distinct_words_merge_across_scopes(spark):
    # bit_or partials are mergeable: daily words OR'd together give the
    # exact global distinct — the continuous-aggregate contract
    from pyspark.sql import functions as F
    from tsaug_spark.plans.sketches import bitmap_distinct
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    secs = 86400
    base = ev.select(
        (F.floor(F.unix_timestamp("ts") / secs) * secs)
        .cast("long").alias("bucket_s"),
        F.col("user_id").alias("id"),
    )
    words = (
        base.select(
            "bucket_s",
            (F.col("id") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 64 AS INT))")
            .alias("bit"),
        )
        .groupBy("bucket_s", "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    merged = (
        words.groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .agg(F.sum(F.bit_count("word")).cast("long").alias("nd"))
        .collect()[0]
        .nd
    )
    assert merged == ev.select("user_id").distinct().count()


def test_stream_bitmap_equals_batch_words_and_exact(spark):
    """Streaming==batch for the exact-distinct bitmap: the
    availableNow-backfilled bit_or word state equals the batch word
    build word for word, and the counts equal COUNT(DISTINCT)."""
    from tsaug_spark.streaming.stream_rollup import (
        run_stream_bitmap_once,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch_words = (
        ev.select(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long").alias("bucket_s"),
            (F.col("user_id") / 64).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CAST(user_id % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("bucket_s", "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    streamed = run_stream_bitmap_once(
        spark, f"{SF_DIR}/events.parquet",
        sink_table="t_stream_bitmap",
    ).select(
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        "word_idx",
        "word",
    )
    as_map = lambda df: {  # noqa: E731
        (r.bucket_s, r.word_idx): r.word for r in df.collect()
    }
    assert as_map(streamed) == as_map(batch_words)
    counts = {
        r.bucket_s: r.nd
        for r in streamed.groupBy("bucket_s")
        .agg(F.sum(F.bit_count("word")).cast("long").alias("nd"))
        .collect()
    }
    exact = {
        r.bucket_s: r.nd
        for r in ev.select(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long").alias("bucket_s"),
            "user_id",
        )
        .groupBy("bucket_s")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert counts == exact


def test_kmv_merge_equals_direct_build(spark):
    """The cascade property: hourly KMV sketches merged to daily are
    EXACTLY the sketch built directly at the daily tier."""
    from tsaug_spark.plans.sketches import kmv_merge, kmv_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    direct = {
        (r.bucket_s, r.rn): r.hv
        for r in kmv_partial(ev, "1d").collect()
    }
    cascaded = {
        (r.bucket_s, r.rn): r.hv
        for r in kmv_merge(kmv_partial(ev, "1h"), "1d").collect()
    }
    assert direct == cascaded and len(direct) > 0


def test_kmv_unsaturated_is_exact_and_saturated_close(spark):
    from tsaug_spark.plans.sketches import kmv_estimate, kmv_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    est = {
        r.bucket_s: (r.n_kept, r.est_distinct)
        for r in kmv_estimate(kmv_partial(ev, "1d", k=256), k=256)
        .collect()
    }
    exact = {
        r.bucket_s: r.n
        for r in ev.select(
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
            "user_id",
        )
        .groupBy("bucket_s")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for b, n in exact.items():
        n_kept, e = est[b]
        if n < 256:
            assert n_kept == n and e == float(n)
        else:
            # KMV relative error ~ 1/sqrt(k-1) ~ 6.3%; allow 3 sigma
            assert abs(e - n) / n < 0.19, (b, e, n)


def test_kmv_intersect_estimates_true_overlap(spark):
    """Theta intersection of click vs purchase users tracks the exact
    daily overlap (loose bound: intersection estimates compound both
    sketches' error)."""
    from tsaug_spark.plans.sketches import kmv_intersect, kmv_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = kmv_partial(
        ev.filter(F.col("event_type") == "click"), "1d", k=512
    )
    b = kmv_partial(
        ev.filter(F.col("event_type") == "purchase"), "1d", k=512
    )
    est = {
        r.bucket_s: r.est_common
        for r in kmv_intersect(a, b, k=512).collect()
    }
    day = (
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
        .cast("long")
        .alias("bucket_s")
    )
    ca = ev.filter(F.col("event_type") == "click").select(
        day, "user_id"
    ).distinct()
    cb = ev.filter(F.col("event_type") == "purchase").select(
        day, "user_id"
    ).distinct()
    exact = {
        r.bucket_s: r.n
        for r in ca.join(cb, ["bucket_s", "user_id"])
        .groupBy("bucket_s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(exact) <= set(est)
    for bkt, n in exact.items():
        if n >= 50:
            assert abs(est[bkt] - n) / n < 0.5, (bkt, est[bkt], n)


def test_kmv_intersect_unsaturated_sides_exact(spark):
    """Two unsaturated sketches ARE their sets: theta = full space and
    the estimate is the exact overlap count."""
    import pandas as pd
    from tsaug_spark.plans.sketches import kmv_intersect, kmv_partial

    rows = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01 00:00:00"),
            "user_id": list(range(20)),
            "side": ["a"] * 20,
        }
    )
    rows_b = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01 00:00:00"),
            "user_id": list(range(10, 30)),
            "side": ["b"] * 20,
        }
    )
    df = spark.createDataFrame(pd.concat([rows, rows_b]))
    a = kmv_partial(df.filter(F.col("side") == "a"), "1d")
    b = kmv_partial(df.filter(F.col("side") == "b"), "1d")
    r = kmv_intersect(a, b).collect()[0]
    assert r.n_common == 10
    assert r.est_common == 10.0


def _cs_md5_int(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_count_sketch_cascade_equals_direct(spark):
    """Linearity: hourly CountSketch counters summed to daily equal
    the direct daily build cell for cell, signs included."""
    from tsaug_spark.plans.sketches import cms_merge, count_sketch_partial

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cascaded = cms_merge(count_sketch_partial(ev, "1h"), "1d")
    direct = count_sketch_partial(ev, "1d")
    a = {(r.bucket_s, r.r, r.slot): r.cnt for r in cascaded.collect()}
    b = {(r.bucket_s, r.r, r.slot): r.cnt for r in direct.collect()}
    assert a == b


def test_count_sketch_estimate_matches_python_replay(spark):
    """Estimates equal a from-scratch hashlib replay of the same
    md5-derived slots/signs and the same rank-3-of-5 median."""
    import datetime as _dt

    from tsaug_spark.plans.sketches import (
        count_sketch_estimate,
        count_sketch_partial,
    )

    t0 = _dt.datetime(2024, 1, 1)
    counts = {u: 3 * u + 1 for u in range(12)}
    rows = []
    eid = 0
    for u, n in counts.items():
        for _ in range(n):
            rows.append((eid, t0, u)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    sk = count_sketch_partial(ev, "1d")
    probes = spark.createDataFrame(
        [(u,) for u in counts], "item long"
    )
    got = {
        int(r.item): r.est
        for r in count_sketch_estimate(sk, probes).collect()
    }

    counters = {}
    for u, n in counts.items():
        for r in range(5):
            slot = _cs_md5_int(f"{u}:{r}") % 256
            sgn = (_cs_md5_int(f"{u}#{r}") % 2) * 2 - 1
            counters[(r, slot)] = counters.get((r, slot), 0) + sgn * n
    want = {}
    for u in counts:
        ests = []
        for r in range(5):
            slot = _cs_md5_int(f"{u}:{r}") % 256
            sgn = (_cs_md5_int(f"{u}#{r}") % 2) * 2 - 1
            ests.append((sgn * counters.get((r, slot), 0), r))
        ests.sort()
        want[u] = ests[2][0]
    assert got == want


def test_kmv_set_algebra_identity(spark):
    """For the same (A, B) sketches: A's retained hashes below theta
    split EXACTLY into common + a-only, so n_common + n_a_only equals
    the below-theta count and est_common + est_diff share the same
    denominator."""
    from pyspark.sql import functions as F
    from tsaug_spark.plans.sketches import (
        kmv_anotb,
        kmv_intersect,
        kmv_partial,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = kmv_partial(ev.filter(F.col("event_type") == "click"), "1d")
    b = kmv_partial(
        ev.filter(F.col("event_type") == "purchase"), "1d"
    )
    inter = {
        r.bucket_s: r for r in kmv_intersect(a, b).collect()
    }
    diff = {r.bucket_s: r for r in kmv_anotb(a, b).collect()}
    assert set(inter) == set(diff)
    a_rows = a.collect()
    for bkt in inter:
        theta = inter[bkt].theta_hv
        assert diff[bkt].theta_hv == theta
        below = sum(
            1 for r in a_rows if r.bucket_s == bkt and r.hv < theta
        )
        assert inter[bkt].n_common + diff[bkt].n_a_only == below


def test_bitmap_distinct_negative_ids_exact(spark):
    """ADVICE r3: negative ids used to collapse words -64..63 into
    word 0 (truncating div + negative %); the pmod floor-division
    packing keeps the count exactly COUNT(DISTINCT) on any int64."""
    import datetime as dt

    from tsaug_spark.plans.sketches import bitmap_distinct

    t0 = dt.datetime(2024, 1, 1)
    ids = [-130, -129, -128, -65, -64, -63, -1, 0, 1, 63, 64, -130, -1]
    ev = spark.createDataFrame(
        [(t0, int(i)) for i in ids], "ts timestamp, user_id long"
    )
    (r,) = bitmap_distinct(ev, "1h").collect()
    assert r.n_distinct == len(set(ids))
