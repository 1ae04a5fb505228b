"""query_series: tier picking by point budget, chunk-exclusion range
read, M4 fallback when even the coarsest tier overflows the budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsaug_spark.sources.checkpoint import RollupJob


def _job(spark, transcripts, tmp_path):
    job = RollupJob(
        spark, str(tmp_path / "q"), n_partitions=2,
        source_snapshot="s1",
    )
    job.run(transcripts, "1m")
    job.cascade_tier("1m", "1h")
    job.cascade_tier("1h", "1d")
    return job


def test_query_series_picks_finest_fitting_tier(
    spark, transcripts, tmp_path
):
    job = _job(spark, transcripts, tmp_path)
    lo, hi = transcripts.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]

    # 2h span = 120 minute buckets <= 500 -> finest tier
    df, tier, m4 = job.query_series(lo, lo + 7200, max_points=500)
    assert (tier, m4) == ("1m", False)
    got = {
        (r.conv_id, r.bucket_ts): r.turn_rate for r in df.collect()
    }
    want = {
        (r.conv_id, r.bucket_ts): float(r.turn_rate)
        for r in job.read_tier("1m")
        .filter(
            F.unix_timestamp("bucket_ts").between(
                (lo // 60) * 60, lo + 7200  # leading bucket included
            )
        )
        .collect()
    }
    assert got == want and got

    # 2h span with a 10-point budget -> 1h fits (2 buckets)
    _df, tier, m4 = job.query_series(lo, lo + 7200, max_points=10)
    assert (tier, m4) == ("1h", False)

    # 30-day span, 100-point budget -> 720 hourly buckets overflow,
    # 30 daily fit
    _df, tier, m4 = job.query_series(
        lo, lo + 30 * 86400, max_points=100
    )
    assert (tier, m4) == ("1d", False)


def test_query_series_m4_fallback_bounds_points(
    spark, transcripts, tmp_path
):
    job = _job(spark, transcripts, tmp_path)
    lo = transcripts.agg(
        F.min(F.unix_timestamp("ts"))
    ).collect()[0][0]
    # 400-day span, 16-point budget: even 1d gives 400 buckets -> M4
    df, tier, m4 = job.query_series(
        lo, lo + 400 * 86400, max_points=16
    )
    assert (tier, m4) == ("1d", True)
    assert set(df.columns) == {
        "conv_id", "px_ts", "vmin", "vmax", "vfirst", "vlast"
    }
    per_conv = (
        df.groupBy("conv_id").count().agg(F.max("count")).collect()
    )[0][0]
    assert per_conv <= 16 // 4 + 1
    # M4 envelope is consistent
    bad = df.filter(
        (F.col("vmin") > F.col("vmax"))
        | (F.col("vfirst") < F.col("vmin"))
        | (F.col("vfirst") > F.col("vmax"))
    ).count()
    assert bad == 0


def test_query_series_conv_filter_prunes_chunks(
    spark, transcripts, tmp_path
):
    job = _job(spark, transcripts, tmp_path)
    lo, hi = transcripts.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).collect()[0]
    some = [
        r.conv_id
        for r in transcripts.filter(
            F.unix_timestamp("ts") <= lo + 7200
        )
        .select("conv_id")
        .distinct()
        .limit(3)
        .collect()
    ]
    df, tier, _m4 = job.query_series(
        lo, lo + 7200, max_points=1000, conv_ids=some
    )
    assert set(
        r.conv_id for r in df.select("conv_id").distinct().collect()
    ) <= set(some)
    assert df.count() > 0
