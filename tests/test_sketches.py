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
