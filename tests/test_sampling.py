"""Deterministic hash sampling / splitting: totality, disjointness,
stability under repartitioning, salt independence, incremental-ingest
composition, and plan narrowness (no shuffle)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsaug_spark.pipeline.sampling import (
    N_BUCKETS,
    hash_bucket,
    hash_sample,
    hash_split,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_split_is_total_and_disjoint(spark):
    docs = _docs(spark)
    out = hash_split(docs, "doc_id",
                     weights={"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    per = dict(
        out.groupBy("split").count().rdd.map(tuple).collect()
    )
    assert sum(per.values()) == n
    assert set(per) <= {"train", "val", "test"}
    # one split per row by construction; weights roughly honored
    assert per["train"] > per.get("val", 0)


def test_split_stable_under_repartitioning(spark):
    docs = _docs(spark)
    a = hash_split(docs, "doc_id").select("doc_id", "split")
    b = hash_split(docs.repartition(17), "doc_id").select(
        "doc_id", "split"
    )
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_salt_namespaces_draws(spark):
    docs = _docs(spark)
    a = hash_sample(docs, "doc_id", 0.5, salt="expA")
    b = hash_sample(docs, "doc_id", 0.5, salt="expB")
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a != ids_b          # different draws...
    a2 = hash_sample(docs, "doc_id", 0.5, salt="expA")
    ids_a2 = {r.doc_id for r in a2.select("doc_id").collect()}
    assert ids_a == ids_a2         # ...but each is stable


def test_sample_composes_with_ingest_growth(spark):
    """A row's membership never flips when the table grows: the sample
    of the grown table restricted to the old ids equals the old
    sample."""
    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") < 30)
    grown = docs.filter(F.col("doc_id") < 60)
    s_old = {r.doc_id for r in
             hash_sample(old, "doc_id", 0.4).select("doc_id").collect()}
    s_grown = {r.doc_id for r in
               hash_sample(grown, "doc_id", 0.4).select("doc_id")
               .collect()}
    assert {i for i in s_grown if i < 30} == s_old


def test_sample_fraction_accuracy(spark):
    docs = _docs(spark)
    n = docs.count()
    got = hash_sample(docs, "doc_id", 0.25).count()
    assert abs(got / n - 0.25) < 0.08


def test_bucket_uniformity():
    # driverless check of the bucket function's distribution over a
    # contiguous id range: no bucket hot spots (md5 prefix uniformity)
    pdf = pd.DataFrame({"id": range(20_000)})
    import hashlib

    buckets = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % N_BUCKETS
        for i in pdf["id"]
    ]
    counts = pd.Series(buckets).value_counts()
    assert counts.max() <= 12  # mean 2 per bucket; loose tail bound


def test_mixture_rates_and_subset_growth(spark):
    from tsaug_spark.pipeline.sampling import mixture_sample

    docs = _docs(spark)
    lo = mixture_sample(docs, "doc_id", "source", {"src0": 0.3},
                        salt="m", default_fraction=0.2)
    hi = mixture_sample(docs, "doc_id", "source", {"src0": 0.6},
                        salt="m", default_fraction=0.2)
    ids_lo = {r.doc_id for r in lo.select("doc_id").collect()}
    ids_hi = {r.doc_id for r in hi.select("doc_id").collect()}
    # upsampling a stratum strictly grows its kept set (curriculum
    # schedules can reuse earlier shards)
    assert ids_lo <= ids_hi
    # unlisted strata follow default_fraction, roughly
    n_other = docs.filter(F.col("source") != "src0").count()
    got = lo.filter(F.col("source") != "src0").count()
    assert abs(got / n_other - 0.2) < 0.1


def test_mixture_zero_default_drops_unlisted(spark):
    from tsaug_spark.pipeline.sampling import mixture_sample

    docs = _docs(spark)
    only = mixture_sample(docs, "doc_id", "source", {"src0": 1.0})
    assert only.filter(F.col("source") != "src0").count() == 0
    assert only.count() == docs.filter(F.col("source") == "src0").count()


def test_mixture_validation(spark):
    from tsaug_spark.pipeline.sampling import mixture_sample

    docs = _docs(spark)
    with pytest.raises(ValueError, match="fraction for"):
        mixture_sample(docs, "doc_id", "source", {"src0": 1.5})
    with pytest.raises(ValueError, match="default_fraction"):
        mixture_sample(docs, "doc_id", "source", {}, default_fraction=-1)


def test_split_weight_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", weights={"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="at least one"):
        hash_split(docs, "doc_id", weights={})
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, "doc_id", 1.5)


def test_projection_is_narrow(spark):
    """The split is a pure projection: no Exchange in the plan."""
    docs = _docs(spark)
    plan = (
        hash_split(docs, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bucket_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    want = con.execute(
        "SELECT ('0x' || substr(md5('42'), 1, 8))::BIGINT % 10000"
    ).fetchone()[0]
    import hashlib

    got = int(hashlib.md5(b"42").hexdigest()[:8], 16) % 10000
    assert got == want


def test_weighted_sample_deterministic_and_repartition_stable(spark):
    from tsaug_spark.pipeline.sampling import weighted_sample
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r.stratum, r.id, r.rank)
        for r in weighted_sample(docs, "n_chars", k=8,
                                 stratum_col="source").collect()
    )
    b = sorted(
        (r.stratum, r.id, r.rank)
        for r in weighted_sample(
            docs.repartition(13), "n_chars", k=8, stratum_col="source"
        ).collect()
    )
    assert a == b and len(a) > 0


def test_weighted_sample_matches_python_aes(spark):
    # independent A-ES replay with the same md5 draws
    import hashlib
    import math

    from tsaug_spark.pipeline.sampling import weighted_sample
    rows = [(i, 10.0 * (1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r.rank, r.id)
        for r in sorted(
            weighted_sample(df, "w", k=10).collect(),
            key=lambda r: r.rank,
        )
    ]
    keys = []
    for i, w in rows:
        h = int(hashlib.md5(f"{i}:ws1".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        keys.append((math.log(u) / w, -i))
    want = [
        (rank + 1, -negid)
        for rank, (_, negid) in enumerate(
            sorted(keys, reverse=True)[:10]
        )
    ]
    assert got == want


def test_weighted_sample_prefers_heavy_weights(spark):
    # one row with overwhelming weight is (almost surely) sampled:
    # ln(u)/w -> ~0 for huge w regardless of u
    from tsaug_spark.pipeline.sampling import weighted_sample
    rows = [(i, 1.0) for i in range(100)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    ids = {r.id for r in weighted_sample(df, "w", k=5).collect()}
    assert 999 in ids


def test_weighted_sample_skips_nonpositive_weights(spark):
    from tsaug_spark.pipeline.sampling import weighted_sample
    rows = [(1, 0.0), (2, -3.0), (3, 5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, "w", k=5).collect()
    assert {r.id for r in out} == {3}
