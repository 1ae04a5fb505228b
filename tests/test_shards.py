"""Token-budget shard packing: assignment semantics, overflow bound,
losslessness, determinism."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tsaug_spark.pipeline.shards import pack_shards, shard_manifest

SF_DIR = "/root/testdata/sf0.001"


def _toy(spark):
    # token counts 4,4,4,4,10,1 in one stratum => budget 8 packing:
    # cum_before 0,4,8,12,16,26 -> shards 0,0,1,1,2,3
    texts = [
        "a b c d", "e f g h", "i j k l", "m n o p",
        "q r s t u v w x y z", "solo",
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "source": ["s"] * 6,
                "text": texts,
            }
        )
    )


def test_assignment_formula(spark):
    out = (
        pack_shards(_toy(spark), budget=8)
        .orderBy("doc_id")
        .select("doc_id", "shard_id", "n_tokens")
        .collect()
    )
    assert [r.shard_id for r in out] == [0, 0, 1, 1, 2, 3]
    assert [r.n_tokens for r in out] == [4, 4, 4, 4, 10, 1]


def test_lossless_and_overflow_bound(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packed = pack_shards(docs, budget=500)
    assert packed.count() == docs.count()  # nothing lost
    man = shard_manifest(docs, budget=500)
    # every shard's tokens < budget + its largest doc (overflow bound)
    biggest = packed.groupBy("source", "shard_id").agg(
        F.max("n_tokens").alias("mx"), F.sum("n_tokens").alias("tot")
    )
    bad = biggest.filter(F.col("tot") >= 500 + F.col("mx")).count()
    assert bad == 0
    # manifest totals reconcile with the corpus
    tot_man = man.agg(F.sum("shard_tokens")).first()[0]
    tot_doc = packed.agg(F.sum("n_tokens")).first()[0]
    assert tot_man == tot_doc


def test_oversize_doc_gets_own_shard(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "source": ["s"] * 3,
                "text": ["a b", "x " * 50, "c d"],
            }
        )
    )
    out = pack_shards(docs, budget=10).orderBy("doc_id").collect()
    # the oversize doc advances the cumsum past several budgets; the
    # doc after it lands in a fresh shard, nothing is dropped
    assert len(out) == 3
    assert out[1].shard_id != out[2].shard_id


def test_deterministic_under_repartitioning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = pack_shards(docs, budget=500).select(
        "doc_id", "shard_id"
    )
    b = pack_shards(docs.repartition(13), budget=500).select(
        "doc_id", "shard_id"
    )
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_budget_validation(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_shards(_toy(spark), budget=0)


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                  max_size=40),
    budget=st.sampled_from([1, 10, 37, 1000]),
)
def test_property_lossless_and_bounded(spark, toks, budget):
    """Random token sequences at random budgets: every doc assigned,
    shard ids contiguous from 0, totals bounded by budget + max doc."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(toks)),
                "source": ["s"] * len(toks),
                "tok": toks,
            }
        )
    )
    out = (
        pack_shards(docs, budget, token_col="tok")
        .orderBy("doc_id")
        .collect()
    )
    assert len(out) == len(toks)
    shard_ids = sorted({r.shard_id for r in out})
    # per-shard totals respect the overflow bound
    per = {}
    for r in out:
        per.setdefault(r.shard_id, []).append(r.n_tokens)
    for sid, lst in per.items():
        assert sum(lst) < budget + max(lst)
    # shard ids are non-decreasing in doc order (stream-writable)
    seq = [r.shard_id for r in out]
    assert seq == sorted(seq)
    assert shard_ids[0] == 0


def test_zorder_layout_bounds_both_extents(spark):
    """16 users x 16 hours, one row each: Morton tiling into 16 files
    yields 4x4 blocks (both extents <= 3 in every file), while the
    time layout spans the full user range in every file."""
    import datetime as _dt

    from tsaug_spark.pipeline.shards import zorder_layout

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        (u * 16 + h, t0 + _dt.timedelta(hours=h), u)
        for u in range(16)
        for h in range(16)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = zorder_layout(ev)
    z = [r for r in out.collect() if r.layout == "zorder"]
    t = [r for r in out.collect() if r.layout == "time"]
    assert len(z) == 16 and len(t) == 16
    assert all(r.n_rows == 16 for r in z)
    for r in z:
        assert r.id_max - r.id_min <= 3
        assert r.hr_max - r.hr_min <= 3
    for r in t:
        assert r.id_min == 0 and r.id_max == 15
