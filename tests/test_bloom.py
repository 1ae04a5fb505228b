"""Bloom-filter runtime pruning (plans/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from tsaug_spark.plans.bloom import (
    bloom_build,
    bloom_prune,
    bloom_pruned_join,
)


@pytest.fixture(scope="module")
def tables(spark):
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 1000, 100)], "k long, attr string"
    )  # 10 keys: 0, 100, ..., 900
    fact = spark.createDataFrame(
        [(k, k * 2) for k in range(1000)], "fk long, payload long"
    )
    return fact, dim


def test_bloom_join_equals_plain_join(spark, tables):
    fact, dim = tables
    got = (
        bloom_pruned_join(fact, dim, "fk", "k")
        .select("fk", "payload", "attr")
        .collect()
    )
    want = (
        fact.join(dim, fact.fk == dim.k)
        .select("fk", "payload", "attr")
        .collect()
    )
    assert sorted(got) == sorted(want)
    assert len(got) == 10


def test_bloom_never_drops_a_true_key(spark, tables):
    fact, dim = tables
    words = bloom_build(dim, "k")
    passed = {
        r.fk for r in bloom_prune(fact, words, "fk").select("fk").collect()
    }
    assert set(range(0, 1000, 100)) <= passed  # zero false negatives


def test_bloom_prunes_most_misses(spark, tables):
    fact, dim = tables
    words = bloom_build(dim, "k")
    n_pass = bloom_prune(fact, words, "fk").count()
    # 10 true keys out of 1000; at m=2^15, k=4 the false-positive rate
    # is ~(40/32768*4)^... << 1% — allow a loose 5% margin
    assert n_pass < 10 + 0.05 * 1000


def test_bloom_probe_plan_has_no_shuffle_or_python(spark, tables):
    fact, dim = tables
    words = bloom_build(dim, "k")
    plan = (
        bloom_prune(fact, words, "fk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "Join"):
        assert bad not in plan, f"probe plan contains {bad}:\n{plan}"


def test_bloom_word_table_is_bounded(spark, tables):
    _, dim = tables
    words = bloom_build(dim, "k", m_bits=1 << 10)
    assert words.count() <= (1 << 10) // 32
    # every word is a 32-bit pattern in a BIGINT
    bad = words.filter(
        (F.col("word") < 0) | (F.col("word") > (1 << 32) - 1)
    ).count()
    assert bad == 0


def test_bloom_join_mode_equals_plain_join(spark, tables):
    fact, dim = tables
    got = (
        bloom_pruned_join(fact, dim, "fk", "k", m_bits=1 << 19)
        .select("fk", "payload", "attr")
        .collect()
    )
    want = (
        fact.join(dim, fact.fk == dim.k)
        .select("fk", "payload", "attr")
        .collect()
    )
    assert sorted(got) == sorted(want)


def test_bloom_join_mode_probe_has_no_fact_shuffle(spark, tables):
    fact, dim = tables
    words = bloom_build(dim, "k", m_bits=1 << 19)
    plan = (
        bloom_prune(fact, words, "fk", m_bits=1 << 19)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # broadcast joins only: no Python stage, no sort-merge/cartesian
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin",
                "CartesianProduct"):
        assert bad not in plan
    assert "BroadcastHashJoin" in plan
    # the only Exchanges are broadcast ones
    import re
    shuffles = re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    fact_shuffles = [x for x in shuffles if "fk" in x or "payload" in x]
    assert not fact_shuffles, fact_shuffles


def test_bloom_auto_sizing_keeps_fp_rate_low(spark):
    # 20k dim keys saturate the 2^15 floor; auto-sizing must keep the
    # pass rate near the true match rate
    dim = spark.createDataFrame(
        [(k,) for k in range(0, 200000, 10)], "k long"
    )  # 20k keys
    fact = spark.createDataFrame(
        [(k,) for k in range(200000)], "fk long"
    )
    from tsaug_spark.plans.bloom import sized_m_bits
    m = sized_m_bits(dim.count())
    assert m >= 16 * 20000
    words = bloom_build(dim, "k", m)
    n_pass = bloom_prune(fact, words, "fk", m).count()
    assert n_pass < 20000 * 1.05  # true 10% plus small FP margin
