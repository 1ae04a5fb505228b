"""Corpus curation pass: stage-by-stage semantics and plan shape."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tsaug_spark.pipeline.curation import curate, curation_summary

SF_DIR = "/root/testdata/sf0.001"


def _toy(spark):
    # two exact dups (1,5), one Spanish doc, one too-short doc, one
    # punctuation-heavy doc, two good docs
    good = "the quick brown fox jumps over the lazy dog " * 4
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "source": ["a", "a", "a", "b", "b", "b"],
                "text": [
                    good + "one",
                    "short text",
                    "hola el mundo bueno dias " * 10,
                    good + "two",
                    good + "one",          # dup of doc 1
                    ".,!?;" * 40,
                ],
            }
        )
    )


def test_stage_semantics(spark):
    kept = curate(_toy(spark), min_words=20)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # 5 is a dup of 1 (min id wins); 2 too short; 3 wrong language;
    # 6 fails punctuation/chars-per-word gates
    assert ids == [1, 4]


def test_dup_survivor_is_min_id(spark):
    kept = curate(_toy(spark), min_words=20)
    assert kept.filter(F.col("doc_id") == 5).count() == 0
    assert kept.filter(F.col("doc_id") == 1).count() == 1


def test_summary_counts_are_integers(spark):
    out = curation_summary(_toy(spark), min_words=20)
    kinds = {f.dataType.simpleString() for f in out.schema.fields
             if f.name != "source"}
    assert kinds <= {"bigint", "long"}
    rows = {r.source: r for r in out.collect()}
    assert rows["a"].n_docs == 1 and rows["b"].n_docs == 1
    assert rows["a"].n_tokens >= 20


def test_real_corpus_yield_reasonable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = docs.count()
    kept = curate(docs).count()
    assert 0 < kept <= total
    # the synthetic corpus is mostly clean English: yield above half
    assert kept / total > 0.5


def test_single_shuffle_plan(spark):
    """One Exchange for the fingerprint window; the gates must fuse
    into projections/filters on top, not extra shuffles."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        curate(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
