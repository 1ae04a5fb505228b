"""Corpus curation: the full per-snapshot training-data pass, one plan.

Composes the pipeline's cheap filters in the order a 100 TB crawl
snapshot actually runs them — most-selective-per-dollar first:

1. exact-dedup survivorship (md5 fingerprint, min-id wins) — one
   shuffle on the 16-byte fingerprint, removes the bulk duplicate mass
   before anything else is computed;
2. language gate (marker-word CASE chain, pure codegen);
3. quality gates (token count / punctuation density / chars-per-word,
   all Catalyst expressions over the text column).

Everything is a single declarative chain, so Catalyst fuses the
post-shuffle filters into one whole-stage-codegen pass over the
survivor stream; nothing here is a Python UDF.  The near-dup cascade
(MinHash/SimHash/embedding LSH, pipeline/dedup.py) runs AFTER this
pass on the far smaller kept set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsaug_spark.pipeline.text import lang_pred


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_lang: str = "en",
    min_words: int = 25,
    max_punct_ratio: float = 0.06,
    max_chars_per_word: float = 8.0,
) -> DataFrame:
    """Return the curated (kept) documents with their quality features.

    Survivorship is min-id-per-fingerprint via a window over the md5
    fingerprint — the single shuffle in the plan; the language and
    quality gates are narrow projections on top.
    """
    fp = F.md5(F.col(text_col))
    keep = F.min(id_col).over(Window.partitionBy(fp))
    w = F.size(F.split(F.col(text_col), " "))
    charlen = F.length(text_col)
    punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[.,!?;]"), 0)
    )
    return (
        docs.withColumn("__keep_id", keep)
        .where(F.col(id_col) == F.col("__keep_id"))
        .drop("__keep_id")
        .withColumn("n_words", w)
        .withColumn(
            "punct_ratio", punct / charlen.cast("double")
        )
        .withColumn(
            "chars_per_word", charlen / F.col("n_words").cast("double")
        )
        .where(lang_pred(text_col) == keep_lang)
        .where(
            (F.col("n_words") >= min_words)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("chars_per_word") <= max_chars_per_word)
        )
    )


def curation_summary(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    **gates,
) -> DataFrame:
    """Per-stratum yield report of the curation pass: kept docs, kept
    tokens, kept chars.  Integer aggregates only, so the report is
    bit-deterministic under any partitioning (no float-sum ordering)."""
    kept = curate(docs, text_col=text_col, **gates)
    return kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )
