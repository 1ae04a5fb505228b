"""Full-text search over the documents table: inverted-index postings
and BM25 ranking, entirely in Catalyst.

Design for a 10^12-token corpus:

* ``build_postings`` is one explode + two hash aggregates co-keyed on
  ``doc_id`` — the classic (term, doc, tf) inverted index in long
  form.  Materialized once (a snapshot table partitioned/bucketed by
  term at scale), it serves every query afterwards; raw text is never
  re-scanned per query.
* ``bm25_scores`` touches only the postings of the QUERY terms (a
  broadcast ``isin`` filter that prunes the postings scan), joins the
  per-term document frequencies (a |q|-row broadcast dim), and sums
  per-term partial scores pivoted to FIXED columns added in a fixed
  order — so the float total is deterministic under any aggregation
  order, and the whole scoring expression replays token-for-token in
  the DuckDB oracle (one ``ln`` per term; both engines agree far
  inside the 9-significant-digit hash tolerance).

Okapi BM25 (k1 = 1.2, b = 0.75):

    idf(t)  = ln(1 + ((N - df) + 0.5) / (df + 0.5))
    s(t, d) = idf(t) * (tf * (k1+1)) / (tf + k1*(1 - b + b*(len_d/avg)))
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: ``(doc_id, term, tf, doc_len)``.

    Whitespace tokenization (the repo's ``token_counts`` idiom) so the
    oracle's ``string_split`` replays it exactly; empty tokens from
    leading/trailing spaces are dropped on both sides."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    lens = base.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("doc_len")
    )
    tf = base.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return tf.join(lens, "doc_id")


def bm25_scores(
    postings: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document matching any query term.

    Output: ``(doc_id, n_terms, score)`` — ``n_terms`` = how many
    distinct query terms the document contains.  Scores are summed
    over the query terms in THEIR GIVEN ORDER via pivoted per-term
    columns (each an exact single value, never an accumulation), so
    the result is bit-deterministic and SQL-replayable."""
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    matched = postings.filter(F.col("term").isin(terms))
    stats = postings.select("doc_id", "doc_len").distinct().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_len").alias("sum_len"),
    )
    dfreq = matched.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    j = matched.join(F.broadcast(dfreq), "term").crossJoin(
        F.broadcast(stats)
    )
    avg = F.col("sum_len").cast("double") / F.col("n_docs").cast(
        "double"
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    s = (
        idf
        * (tf_d * F.lit(k1 + 1.0))
        / (
            tf_d
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * (dl / avg))
        )
    )
    scored = j.select("doc_id", "term", s.alias("s"))
    per_term = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("s"))).alias(
                f"__s{i}"
            )
            for i, t in enumerate(terms)
        ]
    )
    total = F.coalesce(F.col("__s0"), F.lit(0.0))
    n_terms = F.when(F.col("__s0").isNotNull(), 1).otherwise(0)
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
        n_terms = n_terms + F.when(
            F.col(f"__s{i}").isNotNull(), 1
        ).otherwise(0)
    return per_term.select(
        "doc_id",
        n_terms.cast("int").alias("n_terms"),
        total.alias("score"),
    )
