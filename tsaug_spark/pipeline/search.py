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

from pyspark.sql import DataFrame, Window
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


def mmr_rerank(
    emb: DataFrame,
    query_id: int = 0,
    n_candidates: int = 24,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998) of the top-``n_candidates`` cosine matches for one query
    vector: greedily pick ``k`` results maximizing

        MMR(i) = 0.7 * rel(i) - 0.3 * max_{j in selected} sim(i, j)

    — the diversity pass every retrieval stack runs between ANN
    shortlist and answer, so near-duplicate hits don't crowd the
    result page.

    Determinism contract: relevance and pairwise cosines are rounded
    to exact integer ten-thousandths BEFORE any decision (the
    ``hybrid_search`` 4-decimal idiom — the two engines' dot-product
    accumulations agree far above that), the greedy scores are pure
    BIGINT arithmetic (7*rel4 - 3*maxsim4, i.e. MMR in 1e-5 units),
    ties break toward the lower candidate index (= higher relevance,
    then lower id), and the oracle replays the same greedy loop in a
    recursive CTE carrying the selected list and the running
    max-similarity vector.

    Scale: the expensive part (scoring all vectors against the query)
    is one broadcast projection; everything after runs on the BOUNDED
    candidate set (n_candidates^2 pairs -> one single-group Arrow
    kernel).  In production the shortlist comes from
    ``similarity.ivf_topk`` instead of the full ranking; the full sort
    here keeps the oracle exact.
    """
    e = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    qv = e.filter(F.col("id") == query_id).select(F.col("v").alias("qv"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    def cos4(x, y):
        return F.round(
            F.lit(10000.0)
            * dot(x, y)
            / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))
        ).cast("long")

    rel = (
        e.filter(F.col("id") != query_id)
        .join(F.broadcast(qv))
        .select("id", "v", cos4(F.col("v"), F.col("qv")).alias("rel4"))
    )
    w = Window.orderBy(F.col("rel4").desc(), F.col("id").asc())
    cand = rel.select(
        "id", "v", "rel4", F.row_number().over(w).alias("idx")
    ).filter(F.col("idx") <= n_candidates)

    a = cand.select(F.col("idx").alias("i"), F.col("v").alias("va"))
    b = cand.select(F.col("idx").alias("j"), F.col("v").alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).select(
        "i", "j", cos4(F.col("va"), F.col("vb")).alias("sim4")
    )
    ker_in = pairs.join(
        F.broadcast(cand.select(F.col("idx").alias("i"), "rel4")), "i"
    ).withColumn("grp", F.lit(0))

    def _kernel(pdf):
        import numpy as np
        import pandas as pd

        n = int(pdf["i"].max())
        sim = np.zeros((n + 1, n + 1), dtype=np.int64)
        sim[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = pdf[
            "sim4"
        ].to_numpy()
        rel4 = np.zeros(n + 1, dtype=np.int64)
        first = pdf.drop_duplicates("i")
        rel4[first["i"].to_numpy()] = first["rel4"].to_numpy()
        ms = np.zeros(n + 1, dtype=np.int64)
        taken = np.zeros(n + 1, dtype=bool)
        taken[0] = True  # index 0 unused (idx is 1-based)
        out = []
        for r in range(1, min(k, n) + 1):
            score = 7 * rel4 - 3 * ms
            score[taken] = np.iinfo(np.int64).min
            best = int(score.max())
            pick = int(np.nonzero(score == best)[0][0])
            taken[pick] = True
            ms = np.maximum(ms, sim[pick])
            out.append((r, pick, best))
        return pd.DataFrame(
            out, columns=["sel_rank", "i", "score4"]
        ).astype("int64")

    picked = ker_in.groupBy("grp").applyInPandas(
        _kernel, "sel_rank long, i long, score4 long"
    )
    return picked.join(
        F.broadcast(cand.select(F.col("idx").alias("i"), "id", "rel4")),
        "i",
    ).select(
        "sel_rank",
        F.col("id").alias("vec_id"),
        (F.col("rel4").cast("double") / F.lit(1e4)).alias("rel"),
        (F.col("score4").cast("double") / F.lit(1e5)).alias("mmr"),
    )
