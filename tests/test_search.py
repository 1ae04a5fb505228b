"""BM25 full-text search: scores vs an independent pure-Python Okapi
implementation; postings invariants."""

from __future__ import annotations

import math

from tsaug_spark.pipeline.search import bm25_scores, build_postings

DOCS = [
    (0, "spark makes join fast"),
    (1, "vector search with spark spark spark"),
    (2, "the quick brown fox"),
    (3, "join join join everywhere"),
    (4, "a tiny doc"),
]


def _reference_bm25(query, k1=1.2, b=0.75):
    toks = {d: t.split(" ") for d, t in DOCS}
    n = len(DOCS)
    avg = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, words in toks.items():
        score, hit = 0.0, 0
        for term in query:
            tf = words.count(term)
            if tf == 0:
                continue
            df = sum(1 for w in toks.values() if term in w)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += (
                idf * tf * (k1 + 1)
                / (tf + k1 * (1 - b + b * len(words) / avg))
            )
            hit += 1
        if hit:
            out[d] = (hit, score)
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings = build_postings(df)
    got = {
        r.doc_id: (r.n_terms, r.score)
        for r in bm25_scores(
            postings, ["spark", "join", "vector"]
        ).collect()
    }
    want = _reference_bm25(["spark", "join", "vector"])
    assert got.keys() == want.keys()
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-12, d
    # rarer term ("vector", df=1) outweighs common "spark" repeats
    assert got[1][1] == max(v for _h, v in got.values())


def test_postings_invariants(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = build_postings(df).collect()
    by_doc = {}
    for r in p:
        assert r.tf >= 1
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.tf
        assert r.doc_len == len(DOCS[r.doc_id][1].split(" "))
    # term frequencies per doc sum to the doc length
    for d, total in by_doc.items():
        assert total == len(DOCS[d][1].split(" "))
