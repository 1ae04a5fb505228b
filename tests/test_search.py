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


# ---- approximate kNN self-join (pipeline/similarity.py) ----


def test_knn_join_recall_vs_brute_force(spark):
    """With generous band geometry (8 bands x 2 planes) the LSH
    candidate set recovers the true top-1 cosine neighbor for >= 90%
    of vectors (numpy brute force as truth); ranks are 1..k with no
    per-anchor overflow."""
    import numpy as np

    from tsaug_spark.pipeline.similarity import knn_join

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = knn_join(emb, k=3, n_bands=8, band_width=2).collect()
    per = {}
    for r in out:
        per.setdefault(r.id_a, []).append((r.rank, r.id_b))
    assert all(
        sorted(rk for rk, _ in v) == list(range(1, len(v) + 1))
        for v in per.values()
    )
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    V = np.stack(pdf.embedding.to_numpy()).astype(float)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = V @ V.T
    np.fill_diagonal(S, -np.inf)
    true_top1 = {
        int(ids[i]): int(ids[int(np.argmax(S[i]))])
        for i in range(len(ids))
    }
    hits = sum(
        1
        for a, nbrs in per.items()
        if any(b == true_top1[a] for _rk, b in nbrs)
    )
    assert hits / len(true_top1) >= 0.9, hits / len(true_top1)


def test_knn_join_both_directions_and_k_bound(spark):
    """Every anchor appears (candidates are symmetric) and no anchor
    exceeds k rows."""
    from tsaug_spark.pipeline.similarity import knn_join

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = knn_join(emb, k=2, n_bands=8, band_width=2).collect()
    per = {}
    for r in out:
        per.setdefault(r.id_a, 0)
        per[r.id_a] += 1
    assert max(per.values()) <= 2
    assert len(per) == emb.count()  # generous bands: nobody isolated


def test_sq8_quantized_topk_recall(spark):
    """Cosine top-10 computed on SQ8-RECONSTRUCTED vectors recovers
    >= 90% of the exact top-10 (numpy truth) for a sample of query
    vectors — the fidelity gate that makes the 4x-compressed codes
    usable for ANN shortlists."""
    import numpy as np

    from tsaug_spark.pipeline.similarity import sq8_quantize

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    codes = sq8_quantize(emb).select("vec_id", "code").toPandas()
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    codes = codes.sort_values("vec_id").reset_index(drop=True)
    V = np.stack(pdf.embedding.to_numpy()).astype(float)
    lo, hi = V.min(0), V.max(0)
    C = np.stack(codes.code.to_numpy()).astype(float)
    R = lo + C * (hi - lo) / 255.0        # reconstructed vectors
    for M in (V, R):
        M /= np.linalg.norm(M, axis=1, keepdims=True)
    S_true, S_q = V @ V.T, R @ R.T
    np.fill_diagonal(S_true, -np.inf)
    np.fill_diagonal(S_q, -np.inf)
    k, hits, total = 10, 0, 0
    for i in range(0, len(V), 10):       # 50 query vectors
        t = set(np.argpartition(-S_true[i], k)[:k])
        q = set(np.argpartition(-S_q[i], k)[:k])
        hits += len(t & q)
        total += k
    assert hits / total >= 0.9, hits / total


def test_hybrid_search_rrf_fuses_both_rankings(spark):
    """RRF invariants on the real corpus: exactly 20 fused rows, every
    doc ranked by BOTH legs outranks (in rrf) the same ranks taken
    alone, and the top fused doc appears in at least one leg's
    top-60."""
    import __spark_entry__ as em

    out = em.q_hybrid_search(spark, "/root/testdata/sf0.01").collect()
    assert len(out) == 20
    ranks = [r.hybrid_rank for r in out]
    assert sorted(ranks) == list(range(1, 21))
    for r in out:
        expect = 0.0
        if r.bm25_rank is not None:
            expect += 1.0 / (60.0 + r.bm25_rank)
        if r.vec_rank is not None:
            expect += 1.0 / (60.0 + r.vec_rank)
        assert r.rrf == expect
        assert r.bm25_rank is not None or r.vec_rank is not None
    # descending rrf with id tie-break
    by_rank = sorted(out, key=lambda r: r.hybrid_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.rrf, -a.id) >= (b.rrf, -b.id)


def _unit(deg):
    import math
    return [float(math.cos(math.radians(deg))),
            float(math.sin(math.radians(deg)))]


def test_mmr_rerank_prefers_diversity_over_near_dup(spark):
    # q at 0deg; cand 1 at 18deg (rel .9511), cand 2 at 19deg (rel
    # .9455, sim to 1 = cos 1deg = .9998), cand 3 at -32deg (rel .8480,
    # sim to 1 = cos 50deg = .6428).  Greedy: 1, then 3 (0.40076 beats
    # 2's 0.36191), then 2.
    from tsaug_spark.pipeline.search import mmr_rerank
    emb = spark.createDataFrame(
        [(0, _unit(0)), (1, _unit(18)), (2, _unit(19)), (3, _unit(-32))],
        "vec_id long, embedding array<float>",
    )
    out = mmr_rerank(emb, n_candidates=3, k=3).collect()
    order = [r.vec_id for r in sorted(out, key=lambda r: r.sel_rank)]
    assert order == [1, 3, 2]
    first = [r for r in out if r.sel_rank == 1][0]
    assert abs(first.rel - 0.9511) < 5e-4
    assert abs(first.mmr - 0.7 * first.rel) < 1e-9


def test_mmr_rerank_tie_breaks_toward_lower_id_and_penalizes_dup(spark):
    # two byte-identical candidates: the lower id is picked first; the
    # clone's MMR collapses to 0.7*rel - 0.3*1.0
    from tsaug_spark.pipeline.search import mmr_rerank
    emb = spark.createDataFrame(
        [(0, _unit(0)), (5, _unit(10)), (6, _unit(10)), (7, _unit(-20))],
        "vec_id long, embedding array<float>",
    )
    out = {r.sel_rank: r for r in
           mmr_rerank(emb, n_candidates=3, k=3).collect()}
    assert out[1].vec_id == 5
    assert out[2].vec_id == 7  # diverse candidate beats the clone
    assert out[3].vec_id == 6
    assert abs(out[3].mmr - (0.7 * out[3].rel - 0.3)) < 1e-9


def test_label_centroids_exact(spark):
    """Two labels, two 2-d vectors each: micro sums and centroids are
    the literal quantized means."""
    from tsaug_spark.pipeline.similarity import label_centroids

    emb = spark.createDataFrame(
        [
            (1, [1.0, -2.0], 0),
            (2, [3.0, 4.0], 0),
            (3, [0.5, 0.25], 1),
            (4, [0.5, 0.75], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        (r.label, r.dim): r for r in label_centroids(emb).collect()
    }
    assert out[(0, 0)].sum_micro == 4_000_000
    assert out[(0, 0)].centroid == 2.0
    assert out[(0, 1)].sum_micro == 2_000_000
    assert out[(0, 1)].centroid == 1.0
    assert out[(1, 0)].sum_micro == 1_000_000
    assert out[(1, 1)].sum_micro == 1_000_000
    assert all(r.n == 2 for r in out.values())


def test_label_centroids_separate_real_labels(spark):
    """On the sf0.001 embeddings the per-label centroids exist for
    every (label, dim) cell and each label's centroid differs from
    the global mean somewhere (labels are real clusters)."""
    from pyspark.sql import functions as F

    from tsaug_spark.pipeline.similarity import label_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_lab, dim = emb.select(
        F.countDistinct("label"),
        F.max(F.size("embedding")),
    ).first()
    out = label_centroids(emb)
    assert out.count() == n_lab * dim
    spread = (
        out.groupBy("dim")
        .agg((F.max("centroid") - F.min("centroid")).alias("sp"))
        .agg(F.max("sp"))
        .first()[0]
    )
    assert spread > 0.0


def test_centroid_assign_separable(spark):
    """Two tight clusters: every vector lands on its own label's
    centroid -> diagonal confusion."""
    from tsaug_spark.pipeline.similarity import centroid_assign

    rows = []
    for i in range(4):
        rows.append((i, [1.0 + i * 0.01, 0.0], 0))
        rows.append((10 + i, [0.0, 1.0 + i * 0.01], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r.actual, r.predicted): r.n
        for r in centroid_assign(emb).collect()
    }
    assert out == {(0, 0): 4, (1, 1): 4}


def test_centroid_assign_pulls_outlier_across(spark):
    """A label-0 vector sitting on label 1's centroid must be
    predicted 1 (off-diagonal cell)."""
    from tsaug_spark.pipeline.similarity import centroid_assign

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 0),  # the defector
        (10, [0.0, 1.0], 1),
        (11, [0.0, 1.0], 1),
        (12, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r.actual, r.predicted): r.n
        for r in centroid_assign(emb).collect()
    }
    assert out[(0, 1)] == 1 and out[(0, 0)] == 2 and out[(1, 1)] == 3


def test_centroid_assign_counts_match_total(spark):
    """On sf0.001 every vector is assigned exactly once and most mass
    is on the diagonal (labels are real clusters)."""
    from pyspark.sql import functions as F

    from tsaug_spark.pipeline.similarity import centroid_assign

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    out = centroid_assign(emb)
    total = out.agg(F.sum("n")).first()[0]
    assert total == emb.count()
    diag = (
        out.filter(F.col("actual") == F.col("predicted"))
        .agg(F.sum("n"))
        .first()[0]
    )
    # well above the 10-label chance rate (the synthetic clusters
    # overlap, so demand signal, not separability)
    assert diag / total > 0.2
