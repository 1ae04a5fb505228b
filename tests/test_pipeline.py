"""Training-data pipeline operators + streaming rollup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsaug_spark.pipeline.dedup import (
    embedding_near_dup,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from tsaug_spark.pipeline.multimodal import (
    attach_payloads,
    decode_image,
    extract_features,
    fake_features,
)
from tsaug_spark.pipeline.similarity import (
    cosine_topk,
    ivf_index,
    ivf_topk,
)
from tsaug_spark.pipeline.text import doc_fingerprint, quality_metrics


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy cat today",  # near-dup
        "completely different content about spark engines and rollups",
        "the quick brown fox jumps over the lazy dog today",  # exact dup
        "short text",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(base)),
            "text": base,
            "lang": ["en"] * len(base),
            "source": ["t"] * len(base),
            "n_chars": [len(t) for t in base],
        }
    )
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(0)
    base = rng.normal(size=(40, 16))
    base[7] = base[3] + rng.normal(scale=1e-3, size=16)  # near-dup pair
    pdf = pd.DataFrame(
        {
            "vec_id": range(40),
            "embedding": [row.astype(np.float32).tolist() for row in base],
        }
    )
    return spark.createDataFrame(pdf).cache()


def test_exact_dedup(docs):
    out = exact_dedup(docs).toPandas()
    assert len(out) == 4  # 5 docs, one exact duplicate pair
    dup_row = out[out["copies"] == 2]
    assert len(dup_row) == 1 and dup_row["keep_id"].iloc[0] == 0


def test_minhash_lsh_finds_near_dup(docs):
    sig = minhash_signatures(shingles(docs), n_bands=4)
    pairs = lsh_candidate_pairs(sig, n_bands=4).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 3) in got  # exact dup always collides
    assert (0, 1) in got  # near-dup shares most shingles


def test_ngram_jaccard_scores(docs):
    out = ngram_jaccard_pairs(shingles(docs), threshold=0.4).toPandas()
    pairs = {
        (r.id_a, r.id_b): r.jaccard for r in out.itertuples()
    }
    assert pairs[(0, 3)] == 1.0
    assert 0.4 <= pairs[(0, 1)] < 1.0
    # verify-only mode respects the candidate list
    spark_df = docs.sparkSession.createDataFrame(
        pd.DataFrame({"id_a": [0], "id_b": [3]})
    )
    only = ngram_jaccard_pairs(
        shingles(docs), threshold=0.4, candidates=spark_df
    ).toPandas()
    assert set(map(tuple, only[["id_a", "id_b"]].to_numpy())) == {(0, 3)}


def test_simhash_near_dup_close_in_hamming(docs):
    out = simhash(docs, bits=16).toPandas().set_index("doc_id")["simhash"]
    ham = bin(int(out[0]) ^ int(out[1])).count("1")
    ham_far = bin(int(out[0]) ^ int(out[2])).count("1")
    assert int(out[0]) == int(out[3])  # identical docs -> identical hash
    assert ham < ham_far  # near-dup closer than unrelated


def test_embedding_near_dup_lsh(vectors):
    out = embedding_near_dup(vectors, threshold=0.99).toPandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (3, 7) in got


def test_embedding_near_dup_recall_vs_brute_force(spark):
    """Multi-band recall gate (VERDICT r2 #3): >= 0.8 of the brute-force
    cosine >= 0.9 pairs must survive the banded candidate join.

    50 planted near-dup pairs at cosine ~0.95-0.99; expected recall at
    (8 bands x 8 planes) is 1-(1-p^8)^8 ~ 0.98 for p = 1-acos(.95)/pi.
    """
    rng = np.random.RandomState(42)
    base = rng.normal(size=(100, 32))
    rows, ids = [], []
    for i, v in enumerate(base):
        rows.append(v)
        ids.append(2 * i)
        # noise sized for cos ~ 0.95-0.99 against the base vector
        noisy = v + rng.normal(scale=0.2, size=32) * rng.uniform(0.3, 1)
        rows.append(noisy)
        ids.append(2 * i + 1)
    mat = np.array(rows)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = norm @ norm.T
    iu = np.triu_indices(len(mat), k=1)
    truth = {
        (int(ids[a]), int(ids[b])) if ids[a] < ids[b]
        else (int(ids[b]), int(ids[a]))
        for a, b in zip(*iu)
        if cos[a, b] >= 0.9
    }
    assert len(truth) >= 40  # the planted pairs are really there

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": ids,
                "embedding": [r.astype(np.float32).tolist() for r in rows],
            }
        )
    )
    out = embedding_near_dup(
        df, threshold=0.9, n_bands=8, band_width=8
    ).toPandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert not (got - truth)  # verify stage: zero false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"recall {recall:.3f} below gate"


def test_hyperplane_band_occupancy_sf01(spark):
    """Bounded-occupancy assertion at sf0.1 (VERDICT r2 #3 done-bar):
    with the production 4x16 band geometry, no band bucket may hold a
    meaningful fraction of the corpus — the whole point of multi-band
    over the old single 8-bit key (which held N/256 per bucket)."""
    from tsaug_spark.pipeline.dedup import hyperplane_bands

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = emb.count()
    bands = hyperplane_bands(emb, n_bands=4, band_width=16)
    top = (
        bands.groupBy("band_idx", "band_val")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()["mx"]
    )
    assert top <= max(n // 20, 8), f"hot bucket {top} of {n}"


def test_lsh_hot_bucket_cap_bounds_exact_dup_explosion(spark):
    """10k identical docs share every band value; uncapped this is a
    ~5*10^7-pair self-join.  With max_bucket the oversized buckets are
    excluded and the join completes with zero pairs, while
    hot_bucket_stats reports what was routed to exact-dedup."""
    from tsaug_spark.pipeline.dedup import (
        hot_bucket_stats,
        simhash_pairs,
    )

    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("same exact document body repeated verbatim").alias("text"),
    )
    out = simhash_pairs(
        docs, bits=32, max_hamming=3, n_bands=4, max_bucket=100
    ).toPandas()
    assert len(out) == 0

    # and the dropped buckets are observable: 4 bands, all size 10k
    sig = simhash(docs, bits=32)
    w = 32 // 4
    mask = (1 << w) - 1
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("simhash", b * w)
                        .bitwiseAND(mask)
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_val")
    stats = hot_bucket_stats(
        bands, ["band_idx", "band_val"], max_bucket=100
    ).toPandas()
    assert len(stats) == 4 and (stats["bucket_size"] == n).all()


def test_minhash_lsh_cap_preserves_nonhot_pairs(docs):
    """The cap must only drop oversized buckets — normal near-dup pairs
    still come through (docs fixture buckets are all tiny)."""
    sig = minhash_signatures(shingles(docs), n_bands=4)
    pairs = lsh_candidate_pairs(sig, n_bands=4, max_bucket=3).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 3) in got and (0, 1) in got


def test_cosine_topk_and_ivf_agree_on_top1(vectors):
    q = (
        vectors.filter(F.col("vec_id") == 3)
        .toPandas()["embedding"]
        .iloc[0]
    )
    brute = cosine_topk(vectors, q, k=5).toPandas()
    assert brute["vec_id"].iloc[0] == 3  # itself
    assert brute["vec_id"].iloc[1] == 7  # planted neighbour

    indexed, cents = ivf_index(vectors, n_cells=4, seed=1)
    approx = ivf_topk(indexed, cents, q, k=5, n_probe=2).toPandas()
    assert approx["vec_id"].iloc[0] == 3
    assert approx["vec_id"].iloc[1] == 7
    # recall vs brute force at k=5 with half the cells probed
    recall = len(
        set(brute["vec_id"]) & set(approx["vec_id"])
    ) / 5
    assert recall >= 0.6


def test_doc_fingerprint_order_sensitive(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b c", "a b c", "c b a"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = doc_fingerprint(df).toPandas().set_index("doc_id")["fingerprint"]
    assert out[0] == out[1]
    assert out[0] != out[2]  # word order matters


def test_quality_metrics(docs):
    out = quality_metrics(docs).toPandas().set_index("doc_id")
    assert out.loc[4, "n_words"] == 2
    assert (out["punct_ratio"] == 0).all()


def test_multimodal_plumbing(docs):
    with_payload = attach_payloads(docs)
    feats = extract_features(with_payload).toPandas()
    assert len(feats) == docs.count()
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic: same payload -> same features (docs 0 and 3)
    f = feats.set_index("doc_id")["feature"]
    assert list(f[0]) == list(f[3])
    # compressed formats (non-BMP magic) still need a codec library
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    # and the fake is stable across calls
    assert np.array_equal(fake_features(b"xyz"), fake_features(b"xyz"))


def test_multimodal_resize_and_frames(docs):
    from tsaug_spark.pipeline.multimodal import (
        resize_payload,
        sample_frames,
    )

    with_payload = attach_payloads(docs)
    resized = resize_payload(with_payload, width=8, height=4).toPandas()
    assert len(resized) == docs.count()
    # the resize law: every output payload is exactly width*height bytes
    assert (resized["payload"].map(len) == 32).all()
    assert (resized["n_bytes"] == 32).all()
    # deterministic: identical payloads resize identically (docs 0 and 3)
    r = resized.set_index("doc_id")["payload"]
    assert bytes(r[0]) == bytes(r[3])

    frames = sample_frames(
        with_payload, frame_bytes=8, every_n=2
    ).toPandas()
    # fan-out: one row per sampled frame, ordinal stride every_n
    assert (frames["frame_idx"] % 2 == 0).all()
    per_doc = frames.groupby("doc_id")["frame_idx"].max()
    src_len = (
        with_payload.select(
            "doc_id", F.length("payload").alias("n")
        ).toPandas().set_index("doc_id")["n"]
    )
    for doc_id, mx in per_doc.items():
        assert mx <= max(1, src_len[doc_id] // 8)


def test_streaming_rollup_matches_batch(spark, transcripts, tmp_path):
    from tsaug_spark.plans.rollup import rollup_transcripts
    from tsaug_spark.streaming.stream_rollup import run_stream_once

    src = str(tmp_path / "stream_src")
    transcripts.write.mode("overwrite").parquet(src)
    out = run_stream_once(
        spark, src, transcripts.schema, "1m", "stream_out_t"
    )
    got = (
        out.orderBy("conv_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        rollup_transcripts(transcripts, "1m")
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_scrub_text_masks_pii(spark):
    from tsaug_spark.pipeline.text import scrub_text

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail me at jane.doe+x@corp-example.co.uk today",
                "see https://example.com/a?b=1#c and http://t.co/xyz",
                "call 555-123-4567 now",
                "nothing sensitive here",
            ],
        }
    )
    out = (
        scrub_text(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "scrubbed"] == "mail me at <EMAIL> today"
    assert out.loc[1, "scrubbed"] == "see <URL> and <URL>"
    assert out.loc[2, "scrubbed"] == "call <PHONE> now"
    assert out.loc[3, "scrubbed"] == "nothing sensitive here"
    assert list(out["was_scrubbed"]) == [True, True, True, False]


def test_stopword_ratio_values(spark):
    from tsaug_spark.pipeline.text import stopword_ratio

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["the cat sat on the mat", "xylophone quartz"],
        }
    )
    out = (
        stopword_ratio(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")["stopword_ratio"]
    )
    assert out[0] == pytest.approx(3 / 6)
    assert out[1] == 0.0


def test_dedup_clusters_connected_components(spark):
    from tsaug_spark.pipeline.dedup import dedup_clusters

    # chain 1-2-3, pair 10-11, triangle 20-21-22 (+ transitive 20-22)
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": [1, 2, 10, 20, 21, 20],
                "id_b": [2, 3, 11, 21, 22, 22],
            }
        )
    )
    out = (
        dedup_clusters(pairs)
        .toPandas()
        .set_index("doc_id")["component"]
        .to_dict()
    )
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_dedup_clusters_long_chain_converges(spark):
    """A 30-hop chain needs many propagation rounds — the fixpoint loop
    must carry labels the whole way, not just one hop."""
    from tsaug_spark.pipeline.dedup import dedup_clusters

    n = 30
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n), "id_b": range(1, n + 1)})
    )
    out = dedup_clusters(pairs, max_iters=50).toPandas()
    assert (out["component"] == 0).all()
    assert len(out) == n + 1


def test_dedup_clusters_pointer_jump_log_rounds(spark):
    """Pointer jumping makes chains converge in O(log n) rounds: a
    60-hop chain fits in 8 rounds (plain min-propagation needs 60)."""
    from tsaug_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(60), "id_b": range(1, 61)})
    )
    out = dedup_clusters(pairs, max_iters=8).toPandas()
    assert (out["component"] == 0).all()
    assert len(out) == 61


def test_dedup_clusters_nonconvergence_raises(spark):
    """ADVICE r2: falling through max_iters must not silently return
    partial labels — the 30-hop chain cannot converge in 3 rounds."""
    from tsaug_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(30), "id_b": range(1, 31)})
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iters=3)


def test_repetition_metrics_counts(spark):
    """Exact top-word / total counts on a crafted corpus; the gate is
    integer arithmetic (top*5 >= total), no float ratio anywhere."""
    from tsaug_spark.pipeline.text import repetition_metrics

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "spam spam spam eggs ham",      # top 3 of 5 -> flag
                    "one two three four five six",  # top 1 of 6 -> keep
                ],
            }
        )
    )
    m = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert (m[0].top_word_cnt, m[0].n_words) == (3, 5)
    assert (m[1].top_word_cnt, m[1].n_words) == (1, 6)
    flagged = [d for d, r in m.items() if r.top_word_cnt * 5 >= r.n_words]
    assert flagged == [0]


def test_contamination_overlap_fraction(spark):
    # corpus doc 1: "a b c d" -> shingles {a b c, b c d}; benchmark
    # contains "a b c x" -> shingles {a b c, b c x}: overlap 1/2,
    # flagged at threshold 0.5.  doc 2 shares nothing.  doc 3 is too
    # short to shingle and must be absent.
    from tsaug_spark.pipeline.dedup import contamination_flags

    corpus = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q r s"), (3, "xy")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c x")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in contamination_flags(
            corpus, bench, threshold=0.5
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].n_shingles, out[1].n_hits) == (2, 1)
    assert out[1].overlap == 0.5 and out[1].contaminated
    assert (out[2].n_hits, out[2].contaminated) == (0, False)


# ---- unigram LM surprisal (pipeline/text.py) ----


def test_unigram_surprisal_closed_form(spark):
    """Hand corpus: 4 'the', 2 'cat', 1 'sat', 1 'x' (total 8).
    Surprisal cb = floor(100*(log2(8)-log2(c))): the=100, cat=200,
    sat=x=300.  Per-doc sums are exact integers."""
    from tsaug_spark.pipeline.text import unigram_surprisal

    docs = spark.createDataFrame(
        [
            (1, "The the THE the"),
            (2, "cat cat sat"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    assert out[1].n_tokens == 4
    assert out[1].sum_cb == 4 * 100 and out[1].avg_cb == 100.0
    assert out[2].sum_cb == 200 + 200 + 300
    assert out[3].sum_cb == 300 and out[3].avg_cb == 300.0


def test_unigram_surprisal_rare_scores_higher(spark):
    """Monotonicity on real data: a doc made of the corpus's rarest
    tokens scores strictly above one made of its commonest (the
    quality-filter ordering), and token-less docs are absent."""
    from tsaug_spark.pipeline.text import unigram_surprisal

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    out = unigram_surprisal(docs)
    got = {r.doc_id: r for r in out.collect()}
    import pyspark.sql.functions as F

    empties = {
        r.doc_id
        for r in docs.filter(
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit("[a-z]+"), 0
                )
            )
            == 0
        ).collect()
    }
    assert empties.isdisjoint(got)
    assert len(got) + len(empties) == docs.count()
    avg = sorted(r.avg_cb for r in got.values())
    assert avg[0] < avg[-1]  # scores actually spread


def test_type_token_ratio_closed_forms(spark):
    """All-distinct doc -> ttr 1; single repeated token -> 1/n;
    token-less docs absent."""
    from tsaug_spark.pipeline.text import type_token_ratio

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "spam spam spam spam"),
            (3, "123 !!!"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in type_token_ratio(docs).collect()}
    assert out[1].ttr == 1.0 and out[1].n_types == 3
    assert out[2].ttr == 0.25 and out[2].n_tokens == 4
    assert 3 not in out


def test_exact_media_dedup_collapses_identical_payloads(spark):
    """Identical payload bytes collapse to one fingerprint with the
    min-id survivor; distinct payloads stay apart (hashlib parity)."""
    import hashlib

    from tsaug_spark.pipeline.multimodal import (
        attach_payloads,
        exact_media_dedup,
    )

    docs = spark.createDataFrame(
        [(7, "same bytes"), (3, "same bytes"), (9, "other")],
        "doc_id long, text string",
    )
    out = {
        r.fp: r for r in exact_media_dedup(attach_payloads(docs)).collect()
    }
    fp_same = hashlib.sha256(b"same bytes").hexdigest()
    fp_other = hashlib.sha256(b"other").hexdigest()
    assert set(out) == {fp_same, fp_other}
    assert out[fp_same].n_copies == 2
    assert out[fp_same].survivor_id == 3
    assert out[fp_same].total_bytes == 2 * len(b"same bytes")
    assert out[fp_other].n_copies == 1


def test_ngram_containment_subsumed_document(spark):
    """A document fully embedded in a larger one: containment of the
    small side is 1.0 while Jaccard stays low — the asymmetry the
    measure exists for.  Both directions are emitted."""
    from tsaug_spark.pipeline.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        shingles,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    sh = shingles(docs)
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(sh, threshold=0.0).collect()
    }
    assert cont[(1, 2)] == 1.0       # small fully contained in big
    assert cont[(2, 1)] < 0.25       # big barely contained in small
    jac = ngram_jaccard_pairs(sh, threshold=0.5).collect()
    assert jac == []                 # Jaccard misses the subsumption


# ---- bigram LM NLL (pipeline/text.py) ----


def test_bigram_nll_closed_form(spark):
    """Hand corpus replayed literally in Python: corpus bigram and
    context counts, V, per-type floor(100*(log2(cx+V)-log2(cxy+1))),
    exact per-doc integer sums."""
    import math

    from tsaug_spark.pipeline.text import bigram_nll

    texts = {1: "a b a b", 2: "a b c", 3: "c"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    cxy, cx, vocab, doc_bg = {}, {}, set(), {}
    for d, t in texts.items():
        ws = t.split(" ")
        vocab |= set(ws)
        for x, y in zip(ws, ws[1:]):
            cxy[(x, y)] = cxy.get((x, y), 0) + 1
            cx[x] = cx.get(x, 0) + 1
            doc_bg.setdefault(d, []).append((x, y))
    V = len(vocab)
    cb = {
        k: math.floor(
            100 * (math.log2(cx[k[0]] + V) - math.log2(v + 1))
        )
        for k, v in cxy.items()
    }
    out = {r.doc_id: r for r in bigram_nll(docs).collect()}
    assert 3 not in out  # one word, no bigram
    for d in (1, 2):
        want = sum(cb[p] for p in doc_bg[d])
        assert out[d].n_bigrams == len(doc_bg[d])
        assert out[d].sum_cb == want
        assert out[d].avg_cb == want / len(doc_bg[d])


def test_bigram_nll_shuffled_text_scores_higher(spark):
    """Two docs with identical unigrams: the one whose transitions
    match the corpus scores strictly lower than the shuffled one."""
    from tsaug_spark.pipeline.text import bigram_nll

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "the cat sat on the mat"))
    rows.append((101, "mat the on sat cat the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_cb for r in bigram_nll(docs).collect()}
    assert out[100] < out[101]


# ---- PMI collocations (pipeline/text.py) ----


def test_pmi_collocations_hand_corpus(spark):
    """'new york' occurs 6x and only together; filler bigrams share
    common words: the exclusive pair must rank 1 with the exact
    centibit score."""
    import math

    from tsaug_spark.pipeline.text import pmi_collocations

    docs = spark.createDataFrame(
        [
            (1, "new york " * 6),
            (2, "the cat the dog the cat the dog the cat"),
            (3, "the cat the dog the cat the dog the cat"),
        ],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=3, top_k=10).collect()
    # both exclusive orientations ("new york" 6x, the wrap-around
    # "york new" 5x) outrank every shared-word filler pair
    assert {(r.x, r.y) for r in out[:2]} == {
        ("new", "york"),
        ("york", "new"),
    }
    (top,) = [r for r in out if (r.x, r.y) == ("new", "york")]
    assert top.rank <= 2
    # replay: c_xy=6 ... trailing space makes 'york'->'new' bigrams too
    cxy = {r0: {} for r0 in ()}
    # recompute corpus bigrams in python
    texts = [
        "new york " * 6,
        "the cat the dog the cat the dog the cat",
        "the cat the dog the cat the dog the cat",
    ]
    from collections import Counter

    bg = Counter()
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a and b:
                bg[(a, b)] += 1
    cx = Counter()
    cy = Counter()
    for (a, b), c in bg.items():
        cx[a] += c
        cy[b] += c
    tt = sum(bg.values())
    want = math.floor(
        100
        * (
            math.log2(bg[("new", "york")] * tt)
            - math.log2(cx["new"] * cy["york"])
        )
    )
    assert top.pmi_cb == want
    assert top.c_xy == bg[("new", "york")]


def test_pmi_collocations_min_count_floor(spark):
    """A once-seen pair between rare words would top raw PMI; the
    count floor must exclude it."""
    from tsaug_spark.pipeline.text import pmi_collocations

    docs = spark.createDataFrame(
        [
            (1, "aardvark zyzzyva"),
            (2, "the cat " * 10),
        ],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=3, top_k=10).collect()
    assert all((r.x, r.y) != ("aardvark", "zyzzyva") for r in out)
    assert any((r.x, r.y) == ("the", "cat") for r in out)


def test_generate_docs_dedup_corpus(spark):
    """The bench corpus is deterministic and has the advertised
    near-dup structure: exact copies of a template are byte-identical,
    mutated same-template docs keep high Jaccard, cross-template
    Jaccard is ~0 — and the full chain recovers the template cliques."""
    from tsaug_spark.datagen import generate_docs
    from tsaug_spark.pipeline.dedup import (
        dedup_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
    )

    docs = generate_docs(spark, 400, n_templates=50).cache()
    # deterministic across partitionings
    again = generate_docs(spark, 400, n_templates=50, partitions=7)
    assert (
        docs.join(again.withColumnRenamed("text", "t2"), "doc_id")
        .filter(F.col("text") != F.col("t2"))
        .count()
        == 0
    )
    # exact copies are byte-identical within a template
    nx = (
        docs.filter("is_exact = 1")
        .groupBy("template_id")
        .agg(F.count_distinct("text").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert nx == 1
    # the chain recovers template cliques: every verified pair is
    # same-template, and most templates collapse to one component
    sh = shingles(docs.select("doc_id", "text"))
    sig = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sig, max_bucket=256)
    verified = ngram_jaccard_pairs(sh, threshold=0.4, candidates=pairs)
    tpl = docs.select("doc_id", "template_id")
    cross = (
        verified.join(
            tpl.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "template_id", "ta"
            ),
            "id_a",
        )
        .join(
            tpl.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "template_id", "tb"
            ),
            "id_b",
        )
        .filter("ta != tb")
        .count()
    )
    assert cross == 0
    labels = dedup_clusters(verified, max_iters=30)
    n_comp = labels.select("component").distinct().count()
    assert 0 < n_comp <= 50
    docs.unpersist()
