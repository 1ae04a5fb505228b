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
    # the real decoder is an explicit stub
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
