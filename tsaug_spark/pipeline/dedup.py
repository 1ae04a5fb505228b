"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-duplicates.

All are pure DataFrame transforms (Catalyst-native expressions — no
Python UDFs), built on cryptographic/string hashes (md5) so results are
engine-independent and oracle-checkable.

Scale notes (100 TB corpus):

* exact dedup is one hash-aggregate — the canonical shuffle-once op;
* MinHash: signature computation is a narrow map + per-doc aggregate;
  LSH candidate generation joins on band signatures, whose distribution
  is near-uniform (md5), so the join does not skew; the final verify
  step (exact Jaccard) runs only on candidates;
* ``ngram_jaccard_pairs`` joins on shingles — correct but quadratic in
  duplicated content; at scale it is the *verify* stage downstream of
  LSH, never the discovery stage (pass ``candidates`` to restrict it);
* SimHash is a per-doc aggregate; ``simhash_pairs`` finds the near-dups
  with a banded equi-join (exact for Hamming radius < n_bands by
  pigeonhole) + a ``bit_count(xor)`` verify — never all-pairs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts by md5; keep the smallest id per group."""
    return df.groupBy(F.md5(text_col).alias("fp")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("copies")
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 3,
) -> DataFrame:
    """Word w-gram shingles per document (docs with >= width tokens)."""
    words = F.split(F.col(text_col), " ")
    d = df.withColumn("ws", words).filter(F.size("ws") >= width)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("ws") - width),
        lambda i: F.concat_ws(
            " ",
            *[F.element_at(F.col("ws"), i + k + 1) for k in range(width)],
        ),
    )
    return d.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("s"))


def minhash_signatures(
    sh: DataFrame, n_bands: int = 4
) -> DataFrame:
    """Per-doc MinHash signature: min md5(shingle || '|band') per band.

    md5 is a uniform hash, so the min over shingles approximates the
    Jaccard-preserving MinHash; one aggregate computes all bands.
    """
    aggs = [
        F.min(F.md5(F.concat(F.col("s"), F.lit(f"|{b}")))).alias(f"sig{b}")
        for b in range(n_bands)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, n_bands: int = 4) -> DataFrame:
    """Docs sharing any band signature — the LSH bucket join.

    One explode + ONE self-join on (band_idx, band_value): a per-band
    union of joins would recompute the signature aggregate once per
    branch per side (2 x n_bands full passes); exploding bands into
    rows computes it once and joins on a composite key whose
    distribution is as uniform as the band hashes themselves.
    """
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.col(f"sig{b}").alias("v"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id",
        F.col("band.b").alias("band_idx"),
        F.col("band.v").alias("band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_val"
    )
    c = bands.select(
        F.col("doc_id").alias("id_b"), "band_idx", "band_val"
    )
    return (
        a.join(c, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    sh: DataFrame,
    threshold: float = 0.5,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs above ``threshold``.

    With ``candidates`` (id_a, id_b) this verifies only those pairs —
    the LSH-then-verify pattern; without, it discovers pairs by joining
    on shared shingles (small-corpus / test path).
    """
    ds = sh.distinct()
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ds.select(F.col("doc_id").alias("id_a"), "s")
    b = ds.select(F.col("doc_id").alias("id_b"), "s")
    if candidates is not None:
        # prune the shingle sides BEFORE the self-join so verify-mode
        # cost is proportional to the candidate set, not corpus^2; the
        # pair-level semi-join below still enforces exact membership
        a = a.join(
            candidates.select("id_a").distinct(), "id_a", "left_semi"
        )
        b = b.join(
            candidates.select("id_b").distinct(), "id_b", "left_semi"
        )
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash signature from per-word 60-bit md5 prefixes.

    bit b of the signature is the sign of sum(+-1) over words' bit b.
    """
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    w = w.select("doc_id", h.alias("h"))
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1
            ).otherwise(-1)
        ).alias(f"w{b}")
        for b in range(bits)
    ]
    sums = w.groupBy("doc_id").agg(*aggs)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"w{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= ``max_hamming``.

    Banded LSH join, then exact verify: split each signature into
    ``n_bands`` contiguous bit bands; by pigeonhole, two signatures
    within Hamming distance ``max_hamming < n_bands`` agree exactly on
    at least one band, so the per-band equi-joins find EVERY qualifying
    pair (this is exact, not approximate) while joining on near-uniform
    band keys instead of doing an all-pairs scan.  Candidates are then
    verified with ``bit_count(a XOR b)``.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            "exactness needs max_hamming < n_bands (pigeonhole)"
        )
    if bits % n_bands:
        raise ValueError("bits must divide evenly into n_bands")
    sig = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    w = bits // n_bands
    mask = (1 << w) - 1
    # explode bands into rows so the signature aggregate is computed
    # ONCE and a single self-join on (band_idx, band_value) finds all
    # collisions (a per-band union would recompute it 2 x n_bands times)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("simhash"), b * w)
                        .bitwiseAND(mask)
                        .alias("v"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        F.col("band.b").alias("band_idx"),
        F.col("band.v").alias("band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sig_a"),
        "band_idx",
        "band_val",
    )
    c = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sig_b"),
        "band_idx",
        "band_val",
    )
    pairs = (
        a.join(c, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
    )
    ham = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).cast("long")
    return (
        pairs.distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Connected components over near-duplicate pairs: every doc in a
    transitively-connected dup group gets the group's MIN doc id as its
    ``component`` — the canonical survivor for dedup survivorship.

    Min-label propagation to fixpoint: each round, a doc's label drops
    to the minimum of its own and its neighbours' labels (one equi-join
    + hash aggregate per round).  Rounds needed = component diameter;
    near-dup clusters are near-cliques (LSH pairs), so a handful of
    rounds converge and ``max_iters`` is a safety bound, not the cost.
    Per-round ``localCheckpoint`` truncates the iterative lineage (the
    standard Spark pattern for bounded fixpoint loops); the driver-side
    convergence check is one count per round.
    """
    edges = (
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("component").alias("nbr_component"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_component").alias("nbr_min"))
            .withColumnRenamed("src", "doc_id")
        )
        new = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_min", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Vectors are bucketed by the sign pattern of ``n_planes`` seeded
    random projections (an ``n_planes``-bit key); only same-bucket pairs
    get the exact cosine check.  Collision probability for cosine c is
    ``(1 - acos(c)/pi) ** n_planes`` — near-dups (c ~ 1) almost always
    collide, and the bucket join replaces the quadratic cross join.
    """
    import numpy as np

    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = emb.select(F.col(id_col).alias("vid"), v.alias("v"))

    def dot_lit(plane):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(
            F.zip_with(F.col("v"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    key = None
    for i in range(n_planes):
        bit = F.when(dot_lit(planes[i]) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        key = bit if key is None else key + bit
    e = e.withColumn("bucket", key)

    a = e.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = e.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
