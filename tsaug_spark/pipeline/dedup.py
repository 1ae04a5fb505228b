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

from tsaug_spark.lineage import truncate_lineage


def cap_hot_buckets(
    bands: DataFrame,
    keys: list[str],
    max_bucket: int,
) -> DataFrame:
    """Drop rows belonging to LSH buckets larger than ``max_bucket``.

    Any LSH banding scheme emits k*(k-1)/2 candidate pairs when k rows
    share a band value — and a 100 TB corpus has millions of EXACT
    duplicates, which share *every* band value.  Oversized buckets are
    almost always exact-dup clusters that belong in the cheap
    hash-aggregate exact-dedup pass (``exact_dedup``), not a pair join;
    this guard enforces that routing instead of assuming it.

    One aggregate over the band rows + an equi-join back on the same
    key (no extra shuffle shape beyond the join the caller is about to
    do anyway).  Callers can count the dropped buckets via
    ``hot_bucket_stats`` for logging/monitoring.
    """
    # anti-join against the (tiny, broadcastable) oversized-bucket set
    # instead of attaching a count to every band row: the build side
    # holds only the few hot buckets, not one entry per bucket
    return bands.join(
        F.broadcast(hot_bucket_stats(bands, keys, max_bucket)),
        keys,
        "left_anti",
    )


def hot_bucket_stats(
    bands: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """Per-bucket sizes of the buckets ``cap_hot_buckets`` would drop.

    Returns (key..., bucket_size) for oversized buckets — the
    log()-style counter a production job emits before deferring those
    documents to the exact-dedup path.
    """
    return (
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


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


def lsh_candidate_pairs(
    sig: DataFrame,
    n_bands: int = 4,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """Docs sharing any band signature — the LSH bucket join.

    One explode + ONE self-join on (band_idx, band_value): a per-band
    union of joins would recompute the signature aggregate once per
    branch per side (2 x n_bands full passes); exploding bands into
    rows computes it once and joins on a composite key whose
    distribution is as uniform as the band hashes themselves.

    ``max_bucket`` guards the k^2 blow-up from exact-duplicate clusters
    (k identical docs share every band): buckets above the cap are
    excluded from the join — those docs belong in ``exact_dedup``.
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
    if max_bucket is not None:
        bands = cap_hot_buckets(bands, ["band_idx", "band_val"], max_bucket)
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

    Verify mode attaches each side's distinct-shingle SET (one per-doc
    aggregate + two equi-joins on doc_id) and intersects per pair with
    ``array_intersect`` — cost is O(|candidates| * shingles_per_doc),
    a narrow codegen expression after the joins.  The shared-shingle
    self-join would instead stream one row per CO-OCCURRING SHINGLE of
    every candidate-adjacent pair through a join + an extra group-by
    shuffle: near-dup candidates share most of their shingles by
    construction, so that path re-shuffles ~|pairs| * |doc| rows to
    learn what the two set rows already hold.  Both paths compute the
    same exact distinct-shingle Jaccard.

    Verify mode does NOT pre-``distinct`` the corpus-wide shingles
    (that is a full-corpus shuffle): ``collect_set`` dedups within
    each doc, which IS the distinct-shingle set.  A size-ratio
    prescreen — ``J(A,B) <= min(|A|,|B|)/max(|A|,|B|)`` — sits as a
    row filter between the set joins and the intersect projection:
    it reads only the already-joined array sizes, so pairs that
    cannot reach ``threshold`` never pay the O(|A|+|B|)
    ``array_intersect``.  Conservative, so the output is identical to
    the unscreened computation.
    """
    if candidates is not None:
        # build sets only for candidate-adjacent docs: at production
        # scale the LSH shortlist touches a small fraction of the
        # corpus, so the semi-join keeps the collect_set aggregate
        # proportional to the shortlist, not the corpus
        ids = (
            candidates.select(F.col("id_a").alias("doc_id"))
            .unionByName(candidates.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        sets = (
            sh.join(ids, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("s").alias("ss"))
        )
        pa = sets.select(
            F.col("doc_id").alias("id_a"), F.col("ss").alias("sa")
        )
        pb = sets.select(
            F.col("doc_id").alias("id_b"), F.col("ss").alias("sb")
        )
        inter = F.size(F.array_intersect("sa", "sb"))
        union = F.size("sa") + F.size("sb") - inter
        # size-ratio prescreen as a ROW FILTER between the joins and
        # the intersect projection: J(A,B) <= min(|A|,|B|)/max(|A|,|B|)
        # uses only the already-joined array SIZES, so pairs that
        # cannot reach the threshold never pay the O(|A|+|B|)
        # array_intersect — no extra aggregate, join, or shuffle
        ratio_ok = (
            F.least(F.size("sa"), F.size("sb")).cast("double")
            >= F.lit(threshold)
            * F.greatest(F.size("sa"), F.size("sb"))
        )
        return (
            candidates.select("id_a", "id_b")
            .join(pa, "id_a")
            .join(pb, "id_b")
            .filter(ratio_ok)
            .withColumn("jaccard", inter / union.cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        )
    ds = sh.distinct()
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ds.select(F.col("doc_id").alias("id_a"), "s")
    b = ds.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
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
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= ``max_hamming``.

    Banded LSH join, then exact verify: split each signature into
    ``n_bands`` contiguous bit bands; by pigeonhole, two signatures
    within Hamming distance ``max_hamming < n_bands`` agree exactly on
    at least one band, so the per-band equi-joins find EVERY qualifying
    pair (this is exact, not approximate) while joining on near-uniform
    band keys instead of doing an all-pairs scan.  Candidates are then
    verified with ``bit_count(a XOR b)``.

    ``max_bucket`` (optional) excludes band buckets larger than the cap
    from the join — the k^2 guard for exact-duplicate clusters, which
    should be collapsed by ``exact_dedup`` first (capping trades the
    pigeonhole exactness *inside oversized buckets* for boundedness;
    with exact-dups pre-collapsed no legitimate bucket approaches the
    cap).
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
    if max_bucket is not None:
        bands = cap_hot_buckets(bands, ["band_idx", "band_val"], max_bucket)
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

    Min-label propagation WITH POINTER JUMPING to fixpoint: each
    round, a doc's label first drops to the minimum of its own and its
    neighbours' labels (one equi-join + hash aggregate), then takes
    one path-compression hop — ``label <- label[label]`` (labels are
    doc ids of nodes in the same component, so the lookup always
    resolves, and a node's label only ever decreases, so the hop is
    monotone toward the component min).  Plain propagation needs
    diameter-many rounds — a CHAIN of near-dups (doc_i ~ doc_{i+1},
    the classic template-drift pattern) makes that O(n); the jump
    halves the remaining label-tree depth each round, so convergence
    is O(log diameter) — the pointer-doubling bound of classic
    PRAM/MapReduce connected components (Shiloach-Vishkin).
    Per-round lineage truncation via ``truncate_lineage`` (the
    standard Spark pattern for bounded fixpoint loops): a zero-I/O
    ``localCheckpoint`` by default, or a reliable
    ``DataFrame.checkpoint`` surviving executor loss when a checkpoint
    dir is configured — see tsaug_spark/lineage.py.

    The convergence check is folded into the round itself: the ``chg``
    flag is computed in the SAME projection that produces the new
    labels, so the per-round driver action is a single aggregate scan
    over the already-materialized (the truncation is eager) label
    partitions — no second join/pass over labels per round.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iters`` (a silent fall-through would return wrong components
    for any graph whose diameter exceeds the bound).
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
        .transform(truncate_lineage)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .transform(truncate_lineage)
    )
    changed = 0
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
        new_component = F.least(
            F.col("component"),
            F.coalesce("nbr_min", F.col("component")),
        )
        # eager truncation on purpose: m1 is referenced twice (itself
        # + as the jump parent); a LAZY checkpoint would let the two
        # join branches race to compute the same partitions inside one
        # job (measured 1.2-1.4x slower) — the eager job materializes
        # once and both branches read the cached blocks
        m1 = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                new_component.alias("m1_component"),
                F.col("component").alias("old_component"),
            )
            .transform(truncate_lineage)
        )
        # pointer jump: label <- label[label].  The parent row always
        # exists (labels are node ids) and parent.component <= its own
        # doc_id (labels only decrease), so the hop is monotone.
        parent = m1.select(
            F.col("doc_id").alias("p_id"),
            F.col("m1_component").alias("p_component"),
        )
        new = (
            m1.join(parent, m1["m1_component"] == parent["p_id"])
            .select(
                "doc_id",
                F.least("m1_component", "p_component").alias(
                    "component"
                ),
                (
                    F.least("m1_component", "p_component")
                    != F.col("old_component")
                )
                .cast("int")
                .alias("chg"),
            )
            .transform(truncate_lineage)
        )
        changed = new.agg(F.sum("chg").alias("c")).first()["c"] or 0
        labels = new.drop("chg")
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing); the pair graph's "
            "component diameter exceeds max_iters — raise it"
        )
    return labels


def hyperplane_bands(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_width: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Multi-band random-hyperplane LSH keys: one row per (vector, band).

    ``n_bands * band_width`` seeded hyperplanes are drawn in ONE
    ``RandomState(seed).normal`` call (so oracles can replay them) and
    shipped as a single array-of-arrays literal — the same trick that
    keeps the IVF centroid assignment a narrow plan instead of a CASE
    chain.  Each band's key is the ``band_width``-bit sign pattern of
    its planes' projections; sign bits are computed once via one
    ``transform`` over the plane literal, then folded per band.

    Output: (vid, v, band_idx, band_val).
    """
    import numpy as np

    dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_bands * band_width, dim))
    planes_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in p])
            for p in planes
        ]
    )

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = emb.select(F.col(id_col).alias("vid"), v.alias("v"))

    # sign bit per plane, one pass: bits[i] = 1 if <v, plane_i> >= 0
    bits = F.transform(
        planes_lit,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(F.col("v"), p, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
            >= 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    e = e.withColumn("bits", bits)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.aggregate(
                    F.slice("bits", b * band_width + 1, band_width),
                    F.lit(0).cast("long"),
                    lambda acc, bit: acc * 2 + bit,
                ).alias("v"),
            )
            for b in range(n_bands)
        ]
    )
    return e.select(
        "vid", "v", F.explode(band_structs).alias("band")
    ).select(
        "vid",
        "v",
        F.col("band.b").alias("band_idx"),
        F.col("band.v").alias("band_val"),
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_width: int = 16,
    seed: int = 7,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-BAND
    random-hyperplane LSH + exact-cosine verify.

    Each vector gets ``n_bands`` independent ``band_width``-bit sign
    keys; candidates are pairs agreeing on ANY band (one self-join on
    the exploded (band_idx, band_val) rows — never all-pairs), deduped,
    then verified with the exact cosine.

    Why multi-band: a single w-bit key gives 2^w buckets, so the
    within-bucket exact stage is TH(N^2 / 2^w) — a constant-factor
    reduction that dies at corpus scale.  With bands, per-band bucket
    occupancy is ~N / 2^band_width (65536 buckets at the default 16),
    and recall is 1 - (1 - p^w)^n_bands for per-plane agreement
    p = 1 - acos(cos)/pi — the same recall shape, bounded occupancy
    (the structure ``simhash_pairs`` already uses).

    ``max_bucket`` additionally drops oversized band buckets (exact-dup
    clusters belong in ``exact_dedup`` / vector-hash dedup first).
    """
    bands = hyperplane_bands(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        n_bands=n_bands,
        band_width=band_width,
        seed=seed,
    )
    if max_bucket is not None:
        bands = cap_hot_buckets(
            bands, ["band_idx", "band_val"], max_bucket
        )

    a = bands.select(
        F.col("vid").alias("id_a"),
        F.col("v").alias("va"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("vid").alias("id_b"),
        F.col("v").alias("vb"),
        "band_idx",
        "band_val",
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
    # dedup candidates on ids BEFORE the cosine verify so a pair
    # colliding in several bands pays the O(dim) dot product once
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    width: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: for each corpus document, the
    fraction of its DISTINCT word ``width``-gram shingles that also
    appear in ``benchmark`` — the standard n-gram-overlap test that
    keeps eval data out of a training corpus.

    The benchmark shingle dim (an eval suite — thousands of documents,
    not billions) deduplicates to a broadcastable set, so the overlap
    count is a broadcast semi-join against every corpus shingle: one
    narrow pass over the corpus, no corpus-side self-join, no shuffle
    of raw text.  Counts are exact integers; the overlap ratio is one
    shared float division, and the flag compares against ``threshold``
    on that single expression — deterministic in any engine.

    Output: doc_id, n_shingles, n_hits, overlap, contaminated.
    """
    corpus_sh = shingles(docs, text_col, id_col, width).distinct()
    bench_sh = (
        shingles(benchmark, text_col, id_col, width)
        .select("s")
        .distinct()
    )
    totals = corpus_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    overlap = F.col("n_hits").cast("double") / F.col(
        "n_shingles"
    ).cast("double")
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn(
            "n_hits", F.coalesce("n_hits", F.lit(0).cast("long"))
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            overlap.alias("overlap"),
            (overlap >= F.lit(threshold)).alias("contaminated"),
        )
    )


def ngram_containment_pairs(
    sh: DataFrame,
    threshold: float = 0.8,
    candidates: "Optional[DataFrame]" = None,
) -> DataFrame:
    """Directional shingle CONTAINMENT |A∩B| / |A| for ordered pairs —
    the near-dup measure for SUBSUMED documents (a quote-heavy page or
    a doc embedded inside a larger one scores low Jaccard but high
    containment of the smaller side; Broder 1997 distinguishes exactly
    these two resemblance measures).

    Same bucketed plan shape as :func:`ngram_jaccard_pairs` (shared
    shingle equi-join, never all-pairs; ``candidates`` prunes both
    sides for LSH-then-verify mode), but emits BOTH directions of each
    intersecting pair since containment is asymmetric.  The score is
    one division of exact intersection/set-size integers.

    Output: id_a, id_b, containment (of id_a's shingles in id_b).
    """
    ds = sh.distinct()
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ds.select(F.col("doc_id").alias("id_a"), "s")
    b = ds.select(F.col("doc_id").alias("id_b"), "s")
    if candidates is not None:
        a = a.join(
            candidates.select("id_a").distinct(), "id_a", "left_semi"
        )
        b = b.join(
            candidates.select("id_b").distinct(), "id_b", "left_semi"
        )
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    na = sizes.select(
        F.col("doc_id").alias("id_a"), F.col("n").alias("na")
    )
    return (
        inter.join(na, "id_a")
        .withColumn(
            "containment",
            F.col("inter") / F.col("na").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a", "id_b", F.round("containment", 4).alias("containment")
        )
    )


def edit_near_dup(
    docs: DataFrame,
    max_edits: int = 64,
    max_ned: float = 0.2,
    n_bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Edit-distance-verified near-duplicates: MinHash-LSH candidates
    re-checked with a BOUNDED Levenshtein distance — the character-
    level verify for OCR noise / template fills that shingle Jaccard
    (token-level) under-weights.

    A pair survives when ``lev(a, b) <= max_edits`` AND the normalized
    distance ``lev / max(len_a, len_b) <= max_ned``.  The Spark side
    uses the THRESHOLDED ``levenshtein(l, r, threshold)`` form, which
    abandons a pair in O(len * threshold) instead of O(len_a * len_b)
    — the property that keeps the verify affordable when LSH emits a
    long-document candidate; candidates themselves come from the same
    banded, never-all-pairs bucket join as ``lsh_candidate_pairs``.

    Output: id_a, id_b, dist, ned (exact integer distance, one shared
    division for ned).
    """
    sig = minhash_signatures(
        shingles(docs, text_col=text_col, id_col=id_col),
        n_bands=n_bands,
    )
    cand = lsh_candidate_pairs(sig, n_bands=n_bands)
    txt = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("txt")
    )
    pairs = (
        cand.join(
            txt.select(
                F.col("doc_id").alias("id_a"),
                F.col("txt").alias("ta"),
            ),
            "id_a",
        )
        .join(
            txt.select(
                F.col("doc_id").alias("id_b"),
                F.col("txt").alias("tb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein(
                F.col("ta"), F.col("tb"), max_edits + 1
            ).alias("dist"),
            F.greatest(F.length("ta"), F.length("tb"))
            .cast("long")
            .alias("mlen"),
        )
    )
    return (
        pairs.filter(
            (F.col("dist") >= 0) & (F.col("dist") <= max_edits)
        )
        .select(
            "id_a",
            "id_b",
            F.col("dist").cast("long").alias("dist"),
            (
                F.col("dist").cast("double")
                / F.col("mlen").cast("double")
            ).alias("ned"),
        )
        .filter(F.col("ned") <= F.lit(max_ned))
    )
