"""Similarity search over embedding columns.

* ``cosine_scores`` / ``cosine_topk`` — brute-force cosine against a
  query vector: one narrow map (sequential fold over the array — JVM
  codegen, no Python) + a top-k sort.  The exactness baseline.
* ``ivf_index`` / ``ivf_topk`` — inverted-file ANN: a driver-side k-means
  over a sample builds C coarse centroids (broadcast), every vector is
  assigned to its nearest centroid (one narrow map), and a query probes
  only the ``n_probe`` nearest cells.  Scan cost drops by ~C/n_probe;
  at 100 TB the assignment is the only full pass and is embarrassingly
  parallel.
"""

from __future__ import annotations

from typing import List

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _fold_dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _lit_vec(vals) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def cosine_scores(
    emb: DataFrame,
    query: List[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine of every vector vs a literal query vector."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    v = _as_double(vec_col)
    dot = _fold_dot(v, _lit_vec(q))
    norm = F.sqrt(_fold_dot(v, v))
    return emb.select(
        F.col(id_col),
        (dot / (norm * F.lit(qn))).alias("cos"),
    )


def cosine_topk(
    emb: DataFrame,
    query: List[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    return (
        cosine_scores(emb, query, id_col, vec_col)
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def ivf_index(
    emb: DataFrame,
    n_cells: int = 16,
    sample: int = 2000,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Assign every vector to its nearest coarse centroid.

    Centroids come from NumPy Lloyd's over a driver-side sample (the
    index build); the assignment itself is a Catalyst expression over
    broadcast centroid literals — a single narrow pass, no shuffle.
    Returns (indexed DataFrame with a ``cell`` column, centroids).
    """
    rows = (
        emb.select(vec_col)
        .limit(sample)
        .toPandas()[vec_col]
        .tolist()
    )
    X = np.asarray(rows, dtype=np.float64)
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(15):
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    # one array-of-struct centroid literal + a transform/array_min pair:
    # the per-vector distance fold appears ONCE in the plan regardless of
    # n_cells (a per-cell CASE chain duplicates it n_cells times, blowing
    # up the plan past ~64 cells); struct ordering compares d2 first then
    # cell, so exact-tie behavior matches argmin's first-index rule
    v = _as_double(vec_col)
    cents = F.array(
        *[
            F.struct(
                F.lit(c).alias("cell"), _lit_vec(cen).alias("cen")
            )
            for c, cen in enumerate(centroids)
        ]
    )
    d2s = F.transform(
        cents,
        lambda s: F.struct(
            _fold_dot(
                F.zip_with(v, s["cen"], lambda a, b: a - b),
                F.zip_with(v, s["cen"], lambda a, b: a - b),
            ).alias("d2"),
            s["cell"].alias("cell"),
        ),
    )
    return (
        emb.withColumn("cell", F.array_min(d2s)["cell"]),
        centroids,
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: List[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine among the ``n_probe`` cells nearest the query."""
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probe = [int(c) for c in order[:n_probe]]
    return (
        cosine_scores(
            indexed.filter(F.col("cell").isin(probe)), q, id_col, vec_col
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def knn_join(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_width: int = 16,
    seed: int = 7,
    max_bucket: "int | None" = None,
) -> DataFrame:
    """Approximate kNN self-join: each vector's top-``k`` cosine
    neighbors AMONG its multi-band hyperplane-LSH candidates — the
    "nearest neighbors for every item" primitive behind semantic dedup
    review queues and kNN-graph clustering, without an all-pairs pass.

    Candidates come from the same bounded-occupancy banded join as
    :func:`tsaug_spark.pipeline.dedup.embedding_near_dup` (pairs
    agreeing on ANY band, deduped before scoring so a pair colliding in
    several bands pays the O(dim) dot product once; both directions are
    kept because each side ranks its own neighborhood).  Exact cosine
    re-rank, then ONE row_number window per anchor id.  Recall misses
    only neighbors that disagree on every band (probability
    ``(1 - p^w)^n_bands`` with per-plane agreement p).

    Determinism: the cosine is the canonical left fold over vector
    elements (``_fold_dot``), replayed token-for-token by the oracle,
    so ranks (ordered by cos DESC, id_b) never diverge between
    engines.

    Output: id_a, id_b, rank (1-based), cos (rounded for display;
    ranking uses the raw double).
    """
    from pyspark.sql import Window

    from tsaug_spark.pipeline.dedup import (
        cap_hot_buckets,
        hyperplane_bands,
    )

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
    cos = _fold_dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_fold_dot(F.col("va"), F.col("va")))
        * F.sqrt(_fold_dot(F.col("vb"), F.col("vb")))
    )
    scored = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("c", cos)
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("c"), "id_b")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "id_a", "id_b", "rank", F.round("c", 4).alias("cos")
        )
    )


def sq8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8 scalar quantization of an embedding column with per-
    DIMENSION [min, max] ranges — the 4x memory compression an ANN
    index applies before it can hold billions of vectors in RAM
    (FAISS SQ8 / Lucene scalar quantizer shape).

        code_d  = floor((x_d - min_d) * 255 / (max_d - min_d))
        recon_d = min_d + code_d * (max_d - min_d) / 255

    Returns one row per vector: the uint8 code array, the exact
    reconstruction MSE and max-abs error (dims folded in dimension
    order — deterministic accumulation).  Per-dim ranges come from one
    dimension-bounded aggregate (posexplode -> groupBy dim: the
    shuffle carries |dims| groups, not |vectors|), broadcast back.
    Constant dimensions (max == min) code to 0 and reconstruct to the
    constant exactly.

    Scale: one narrow pass to build ranges (map-side combine over 64
    groups), one broadcast join + projection for the codes — no
    vector ever crosses the wire twice.
    """
    dims = emb.select(
        F.posexplode(F.col(vec_col)).alias("d", "x")
    ).groupBy("d").agg(
        F.min(F.col("x").cast("double")).alias("lo"),
        F.max(F.col("x").cast("double")).alias("hi"),
    )
    ranges = F.broadcast(
        dims.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct("d", "lo", "hi"))
            ).alias("rng")
        )
    )
    x_d = lambda i: F.element_at(F.col(vec_col), i + 1).cast("double")
    lo_d = lambda i: F.element_at(F.col("rng"), i + 1)["lo"]
    hi_d = lambda i: F.element_at(F.col("rng"), i + 1)["hi"]
    coded = emb.crossJoin(ranges).select(
        F.col(id_col),
        F.col(vec_col),
        "rng",
        F.transform(
            F.sequence(F.lit(0), F.size(vec_col) - 1),
            lambda i: F.when(
                F.element_at(F.col("rng"), i + 1)["hi"]
                > F.element_at(F.col("rng"), i + 1)["lo"],
                F.floor(
                    (
                        F.element_at(F.col(vec_col), i + 1).cast("double")
                        - F.element_at(F.col("rng"), i + 1)["lo"]
                    )
                    * F.lit(255.0)
                    / (
                        F.element_at(F.col("rng"), i + 1)["hi"]
                        - F.element_at(F.col("rng"), i + 1)["lo"]
                    )
                ),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        ).alias("code"),
    )
    recon = lambda i: F.element_at(F.col("rng"), i + 1)["lo"] + F.element_at(
        F.col("code"), i + 1
    ).cast("double") * (
        F.element_at(F.col("rng"), i + 1)["hi"]
        - F.element_at(F.col("rng"), i + 1)["lo"]
    ) / F.lit(255.0)
    err = lambda i: (
        F.element_at(F.col(vec_col), i + 1).cast("double") - recon(i)
    )
    idxs = F.sequence(F.lit(0), F.size(vec_col) - 1)
    return coded.select(
        id_col,
        "code",
        (
            F.aggregate(
                idxs, F.lit(0.0), lambda a, i: a + err(i) * err(i)
            )
            / F.size(vec_col).cast("double")
        ).alias("mse"),
        F.aggregate(
            idxs,
            F.lit(0.0),
            lambda a, i: F.greatest(a, F.abs(err(i))),
        ).alias("max_abs_err"),
    )


def label_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10**6,
) -> DataFrame:
    """Per-label centroid of an embedding column at (label, dim)
    grain — the class-prototype table behind nearest-centroid
    classification, drift monitoring, and IVF seeding.

    Determinism: each float32 component is quantized ONCE to integer
    micro-units (round(v * scale)); per-dimension sums are then exact
    BIGINT folds (order-free — float summation across a shuffle is
    not), and the centroid is one shared float division sum/(n*scale).
    Quantization error is 5e-7 per component, far below float32's own
    resolution for unit-scale embeddings.

    Scale: posexplode is a narrow map (rows x dims, no shuffle of the
    vectors themselves); one (label, dim) hash aggregate with map-side
    combine ships labels x dims rows, not vectors.
    """
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select(
        "label",
        "dim",
        F.round(F.col("v").cast("double") * F.lit(int(scale)), 0)
        .cast("long")
        .alias("q"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("sum_micro"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("dim").cast("long").alias("dim"),
            F.col("n").cast("long").alias("n"),
            F.col("sum_micro").cast("long").alias("sum_micro"),
            (
                F.col("sum_micro").cast("double")
                / (F.col("n").cast("double") * F.lit(float(scale)))
            ).alias("centroid"),
        )
    )


def centroid_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10**6,
) -> DataFrame:
    """Nearest-centroid classification audit: assign every vector to
    its closest :func:`label_centroids` prototype and report the
    confusion counts (actual label, predicted label, n) — the
    one-pass "are these labels even separable" check run before
    anything fancier, and the assignment kernel IVF uses.

    Determinism: with q the micro-quantized components and (n_l,
    sum_l) the exact per-label integer centroid stats, the squared
    distance to label l is

        d2_l = Sum_dim (n_l * q - sum_l)^2 / (n_l^2 * scale^2)

    whose NUMERATOR is an exact int64 sum (n*q ~ 1e6-scale micro
    units squared, x dims — far under 2^63 for <=1e3-dim unit
    vectors); the division is one shared float op and argmin is a
    SELECTION over the label-bounded candidate set with (d2, label)
    tie-breaks — order-free in both engines.

    Scale: vectors x labels x dims narrow join against the broadcast
    centroid table — the standard nearest-centroid cost, no
    all-pairs; one (vec, label) aggregate, one argmin window over L
    candidates per vector, one confusion-grain aggregate.
    """
    cent = label_centroids(
        emb, id_col=id_col, vec_col=vec_col,
        label_col=label_col, scale=scale,
    ).select(
        F.col("label").alias("clabel"),
        "dim",
        F.col("n").alias("cn"),
        "sum_micro",
    )
    exploded = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).cast("long").alias("actual"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select(
        "vid",
        "actual",
        "dim",
        F.round(F.col("v").cast("double") * F.lit(int(scale)), 0)
        .cast("long")
        .alias("q"),
    )
    per_pair = (
        exploded.join(F.broadcast(cent), "dim")
        .select(
            "vid",
            "actual",
            "clabel",
            "cn",
            (
                (F.col("cn") * F.col("q") - F.col("sum_micro"))
                * (F.col("cn") * F.col("q") - F.col("sum_micro"))
            ).alias("sq"),
        )
        .groupBy("vid", "actual", "clabel", "cn")
        .agg(F.sum("sq").alias("num"))
        .select(
            "vid",
            "actual",
            "clabel",
            (
                F.col("num").cast("double")
                / (
                    (F.col("cn") * F.col("cn")).cast("double")
                    * F.lit(float(scale) * float(scale))
                )
            ).alias("d2"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vid").orderBy(
        F.col("d2").asc(), F.col("clabel").asc()
    )
    assigned = per_pair.select(
        "vid",
        "actual",
        F.col("clabel").alias("predicted"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    return (
        assigned.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "actual",
            "predicted",
            F.col("n").cast("long").alias("n"),
        )
    )
