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
