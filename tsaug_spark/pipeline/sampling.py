"""Deterministic hash sampling and train/val/test splitting.

A 100 TB training-data pipeline cannot use ``df.sample()`` for split
assignment: partition-order-dependent RNG means membership changes
whenever the file layout, cluster size, or Spark version changes, and
a document's split must never flip between runs (train/test leakage).
The standard fix is content-keyed hashing — bucket = md5(id || salt)
mod N — which is stable under any re-partitioning, reproducible on any
engine, and needs no shuffle at all (a narrow projection; Catalyst
keeps it inside whole-stage codegen).

``salt`` namespaces independent draws: the same corpus can be split
one way for experiment A and another for experiment B by changing the
salt, while each stays internally stable.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket resolution: 32 hash bits folded mod 1e4 gives 0.01% split
#: granularity with no detectable bias (md5 is uniform on hex prefixes)
N_BUCKETS = 10_000


def hash_bucket(
    id_col: str, salt: str = "", n_buckets: int = N_BUCKETS
) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from an id.

    First 8 hex chars of md5(id || salt) parsed base-16 (32 bits), mod
    ``n_buckets`` — bit-reproducible in any engine with md5 (the DuckDB
    oracle replays it verbatim).
    """
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep a stable ``fraction`` of rows, keyed by ``id_col``.

    Unlike ``df.sample``, re-running on a re-partitioned (or grown)
    table keeps exactly the same ids — new rows join the sample iff
    their hash falls in the window, so incremental ingest composes.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * N_BUCKETS))
    return df.where(hash_bucket(id_col, salt) < F.lit(cut))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing step.

    Training corpora are blended by source/domain at explicit rates
    ("keep all of wiki, 30% of web, 5% of logs").  ``fractions`` maps a
    ``strata_col`` value to its keep-rate; strata not listed get
    ``default_fraction``.  Membership is keyed by ``hash_bucket(id ||
    salt)``, so the mix is stable under repartitioning and incremental
    ingest, per-row (no shuffle, no per-stratum scan), and upsampling a
    stratum later (raising its fraction) strictly GROWS its kept set —
    earlier epochs' samples remain subsets, which lets curriculum
    schedules reuse cached shards.
    """
    for val, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(
                f"fraction for {val!r} must be in [0, 1], got {frac}"
            )
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0, 1], got {default_fraction}"
        )
    bucket = hash_bucket(id_col, salt)
    cut = None
    for val, frac in fractions.items():
        clause = F.col(strata_col) == F.lit(val)
        n = F.lit(int(round(frac * N_BUCKETS)))
        cut = F.when(clause, n) if cut is None else cut.when(clause, n)
    default_cut = F.lit(int(round(default_fraction * N_BUCKETS)))
    cut = default_cut if cut is None else cut.otherwise(default_cut)
    return df.where(bucket < cut)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split, deterministically.

    ``weights`` maps split name -> fraction (must sum to 1 within
    1/N_BUCKETS); splits occupy consecutive bucket ranges in the
    mapping's iteration order, so the assignment is total and disjoint
    by construction.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    weights = dict(weights)
    if not weights:
        raise ValueError("weights must name at least one split")
    total = sum(weights.values())
    if abs(total - 1.0) > 1.0 / N_BUCKETS:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cut = int(round(acc * N_BUCKETS))
        clause = bucket < F.lit(cut)
        expr = (
            F.when(clause, F.lit(name))
            if expr is None
            else expr.when(clause, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 64,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement —
    Efraimidis-Spirakis (2006) A-ES: each row draws u in (0, 1) from
    its id hash and keeps key = ln(u) / w; the k LARGEST keys are an
    exact weighted sample without replacement.  Deterministic under
    repartitioning, cluster resize, and incremental ingest (the same
    contract as :func:`hash_split` — the draw depends only on id and
    salt), so the curation sample a dashboard audited yesterday is the
    same sample tomorrow.

    u = (h + 0.5) / 2^60 with h the first 60 bits of md5(id || ':' ||
    salt) — strictly inside (0, 1), no log(0).  The only float ops are
    one parse, one division, one ln, one divide-by-weight, identical
    expressions in both engines; ranking tie-breaks on id.

    Scale: one narrow projection + one per-stratum top-k window — the
    same cost as any top-k; no shuffle beyond the stratum partition.
    """
    strat = (
        F.col(stratum_col) if stratum_col else F.lit("all")
    ).alias("stratum")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(":" + salt))),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    base = df.filter(F.col(weight_col) > 0).select(
        strat,
        F.col(id_col).alias("id"),
        F.col(weight_col).alias("weight"),
        key.alias("skey"),
    )
    w = Window.partitionBy("stratum").orderBy(
        F.col("skey").desc(), F.col("id").asc()
    )
    return (
        base.select(
            "stratum",
            "id",
            "weight",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def reservoir_k(
    df: DataFrame,
    k: int = 10,
    stratum_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Deterministic uniform k-sample per stratum — the distributed
    reservoir: every row's priority is md5(id) (a uniform 128-bit hex
    string) and the sample is the k smallest priorities per stratum.
    Unlike ``df.sample`` the result is stable under re-partitioning,
    cluster resize and re-runs, and unlike a sequential reservoir it
    needs no order — min-k by hash IS a mergeable reservoir (the same
    property KMV sketches exploit), so Spark's window-group-limit
    optimization keeps only k rows per stratum per task before the
    shuffle.

    Exactness: the priority is a lowercase hex STRING compared
    byte-wise — identical ordering in any engine with md5.
    """
    w = Window.partitionBy("stratum").orderBy("priority", "id")
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).cast("string").alias("id"),
        F.md5(F.col(id_col).cast("string")).alias("priority"),
    )
    return (
        base.select(
            "stratum",
            "id",
            "priority",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= int(k))
    )
