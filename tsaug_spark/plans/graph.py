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

from tsaug_spark.lineage import truncate_lineage, truncate_lineage_lazy


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

    Orientation key: okey(n) = deg(n) * 2^23 + n (degree-major, id
    tie-break).  The packing needs 0 <= n < 2^23 (~8.4M ids); the
    precondition is ENFORCED in-plan with ``assert_true`` folded into
    the key expression (coalesce keeps it un-prunable, costs one
    comparison per node, no extra job) — out-of-range ids fail loudly
    instead of silently corrupting the degree ordering.  Wedges join
    the two out-edges of their apex; the closing edge is confirmed by
    one equi-join.  total_wedges = sum(deg*(deg-1)/2) exactly; the
    global clustering coefficient 3*T/wedges is the single shared
    double.
    """
    nodes = edges.select(F.col("u").alias("n")).union(
        edges.select(F.col("v").alias("n"))
    )
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    okey = (
        F.col("deg") * F.lit(1 << 23)
        + F.col("n")
        + F.coalesce(
            F.assert_true(
                (F.col("n") >= 0) & (F.col("n") < F.lit(1 << 23)),
                F.lit(
                    "triangle_count: node ids must be in [0, 2^23) "
                    "for the deg*2^23+id orientation key"
                ),
            ).cast("long"),
            F.lit(0),
        )
    ).alias("okey")
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


def pagerank(
    edges: DataFrame,
    n_iters: int = 15,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected simple graph given
    as distinct (u < v) BIGINT edges — ENTIRELY in int64 arithmetic so
    the result is bit-exact and summation-order-free.

    Every rank is an integer in units of ``1/scale``:
    ``pr_0 = scale div N``; each step every node sends
    ``(pr * damping_pct) div (100 * deg)`` to each neighbour and the
    new rank is ``(scale * (100 - damping_pct)) div (100 * N)`` plus
    the integer sum of incoming contributions.  Integer division of
    non-negative int64s truncates identically in Spark (`div`) and
    any ANSI engine (`//`), and integer addition commutes — so unlike
    a floating PageRank there is NO fold-order sensitivity anywhere,
    and the oracle can use a plain GROUP BY SUM in a recursive CTE.
    ``pr * damping_pct <= scale * 100`` stays far below 2^63.

    Undirected degree >= 1 for every node by construction, so the
    dangling-mass term of directed PageRank vanishes.  Ranks leak the
    truncation remainders (sum(pr) < scale) — the standard price of
    integer PageRank; relative order (the thing PageRank is for) is
    unaffected at scale = 1e12.

    Scale design: the iteration is declared lazily — each step is one
    join against the (node-sized) rank frame plus one hash aggregate,
    the minimal shuffle structure PageRank admits; the rank frame is
    ``localCheckpoint``-ed every 5 rounds to keep the physical plan
    shallow on wide clusters.
    """
    dir_e = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).transform(truncate_lineage_lazy)
    deg = dir_e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_df = deg.agg(F.count(F.lit(1)).alias("nn"))
    v = (
        deg.crossJoin(F.broadcast(n_df))
        .select(
            F.col("src").alias("node"),
            "deg",
            F.expr(f"CAST({scale} AS BIGINT) div nn").alias("pr"),
            "nn",
        )
    )
    base = F.expr(
        f"CAST({scale} AS BIGINT) * {100 - damping_pct} div (100 * nn)"
    )
    for i in range(n_iters):
        contrib = v.join(dir_e, v["node"] == dir_e["src"]).select(
            "dst",
            F.expr(f"(pr * {damping_pct}) div (100 * deg)").alias("c"),
        )
        nxt = contrib.groupBy("dst").agg(F.sum("c").alias("in_sum"))
        prev = v.select("node", "deg", "nn")
        v = prev.join(
            nxt, prev["node"] == nxt["dst"], "left"
        ).select(
            prev["node"],
            "deg",
            (base + F.coalesce("in_sum", F.lit(0))).alias("pr"),
            "nn",
        )
        if (i + 1) % 5 == 0 and i + 1 < n_iters:
            v = v.transform(truncate_lineage_lazy)
    return v.select(
        "node",
        F.col("deg").alias("degree"),
        F.col("pr").alias("pr_micro"),
        (F.col("pr").cast("double") / F.lit(float(scale))).alias("pr"),
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
) -> DataFrame:
    """Minimum hop distance from a SEED SET over an undirected simple
    graph of distinct (u < v) BIGINT edges, capped at ``max_hops`` —
    the bounded-frontier BFS every "distance to nearest labelled
    example" feature needs.  Nodes farther than the cap (or
    unreachable) are absent from the result: the cap is the contract,
    not a truncation.

    Level-synchronous min-label propagation: round k relaxes
    ``dist(v) = min(dist(v), min_nbr dist(u) + 1)``; after round k
    every node within k hops holds its exact distance (plain BFS
    invariant), so exactly ``max_hops`` rounds are needed — no
    convergence check, no unbounded loop.  All-integer arithmetic:
    bit-exact, fold-order-free.

    Scale: each round is one node-sized equi-join + hash aggregate
    (the same shape as one PageRank step); seeds of any size are fine
    because distance-0 labels are just rows.  ``seeds`` must be a
    one-column frame of node ids (extra nodes not in the graph are
    kept at distance 0 — harmless and cheap to pre-filter if unwanted).
    """
    dir_e = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).transform(truncate_lineage_lazy)
    seed_col = seeds.columns[0]
    dist = seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).cast("int").alias("dist")
    ).distinct()
    for h in range(max_hops):
        relaxed = (
            dist.join(dir_e, dist["node"] == dir_e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if h + 1 < max_hops:
            dist = dist.transform(truncate_lineage_lazy)
    return dist


def link_jaccard(
    edges: DataFrame,
    min_common: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction (Liben-Nowell & Kleinberg
    2003): for every NON-adjacent pair sharing at least ``min_common``
    neighbors, score |N(a) n N(b)| / |N(a) u N(b)| — the classic
    "customers also bought together with" recommender signal, here
    over the capped co-purchase graph.

    Exactness: common-neighbor and degree counts are exact BIGINTs;
    the score is ONE shared division of integers, and the top-k cut
    orders by (jaccard DESC, a, b) — identical doubles in both
    engines, total order, no tolerance.

    Scale: candidates come from a wedge join on the shared-neighbor
    key (never all-pairs); the hot-node guard is inherited from
    ``copurchase_edges``'s max_buyers cap, which bounds every
    neighbor list the wedge join fans out.  Existing edges are
    removed with one LEFT ANTI join; the final top-k is a single
    ordered limit on the (bounded) candidate set.

    Output: a, b, common, deg_a, deg_b, jaccard.
    """
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionByName(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    x = adj.select(F.col("nbr").alias("z"), F.col("node").alias("a"))
    y = adj.select(F.col("nbr").alias("z"), F.col("node").alias("b"))
    cand = (
        x.join(y, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= F.lit(int(min_common)))
        .join(
            edges.select(
                F.col("u").alias("a"), F.col("v").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
    )
    scored = (
        cand.join(deg.withColumnsRenamed({"node": "a", "deg": "deg_a"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "deg_b"}), "b")
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            (
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
                .cast("double")
            ).alias("jaccard"),
        )
    )
    w = Window.orderBy(
        F.col("jaccard").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(top_k)))
        .drop("rk")
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 24,
) -> DataFrame:
    """k-core extraction (Seidman 1983): iteratively peel nodes of
    degree < k until the maximal subgraph where EVERY node keeps >= k
    neighbors remains — the standard dense-cohort screen (spam rings,
    power-buyer cliques) that a single degree filter cannot express
    because removals cascade.

    Representation: the undirected edge set doubled into both
    orientations, so a node's degree is both its out-degree AND its
    in-degree — one windowed count per side decides an edge's
    survival, and the whole peel round is TWO window shuffles with no
    self-join.  The oracle replays every round with the identical
    windowed-count rule inside a recursive CTE (fixed ``rounds``
    iterations; a converged state is a fixpoint, so extra rounds are
    no-ops and the round-``rounds`` state is THE k-core whenever
    peeling converges within the cap).

    Exactness: pure integer degree counts and comparisons — no
    floats anywhere.  Peeling any node strictly decreases the edge
    count, so a round that removes no edges is the fixpoint; the loop
    CHECKS this (per-round edge count on the checkpointed frame),
    exits early on convergence, and RAISES if the cap is hit while
    edges are still being peeled — a deep-peel graph (long chains)
    fails loudly instead of silently returning a supergraph of the
    true k-core, mirroring dedup_clusters' non-convergence contract.
    The oracle replays exactly ``rounds`` rounds; a converged state
    is a fixpoint, so the early-exited result equals the
    round-``rounds`` state whenever the loop succeeds.

    Scale: per round O(E) rows through two hash-partition windows;
    lineage truncated per round with an eager localCheckpoint (the
    convergence count then reads cached partitions, like
    pipeline/dedup.py::dedup_clusters).  The max_buyers cap upstream
    bounds both the edge count and the peel depth.

    Output: node, core_deg (degree inside the k-core).
    """
    e = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    ws = Window.partitionBy("u")
    wd = Window.partitionBy("v")
    prev_cnt = None
    converged = False
    for _ in range(rounds):
        e = (
            e.withColumn("ds", F.count(F.lit(1)).over(ws))
            .withColumn("dd", F.count(F.lit(1)).over(wd))
            .filter(
                (F.col("ds") >= F.lit(int(k)))
                & (F.col("dd") >= F.lit(int(k)))
            )
            .select("u", "v")
            .transform(truncate_lineage)
        )
        cnt = e.count()
        if cnt == prev_cnt or cnt == 0:
            # a peel round that removes nothing is a fixpoint (the
            # filter only deletes), so this IS the k-core; empty is
            # trivially converged.
            converged = True
            break
        prev_cnt = cnt
    if not converged:
        raise RuntimeError(
            f"kcore did not converge in {rounds} peel rounds "
            f"({prev_cnt} directed edges still shrinking); the "
            "graph's peel depth exceeds the cap — raise `rounds` "
            "(mirrors dedup_clusters' non-convergence contract "
            "instead of silently returning a supergraph)"
        )
    return e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )


def eigencentrality(
    edges: DataFrame,
    n_iters: int = 8,
    scale: int = 10**6,
) -> DataFrame:
    """Eigenvector centrality by fixed-iteration power method over an
    undirected simple graph of distinct (u < v) BIGINT edges — the
    "important neighbours make you important" score that degree and
    PageRank both miss (HITS hubs == authorities == this on an
    undirected graph).  ENTIRELY int64, so bit-exact and
    summation-order-free like :func:`pagerank`.

    Each round:  s(v) = sum_{u ~ v} x(u)   (exact int64 sum), then
    renormalize  x'(v) = (s(v) * scale) div max_v s(v)  so the top
    node is pinned at exactly ``scale`` and the iteration cannot
    overflow: x <= 1e6, s <= deg_max * 1e6 <= ~1e10 on the capped
    co-purchase graph, s * scale <= 1e16 << 2^63.  Integer division
    of non-negative int64s truncates identically in Spark (``div``)
    and ANSI ``//``, and the max and sums are fold-order-free — the
    oracle replays the identical recurrence in a recursive CTE with a
    window max in the recursive member.

    Scale: per round one co-partitioned join of the node-sized rank
    frame against the edge list, one hash aggregate, and one scalar
    max broadcast — the same minimal shuffle structure as pagerank;
    the rank frame is localCheckpoint-ed every 4 rounds to keep the
    lineage shallow.
    """
    dir_e = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).transform(truncate_lineage_lazy)
    deg = dir_e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    v = deg.select(
        F.col("src").alias("node"),
        "deg",
        F.lit(int(scale)).cast("long").alias("x"),
    )
    for i in range(n_iters):
        s = (
            v.join(dir_e, v["node"] == dir_e["src"])
            .groupBy("dst")
            .agg(F.sum("x").alias("s"))
        )
        mx = s.agg(F.max("s").alias("mx"))
        nodes = v.select("node", "deg")
        v = (
            nodes.join(s, nodes["node"] == s["dst"])
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                "deg",
                F.expr(f"(s * CAST({int(scale)} AS BIGINT)) div mx")
                .alias("x"),
            )
        )
        if (i + 1) % 4 == 0 and i + 1 < n_iters:
            v = v.transform(truncate_lineage_lazy)
    return v.select(
        "node",
        F.col("deg").alias("degree"),
        F.col("x").alias("score_micro"),
        (F.col("x").cast("double") / F.lit(float(scale))).alias("score"),
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient — "how clique-like is
    each customer's co-purchase neighbourhood" — over an undirected
    simple graph of distinct (u < v) BIGINT edges (Watts & Strogatz
    1998; the per-node refinement of :func:`triangle_count`'s global
    coefficient).

    Triangles are enumerated ONCE each with the same degree-ordered
    wedge join as :func:`triangle_count` (okey = deg * 2^23 + id, so
    apex out-degree is O(sqrt(E)) and no hot node fans out by its raw
    degree), then each confirmed triangle credits all three of its
    corners via one 3-way explode.  tri_count and degree are exact
    BIGINTs; the only float is the single shared division
    ``2 * t / (deg * (deg - 1))`` (0.0 for degree-1 nodes) — the
    triangle SET is orientation-invariant, so the DuckDB oracle may
    enumerate with the simpler id-ordered join and still agree
    exactly.

    Scale: degree frame + oriented edges + wedge join (bounded by
    orientation) + one explode (3 rows per triangle) + one hash
    aggregate at node grain.
    """
    nodes = edges.select(F.col("u").alias("n")).union(
        edges.select(F.col("v").alias("n"))
    )
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    okey = (
        F.col("deg") * F.lit(1 << 23)
        + F.col("n")
        + F.coalesce(
            F.assert_true(
                (F.col("n") >= 0) & (F.col("n") < F.lit(1 << 23)),
                F.lit(
                    "local_clustering: node ids must be in [0, 2^23) "
                    "for the deg*2^23+id orientation key"
                ),
            ).cast("long"),
            F.lit(0),
        )
    ).alias("okey")
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
    wedges = w1.join(w2, F.col("a") == F.col("a2")).filter(
        F.col("kx") < F.col("ky")
    )
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select(
        F.explode(F.array("a", "x", "y")).alias("n")
    )
    per_node = tri.groupBy("n").agg(F.count(F.lit(1)).alias("t"))
    out = deg.join(per_node, "n", "left").select(
        F.col("n").alias("node"),
        F.col("deg").cast("long").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("tri_count"),
    )
    return out.select(
        "node",
        "degree",
        "tri_count",
        F.when(
            F.col("degree") >= 2,
            F.lit(2.0)
            * F.col("tri_count").cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
        ).otherwise(F.lit(0.0)).alias("lcc"),
    )


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient of an undirected simple graph
    given as distinct (u < v) edges (Newman 2002, "Assortative mixing
    in networks") — do hubs attach to hubs (r > 0, social-style) or
    to leaves (r < 0, infrastructure-style)?

    r is the Pearson correlation of the endpoint degrees over all 2m
    directed stubs.  Degrees and the five sufficient statistics
    (M = 2m, Sx, Sy, Sxy, Sxx, Syy) are exact BIGINTs; r casts the
    integer moments to double only at the final products (the
    ols_daily overflow idiom) — ONE shared float expression.

    Scale: one degree aggregate, two co-partitioned equi-joins to
    decorate stubs with endpoint degrees, one global aggregate — no
    wedge join, no pairs beyond the existing edges.

    Output (1 row): n_nodes, n_edges, r_assort.
    """
    adj = edges.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionByName(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    stubs = (
        adj.join(deg.withColumnsRenamed({"deg": "dx"}), "a")
        .join(
            deg.withColumnsRenamed({"a": "b", "deg": "dy"}), "b"
        )
        .select(
            F.col("dx").cast("long").alias("x"),
            F.col("dy").cast("long").alias("y"),
        )
    )
    agg = stubs.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    md = F.col("m2").cast("double")
    cov = md * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = md * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vy = md * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    return (
        agg.crossJoin(F.broadcast(nodes))
        .filter((F.col("m2") > 0))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            (F.col("m2") / 2).cast("long").alias("n_edges"),
            F.when(
                (vx > 0) & (vy > 0),
                cov / (F.sqrt(vx) * F.sqrt(vy)),
            ).alias("r_assort"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    min_common: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Adamic–Adar link-prediction score for non-adjacent pairs
    (Adamic & Adar 2003): common neighbors weighted by the
    informativeness 1/ln(deg) of each shared neighbor — rare mutual
    friends say more than hubs, the refinement over
    :func:`link_jaccard`'s raw overlap.

        AA(a, b) = sum over z in N(a) n N(b) of 1 / ln(deg(z))

    Degrees and common counts are exact BIGINTs; each 1/ln(deg(z))
    is one shared float expression (deg(z) >= 2 always holds for a
    wedge center, so ln > 0), and the per-pair sum folds in z order
    (sorted fold) — bit-identical accumulation in both engines.  The
    final top-k orders by (score DESC, a, b).

    Scale: same wedge join as link_jaccard — candidates come from the
    shared-neighbor key, fan-out bounded by copurchase_edges's
    max_buyers cap; existing edges leave via one LEFT ANTI join.

    Output: a, b, common, aa_score.
    """
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionByName(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    wz = adj.join(
        deg.withColumnsRenamed({"node": "nbr", "deg": "degz"}), "nbr"
    )
    x = wz.select(
        F.col("nbr").alias("z"),
        F.col("node").alias("a"),
        F.col("degz"),
    )
    y = adj.select(F.col("nbr").alias("z"), F.col("node").alias("b"))
    cand = (
        x.join(y, "z")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            "z",
            (
                F.lit(1.0) / F.log(F.col("degz").cast("double"))
            ).alias("w"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("z", "w"))),
                F.lit(0.0),
                lambda acc, s: acc + s["w"],
            ).alias("aa_score"),
        )
        .filter(F.col("common") >= F.lit(int(min_common)))
        .join(
            edges.select(
                F.col("u").alias("a"), F.col("v").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
    )
    w = Window.orderBy(
        F.col("aa_score").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(top_k)))
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            "aa_score",
        )
    )


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """The classic link-prediction score triple for non-adjacent
    pairs, one wedge join for all three (Liben-Nowell & Kleinberg
    2003 survey ordering):

      * common neighbors  CN(a,b) = |N(a) n N(b)|           (BIGINT)
      * preferential attachment  PA(a,b) = deg(a) * deg(b)  (BIGINT)
      * resource allocation  RA(a,b) = sum_z 1/deg(z)       (float)

    RA is Adamic-Adar's harder-decaying sibling (1/deg instead of
    1/ln deg — hubs are discounted *linearly*), the empirically
    strongest of the degree-normalized family on co-occurrence
    graphs; PA is the no-structure baseline the others are judged
    against.  CN/PA are exact BIGINTs; each 1/deg(z) is one shared
    float expression and the per-pair RA sum folds in z order
    (sorted fold) — bit-identical in both engines.

    Scale: the adamic_adar wedge join (candidates from the
    shared-neighbor key, fan-out bounded upstream by
    copurchase_edges's max_buyers cap), one broadcast-sized degree
    join per endpoint, one LEFT ANTI join against existing edges.
    The final top-k orders by (ra_score DESC, a, b).

    Output: a, b, common, deg_a, deg_b, pref_attach, ra_score.
    """
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionByName(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    wz = adj.join(
        deg.withColumnsRenamed({"node": "nbr", "deg": "degz"}), "nbr"
    )
    x = wz.select(
        F.col("nbr").alias("z"),
        F.col("node").alias("a"),
        F.col("degz"),
    )
    y = adj.select(F.col("nbr").alias("z"), F.col("node").alias("b"))
    cand = (
        x.join(y, "z")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            "z",
            (F.lit(1.0) / F.col("degz").cast("double")).alias("w"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("z", "w"))),
                F.lit(0.0),
                lambda acc, s: acc + s["w"],
            ).alias("ra_score"),
        )
        .filter(F.col("common") >= F.lit(int(min_common)))
        .join(
            edges.select(
                F.col("u").alias("a"), F.col("v").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
        .join(
            deg.withColumnsRenamed({"node": "a", "deg": "deg_a"}),
            "a",
        )
        .join(
            deg.withColumnsRenamed({"node": "b", "deg": "deg_b"}),
            "b",
        )
    )
    w = Window.orderBy(
        F.col("ra_score").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(top_k)))
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            (F.col("deg_a") * F.col("deg_b"))
            .cast("long")
            .alias("pref_attach"),
            "ra_score",
        )
    )


def degree_powerlaw(edges: DataFrame) -> DataFrame:
    """Continuous-approximation power-law MLE over the degree
    distribution (Clauset, Shalizi & Newman 2009, eq. 3.1 with
    x_min = 1):

        alpha = 1 + n / sum_i ln(deg_i)

    the one-number "is this graph scale-free" summary next to
    :func:`assortativity`'s mixing coefficient — alpha in [2, 3] is
    the small-world signature, larger means the degree tail dies
    too fast for hubs to matter.  Degrees are exact BIGINTs; the
    ln-degree total folds over the DEGREE HISTOGRAM — sum over
    distinct degrees d of count_d * ln(d), accumulated in ascending
    d order — so the one-row reduce's array is bounded by the number
    of distinct degree values (power-law few, <= max_degree), not by
    node count.  Degree-1 nodes contribute count_1 * ln 1 = 0
    exactly, so they are kept, matching the x_min = 1 contract.

    Scale: one degree aggregate, one distinct-degree histogram
    aggregate (both map-side-combinable), a single-row reduce whose
    fold list is max-degree-bounded — never node or edge volume.

    Output: one row — n_nodes, n_edges, max_degree, alpha.
    """
    adj = edges.select(
        F.col("u").alias("node")
    ).unionByName(edges.select(F.col("v").alias("node")))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("cnt"))
    agg = hist.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("deg") * F.col("cnt")).alias("sdeg"),
        F.max("deg").alias("dmax"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "deg",
                        (
                            F.col("cnt").cast("double")
                            * F.log(F.col("deg").cast("double"))
                        ).alias("ld"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["ld"],
        ).alias("slog"),
    )
    return agg.filter(F.col("slog") > 0).select(
        F.col("n").cast("long").alias("n_nodes"),
        (F.col("sdeg") / 2).cast("long").alias("n_edges"),
        F.col("dmax").cast("long").alias("max_degree"),
        (
            F.lit(1.0)
            + F.col("n").cast("double") / F.col("slog")
        ).alias("alpha"),
    )
