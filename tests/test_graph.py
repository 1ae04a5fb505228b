"""Triangle counting over co-purchase graphs (plans/graph.py)."""

from itertools import combinations

from tsaug_spark.plans.graph import copurchase_edges, triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in pairs], "u long, v long"
    ).distinct()


def test_triangle_count_k4(spark):
    # complete graph on 4 nodes: C(4,3) = 4 triangles, cc = 1
    r = triangle_count(
        _edges(spark, combinations(range(4), 2))
    ).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    assert abs(r.clustering_coeff - 1.0) < 1e-12


def test_triangle_count_path_graph_zero(spark):
    r = triangle_count(
        _edges(spark, [(0, 1), (1, 2), (2, 3)])
    ).collect()[0]
    assert r.n_triangles == 0 and r.clustering_coeff == 0.0
    assert r.n_wedges == 2


def test_triangle_count_two_triangles_sharing_edge(spark):
    # bowtie-ish: {0,1,2} and {1,2,3} share edge (1,2)
    r = triangle_count(
        _edges(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    ).collect()[0]
    assert r.n_triangles == 2


def test_triangle_count_matches_bruteforce_random(spark):
    import random

    rng = random.Random(11)
    pairs = {
        (u, v)
        for u, v in (
            sorted(rng.sample(range(12), 2)) for _ in range(40)
        )
    }
    r = triangle_count(_edges(spark, pairs)).collect()[0]
    es = set(map(tuple, pairs))
    brute = sum(
        1
        for a, b, c in combinations(range(12), 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    assert r.n_triangles == brute


def test_copurchase_hot_part_cap(spark):
    # part 100 has 3 buyers (kept, 3 edges); part 200 has 5 (dropped)
    li = spark.createDataFrame(
        [(i, 100) for i in range(3)] + [(10 + i, 200) for i in range(5)],
        "l_orderkey long, l_partkey long",
    )
    orders = spark.createDataFrame(
        [(i, 1000 + i) for i in range(3)]
        + [(10 + i, 2000 + i) for i in range(5)],
        "o_orderkey long, o_custkey long",
    )
    edges = copurchase_edges(li, orders, max_buyers=3)
    got = {(r.u, r.v) for r in edges.collect()}
    assert got == {(1000, 1001), (1000, 1002), (1001, 1002)}


def test_pagerank_tiny_exact(spark):
    # integer PageRank is fully deterministic: replay the recurrence
    # in plain Python and demand bit-equality
    pairs = [(1, 2), (2, 3), (3, 4), (1, 3), (5, 6)]
    from tsaug_spark.plans.graph import pagerank

    got = {
        r.node: (r.degree, r.pr_micro)
        for r in pagerank(_edges(spark, pairs), n_iters=15).collect()
    }
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nn = len(adj)
    scale = 10**12
    pr = {x: scale // nn for x in adj}
    base = (scale * 15) // (100 * nn)
    for _ in range(15):
        pr = {
            x: base
            + sum((pr[y] * 85) // (100 * len(adj[y])) for y in adj[x])
            for x in adj
        }
    assert got == {x: (len(adj[x]), pr[x]) for x in adj}


def test_pagerank_mass_approximately_conserved(spark):
    from tsaug_spark.plans.graph import pagerank

    pairs = list(combinations(range(8), 2))[:20]
    rows = pagerank(_edges(spark, pairs), n_iters=10).collect()
    total = sum(r.pr_micro for r in rows)
    # integer truncation leaks < n_nodes * (100 + n_edges) units/iter;
    # conservatively: within 0.1% of full mass
    assert 0.999 * 10**12 <= total <= 10**12


def test_bfs_hops_chain_and_cap(spark):
    from tsaug_spark.plans.graph import bfs_hops

    chain = [(i, i + 1) for i in range(10)]
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_hops(_edges(spark, chain), seeds, max_hops=4).collect()
    }
    # exact distances up to the cap; nodes beyond 4 hops absent
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_hops_multi_seed_min(spark):
    from tsaug_spark.plans.graph import bfs_hops

    chain = [(i, i + 1) for i in range(10)]
    seeds = spark.createDataFrame([(0,), (10,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_hops(_edges(spark, chain), seeds, max_hops=5).collect()
    }
    assert got == {i: min(i, 10 - i) for i in range(11)}


def test_bfs_seed_not_in_graph_kept_at_zero(spark):
    from tsaug_spark.plans.graph import bfs_hops

    seeds = spark.createDataFrame([(99,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_hops(
            _edges(spark, [(0, 1)]), seeds, max_hops=2
        ).collect()
    }
    assert got == {99: 0}


def test_link_jaccard_square_graph(spark):
    """4-cycle 1-2-3-4-1: the two diagonals are the only candidates
    with >= 2 common neighbors; both score jaccard 1.0."""
    from tsaug_spark.plans.graph import link_jaccard

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {
        (r.a, r.b): r for r in link_jaccard(e).collect()
    }
    assert set(got) == {(1, 3), (2, 4)}
    for r in got.values():
        assert r.common == 2
        assert r.deg_a == 2 and r.deg_b == 2
        assert r.jaccard == 1.0


def test_link_jaccard_excludes_existing_edges(spark):
    """In K4 every pair is already an edge -> no predictions."""
    from tsaug_spark.plans.graph import link_jaccard

    e = _edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    )
    assert link_jaccard(e).count() == 0


def test_kcore_peeling_cascades(spark):
    """Triangle-fan fixture: the 2-core keeps {1,2,3,4} with degrees
    (3,2,3,2); the 3-core is EMPTY because removing the pendant and
    node 2 drops everyone below 3 — the cascade a plain degree
    filter misses (nodes 1,3,4 all start at degree 3)."""
    from tsaug_spark.plans.graph import kcore

    e = _edges(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4), (4, 5)]
    )
    two = {(r.node, r.core_deg) for r in kcore(e, k=2).collect()}
    assert two == {(1, 3), (2, 2), (3, 3), (4, 2)}
    assert kcore(e, k=3).count() == 0


def test_eigencentrality_exact_integer_replay(spark):
    """Triangle {0,1,2} + pendant 3 on node 2: Spark must equal a
    straight Python replay of the integer recurrence, and the
    triangle core must outrank the pendant."""
    from tsaug_spark.plans.graph import eigencentrality

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    nbrs = {0: [1, 2], 1: [0, 2], 2: [0, 1, 3], 3: [2]}
    x = {n: 10**6 for n in nbrs}
    for _ in range(8):
        s = {n: sum(x[m] for m in nbrs[n]) for n in nbrs}
        mx = max(s.values())
        x = {n: (s[n] * 10**6) // mx for n in nbrs}
    out = {
        r.node: r
        for r in eigencentrality(
            _edges(spark, pairs), n_iters=8
        ).collect()
    }
    assert len(out) == 4
    for n in nbrs:
        assert out[n].score_micro == x[n], (n, out[n].score_micro, x)
        assert out[n].degree == len(nbrs[n])
        assert out[n].score == x[n] / 1e6
    assert out[2].score_micro == 10**6  # hub pinned at the max
    assert out[3].score_micro < out[0].score_micro


def test_eigencentrality_regular_graph_uniform(spark):
    """On a cycle (2-regular) every node is equivalent: all scores
    stay pinned at exactly 1e6 through every round."""
    from tsaug_spark.plans.graph import eigencentrality

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    out = eigencentrality(_edges(spark, cyc), n_iters=8).collect()
    assert len(out) == 6
    assert {r.score_micro for r in out} == {10**6}


def test_local_clustering_triangle_pendant(spark):
    """Triangle {0,1,2} + pendant 3 on 2: corners 0,1 have lcc 1.0,
    the hub 2 has 1/3 (one closed of three wedges), the pendant 0.0."""
    from tsaug_spark.plans.graph import local_clustering

    out = {
        r.node: r
        for r in local_clustering(
            _edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        ).collect()
    }
    assert {(n, out[n].degree, out[n].tri_count) for n in out} == {
        (0, 2, 1),
        (1, 2, 1),
        (2, 3, 1),
        (3, 1, 0),
    }
    assert out[0].lcc == 1.0 and out[1].lcc == 1.0
    assert abs(out[2].lcc - 1.0 / 3.0) < 1e-15
    assert out[3].lcc == 0.0


def test_local_clustering_k4_all_one(spark):
    """K4: every node sits in 3 triangles over C(3,2)=3 wedges."""
    from tsaug_spark.plans.graph import local_clustering

    e = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    for r in local_clustering(_edges(spark, e)).collect():
        assert (r.degree, r.tri_count, r.lcc) == (3, 3, 1.0)


def test_triangle_count_rejects_oversize_node_ids(spark):
    """ADVICE r3: ids >= 2^23 would silently corrupt the deg*2^23+id
    orientation key; the in-plan assert_true must fail loudly."""
    import pytest

    e = _edges(spark, [(0, 1), (1, 1 << 23), (0, 1 << 23)])
    with pytest.raises(Exception, match="2\\^23|ASSERT|assert"):
        triangle_count(e).collect()


def test_local_clustering_rejects_oversize_node_ids(spark):
    import pytest

    from tsaug_spark.plans.graph import local_clustering

    e = _edges(spark, [(0, 1), (1, 1 << 24), (0, 1 << 24)])
    with pytest.raises(Exception, match="2\\^23|ASSERT|assert"):
        local_clustering(e).collect()


def test_kcore_raises_when_peel_depth_exceeds_cap(spark):
    """ADVICE r3: a long chain peels one layer per round from each
    end; with rounds far below the peel depth kcore must RAISE (the
    old behavior silently returned a supergraph of the true 2-core,
    which is empty for any path graph)."""
    import pytest

    from tsaug_spark.plans.graph import kcore

    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(chain, k=2, rounds=3)
    # with an ample cap the peel converges and the 2-core is empty
    assert kcore(chain, k=2, rounds=30).count() == 0


def test_kcore_early_exit_matches_full_cap(spark):
    """Convergence-checked early exit returns the identical core as a
    much larger round cap (fixpoint property)."""
    from tsaug_spark.plans.graph import kcore

    e = _edges(
        spark, [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4), (4, 5)]
    )
    a = {(r.node, r.core_deg) for r in kcore(e, k=2, rounds=4).collect()}
    b = {(r.node, r.core_deg) for r in kcore(e, k=2, rounds=40).collect()}
    assert a == b == {(1, 3), (2, 2), (3, 3), (4, 2)}
