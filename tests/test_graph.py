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
