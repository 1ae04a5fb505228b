"""Round-4i additions: link-prediction triple, power-law degree MLE,
Little's-law audit, CLI/ARI/SMOG readability — pure-Python references.
"""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import defaultdict

import numpy as np

T0 = dt.datetime(2024, 1, 1)

_EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


# ------------------------------------------------- link prediction


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_link_prediction_matches_bruteforce(spark):
    from tsaug_spark.plans.graph import link_prediction

    rng = np.random.RandomState(23)
    nodes = list(range(30))
    pairs = set()
    for _ in range(80):
        a, b = (int(x) for x in rng.choice(nodes, 2, replace=False))
        pairs.add((min(a, b), max(a, b)))
    edges = sorted(pairs)
    got = {
        (r["a"], r["b"]): r
        for r in link_prediction(
            _edges_df(spark, edges), min_common=2, top_k=1000
        ).collect()
    }

    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    expect = {}
    for a in nodes:
        for b in nodes:
            if a >= b or (a, b) in pairs:
                continue
            cn = nbrs[a] & nbrs[b]
            if len(cn) >= 2:
                expect[(a, b)] = (
                    len(cn),
                    len(nbrs[a]) * len(nbrs[b]),
                    sum(1.0 / len(nbrs[z]) for z in sorted(cn)),
                )
    assert set(got) == set(expect)
    for k, (cn, pa, ra) in expect.items():
        assert got[k]["common"] == cn
        assert got[k]["pref_attach"] == pa
        assert math.isclose(got[k]["ra_score"], ra, rel_tol=1e-12)
        assert (
            got[k]["deg_a"] * got[k]["deg_b"]
            == got[k]["pref_attach"]
        )


def test_link_prediction_excludes_existing_edges(spark):
    from tsaug_spark.plans.graph import link_prediction

    # triangle + pendant: (1,2),(2,3),(1,3),(3,4),(1,4) -> candidate
    # non-edge (2,4) shares neighbors {1,3}
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4)]
    got = link_prediction(
        _edges_df(spark, edges), min_common=2, top_k=10
    ).collect()
    assert [(r["a"], r["b"]) for r in got] == [(2, 4)]
    assert got[0]["common"] == 2


# ------------------------------------------------ degree power law


def test_degree_powerlaw_matches_mle(spark):
    from tsaug_spark.plans.graph import degree_powerlaw

    edges = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (4, 5), (5, 6)]
    got = degree_powerlaw(_edges_df(spark, edges)).collect()
    assert len(got) == 1
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    n = len(deg)
    slog = sum(math.log(d) for d in deg.values())
    assert got[0]["n_nodes"] == n
    assert got[0]["n_edges"] == len(edges)
    assert got[0]["max_degree"] == max(deg.values())
    assert math.isclose(
        got[0]["alpha"], 1.0 + n / slog, rel_tol=1e-12
    )


# -------------------------------------------------- little's law


def test_littles_law_single_day_identity(spark):
    """Sessions fully inside one day: busy == started, ratio == 1."""
    from tsaug_spark.plans.metrics import littles_law

    rows = []
    eid = 0
    for u in range(5):
        start = T0 + dt.timedelta(hours=2 * u)
        for k in range(4):  # 3 * 600 s = 1800-s-free gaps
            rows.append(
                (eid, start + dt.timedelta(seconds=600 * k),
                 u, "x", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = littles_law(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_started"] == 5
    assert r["busy_s"] == r["started_s"] == 5 * 1800
    assert math.isclose(r["ratio"], 1.0)
    assert math.isclose(r["l_avg"], 5 * 1800 / 86400.0)


def test_littles_law_midnight_split(spark):
    """A session crossing midnight books busy seconds on both days
    but started seconds only on day 0."""
    from tsaug_spark.plans.metrics import littles_law

    start = T0 + dt.timedelta(hours=23, minutes=50)
    rows = [
        (k, start + dt.timedelta(minutes=10 * k), 1, "x", 1.0)
        for k in range(3)  # 23:50 -> 0:10 next day, 1200 s spans
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = {r["bucket_s"]: r for r in littles_law(df).collect()}
    day0 = int((T0 - dt.datetime(1970, 1, 1)).total_seconds())
    assert got[day0]["n_started"] == 1
    assert got[day0]["started_s"] == 1200
    assert got[day0]["busy_s"] == 600
    assert got[day0 + 86400]["busy_s"] == 600
    assert got[day0 + 86400]["n_started"] == 0
    assert math.isclose(got[day0]["ratio"], 0.5)


def test_littles_law_gap_breaks_session(spark):
    from tsaug_spark.plans.metrics import littles_law

    rows = [
        (0, T0, 1, "x", 1.0),
        (1, T0 + dt.timedelta(seconds=1800), 1, "x", 1.0),  # break
        (2, T0 + dt.timedelta(seconds=1799 + 1800), 1, "x", 1.0),
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = littles_law(df).collect()
    # sessions: [0,0] and [1800, 3599] -> 2 started, 1799 busy s
    assert got[0]["n_started"] == 2
    assert got[0]["busy_s"] == 1799


# -------------------------------------------------- readability


def _readability_ref(text):
    letters = len(re.findall(r"[A-Za-z]", text))
    words = re.findall(r"[A-Za-z]+", text)
    sents = max(1, len(re.findall(r"[.!?]+", text)))
    poly = sum(
        1
        for w in words
        if len(re.findall(r"[aeiouyAEIOUY]+", w)) >= 3
    )
    nw = len(words)
    cli = 0.0588 * (letters / nw * 100.0) - 0.296 * (
        sents / nw * 100.0
    ) - 15.8
    ari = 4.71 * (letters / nw) + 0.5 * (nw / sents) - 21.43
    smog = 1.043 * math.sqrt(poly * 30.0 / sents) + 3.1291
    return letters, nw, sents, poly, cli, ari, smog


def test_readability_matches_reference(spark):
    from tsaug_spark.pipeline.text import readability_indices

    docs = [
        (1, "The cat sat. The dog ran! A simple text?"),
        (2, "Multisyllabic vocabulary necessitates extraordinary "
            "comprehension. Consequently readability deteriorates "
            "significantly."),
        (3, "short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           readability_indices(df).collect()}
    for doc_id, text in docs:
        l, w, s, p, cli, ari, smog = _readability_ref(text)
        r = got[doc_id]
        assert (r["n_letters"], r["n_words"], r["n_sentences"],
                r["n_poly"]) == (l, w, s, p)
        assert math.isclose(r["cli"], cli, rel_tol=1e-12)
        assert math.isclose(r["ari"], ari, rel_tol=1e-12)
        assert math.isclose(r["smog"], smog, rel_tol=1e-12)
    # the polysyllabic doc must grade harder on all three
    assert got[2]["cli"] > got[1]["cli"]
    assert got[2]["smog"] > got[1]["smog"]


def test_readability_skips_wordless_docs(spark):
    from tsaug_spark.pipeline.text import readability_indices

    df = spark.createDataFrame(
        [(1, "12345 !!!"), (2, "ok.")], "doc_id long, text string"
    )
    got = readability_indices(df).collect()
    assert [r["doc_id"] for r in got] == [2]
