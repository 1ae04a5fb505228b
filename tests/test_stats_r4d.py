"""Round-4d additions: Chao1 richness, Good-Turing unseen mass,
degree assortativity, Adamic-Adar link prediction — checked against
brute-force NumPy/pure-Python references."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2024, 1, 1)

_EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)
_EDGE_DDL = "u long, v long"


# ------------------------------------------------------------ chao1


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # day
            st.integers(min_value=0, max_value=25),   # user
        ),
        min_size=1,
        max_size=80,
    )
)
def test_chao1_matches_reference(spark, pairs):
    from tsaug_spark.plans.stats import chao1_daily

    rows = [
        (i, T0 + dt.timedelta(days=d, minutes=i % 60), u, "x", 1.0)
        for i, (d, u) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    out = {r["day_s"] // 86400 - 19723: r
           for r in chao1_daily(df).collect()}
    byday = defaultdict(Counter)
    for d, u in pairs:
        byday[d][u] += 1
    for d, c in byday.items():
        freqs = Counter(c.values())
        d_obs, f1, f2 = len(c), freqs.get(1, 0), freqs.get(2, 0)
        ref = d_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1))
        r = out[d]
        assert r["d_obs"] == d_obs
        assert r["f1"] == f1 and r["f2"] == f2
        assert math.isclose(r["chao1"], ref, rel_tol=1e-12)


def test_chao1_complete_sample_equals_observed(spark):
    """When every user is seen >= 3 times, chao1 == observed."""
    from tsaug_spark.plans.stats import chao1_daily

    rows = []
    eid = 0
    for u in range(10):
        for k in range(3):
            rows.append(
                (eid, T0 + dt.timedelta(minutes=eid), u, "x", 1.0)
            )
            eid += 1
    r = chao1_daily(
        spark.createDataFrame(rows, _EVENT_DDL)
    ).collect()[0]
    assert r["f1"] == 0 and r["chao1"] == float(r["d_obs"]) == 10.0


# ------------------------------------------------------ good-turing


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # day
            st.integers(min_value=0, max_value=15),  # user
            st.integers(min_value=0, max_value=1),   # type
        ),
        min_size=1,
        max_size=60,
    )
)
def test_good_turing_matches_reference(spark, triples):
    from tsaug_spark.plans.stats import good_turing

    rows = [
        (i, T0 + dt.timedelta(days=d, minutes=i % 60), u,
         f"t{t}", 1.0)
        for i, (d, u, t) in enumerate(triples)
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    out = {r["key"]: r for r in good_turing(df).collect()}
    bykey = defaultdict(Counter)
    for d, u, t in triples:
        bykey[f"t{t}"][(u, d)] += 1
    for k, c in bykey.items():
        freqs = Counter(c.values())
        n = sum(c.values())
        n1, n2 = freqs.get(1, 0), freqs.get(2, 0)
        if n1 == 0:
            assert k not in out
            continue
        r = out[k]
        assert r["n_events"] == n
        assert r["d_species"] == len(c)
        assert r["n1"] == n1 and r["n2"] == n2
        assert math.isclose(r["p0_unseen"], n1 / n, rel_tol=1e-12)
        assert math.isclose(
            r["r1_smooth"], 2.0 * n2 / n1, rel_tol=1e-12
        )


# --------------------------------------------------- assortativity


def _ref_assortativity(edges):
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x, y = np.asarray(xs, float), np.asarray(ys, float)
    m = len(x)
    cov = m * (x * y).sum() - x.sum() * y.sum()
    vx = m * (x * x).sum() - x.sum() ** 2
    vy = m * (y * y).sum() - y.sum() ** 2
    if vx <= 0 or vy <= 0:
        return None
    return cov / (math.sqrt(vx) * math.sqrt(vy))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).map(lambda p: (min(p), max(p))).filter(
            lambda p: p[0] < p[1]
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_assortativity_matches_reference(spark, edges):
    from tsaug_spark.plans.graph import assortativity

    df = spark.createDataFrame(edges, _EDGE_DDL)
    out = assortativity(df).collect()
    ref = _ref_assortativity(edges)
    assert len(out) == 1
    r = out[0]
    assert r["n_edges"] == len(edges)
    assert r["n_nodes"] == len(
        {u for e in edges for u in e}
    )
    if ref is None:
        assert r["r_assort"] is None
    else:
        assert math.isclose(
            r["r_assort"], ref, rel_tol=1e-9, abs_tol=1e-12
        )


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative (r = -1)."""
    from tsaug_spark.plans.graph import assortativity

    edges = [(0, v) for v in range(1, 8)]
    r = assortativity(
        spark.createDataFrame(edges, _EDGE_DDL)
    ).collect()[0]
    assert math.isclose(r["r_assort"], -1.0, rel_tol=1e-9)


# ----------------------------------------------------- adamic-adar


def _ref_adamic_adar(edges, min_common=2, top_k=100):
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    eset = {tuple(sorted(e)) for e in edges}
    nodes = sorted(nbrs)
    scored = []
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in eset:
                continue
            common = sorted(nbrs[a] & nbrs[b])
            if len(common) < min_common:
                continue
            s = 0.0
            for z in common:
                s += 1.0 / math.log(float(len(nbrs[z])))
            scored.append((a, b, len(common), s))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    return scored[:top_k]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=10),
        ).map(lambda p: (min(p), max(p))).filter(
            lambda p: p[0] < p[1]
        ),
        min_size=3,
        max_size=25,
        unique=True,
    )
)
def test_adamic_adar_matches_reference(spark, edges):
    from tsaug_spark.plans.graph import adamic_adar

    df = spark.createDataFrame(edges, _EDGE_DDL)
    out = adamic_adar(df).collect()
    ref = _ref_adamic_adar(edges)
    assert len(out) == len(ref)
    for r, (a, b, common, s) in zip(out, ref):
        assert (r["a"], r["b"], r["common"]) == (a, b, common)
        assert math.isclose(r["aa_score"], s, rel_tol=1e-9)
