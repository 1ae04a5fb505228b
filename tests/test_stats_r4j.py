"""Round-4j additions: Cox-Stuart, Cronbach's alpha, Kendall's W,
transfer entropy, Bowker symmetry — pure-Python references."""

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


def _daily_count_events(spark, counts, key="x"):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(int(c)):
            rows.append(
                (eid, T0 + dt.timedelta(days=d, minutes=eid % 60),
                 1, key, 1.0)
            )
            eid += 1
    return spark.createDataFrame(rows, _EVENT_DDL)


# ------------------------------------------------------ cox-stuart


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=40),
        min_size=4,
        max_size=30,
    )
)
def test_cox_stuart_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import cox_stuart

    df = _daily_count_events(spark, counts)
    got = cox_stuart(df, key_col="event_type").collect()

    n = len(counts)
    h = n // 2
    off = n - h
    pairs = [(counts[i], counts[i + off]) for i in range(h)]
    pos = sum(1 for a, b in pairs if b > a)
    neg = sum(1 for a, b in pairs if b < a)
    m = pos + neg
    if m == 0:
        assert got == []
        return
    z = (pos - m / 2.0) / math.sqrt(m / 4.0)
    assert len(got) == 1
    r = got[0]
    assert (r["n_days"], r["n_pairs"], r["n_pos"], r["n_neg"]) == (
        n, m, pos, neg
    )
    assert math.isclose(r["z"], z, rel_tol=1e-12)


def test_cox_stuart_detects_trend(spark):
    from tsaug_spark.plans.stats import cox_stuart

    up = list(range(1, 21))
    df = _daily_count_events(spark, up)
    r = cox_stuart(df, key_col="event_type").collect()[0]
    assert r["n_pos"] == 10 and r["n_neg"] == 0
    assert r["z"] > 3.0


# ------------------------------------------------- cronbach alpha


def test_cronbach_alpha_matches_reference(spark):
    from tsaug_spark.plans.stats import cronbach_alpha

    rng = np.random.RandomState(31)
    n_days = 10
    day_level = rng.randint(2, 20, n_days)
    counts = np.zeros((n_days, 24), dtype=int)
    rows, eid = [], 0
    for d in range(n_days):
        for h in range(24):
            c = int(day_level[d]) + int(rng.randint(0, 3))
            counts[d, h] = c
            for _ in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(days=d, hours=h),
                     1, "x", 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = cronbach_alpha(df).collect()
    assert len(got) == 1
    # sample variances, ddof=1
    vh = counts.var(axis=0, ddof=1).sum()
    vt = counts.sum(axis=1).var(ddof=1)
    alpha = 24.0 / 23.0 * (1 - vh / vt)
    r = got[0]
    assert r["n_days"] == n_days
    assert math.isclose(r["item_var_sum"], vh, rel_tol=1e-9)
    assert math.isclose(r["total_var"], vt, rel_tol=1e-9)
    assert math.isclose(r["alpha"], alpha, rel_tol=1e-9)
    # consistent day-level signal -> high alpha
    assert r["alpha"] > 0.8


# --------------------------------------------------- kendall's w


def test_kendalls_w_perfect_agreement(spark):
    """Types with strictly ordered volumes every day -> W == 1."""
    from tsaug_spark.plans.stats import kendalls_w

    rows, eid = [], 0
    for d in range(6):
        for t, c in (("a", 1), ("b", 5), ("c", 9)):
            for _ in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(days=d), 1, t, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    r = kendalls_w(df).collect()[0]
    assert r["m_days"] == 6 and r["k_types"] == 3
    assert math.isclose(r["w_stat"], 1.0, rel_tol=1e-12)
    assert math.isclose(r["chi2"], 6 * 2 * 1.0, rel_tol=1e-12)


def test_kendalls_w_reference_with_ties(spark):
    from tsaug_spark.plans.stats import kendalls_w

    rng = np.random.RandomState(41)
    m, k = 8, 4
    # counts with deliberate ties (small value range)
    mat = rng.randint(0, 4, (m, k))
    types = [f"t{j}" for j in range(k)]
    rows, eid = [], 0
    for d in range(m):
        for j in range(k):
            for _ in range(int(mat[d, j])):
                rows.append(
                    (eid, T0 + dt.timedelta(days=d), 1,
                     types[j], 1.0)
                )
                eid += 1
    # a day where some type has zero events still ranks it (count 0);
    # days with NO events at all are absent entirely -> drop all-zero
    # days from the reference too
    keep = mat.sum(axis=1) > 0
    mat = mat[keep]
    m = mat.shape[0]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = kendalls_w(df).collect()[0]

    # average ranks per day (ascending), ties averaged
    r2 = np.zeros((m, k))
    tsum = 0
    for d in range(m):
        vals = mat[d]
        for j in range(k):
            lo = 1 + int((vals < vals[j]).sum())
            hi = int((vals <= vals[j]).sum())
            r2[d, j] = lo + hi  # doubled average rank
        for v, t in Counter(vals.tolist()).items():
            tsum += t**3 - t
    r2j = r2.sum(axis=0)
    num = 3 * (r2j**2).sum() - 3 * m * m * k * (k + 1) ** 2
    den = m * m * k * (k * k - 1) - m * tsum
    w = num / den
    assert got["m_days"] == m and got["k_types"] == k
    assert math.isclose(got["w_stat"], w, rel_tol=1e-9)
    assert math.isclose(got["chi2"], m * (k - 1) * w, rel_tol=1e-9)


# ---------------------------------------------- transfer entropy


def _te_ref(xs, ys):
    """Binary lag-1 TE x->y in nats from already-binarized series."""
    tri = Counter(
        (ys[t + 1], ys[t], xs[t]) for t in range(len(xs) - 1)
    )
    n = sum(tri.values())
    nb = defaultdict(int)
    nbc = defaultdict(int)
    nab = defaultdict(int)
    for (a, b, c), v in tri.items():
        nb[b] += v
        nbc[(b, c)] += v
        nab[(a, b)] += v
    te = 0.0
    for (a, b, c), v in sorted(tri.items()):
        te += v * math.log(
            (v * nb[b]) / (nbc[(b, c)] * nab[(a, b)])
        )
    return te / n, n


def test_transfer_entropy_matches_reference(spark):
    from tsaug_spark.plans.stats import transfer_entropy

    rng = np.random.RandomState(47)
    H = 120
    x = rng.randint(0, 10, H)
    # y follows x with lag 1 (plus noise) -> TE(x->y) >> TE(y->x)
    y = np.roll(x, 1) + rng.randint(0, 3, H)
    y[0] = 0
    rows, eid = [], 0
    for h in range(H):
        for typ, c in (("click", int(x[h])), ("purchase", int(y[h]))):
            for _ in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(hours=h,
                                            seconds=eid % 60),
                     1, typ, 1.0)
                )
                eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = transfer_entropy(df).collect()[0]

    def lower_median(v):
        return sorted(v)[(len(v) + 1) // 2 - 1]

    bx = (x > lower_median(x)).astype(int)
    by = (y > lower_median(y)).astype(int)
    te_xy, n = _te_ref(bx.tolist(), by.tolist())
    te_yx, _ = _te_ref(by.tolist(), bx.tolist())
    assert got["n_transitions"] == n == H - 1
    assert math.isclose(got["te_x_to_y"], te_xy, rel_tol=1e-9)
    assert math.isclose(got["te_y_to_x"], te_yx, rel_tol=1e-9)
    assert got["te_x_to_y"] > got["te_y_to_x"]


# ---------------------------------------------- bowker symmetry


def test_bowker_matches_reference(spark):
    from tsaug_spark.plans.stats import bowker_symmetry

    # one user, a deterministic type sequence with asymmetric flow
    seq = list("ababcacbaabbccabac")
    rows = [
        (i, T0 + dt.timedelta(minutes=i), 1, s, 1.0)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = bowker_symmetry(df).collect()[0]

    trans = Counter(zip(seq, seq[1:]))
    b = 0.0
    dof = 0
    for i, j in [("a", "b"), ("a", "c"), ("b", "c")]:
        nij, nji = trans.get((i, j), 0), trans.get((j, i), 0)
        if nij + nji > 0:
            dof += 1
            b += (nij - nji) ** 2 / (nij + nji)
    assert got["dof"] == dof
    assert math.isclose(got["bowker_stat"], b, rel_tol=1e-12)


def test_bowker_symmetric_chain_scores_zero(spark):
    from tsaug_spark.plans.stats import bowker_symmetry

    seq = list("abab abab".replace(" ", "")) + list("baba")
    rows = [
        (i, T0 + dt.timedelta(minutes=i), 1, s, 1.0)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    got = bowker_symmetry(df).collect()[0]
    # a<->b transitions nearly balanced in an alternating chain
    assert got["bowker_stat"] < 0.2
