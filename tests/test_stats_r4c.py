"""Round-4c classical statistics: Welch t-test, Jarque-Bera,
Durbin-Watson, one-way ANOVA F, Brown-Forsythe, Cramer's V — each
checked against an independent NumPy brute-force reference on
randomized inputs (scipy-free, like the rest of the suite)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

T0 = dt.datetime(2024, 1, 1)

_EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def _arm(user_id: int, salt: str = "exp1") -> int:
    h = hashlib.md5(f"{user_id}{salt}".encode()).hexdigest()
    return int(h[:8], 16) % 2


def _mk_events(spark, rows):
    """rows: (event_id, day, user, etype, value)."""
    data = [
        (i, T0 + dt.timedelta(days=int(d), seconds=(i * 37) % 86400),
         int(u), t, float(v))
        for (i, d, u, t, v) in rows
    ]
    return spark.createDataFrame(data, _EVENT_DDL)


# ---------------------------------------------------------- welch


def _ref_welch(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    sea, seb = va / na, vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(sea + seb)
    dof = (sea + seb) ** 2 / (
        sea**2 / (na - 1) + seb**2 / (nb - 1)
    )
    return t, dof


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.floats(min_value=0.01, max_value=400.0,
                      allow_nan=False),
        ),
        min_size=12,
        max_size=48,
    )
)
def test_welch_matches_numpy(spark, pairs):
    from tsaug_spark.plans.stats import welch_ttest

    pairs = [(u, round(v, 2)) for u, v in pairs]
    arms = {u: _arm(u) for u, _ in pairs}
    a = [v for u, v in pairs if arms[u] == 0]
    b = [v for u, v in pairs if arms[u] == 1]
    rows = [
        (i, 0, u, "x", v) for i, (u, v) in enumerate(pairs)
    ]
    df = _mk_events(spark, rows)
    out = {r["key"]: r for r in welch_ttest(df).collect()}
    if len(a) < 2 or len(b) < 2:
        assert "x" not in out
        return
    # cents-exact reference: the engine works on round(v*100)
    ac = [round(v * 100) / 100.0 for v in a]
    bc = [round(v * 100) / 100.0 for v in b]
    t_ref, dof_ref = _ref_welch(
        [c * 100 for c in ac], [c * 100 for c in bc]
    )
    r = out["x"]
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert math.isclose(r["t_stat"], t_ref, rel_tol=1e-9)
    assert math.isclose(r["dof"], dof_ref, rel_tol=1e-9)
    # means are reported in cents
    assert math.isclose(
        r["mean_a"], np.mean([c * 100 for c in ac]), rel_tol=1e-9
    )


# ----------------------------------------------------- jarque-bera


def _ref_jb(y):
    y = np.asarray(y, float)
    n = len(y)
    m = y.mean()
    m2 = ((y - m) ** 2).mean()
    m3 = ((y - m) ** 3).mean()
    m4 = ((y - m) ** 4).mean()
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3.0
    return g1, g2, n / 6.0 * (g1**2 + g2**2 / 4.0)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=40),
        min_size=4,
        max_size=30,
    )
)
def test_jarque_bera_matches_numpy(spark, daily_counts):
    from tsaug_spark.plans.stats import jarque_bera

    rows, eid = [], 0
    for d, cnt in enumerate(daily_counts):
        for _ in range(cnt):
            rows.append((eid, d, 1, "x", 1.0))
            eid += 1
    df = _mk_events(spark, rows)
    out = {r["key"]: r for r in jarque_bera(df).collect()}
    y = np.asarray(daily_counts, float)
    if np.all(y == y[0]):
        assert "x" not in out  # m2 == 0 filtered
        return
    g1, g2, jb = _ref_jb(y)
    r = out["x"]
    assert r["n_days"] == len(daily_counts)
    assert math.isclose(r["skew_g1"], g1, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r["kurt_g2"], g2, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r["jb_stat"], jb, rel_tol=1e-9, abs_tol=1e-12)


def test_jarque_bera_gaussian_small(spark):
    """A near-normal series scores a small JB; a one-spike series a
    large one."""
    from tsaug_spark.plans.stats import jarque_bera

    rng = np.random.RandomState(7)
    normal = np.clip(
        np.round(rng.normal(20, 3, 60)).astype(int), 1, None
    )
    spike = np.array([5] * 59 + [500])
    rows, eid = [], 0
    for d, c in enumerate(normal):
        for _ in range(int(c)):
            rows.append((eid, d, 1, "norm", 1.0))
            eid += 1
    for d, c in enumerate(spike):
        for _ in range(int(c)):
            rows.append((eid, d, 1, "spike", 1.0))
            eid += 1
    df = _mk_events(spark, rows)
    out = {r["key"]: r["jb_stat"] for r in jarque_bera(df).collect()}
    assert out["spike"] > 100 * max(out["norm"], 1e-9)


# --------------------------------------------------- durbin-watson


def _ref_dw(days, cents):
    x = np.asarray(days, float) - min(days)
    y = np.asarray(cents, float)
    order = np.argsort(x)
    x, y = x[order], y[order]
    n = len(x)
    b = ((n * (x * y).sum() - x.sum() * y.sum())
         / (n * (x * x).sum() - x.sum() ** 2))
    a = (y.sum() - b * x.sum()) / n
    e = y - (a + b * x)
    return np.sum(np.diff(e) ** 2) / np.sum(e**2)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=120),
            st.floats(min_value=0.01, max_value=300.0,
                      allow_nan=False),
        ),
        min_size=3,
        max_size=40,
        unique_by=lambda p: p[0],
    )
)
def test_durbin_watson_matches_numpy(spark, day_vals):
    from tsaug_spark.plans.stats import durbin_watson

    day_vals = [(d, round(v, 2)) for d, v in day_vals]
    days = [d for d, _ in day_vals]
    if len(set(days)) < 3:
        return
    rows = [
        (i, d, 1, "x", v) for i, (d, v) in enumerate(day_vals)
    ]
    df = _mk_events(spark, rows)
    out = {r["key"]: r for r in durbin_watson(df).collect()}
    cents = [round(v * 100) for _, v in day_vals]
    ref = _ref_dw(days, cents)
    if not np.isfinite(ref) or np.sum(
        np.asarray(cents, float) ** 2
    ) == 0:
        return
    r = out["x"]
    assert r["n_days"] == len(days)
    assert math.isclose(r["dw_stat"], ref, rel_tol=1e-7, abs_tol=1e-9)


def test_durbin_watson_alternating_vs_trend(spark):
    """Alternating residuals push DW toward 4; a smooth AR(1)-ish
    drift pushes it toward 0."""
    from tsaug_spark.plans.stats import durbin_watson

    alt = [(d, 100.0 + (10.0 if d % 2 else -10.0)) for d in range(40)]
    smooth = [(d, 100.0 + 50.0 * math.sin(d / 8.0)) for d in range(40)]
    rows = [(i, d, 1, "alt", v) for i, (d, v) in enumerate(alt)]
    rows += [
        (1000 + i, d, 1, "smooth", v)
        for i, (d, v) in enumerate(smooth)
    ]
    out = {
        r["key"]: r["dw_stat"]
        for r in durbin_watson(_mk_events(spark, rows)).collect()
    }
    assert out["alt"] > 3.0
    assert out["smooth"] < 1.0


# -------------------------------------------------------- anova-f


def _ref_anova(groups):
    all_ = np.concatenate([np.asarray(g, float) for g in groups])
    gm = all_.mean()
    ssb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups)
    ssw = sum(((np.asarray(g, float) - np.mean(g)) ** 2).sum()
              for g in groups)
    k, n = len(groups), len(all_)
    return ssb, ssw, (ssb / (k - 1)) / (ssw / (n - k))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=0.01, max_value=300.0,
                      allow_nan=False),
            min_size=2,
            max_size=20,
        ),
        min_size=2,
        max_size=4,
    )
)
def test_anova_f_matches_numpy(spark, groups):
    from tsaug_spark.plans.stats import anova_f

    groups = [[round(v, 2) for v in g] for g in groups]
    rows, eid = [], 0
    for gi, g in enumerate(groups):
        for v in g:
            rows.append((eid, 0, 1, f"t{gi}", v))
            eid += 1
    out = anova_f(_mk_events(spark, rows)).collect()
    cents = [[round(v * 100) for v in g] for g in groups]
    ssb, ssw, f = _ref_anova(cents)
    assert len(out) == 1
    r = out[0]
    assert r["k_groups"] == len(groups)
    assert r["n_total"] == sum(len(g) for g in groups)
    assert math.isclose(r["ssb"], ssb, rel_tol=1e-7, abs_tol=1e-6)
    assert math.isclose(r["ssw"], ssw, rel_tol=1e-7, abs_tol=1e-6)
    if ssw > 0:
        assert math.isclose(r["f_stat"], f, rel_tol=1e-7)
    else:
        assert r["f_stat"] is None


# -------------------------------------------------- brown-forsythe


def _ref_brown_forsythe(groups):
    zs = []
    for g in groups:
        g = np.asarray(g, float)
        med = np.median(g)
        zs.append(np.abs(g - med))
    _, _, f = _ref_anova(zs)
    return f


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=0.01, max_value=300.0,
                      allow_nan=False),
            min_size=3,
            max_size=20,
        ),
        min_size=2,
        max_size=4,
    )
)
def test_brown_forsythe_matches_numpy(spark, groups):
    from tsaug_spark.plans.stats import brown_forsythe

    groups = [[round(v, 2) for v in g] for g in groups]
    rows, eid = [], 0
    for gi, g in enumerate(groups):
        for v in g:
            rows.append((eid, 0, 1, f"t{gi}", v))
            eid += 1
    out = brown_forsythe(_mk_events(spark, rows)).collect()
    cents = [[round(v * 100) for v in g] for g in groups]
    # the engine uses z2 = |2c - m2|, which is exactly 2*|c - med|,
    # and F is invariant under that scaling
    ref = _ref_brown_forsythe(cents)
    assert len(out) == 1
    r = out[0]
    if not np.isfinite(ref):
        assert r["f_stat"] is None or not np.isfinite(r["f_stat"])
        return
    zall = []
    for g in cents:
        med = np.median(np.asarray(g, float))
        zall.append(np.abs(np.asarray(g, float) - med))
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zall)
    if ssw == 0:
        assert r["f_stat"] is None
        return
    assert math.isclose(r["f_stat"], ref, rel_tol=1e-7, abs_tol=1e-9)


# ----------------------------------------------------- cramers-v


def _ref_cramers_v(table):
    o = np.asarray(table, float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = ((o - e) ** 2 / e).sum()
    r, c = o.shape
    return chi2, math.sqrt(chi2 / (n * (min(r, c) - 1)))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=1, max_value=30),
            min_size=2,
            max_size=5,
        ),
        min_size=2,
        max_size=4,
    ).filter(lambda t: len({len(r) for r in t}) == 1)
)
def test_cramers_v_matches_numpy(spark, table):
    from tsaug_spark.plans.stats import cramers_v

    rows, eid = [], 0
    for ti, trow in enumerate(table):
        for hi, cnt in enumerate(trow):
            for _ in range(cnt):
                # place the event inside hour hi of day ti
                rows.append(
                    (eid, 0, 1, f"t{ti}",
                     1.0, hi)
                )
                eid += 1
    data = [
        (i, T0 + dt.timedelta(days=0, hours=int(h), minutes=7),
         1, t, v)
        for (i, _d, _u, t, v, h) in rows
    ]
    df = spark.createDataFrame(data, _EVENT_DDL)
    out = cramers_v(df).collect()
    chi2, v = _ref_cramers_v(table)
    assert len(out) == 1
    r = out[0]
    assert r["n_total"] == sum(sum(t) for t in table)
    assert r["r_levels"] == len(table)
    assert r["c_levels"] == len(table[0])
    assert math.isclose(r["chi2"], chi2, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(
        r["cramers_v"], v, rel_tol=1e-9, abs_tol=1e-12
    )


def test_cramers_v_independent_table_near_zero(spark):
    """A perfectly proportional table has chi2 == 0 exactly."""
    from tsaug_spark.plans.stats import cramers_v

    data, eid = [], 0
    for ti, scale in enumerate([1, 2]):
        for hi, base in enumerate([3, 5, 7]):
            for _ in range(scale * base):
                data.append(
                    (eid,
                     T0 + dt.timedelta(hours=int(hi), minutes=3),
                     1, f"t{ti}", 1.0)
                )
                eid += 1
    df = spark.createDataFrame(data, _EVENT_DDL)
    r = cramers_v(df).collect()[0]
    assert abs(r["chi2"]) < 1e-9
    assert abs(r["cramers_v"]) < 1e-6
