"""Round-4f additions: mutual information / NMI, Chapman
capture-recapture, spectral entropy, Cohen's kappa — NumPy /
pure-Python references."""

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
_DOC_DDL = "doc_id long, text string, lang string, source string, n_chars int"


# --------------------------------------------------------------- mi


def _ref_mi(table):
    o = np.asarray(table, float)
    n = o.sum()
    p = o / n
    pr = p.sum(axis=1, keepdims=True)
    pc = p.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(o > 0, p * np.log(p / (pr * pc)), 0.0)
    mi = terms.sum()
    hr = -np.sum(pr * np.log(pr))
    hc = -np.sum(
        np.where(pc > 0, pc * np.log(pc), 0.0)
    )
    return mi, hr, hc, mi / math.sqrt(hr * hc)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=20),
            min_size=2,
            max_size=5,
        ),
        min_size=2,
        max_size=4,
    ).filter(
        lambda t: len({len(r) for r in t}) == 1
        and all(sum(r) > 0 for r in t)
        and all(any(r[j] for r in t) for j in range(len(t[0])))
    )
)
def test_mi_matches_numpy(spark, table):
    from tsaug_spark.plans.stats import mi_type_hour

    data, eid = [], 0
    for ti, trow in enumerate(table):
        for hi, cnt in enumerate(trow):
            for _ in range(cnt):
                data.append(
                    (eid, T0 + dt.timedelta(hours=hi, minutes=9),
                     1, f"t{ti}", 1.0)
                )
                eid += 1
    df = spark.createDataFrame(data, _EVENT_DDL)
    out = mi_type_hour(df).collect()
    mi, hr, hc, nmi = _ref_mi(table)
    if hr <= 0 or hc <= 0:
        assert out == []
        return
    r = out[0]
    assert r["n_total"] == int(np.sum(table))
    assert math.isclose(r["mi_nats"], mi, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r["h_row"], hr, rel_tol=1e-9)
    assert math.isclose(r["h_col"], hc, rel_tol=1e-9)
    assert math.isclose(r["nmi"], nmi, rel_tol=1e-9, abs_tol=1e-12)


def test_mi_independent_is_zero(spark):
    """A proportional table carries zero information."""
    from tsaug_spark.plans.stats import mi_type_hour

    data, eid = [], 0
    for ti, scale in enumerate([1, 3]):
        for hi, base in enumerate([2, 5]):
            for _ in range(scale * base):
                data.append(
                    (eid, T0 + dt.timedelta(hours=hi, minutes=1),
                     1, f"t{ti}", 1.0)
                )
                eid += 1
    r = mi_type_hour(
        spark.createDataFrame(data, _EVENT_DDL)
    ).collect()[0]
    assert abs(r["mi_nats"]) < 1e-12 and abs(r["nmi"]) < 1e-9


# ---------------------------------------------------------- chapman


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=2,
        max_size=60,
    )
)
def test_chapman_matches_reference(spark, pairs):
    from tsaug_spark.plans.stats import chapman_estimate

    rows = [
        (i, T0 + dt.timedelta(days=d, minutes=i % 60), u, "x", 1.0)
        for i, (d, u) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, _EVENT_DDL)
    out = {r["day_s"] // 86400 - 19723: r
           for r in chapman_estimate(df).collect()}
    byday = defaultdict(set)
    for d, u in pairs:
        byday[d].add(u)
    for d in sorted(byday):
        if d + 1 not in byday:
            assert d not in out
            continue
        n1, n2 = len(byday[d]), len(byday[d + 1])
        m = len(byday[d] & byday[d + 1])
        ref = (n1 + 1) * (n2 + 1) / (m + 1) - 1.0
        r = out[d]
        assert (r["n1"], r["n2"], r["m_both"]) == (n1, n2, m)
        assert math.isclose(r["chapman_n"], ref, rel_tol=1e-12)


def test_chapman_full_overlap_recovers_population(spark):
    """Identical capture sets -> N_hat == n (complete recapture)."""
    from tsaug_spark.plans.stats import chapman_estimate

    rows, eid = [], 0
    for d in (0, 1):
        for u in range(12):
            rows.append(
                (eid, T0 + dt.timedelta(days=d, minutes=u), u,
                 "x", 1.0)
            )
            eid += 1
    r = chapman_estimate(
        spark.createDataFrame(rows, _EVENT_DDL)
    ).collect()[0]
    assert r["m_both"] == 12
    assert math.isclose(r["chapman_n"], 12.0, rel_tol=1e-12)


# ------------------------------------------------- spectral entropy


def _ref_spectral_entropy(hour_counts, periods=(6, 8, 12, 24, 168)):
    pows = []
    for p in periods:
        cos_tab = [math.cos(2.0 * math.pi * i / p) for i in range(p)]
        sin_tab = [math.sin(2.0 * math.pi * i / p) for i in range(p)]
        re = im = 0.0
        for h in sorted(hour_counts):
            c = float(hour_counts[h])
            re += c * cos_tab[h % p]
            im += c * sin_tab[h % p]
        pows.append(re * re + im * im)
    tot = sum(pows)
    if tot <= 0:
        return None
    h = 0.0
    for pw in pows:
        if pw > 0:
            frac = pw / tot
            h += -frac * math.log(frac)
    return tot, h, h / math.log(len(periods))


@settings(max_examples=5, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=400),
        st.integers(min_value=1, max_value=9),
        min_size=4,
        max_size=40,
    )
)
def test_spectral_entropy_matches_reference(spark, hour_counts):
    from tsaug_spark.plans.stats import spectral_entropy

    rows, eid = [], 0
    for h, c in hour_counts.items():
        for _ in range(c):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, minutes=eid % 55),
                 1, "x", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(rows, _EVENT_DDL)
    out = {r["key"]: r for r in spectral_entropy(df).collect()}
    ref = _ref_spectral_entropy(hour_counts)
    if ref is None:
        assert "x" not in out
        return
    tot, h, hn = ref
    r = out["x"]
    assert r["n_hours"] == len(hour_counts)
    assert math.isclose(r["p_total"], tot, rel_tol=1e-9)
    assert math.isclose(r["h_spec"], h, rel_tol=1e-7, abs_tol=1e-10)
    assert math.isclose(r["h_norm"], hn, rel_tol=1e-7, abs_tol=1e-10)


def test_spectral_entropy_pure_diurnal_is_low(spark):
    """A clean 24h rhythm concentrates power -> low entropy; white
    noise spreads it."""
    from tsaug_spark.plans.stats import spectral_entropy

    rng = np.random.RandomState(5)
    rows, eid = [], 0
    for h in range(336):
        diurnal = 1 + int(10 * (1 + math.sin(2 * math.pi * h / 24)))
        noise = 1 + int(rng.randint(0, 12))
        for key, c in (("diurnal", diurnal), ("noise", noise)):
            for _ in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(hours=h, minutes=3),
                     1, key, 1.0)
                )
                eid += 1
    out = {r["key"]: r["h_norm"] for r in spectral_entropy(
        spark.createDataFrame(rows, _EVENT_DDL)).collect()}
    assert out["diurnal"] < out["noise"]


# ------------------------------------------------------------ kappa


def test_cohen_kappa_matches_reference(spark):
    from tsaug_spark.pipeline.text import cohen_kappa

    # truth, text (prediction: marker rules; fallback en)
    docs = [
        ("en", "plain english words"),
        ("en", "more plain text"),
        ("zh", "前面的文字"),          # hits 的 -> zh (agree)
        ("zh", "no marker here"),      # pred en (disagree)
        ("es", "donde esta el gato"),  # ' el ' -> es (agree)
        ("fr", " le chat noir"),       # ' le ' -> fr (agree)
        ("de", "wo ist der hund"),     # ' der ' -> de (agree)
        ("de", "plain fallback"),      # pred en (disagree)
    ]
    rows = [
        (i, t, lang, "test", len(t))
        for i, (lang, t) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, _DOC_DDL)
    r = cohen_kappa(df).collect()[0]
    preds = ["en", "en", "zh", "en", "es", "fr", "de", "en"]
    truths = [lang for lang, _ in docs]
    n = len(docs)
    agree = sum(1 for a, b in zip(truths, preds) if a == b)
    rt, ct = Counter(truths), Counter(preds)
    pe = sum(rt[k] * ct.get(k, 0) for k in rt) / (n * n)
    po = agree / n
    kappa = (po - pe) / (1 - pe)
    assert r["n_docs"] == n and r["agree"] == agree
    assert math.isclose(r["po"], po, rel_tol=1e-12)
    assert math.isclose(r["pe"], pe, rel_tol=1e-12)
    assert math.isclose(r["kappa"], kappa, rel_tol=1e-12)


def test_cohen_kappa_perfect_and_chance(spark):
    from tsaug_spark.pipeline.text import cohen_kappa

    perfect = [
        (i, t, lang, "test", len(t))
        for i, (lang, t) in enumerate(
            [("zh", "好的"), ("es", "como el rio"),
             ("fr", "sur le pont"), ("en", "hello world")]
        )
    ]
    r = cohen_kappa(
        spark.createDataFrame(perfect, _DOC_DDL)
    ).collect()[0]
    assert math.isclose(r["po"], 1.0)
    assert math.isclose(r["kappa"], 1.0, rel_tol=1e-12)
