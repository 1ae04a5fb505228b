"""Round-4g additions: Tukey fences, odds ratio + Woolf CI,
McNemar's paired test, Gumbel block-maxima fit — NumPy / pure-Python
references."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

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


# ---------------------------------------------------- tukey fences


def _hinges(sorted_vals):
    """Tukey hinges: medians of lower/upper halves, median included
    in both when n is odd."""
    n = len(sorted_vals)
    half = (n + 1) // 2
    lower = sorted_vals[:half]
    upper = sorted_vals[n - half:]

    def med(v):
        m = len(v)
        return (v[(m - 1) // 2] + v[m // 2]) / 2.0

    return med(lower), med(upper)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=60),
        min_size=4,
        max_size=40,
    )
)
def test_tukey_matches_reference(spark, counts):
    from tsaug_spark.plans.stats import tukey_fences

    df = _daily_count_events(spark, counts)
    r = tukey_fences(df).collect()[0]
    sv = sorted(counts)
    h1, h3 = _hinges(sv)
    iqr = h3 - h1
    lo, hi = h1 - 1.5 * iqr, h3 + 1.5 * iqr
    assert r["n_days"] == len(counts)
    assert r["h1"] == h1 and r["h3"] == h3
    assert r["fence_lo"] == lo and r["fence_hi"] == hi
    assert r["n_low"] == sum(1 for c in counts if c < lo)
    assert r["n_high"] == sum(1 for c in counts if c > hi)


def test_tukey_flags_single_spike(spark):
    from tsaug_spark.plans.stats import tukey_fences

    counts = [10, 11, 9, 10, 12, 10, 11, 9, 10, 200]
    r = tukey_fences(
        _daily_count_events(spark, counts)
    ).collect()[0]
    assert r["n_high"] == 1 and r["n_low"] == 0


# ------------------------------------------------------ odds ratio


def test_odds_ratio_matches_reference(spark):
    from tsaug_spark.plans.stats import odds_ratio

    # engineered (user, day) cells: (click?, purchase?) per cell
    cells = [(1, 1)] * 12 + [(1, 0)] * 7 + [(0, 1)] * 5 + [(0, 0)] * 20
    rows, eid = [], 0
    for i, (a, b) in enumerate(cells):
        day = i  # one cell per (user=1 000+i, day=i)
        u = 1000 + i
        # a neutral event marks the cell active even when (0, 0)
        rows.append(
            (eid, T0 + dt.timedelta(days=day, minutes=1), u,
             "view", 1.0)
        )
        eid += 1
        if a:
            rows.append(
                (eid, T0 + dt.timedelta(days=day, minutes=2), u,
                 "click", 1.0)
            )
            eid += 1
        if b:
            rows.append(
                (eid, T0 + dt.timedelta(days=day, minutes=3), u,
                 "purchase", 1.0)
            )
            eid += 1
    r = odds_ratio(
        spark.createDataFrame(rows, _EVENT_DDL)
    ).collect()[0]
    n11, n10, n01, n00 = 12, 7, 5, 20
    orr = (n11 * n00) / (n10 * n01)
    se = math.sqrt(1 / n11 + 1 / n10 + 1 / n01 + 1 / n00)
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (
        n11, n10, n01, n00
    )
    assert math.isclose(r["or_"], orr, rel_tol=1e-12)
    assert math.isclose(
        r["ci_lo"], math.exp(math.log(orr) - 1.96 * se),
        rel_tol=1e-12,
    )
    assert math.isclose(
        r["ci_hi"], math.exp(math.log(orr) + 1.96 * se),
        rel_tol=1e-12,
    )
    assert r["ci_lo"] < r["or_"] < r["ci_hi"]


# --------------------------------------------------------- mcnemar


def test_mcnemar_matches_reference(spark):
    from tsaug_spark.plans.stats import mcnemar_weeks

    # users: (purchased wk1?, purchased wk2?)
    users = [(1, 1)] * 6 + [(1, 0)] * 8 + [(0, 1)] * 3 + [(0, 0)] * 5
    rows, eid = [], 0
    for i, (w1, w2) in enumerate(users):
        for wk, hit in ((0, w1), (1, w2)):
            etype = "purchase" if hit else "view"
            rows.append(
                (eid,
                 T0 + dt.timedelta(days=7 * wk + (i % 7),
                                   minutes=i),
                 i, etype, 1.0)
            )
            eid += 1
    r = mcnemar_weeks(
        spark.createDataFrame(rows, _EVENT_DDL)
    ).collect()[0]
    b, c = 8, 3
    chi2 = (abs(b - c) - 1) ** 2 / (b + c)
    assert r["n_users"] == len(users)
    assert (r["b_yes_no"], r["c_no_yes"]) == (b, c)
    assert r["n_concordant"] == 11
    assert math.isclose(r["chi2_cc"], chi2, rel_tol=1e-12)


# ---------------------------------------------------------- gumbel


def test_gumbel_matches_reference(spark):
    from tsaug_spark.plans.stats import gumbel_weekly

    rng = np.random.RandomState(2)
    counts = list(rng.randint(5, 40, 7 * 10))
    df = _daily_count_events(spark, counts)
    r = gumbel_weekly(df).collect()[0]
    # weeks are absolute epoch-weeks (floor(epoch_day / 7)), not
    # aligned to the first observed day
    epoch0 = (T0 - dt.datetime(1970, 1, 1)).days
    byweek = defaultdict(list)
    for d, c in enumerate(counts):
        byweek[(epoch0 + d) // 7].append(c)
    weekly_max = [max(v) for _, v in sorted(byweek.items())]
    x = np.asarray(weekly_max, float)
    mean, s = x.mean(), x.std(ddof=1)
    beta = s * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    ret = mu - beta * math.log(-math.log(1 - 1 / 52))
    assert r["n_weeks"] == len(weekly_max)
    assert math.isclose(r["mean_max"], mean, rel_tol=1e-12)
    assert math.isclose(r["beta"], beta, rel_tol=1e-9)
    assert math.isclose(r["mu"], mu, rel_tol=1e-9)
    assert math.isclose(r["return_level"], ret, rel_tol=1e-9)
    # the 1-in-52-week level must sit above every observed max's mean
    assert r["return_level"] > r["mean_max"]


# --------------------------------------------------------- bartlett


def test_bartlett_matches_reference(spark):
    from tsaug_spark.plans.stats import bartlett_test

    groups = {
        "t0": [10.00, 12.50, 9.75, 11.20, 10.80, 13.10],
        "t1": [20.00, 45.50, 5.25, 33.00, 18.75],
        "t2": [7.00, 7.10, 7.05, 6.95, 7.20, 7.15, 6.90],
    }
    rows, eid = [], 0
    for k, vals in groups.items():
        for v in vals:
            rows.append(
                (eid, T0 + dt.timedelta(minutes=eid), 1, k, v)
            )
            eid += 1
    r = bartlett_test(
        spark.createDataFrame(rows, _EVENT_DDL)
    ).collect()[0]
    cents = {
        k: np.asarray([round(v * 100) for v in vals], float)
        for k, vals in groups.items()
    }
    k = len(cents)
    n = sum(len(v) for v in cents.values())
    sp2 = sum(
        (len(v) - 1) * v.var(ddof=1) for v in cents.values()
    ) / (n - k)
    t_num = (n - k) * math.log(sp2) - sum(
        (len(cents[kk]) - 1) * math.log(cents[kk].var(ddof=1))
        for kk in sorted(cents)
    )
    c_f = 1.0 + (
        sum(1.0 / (len(v) - 1) for v in cents.values())
        - 1.0 / (n - k)
    ) / (3.0 * (k - 1))
    assert r["k_groups"] == k and r["n_total"] == n
    assert math.isclose(r["t_stat"], t_num / c_f, rel_tol=1e-9)
    assert math.isclose(r["c_factor"], c_f, rel_tol=1e-12)


def test_bartlett_equal_variances_near_zero(spark):
    from tsaug_spark.plans.stats import bartlett_test

    rows, eid = [], 0
    for k in ("a", "b"):
        for i in range(30):
            rows.append(
                (eid, T0 + dt.timedelta(minutes=eid), 1, k,
                 10.0 + (i % 5))
            )
            eid += 1
    r = bartlett_test(
        spark.createDataFrame(rows, _EVENT_DDL)
    ).collect()[0]
    assert abs(r["t_stat"]) < 0.05


# ------------------------------------------------------ gunning fog


def test_gunning_fog_matches_reference(spark):
    import re
    from tsaug_spark.pipeline.text import gunning_fog

    texts = [
        "The cat sat. It was happy!",
        "Incomprehensibility characterizes institutional "
        "bureaucratization extraordinarily.",
        "go go go",
    ]
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars int",
    )
    out = {r["doc_id"]: r for r in gunning_fog(df).collect()}
    for i, t in enumerate(texts):
        words = re.findall(r"[A-Za-z]+", t)
        s = max(1, len(re.findall(r"[.!?]+", t)))
        cx = sum(
            1
            for w in words
            if len(re.findall(r"[aeiouyAEIOUY]+", w)) >= 3
        )
        fog = 0.4 * (len(words) / s + 100.0 * cx / len(words))
        r = out[i]
        assert (r["n_words"], r["n_sentences"], r["n_complex"]) == (
            len(words), s, cx
        )
        assert math.isclose(r["fog_index"], fog, rel_tol=1e-12)
