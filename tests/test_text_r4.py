"""Round-4 text additions: Flesch-Kincaid readability and the Gopher
quality-rule battery — pure-Python references on hand-built docs."""

from __future__ import annotations

import math
import re

_DOC_DDL = "doc_id long, text string, lang string, source string, n_chars int"


def _docs(spark, texts):
    rows = [
        (i, t, "en", "test", len(t)) for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, _DOC_DDL)


def _ref_fk(text):
    w = len(re.findall(r"[A-Za-z]+", text))
    s = max(1, len(re.findall(r"[.!?]+", text)))
    y = len(re.findall(r"[aeiouyAEIOUY]+", text))
    if w == 0:
        return None
    grade = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
    ease = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    return w, s, y, grade, ease


def test_flesch_kincaid_matches_reference(spark):
    from tsaug_spark.pipeline.text import flesch_kincaid

    texts = [
        "The cat sat on the mat. It was happy!",
        "Incomprehensibility characterizes institutional "
        "bureaucratization. Nevertheless, responsibilities "
        "proliferate extraordinarily.",
        "go go go",
        "12345 67890",          # no words -> filtered out
        "a. e? i! o... u",
    ]
    out = {r["doc_id"]: r
           for r in flesch_kincaid(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        ref = _ref_fk(t)
        if ref is None:
            assert i not in out
            continue
        w, s, y, grade, ease = ref
        r = out[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) \
            == (w, s, y)
        assert math.isclose(r["fk_grade"], grade, rel_tol=1e-12)
        assert math.isclose(r["fk_ease"], ease, rel_tol=1e-12)


def test_flesch_kincaid_orders_difficulty(spark):
    """Long-word prose grades far above short-word prose."""
    from tsaug_spark.pipeline.text import flesch_kincaid

    simple = "The dog ran. The cat sat. He is big. " * 10
    hard = (
        "Institutional incomprehensibility notwithstanding, "
        "bureaucratization proliferates internationally. " * 10
    )
    out = {r["doc_id"]: r["fk_grade"]
           for r in flesch_kincaid(
               _docs(spark, [simple, hard])).collect()}
    assert out[1] > out[0] + 5


def test_gopher_rules_reference_cases(spark):
    from tsaug_spark.pipeline.text import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and "
            "friends settle down to have dinner with plenty of "
            "time remaining " * 5).strip()
    too_short = "the cat and dog have fun with that"
    symbol_heavy = ("# " * 30 + "the and of to be that have with "
                    "words " * 10).strip()
    no_stopwords = ("alpha beta gamma delta epsilon zeta theta "
                    "iota kappa " * 10).strip()
    bullets = "\n".join(["- item one of the list here now ok"] * 19
                        + ["the and that have with to be of"])
    out = {r["doc_id"]: r for r in gopher_rules(
        _docs(spark, [good, too_short, symbol_heavy,
                      no_stopwords, bullets])).collect()}
    assert out[0]["passes"] is True
    assert out[1]["passes"] is False            # < 50 words
    assert out[1]["stop_hits"] >= 2
    assert out[2]["symbol_ratio"] > 0.1
    assert out[2]["passes"] is False
    assert out[3]["stop_hits"] == 0
    assert out[3]["passes"] is False
    assert out[4]["bullet_frac"] == 0.95
    assert out[4]["passes"] is False            # bullet_frac > 0.9


def test_gopher_counts_exact(spark):
    from tsaug_spark.pipeline.text import gopher_rules

    text = "the be to of and that have with extra"
    r = gopher_rules(_docs(spark, [text])).collect()[0]
    assert r["n_words"] == 9
    assert r["stop_hits"] == 8
    assert r["alpha_word_frac"] == 1.0
    # mean word length: 31 letters over 9 words
    total = sum(len(w) for w in text.split())
    assert math.isclose(r["mean_word_len"], total / 9.0,
                        rel_tol=1e-12)
