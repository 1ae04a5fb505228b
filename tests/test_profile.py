"""Tests for the data-profiling operators (plans/profile.py)."""

from __future__ import annotations

import datetime as dt

from tsaug_spark.plans.profile import profile_events, top_trigrams

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, sec, user, etype, value, props) with Nones."""
    data = [
        (i, T0 + dt.timedelta(seconds=s), u, t, v, p)
        for (i, s, u, t, v, p) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def test_profile_counts_nulls_distincts_and_ranges(spark):
    rows = [
        (0, 0, 1, "a", 1.25, '{"k":1}'),
        (1, 60, 1, "b", None, None),
        (2, 120, 2, "a", 3.50, '{"k":1}'),
    ]
    out = {r.col_name: r for r in
           profile_events(_events(spark, rows)).collect()}
    assert set(out) == {
        "event_id", "ts", "user_id", "event_type", "value_cents",
        "props",
    }
    for r in out.values():
        assert r.n == 3
    assert out["value_cents"].n_null == 1
    assert out["props"].n_null == 1
    assert out["event_id"].n_null == 0
    assert out["user_id"].n_distinct == 2
    assert out["event_type"].n_distinct == 2
    # exact stringified integer ranges: cents 125..350
    assert out["value_cents"].min_s == "125"
    assert out["value_cents"].max_s == "350"
    assert out["event_type"].min_s == "a"
    assert out["event_type"].max_s == "b"
    # ts profiled as unix micros
    base = int(T0.timestamp()) * 1_000_000
    assert out["ts"].min_s == str(base)
    assert out["ts"].max_s == str(base + 120_000_000)


def test_top_trigrams_counts_and_tiebreak(spark):
    # user 1: a b c a b c  -> trigrams abc, bca, cab, abc
    # user 2: a b c        -> abc
    # counts: abc=3, bca=1, cab=1 (tie broken lexicographically)
    seq1 = ["a", "b", "c", "a", "b", "c"]
    seq2 = ["a", "b", "c"]
    rows = [(i, i, 1, t, 1.0, None) for i, t in enumerate(seq1)]
    rows += [(100 + i, i, 2, t, 1.0, None)
             for i, t in enumerate(seq2)]
    out = top_trigrams(_events(spark, rows), k=10).collect()
    got = [((r.t1, r.t2, r.t3), r.cnt, r.rank) for r in
           sorted(out, key=lambda r: r.rank)]
    assert got[0] == (("a", "b", "c"), 3, 1)
    assert got[1] == (("b", "c", "a"), 1, 2)
    assert got[2] == (("c", "a", "b"), 1, 3)
    assert len(got) == 3


def test_top_trigrams_never_cross_users(spark):
    # 2 users with 2 events each: no trigram spans users
    rows = [(0, 0, 1, "a", 1.0, None), (1, 1, 1, "b", 1.0, None),
            (2, 2, 2, "c", 1.0, None), (3, 3, 2, "d", 1.0, None)]
    assert top_trigrams(_events(spark, rows)).count() == 0


def test_lcs_pairs_hand_sequences(spark):
    # user 1: a b c d ; user 2: b a d c -> LCS = 2 ("b d" or "a d" or
    # "a c"); user 3 identical to user 2 -> LCS = 4
    from tsaug_spark.plans.metrics import lcs_pairs
    seq1, seq2, seq3 = ["a", "b", "c", "d"], ["b", "a", "d", "c"], \
        ["b", "a", "d", "c"]
    rows = []
    for u, seq in ((1, seq1), (2, seq2), (3, seq3)):
        rows += [(u * 100 + i, i, u, t, 1.0, None)
                 for i, t in enumerate(seq)]
    out = {(r.id_a, r.id_b): r for r in
           lcs_pairs(_events(spark, rows)).collect()}
    assert out[(1, 2)].lcs_len == 2
    assert out[(2, 3)].lcs_len == 4
    assert out[(1, 2)].n_a == 4 and out[(1, 2)].n_b == 4


def test_lcs_empty_intersection_and_truncation(spark):
    # disjoint alphabets -> LCS 0; sequences truncate at T
    from tsaug_spark.plans.metrics import lcs_pairs
    rows = [(i, i, 1, "a", 1.0, None) for i in range(5)]
    rows += [(100 + i, i, 2, "b", 1.0, None) for i in range(40)]
    out = lcs_pairs(_events(spark, rows), T=32).collect()[0]
    assert out.lcs_len == 0
    assert out.n_a == 5 and out.n_b == 32  # user 2 truncated to T
