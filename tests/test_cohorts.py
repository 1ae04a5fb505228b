"""Closed-form semantics tests for plans/cohorts.py — tiny
hand-computed fixtures; the full-table correctness evidence is the
DuckDB oracle twins (cohort_retention / funnel_signup_purchase)."""

from __future__ import annotations

import datetime as dt

from tsaug_spark.plans.cohorts import cohort_retention, funnel

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (user_id, seconds-offset, event_type)."""
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(seconds=s), et)
            for u, s, et in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )


DAY = 86400


def test_cohort_retention_matrix(spark):
    # users 1,2 first seen day 0; user 3 first seen day 1.
    # day-0 cohort: both active d0; only user 1 active d1; user 2 d2.
    rows = [
        (1, 0, "view"),
        (2, 10, "view"),
        (1, DAY + 5, "view"),
        (2, 2 * DAY + 5, "view"),
        (3, DAY + 50, "view"),
        (3, DAY + 60, "view"),  # same day — distinct'd away
    ]
    out = {
        (r.cohort_s, r.offset_d): (
            r.n_active,
            r.cohort_size,
            r.retention,
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    c0 = int(T0.timestamp()) // DAY * DAY
    assert out == {
        (c0, 0): (2, 2, 1.0),
        (c0, 1): (1, 2, 0.5),
        (c0, 2): (1, 2, 0.5),
        (c0 + DAY, 0): (1, 1, 1.0),
    }


def test_funnel_strictly_after_ordering(spark):
    # user 1 completes signup -> view -> purchase in order.
    # user 2 purchases BEFORE viewing: reaches view, not purchase.
    # user 3 views at the exact same microsecond as signup: tie does
    #   not advance (strictly after).
    # user 4 never signs up: not in the funnel at all.
    rows = [
        (1, 0, "signup"), (1, 3600, "view"), (1, 7200, "purchase"),
        (2, 0, "signup"), (2, 100, "purchase"), (2, 200, "view"),
        (3, 0, "signup"), (3, 0, "view"),
        (4, 0, "view"), (4, 10, "purchase"),
    ]
    out = {
        r.stage: (r.stage_idx, r.users, r.avg_hours_from_start)
        for r in funnel(
            _ev(spark, rows), ["signup", "view", "purchase"]
        ).collect()
    }
    assert out["signup"] == (0, 3, 0.0)
    # user 1 views at +1h, user 2 at +200s
    assert out["view"][0:2] == (1, 2)
    assert abs(out["view"][2] - (3600 + 200) / 2 / 3600) < 1e-12
    # only user 1 purchases after viewing (+2h from signup)
    assert out["purchase"] == (2, 1, 2.0)


def test_funnel_partitioning_independent(spark):
    rows = [
        (u, u * 37 + k * 1000, et)
        for u in range(20)
        for k, et in enumerate(["signup", "view", "purchase"])
    ]
    a = funnel(_ev(spark, rows), ["signup", "view", "purchase"])
    b = funnel(
        _ev(spark, rows).repartition(7),
        ["signup", "view", "purchase"],
    )
    key = lambda r: (r.stage_idx, r.stage, r.users,  # noqa: E731
                     r.avg_hours_from_start)
    assert sorted(map(key, a.collect())) == sorted(
        map(key, b.collect())
    )


def test_conversion_latency_hand_fixture(spark, tmp_path):
    """Hand funnel: per-user delay is first-signup -> first purchase
    at-or-after it; pre-signup purchases don't count; the global
    median uses the two-mid-rank rule."""
    import datetime as dt

    import __spark_entry__ as em
    from pyspark.sql import functions as F

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: signup at 10s, purchases at 5s (ignored) and 40s
        (1, 10, "signup"), (1, 5, "purchase"), (1, 40, "purchase"),
        # user 2: signup 0s, purchase 100s
        (2, 0, "signup"), (2, 100, "purchase"),
        # user 3: signup only -> no row
        (3, 0, "signup"),
        # user 4: purchase only -> no row
        (4, 7, "purchase"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, t, 1.0, "{}")
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = {r.user_id: r for r in em.q_conversion_latency(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1].delay_us == 30_000_000
    assert out[2].delay_us == 100_000_000
    med = (30_000_000 + 100_000_000) / 2
    assert all(r.median_delay_us == med for r in out.values())


def test_dau_overlap_hand_fixture(spark):
    from datetime import datetime, timedelta
    from tsaug_spark.plans.cohorts import dau_overlap
    base = datetime(2024, 1, 1, 12)
    rows = [(base, u) for u in (1, 2, 3)] + [
        (base + timedelta(days=1), u) for u in (2, 3, 4, 5)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    r = dau_overlap(df).collect()[0]
    assert (r.actives_d, r.actives_next, r.both) == (3, 4, 2)
    assert abs(r.jaccard - 2 / 5) < 1e-12


def test_dau_overlap_disjoint_days(spark):
    from datetime import datetime, timedelta
    from tsaug_spark.plans.cohorts import dau_overlap
    base = datetime(2024, 1, 1, 12)
    rows = [(base, 1), (base + timedelta(days=1), 2)]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    r = dau_overlap(df).collect()[0]
    assert r.both == 0 and r.jaccard == 0.0


def test_kaplan_meier_textbook_curve(spark):
    # durations: ended {1, 1, 2}, censored {3}
    # t=1: n=4, d=2 -> S=0.5 ; t=2: n=2, d=1 -> S=0.25
    from tsaug_spark.plans.cohorts import kaplan_meier
    life = spark.createDataFrame(
        [(1, True), (1, True), (2, True), (3, False)],
        "t long, ended boolean",
    )
    out = {r.duration: r for r in kaplan_meier(life).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_risk == 4 and out[1].n_events == 2
    assert abs(out[1].survival - 0.5) < 1e-12
    assert out[2].n_risk == 2 and out[2].n_events == 1
    assert abs(out[2].survival - 0.25) < 1e-12


def test_kaplan_meier_censoring_changes_curve(spark):
    # all-ended vs half-censored at the same durations: censored
    # subjects leave the risk set without an event, raising S
    from tsaug_spark.plans.cohorts import kaplan_meier
    ended = spark.createDataFrame(
        [(1, True), (2, True), (2, True), (3, True)],
        "t long, ended boolean",
    )
    cens = spark.createDataFrame(
        [(1, True), (2, False), (2, True), (3, True)],
        "t long, ended boolean",
    )
    s_ended = {r.duration: r.survival for r in kaplan_meier(ended).collect()}
    s_cens = {r.duration: r.survival for r in kaplan_meier(cens).collect()}
    # ended: S(2) = 3/4 * 1/3 = 1/4 ; censored: S(2) = 3/4 * 2/3 = 1/2
    assert abs(s_ended[2] - 0.25) < 1e-12
    assert abs(s_cens[2] - 0.5) < 1e-12


def test_session_survival_censors_table_edge(spark):
    # one long-running session touching the table end must be censored
    # (no event row at its duration), one clearly-ended session is not
    from datetime import datetime, timedelta
    from tsaug_spark.plans.cohorts import session_survival
    b = datetime(2024, 1, 1)
    rows = []
    # user 1: 10-min session ending long before the table end
    rows += [(0, 1, b), (1, 1, b + timedelta(minutes=10))]
    # user 2: 20-min session whose last event IS the table max
    rows += [(2, 2, b + timedelta(hours=3)),
             (3, 2, b + timedelta(hours=3, minutes=20))]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    out = {r.duration: r for r in session_survival(df).collect()}
    assert 10 in out            # ended session contributes an event
    assert 20 not in out        # censored session makes no step
    assert out[10].n_risk == 2  # but it was at risk


def _lr_events(spark, sessions):
    # sessions: list of (user, start_min, dur_min, first_type)
    from datetime import datetime, timedelta
    b = datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, start, dur, ft in sessions:
        t0 = b + timedelta(minutes=start)
        rows.append((eid, u, t0, ft)); eid += 1
        if dur > 0:
            rows.append((eid, u, t0 + timedelta(minutes=dur), "view"))
            eid += 1
    # a far-future closer so no fixture session is edge-censored
    rows.append((eid, 999, b + timedelta(days=10), "view"))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_logrank_identical_groups_is_zero(spark):
    from tsaug_spark.plans.cohorts import logrank_sessions
    sessions = []
    for i, dur in enumerate((1, 5, 9)):
        sessions.append((10 + i, i * 100, dur, "click"))
        sessions.append((20 + i, i * 100, dur, "error"))
    r = logrank_sessions(_lr_events(spark, sessions)).collect()[0]
    assert abs(r.z) < 1e-12
    assert abs(r.chi2_logrank) < 1e-12


def test_logrank_detects_longer_click_sessions(spark):
    from tsaug_spark.plans.cohorts import logrank_sessions
    sessions = []
    for i in range(6):
        sessions.append((10 + i, i * 100, 20, "click"))  # long
        sessions.append((20 + i, i * 100, 1, "error"))   # short
    r = logrank_sessions(_lr_events(spark, sessions)).collect()[0]
    assert r.chi2_logrank > 3.84  # p < 0.05 at 1 dof
    # clicks die LATE: at early event times fewer click deaths than
    # expected under the pooled hazard -> O1 - E1 sums negative
    assert r.z < 0


def test_nelson_aalen_textbook_curve(spark):
    # ended {1,1,2}, censored {3}: H(1)=2/4, H(2)=1/2+1/2=1
    from math import exp
    from tsaug_spark.plans.cohorts import nelson_aalen
    life = spark.createDataFrame(
        [(1, True), (1, True), (2, True), (3, False)],
        "t long, ended boolean",
    )
    out = {r.duration: r for r in nelson_aalen(life).collect()}
    assert abs(out[1].cum_hazard - 0.5) < 1e-12
    assert abs(out[2].cum_hazard - 1.0) < 1e-12
    assert abs(out[2].fh_survival - exp(-1.0)) < 1e-12
    # FH survival always >= the KM step product at the same times
    from tsaug_spark.plans.cohorts import kaplan_meier
    km = {r.duration: r.survival for r in kaplan_meier(life).collect()}
    assert all(out[t].fh_survival >= km[t] - 1e-12 for t in out)


def test_rfm_segments_monotone_grid(spark):
    """10 users with strictly increasing recency/frequency/monetary:
    quintiles pair off users exactly, every segment is (k,k,k) with 2
    users, and the (5,5,5) champions carry the right cents."""
    from tsaug_spark.plans.cohorts import rfm_segments

    rows = []
    for u in range(10):
        # user u: u+1 purchases on day u, 10.00 each
        rows += [(u, u * DAY, "purchase", 10.0)] * (u + 1)
    rows.append((99, 9 * DAY, "click", 0.0))  # pins mxd at day 9
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, t, v)
            for i, (u, s, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = rfm_segments(df).collect()
    seg = {(r.r_score, r.f_score, r.m_score): r for r in out}
    assert set(seg) == {(k, k, k) for k in range(1, 6)}
    for k in range(1, 6):
        r = seg[(k, k, k)]
        lo_u = 2 * (k - 1)  # users pair off: (0,1)->1 ... (8,9)->5
        assert r.n_users == 2
        assert r.example_user == lo_u
        assert r.segment_cents == ((lo_u + 1) + (lo_u + 2)) * 1000
