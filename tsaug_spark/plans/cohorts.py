"""Cohort retention and funnel conversion over the event stream.

The behavioral-analytics pair every event pipeline ends up needing
(Mixpanel/Amplitude-class queries), expressed as pure Catalyst plans so
they cascade from the same tier tables as the rest of the engine and
replay exactly in the DuckDB oracle.

Scale notes (10^12 events):

* ``cohort_retention`` is two hash aggregates and one equi-join, all
  keyed on the user — co-partitioned under AQE, no broadcast needed on
  the big sides.  The output is bounded by cohorts x offsets (e.g. 365
  x 365 rows for a year of daily cohorts), never by event volume.
* ``funnel`` runs one conditional aggregate per stage plus an equi-join
  per stage transition, again all on the user key, so the whole funnel
  is a chain of co-partitioned shuffles whose intermediate frames
  shrink monotonically (each stage keeps only survivors).  Delays are
  summed as exact integer microseconds so the per-stage mean is one
  shared float division — deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_S = 86400


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention matrix.

    A user's cohort is their first-seen day; for every (cohort day,
    day offset) the matrix counts how many of that cohort's users were
    active ``offset`` days after their first day, plus the cohort size
    and the retention rate.

    Output: cohort_s, offset_d, n_active, cohort_size, retention
    (retention = n_active / cohort_size, one shared float division over
    exact integer counts).
    """
    day = (
        F.floor(F.unix_timestamp(ts_col) / DAY_S) * DAY_S
    ).cast("long")
    active = (
        df.select(F.col(key_col).alias("key"), day.alias("day_s"))
        .distinct()
    )
    cohort = active.groupBy("key").agg(
        F.min("day_s").alias("cohort_s")
    )
    sizes = cohort.groupBy("cohort_s").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        active.join(cohort, "key")
        .groupBy(
            "cohort_s",
            (
                (F.col("day_s") - F.col("cohort_s")) / F.lit(DAY_S)
            )
            .cast("long")
            .alias("offset_d"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_s").select(
        "cohort_s",
        "offset_d",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


def funnel(
    df: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: how many users performed each stage
    STRICTLY AFTER completing the previous one (earliest-qualifying
    timestamps; ties on the exact microsecond do not advance).

    Output: one row per stage — stage_idx, stage, users,
    avg_hours_from_start (mean delay from the user's stage-0 time to
    their qualifying time at this stage; 0.0 for stage 0).  Delays are
    aggregated as exact integer microsecond sums, so the mean is a
    single float division and the result is partitioning-independent.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).cast("timestamp").alias("ets"),
    )
    # exact integer event times: unix_micros here == epoch_us in DuckDB
    us = F.unix_micros
    cur = (
        base.filter(F.col("etype") == stages[0])
        .groupBy("key")
        .agg(F.min(us(F.col("ets"))).alias("t_us"))
        .withColumn("t0_us", F.col("t_us"))
    )
    tiers = [cur]
    for stage in stages[1:]:
        nxt = (
            base.filter(F.col("etype") == stage)
            .join(cur.select("key", "t_us", "t0_us"), "key")
            .filter(us(F.col("ets")) > F.col("t_us"))
            .groupBy("key", "t0_us")
            .agg(F.min(us(F.col("ets"))).alias("t_us"))
            .select("key", "t_us", "t0_us")
        )
        tiers.append(nxt)
        cur = nxt
    rows = None
    for idx, (stage, tier) in enumerate(zip(stages, tiers)):
        agg = tier.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("users"),
            F.sum(F.col("t_us") - F.col("t0_us")).alias("delay_us"),
        )
        rows = agg if rows is None else rows.unionByName(agg)
    return rows.select(
        "stage_idx",
        "stage",
        "users",
        (
            F.col("delay_us").cast("double")
            / F.lit(3_600_000_000.0)
            / F.nullif(F.col("users"), F.lit(0)).cast("double")
        ).alias("avg_hours_from_start"),
    )


def dau_overlap(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-over-day active-user overlap: for each consecutive day
    pair, how many users were active BOTH days, and the Jaccard
    stickiness of the two active sets — the day-N retention pulse a
    growth dashboard tracks between full cohort reports.

    All integers (distinct (user, day) pairs, equi-joined on day+1);
    Jaccard is one shared final division.

    Scale: the distinct pass is one (user, day) hash aggregate; the
    self-join keys on user AND day, so it is co-partitioned and
    linear, never a cross of the day's actives.
    """
    du = df.select(
        F.col(key_col).alias("u"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        .cast("long")
        .alias("day"),
    ).distinct()
    per_day = du.groupBy("day").agg(F.count(F.lit(1)).alias("actives"))
    inter = (
        du.alias("a")
        .join(
            du.select(
                F.col("u").alias("u_b"),
                (F.col("day") - 1).alias("day"),
            ).alias("b"),
            (F.col("a.u") == F.col("u_b"))
            & (F.col("a.day") == F.col("b.day")),
        )
        .groupBy("a.day")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    n1 = per_day.select(
        F.col("day"), F.col("actives").alias("actives_d")
    )
    n2 = per_day.select(
        (F.col("day") - 1).alias("day"),
        F.col("actives").alias("actives_next"),
    )
    return (
        n1.join(n2, "day")
        .join(inter, "day", "left")
        .select(
            "day",
            "actives_d",
            "actives_next",
            F.coalesce("both", F.lit(0)).alias("both"),
            (
                F.coalesce("both", F.lit(0)).cast("double")
                / (
                    F.col("actives_d")
                    + F.col("actives_next")
                    - F.coalesce("both", F.lit(0))
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def kaplan_meier(
    life: DataFrame,
    t_col: str = "t",
    event_col: str = "ended",
) -> DataFrame:
    """Kaplan-Meier survival estimator over a right-censored duration
    table: one row per subject with its duration ``t_col`` (integer)
    and ``event_col`` TRUE when the endpoint was OBSERVED (FALSE =
    censored — the subject was still alive when observation stopped;
    naive curves that ignore censoring bias the endpoint rate upward).

        S(t) = prod_{t' <= t, d_{t'} > 0} (1 - d_{t'} / n_{t'})

    with d = observed endpoints at duration t', n = at-risk set
    (duration >= t').  All counts are exact BIGINTs; each factor is
    ONE shared division, and the cumulative product folds factors in
    duration order per output row (sorted fold over the bounded set of
    event times) — identical accumulation in both engines.

    Scale: everything runs on the duration-axis-bounded table (one
    row per distinct duration): a suffix-sum window for the risk set
    and a bounded factor self-join for the product — subject volume
    only touches the first aggregate.
    """
    by_t = life.groupBy(F.col(t_col).alias("t")).agg(
        F.sum(F.when(F.col(event_col), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("ended_here"),
    )
    wr = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_t.select(
        "t", "d", F.sum("ended_here").over(wr).alias("n_risk")
    )
    ev_t = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        (
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ).alias("factor"),
    )
    f2 = ev_t.select(F.col("t").alias("t2"), F.col("factor").alias("f2"))
    return (
        ev_t.join(f2, F.col("t2") <= F.col("t"))
        .groupBy("t", "d", "n_risk")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("t2", "f2"))),
                F.lit(1.0),
                lambda a, st: a * st["f2"],
            ).alias("survival")
        )
        .select(
            F.col("t").alias("duration"),
            F.col("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            "survival",
        )
    )


def session_lifetimes(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Right-censored session-duration table (t minutes, ended flag):
    the shared input of :func:`kaplan_meier` / :func:`nelson_aalen` —
    a session whose last event falls within the inactivity gap of the
    table's end may still be ongoing, so it is CENSORED rather than
    ended.  Sessionization is the repo's standard islands chain (exact
    integer-second gap comparisons)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("oid"),
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.lag(ts_col).over(w))
                > gap_seconds
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w2 = Window.partitionBy("key").orderBy("ts", "oid")
    sess = (
        flagged.select(
            "key",
            "ts",
            F.sum("new_s")
            .over(w2.rowsBetween(Window.unboundedPreceding, 0))
            .alias("sid"),
        )
        .groupBy("key", "sid")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("start_s"),
            F.max(F.unix_timestamp("ts")).alias("end_s"),
        )
    )
    mx = sess.agg(F.max("end_s").alias("max_s"))
    return sess.crossJoin(F.broadcast(mx)).select(
        F.floor((F.col("end_s") - F.col("start_s")) / 60)
        .cast("long")
        .alias("t"),
        (F.col("end_s") <= F.col("max_s") - F.lit(gap_seconds)).alias(
            "ended"
        ),
    )


def session_survival(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Kaplan-Meier survival of session duration (minutes) with
    table-edge censoring — see :func:`session_lifetimes`."""
    return kaplan_meier(
        session_lifetimes(df, gap_seconds, key_col, ts_col, order_col)
    )


def logrank_sessions(
    df: DataFrame,
    split_type: str = "click",
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Log-rank test (Mantel-Cox) between two session-survival curves:
    do sessions that OPEN with ``split_type`` live longer than the
    rest?  The standard censoring-aware two-sample comparison — a
    t-test on durations would be biased by the table-edge censoring
    that :func:`session_survival` handles.

    At each event time t (pooled): O1 = events in group 1, E1 =
    d * n1 / n, V = d*(n1/n)*(1-n1/n)*(n-d)/(n-1); the statistic is
    (sum(O1-E1))^2 / sum(V) ~ chi2(1).  Counts are exact BIGINTs from
    two suffix-sum windows over the bounded duration axis; E1 and V
    are shared per-time expressions folded in duration order (sorted
    fold), and the final ratio is one shared division.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("oid"),
        F.col(type_col).alias("etype"),
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.lag(ts_col).over(w))
                > gap_seconds
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w2 = Window.partitionBy("key").orderBy("ts", "oid")
    sess = (
        flagged.select(
            "key",
            "ts",
            "etype",
            "oid",
            F.sum("new_s")
            .over(w2.rowsBetween(Window.unboundedPreceding, 0))
            .alias("sid"),
        )
        .groupBy("key", "sid")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("start_s"),
            F.max(F.unix_timestamp("ts")).alias("end_s"),
            F.min(F.struct("ts", "oid", "etype")).alias("first_ev"),
        )
    )
    mx = sess.agg(F.max("end_s").alias("max_s"))
    life = sess.crossJoin(F.broadcast(mx)).select(
        F.floor((F.col("end_s") - F.col("start_s")) / 60)
        .cast("long")
        .alias("t"),
        (F.col("end_s") <= F.col("max_s") - F.lit(gap_seconds)).alias(
            "ended"
        ),
        (F.col("first_ev.etype") == split_type).alias("g1"),
    )
    by_t = life.groupBy("t").agg(
        F.sum(F.when(F.col("ended"), 1).otherwise(0)).alias("d"),
        F.sum(
            F.when(F.col("ended") & F.col("g1"), 1).otherwise(0)
        ).alias("d1"),
        F.count(F.lit(1)).alias("here"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("here1"),
    )
    wr = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_t.select(
        "t",
        "d",
        "d1",
        F.sum("here").over(wr).alias("n"),
        F.sum("here1").over(wr).alias("n1"),
    ).filter(F.col("d") > 0)
    nd = F.col("n").cast("double")
    terms = risk.select(
        "t",
        "d",
        "d1",
        "n",
        "n1",
        (
            F.col("d1").cast("double")
            - F.col("d").cast("double") * F.col("n1").cast("double") / nd
        ).alias("oe"),
        F.when(
            F.col("n") > 1,
            F.col("d").cast("double")
            * (F.col("n1").cast("double") / nd)
            * (F.lit(1.0) - F.col("n1").cast("double") / nd)
            * (F.col("n") - F.col("d")).cast("double")
            / (F.col("n") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_times"),
        F.sum("d1").alias("o1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", "oe"))),
            F.lit(0.0),
            lambda a, st: a + st["oe"],
        ).alias("z"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", "v"))),
            F.lit(0.0),
            lambda a, st: a + st["v"],
        ).alias("var"),
    )
    return agg.select(
        F.col("n_times").cast("long").alias("n_times"),
        F.col("o1").cast("long").alias("o1"),
        "z",
        "var",
        F.when(
            F.col("var") > 0, F.col("z") * F.col("z") / F.col("var")
        ).alias("chi2_logrank"),
    )


def nelson_aalen(
    life: DataFrame,
    t_col: str = "t",
    event_col: str = "ended",
) -> DataFrame:
    """Nelson-Aalen cumulative hazard over a right-censored duration
    table — Kaplan-Meier's additive sibling:

        H(t) = sum_{t' <= t, d_{t'} > 0} d_{t'} / n_{t'}

    preferred when hazard INCREMENTS are the object of interest (the
    per-step d/n is the hazard itself) and for small risk sets where
    the product form is unstable.  Also reported: the Fleming-
    Harrington survival exp(-H) next to what KM would give.

    Same exactness contract as :func:`kaplan_meier`: BIGINT counts
    from a suffix-sum window over the bounded duration axis, one
    shared division per step, cumulative sum via a bounded self-join
    folded in duration order.
    """
    by_t = life.groupBy(F.col(t_col).alias("t")).agg(
        F.sum(F.when(F.col(event_col), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("ended_here"),
    )
    wr = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_t.select(
        "t", "d", F.sum("ended_here").over(wr).alias("n_risk")
    )
    ev_t = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        (F.col("d").cast("double") / F.col("n_risk").cast("double"))
        .alias("inc"),
    )
    f2 = ev_t.select(F.col("t").alias("t2"), F.col("inc").alias("i2"))
    return (
        ev_t.join(f2, F.col("t2") <= F.col("t"))
        .groupBy("t", "d", "n_risk")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("t2", "i2"))),
                F.lit(0.0),
                lambda a, st: a + st["i2"],
            ).alias("cum_hazard")
        )
        .select(
            F.col("t").alias("duration"),
            F.col("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            "cum_hazard",
            F.exp(-F.col("cum_hazard")).alias("fh_survival"),
        )
    )


def rfm_segments(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    purchase_type: str = "purchase",
    n_tiles: int = 5,
) -> DataFrame:
    """Recency-Frequency-Monetary segmentation (Hughes 1994): score
    every purchasing user 1..n on each axis by quantile, then report
    the segment grid — the customer-base health matrix ("champions" =
    555, "at risk" = low R high FM) that every growth team asks the
    event store for.

    Determinism: recency is exact integer days from the GLOBAL max
    event day (not wall clock — replays identically); frequency is a
    BIGINT count; monetary is exact integer cents (value * 100 rounded
    once).  Scores use ``ntile`` over a FULLY-TIED-BROKEN ordering
    (metric, then user_id) — ntile's bucket boundaries are a pure
    function of row count and rank in both engines, so with a total
    order the assignment is bit-identical.  Recency orders ASCENDING
    on days-since (freshest first = highest score band inverted to
    n_tiles+1-tile so 5 always means "best").

    Scale: one user-grain hash aggregate over purchases, three
    window passes on the user frame (user-count-sized, NOT
    event-sized), one segment-grain aggregate; output bounded by
    n_tiles^3 rows.  The unpartitioned ntile windows serialize on one
    task — fine to ~10^8 purchasing users; past that the production
    swap is percentile_approx cut-points (boundary-tie fuzz traded
    for full parallelism), which this oracle-exact variant documents
    against.
    """
    mx = df.select(
        F.max(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
        ).alias("mxd")
    )
    per_user = (
        df.filter(F.col(type_col) == purchase_type)
        .crossJoin(F.broadcast(mx))
        .select(
            F.col(user_col).alias("u"),
            (
                F.col("mxd")
                - F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
            ).cast("long").alias("days_since"),
            F.round(F.col(value_col) * 100.0, 0)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("u")
        .agg(
            F.min("days_since").alias("recency_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").alias("monetary_c"),
        )
    )
    nt = int(n_tiles)
    r_w = Window.orderBy(F.col("recency_d").asc(), F.col("u").asc())
    f_w = Window.orderBy(F.col("freq").asc(), F.col("u").asc())
    m_w = Window.orderBy(F.col("monetary_c").asc(), F.col("u").asc())
    scored = per_user.select(
        "u",
        "recency_d",
        "freq",
        "monetary_c",
        (F.lit(nt + 1) - F.ntile(nt).over(r_w)).alias("r_score"),
        F.ntile(nt).over(f_w).alias("f_score"),
        F.ntile(nt).over(m_w).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("monetary_c").alias("segment_cents"),
            F.min("u").alias("example_user"),
        )
        .select(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
            "n_users",
            "segment_cents",
            "example_user",
        )
    )


def cohort_ltv(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    revenue_type: str = "purchase",
) -> DataFrame:
    """Weekly-cohort cumulative lifetime value curve — for each
    signup-week cohort (a user's cohort is the week of their first
    event of ANY type) and each user-aligned week offset, the
    cumulative ``revenue_type`` cents per cohort member; the revenue
    companion to :func:`cohort_retention`'s activity matrix.

    Exactness: revenue is exact cents, the running total is a window
    sum of exact BIGINTs over the dense zero-filled offset grid
    (missing weeks must carry the cumulative value forward, not punch
    holes in the curve), and LTV-per-user is ONE final division.

    Scale: a user-grain first-seen aggregate, one co-partitioned
    equi-join to stamp offsets, a (cohort, offset) hash aggregate,
    and one ordered window over the retention-bounded offset axis —
    offsets scale with the horizon, never event volume.

    Output: cohort_wk_s, offset_w, cohort_size, rev_cents,
    cum_cents, ltv_cents_per_user.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / DAY_S).cast(
        "long"
    )
    base = df.select(
        F.col(key_col).alias("key"),
        day.alias("day"),
        F.col(type_col).alias("etype"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    cohort = base.groupBy("key").agg(F.min("day").alias("c_day"))
    cohort = cohort.select(
        "key", "c_day", F.floor(F.col("c_day") / 7).alias("c_wk")
    )
    sizes = cohort.groupBy("c_wk").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    purch = (
        base.filter(F.col("etype") == revenue_type)
        .join(cohort, "key")
        .groupBy(
            "c_wk",
            F.floor((F.col("day") - F.col("c_day")) / 7)
            .cast("long")
            .alias("offset_w"),
        )
        .agg(F.sum("cents").alias("rev"))
    )
    maxoff = purch.agg(
        F.coalesce(F.max("offset_w"), F.lit(0)).alias("mx")
    )
    grid = (
        sizes.select("c_wk")
        .crossJoin(F.broadcast(maxoff))
        .select(
            "c_wk",
            F.explode(F.sequence(F.lit(0), F.col("mx"))).alias(
                "offset_w"
            ),
        )
    )
    dense = grid.join(purch, ["c_wk", "offset_w"], "left").select(
        "c_wk",
        "offset_w",
        F.coalesce("rev", F.lit(0)).alias("rev"),
    )
    w = (
        Window.partitionBy("c_wk")
        .orderBy("offset_w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = dense.select(
        "c_wk",
        "offset_w",
        "rev",
        F.sum("rev").over(w).alias("cum"),
    ).join(F.broadcast(sizes), "c_wk")
    return out.select(
        (F.col("c_wk") * 7 * DAY_S).cast("long").alias("cohort_wk_s"),
        F.col("offset_w").cast("long").alias("offset_w"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.col("rev").cast("long").alias("rev_cents"),
        F.col("cum").cast("long").alias("cum_cents"),
        (
            F.col("cum").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("ltv_cents_per_user"),
    )
