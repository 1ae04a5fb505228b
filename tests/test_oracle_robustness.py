"""Guard against ROUND half-way flakes in the driver oracles.

Queries that ROUND an engine-order-dependent aggregate (SUM/AVG) are
only safe while no aggregated value sits exactly on a rounding
boundary — there, Spark's BigDecimal HALF_UP and DuckDB's
multiply-based ROUND can disagree, and Spark's own partial-agg order
varies run to run.  This test scans every such aggregate at sf0.01 and
fails if any value comes within 1e-6 of a half-way point, so a change
in driver data or in a query's rounding surfaces here instead of as an
intermittent CORRECTNESS hash mismatch.  (Bit-identical paths — the
deterministic kernel oracles, gapfill_mean's sorted fold — don't round
at all and need no guard.)
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.01"

#: (name, digits, SQL producing the raw aggregate values being rounded)
ROUNDED_AGGS = [
    ("rollup_1m sum_value", 4,
     "SELECT SUM(value) s FROM events GROUP BY user_id, "
     "CAST(floor(epoch(ts)/60)*60 AS BIGINT)"),
    ("rollup_1h sums", 4,
     "SELECT SUM(value) s FROM events GROUP BY user_id, "
     "CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)"),
    ("cascade_1d sums", 4,
     "SELECT SUM(value) s FROM events GROUP BY user_id, "
     "CAST(floor(epoch(ts)/86400)*86400 AS BIGINT)"),
    ("tpch disc price", 2,
     "SELECT SUM(l_extendedprice * (1 - l_discount)) s FROM lineitem "
     "GROUP BY l_returnflag, l_linestatus"),
    ("nation revenue", 2,
     "SELECT SUM(o_totalprice) s FROM orders JOIN customer "
     "ON o_custkey = c_custkey GROUP BY c_nationkey"),
    ("topk totals", 4,
     "SELECT SUM(value) s FROM events GROUP BY user_id"),
    ("cube totals", 4,
     "SELECT SUM(value) s FROM events GROUP BY CUBE (event_type, "
     "CAST(floor(epoch(ts)/86400)*86400 AS BIGINT))"),
    ("twa_1h twa", 4,
     "WITH b AS (SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS "
     "BIGINT) AS bucket_s, epoch_us(ts)/1e6 AS t, value AS v FROM "
     "events), seg AS (SELECT user_id, bucket_s, v, (lead(v) OVER w + "
     "v)/2.0 * (lead(t) OVER w - t) AS area, lead(t) OVER w - t AS "
     "span FROM b WINDOW w AS (PARTITION BY user_id, bucket_s ORDER "
     "BY t)) SELECT CASE WHEN COALESCE(SUM(span), 0) > 0 THEN "
     "SUM(area)/SUM(span) ELSE AVG(v) END s FROM seg GROUP BY "
     "user_id, bucket_s"),
    ("twa_cascade_1d twa", 4,
     "WITH b AS (SELECT user_id, CAST(floor(epoch(ts)/86400)*86400 AS "
     "BIGINT) AS bucket_s, epoch_us(ts)/1e6 AS t, value AS v FROM "
     "events), seg AS (SELECT user_id, bucket_s, v, (lead(v) OVER w + "
     "v)/2.0 * (lead(t) OVER w - t) AS area, lead(t) OVER w - t AS "
     "span FROM b WINDOW w AS (PARTITION BY user_id, bucket_s ORDER "
     "BY t)) SELECT CASE WHEN COALESCE(SUM(span), 0) > 0 THEN "
     "SUM(area)/SUM(span) ELSE AVG(v) END s FROM seg GROUP BY "
     "user_id, bucket_s"),
    ("counter_rate_1h increase", 4,
     "WITH b AS (SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS "
     "BIGINT) AS bucket_s, epoch_us(ts) AS t, event_id AS o, value AS "
     "v FROM events), d AS (SELECT user_id, bucket_s, CASE WHEN "
     "lag(v) OVER w IS NULL THEN 0.0 WHEN v < lag(v) OVER w THEN v "
     "ELSE v - lag(v) OVER w END AS c FROM b WINDOW w AS (PARTITION "
     "BY user_id ORDER BY t, o)) SELECT SUM(c) s FROM d GROUP BY "
     "user_id, bucket_s"),
    ("counter_rate_1h rate_ps", 6,
     "WITH b AS (SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS "
     "BIGINT) AS bucket_s, epoch_us(ts) AS t, event_id AS o, value AS "
     "v FROM events), d AS (SELECT user_id, bucket_s, CASE WHEN "
     "lag(v) OVER w IS NULL THEN 0.0 WHEN v < lag(v) OVER w THEN v "
     "ELSE v - lag(v) OVER w END AS c FROM b WINDOW w AS (PARTITION "
     "BY user_id ORDER BY t, o)) SELECT SUM(c)/3600.0 s FROM d "
     "GROUP BY user_id, bucket_s"),
    ("percentile p50/p95", 4,
     "SELECT quantile_cont(value, 0.5) s FROM events GROUP BY event_type "
     "UNION ALL SELECT quantile_cont(value, 0.95) FROM events "
     "GROUP BY event_type"),
]


@pytest.mark.parametrize(
    "name,digits,sql", ROUNDED_AGGS, ids=[r[0] for r in ROUNDED_AGGS]
)
def test_no_rounding_boundary_values(name, digits, sql):
    con = duckdb.connect()
    for t in ["events", "lineitem", "orders", "customer"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    n = con.execute(
        f"WITH x AS ({sql}) SELECT COUNT(*) FROM x WHERE "
        f"abs(abs(s) * POW(10, {digits}) - "
        f"floor(abs(s) * POW(10, {digits})) - 0.5) < 1e-6"
    ).fetchone()[0]
    assert n == 0, (
        f"{name}: {n} aggregate value(s) within 1e-6 of a "
        f"{digits}-decimal half-way boundary — the ROUND in this "
        "oracle can flake; pin the computation order or drop the ROUND"
    )
