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
