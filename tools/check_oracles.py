"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, column set,
and an order-insensitive value hash.  Usage::

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    norm = []
    for c in cols:
        s = pdf[c]
        if s.dtype == object:
            norm.append(s.astype(str))
        elif np.issubdtype(s.dtype, np.floating):
            norm.append(s.round(9).map(lambda v: f"{v:.9g}"))
        else:
            norm.append(s.astype(str))
    joined = norm[0].str.cat(norm[1:], sep="|") if len(norm) > 1 else norm[0]
    digest = hashlib.sha256(
        "\n".join(sorted(joined.tolist())).encode()
    ).hexdigest()
    return digest


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tsaug_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(got)} rows (rows-only, "
                f"{time.time() - t0:.1f}s)"
            )
            if len(got) == 0:
                failures.append(name)
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(
                f"cols {sorted(got.columns)} != {sorted(want.columns)}"
            )
        else:
            # the driver's hash is dtype-sensitive: DuckDB returning an
            # integer SUM as HUGEINT->float64 while Spark returns int64
            # fails there even though values match numerically, so flag
            # any int-vs-float kind divergence here too
            for c in got.columns:
                gk = got[c].dtype.kind
                wk = want[c].dtype.kind
                if {gk, wk} == {"i", "f"} or {gk, wk} == {"u", "f"}:
                    problems.append(
                        f"dtype kind {c}: spark {got[c].dtype} vs "
                        f"oracle {want[c].dtype}"
                    )
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
            merged = got.sort_values(sorted(got.columns)).reset_index(
                drop=True
            ).compare(
                want[got.columns].sort_values(
                    sorted(got.columns)
                ).reset_index(drop=True)
            )
            print(merged.head(8))
        status = "ok   " if not problems else "FAIL "
        print(
            f"{status} {name}: {len(got)} rows "
            f"({time.time() - t0:.1f}s) {'; '.join(problems)}"
        )
        if problems:
            failures.append(name)
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
