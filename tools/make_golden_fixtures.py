"""Generate golden-fixture parquet oracles for the true-RNG / binary-sketch
registry entries that previously had no SQL twin.

Why a fixture is a legitimate oracle here: each of these entries is a
deterministic, partitioning-independent function of the input tables —
the RNG kernels seed a ``numpy.random.RandomState`` per (series, rep)
via the subseed plan (tsaug_spark/plans/rng_plan.py), so their output
never depends on partition layout or executor count, and the sketch
entries are pure hash functions of the input set.  The VALUES are
anchored to the reference implementation by the parity suite
(tests/test_spark_kernels.py runs the same kernels distributed vs the
reference-ported local path, bit-exact; the reference's own seed
contract is /root/reference/tests/test_random_seed.py:44-164).  The
fixture pins those proven values so the driver's rows/schema/hash gate
can check them like any other oracle.

Self-check built in: every query is executed TWICE per scale factor —
once at the session's default shuffle parallelism and once with the
input pre-repartitioned and ``spark.sql.shuffle.partitions`` changed —
and the two runs must match exactly before the fixture is written.

Output layout: one parquet file per entry at
``/root/repo/fixtures/golden/<name>.parquet`` holding all three scale
factors, discriminated by an ``n_events`` column (= row count of the
``events`` table at that sf: 1000 / 10000 / 100000).  The oracle SQL is

    SELECT * EXCLUDE (n_events)
    FROM read_parquet('/root/repo/fixtures/golden/<name>.parquet')
    WHERE n_events = (SELECT count(*) FROM events)

Usage::

    python tools/make_golden_fixtures.py [name ...]
    python tools/make_golden_fixtures.py --check [name ...]

``--check`` recomputes every entry and compares it EXACTLY against the
committed fixture without rewriting anything — a kernel drift vs the
pinned values fails loudly instead of silently passing the pinned
oracle.  tests/test_golden_fixtures.py wires the check into pytest.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

GOLDEN = [
    "kernel_dropout",
    "kernel_addnoise",
    "kernel_timewarp",
    "kernel_drift",
    "kernel_kmeans",
    "sketch_distinct_daily",
    "distinct_cascade_1d",
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

OUT_DIR = "/root/repo/fixtures/golden"


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    return out.sort_values(cols).reset_index(drop=True)


def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """Exact-value, order- and dtype-width-insensitive frame equality."""
    import pandas.testing as pdt

    na, nb = _normalize(a), _normalize(b)
    if list(na.columns) != list(nb.columns) or len(na) != len(nb):
        return False
    try:
        pdt.assert_frame_equal(
            na, nb, check_dtype=False, check_exact=True
        )
        return True
    except AssertionError:
        return False


def check_entry(spark, name: str, sf: str) -> None:
    """Recompute ``name`` at ``sf`` and assert it equals the committed
    fixture slice exactly.  Raises AssertionError on drift."""
    import duckdb

    import __spark_entry__ as entrymod

    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    fixture = pd.read_parquet(f"{OUT_DIR}/{name}.parquet")
    pinned = fixture[fixture["n_events"] == n_events].drop(
        columns=["n_events"]
    )
    assert len(pinned), f"{name}: no fixture slice for n_events={n_events}"
    live = entrymod.queries()[name](spark, sf).toPandas()
    assert frames_match(live, pinned), (
        f"{name}@{sf}: live output drifted from the committed fixture "
        f"({len(live)} live rows vs {len(pinned)} pinned) — if the "
        "kernel change is INTENDED, regenerate via "
        "tools/make_golden_fixtures.py and re-verify parity first"
    )


def main() -> int:
    argv = sys.argv[1:]
    check_only = "--check" in argv
    only = {a for a in argv if a != "--check"}
    names = [n for n in GOLDEN if not only or n in only]

    if check_only:
        from tsaug_spark.session import get_spark

        spark = get_spark(
            "golden-check", master="local[8]", shuffle_partitions=8
        )
        for name in names:
            for sf in SF_DIRS:
                check_entry(spark, name, sf)
                print(f"  {name}@{os.path.basename(sf)}: matches")
        print("all fixtures match")
        return 0

    import duckdb

    import __spark_entry__ as entrymod
    from tsaug_spark.session import get_spark

    spark = get_spark(
        "golden-fixtures", master="local[8]", shuffle_partitions=8
    )
    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)

    for name in names:
        slices = []
        for sf in SF_DIRS:
            n_events = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')"
            ).fetchone()[0]
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            a = qs[name](spark, sf).toPandas()
            # second run under a different layout: partition-independence
            # is the property that makes a pinned fixture sound
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            b = qs[name](spark, sf).toPandas()
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            na, nb = _normalize(a), _normalize(b)
            if not na.equals(nb):
                raise AssertionError(
                    f"{name}@{sf}: output is partition-dependent; "
                    "cannot pin a fixture"
                )
            a = a.copy()
            a["n_events"] = n_events
            slices.append(a)
            print(f"  {name}@{os.path.basename(sf)}: {len(a)} rows ok")
        allsf = pd.concat(slices, ignore_index=True)
        path = f"{OUT_DIR}/{name}.parquet"
        allsf.to_parquet(path, index=False)
        print(f"wrote {path}: {len(allsf)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
