"""Golden-fixture oracle integrity (fixtures/golden/).

The 7 former rows-only registry entries (5 true-RNG kernels + 2 binary
sketches) are oracled against committed parquet pins.  These tests gate:

1. every fixture holds exactly the three scale-factor slices keyed by
   the events row count (1000 / 10000 / 100000);
2. a fresh Spark run at sf0.001 reproduces the pinned slice exactly
   (the fixture is a pin of a deterministic, partition-independent
   computation — see tools/make_golden_fixtures.py);
3. the oracle SQL in __spark_entry__.oracle_sql() reads back the same
   slice through DuckDB, including the EXCLUDE(n_events) projection.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
GOLDEN_DIR = REPO / "fixtures" / "golden"
SF0001 = "/root/testdata/sf0.001"

GOLDEN = [
    "kernel_dropout",
    "kernel_addnoise",
    "kernel_timewarp",
    "kernel_drift",
    "kernel_kmeans",
    "sketch_distinct_daily",
    "distinct_cascade_1d",
]


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's hash normalization: floats stay float64,
    everything else stringifies (so a DATE read back as all-midnight
    datetime64 equals the original datetime.date objects)."""
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        else:
            out[c] = out[c].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", GOLDEN)
def test_fixture_has_all_three_sf_slices(name):
    pdf = pd.read_parquet(GOLDEN_DIR / f"{name}.parquet")
    assert sorted(pdf["n_events"].unique()) == [1000, 10000, 100000]
    # every slice non-empty
    assert (pdf.groupby("n_events").size() > 0).all()


@pytest.mark.parametrize("name", GOLDEN)
def test_fresh_run_matches_pin_sf0001(spark, name):
    import __spark_entry__ as entrymod

    got = entrymod.queries()[name](spark, SF0001).toPandas()
    pin = pd.read_parquet(GOLDEN_DIR / f"{name}.parquet")
    pin = pin[pin["n_events"] == 1000].drop(columns=["n_events"])
    a, b = _norm(got), _norm(pin)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("name", GOLDEN)
def test_oracle_sql_reads_pin_through_duckdb(name):
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF0001}/events.parquet')"
    )
    got = con.execute(sql).fetchdf()
    assert "n_events" not in got.columns
    pin = pd.read_parquet(GOLDEN_DIR / f"{name}.parquet")
    pin = pin[pin["n_events"] == 1000].drop(columns=["n_events"])
    assert len(got) == len(pin)
    pd.testing.assert_frame_equal(
        _norm(got), _norm(pin), check_dtype=False
    )
