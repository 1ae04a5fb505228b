"""Golden-fixture regeneration gate (round-5 ask #7).

fixtures/golden/ pins the 7 true-RNG / binary-sketch registry entries
to values proven by the distributed-vs-local parity suite.  This gate
recomputes each entry at sf0.001 and compares EXACTLY against the
committed parquet — a kernel drift fails the suite loudly instead of
silently passing the pinned oracle (the oracle compares the driver's
output to the fixture, so an in-sync drift of kernel AND fixture would
otherwise go unnoticed until parity re-ran).

Self-check: a perturbed frame must NOT match, proving the comparator
can fail.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from make_golden_fixtures import (  # noqa: E402
    GOLDEN,
    OUT_DIR,
    check_entry,
    frames_match,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", GOLDEN)
def test_fixture_matches_live_kernel(spark, name):
    check_entry(spark, name, SF)


def test_comparator_flags_perturbed_values():
    fixture = pd.read_parquet(f"{OUT_DIR}/{GOLDEN[0]}.parquet")
    pinned = fixture.drop(columns=["n_events"])
    perturbed = pinned.copy()
    num_cols = [
        c for c in perturbed.columns
        if pd.api.types.is_numeric_dtype(perturbed[c])
    ]
    assert num_cols, "fixture has no numeric column to perturb"
    perturbed.loc[perturbed.index[0], num_cols[0]] += 1
    assert frames_match(pinned, pinned)
    assert not frames_match(pinned, perturbed)


def test_comparator_flags_missing_rows():
    fixture = pd.read_parquet(f"{OUT_DIR}/{GOLDEN[0]}.parquet")
    pinned = fixture.drop(columns=["n_events"])
    assert not frames_match(pinned, pinned.iloc[:-1])
