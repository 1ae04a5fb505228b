"""asof_join vs the pandas merge_asof oracle (ties, missing keys,
tolerance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tsaug_spark.plans.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "zz"], size=200),
            "t": rng.randint(0, 1000, size=200).astype("int64"),
            "payload": np.arange(200, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=60),
            "rt": rng.randint(0, 1000, size=60).astype("int64"),
            "v": rng.uniform(size=60),
        }
    )
    # exact-tie rows: a right row at a left timestamp must match
    right.loc[0, ["k", "rt"]] = ["a", int(left.loc[0, "t"])]
    right = right.drop_duplicates(["k", "rt"], keep="last")
    return left, right


def _oracle(left, right, tolerance=None, direction="backward"):
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    out = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("rt").rename(columns={"rt": "t"}),
        on="t",
        by="k",
        direction=direction,
        **kw,
    )
    return out.sort_values("payload").reset_index(drop=True)


@pytest.mark.parametrize("tolerance", [None, 100])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_merge_asof(spark, frames, tolerance, direction):
    left, right = frames
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key_cols=["k"],
        time_col="t",
        value_cols=["v"],
        right_time_col="rt",
        tolerance=tolerance,
        direction=direction,
    )
    got = (
        out.toPandas().sort_values("payload").reset_index(drop=True)
    )
    exp = _oracle(left, right, tolerance, direction)
    pd.testing.assert_series_equal(
        got["v"], exp["v"], check_dtype=False
    )
    # the matched right timestamp is exposed for lineage/tolerance use
    assert (got["asof_t"].isna() == got["v"].isna()).all()
    # unmatched key ('zz') stays NULL
    assert got.loc[got["k"] == "zz", "v"].isna().all()


@pytest.mark.parametrize("tolerance", [None, 100])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_salted_asof_matches_unsalted(spark, frames, tolerance, direction):
    """salt_interval must not change results — only the partitioning."""
    left, right = frames
    kwargs = dict(
        key_cols=["k"],
        time_col="t",
        value_cols=["v"],
        right_time_col="rt",
        tolerance=tolerance,
        direction=direction,
    )
    l_df, r_df = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = (
        asof_join(l_df, r_df, **kwargs)
        .toPandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    # 50-second chunks over a 0..1000 time range -> ~20 chunks per key,
    # including chunks with left rows but no right rows (carry-in path)
    salted = (
        asof_join(l_df, r_df, salt_interval=50, **kwargs)
        .toPandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        plain[["k", "t", "payload", "v", "asof_t"]],
        salted[["k", "t", "payload", "v", "asof_t"]],
        check_dtype=False,
    )


def test_salted_asof_hot_key(spark):
    """A single hot key spanning many chunks: salted result == pandas
    merge_asof, and the window partitions on (key, chunk)."""
    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": ["hot"] * 5000,
            "t": np.sort(rng.randint(0, 100000, size=5000)).astype("int64"),
            "payload": np.arange(5000, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": ["hot"] * 300,
            "rt": rng.randint(0, 100000, size=300).astype("int64"),
            "v": rng.uniform(size=300),
        }
    ).drop_duplicates(["k", "rt"], keep="last")
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key_cols=["k"],
        time_col="t",
        value_cols=["v"],
        right_time_col="rt",
        salt_interval=1000,
    )
    got = out.toPandas().sort_values("payload").reset_index(drop=True)
    exp = _oracle(left, right)
    pd.testing.assert_series_equal(got["v"], exp["v"], check_dtype=False)


def test_salted_asof_randomized_property(spark):
    """Randomized stress across seeds: salted == unsalted on frames
    with duplicate times, missing keys, and chunk-boundary values."""
    for seed in (11, 29, 47):
        rng = np.random.RandomState(seed)
        left = pd.DataFrame(
            {
                "k": rng.choice(list("abcdef"), size=400),
                # multiples of 25 land exactly on 50-wide chunk edges
                "t": (rng.randint(0, 40, size=400) * 25).astype("int64"),
                "payload": np.arange(400, dtype="int64"),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.choice(list("abcd"), size=80),
                "rt": (rng.randint(0, 40, size=80) * 25).astype("int64"),
                "v": rng.uniform(size=80),
            }
        ).drop_duplicates(["k", "rt"], keep="last")
        kwargs = dict(
            key_cols=["k"], time_col="t", value_cols=["v"],
            right_time_col="rt",
        )
        l_df = spark.createDataFrame(left)
        r_df = spark.createDataFrame(right)
        for direction in ("backward", "forward", "nearest"):
            plain = (
                asof_join(l_df, r_df, direction=direction, **kwargs)
                .toPandas()
                .sort_values("payload")
                .reset_index(drop=True)
            )
            salted = (
                asof_join(
                    l_df, r_df, direction=direction, salt_interval=50,
                    **kwargs,
                )
                .toPandas()
                .sort_values("payload")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                plain[["v", "asof_t"]],
                salted[["v", "asof_t"]],
                check_dtype=False,
                obj=f"seed={seed} dir={direction}",
            )
