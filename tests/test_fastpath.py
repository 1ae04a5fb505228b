"""Deterministic batched fast path (plans.pack subseed stream) ==
local batch augment, bit for bit.

Ops with rng-independent cores (deterministic_core) take a batched
_core call per equal-length block; this must be indistinguishable from
the per-series path and from the local in-memory run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tsaug_spark import operators as O
from tsaug_spark.plans.pack import apply_operator

N, T, C = 24, 37, 2


@pytest.fixture(scope="module")
def batch_df(spark):
    rng = np.random.RandomState(3)
    X = rng.uniform(size=(N, T, C))
    pdf = pd.DataFrame(
        {
            "conv_id": np.repeat([f"c{i:03d}" for i in range(N)], T),
            "bucket_idx": np.tile(np.arange(T), N),
            "a": X[:, :, 0].ravel(),
            "b": X[:, :, 1].ravel(),
        }
    )
    return X, spark.createDataFrame(pdf)


@pytest.mark.parametrize(
    "op",
    [
        O.Pool(size=4, seed=0),
        O.Pool(kind="max", size=5, seed=0),
        O.Reverse(),
        O.Resize(size=12),
        O.Resize(size=T),  # identity-size quirk (reference resize.py:82-90)
        O.Quantize(n_levels=6, seed=1),
        O.Quantize(n_levels=6, how="quantile", seed=1),
        O.Convolve(window="hann", size=7, seed=2),
        O.Convolve(window="blackman", size=6, seed=2),
    ],
    ids=lambda op: f"{type(op).__name__}",
)
def test_fastpath_equals_local(batch_df, op):
    X, df = batch_df
    assert op.deterministic_core
    out = (
        apply_operator(df, op, ["a", "b"], mode="subseed")
        .toPandas()
        .sort_values(["conv_id", "rep_idx", "bucket_idx"])
    )
    got = out[["a", "b"]].to_numpy().reshape(N, -1, C)
    assert np.array_equal(got, op.augment(X))


def test_random_ops_not_fastpathed():
    for op in [
        O.Pool(size=(2, 5)),
        O.Dropout(),
        O.AddNoise(),
        O.TimeWarp(),
        O.Drift(),
        O.Crop(size=10),
        O.Quantize(how="kmeans"),
        O.Convolve(window=["hann", "blackman"]),
    ]:
        assert not op.deterministic_core, type(op).__name__
