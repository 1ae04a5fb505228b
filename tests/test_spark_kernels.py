"""Distributed kernel layer: apply_operator/apply_pipe must be bit-exact
vs the local batch path (which is itself bit-exact vs the reference)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tsaug_spark.operators import (
    AddNoise,
    Convolve,
    Crop,
    Drift,
    Dropout,
    Pool,
    Quantize,
    Resize,
    Reverse,
    TimeWarp,
)
from tsaug_spark.plans.pack import apply_operator, apply_pipe

N, T, C = 6, 48, 3
CHANNELS = ["turn_rate", "tool_usage", "text_len"]


@pytest.fixture(scope="module")
def long_df(spark):
    """Rectangular long-format series table for N conversations."""
    rng = np.random.RandomState(99)
    batch = rng.uniform(1.0, 9.0, size=(N, T, C))
    rows = []
    for i in range(N):
        for t in range(T):
            rows.append(
                (f"conv-{i:04d}", t, *[float(v) for v in batch[i, t]])
            )
    pdf = pd.DataFrame(rows, columns=["conv_id", "bucket_idx", *CHANNELS])
    df = spark.createDataFrame(pdf).repartition(5, "conv_id").cache()
    df.count()
    return df, batch


def _collect_out(df, repeats):
    """Distributed output back to a local (N*R, T', C) batch in the
    series-major (conv, rep) order the local path produces."""
    pdf = df.toPandas().sort_values(["conv_id", "rep_idx", "bucket_idx"])
    groups = []
    for (_, _), part in pdf.groupby(["conv_id", "rep_idx"], sort=True):
        groups.append(part[CHANNELS].to_numpy(dtype=np.float64))
    return np.stack(groups)


OPS = [
    Pool(size=4, seed=0),
    Pool(size=(2, 8), per_channel=True, seed=1),
    Pool(kind="max", size=[2, 3, 5], seed=2),
    Pool(repeats=3, prob=0.5, seed=3),
    Quantize(n_levels=7, seed=4),
    Quantize(n_levels=(4, 9), per_channel=True, seed=5),
    Quantize(how="quantile", n_levels=5, seed=6),
    Dropout(p=0.1, size=2, seed=7),
    Dropout(p=(0.05, 0.2), size=[1, 3], fill="bfill", seed=8),
    Dropout(p=0.1, per_channel=True, fill="mean", seed=9),
    Dropout(p=0.1, fill=0.0, repeats=2, prob=0.7, seed=10),
    Reverse(seed=11),
    Reverse(repeats=2, prob=0.5, seed=12),
    AddNoise(seed=13),
    AddNoise(loc=(-0.5, 0.5), scale=(0.05, 0.1), seed=14),
    AddNoise(distr="laplace", per_channel=False, seed=15),
    AddNoise(kind="multiplicative", repeats=2, prob=0.5, seed=16),
    Convolve(seed=17),
    Convolve(window=["hann", "blackman", ("gaussian", 1)], size=(5, 9),
             per_channel=True, seed=18),
    Drift(seed=19),
    Drift(n_drift_points=[3, 5], per_channel=True, max_drift=(0.2, 0.8),
          seed=20),
    Drift(per_channel=False, normalize=False, seed=21),
    TimeWarp(seed=22),
    TimeWarp(max_speed_ratio=(2, 4), repeats=2, prob=0.5, seed=23),
    Resize(size=T // 2, seed=24),
    Resize(size=T * 2, repeats=2, seed=25),
    Crop(size=T // 2, seed=26),
    Crop(size=(T // 4, T // 2), resize=T // 3, repeats=2, seed=27),
]


@pytest.mark.parametrize("op", OPS, ids=[repr(o)[:56] for o in OPS])
def test_distributed_matches_local(long_df, op):
    df, batch = long_df
    local = op.augment(batch)
    dist = _collect_out(
        apply_operator(df, op, CHANNELS, mode="replay"), op.repeats
    )
    assert dist.shape == local.shape
    if (isinstance(op, Dropout) and op.fill == "mean") or isinstance(
        op, Drift
    ):
        # row-mean fill and the spline solve are batch-shape-sensitive
        # at the last bit (see plans/pack.py docstring): <= 1 ULP
        np.testing.assert_allclose(dist, local, rtol=1e-15, atol=0)
    else:
        assert np.array_equal(dist, local), (
            f"max abs diff {np.max(np.abs(dist - local))}"
        )


def test_pipe_distributed_matches_local(long_df):
    df, batch = long_df
    ops = [
        AddNoise(repeats=2, prob=0.8, seed=1),
        Pool(size=3, seed=2),
        Quantize(n_levels=6, seed=3),
    ]
    local = batch
    for op in ops:
        local = op.augment(local)
    out = apply_pipe(df, ops, CHANNELS, mode="replay")
    pdf = out.toPandas().sort_values(["conv_id", "bucket_idx"])
    groups = [
        part[CHANNELS].to_numpy(np.float64)
        for _, part in pdf.groupby("conv_id", sort=True)
    ]
    dist = np.stack(groups)
    assert np.array_equal(dist, local)


def test_subseed_mode_deterministic_and_distributed(long_df):
    df, batch = long_df
    op = AddNoise(seed=5)
    a = _collect_out(apply_operator(df, op, CHANNELS, mode="subseed"), 1)
    b = _collect_out(apply_operator(df, op, CHANNELS, mode="subseed"), 1)
    assert np.array_equal(a, b)
    # actually perturbed, and per-series independent of partition layout
    assert not np.array_equal(a, batch)
    df2 = df.repartition(17)
    c = _collect_out(apply_operator(df2, op, CHANNELS, mode="subseed"), 1)
    assert np.array_equal(a, c)


def test_replay_rejects_ragged_series(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "bucket_idx": [0, 1, 0],
            "turn_rate": [1.0, 2.0, 3.0],
            "tool_usage": [0.0, 1.0, 0.0],
            "text_len": [5.0, 6.0, 7.0],
        }
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="rectangular"):
        apply_operator(df, Pool(size=2, seed=0), CHANNELS, mode="replay")


@pytest.mark.parametrize("W,chunk_len", [(7, 16), (8, 16), (5, 7), (21, 16)])
def test_chunked_convolve_bit_identical(long_df, W, chunk_len):
    from tsaug_spark.functions.windows import make_window
    from tsaug_spark.plans.chunked import convolve_chunked

    df, batch = long_df
    taps = make_window("hann", W)
    out = convolve_chunked(df, taps, CHANNELS, chunk_len=chunk_len)
    pdf = out.toPandas().sort_values(["conv_id", "bucket_idx"])
    groups = [
        part[CHANNELS].to_numpy(np.float64)
        for _, part in pdf.groupby("conv_id", sort=True)
    ]
    dist = np.stack(groups)

    # whole-series reference: per (series, channel) reflect convolution
    from tsaug_spark.functions.interpolate import convolve_reflect

    want = np.stack(
        [
            (convolve_reflect(batch[i].T, taps) / taps.sum()).T
            for i in range(batch.shape[0])
        ]
    )
    assert dist.shape == want.shape
    assert np.array_equal(dist, want)


@pytest.fixture(scope="module")
def long_df_with_labels(spark, long_df):
    df, batch = long_df
    rng = np.random.RandomState(5)
    labels = rng.choice(2, size=(N, T, 2)).astype(int)
    rows = []
    for i in range(N):
        for t in range(T):
            rows.append((f"conv-{i:04d}", t, float(labels[i, t, 0]),
                         float(labels[i, t, 1])))
    lab = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "bucket_idx", "y0", "y1"])
    )
    joined = df.join(lab, ["conv_id", "bucket_idx"]).cache()
    joined.count()
    return joined, batch, labels


MASK_OPS = [
    Reverse(seed=30),                      # flips Y
    Pool(size=4, seed=31),                 # Y untouched
    Dropout(p=0.1, size=2, seed=32),       # Y untouched
    Resize(size=T // 2, seed=33),          # Y interpolated + int-rounded
    Crop(size=T // 2, seed=34),            # Y resized, NOT rounded
    TimeWarp(seed=35),                     # Y warped + int-rounded
    AddNoise(repeats=2, prob=0.6, seed=36),
]


@pytest.mark.parametrize("op", MASK_OPS, ids=[repr(o)[:48] for o in MASK_OPS])
def test_distributed_mask_matches_local(long_df_with_labels, op):
    joined, batch, labels = long_df_with_labels
    local_x, local_y = op.augment(batch, labels)
    out = apply_operator(
        joined, op, CHANNELS, mode="replay", label_cols=["y0", "y1"]
    )
    pdf = out.toPandas().sort_values(["conv_id", "rep_idx", "bucket_idx"])
    xs, ys = [], []
    for _, part in pdf.groupby(["conv_id", "rep_idx"], sort=True):
        xs.append(part[CHANNELS].to_numpy(np.float64))
        ys.append(part[["y0", "y1"]].to_numpy(np.float64))
    dist_x, dist_y = np.stack(xs), np.stack(ys)
    assert np.array_equal(dist_x, local_x)
    # local Y dtype is int for rounding ops, float for Crop — value
    # equality over the double transport either way
    assert np.array_equal(dist_y, local_y.astype(np.float64))


def test_kmeans_cluster_separated_fixture_converges_to_band_means(spark):
    """Basis of the kernel_kmeans_det oracle: on band-separated input
    (bands ~1000 apart, intra-band spread < 1) the seeded Lloyd's
    kernel converges in one iteration to the per-band means, bit-exact
    against a sequential in-order fold (np.bincount accumulation)."""
    from tsaug_spark.operators import Quantize

    rng = np.random.RandomState(7)
    n_series, T_ = 20, 48
    band = np.arange(T_) // 16
    X = np.empty((n_series, T_, 1))
    for i in range(n_series):
        cnt = rng.randint(0, 40, size=T_).astype(float)
        X[i, :, 0] = band * 1000.0 + cnt / (cnt.max() + 1.0)
    out = Quantize(n_levels=3, how="kmeans", seed=0).augment(X)
    for i in range(n_series):
        for b in range(3):
            acc = 0.0
            vals = X[i, band == b, 0]
            for v in vals:
                acc += v
            assert (out[i, band == b, 0] == acc / len(vals)).all()


@pytest.mark.parametrize(
    "kind,size,chunk_len",
    [("ave", 4, 16), ("ave", 7, 16), ("max", 5, 8), ("min", 3, 10),
     ("ave", 48, 16), ("ave", 30, 7)],
)
def test_chunked_pool_bit_identical(long_df, kind, size, chunk_len):
    """Block-aligned chunking must reproduce whole-series Pool exactly,
    including the trailing partial block (T % size pooled as one unit)
    and sizes larger than the chunk length."""
    from tsaug_spark.plans.chunked import pool_chunked

    df, batch = long_df
    out = pool_chunked(df, kind, size, CHANNELS, chunk_len=chunk_len)
    pdf = out.toPandas().sort_values(["conv_id", "bucket_idx"])
    groups = [
        part[CHANNELS].to_numpy(np.float64)
        for _, part in pdf.groupby("conv_id", sort=True)
    ]
    dist = np.stack(groups)

    flat = batch.copy().swapaxes(1, 2).reshape(-1, T)
    want = (
        Pool.pool_rows(flat, np.full(len(flat), size), kind)
        .reshape(batch.shape[0], C, T)
        .swapaxes(1, 2)
    )
    assert dist.shape == want.shape
    assert np.array_equal(dist, want)
