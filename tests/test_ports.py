"""Tests for the scipy/sklearn ports and the operators built on them.

scipy is absent in this environment (and the reference itself cannot
import these operators here), so the oracles are closed-form /
hand-computed fixtures plus the reference's own shape + determinism
contract (/root/reference/tests/test_classes.py, test_random_seed.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from tsaug_spark.functions.interpolate import (
    convolve_reflect,
    cubic_spline_notaknot,
    linear_interp_extrap,
    pchip_interp,
)
from tsaug_spark.functions.kmeans import kmeans_1d
from tsaug_spark.functions.windows import make_window
from tsaug_spark.operators import Convolve, Drift, Quantize, TimeWarp

N, T, C, L, M = 10, 100, 3, 2, 4
_gen = np.random.RandomState(11)
X3 = _gen.uniform(size=(N, T, C))
Y3 = _gen.choice(2, size=(N, T, L)).astype(int)


# ------------------------------------------------------------- windows
def test_hann_window_closed_form():
    w = make_window("hann", 7)
    n = np.arange(7)
    expect = 0.5 - 0.5 * np.cos(2 * np.pi * n / 6)
    assert np.allclose(w, expect, atol=1e-12)
    assert w[0] == pytest.approx(0.0, abs=1e-15)
    assert w[3] == pytest.approx(1.0)


def test_blackman_window_matches_numpy():
    # numpy's blackman is the same symmetric formula
    assert np.allclose(make_window("blackman", 9), np.blackman(9), atol=1e-12)


def test_gaussian_window():
    w = make_window(("gaussian", 1), 5)
    n = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    assert np.allclose(w, np.exp(-(n ** 2) / 2.0))


def test_single_tap_windows():
    for spec in ["hann", "blackman", ("gaussian", 1)]:
        assert np.array_equal(make_window(spec, 1), np.ones(1))


# ------------------------------------------------------------ convolve
def test_convolve_reflect_odd():
    x = np.array([[1.0, 2.0, 3.0, 4.0]])
    out = convolve_reflect(x, np.ones(3))
    # reflect pad: [1 | 1 2 3 4 | 4]
    assert np.allclose(out, [[4.0, 6.0, 9.0, 11.0]])


def test_convolve_reflect_even():
    x = np.array([[1.0, 2.0, 3.0, 4.0]])
    out = convolve_reflect(x, np.ones(2))
    # even width centers right of the sample: out[i] = x[i] + x[i+1]
    assert np.allclose(out, [[3.0, 5.0, 7.0, 8.0]])


def test_convolve_constant_series_invariant():
    # normalized smoothing must leave a constant series unchanged
    x = np.full((2, 50), 3.25)
    taps = make_window("hann", 7)
    out = convolve_reflect(x, taps) / taps.sum()
    assert np.allclose(out, 3.25)


# -------------------------------------------------------- cubic spline
def test_spline_reproduces_cubic_polynomial():
    # a single cubic satisfies not-a-knot exactly, so the interpolant
    # must reproduce it everywhere, not just at knots
    m, x_end = 6, 10.0
    knots = np.linspace(0, x_end, m)
    f = lambda t: t ** 3 - 2 * t ** 2 + 3 * t - 1
    y = f(knots)[None, :]
    t = np.linspace(0, x_end, 101)
    out = cubic_spline_notaknot(y, x_end, t)
    assert np.allclose(out[0], f(t), atol=1e-8)


def test_spline_three_knots_is_parabola():
    knots = np.array([0.0, 5.0, 10.0])
    f = lambda t: 2 * t ** 2 - t + 0.5
    y = f(knots)[None, :]
    t = np.linspace(0, 10, 21)
    out = cubic_spline_notaknot(y, 10.0, t)
    assert np.allclose(out[0], f(t), atol=1e-9)


def test_spline_interpolates_knots_batch():
    rng = np.random.RandomState(0)
    y = rng.normal(size=(5, 7))
    x_end = 12.0
    knots = np.linspace(0, x_end, 7)
    out = cubic_spline_notaknot(y, x_end, knots)
    assert np.allclose(out, y, atol=1e-9)


# --------------------------------------------------------------- pchip
def test_pchip_hits_knots_and_preserves_monotonicity():
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = np.array([[0.0, 0.1, 0.2, 3.0, 3.05]])
    t = np.linspace(0, 4, 401)
    out = pchip_interp(x, y, t)
    assert np.allclose(out[0, ::100], y[0])  # knot values
    assert (np.diff(out[0]) >= -1e-12).all()  # monotone


def test_pchip_linear_data_is_linear():
    x = np.array([0.0, 2.0, 5.0, 9.0])
    y = (2.5 * x - 1.0)[None, :]
    t = np.linspace(0, 9, 50)
    out = pchip_interp(x, y, t)
    assert np.allclose(out[0], 2.5 * t - 1.0, atol=1e-10)


def test_pchip_flat_segments_stay_flat():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([[1.0, 1.0, 2.0, 2.0]])
    t = np.array([0.5, 2.5])
    out = pchip_interp(x, y, t)
    assert out[0, 0] == pytest.approx(1.0)
    assert out[0, 1] == pytest.approx(2.0)


# ------------------------------------------------------- linear interp
def test_linear_interp_extrapolates():
    vals = np.arange(5, dtype=float)[:, None] * 2  # y = 2t
    at = np.array([-0.5, 0.5, 3.75, 4.5])
    out = linear_interp_extrap(vals, at)
    assert np.allclose(out[:, 0], 2 * at)


# -------------------------------------------------------------- kmeans
def test_kmeans_bimodal():
    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.normal(0, 0.1, 50), rng.normal(10, 0.1, 50)])
    out = kmeans_1d(vals, 2, seed=0)
    centers = np.unique(out)
    assert len(centers) == 2
    assert abs(centers[0] - 0) < 0.5 and abs(centers[1] - 10) < 0.5


def test_kmeans_deterministic():
    rng = np.random.RandomState(4)
    vals = rng.normal(size=200)
    assert np.array_equal(
        kmeans_1d(vals, 5, seed=9), kmeans_1d(vals, 5, seed=9)
    )


def test_quantize_kmeans_levels():
    q = Quantize(n_levels=4, how="kmeans", seed=0)
    out = q.augment(X3)
    assert out.shape == X3.shape
    for i in range(N):
        for c in range(C):
            assert len(np.unique(out[i, :, c])) <= 4


# ------------------------------------- operator shape/determinism grid
GRID = [
    Convolve(seed=0),
    Convolve(repeats=M, prob=0.5, seed=0),
    Convolve(window=["hann", "blackman", ("gaussian", 1)], seed=0),
    Convolve(
        window=["hann", "blackman", ("gaussian", 1)],
        per_channel=True,
        seed=0,
    ),
    Convolve(window=("gaussian", 1), seed=0),
    Convolve(size=(7, 11), seed=0),
    Convolve(size=(7, 11), per_channel=True, seed=0),
    Convolve(size=[7, 11], seed=0),
    Convolve(per_channel=True, seed=0),
    Drift(seed=0),
    Drift(repeats=M, prob=0.5, seed=0),
    Drift(max_drift=(0.5, 1.0), seed=0),
    Drift(n_drift_points=[3, 8], seed=0),
    Drift(kind="multiplicative", seed=0),
    Drift(per_channel=False, normalize=False, seed=0),
    TimeWarp(seed=0),
    TimeWarp(repeats=M, prob=0.5, seed=0),
    TimeWarp(max_speed_ratio=[3, 4, 5], seed=0),
    TimeWarp(max_speed_ratio=(3, 5), seed=0),
]


@pytest.mark.parametrize("op", GRID, ids=[repr(g)[:48] for g in GRID])
def test_shape_contract(op):
    out_x, out_y = op.augment(X3, Y3)
    assert out_x.shape == (N * op.repeats, T, C)
    assert out_y.shape == (N * op.repeats, T, L)
    # no aliasing
    keep = X3.copy()
    out_x[0] = 1e9
    assert np.array_equal(X3, keep)


@pytest.mark.parametrize("op", GRID, ids=[repr(g)[:48] for g in GRID])
def test_seeded_determinism(op):
    a = op.augment(X3)
    b = op.augment(X3)
    assert np.array_equal(a, b)


def test_timewarp_identity_series_returns_warp_path():
    # warping the series x[t] = t returns the warp path itself
    tw = TimeWarp(seed=5)
    base = np.tile(np.arange(T, dtype=float)[None, :, None], (N, 1, 1))
    out = tw.augment(base)
    rng = np.random.RandomState(5)
    rng.uniform(size=tw.repeats * N)  # selection stream consumed first
    warp = tw.plan_warp(np.random.RandomState(5), N, T)
    assert np.allclose(out[:, :, 0], warp, atol=1e-9)
    # endpoints pinned: warp(0) = 0, warp(T-1) = T-1
    assert np.allclose(out[:, 0, 0], 0.0, atol=1e-9)
    assert np.allclose(out[:, -1, 0], T - 1, atol=1e-9)


def test_drift_additive_anchored_at_zero():
    d = Drift(seed=3)
    out = d.augment(X3)
    # drift is re-based to zero at t=0, so the first sample is unchanged
    assert np.allclose(out[:, 0, :], X3[:, 0, :], atol=1e-12)


def test_drift_max_magnitude():
    d = Drift(max_drift=0.5, normalize=False, seed=4)
    out = d.augment(X3)
    delta = np.abs(out - X3)
    # per (series, channel) the peak |drift| is exactly max_drift
    peak = delta.max(axis=1)
    assert np.allclose(peak, 0.5, atol=1e-9)


def test_segment_windows_matches_reference_semantics():
    from tsaug_spark.visualization import segment_windows

    assert segment_windows(np.array([0, 1, 1, 0, 1])) == [(1, 2), (4, 4)]
    assert segment_windows(np.zeros(5)) == []
    assert segment_windows(np.ones(4)) == [(0, 3)]
    # non-binary values are clipped+rounded like the reference
    assert segment_windows(np.array([0.2, 0.6, 3.0, 0.0])) == [(1, 2)]
    # plot() is matplotlib-gated in this sandbox
    import pytest as _pytest

    from tsaug_spark.visualization import plot

    with _pytest.raises(ImportError):
        plot(np.arange(8.0))
