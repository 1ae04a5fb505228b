"""Interpolation + convolution kernels (NumPy ports of published algorithms).

* ``convolve_reflect``   — 1-D convolution with reflect (edge-inclusive)
  boundary handling, matching ``scipy.ndimage.convolve1d(mode='reflect')``
  including its even-length origin shift.
* ``cubic_spline_notaknot`` — natural cubic interpolating spline with
  not-a-knot end conditions on a uniform knot grid (batch over rows).
* ``pchip_interp``       — monotone piecewise-cubic Hermite interpolation
  with Fritsch–Carlson derivatives (the PCHIP algorithm).
* ``linear_interp_extrap`` — linear interpolation over an integer grid
  with linear extrapolation beyond the ends.
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------- convolve
def convolve_reflect(rows: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """Convolve each row of (R, T) with ``taps``, reflect boundary.

    ndimage semantics: convolution flips the taps and correlates; the
    window center for W taps sits at ``W//2`` for odd W and ``W//2 - 1``
    for even W.  The boundary extension repeats the edge sample
    (``d c b a | a b c d | d c b a``).
    """
    W = len(taps)
    center = W // 2 if W % 2 else W // 2 - 1
    flipped = taps[::-1]
    padded = np.pad(
        rows, ((0, 0), (center, W - 1 - center)), mode="symmetric"
    )
    windows = np.lib.stride_tricks.sliding_window_view(padded, W, axis=1)
    return windows @ flipped


# ----------------------------------------------------------- cubic spline
def cubic_spline_notaknot(
    y: np.ndarray, x_end: float, t: np.ndarray
) -> np.ndarray:
    """Evaluate the not-a-knot cubic spline through uniform knots.

    Knots are ``linspace(0, x_end, m)`` where ``m = y.shape[1]``; ``y`` is
    a (R, m) batch sharing the knot grid; returns (R, len(t)).

    Solves for the knot second derivatives ("moments") M_i: interior
    continuity gives ``M_{i-1} + 4 M_i + M_{i+1} = 6 (y_{i-1} - 2 y_i +
    y_{i+1}) / h^2``; the not-a-knot conditions force the third derivative
    continuous across the first and last interior knots, i.e.
    ``M_0 - 2 M_1 + M_2 = 0`` (uniform spacing).  With three knots this
    degenerates to the unique parabola through the points.
    """
    R, m = y.shape
    if m < 2:
        raise ValueError("need at least two knots")
    h = x_end / (m - 1)
    xk = np.linspace(0.0, x_end, m)

    if m == 2:
        slope = (y[:, 1] - y[:, 0]) / h
        return y[:, [0]] + slope[:, None] * t[None, :]
    if m == 3:
        # unique parabola: Lagrange form on 3 uniform knots
        out = np.zeros((R, len(t)))
        for j in range(3):
            lj = np.ones(len(t))
            for k in range(3):
                if k != j:
                    lj = lj * (t - xk[k]) / (xk[j] - xk[k])
            out += y[:, [j]] * lj[None, :]
        return out

    A = np.zeros((m, m))
    A[0, 0], A[0, 1], A[0, 2] = 1.0, -2.0, 1.0
    A[-1, -3], A[-1, -2], A[-1, -1] = 1.0, -2.0, 1.0
    for i in range(1, m - 1):
        A[i, i - 1], A[i, i], A[i, i + 1] = 1.0, 4.0, 1.0
    b = np.zeros((m, R))
    b[1 : m - 1, :] = (
        6.0 / (h * h) * (y[:, :-2] - 2.0 * y[:, 1:-1] + y[:, 2:])
    ).T
    M = np.linalg.solve(A, b).T  # (R, m) knot second derivatives

    seg = np.clip((t / h).astype(int), 0, m - 2)
    dt = t - xk[seg]
    y0, y1 = y[:, seg], y[:, seg + 1]
    M0, M1 = M[:, seg], M[:, seg + 1]
    bcoef = (y1 - y0) / h - h * (2.0 * M0 + M1) / 6.0
    return y0 + bcoef * dt + (M0 / 2.0) * dt ** 2 + (
        (M1 - M0) / (6.0 * h)
    ) * dt ** 3


# ------------------------------------------------------------------ pchip
def _pchip_edge_slope(
    h0: np.ndarray, h1: np.ndarray, d0: np.ndarray, d1: np.ndarray
) -> np.ndarray:
    """One-sided three-point edge derivative with the shape-preserving
    limits of the PCHIP algorithm (Fritsch & Carlson 1980)."""
    d = ((2.0 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
    bad = np.sign(d) != np.sign(d0)
    d = np.where(bad, 0.0, d)
    clamp = (np.sign(d0) != np.sign(d1)) & (np.abs(d) > 3.0 * np.abs(d0))
    return np.where(clamp & ~bad, 3.0 * d0, d)


def pchip_derivatives(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Knot derivatives for PCHIP over knots ``x`` and batch ``y`` (R, m)."""
    h = np.diff(x)  # (m-1,)
    delta = np.diff(y, axis=1) / h  # (R, m-1)
    R, m = y.shape
    d = np.zeros((R, m))
    if m == 2:
        d[:, 0] = delta[:, 0]
        d[:, 1] = delta[:, 0]
        return d
    # interior: weighted harmonic mean when the neighbouring secants share
    # a sign and neither is zero; zero otherwise
    w1 = 2.0 * h[1:] + h[:-1]  # (m-2,)
    w2 = h[1:] + 2.0 * h[:-1]
    dl, dr = delta[:, :-1], delta[:, 1:]
    ok = (np.sign(dl) * np.sign(dr)) > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        whm = (w1 + w2) / (w1 / dl + w2 / dr)
    d[:, 1:-1] = np.where(ok, whm, 0.0)
    d[:, 0] = _pchip_edge_slope(h[0], h[1], delta[:, 0], delta[:, 1])
    d[:, -1] = _pchip_edge_slope(h[-1], h[-2], delta[:, -1], delta[:, -2])
    return d


def pchip_interp(x: np.ndarray, y: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Evaluate PCHIP through (x, y-batch) at ``t``; returns (R, len(t)).

    ``x`` must be strictly increasing; ``t`` inside [x[0], x[-1]].
    """
    d = pchip_derivatives(x, y)
    seg = np.clip(np.searchsorted(x, t, side="right") - 1, 0, len(x) - 2)
    h = x[seg + 1] - x[seg]
    s = (t - x[seg]) / h  # normalized position in segment, (len(t),)
    h00 = (1 + 2 * s) * (1 - s) ** 2
    h10 = s * (1 - s) ** 2
    h01 = s ** 2 * (3 - 2 * s)
    h11 = s ** 2 * (s - 1)
    return (
        y[:, seg] * h00[None, :]
        + d[:, seg] * (h * h10)[None, :]
        + y[:, seg + 1] * h01[None, :]
        + d[:, seg + 1] * (h * h11)[None, :]
    )


# ---------------------------------------------------------- linear interp
def linear_interp_extrap(values: np.ndarray, at: np.ndarray) -> np.ndarray:
    """Linear interpolation of (T, K) samples on grid 0..T-1 at positions
    ``at`` (length P), extrapolating linearly outside; returns (P, K)."""
    T = values.shape[0]
    lo = np.clip(np.floor(at).astype(int), 0, T - 2)
    frac = (at - lo)[:, None]
    return values[lo] + (values[lo + 1] - values[lo]) * frac
