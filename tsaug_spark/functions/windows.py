"""Symmetric FIR window functions (NumPy, from the textbook definitions).

Equivalent to ``scipy.signal.get_window(win, M, fftbins=False)`` for the
window families below.  Cosine-sum windows are evaluated as
``sum_k a_k * cos(k * u)`` over ``u = linspace(-pi, pi, M)``, which is the
standard symmetric sampling.  Single-point windows are [1.0].
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np

WindowSpec = Union[str, Tuple]

# cosine-sum coefficient tables (symmetric windows)
_COSINE_COEFFS = {
    "hann": (0.5, 0.5),
    "hanning": (0.5, 0.5),
    "hamming": (0.54, 0.46),
    "blackman": (0.42, 0.50, 0.08),
    "blackmanharris": (0.35875, 0.48829, 0.14128, 0.01168),
    "nuttall": (0.3635819, 0.4891775, 0.1365995, 0.0106411),
    "flattop": (
        0.21557895,
        0.41663158,
        0.277263158,
        0.083578947,
        0.006947368,
    ),
}


def _cosine_sum(coeffs: Sequence[float], M: int) -> np.ndarray:
    if M == 1:
        return np.ones(1)
    u = np.linspace(-np.pi, np.pi, M)
    w = np.zeros(M)
    for k, a in enumerate(coeffs):
        w += a * np.cos(k * u)
    return w


def _triang(M: int) -> np.ndarray:
    if M == 1:
        return np.ones(1)
    n = np.arange(1, (M + 1) // 2 + 1)
    if M % 2 == 0:
        half = (2 * n - 1.0) / M
        return np.concatenate([half, half[::-1]])
    half = 2 * n / (M + 1.0)
    return np.concatenate([half, half[-2::-1]])


def _bartlett(M: int) -> np.ndarray:
    if M == 1:
        return np.ones(1)
    n = np.arange(M)
    return np.where(
        n <= (M - 1) / 2, 2.0 * n / (M - 1), 2.0 - 2.0 * n / (M - 1)
    )


def _gaussian(M: int, std: float) -> np.ndarray:
    if M == 1:
        return np.ones(1)
    n = np.arange(M) - (M - 1) / 2.0
    return np.exp(-(n ** 2) / (2.0 * std * std))


def _kaiser(M: int, beta: float) -> np.ndarray:
    if M == 1:
        return np.ones(1)
    return np.kaiser(M, beta)


def _cosine(M: int) -> np.ndarray:
    return np.sin(np.pi / M * (np.arange(M) + 0.5))


def make_window(spec: WindowSpec, M: int) -> np.ndarray:
    """Build a symmetric window of M taps from a name or (name, arg) tuple.

    Accepts the window specs the reference forwards to scipy
    (convolve.py:196): plain names like 'hann' / 'blackman' and
    parameterized tuples like ('gaussian', std) or ('kaiser', beta).
    """
    if isinstance(spec, tuple):
        name, *args = spec
        name = name.lower()
        if name in ("gaussian", "gauss"):
            return _gaussian(M, float(args[0]))
        if name == "kaiser":
            return _kaiser(M, float(args[0]))
        if name in ("exponential", "poisson"):
            center = (M - 1) / 2 if args[0] is None else float(args[0])
            tau = float(args[1]) if len(args) > 1 else 1.0
            return np.exp(-np.abs(np.arange(M) - center) / tau)
        raise ValueError(f"unsupported parameterized window {spec!r}")

    name = spec.lower()
    if name in _COSINE_COEFFS:
        return _cosine_sum(_COSINE_COEFFS[name], M)
    if name in ("boxcar", "rect", "rectangular", "ones"):
        return np.ones(M)
    if name == "triang":
        return _triang(M)
    if name == "bartlett":
        return _bartlett(M)
    if name == "cosine":
        return _cosine(M)
    raise ValueError(f"unsupported window {spec!r}")
