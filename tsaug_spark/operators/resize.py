"""Resize — change series length by linear interpolation.

Doubles as the engine's linear-interpolation gap-filler: the output grid
positions and two-point weighted blend here are the same math used by
``tsaug_spark.plans.gapfill.interpolate_linear``.

Semantics (parity target: /root/reference/src/tsaug/_augmenter/resize.py:65-122):
output sample k of size S sits at position ``k/(S-1)*(T-1)`` and blends the
two bracketing input samples; the final output sample is pinned to the last
input sample.  ``S == 1`` returns the mean of first and last samples.
Masks are interpolated then rounded to int.  The repeat/select wrapper is
bypassed (all repeats are identical copies); with ``prob < 1`` (only legal
for a single series, single repeat) one uniform decides pass-through.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .base import ArrayPair, SeriesOp, check_positive_int


def resize_positions(T: int, size: int):
    """Fractional source positions for all but the last output sample.

    Returns (lower_index, upper_index, lower_weight, upper_weight), each of
    length ``size - 1``.
    """
    pos = np.arange(size - 1) / (size - 1) * (T - 1)
    lo = pos.astype(int)
    w_hi = pos - lo
    return lo, lo + 1, 1.0 - w_hi, w_hi


def resize_batch(arr: np.ndarray, size: int) -> np.ndarray:
    """Linearly resize a (N, T, C) batch along axis 1 to ``size``."""
    T = arr.shape[1]
    if size == T:
        return arr.copy()
    if size == 1:
        return (arr[:, :1, :] + arr[:, -1:, :]) / 2
    lo, hi, w_lo, w_hi = resize_positions(T, size)
    body = arr[:, lo, :] * w_lo.reshape(1, size - 1, 1) + arr[
        :, hi, :
    ] * w_hi.reshape(1, size - 1, 1)
    return np.concatenate([body, arr[:, -1:, :]], axis=1)


class Resize(SeriesOp):
    def __init__(
        self,
        size: int,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.size = size
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("size",)

    @property
    def size(self) -> int:
        return self._size

    @size.setter
    def size(self, s: int) -> None:
        check_positive_int(s, "size")
        self._size = s

    def output_length(self, T: int) -> int:
        return self.size

    def _apply(self, X, Y, rng=None) -> ArrayPair:
        # Memory-lean override: resize once, then repeat — never
        # materialize repeats copies of the long input.
        rng = rng if rng is not None else np.random.RandomState(self.seed)
        if self.prob != 1.0:
            # the rectangularity guard ensures N == 1 and repeats == 1 here
            if rng.uniform() > self.prob:
                return X.copy(), (Y.copy() if Y is not None else None)

        T = X.shape[1]
        # Quirk preserved from the reference (resize.py:82-96): the
        # size == T and size == 1 paths return before the repeats
        # expansion, and the size == 1 mask is not int-rounded.
        if self.size == T:
            return X.copy(), (Y.copy() if Y is not None else None)
        if self.size == 1:
            return (
                resize_batch(X, 1),
                (resize_batch(Y, 1) if Y is not None else None),
            )

        X_out = resize_batch(X, self.size)
        if self.repeats > 1:
            X_out = np.repeat(X_out, self.repeats, axis=0)

        if Y is None:
            Y_out: Optional[np.ndarray] = None
        else:
            Y_out = resize_batch(Y, self.size).round().astype(int)
            if self.repeats > 1:
                Y_out = np.repeat(Y_out, self.repeats, axis=0)
        return X_out, Y_out

    @property
    def deterministic_core(self) -> bool:
        return True

    def _core(self, X, Y, rng=None) -> ArrayPair:
        raise AssertionError("_apply is overridden; _core is unused")
