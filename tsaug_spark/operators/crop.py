"""Crop — random fixed-length contiguous subsequences, optionally resized.

On the Spark side this is a plain predicate (`bucket_idx BETWEEN start AND
start+s-1`) plus the Resize interpolation — fully Catalyst-native except
for the seeded per-(series, repeat) start positions, which the RNG planner
supplies.

Semantics (parity target: /root/reference/src/tsaug/_augmenter/crop.py:130-210):
each output row draws a crop length from the spec and a start uniformly
from the valid range, gathers the window, and resizes it to ``resize``
(mandatory when the length spec is not a single value; defaults to the
single length).  Masks ride through the internal Resize *as series*, so
they come back float and un-rounded — a reference asymmetry preserved
here.  The repeat/select wrapper is bypassed (memory-lean override); with
``prob < 1`` (single series, single repeat only) one uniform decides
pass-through.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from .base import ArrayPair, SeriesOp, check_int_spec, expand_int_spec
from .resize import Resize


class Crop(SeriesOp):
    def __init__(
        self,
        size: Union[int, Tuple[int, int], List[int]],
        resize: Optional[int] = None,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.size = size
        self.resize = resize
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("size", "resize")

    @property
    def size(self) -> Union[int, Tuple[int, int], List[int]]:
        return self._size

    @size.setter
    def size(self, v: Union[int, Tuple[int, int], List[int]]) -> None:
        check_int_spec(v, "size")
        self._size = v

    @property
    def resize(self) -> Optional[int]:
        return self._resize

    @resize.setter
    def resize(self, v: Optional[int]) -> None:
        if v is not None:
            if not isinstance(v, int):
                raise TypeError(
                    "Parameter `resize` must be a positive integer."
                )
            if v <= 0:
                raise ValueError(
                    "Parameter `resize` must be a positive integer."
                )
        self._resize = v

    def _output_size(self) -> int:
        if self.resize is not None:
            return self.resize
        candidates = expand_int_spec(self.size)
        if len(candidates) > 1:
            raise ValueError(
                "Parameter `resize` must be specified if parameter `size` "
                "is not a single value."
            )
        return candidates[0]

    def output_length(self, T: int) -> int:
        return self._output_size()

    def _apply(self, X, Y, rng=None) -> ArrayPair:
        # Memory-lean override: gather windows first, never repeat-copy
        # the full-length input.
        N, T, C = X.shape
        rng = rng if rng is not None else np.random.RandomState(self.seed)

        if self.prob != 1.0:
            # rectangularity guard ensures N == 1 and repeats == 1 here
            if rng.uniform() > self.prob:
                return X.copy(), (Y.copy() if Y is not None else None)

        candidates = expand_int_spec(self.size)
        out_len = self._output_size()

        rows_out = N * self.repeats
        X_out = np.zeros((rows_out, out_len, C))
        if Y is None:
            Y_out: Optional[np.ndarray] = None
        else:
            L = Y.shape[2]
            Y_out = np.zeros((rows_out, out_len, L))

        # Draw order (crop.py:172-176): all crop lengths first, then per
        # unique length (ascending) the start positions of matching rows.
        crop_len = rng.choice(candidates, size=rows_out)
        src_series = np.repeat(np.arange(N), self.repeats)
        resizer = Resize(out_len)
        for s in np.unique(crop_len):
            sel = crop_len == s
            n = int(sel.sum())
            start = rng.choice(T - s + 1, size=n)
            row_idx = np.repeat(src_series[sel], s).reshape(n, s).astype(int)
            col_idx = (
                start.reshape(n, 1) + np.arange(s).reshape(1, s)
            ).astype(int)
            X_out[sel, :, :] = resizer.augment(
                X[row_idx, col_idx, :].reshape((n, s, C))
            )
            if Y is not None and Y_out is not None:
                # note: Y goes through Resize.augment as the X argument,
                # so no int-rounding is applied (reference crop.py:191-208)
                Y_out[sel, :, :] = resizer.augment(
                    Y[row_idx, col_idx, :].reshape((n, s, L))
                )
        return X_out, Y_out

    def _core(self, X, Y, rng=None) -> ArrayPair:
        raise AssertionError("_apply is overridden; _core is unused")
