"""Dropout — knock out random blocks of time points and fill the holes.

This is the engine's gap-generation + gap-fill primitive at series level;
the fill modes are the same locf / backfill / mean / constant semantics the
relational gap-filler exposes over DataFrames
(tsaug_spark/plans/gapfill.py).

Semantics (parity target: /root/reference/src/tsaug/_augmenter/dropout.py:193-266):
for every candidate block size ``s`` (the spec list, iterated in order),
a Bernoulli mask over start positions ``0 .. T-s-1`` with per-position
probability ``p / len(sizes) / s`` selects blocks; each selected block of
``s`` points after the start is overwritten by the fill rule.  Blocks may
overlap.  'mean' uses the per-row mean computed before any drops.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from .base import (
    ArrayPair,
    SeriesOp,
    check_float_spec,
    check_int_spec,
    expand_int_spec,
)


class Dropout(SeriesOp):
    def __init__(
        self,
        p: Union[float, Tuple[float, float], List[float]] = 0.05,
        size: Union[int, Tuple[int, int], List[int]] = 1,
        fill: Union[str, float] = "ffill",
        per_channel: bool = False,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.p = p
        self.size = size
        self.fill = fill
        self.per_channel = per_channel
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("p", "size", "fill", "per_channel")

    @property
    def p(self) -> Union[float, Tuple[float, float], List[float]]:
        return self._p

    @p.setter
    def p(self, v: Union[float, Tuple[float, float], List[float]]) -> None:
        check_float_spec(v, "p", lo=0.0, hi=1.0)
        self._p = v

    @property
    def size(self) -> Union[int, Tuple[int, int], List[int]]:
        return self._size

    @size.setter
    def size(self, v: Union[int, Tuple[int, int], List[int]]) -> None:
        check_int_spec(v, "size")
        self._size = v

    @property
    def fill(self) -> Union[str, float]:
        return self._fill

    @fill.setter
    def fill(self, f: Union[str, float]) -> None:
        if isinstance(f, str):
            if f not in ("ffill", "bfill", "mean"):
                raise ValueError(
                    "Parameter `fill` must be a number or one of 'ffill', "
                    "'bfill', 'mean'."
                )
        elif not isinstance(f, (int, float)):
            raise TypeError(
                "Parameter `fill` must be a number or one of 'ffill', "
                "'bfill', 'mean'."
            )
        self._fill = f

    @property
    def per_channel(self) -> bool:
        return self._per_channel

    @per_channel.setter
    def per_channel(self, v: bool) -> None:
        if not isinstance(v, bool):
            raise TypeError("Parameter `per_channel` must be boolean.")
        self._per_channel = v

    def plan_rates(
        self, rng: np.random.RandomState, n_rows: int, n_channels: int
    ) -> np.ndarray:
        """Draw the per-row (or per-row-channel) dropout probability."""
        count = n_rows * n_channels if self.per_channel else n_rows
        if isinstance(self.p, (float, int)):
            return np.ones(count) * self.p
        if isinstance(self.p, tuple):
            return rng.uniform(low=self.p[0], high=self.p[1], size=count)
        return rng.choice(self.p, size=count)

    def _core(self, X, Y, rng=None) -> ArrayPair:
        rng = rng if rng is not None else np.random.RandomState(self.seed)
        N, T, C = X.shape
        sizes = expand_int_spec(self.size)
        rate = self.plan_rates(rng, N, C)

        flat = X.copy().swapaxes(1, 2).reshape(N * C, T)
        if self.fill == "mean":
            row_mean = flat.mean(axis=1)

        for s in sizes:
            # Bernoulli over start positions; the per-channel=False draw is
            # (N, T-s) then repeated across channels so all channels of a
            # series drop the same blocks.
            target = rate.reshape(-1, 1) / len(sizes) / s
            if self.per_channel:
                hit = rng.uniform(size=(N * C, T - s)) <= target
            else:
                hit = rng.uniform(size=(N, T - s)) <= target
                hit = np.repeat(hit, C, axis=0)
            starts = np.argwhere(hit)
            if starts.size == 0:
                continue
            rows = np.repeat(starts[:, 0], s)
            offsets = np.tile(np.arange(1, s + 1), len(starts))
            if self.fill == "ffill":
                # the block s points *after* a start copies the start value
                src = np.repeat(starts[:, 1], s)
                flat[rows, src + offsets] = flat[rows, src]
            elif self.fill == "bfill":
                # the block s points *before* start+s copies that value
                src = np.repeat(starts[:, 1], s) + s
                flat[rows, src - offsets] = flat[rows, src]
            elif self.fill == "mean":
                dst = np.repeat(starts[:, 1], s) + offsets
                flat[rows, dst] = row_mean[rows]
            else:
                dst = np.repeat(starts[:, 1], s) + offsets
                flat[rows, dst] = self.fill

        X_out = flat.reshape(N, C, T).swapaxes(1, 2)
        return X_out, (Y.copy() if Y is not None else None)
