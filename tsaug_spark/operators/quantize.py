"""Quantize — snap series values onto a per-(series, channel) level set.

Semantics (parity target: /root/reference/src/tsaug/_augmenter/quantize.py:134-213):

* ``uniform``  — min-max normalize, scale by the level count, round, clip
  to [0, n-1], shift half a level, rescale.
* ``quantile`` — replicates the reference *including its /100 bug*: the
  percentile fractions are divided by 100 (quantize.py:180-186), so the
  level set collapses near the series minimum.  Bit-exact parity demands
  the bug, so it stays; the sane variant is exposed as
  ``how='quantile_fixed'`` (engine extension, not in the reference).
* ``kmeans``   — per-(series, channel) 1-D k-means.  The reference shells
  out to sklearn (absent here, and its exact RNG stream is
  sklearn-version-specific); the engine ships a deterministic seeded
  NumPy Lloyd's iteration (tsaug_spark/functions/kmeans.py) documented as
  self-consistent rather than reference-bit-exact.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from tsaug_spark.functions.kmeans import kmeans_1d

from .base import ArrayPair, SeriesOp, check_int_spec

_HOW_VALUES = ("uniform", "quantile", "quantile_fixed", "kmeans")


class Quantize(SeriesOp):
    def __init__(
        self,
        n_levels: Union[int, Tuple[int, int], List[int]] = 10,
        how: str = "uniform",
        per_channel: bool = False,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.n_levels = n_levels
        self.how = how
        self.per_channel = per_channel
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("n_levels", "how", "per_channel")

    @property
    def n_levels(self) -> Union[int, Tuple[int, int], List[int]]:
        return self._n_levels

    @n_levels.setter
    def n_levels(self, n: Union[int, Tuple[int, int], List[int]]) -> None:
        check_int_spec(n, "n_levels")
        self._n_levels = n

    @property
    def how(self) -> str:
        return self._how

    @how.setter
    def how(self, h: str) -> None:
        if not isinstance(h, str):
            raise TypeError(f"Parameter `how` must be one of {_HOW_VALUES}.")
        if h not in _HOW_VALUES:
            raise ValueError(f"Parameter `how` must be one of {_HOW_VALUES}.")
        self._how = h

    @property
    def per_channel(self) -> bool:
        return self._per_channel

    @per_channel.setter
    def per_channel(self, p: bool) -> None:
        if not isinstance(p, bool):
            raise TypeError("Parameter `per_channel` must be boolean.")
        self._per_channel = p

    def plan_levels(
        self, rng: np.random.RandomState, n_rows: int, n_channels: int
    ) -> np.ndarray:
        """Draw the per-(row, channel) level counts, shape (rows, 1, C).

        Draw order matches the reference (quantize.py:140-161): list specs
        use ``choice`` of the list, interval specs use ``choice`` over
        ``range(lo, hi)``; a shared (non-per-channel) draw is one (rows,)
        vector repeated across channels.
        """
        N, C = n_rows, n_channels
        if isinstance(self.n_levels, int):
            return (np.ones((N, 1, C)) * self.n_levels).astype(int)
        if isinstance(self.n_levels, list):
            pool = self.n_levels
        else:
            pool = range(self.n_levels[0], self.n_levels[1])
        if self.per_channel:
            return rng.choice(pool, size=(N, 1, C)).astype(int)
        drawn = rng.choice(pool, size=(N, 1, 1)).astype(int)
        return np.repeat(drawn, C, axis=2)

    @staticmethod
    def quantize_uniform(X: np.ndarray, levels: np.ndarray) -> np.ndarray:
        """Uniform-grid quantization of (N, T, C) given (N, 1, C) levels."""
        lo = X.min(axis=1, keepdims=True)
        hi = X.max(axis=1, keepdims=True)
        span = hi - lo
        span[span == 0] = 1
        q = (X - lo) / span
        q = q * levels
        q = q.round()
        q = q.clip(0, levels - 1)
        q = q + 0.5
        q = q / levels
        return q * span + lo

    @staticmethod
    def quantize_quantile(
        flat: np.ndarray, levels_flat: np.ndarray, buggy: bool
    ) -> np.ndarray:
        """Quantile-bin quantization of (R, T) rows, in place.

        ``buggy=True`` reproduces the reference's /100 percentile scaling;
        ``buggy=False`` is the corrected engine variant.
        """
        # the reference divides the percentile fractions by 100 where it
        # should multiply (quantize.py:180-186); fractions end up in
        # [0, 0.01] instead of [0, 100]
        scale = 100.0 if buggy else 0.01
        for r in range(len(flat)):
            n = levels_flat[r]
            edges = np.percentile(flat[r, :], np.arange(n + 1) / n / scale)
            centers = np.percentile(flat[r, :], np.arange(0.5, n) / n / scale)
            flat[r, :] = centers[
                np.digitize(flat[r, :], edges).clip(0, n - 1)
            ]
        return flat

    @property
    def deterministic_core(self) -> bool:
        # kmeans is excluded: its init draws from the rng even with a
        # scalar n_levels
        return (
            self.how in ("uniform", "quantile", "quantile_fixed")
            and isinstance(self.n_levels, int)
        )

    def _core(self, X, Y, rng=None) -> ArrayPair:
        rng = rng if rng is not None else np.random.RandomState(self.seed)
        N, T, C = X.shape
        levels = self.plan_levels(rng, N, C)

        if self.how == "uniform":
            X_out = self.quantize_uniform(X, levels)
        elif self.how in ("quantile", "quantile_fixed"):
            flat = X.copy().swapaxes(1, 2).reshape((N * C, T))
            flat = self.quantize_quantile(
                flat, levels.flatten(), buggy=self.how == "quantile"
            )
            X_out = flat.reshape(N, C, T).swapaxes(1, 2)
        else:  # kmeans
            flat = X.copy().swapaxes(1, 2).reshape((N * C, T))
            lv = levels.flatten()
            for r in range(len(flat)):
                flat[r, :] = kmeans_1d(flat[r, :], lv[r], seed=self.seed)
            X_out = flat.reshape(N, C, T).swapaxes(1, 2)

        return X_out, (Y.copy() if Y is not None else None)
