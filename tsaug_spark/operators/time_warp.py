"""TimeWarp — random smooth monotone re-parameterization of the time axis.

Semantics (parity target: /root/reference/src/tsaug/_augmenter/time_warp.py:121-196):
``n_speed_change + 2`` equally spaced anchor positions over ``[0, T-1]``;
anchor values from per-series uniforms, shifted so the max/min speed ratio
equals ``max_speed_ratio``, cumsum-normalized onto ``[0, T-1]`` with a
leading zero; the warp path is the PCHIP interpolant through the anchors
evaluated at ``0..T-1``; the output linearly interpolates each series at
the warp positions (with linear extrapolation).  Masks are warped the same
way then rounded to int.

Draw order: max_speed_ratio sample first (when not scalar), then the
(N, n_speed_change + 1) anchor uniforms.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from tsaug_spark.functions.interpolate import (
    linear_interp_extrap,
    pchip_interp,
)

from .base import ArrayPair, SeriesOp, check_positive_int


class TimeWarp(SeriesOp):
    def __init__(
        self,
        n_speed_change: int = 3,
        max_speed_ratio: Union[float, Tuple[float, float], List[float]] = 3.0,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.n_speed_change = n_speed_change
        self.max_speed_ratio = max_speed_ratio
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("n_speed_change", "max_speed_ratio")

    @property
    def n_speed_change(self) -> int:
        return self._n_speed_change

    @n_speed_change.setter
    def n_speed_change(self, n: int) -> None:
        check_positive_int(n, "n_speed_change")
        self._n_speed_change = n

    @property
    def max_speed_ratio(
        self,
    ) -> Union[float, Tuple[float, float], List[float]]:
        return self._max_speed_ratio

    @max_speed_ratio.setter
    def max_speed_ratio(self, v) -> None:
        msg = (
            "Parameter `max_speed_ratio` must be a number greater than 1, "
            "a 2-tuple interval of such numbers, or a list of them."
        )
        if isinstance(v, (int, float)):
            if v <= 1.0:
                raise ValueError(msg)
        elif isinstance(v, tuple):
            if len(v) != 2 or not all(
                isinstance(x, (int, float)) for x in v
            ):
                raise TypeError(msg)
            if v[0] > v[1] or min(v) <= 1.0:
                raise ValueError(msg)
        elif isinstance(v, list):
            if not v or not all(isinstance(x, (int, float)) for x in v):
                raise TypeError(msg)
            if not all(x > 1.0 for x in v):
                raise ValueError(msg)
        else:
            raise TypeError(msg)
        self._max_speed_ratio = v

    def plan_warp(
        self, rng: np.random.RandomState, n_rows: int, T: int
    ) -> np.ndarray:
        """Draw and build the (rows, T) warp paths (reference draw order)."""
        N = n_rows
        K = self.n_speed_change
        # anchor x positions: K+2 points equally spaced over [0, T-1]
        anchor_x = np.arange(0, 1 + 1 / (K + 1) / 2, 1 / (K + 1)) * (T - 1)

        if isinstance(self.max_speed_ratio, (float, int)):
            ratio = np.ones(N) * self.max_speed_ratio
        elif isinstance(self.max_speed_ratio, tuple):
            ratio = rng.uniform(
                low=self.max_speed_ratio[0],
                high=self.max_speed_ratio[1],
                size=N,
            )
        else:
            ratio = rng.choice(self.max_speed_ratio, size=N)

        vals = rng.uniform(low=0.0, high=1.0, size=(N, K + 1))
        # shift so that (max segment speed) / (min segment speed) == ratio
        vals = vals - (
            vals.max(axis=1, keepdims=True)
            - ratio.reshape(N, 1) * vals.min(axis=1, keepdims=True)
        ) / (1 - ratio.reshape(N, 1))
        vals = (
            vals.cumsum(axis=1) / vals.sum(axis=1, keepdims=True) * (T - 1)
        )
        anchor_y = np.concatenate([np.zeros((N, 1)), vals], axis=1)
        return pchip_interp(anchor_x, anchor_y, np.arange(T).astype(float))

    def _core(self, X, Y, rng=None) -> ArrayPair:
        rng = rng if rng is not None else np.random.RandomState(self.seed)
        N, T, C = X.shape
        warp = self.plan_warp(rng, N, T)

        X_out = np.stack(
            [
                linear_interp_extrap(X[i], warp[i])
                for i in range(N)
            ]
        )
        if Y is None:
            Y_out: Optional[np.ndarray] = None
        else:
            Y_out = np.stack(
                [
                    linear_interp_extrap(Y[i], warp[i])
                    for i in range(N)
                ]
            ).round().astype(int)
        return X_out, Y_out
