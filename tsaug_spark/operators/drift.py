"""Drift — add a smooth random-walk trend to each series.

Semantics (parity target: /root/reference/src/tsaug/_augmenter/drift.py:181-234):
per (series[, channel]) draw a Gaussian random walk at ``n + 2`` anchor
knots, pass a not-a-knot cubic spline through them on a uniform grid over
``[0, T]``, evaluate at ``0..T-1``, re-base to zero at t=0, normalize by
the max absolute value, scale by ``max_drift`` (scalar or per-series
uniform draw), and apply additively (optionally scaled by the per-channel
min-max range) or multiplicatively.

Draw order: the n_drift_points assignment ``choice`` first, then per
*distinct* n (iterated in the same ``set`` order the reference uses,
drift.py:187-197) the anchor normals, then the max_drift uniforms.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from tsaug_spark.functions.interpolate import cubic_spline_notaknot

from .base import ArrayPair, SeriesOp, check_float_spec, check_int_spec


class Drift(SeriesOp):
    def __init__(
        self,
        max_drift: Union[float, Tuple[float, float]] = 0.5,
        n_drift_points: Union[int, List[int]] = 3,
        kind: str = "additive",
        per_channel: bool = True,
        normalize: bool = True,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.max_drift = max_drift
        self.n_drift_points = n_drift_points
        self.kind = kind
        self.per_channel = per_channel
        self.normalize = normalize
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return (
            "max_drift",
            "n_drift_points",
            "kind",
            "per_channel",
            "normalize",
        )

    @property
    def max_drift(self) -> Union[float, Tuple[float, float]]:
        return self._max_drift

    @max_drift.setter
    def max_drift(self, v: Union[float, Tuple[float, float]]) -> None:
        if isinstance(v, list):
            raise TypeError(
                "Parameter `max_drift` must be a non-negative number or a "
                "2-tuple interval."
            )
        check_float_spec(v, "max_drift", lo=0.0)
        self._max_drift = v

    @property
    def n_drift_points(self) -> Union[int, List[int]]:
        return self._n_drift_points

    @n_drift_points.setter
    def n_drift_points(self, v: Union[int, List[int]]) -> None:
        if isinstance(v, tuple):
            raise TypeError(
                "Parameter `n_drift_points` must be a positive integer or "
                "a list of positive integers."
            )
        check_int_spec(v, "n_drift_points")
        self._n_drift_points = v

    @property
    def kind(self) -> str:
        return self._kind

    @kind.setter
    def kind(self, k: str) -> None:
        if k not in ("additive", "multiplicative"):
            raise ValueError(
                "Parameter `kind` must be 'additive' or 'multiplicative'."
            )
        self._kind = k

    @property
    def per_channel(self) -> bool:
        return self._per_channel

    @per_channel.setter
    def per_channel(self, v: bool) -> None:
        if not isinstance(v, bool):
            raise TypeError("Parameter `per_channel` must be boolean.")
        self._per_channel = v

    @property
    def normalize(self) -> bool:
        return self._normalize

    @normalize.setter
    def normalize(self, v: bool) -> None:
        if not isinstance(v, bool):
            raise TypeError("Parameter `normalize` must be boolean.")
        self._normalize = v

    def _core(self, X, Y, rng=None) -> ArrayPair:
        N, T, C = X.shape
        rng = rng if rng is not None else np.random.RandomState(self.seed)

        if isinstance(self.n_drift_points, int):
            distinct = set([self.n_drift_points])
        else:
            distinct = set(self.n_drift_points)

        rows = N * (C if self.per_channel else 1)
        assign = rng.choice(len(distinct), rows)

        walk = np.zeros((rows, T))
        tgrid = np.arange(T)
        for i, n in enumerate(distinct):
            members = assign == i
            if not members.any():
                continue
            anchors = np.cumsum(
                rng.normal(size=(int(members.sum()), n + 2)), axis=1
            )
            walk[members, :] = cubic_spline_notaknot(
                anchors, float(T), tgrid.astype(float)
            )

        drift = walk.reshape((N, -1, T)).swapaxes(1, 2)
        drift = drift - drift[:, 0, :].reshape(N, 1, -1)
        drift = drift / abs(drift).max(axis=1, keepdims=True)
        if isinstance(self.max_drift, (float, int)):
            drift = drift * self.max_drift
        else:
            drift = drift * rng.uniform(
                low=self.max_drift[0],
                high=self.max_drift[1],
                size=(N, 1, C if self.per_channel else 1),
            )

        if self.kind == "additive":
            if self.normalize:
                span = X.max(axis=1, keepdims=True) - X.min(
                    axis=1, keepdims=True
                )
                X_out = X + drift * span
            else:
                X_out = X + drift
        else:
            X_out = X * (1 + drift)

        return X_out, (Y.copy() if Y is not None else None)
