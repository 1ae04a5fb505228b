"""AddNoise — i.i.d. per-time-point noise (gaussian / laplace / uniform).

Semantics (parity target: /root/reference/src/tsaug/_augmenter/add_noise.py:217-270):
unit-variance base noise per point; per-series loc and scale sampled from
the usual specs with a fixed draw order — loc, then scale, then the noise
block; the block is (N, T, C) when ``per_channel`` else (N, T, 1) repeated
across channels; applied additively (optionally scaled by the per-channel
min-max range when ``normalize``) or multiplicatively as ``X * (1+noise)``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from .base import ArrayPair, SeriesOp, check_float_spec

_DISTRS = ("gaussian", "laplace", "uniform")


class AddNoise(SeriesOp):
    def __init__(
        self,
        loc: Union[float, Tuple[float, float], List[float]] = 0.0,
        scale: Union[float, Tuple[float, float], List[float]] = 0.1,
        distr: str = "gaussian",
        kind: str = "additive",
        per_channel: bool = True,
        normalize: bool = True,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.loc = loc
        self.scale = scale
        self.distr = distr
        self.kind = kind
        self.per_channel = per_channel
        self.normalize = normalize
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("loc", "scale", "distr", "kind", "per_channel", "normalize")

    @property
    def loc(self) -> Union[float, Tuple[float, float], List[float]]:
        return self._loc

    @loc.setter
    def loc(self, v) -> None:
        check_float_spec(v, "loc")
        self._loc = v

    @property
    def scale(self) -> Union[float, Tuple[float, float], List[float]]:
        return self._scale

    @scale.setter
    def scale(self, v) -> None:
        check_float_spec(v, "scale", lo=0.0)
        self._scale = v

    @property
    def distr(self) -> str:
        return self._distr

    @distr.setter
    def distr(self, d: str) -> None:
        if not isinstance(d, str):
            raise TypeError(f"Parameter `distr` must be one of {_DISTRS}.")
        if d not in _DISTRS:
            raise ValueError(f"Parameter `distr` must be one of {_DISTRS}.")
        self._distr = d

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

    @staticmethod
    def _draw_param(rng: np.random.RandomState, spec, n: int) -> np.ndarray:
        if isinstance(spec, (float, int)):
            return np.ones(n) * spec
        if isinstance(spec, tuple):
            return rng.uniform(low=spec[0], high=spec[1], size=n)
        return rng.choice(spec, size=n)

    def _core(self, X, Y, rng=None) -> ArrayPair:
        N, T, C = X.shape
        rng = rng if rng is not None else np.random.RandomState(self.seed)

        if self.distr == "gaussian":
            draw = lambda shape: rng.normal(0.0, 1.0, size=shape)
        elif self.distr == "laplace":
            draw = lambda shape: rng.laplace(0.0, 1.0, size=shape)
        else:
            root3 = 3 ** 0.5
            draw = lambda shape: rng.uniform(
                low=-root3, high=root3, size=shape
            )

        # fixed draw order: loc, scale, then the noise block
        loc = self._draw_param(rng, self.loc, N)
        scale = self._draw_param(rng, self.scale, N)

        if self.per_channel:
            noise = draw((N, T, C))
        else:
            noise = np.repeat(draw((N, T, 1)), C, axis=2)
        noise = noise * scale.reshape((N, 1, 1)) + loc.reshape((N, 1, 1))

        if self.kind == "additive":
            if self.normalize:
                span = X.max(axis=1, keepdims=True) - X.min(
                    axis=1, keepdims=True
                )
                X_out = X + noise * span
            else:
                X_out = X + noise
        else:
            X_out = X * (1.0 + noise)

        return X_out, (Y.copy() if Y is not None else None)
