"""Reverse — flip the time axis of each series.

Spark-side this is an index remap ``new_idx = (T-1) - bucket_idx`` (or
``F.reverse`` on the packed array form) — no kernel needed; the NumPy core
exists for the local/parity path.

Parity target: /root/reference/src/tsaug/_augmenter/reverse.py:40-50.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .base import ArrayPair, SeriesOp


class Reverse(SeriesOp):
    def __init__(
        self,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return tuple()

    @property
    def deterministic_core(self) -> bool:
        return True

    def _core(self, X, Y, rng=None) -> ArrayPair:
        X_out = X[:, ::-1, :].copy()
        Y_out = Y[:, ::-1, :].copy() if Y is not None else None
        return X_out, Y_out
