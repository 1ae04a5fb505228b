"""Convolve — normalized weighted moving-average smoothing per channel.

Spark-side this is a centered window frame (±⌊W/2⌋ with reflect edge
semantics); the kernel layer runs the NumPy core below per conversation;
at tier scale long series are chunked with ⌊W/2⌋-row halos (plans/pack.py).

Semantics (parity target: /root/reference/src/tsaug/_augmenter/convolve.py:153-218):
each (series, channel) row is convolved with a symmetric window of sampled
type/size, reflect boundary, then divided by the window tap sum.  Window
type and size are sampled per series (per channel when ``per_channel``).
Rows sharing (size, type) are processed in one vectorized call; iteration
is ascending over unique sizes and over ``set()`` of the drawn types —
group results are order-independent, so the hash-ordered set iteration is
harmless (SURVEY.md §7.4 R1).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from tsaug_spark.functions.interpolate import convolve_reflect
from tsaug_spark.functions.windows import WindowSpec, make_window

from .base import ArrayPair, SeriesOp, check_int_spec


class Convolve(SeriesOp):
    def __init__(
        self,
        window: Union[WindowSpec, List[WindowSpec]] = "hann",
        size: Union[int, Tuple[int, int], List[int]] = 7,
        per_channel: bool = False,
        repeats: int = 1,
        prob: float = 1.0,
        seed: Optional[int] = None,
    ):
        self.window = window
        self.size = size
        self.per_channel = per_channel
        super().__init__(repeats=repeats, prob=prob, seed=seed)

    @classmethod
    def _param_names(cls) -> Tuple[str, ...]:
        return ("window", "size", "per_channel")

    @property
    def window(self) -> Union[WindowSpec, List[WindowSpec]]:
        return self._window

    @window.setter
    def window(self, w: Union[WindowSpec, List[WindowSpec]]) -> None:
        if not isinstance(w, (str, tuple, list)):
            raise TypeError(
                "Parameter `window` must be a window name, a (name, arg) "
                "tuple, or a list of those."
            )
        if isinstance(w, list):
            if not w:
                raise ValueError("Parameter `window` list must be non-empty.")
            if not all(isinstance(x, (str, tuple)) for x in w):
                raise TypeError(
                    "Each window in the list must be a name or tuple."
                )
        self._window = w

    @property
    def size(self) -> Union[int, Tuple[int, int], List[int]]:
        return self._size

    @size.setter
    def size(self, v: Union[int, Tuple[int, int], List[int]]) -> None:
        check_int_spec(v, "size")
        self._size = v

    @property
    def per_channel(self) -> bool:
        return self._per_channel

    @per_channel.setter
    def per_channel(self, v: bool) -> None:
        if not isinstance(v, bool):
            raise TypeError("Parameter `per_channel` must be boolean.")
        self._per_channel = v

    def plan_windows(
        self, rng: np.random.RandomState, n_rows: int, n_channels: int
    ):
        """Replay the reference's draw order for window types then sizes.

        Returns (types, sizes): a list of N*C window specs and an int
        array of N*C tap counts.  Types are drawn first (convolve.py:159-172),
        then sizes (convolve.py:174-190).
        """
        N, C = n_rows, n_channels
        if isinstance(self.window, (str, tuple)):
            types: List[WindowSpec] = [self.window] * (N * C)
        elif self.per_channel:
            picks = rng.choice(len(self.window), N * C)
            types = [self.window[i] for i in picks]
        else:
            picks = rng.choice(len(self.window), N)
            types = [self.window[i] for i in picks for _ in range(C)]

        if isinstance(self.size, int):
            sizes = np.full(N * C, self.size)
        elif isinstance(self.size, tuple):
            pool = range(self.size[0], self.size[1])
            if self.per_channel:
                sizes = rng.choice(pool, N * C)
            else:
                sizes = np.repeat(rng.choice(pool, N), C)
        else:
            if self.per_channel:
                sizes = rng.choice(self.size, N * C)
            else:
                sizes = np.repeat(rng.choice(self.size, N), C)
        return types, sizes.astype(int)

    @staticmethod
    def smooth_rows(
        flat: np.ndarray, types: List[WindowSpec], sizes: np.ndarray
    ) -> np.ndarray:
        """Convolve rows of (R, T) grouped by (size, type); in place."""
        for ws in np.unique(sizes):
            for wt in set(types):
                rows = (sizes == ws) & np.array([t == wt for t in types])
                if not rows.any():
                    continue
                taps = make_window(wt, int(ws))
                flat[rows, :] = convolve_reflect(flat[rows, :], taps) / (
                    taps.sum()
                )
        return flat

    @property
    def deterministic_core(self) -> bool:
        return (
            isinstance(self.size, int)
            and not isinstance(self.window, list)
        )

    def _core(self, X, Y, rng=None) -> ArrayPair:
        N, T, C = X.shape
        rng = rng if rng is not None else np.random.RandomState(self.seed)
        types, sizes = self.plan_windows(rng, N, C)
        flat = X.copy().swapaxes(1, 2).reshape(N * C, T)
        flat = self.smooth_rows(flat, types, sizes)
        X_out = flat.reshape(N, C, T).swapaxes(1, 2)
        return X_out, (Y.copy() if Y is not None else None)
