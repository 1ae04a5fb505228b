"""Notebook plotting helper matching the reference's visualization API
(``tsaug.visualization.plot``, /root/reference/src/tsaug/visualization/
_visualization.py:17-129): one subplot per series, one line per channel,
shaded spans over contiguous segmentation-mask runs.

matplotlib is import-gated (absent in this sandbox, coverage-excluded in
the reference too); ``segment_windows`` — the mask-run detection the
shading is built on — is pure NumPy and tested.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def segment_windows(mask_1d: np.ndarray) -> List[Tuple[int, int]]:
    """Contiguous runs of 1s in a binary mask as inclusive (start, end).

    Mirrors the reference's ``_get_event_windows``
    (_visualization.py:132-139): pad-diff edge detection.
    """
    m = np.asarray(mask_1d).clip(0, 1).round().astype(int)
    edges = np.diff(np.concatenate([[0], m, [0]]))
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    return [(int(s), int(e) - 1) for s, e in zip(starts, ends)]


def plot(X: np.ndarray, Y: Optional[np.ndarray] = None):
    """Line plots of a series batch with mask-run shading.

    Same call shape as the reference: X of (T,), (N, T) or (N, T, C);
    optional Y of (T,), (N, T) or (N, T, L).  Returns (figure, axes).
    """
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - env dependent
        raise ImportError(
            "plot() needs matplotlib, which is not installed in this "
            "environment"
        ) from exc

    from tsaug_spark.operators.base import _to_3d

    X3, _ = _to_3d(np.asarray(X, dtype=float), "channel")
    N, T, C = X3.shape
    Y3 = None
    if Y is not None:
        Y3, _ = _to_3d(np.asarray(Y), "label")
        if Y3.shape[0] != N or Y3.shape[1] != T:
            raise ValueError("X and Y disagree on series count or length")

    fig, axes = plt.subplots(N, 1, figsize=(10, 2 * N), squeeze=False)
    axes = axes[:, 0]
    for i in range(N):
        for c in range(C):
            axes[i].plot(np.arange(T), X3[i, :, c])
        if Y3 is not None:
            for j in range(Y3.shape[2]):
                for start, end in segment_windows(Y3[i, :, j]):
                    axes[i].axvspan(start, end, alpha=0.4)
    return fig, axes if N > 1 else axes[0]
