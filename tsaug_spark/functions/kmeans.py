"""Deterministic 1-D k-means (Lloyd's iteration with k-means++ seeding).

Stands in for the reference's per-(series, channel) sklearn KMeans
(quantize.py:191-206).  sklearn is not a dependency of this engine and its
exact RNG stream is version-specific, so this implementation is documented
as *self-consistent deterministic* rather than reference-bit-exact; the
reference path itself raises ImportError without sklearn.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _kpp_init(
    vals: np.ndarray, k: int, rng: np.random.RandomState
) -> np.ndarray:
    """k-means++ seeding over 1-D values."""
    centers = np.empty(k)
    centers[0] = vals[rng.randint(len(vals))]
    dist2 = (vals - centers[0]) ** 2
    for j in range(1, k):
        total = dist2.sum()
        if total <= 0:
            centers[j:] = vals[rng.randint(len(vals), size=k - j)]
            break
        probs = dist2 / total
        centers[j] = vals[np.searchsorted(np.cumsum(probs), rng.uniform())]
        dist2 = np.minimum(dist2, (vals - centers[j]) ** 2)
    return centers


def kmeans_1d(
    vals: np.ndarray,
    k: int,
    seed: Optional[int] = None,
    max_iter: int = 100,
    tol: float = 1e-10,
) -> np.ndarray:
    """Cluster 1-D ``vals`` into k groups; return each value's center.

    1-D clusters are intervals, so assignment reduces to a searchsorted
    against midpoints of the sorted centers — O(T log k) per iteration.
    """
    vals = np.asarray(vals, dtype=float)
    k = int(min(k, len(np.unique(vals))))
    if k <= 1:
        return np.full_like(vals, vals.mean())
    rng = np.random.RandomState(seed)
    centers = np.sort(_kpp_init(vals, k, rng))
    for _ in range(max_iter):
        mids = (centers[:-1] + centers[1:]) / 2.0
        label = np.searchsorted(mids, vals)
        sums = np.bincount(label, weights=vals, minlength=k)
        counts = np.bincount(label, minlength=k)
        occupied = counts > 0
        new_centers = centers.copy()
        new_centers[occupied] = sums[occupied] / counts[occupied]
        new_centers = np.sort(new_centers)
        if np.abs(new_centers - centers).max() <= tol:
            centers = new_centers
            break
        centers = new_centers
    mids = (centers[:-1] + centers[1:]) / 2.0
    return centers[np.searchsorted(mids, vals)]
