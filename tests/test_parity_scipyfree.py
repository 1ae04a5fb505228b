"""Bit-exact parity vs the reference library (scipy-free subset).

For every operator whose reference module imports without scipy/sklearn,
run the reference and the engine implementation on identical inputs and
require ``np.array_equal`` (float64 — bit-exact, SURVEY.md §5.2).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.reference_loader import load_reference
from tsaug_spark.operators import (
    AddNoise,
    Crop,
    Dropout,
    Pool,
    Quantize,
    Resize,
    Reverse,
)

REF = load_reference()

N, T, C, L, M = 10, 100, 3, 2, 4

_gen = np.random.RandomState(7)
X1 = _gen.uniform(size=T)
X2 = _gen.uniform(size=(N, T))
X3 = _gen.uniform(size=(N, T, C))
Y1 = _gen.choice(2, size=T).astype(int)
Y2 = _gen.choice(2, size=(N, T)).astype(int)
Y3 = _gen.choice(2, size=(N, T, L)).astype(int)

# (engine op, reference class name, reference kwargs) — engine ops take the
# same kwargs, so one spec builds both sides.
CASES = [
    ("Pool", "pool", "Pool", dict(seed=0)),
    ("Pool-max", "pool", "Pool", dict(kind="max", size=3, seed=1)),
    ("Pool-min", "pool", "Pool", dict(kind="min", size=5, seed=2)),
    ("Pool-interval", "pool", "Pool", dict(size=(2, 8), seed=3)),
    ("Pool-list", "pool", "Pool", dict(size=[2, 4, 6], seed=4)),
    ("Pool-perch", "pool", "Pool", dict(size=(2, 8), per_channel=True, seed=5)),
    ("Pool-rep", "pool", "Pool", dict(repeats=M, prob=0.5, seed=6)),
    ("Pool-tail", "pool", "Pool", dict(size=7, seed=7)),  # T % s != 0
    ("Resize-down", "resize", "Resize", dict(size=T // 2, seed=0)),
    ("Resize-up", "resize", "Resize", dict(size=T * 2 + 3, seed=1)),
    ("Resize-same", "resize", "Resize", dict(size=T, seed=2)),
    ("Resize-one", "resize", "Resize", dict(size=1, seed=3)),
    ("Resize-rep", "resize", "Resize", dict(size=T // 2, repeats=M, seed=4)),
    ("Quantize", "quantize", "Quantize", dict(seed=0)),
    ("Quantize-interval", "quantize", "Quantize", dict(n_levels=(5, 10), seed=1)),
    (
        "Quantize-perch",
        "quantize",
        "Quantize",
        dict(n_levels=(5, 10), per_channel=True, seed=2),
    ),
    ("Quantize-list", "quantize", "Quantize", dict(n_levels=[5, 6, 7], seed=3)),
    ("Quantize-quantile", "quantize", "Quantize", dict(how="quantile", seed=4)),
    ("Quantize-rep", "quantize", "Quantize", dict(repeats=M, prob=0.5, seed=5)),
    ("Dropout", "dropout", "Dropout", dict(seed=0)),
    (
        "Dropout-interval",
        "dropout",
        "Dropout",
        dict(p=(0.01, 0.1), size=(1, 5), seed=1),
    ),
    (
        "Dropout-list",
        "dropout",
        "Dropout",
        dict(p=[0.01, 0.02, 0.03], size=[1, 2, 3], seed=2),
    ),
    ("Dropout-bfill", "dropout", "Dropout", dict(fill="bfill", size=3, seed=3)),
    ("Dropout-mean", "dropout", "Dropout", dict(fill="mean", size=2, seed=4)),
    ("Dropout-const", "dropout", "Dropout", dict(fill=0, seed=5)),
    (
        "Dropout-perch",
        "dropout",
        "Dropout",
        dict(per_channel=True, p=0.1, size=2, seed=6),
    ),
    ("Dropout-rep", "dropout", "Dropout", dict(repeats=M, prob=0.5, seed=7)),
    ("Crop", "crop", "Crop", dict(size=T // 2, seed=0)),
    ("Crop-rep", "crop", "Crop", dict(size=T // 2, repeats=M, seed=1)),
    (
        "Crop-interval",
        "crop",
        "Crop",
        dict(size=(T // 3, T), resize=T // 2, seed=2),
    ),
    (
        "Crop-list",
        "crop",
        "Crop",
        dict(size=[T // 3, T // 2], resize=T // 2, seed=3),
    ),
    ("Reverse", "reverse", "Reverse", dict(seed=0)),
    ("Reverse-rep", "reverse", "Reverse", dict(repeats=M, prob=0.5, seed=1)),
    ("AddNoise", "add_noise", "AddNoise", dict(seed=0)),
    (
        "AddNoise-interval",
        "add_noise",
        "AddNoise",
        dict(loc=(-1.0, 1.0), scale=(0.1, 0.2), seed=1),
    ),
    (
        "AddNoise-list",
        "add_noise",
        "AddNoise",
        dict(loc=[-1.0, 1.0], scale=[0.1, 0.2], seed=2),
    ),
    ("AddNoise-laplace", "add_noise", "AddNoise", dict(distr="laplace", seed=3)),
    ("AddNoise-uniform", "add_noise", "AddNoise", dict(distr="uniform", seed=4)),
    (
        "AddNoise-mult",
        "add_noise",
        "AddNoise",
        dict(kind="multiplicative", seed=5),
    ),
    (
        "AddNoise-flat",
        "add_noise",
        "AddNoise",
        dict(per_channel=False, normalize=False, seed=6),
    ),
    ("AddNoise-rep", "add_noise", "AddNoise", dict(repeats=M, prob=0.5, seed=7)),
]

_ENGINE = {
    "Pool": Pool,
    "Resize": Resize,
    "Quantize": Quantize,
    "Dropout": Dropout,
    "Crop": Crop,
    "Reverse": Reverse,
    "AddNoise": AddNoise,
}


def _pair(case):
    _, mod, cls, kwargs = case
    return _ENGINE[cls](**kwargs), getattr(REF[mod], cls)(**kwargs)


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize(
    "X,Y",
    [(X1, None), (X1, Y1), (X2, None), (X2, Y2), (X3, None), (X3, Y3)],
    ids=["X1", "X1Y1", "X2", "X2Y2", "X3", "X3Y3"],
)
def test_bit_exact(case, X, Y):
    ours, ref = _pair(case)
    if Y is None:
        got = ours.augment(X)
        want = ref.augment(X)
        assert got.dtype == want.dtype
        assert np.array_equal(got, want)
    else:
        got_x, got_y = ours.augment(X, Y)
        want_x, want_y = ref.augment(X, Y)
        assert got_x.dtype == want_x.dtype
        assert got_y.dtype == want_y.dtype
        assert np.array_equal(got_x, want_x)
        assert np.array_equal(got_y, want_y)


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_no_aliasing(case):
    """Output never aliases input (reference contract)."""
    ours, _ = _pair(case)
    Xc = X3.copy()
    out = ours.augment(X3)
    out[0] = 1e9
    assert np.array_equal(X3, Xc)


def test_pipe_matches_reference_fold():
    """A composed pipe folds identically to the reference pipe."""
    ours = (
        AddNoise(seed=1) * 2 @ 0.5
        + Pool(size=3, seed=2)
        + Quantize(n_levels=8, seed=3)
    )
    ref_mod = REF
    ref = (
        ref_mod["add_noise"].AddNoise(seed=1) * 2 @ 0.5
        + ref_mod["pool"].Pool(size=3, seed=2)
        + ref_mod["quantize"].Quantize(n_levels=8, seed=3)
    )
    got = ours.augment(X3)
    want = ref.augment(X3)
    assert np.array_equal(got, want)
    assert len(ours) == len(ref) == 3


def test_seed_determinism_and_entropy():
    """Same seed -> identical; seed=None -> different (w.h.p.)."""
    a = AddNoise(seed=123).augment(X3)
    b = AddNoise(seed=123).augment(X3)
    assert np.array_equal(a, b)
    c = AddNoise(seed=None).augment(X3)
    d = AddNoise(seed=None).augment(X3)
    assert not np.array_equal(c, d)
