"""Run the reference library's OWN test files against OUR operators.

A shim module registers ``tsaug`` in sys.modules pointing at
tsaug_spark.operators, then the reference's test_classes.py,
test_random_seed.py and test_pipe.py are exec'd verbatim and their
test functions re-exported for pytest collection.  Passing this file
means the engine satisfies the reference's published contract
point-for-point (shape grid, no-aliasing, seed determinism, pipeline
composition) — including the Convolve/Drift/TimeWarp/kmeans configs the
reference itself cannot run here (scipy/sklearn absent).
"""

from __future__ import annotations

import sys
import types

import tsaug_spark.operators as ops

_shim = types.ModuleType("tsaug")
for _name in (
    "AddNoise",
    "Convolve",
    "Crop",
    "Drift",
    "Dropout",
    "Pool",
    "Quantize",
    "Resize",
    "Reverse",
    "TimeWarp",
):
    setattr(_shim, _name, getattr(ops, _name))
sys.modules.setdefault("tsaug", _shim)

_REF_TESTS = "/root/reference/tests"

for _fname in ("test_classes.py", "test_random_seed.py", "test_pipe.py"):
    _ns: dict = {"__name__": f"ref_{_fname[:-3]}", "__file__": _fname}
    with open(f"{_REF_TESTS}/{_fname}") as _fh:
        exec(compile(_fh.read(), _fname, "exec"), _ns)  # noqa: S102
    for _k, _v in _ns.items():
        if _k.startswith("test_"):
            globals()[f"{_k}__{_fname[:-3]}"] = _v
