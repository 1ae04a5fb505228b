"""Load the reference library's scipy-free modules as the parity oracle.

The reference package cannot be imported whole (its __init__ pulls scipy,
absent here), so the scipy-free operator modules are loaded directly under
a stub package.  Used ONLY by tests — never by engine code.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF_DIR = "/root/reference/src/tsaug/_augmenter"
_SCIPY_FREE = [
    "base",
    "resize",  # before crop (crop imports resize)
    "pool",
    "quantize",
    "dropout",
    "crop",
    "reverse",
    "add_noise",
]

_cache: dict | None = None


def load_reference():
    """Import the scipy-free reference modules; returns {name: module}."""
    global _cache
    if _cache is not None:
        return _cache
    pkg_name = "ref_tsaug"
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = []  # mark as package
    sub = types.ModuleType(f"{pkg_name}._augmenter")
    sub.__path__ = [_REF_DIR]
    sub._default_seed = None
    sys.modules[pkg_name] = pkg
    sys.modules[f"{pkg_name}._augmenter"] = sub

    mods = {}
    for name in _SCIPY_FREE:
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}._augmenter.{name}", f"{_REF_DIR}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        setattr(sub, name, mod)
        mods[name] = mod
    _cache = mods
    return mods
