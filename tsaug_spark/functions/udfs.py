"""Vectorized (Arrow) pandas UDFs for scalar math Catalyst can't express.

These are the engine's *only* Python scalar UDFs, and they are
Series->Series pandas_udfs (Arrow batch transfer) — never row-at-a-time
Python.  Everything SQL-expressible stays in pyspark.sql.functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def char_entropy(texts: pd.Series) -> pd.Series:
    """Shannon entropy (bits) of each string's character distribution.

    A quality-filter signal (low entropy = repetitive/boilerplate text)
    with no closed-form SQL: needs a per-row histogram over an unbounded
    alphabet.  Vectorized per Arrow batch via numpy unique counts.
    """

    def one(s: str) -> float:
        if not s:
            return 0.0
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        _, counts = np.unique(codes, return_counts=True)
        p = counts / counts.sum()
        return float(-(p * np.log2(p)).sum())

    return texts.map(one)


@pandas_udf("double")
def gini_concentration(values: pd.Series) -> pd.Series:
    """Per-row Gini coefficient of an array<double> column — used to
    score how concentrated a conversation's activity is across buckets."""

    def one(arr) -> float:
        if arr is None or len(arr) == 0:
            return 0.0
        v = np.sort(np.asarray(arr, dtype=np.float64))
        if v.sum() == 0:
            return 0.0
        n = len(v)
        index = np.arange(1, n + 1)
        return float((2 * index - n - 1).dot(v) / (n * v.sum()))

    return values.map(one)
