"""Gorilla codec: encode -> decode == identity on adversarial inputs,
plus compression-ratio sanity on realistic rollup series."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsaug_spark.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def _roundtrip_vals(arr):
    out = decode_values(encode_values(np.asarray(arr, dtype=np.float64)))
    a = np.asarray(arr, dtype=np.float64)
    # bit-pattern equality: NaN payloads and -0.0 must survive
    assert np.array_equal(
        a.view(np.uint64), out.view(np.uint64)
    ), f"{a} != {out}"


def _roundtrip_ts(arr):
    a = np.asarray(arr, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(a))
    assert np.array_equal(a, out), f"{a} != {out}"


ADVERSARIAL_VALUES = [
    [],
    [0.0],
    [0.0, -0.0, 0.0, -0.0],
    [1.5] * 100,  # constant run -> 1 bit per point
    [np.nan, 1.0, np.nan, np.inf, -np.inf, 0.0],
    [5e-324, 2.5e-324, 0.0, -5e-324],  # denormals
    [1.0, np.nextafter(1.0, 2.0)],  # 1-ulp neighbours
    np.linspace(-1e300, 1e300, 37),
    [2.0 ** k for k in range(-60, 60, 7)],
    [1.7976931348623157e308, -1.7976931348623157e308],
]


@pytest.mark.parametrize("vals", ADVERSARIAL_VALUES, ids=range(len(ADVERSARIAL_VALUES)))
def test_value_roundtrip_adversarial(vals):
    _roundtrip_vals(vals)


ADVERSARIAL_TS = [
    [],
    [0],
    [0, 1],
    [1767225600_000_000],
    list(range(0, 600, 60)),  # perfectly regular -> dod == 0
    [0, 60, 121, 181, 240, 240, 10 ** 15, 10 ** 15 + 1],
    [-(2 ** 62), 0, 2 ** 62],
    [5, 4, 3, 100, -50],  # non-monotone still round-trips
]


@pytest.mark.parametrize("ts", ADVERSARIAL_TS, ids=range(len(ADVERSARIAL_TS)))
def test_timestamp_roundtrip_adversarial(ts):
    _roundtrip_ts(ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300
    )
)
def test_value_roundtrip_property(vals):
    _roundtrip_vals(vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2 ** 62), max_value=2 ** 62), max_size=300
    )
)
def test_timestamp_roundtrip_property(ts):
    _roundtrip_ts(ts)


def test_compression_ratio_on_rollup_like_series():
    # regular 1m buckets + small-integer metric values: the Gorilla
    # sweet spot.  Require meaningful wins over raw 8 B/point.
    n = 10_000
    ts = 1767225600 + 60 * np.arange(n)
    enc_t = encode_timestamps(ts)
    assert len(enc_t) < n * 8 / 40  # ~0.2 B/point for regular ts

    rng = np.random.RandomState(0)
    vals = np.round(rng.gamma(2.0, 2.0, size=n))  # counts-like
    enc_v = encode_values(vals)
    ratio = (n * 8) / len(enc_v)
    assert ratio > 1.5, f"ratio {ratio:.2f}"

    const = encode_values(np.full(n, 7.0))
    assert len(const) < n / 7  # ~1 bit per repeated point


def test_grouped_encoders_byte_identical():
    from tsaug_spark.codec.gorilla import (
        encode_timestamps_grouped,
        encode_values_grouped,
    )

    rng = np.random.RandomState(0)
    lens = rng.randint(1, 200, size=300)
    vals = np.concatenate([np.round(rng.gamma(2, 2, l)) for l in lens])
    tss = np.concatenate(
        [1767225600 + 60 * np.arange(l) + rng.randint(0, 5, l) for l in lens]
    )
    gv = encode_values_grouped(vals, lens)
    gt = encode_timestamps_grouped(tss, lens)
    off = 0
    for i, l in enumerate(lens):
        assert gv[i] == encode_values(vals[off : off + l])
        assert gt[i] == encode_timestamps(tss[off : off + l])
        assert np.array_equal(decode_values(gv[i]), vals[off : off + l])
        assert np.array_equal(decode_timestamps(gt[i]), tss[off : off + l])
        off += l
