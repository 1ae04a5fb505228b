"""Columnar time-series codecs (Gorilla XOR floats, delta-of-delta ts)."""

from .gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)

__all__ = [
    "decode_timestamps",
    "decode_values",
    "encode_timestamps",
    "encode_values",
]
