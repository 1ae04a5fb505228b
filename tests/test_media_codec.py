"""Pure-NumPy BMP/WAV codec (tsaug_spark/codec/media.py) and the real
multimodal decode path built on it.

The codecs remove the repo's last decode stub: uncompressed containers
need no external library.  Gated here:

* encode -> decode identity for BMP (odd widths exercise the 4-byte
  row padding; values cover the full uint8 range) and WAV (mono and
  multi-channel int16, plus the 8-bit widening convention);
* malformed / compressed payloads raise with clear messages;
* the mapInPandas decode-stats path reproduces the generation laws
  through the full bytes round trip (the SQL oracle twin of
  ``multimodal_decode``).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tsaug_spark.codec.media import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 9), (33, 31)])
def test_bmp_roundtrip(h, w):
    rng = np.random.RandomState(h * 100 + w)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_padding_and_bottom_up_layout():
    # 3x2: row stride 2*3=6 -> padded to 8; bottom-up on disk
    img = np.arange(18, dtype=np.uint8).reshape(3, 2, 3)
    payload = encode_bmp(img)
    offset = struct.unpack_from("<I", payload, 10)[0]
    assert offset == 54
    assert len(payload) == 54 + 8 * 3
    # first stored row is the LAST image row, channels BGR
    first_stored = payload[54:54 + 6]
    assert list(first_stored) == [14, 13, 12, 17, 16, 15]
    assert np.array_equal(decode_bmp(payload), img)


def test_bmp_top_down_height_negative():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    payload = bytearray(encode_bmp(img))
    # flip to top-down: negate height, re-order rows accordingly
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    rows = np.frombuffer(bytes(payload[54:]), dtype=np.uint8).reshape(
        2, 12
    )[::-1]
    top_down = bytes(payload[:54]) + rows.tobytes()
    assert np.array_equal(decode_bmp(top_down), img)


def test_bmp_rejects_garbage_and_compressed():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"not a bmp at all" * 8)
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(img))
    struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        decode_bmp(bytes(payload))


@pytest.mark.parametrize("n,ch", [(1, 1), (100, 1), (64, 2), (333, 3)])
def test_wav_roundtrip(n, ch):
    rng = np.random.RandomState(n + ch)
    x = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    y, rate = decode_wav(encode_wav(x, 44100))
    assert rate == 44100
    assert np.array_equal(y, x)


def test_wav_8bit_widening():
    # hand-build an 8-bit mono WAV: 128 = silence -> 0 after widening
    raw = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw + b"\x00"
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    y, rate = decode_wav(payload)
    assert rate == 8000
    assert y[:, 0].tolist() == [-32768, 0, 32512]


def test_wav_rejects_non_pcm():
    x = np.zeros(4, dtype=np.int16)
    payload = bytearray(encode_wav(x))
    # audio_format field lives at fmt chunk offset: RIFF(12)+'fmt '(4)+size(4)
    struct.pack_into("<H", payload, 20, 3)  # IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(payload))


def test_media_decode_stats_matches_generation_laws(spark):
    from tsaug_spark.pipeline.multimodal import (
        attach_real_media,
        media_decode_stats,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = (
        media_decode_stats(attach_real_media(docs))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for d in range(40):
        w, h = 8 + d % 9, 8 + d % 7
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = ((d + 3 * r + 7 * c + 11 * ch) % 256).astype(np.int64)
        pos = (np.arange(h)[:, None] * w + np.arange(w)[None, :])[
            :, :, None
        ]
        i = np.arange(64 + d % 64, dtype=np.int64)
        x = (31 * d + 17 * i) % 65536 - 32768
        row = got.loc[d]
        assert (row["width"], row["height"]) == (w, h)
        assert row["px_sum"] == img.sum()
        assert row["px_possum"] == (img * pos).sum()
        assert row["px_chsum"] == (img * ch).sum()
        assert row["n_samples"] == len(i)
        assert row["s_sum"] == x.sum()
        assert row["s_wsum"] == (i * x).sum()
        assert row["s_min"] == x.min() and row["s_max"] == x.max()


def test_real_features_from_decoded_pixels():
    from tsaug_spark.pipeline.multimodal import real_features

    img = np.full((4, 6, 3), 7, dtype=np.uint8)
    img[:, :, 1] = 9
    f = real_features(encode_bmp(img))
    assert f.tolist() == [6.0, 4.0, 7.0, 9.0, 7.0, 0.0, 0.0, 0.0]
