"""Pure-NumPy codecs for uncompressed media containers: BMP and WAV.

Uncompressed formats need no codec library — BMP (BITMAPINFOHEADER,
BI_RGB 24/32-bit) and WAV (RIFF PCM 8/16-bit) are plain structured byte
layouts, parseable with ``struct`` + ``numpy`` alone.  These back the
multimodal pipeline's REAL decode path in-sandbox; compressed formats
(JPEG/PNG/MP3/...) still require an external library and raise with a
clear message.

Format references are the public specifications (Windows BMP file
format; RIFF/WAVE).  Layout facts encoded below:

* BMP: 14-byte file header (``BM``, file size, pixel-array offset),
  40-byte info header (width, signed height, bpp, compression).  Pixel
  rows are 4-byte aligned, stored bottom-up when height > 0 (top-down
  when negative), channels in BGR(A) order.
* WAV: ``RIFF <size> WAVE`` followed by chunks; ``fmt `` carries
  (audio_format=1 for PCM, n_channels, sample_rate, bits); ``data``
  carries little-endian interleaved samples — uint8 for 8-bit,
  int16 for 16-bit.  Chunks are word-aligned (odd sizes padded).
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HEADER = "<2sIHHI"
_BMP_INFO_HEADER = "<IiiHHIIiiII"


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB, got {img.shape}")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    offset = 14 + 40
    header = struct.pack(
        _BMP_FILE_HEADER, b"BM", offset + data_size, 0, 0, offset
    )
    info = struct.pack(
        _BMP_INFO_HEADER, 40, w, h, 1, 24, 0, data_size,
        2835, 2835, 0, 0,
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up rows, BGR channel order
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (H, W, 3) uint8 RGB
    array.  Raises ``ValueError`` on non-BMP bytes or compressed /
    palette variants."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, offset = struct.unpack_from(_BMP_FILE_HEADER, payload, 0)
    (
        hdr_size, w, h_signed, _planes, bpp, compression,
        _img_size, _xppm, _yppm, _used, _important,
    ) = struct.unpack_from(_BMP_INFO_HEADER, payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if compression != 0:
        raise ValueError(
            f"compressed BMP (BI code {compression}) needs a codec "
            "library; only BI_RGB is supported here"
        )
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_signed < 0
    h = abs(h_signed)
    nch = bpp // 8
    row_size = (w * nch + 3) & ~3
    end = offset + row_size * h
    if end > len(payload):
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)
    px = rows[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Encode int16 PCM samples — shape (n,) or (n, n_channels) — as a
    canonical RIFF/WAVE file."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch), got {s.shape}")
    s = s.astype("<i2")
    n_ch = s.shape[1]
    data = s.tobytes()  # interleaved by construction (row-major)
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to ``(samples, sample_rate)`` — samples int16,
    shape (n, n_channels); 8-bit files are widened to int16 around 0
    (the 8-bit WAV convention is unsigned with 128 = silence)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt_chunk = data_chunk = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data_chunk = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data_chunk is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _br, _ba, bits = struct.unpack_from(
        "<HHIIHH", fmt_chunk, 0
    )
    if audio_format != 1:
        raise ValueError(
            f"non-PCM WAV (format {audio_format}) needs a codec library"
        )
    if bits == 16:
        flat = np.frombuffer(
            data_chunk, dtype="<i2",
            count=len(data_chunk) // 2,
        ).astype(np.int16)
    elif bits == 8:
        flat = (
            np.frombuffer(data_chunk, dtype=np.uint8).astype(np.int16)
            - 128
        ) * 256
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n_frames = len(flat) // n_ch
    return flat[: n_frames * n_ch].reshape(n_frames, n_ch), sample_rate
