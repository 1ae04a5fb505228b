"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images / audio / video ride through the engine as ``binary`` columns plus
a metadata struct (modality, byte size, declared dims/duration).  The
Spark-side plumbing — schema, partition-friendly batch shapes, Arrow
``mapInPandas`` feature extraction — is real and tested.

Decoding: UNCOMPRESSED containers decode for real in-sandbox through the
pure-NumPy codecs in tsaug_spark/codec/media.py (BMP 24/32-bit BI_RGB;
WAV PCM 8/16-bit) — ``decode_image`` / ``decode_audio`` dispatch on the
container magic and raise only for compressed formats (JPEG/PNG/MP3/...),
which genuinely need an external library; production deployments plug
PIL / torchaudio / ffmpeg into the same slots.  ``attach_real_media``
synthesizes deterministic BMP+WAV payloads per doc id and
``media_decode_stats`` decodes them back and emits exact integer
statistics — position- and channel-weighted so any row-order (bottom-up
BMP), channel-order (BGR/RGB) or endianness (WAV int16) bug changes the
answer — giving the decode path a full SQL oracle.  ``fake_features``
remains the deterministic stand-in for opaque payloads of ANY format.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize binary payloads + metadata from text (sandbox source).

    In production the payload column comes straight from the lakehouse
    (e.g. an Iceberg table of media blobs); everything downstream only
    sees (payload: binary, meta: struct).
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image/fake").alias("modality"),
        F.length(payload).alias("n_bytes"),
        (F.length(payload) % 64 + 16).alias("width"),
        (F.length(payload) % 48 + 16).alias("height"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    Real in-sandbox for uncompressed BMP (pure-NumPy codec); compressed
    formats raise — production plugs PIL/torchvision into this slot.
    """
    from tsaug_spark.codec.media import decode_bmp

    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "only uncompressed BMP decodes without an imaging library; "
        f"payload magic {payload[:4]!r} needs PIL/torchvision"
    )


def decode_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode an audio payload to ``(int16 samples (n, ch), rate)``.

    Real in-sandbox for PCM WAV (pure-NumPy codec); compressed formats
    raise — production plugs torchaudio/ffmpeg into this slot.
    """
    from tsaug_spark.codec.media import decode_wav

    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only PCM WAV decodes without an audio library; "
        f"payload magic {payload[:4]!r} needs torchaudio/ffmpeg"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: sha256-seeded floats."""
    digest = hashlib.sha256(payload).digest()
    ints = np.frombuffer(digest[: dim * 4], dtype=np.uint32)
    return (ints / np.float64(2 ** 32)).astype(np.float64)


def real_features(payload: bytes) -> np.ndarray:
    """Real pixel features from a decoded image: (w, h, per-channel
    means, per-channel stds) — FEATURE_DIM floats."""
    img = decode_image(payload).astype(np.float64)
    h, w = img.shape[:2]
    return np.concatenate(
        [[float(w), float(h)], img.mean(axis=(0, 1)),
         img.std(axis=(0, 1))]
    )


def extract_features(
    df: DataFrame, use_real_decoder: bool = False
) -> DataFrame:
    """Batch feature extraction over payloads via Arrow ``mapInPandas``.

    The iterator-of-batches shape is the production contract: a real
    decoder amortizes model/codec setup once per partition, then
    processes each Arrow batch vectorized.
    """
    schema = "doc_id long, feature array<double>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition setup happens here (codec init, model load)
        extractor = real_features if use_real_decoder else fake_features
        for pdf in batches:
            feats = [
                extractor(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema)


def payload_stats(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Byte accounting per group — the multimodal sizing rollup."""
    return df.groupBy(group_col).agg(
        F.sum(F.length("payload")).alias("payload_bytes"),
        F.count(F.lit(1)).alias("n_assets"),
    )


def resize_payload(
    df: DataFrame, width: int, height: int, use_real_decoder: bool = False
) -> DataFrame:
    """Resize plumbing: payload -> fixed-(width x height) payload.

    Production: decode -> interpolate -> re-encode inside the same
    Arrow batch loop.  Sandbox stand-in: deterministic byte resampling
    at evenly spaced offsets (same output size law as a real resize, so
    schema, batch shape and downstream sizing behave identically).
    """
    out_bytes = width * height
    schema = (
        "doc_id long, payload binary, width int, height int, "
        "n_bytes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_decoder:
            decode_image(b"")  # raises: no codec in this container
        for pdf in batches:
            resized = []
            for p in pdf["payload"]:
                raw = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(raw) == 0:
                    resized.append(bytes(out_bytes))
                    continue
                idx = np.linspace(
                    0, len(raw) - 1, out_bytes
                ).round().astype(np.int64)
                resized.append(raw[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "n_bytes": np.int64(out_bytes),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema)


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: treat each payload as a frame sequence
    and keep every ``every_n``-th frame.

    Production: ffmpeg keyframe extraction per Arrow batch.  Sandbox
    stand-in: fixed-size byte windows as pseudo-frames — the fan-out
    row shape (one row per sampled frame, frame_idx ordinal) matches
    what a real video sampler emits.
    """
    schema = "doc_id long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                n_frames = max(1, len(raw) // frame_bytes)
                for k in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(
                        raw[k * frame_bytes:(k + 1) * frame_bytes]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "frame": frames,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema)


def attach_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads per doc id: a 24-bit BMP and a
    16-bit PCM WAV, synthesized through the actual encoders
    (codec/media.py) inside ``mapInPandas``.

    The generation laws are pure integer functions of the id so a SQL
    oracle can replay the DECODED content exactly:

    * image: ``w = 8 + id % 9``, ``h = 8 + id % 7``,
      ``pixel(r, c, ch) = (id + 3r + 7c + 11ch) % 256`` (RGB order);
    * audio: ``n = 64 + id % 64`` mono samples,
      ``x[i] = ((31 id + 17 i) % 65536) - 32768``.
    """
    schema = f"{id_col} long, image binary, audio binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tsaug_spark.codec.media import encode_bmp, encode_wav

        for pdf in batches:
            imgs, wavs = [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 9, 8 + d % 7
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                img = ((d + 3 * r + 7 * c + 11 * ch) % 256).astype(
                    np.uint8
                )
                imgs.append(encode_bmp(img))
                i = np.arange(64 + d % 64, dtype=np.int64)
                x = ((31 * d + 17 * i) % 65536 - 32768).astype(np.int16)
                wavs.append(encode_wav(x, 16000))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "image": imgs,
                    "audio": wavs,
                }
            )

    return df.select(id_col).mapInPandas(run, schema)


def media_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode BMP + WAV payloads through the REAL codecs and emit exact
    integer statistics.  The position-weighted pixel sum (``px_possum``,
    weight ``r*w + c``), channel-weighted sum (``px_chsum``) and
    index-weighted sample sum (``s_wsum``) are deliberately
    order-sensitive: a bottom-up-row, BGR-channel, byte-padding or
    endianness bug in the codec changes them, so the SQL oracle checks
    the decode path itself, not just byte plumbing.
    """
    schema = (
        f"{id_col} long, width int, height int, px_sum long, "
        "px_possum long, px_chsum long, n_samples long, s_sum long, "
        "s_wsum long, s_min long, s_max long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tsaug_spark.codec.media import decode_bmp, decode_wav

        for pdf in batches:
            rows = []
            for d, ib, ab in zip(
                pdf[id_col], pdf["image"], pdf["audio"]
            ):
                img = decode_bmp(bytes(ib)).astype(np.int64)
                h, w = img.shape[:2]
                pos = (
                    np.arange(h)[:, None] * w + np.arange(w)[None, :]
                )[:, :, None]
                chw = np.arange(3)[None, None, :]
                x, _rate = decode_wav(bytes(ab))
                x = x[:, 0].astype(np.int64)
                i = np.arange(len(x), dtype=np.int64)
                rows.append(
                    (
                        int(d), w, h, int(img.sum()),
                        int((img * pos).sum()), int((img * chw).sum()),
                        len(x), int(x.sum()), int((i * x).sum()),
                        int(x.min()), int(x.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "px_sum", "px_possum",
                    "px_chsum", "n_samples", "s_sum", "s_wsum",
                    "s_min", "s_max",
                ],
            )

    return df.mapInPandas(run, schema)


def exact_media_dedup(df: DataFrame) -> DataFrame:
    """Content-hash media dedup: sha256 over the opaque payload bytes
    — the first-line dedup every media pipeline runs before any
    perceptual/embedding pass (identical files collapse regardless of
    filename or metadata).

    One narrow projection + one hash aggregate keyed by the 32-byte
    digest — the same single-shuffle scale shape as the text
    ``exact_dedup``; the min-id survivor matches the corpus-curation
    survivorship convention.

    Output: fp (hex), n_copies, survivor_id, total_bytes.
    """
    return (
        df.select(
            "doc_id",
            F.sha2(F.col("payload"), 256).alias("fp"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("survivor_id"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
