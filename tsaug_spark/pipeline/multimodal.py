"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images / audio / video ride through the engine as ``binary`` columns plus
a metadata struct (modality, byte size, declared dims/duration).  The
Spark-side plumbing — schema, partition-friendly batch shapes, Arrow
``mapInPandas`` feature extraction — is real and tested; the actual media
*decoding* is stubbed (``NotImplementedError``) because no image/audio
libraries exist in this container.  ``fake_features`` is the
deterministic stand-in that preserves the exact UDF signature and batch
shape a real decoder would use, so swapping in PIL/torchaudio later is a
one-function change.
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
    """Real decoder slot — requires an imaging library.

    STUB: this container ships no image/audio codecs; production
    deployments plug PIL / torchvision / ffmpeg here.
    """
    raise NotImplementedError(
        "media decoding requires an imaging library not present in this "
        "environment; use fake_features() for plumbing tests"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: sha256-seeded floats."""
    digest = hashlib.sha256(payload).digest()
    ints = np.frombuffer(digest[: dim * 4], dtype=np.uint32)
    return (ints / np.float64(2 ** 32)).astype(np.float64)


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
        extractor = decode_image if use_real_decoder else fake_features
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
