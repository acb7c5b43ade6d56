"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side contract is fully real and tested: typed schemas,
Arrow-batched ``mapInPandas`` kernels with bounded batch shapes,
partition sizing by payload bytes. Only the codec innards are stubbed
(`NotImplementedError` or a deterministic fake) because this container
ships no image/audio libraries — swap ``_decode_image_real`` for a
Pillow/torchvision call on a real cluster and nothing else changes.

Schema convention for a multimodal corpus table::

    media(doc_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      n_frames:int, codec:string>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

IMAGE_FEATURES_SCHEMA = "doc_id long, width int, height int, features array<float>"
AUDIO_FEATURES_SCHEMA = "doc_id long, sample_rate int, n_windows int, features array<float>"
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_index int, frame binary"


def _decode_image_real(payload: bytes) -> "np.ndarray":
    raise NotImplementedError(
        "real image decode requires Pillow/libjpeg — not installed in this "
        "container; deterministic fake used instead (see decode_image)"
    )


def _decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: payload bytes -> pseudo 8x8 grayscale."""
    h = np.frombuffer(
        __import__("hashlib").sha256(payload).digest(), dtype=np.uint8
    )
    return np.tile(h, 2)[:64].reshape(8, 8).astype(np.float32) / 255.0


def image_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode + feature-extract images: mean-pooled 16-dim descriptor.

    Batch shape: one Arrow batch in, one pandas frame out; payload bytes
    never cross as Python objects row-by-row on the Spark side."""

    decode = _decode_image_real if use_real_codec else _decode_image_fake

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, meta in zip(
                batch["doc_id"], batch["payload"], batch["meta"]
            ):
                img = decode(bytes(payload))
                pooled = img.reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()
                rows.append(
                    (
                        doc_id,
                        int(meta["width"] or img.shape[1]),
                        int(meta["height"] or img.shape[0]),
                        pooled.astype(np.float32).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "features"]
            )

    return (
        media.where(F.col("kind") == "image")
        .select("doc_id", "payload", "meta")
        .mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Windowed RMS energy over a fake PCM decode (payload bytes as
    int8 samples) — real codec swaps in the same way as images."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, meta in zip(
                batch["doc_id"], batch["payload"], batch["meta"]
            ):
                pcm = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float32)
                win = 256
                n = len(pcm) // win
                if n == 0:
                    rows.append((doc_id, int(meta["sample_rate"] or 0), 0, []))
                    continue
                rms = np.sqrt((pcm[: n * win].reshape(n, win) ** 2).mean(axis=1))
                rows.append(
                    (doc_id, int(meta["sample_rate"] or 0), n, rms.tolist())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_windows", "features"]
            )

    return (
        media.where(F.col("kind") == "audio")
        .select("doc_id", "payload", "meta")
        .mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_nth: int = 10, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for video payloads: deterministic fixed-stride
    slicing of the payload (stand-in for keyframe extraction); output is
    exploded to one row per sampled frame so downstream image kernels
    reuse the same batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: list[tuple] = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_bytes, 0)
                for fi in range(0, n_frames, every_nth):
                    out.append(
                        (doc_id, fi, raw[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_index", "frame"])

    return (
        media.where(F.col("kind") == "video")
        .select("doc_id", "payload")
        .mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)
    )


def make_fake_media(spark, n: int = 30, seed: int = 5) -> DataFrame:
    """Deterministic fixture media table (tests only)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 1024, dtype=np.uint8).tolist())
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "width": 8,
                    "height": 8,
                    "sample_rate": 16000,
                    "n_frames": 16,
                    "codec": "fake",
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
