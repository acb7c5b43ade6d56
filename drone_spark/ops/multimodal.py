"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side contract is fully real and tested: typed schemas,
Arrow-batched ``mapInPandas`` kernels with bounded batch shapes,
partition sizing by payload bytes. Two real codecs that need no
external libraries ARE wired end-to-end — uncompressed 24-bit BMP
(pure struct/numpy) and PCM WAV (stdlib ``wave``) — demonstrating the
"swap the codec, nothing else changes" seam inside this sandbox;
compressed formats (JPEG/PNG/MP3/...) still raise
`NotImplementedError` (or use the deterministic fake) because the
container ships no image/audio libraries — swap in Pillow/torchaudio
on a real cluster and nothing else changes.

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
    """Real image decode for formats that need no external codec:
    uncompressed 24-bit BMP (BITMAPINFOHEADER), parsed with struct +
    numpy. Returns float32 grayscale (Rec.601 luma) in [0, 1], rows
    top-down. Every other format raises — swap in Pillow here on a
    real cluster and the whole pipeline above is unchanged."""
    import struct

    if len(payload) < 2 or payload[:2] != b"BM":
        raise NotImplementedError(
            "real image decode beyond uncompressed BMP requires "
            "Pillow/libjpeg — not installed in this container; "
            "deterministic fake used instead (see image_features)"
        )
    if len(payload) < 54:
        raise ValueError("truncated BMP: missing BITMAPINFOHEADER")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP variant not supported without Pillow: header={hdr_size} "
            f"bpp={bpp} compression={compression} (only 24-bit "
            "uncompressed BITMAPINFOHEADER is decoded natively)"
        )
    bottom_up = height > 0
    h, w = abs(height), width
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row_bytes * h
    if w <= 0 or h == 0 or len(payload) < need:
        raise ValueError(
            f"truncated BMP: {len(payload)} bytes, need {need} for {w}x{h}"
        )
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                        offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    bgr = rows.astype(np.float32)
    luma = 0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1] + 0.299 * bgr[:, :, 2]
    return (luma / 255.0).astype(np.float32)


def _decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: payload bytes -> pseudo 8x8 grayscale."""
    h = np.frombuffer(
        __import__("hashlib").sha256(payload).digest(), dtype=np.uint8
    )
    return np.tile(h, 2)[:64].reshape(8, 8).astype(np.float32) / 255.0


def _pool16(img: np.ndarray) -> np.ndarray:
    """Mean-pool an HxW grayscale image onto a 4x4 grid (16-dim
    descriptor) for arbitrary H, W >= 4 — equals the old fixed
    ``reshape(4,2,4,2).mean(axis=(1,3))`` when H == W == 8."""
    h, w = img.shape
    if h < 4 or w < 4:
        raise ValueError(f"image too small to pool to 4x4: {h}x{w}")
    rb = np.linspace(0, h, 5).astype(np.int64)
    cb = np.linspace(0, w, 5).astype(np.int64)
    out = np.empty((4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            out[i, j] = img[rb[i]: rb[i + 1], cb[j]: cb[j + 1]].mean()
    return out.ravel()


def _decode_wav_real(payload: bytes) -> tuple[np.ndarray, int]:
    """Real PCM WAV decode with the stdlib ``wave`` module: returns
    (mono float32 samples scaled to int8 range, sample_rate). Channels
    mix by mean; 16/32-bit samples scale down to the same [-128, 127]
    amplitude range the fake int8 path uses, so RMS features are
    comparable across codecs."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        sw = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if sw == 1:  # unsigned 8-bit PCM, offset-binary
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 256.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 16777216.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x.astype(np.float32), rate


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
                pooled = _pool16(img)
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


def audio_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Windowed RMS energy. Default codec treats payload bytes as raw
    int8 PCM (the deterministic fake); ``use_real_codec=True`` parses
    PCM WAV containers with the stdlib ``wave`` module (sample_rate
    then comes from the file header, overriding meta) — the same
    swap-the-codec seam as images, exercised for real in-sandbox."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, meta in zip(
                batch["doc_id"], batch["payload"], batch["meta"]
            ):
                if use_real_codec:
                    pcm, rate = _decode_wav_real(bytes(payload))
                else:
                    pcm = np.frombuffer(bytes(payload), dtype=np.int8).astype(
                        np.float32
                    )
                    rate = int(meta["sample_rate"] or 0)
                win = 256
                n = len(pcm) // win
                if n == 0:
                    rows.append((doc_id, rate, 0, []))
                    continue
                rms = np.sqrt((pcm[: n * win].reshape(n, win) ** 2).mean(axis=1))
                rows.append((doc_id, rate, n, rms.tolist()))
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
