"""Multimodal plumbing: schemas, batch shapes, deterministic fakes."""

import pytest

from drone_spark.ops.multimodal import (
    audio_features, image_features, make_fake_media, sample_frames,
    _decode_image_real,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, n=30).cache()


def test_image_features_schema_and_determinism(spark, media):
    feats = image_features(media)
    rows = feats.collect()
    assert len(rows) == media.where("kind = 'image'").count()
    assert all(len(r["features"]) == 16 for r in rows)
    again = {r["doc_id"]: r["features"] for r in image_features(media).collect()}
    assert {r["doc_id"]: r["features"] for r in rows} == again


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x00")


def test_audio_features(spark, media):
    rows = audio_features(media).collect()
    assert len(rows) == media.where("kind = 'audio'").count()
    for r in rows:
        assert r["n_windows"] == len(r["features"]) == 1024 // 256
        assert r["sample_rate"] == 16000


def test_frame_sampling_stride(spark, media):
    frames = sample_frames(media, every_nth=4, frame_bytes=64)
    pdf = frames.toPandas()
    n_videos = media.where("kind = 'video'").count()
    # 1024 bytes / 64 = 16 frames, stride 4 -> 4 frames per video
    assert len(pdf) == n_videos * 4
    assert set(pdf["frame_index"]) == {0, 4, 8, 12}
    assert all(len(b) == 64 for b in pdf["frame"])


# --- real in-sandbox codecs: uncompressed BMP + PCM WAV (VERDICT r3 #8) ---

def _encode_bmp(gray) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (test-side twin of
    _decode_image_real): gray is an HxW uint8 array, written bottom-up
    with 4-byte row padding, B=G=R=gray so luma round-trips exactly."""
    import struct

    import numpy as np

    h, w = gray.shape
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = int(gray[y, x])
            row += bytes((v, v, v))  # BGR
        row += b"\x00" * (row_bytes - len(row))
        data += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return bytes(header + dib + data)


def test_bmp_decode_known_pixels():
    import numpy as np

    from drone_spark.ops.multimodal import _pool16

    # w=5 exercises the 4-byte row padding (15 -> 16 bytes per row)
    gray = (np.arange(4 * 5, dtype=np.uint8).reshape(4, 5) * 10)
    img = _decode_image_real(_encode_bmp(gray))
    assert img.shape == (4, 5)
    # bottom-up file order must come back top-down, every pixel exact
    assert np.allclose(img, gray.astype(np.float32) / 255.0, atol=1e-6)
    assert _pool16(img).shape == (16,)


def test_bmp_through_image_features(spark):
    import numpy as np

    from drone_spark.ops.multimodal import MEDIA_SCHEMA, _pool16

    gray = (np.arange(8 * 8, dtype=np.uint8).reshape(8, 8) * 3)
    payload = _encode_bmp(gray)
    meta = {"width": 8, "height": 8, "sample_rate": None,
            "n_frames": None, "codec": "bmp"}
    media = spark.createDataFrame(
        [(1, "image", payload, meta)], schema=MEDIA_SCHEMA
    )
    rows = image_features(media, use_real_codec=True).collect()
    assert len(rows) == 1
    expected = _pool16(gray.astype(np.float32) / 255.0)
    assert np.allclose(rows[0]["features"], expected, atol=1e-6)


def test_bmp_rejects_unsupported_variants():
    import struct

    import numpy as np

    good = bytearray(_encode_bmp(np.zeros((4, 4), dtype=np.uint8)))
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)  # 8bpp palette
    with pytest.raises(NotImplementedError):
        _decode_image_real(bytes(bad))
    with pytest.raises(ValueError):
        _decode_image_real(bytes(good[:60]))  # truncated pixel data


def _encode_wav(samples, rate=8000, sampwidth=2, channels=1) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_wav_through_audio_features(spark):
    import numpy as np

    from drone_spark.ops.multimodal import MEDIA_SCHEMA

    # 512 samples of constant amplitude 2560 -> int8-scale 10.0;
    # windowed RMS over 2 windows of 256 is exactly [10.0, 10.0]
    payload = _encode_wav(np.full(512, 2560, dtype=np.int16), rate=8000)
    meta = {"width": None, "height": None, "sample_rate": 16000,
            "n_frames": None, "codec": "wav"}
    media = spark.createDataFrame(
        [(7, "audio", payload, meta)], schema=MEDIA_SCHEMA
    )
    rows = audio_features(media, use_real_codec=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sample_rate"] == 8000  # header wins over (stale) meta
    assert r["n_windows"] == 2
    assert np.allclose(r["features"], [10.0, 10.0], atol=1e-5)


def test_wav_stereo_mixdown():
    import numpy as np

    from drone_spark.ops.multimodal import _decode_wav_real

    # L=+1024, R=-1024 interleaved -> mono mix is exactly 0
    inter = np.empty(512, dtype=np.int16)
    inter[0::2] = 1024
    inter[1::2] = -1024
    pcm, rate = _decode_wav_real(_encode_wav(inter, rate=44100, channels=2))
    assert rate == 44100
    assert len(pcm) == 256
    assert np.allclose(pcm, 0.0)
