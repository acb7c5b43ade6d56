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
