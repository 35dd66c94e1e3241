"""Multimodal plumbing: schemas, batch shapes, determinism, stub gating."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.multimodal import (
    audio_features,
    decode_and_featurize_images,
    media_metadata,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
        (1, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (2, b"RIFF" + b"\x00" * 4 + b"WAVE" + b"z" * 64),
        (3, b"\x00\x00\x00\x18ftypmp42" + b"v" * 80),
        (4, None),
        (5, b"arbitrary-bytes"),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary").repartition(3)


def test_media_metadata(media_df):
    out = media_metadata(media_df).toPandas().set_index("media_id").sort_index()
    assert out.loc[0, "mime"] == "image/png"
    assert out.loc[1, "mime"] == "image/jpeg"
    assert out.loc[2, "mime"] == "audio/wav"
    assert out.loc[3, "mime"] == "video/mp4"
    assert out.loc[4, "mime"] is None and out.loc[4, "digest"] is None
    assert out.loc[5, "mime"] == "application/octet-stream"
    assert out.loc[0, "n_bytes"] == 108


def test_image_featurize_deterministic(media_df):
    a = decode_and_featurize_images(media_df, fake=True).toPandas().sort_values("media_id")
    b = (
        decode_and_featurize_images(media_df.repartition(7), fake=True)
        .toPandas()
        .sort_values("media_id")
    )
    assert len(a) == 5  # null row dropped
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert ((a["width"] >= 8) & (a["width"] <= 32)).all()
    assert a["phash64"].nunique() == 5


def test_video_frame_sampling(media_df):
    frames = sample_video_frames(media_df, every_n=5, fake=True).toPandas()
    assert (frames["frame_idx"] % 5 == 0).all()
    assert frames.groupby("media_id").size().min() >= 2
    # composable: featurize the sampled frames downstream
    fdf = sample_video_frames(media_df, every_n=10, fake=True).withColumnRenamed(
        "frame_bytes", "media"
    )
    feats = decode_and_featurize_images(
        fdf.withColumn("media_id", F.monotonically_increasing_id()), fake=True
    )
    assert feats.count() == fdf.count()


def test_audio_features(media_df):
    out = audio_features(media_df, fake=True).toPandas()
    assert len(out) == 5
    assert (out["sample_rate"] == 16000).all()
    assert (out["rms"] > 0).all()


def test_stub_raises_without_codec(media_df):
    with pytest.raises(Exception) as ei:
        decode_and_featurize_images(media_df, fake=False).collect()
    assert "PIL" in str(ei.value) or "NotImplementedError" in str(ei.value)
