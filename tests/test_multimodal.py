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


def test_real_ppm_decode(spark):
    """P6 PPM decodes NATIVELY (numpy parse, no codec dependency) — real
    pixel values, not the deterministic stand-in."""
    import numpy as np

    w, h = 4, 2
    pixels = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    ppm = b"P6\n# a comment\n4 2\n255\n" + pixels.tobytes()
    df = spark.createDataFrame([(0, ppm)], "media_id long, media binary")
    out = decode_and_featurize_images(df, fake=False).toPandas()
    assert out.loc[0, "width"] == 4 and out.loc[0, "height"] == 2
    assert out.loc[0, "mean_pixel"] == pytest.approx(float(pixels.mean()))


def test_real_wav_decode(spark):
    """RIFF/WAVE PCM16 decodes natively: struct chunk walk + frombuffer."""
    import struct

    import numpy as np

    sr, samples = 8000, (np.sin(np.linspace(0, 20, 1600)) * 20000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(0, wav)], "media_id long, media binary")
    out = audio_features(df, fake=False).toPandas()
    assert out.loc[0, "sample_rate"] == sr
    assert out.loc[0, "n_samples"] == 1600
    expected_rms = float(np.sqrt(np.mean((samples.astype(np.float32) / 32768.0) ** 2)))
    assert out.loc[0, "rms"] == pytest.approx(expected_rms, rel=1e-5)


def test_resize_ppm_roundtrip(spark):
    """resize_images is REAL for PPM: decode -> nearest-neighbor resample
    -> PPM re-encode; the output decodes again to the requested dims."""
    import numpy as np

    from chronon_spark.operators.multimodal import _decode_ppm, resize_images

    w, h = 8, 6
    pixels = (np.arange(w * h * 3, dtype=np.uint32) % 256).astype(np.uint8).reshape(h, w, 3)
    ppm = b"P6\n8 6\n255\n" + pixels.tobytes()
    df = spark.createDataFrame([(0, ppm)], "media_id long, media binary")
    out = resize_images(df, width=4, height=3, fake=False).toPandas()
    resized = _decode_ppm(bytes(out.loc[0, "media"]))
    assert resized.shape == (3, 4, 3)
    # nearest-neighbor: corner pixels survive exactly
    assert (resized[0, 0] == pixels[0, 0]).all()
    assert (resized[-1, -1] == pixels[-1, -1]).all()
