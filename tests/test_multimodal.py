from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.fixtures import pages_df
from ocr_spark.operators.multimodal import decode_image, image_features, sample_frames


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", fake=False)


def test_image_features_plumbing(spark):
    pages = pages_df(spark, 60).filter(F.col("html").isNotNull())
    feats = image_features(pages.select("url", F.col("html").alias("payload")))
    rows = feats.collect()
    assert len(rows) == pages.count()
    ok = [r for r in rows if r.error is None]
    assert len(ok) == len(rows)
    assert all(len(r.feature) == 16 for r in ok)
    assert all(64 <= r.width < 256 for r in ok)
    # deterministic across reruns
    again = {r.url: tuple(r.feature) for r in feats.collect()}
    assert {r.url: tuple(r.feature) for r in rows} == again


def test_frame_sample_one_to_many(spark):
    pages = pages_df(spark, 40).filter(F.col("html").isNotNull())
    frames = sample_frames(pages.select("url", F.col("html").alias("payload")))
    per_url = {
        r.url: r.n for r in frames.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    assert per_url and all(1 <= n <= 5 for n in per_url.values())
    idx = frames.filter(F.col("frame_idx") >= 5).count()
    assert idx == 0


def test_audio_windows_plumbing(spark):
    from pyspark.sql import functions as F

    from ocr_spark.fixtures import pages_df
    from ocr_spark.operators.multimodal import AUDIO_WIN, audio_windows

    pages = pages_df(spark, 60).filter(F.col("html").isNotNull())
    out = audio_windows(pages.select("url", F.col("html").alias("payload")))
    rows = out.collect()
    assert rows
    ok = [r for r in rows if r.error is None]
    assert ok, "no successful windows"
    for r in ok[:50]:
        assert 0.0 <= r.rms <= 1.0 and r.rms <= r.peak <= 1.0
    # deterministic across runs
    again = audio_windows(pages.select("url", F.col("html").alias("payload"))).collect()
    assert {(r.url, r.win_idx, r.rms) for r in rows} == {(r.url, r.win_idx, r.rms) for r in again}


def test_audio_decode_is_stubbed():
    import pytest

    from ocr_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 100)
