"""Golden tests for the REAL (non-fake) decode tiers of the multimodal
seam: built-in P6 PPM and 16-bit PCM WAV, plus the PIL tier when PIL is
installed. These are the ready gates for plugging richer codecs in — a
replacement decoder must keep them green."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from ocr_spark.operators.multimodal import (
    AUDIO_SR,
    AUDIO_WIN,
    audio_windows,
    decode_audio,
    decode_image,
    image_features,
)


def make_ppm(w: int, h: int) -> bytes:
    body = bytes((x * 7 + y * 13 + c * 29) % 256 for y in range(h) for x in range(w) for c in range(3))
    return b"P6\n# golden fixture\n%d %d\n255\n" % (w, h) + body


def make_wav(amplitude: float, n_samples: int, freq_hz: float = 440.0) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(AUDIO_SR)
        frames = b"".join(
            struct.pack(
                "<h",
                int(amplitude * 32767 * math.sin(2 * math.pi * freq_hz * i / AUDIO_SR)),
            )
            for i in range(n_samples)
        )
        wv.writeframes(frames)
    return buf.getvalue()


def test_decode_ppm_golden():
    raw = make_ppm(5, 3)
    w, h, c, seed = decode_image(raw, fake=False)
    assert (w, h, c) == (5, 3, 3)
    # pixel (x=1, y=0, c=2): 1*7 + 0*13 + 2*29 = 65, flattened index 5
    assert seed[5] == 65.0


def test_decode_ppm_truncated_raises():
    with pytest.raises(ValueError):
        decode_image(b"P6\n5 3\n255\n\x00\x00", fake=False)


def test_decode_wav_golden_rms():
    amp = 0.5
    pcm = decode_audio(make_wav(amp, AUDIO_SR), fake=False)
    assert len(pcm) == AUDIO_SR
    # a full second of sine: RMS = A/sqrt(2) within quantization error
    assert abs(float(np.sqrt((pcm * pcm).mean())) - amp / math.sqrt(2)) < 1e-3


def test_decode_wav_stereo_downmix():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(AUDIO_SR)
        # L = 1000, R = -1000 -> mono mean 0
        wv.writeframes(struct.pack("<hh", 1000, -1000) * 64)
    pcm = decode_audio(buf.getvalue(), fake=False)
    assert len(pcm) == 64 and np.allclose(pcm, 0.0)


def test_non_wav_payload_raises():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 100, fake=False)


def test_image_features_real_codec_spark(spark):
    rows = [(f"ppm://{i}", make_ppm(8 + i, 6)) for i in range(10)]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = image_features(df, fake=False).collect()
    assert len(out) == 10
    assert all(r.error is None for r in out)
    got = {r.url: (r.width, r.height) for r in out}
    assert got == {f"ppm://{i}": (8 + i, 6) for i in range(10)}


def test_audio_windows_real_codec_spark(spark):
    # two windows' worth of 0.25-amplitude sine, one row per window
    payload = make_wav(0.25, 2 * AUDIO_WIN)
    df = spark.createDataFrame([("wav://0", payload)], "url string, payload binary")
    rows = audio_windows(df, fake=False).collect()
    assert [r.win_idx for r in sorted(rows, key=lambda r: r.win_idx)] == [0, 1]
    for r in rows:
        assert r.error is None
        assert abs(r.rms - 0.25 / math.sqrt(2)) < 2e-3


def test_pil_tier_when_available():
    pil = pytest.importorskip("PIL.Image")
    img = pil.new("RGB", (11, 7), (1, 2, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, c, _seed = decode_image(buf.getvalue(), fake=False)
    assert (w, h, c) == (11, 7, 3)
