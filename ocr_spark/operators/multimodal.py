"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched mapInPandas stages.

The Spark-side plumbing (schemas, batch iteration, one-to-many frame
expansion, partition-friendly signatures) is real and tested; the actual
codecs (PIL/ffmpeg/librosa) are NOT in this container, so the decode step
is STUBBED: ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, where a deterministic byte-derived pseudo-decode
stands in. Swapping in a real codec changes only those two functions —
the Spark plan is untouched.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

IMAGE_FEATURES_DDL = (
    "url string, n_bytes long, width int, height int, n_channels int, "
    "feature array<float>, error string"
)
FRAME_SAMPLE_DDL = "url string, frame_idx int, frame_ts_ms long, frame_digest string"

FEATURE_DIM = 16


def decode_image(raw: bytes, fake: bool = False):
    """STUB: real decoding needs an image codec not present in this
    container. The fake path derives deterministic dims/pixels from the
    bytes so the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "or plug a real decoder here"
        )
    h = hashlib.sha256(raw).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return width, height, channels, seed


def _feature_from(seed: np.ndarray) -> np.ndarray:
    reps = int(np.ceil(FEATURE_DIM / len(seed)))
    return np.tile(seed, reps)[:FEATURE_DIM] / 255.0


def image_features(df: DataFrame, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """binary payload -> typed metadata + fixed-dim feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "n_bytes", "width", "height", "n_channels", "feature", "error")}
            for url, raw in zip(pdf["url"], pdf[payload_col]):
                out["url"].append(url)
                out["n_bytes"].append(0 if raw is None else len(raw))
                try:
                    if raw is None:
                        raise ValueError("null payload")
                    w, h, c, seed = decode_image(bytes(raw), fake=fake)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(c)
                    out["feature"].append(_feature_from(seed).tolist())
                    out["error"].append(None)
                except Exception as e:  # noqa: BLE001 — row error, never task failure
                    out["width"].append(0)
                    out["height"].append(0)
                    out["n_channels"].append(0)
                    out["feature"].append(None)
                    out["error"].append(f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(out)

    return df.select("url", payload_col).mapInPandas(run, schema=IMAGE_FEATURES_DDL)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_ms: int = 1000, max_frames: int = 5
) -> DataFrame:
    """Video frame sampling shape: one payload row expands to N frame rows
    (the UDTF/posexplode pattern through mapInPandas). Frame content is
    the deterministic stub; a real implementation replaces the digest
    computation with an actual frame grab."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "frame_ts_ms": [], "frame_digest": []}
            for url, raw in zip(pdf["url"], pdf[payload_col]):
                if raw is None:
                    continue
                b = bytes(raw)
                n = min(max_frames, 1 + len(b) // 4096)
                for k in range(n):
                    rows["url"].append(url)
                    rows["frame_idx"].append(k)
                    rows["frame_ts_ms"].append(k * every_ms)
                    rows["frame_digest"].append(
                        hashlib.sha256(b[k::n][:1024]).hexdigest()[:16]
                    )
            yield pd.DataFrame(rows)

    return df.select("url", payload_col).mapInPandas(run, schema=FRAME_SAMPLE_DDL)


AUDIO_WINDOWS_DDL = (
    "url string, win_idx int, start_ms long, rms double, peak double, error string"
)

AUDIO_SR = 16_000  # pseudo sample rate for the fake decode
AUDIO_WIN = 4_000  # samples per analysis window (250 ms at 16 kHz)


def decode_audio(raw: bytes, fake: bool = False) -> "np.ndarray":
    """STUB: real decoding needs an audio codec not present in this
    container. The fake path interprets the payload bytes directly as
    int16 PCM (deterministic, length-preserving) so the windowing
    pipeline is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "audio codec not available in this environment; pass fake=True "
            "or plug a real decoder here"
        )
    usable = len(raw) - (len(raw) % 2)
    return np.frombuffer(raw[:usable], dtype="<i2").astype(np.float64) / 32768.0


def audio_windows(df: DataFrame, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """binary payload -> one row per fixed-size analysis window with RMS
    and peak level (numpy-vectorized inside the Arrow batch loop; the
    one-to-many expansion shape of any frame/window featurizer). Errors
    are row-level, never task failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "win_idx", "start_ms", "rms", "peak", "error")}
            for url, raw in zip(pdf["url"], pdf[payload_col]):
                try:
                    pcm = decode_audio(bytes(raw), fake=fake)
                    n_win = len(pcm) // AUDIO_WIN
                    if n_win == 0:
                        raise ValueError("payload shorter than one window")
                    w = pcm[: n_win * AUDIO_WIN].reshape(n_win, AUDIO_WIN)
                    rms = np.sqrt((w * w).mean(axis=1))
                    peak = np.abs(w).max(axis=1)
                    for i in range(n_win):
                        out["url"].append(url)
                        out["win_idx"].append(i)
                        out["start_ms"].append(int(i * AUDIO_WIN * 1000 / AUDIO_SR))
                        out["rms"].append(round(float(rms[i]), 8))
                        out["peak"].append(round(float(peak[i]), 8))
                        out["error"].append(None)
                except Exception as e:  # noqa: BLE001
                    out["url"].append(url)
                    out["win_idx"].append(-1)
                    out["start_ms"].append(0)
                    out["rms"].append(0.0)
                    out["peak"].append(0.0)
                    out["error"].append(f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=AUDIO_WINDOWS_DDL)
