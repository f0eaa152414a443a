"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched mapInPandas stages.

The Spark-side plumbing (schemas, batch iteration, one-to-many frame
expansion, partition-friendly signatures) is real and tested. The decode
seam is three-tier: rich codecs (PIL/ffmpeg/librosa — NOT in this
container) when importable; a built-in REAL decode for the codec-free
formats (binary P6 PPM images, 16-bit PCM WAV audio — golden-tested in
tests/test_codecs.py); NotImplementedError otherwise. ``fake=True``
substitutes a deterministic byte-derived pseudo-decode so the
distributed plumbing is testable on arbitrary payloads. Swapping in a
richer codec changes only decode_image/decode_audio — the Spark plan is
untouched.
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


def _decode_ppm(raw: bytes) -> "np.ndarray | None":
    """Built-in real decode for binary P6 PPM (the codec-free image
    format): header tokens (with # comments) then raw RGB bytes.
    Returns an (h, w, 3) uint8 array, or None if not P6."""
    if not raw.startswith(b"P6"):
        return None
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < len(raw):
        c = raw[i : i + 1]
        if c == b"#":  # comment to end of line
            j = raw.find(b"\n", i)
            i = len(raw) if j < 0 else j + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(raw) and not raw[j : j + 1].isspace():
                j += 1
            tokens.append(int(raw[i:j]))
            i = j
    if len(tokens) < 3 or i >= len(raw):
        raise ValueError("truncated PPM header")
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # single whitespace after maxval
    need = w * h * 3
    body = raw[i : i + need]
    if len(body) < need:
        raise ValueError("truncated PPM body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def decode_image(raw: bytes, fake: bool = False):
    """Image decode seam. Three tiers:
      1. PIL, when installed (not in this container) — any format;
      2. the built-in pure-numpy P6 PPM parser (a REAL decode, no
         external codec needed) — the golden-tested path here;
      3. otherwise NotImplementedError: plugging a richer codec in is a
         one-function change and the golden test gates it.
    The fake path derives deterministic dims/pixels from the bytes so
    the distributed plumbing is testable on arbitrary payloads."""
    if fake:
        h = hashlib.sha256(raw).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        channels = 3
        seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        return width, height, channels, seed
    try:
        import io as _io

        from PIL import Image  # type: ignore[import-not-found]

        img = Image.open(_io.BytesIO(raw)).convert("RGB")
        arr = np.asarray(img)
    except ImportError:
        arr = _decode_ppm(raw)
        if arr is None:
            raise NotImplementedError(
                "no codec for this payload (PIL absent; built-in decode "
                "covers binary P6 PPM only) — plug a real decoder here"
            ) from None
    h, w, channels = arr.shape
    seed = arr.reshape(-1)[:64].astype(np.float32)
    return w, h, channels, seed


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
    """Audio decode seam. The real path decodes 16-bit PCM WAV via the
    stdlib ``wave`` module (a REAL decode, no external codec; channels
    are mean-downmixed to mono) and raises NotImplementedError for
    anything else — swapping in ffmpeg/librosa later is a one-function
    change gated by the golden test. The fake path interprets the
    payload bytes directly as int16 PCM (deterministic,
    length-preserving) so the windowing pipeline is testable on
    arbitrary payloads."""
    if fake:
        usable = len(raw) - (len(raw) % 2)
        return np.frombuffer(raw[:usable], dtype="<i2").astype(np.float64) / 32768.0
    import io as _io
    import wave

    try:
        with wave.open(_io.BytesIO(raw)) as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError("built-in decode covers 16-bit PCM WAV only")
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2").astype(
                np.float64
            ) / 32768.0
            n_ch = w.getnchannels()
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"no codec for this payload (stdlib wave: {e}) — plug a real decoder here"
        ) from None
    if n_ch > 1:
        pcm = pcm[: len(pcm) - len(pcm) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return pcm


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
