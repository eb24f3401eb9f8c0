"""Audio modality: WAV (RIFF PCM) payloads as opaque ``binary`` + typed metadata.

Same design rules as the image path (``multimodal/binary.py``): payload bytes ride
their own Parquet column so metadata queries never touch them; decode runs as an
Arrow-batched ``mapInPandas`` (one Python round-trip per batch, never per row);
the codec itself is pure stdlib ``struct`` + numpy — 16-bit PCM WAV is an
uncompressed interchange format that needs no audio library, so the
decode → feature-extract → resample path runs end to end on REAL samples.
Non-WAV payloads fall back to a deterministic, clearly-marked stub (mirroring
``decode_image_stub``); a real deployment swaps in e.g. soundfile/librosa behind
``decode_audio`` with the Spark plumbing unchanged.

Reference parity: the reference stores binary attachments as opaque columns and
defers media handling to consumers (Binary resources ride through unparsed);
this module gives the same opaque-payload contract a real processing path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WAV_MAGIC = b"RIFF"
WAV_MEDIA_TYPE = "audio/wav"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit PCM WAV encode — pure struct/numpy. ``samples`` is int16 shaped
    ``(n,)`` (mono) or ``(n, ch)`` (interleaved on write, per the RIFF spec)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) samples, got shape {s.shape}")
    n, ch = s.shape
    data = np.ascontiguousarray(s.astype("<i2")).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV decode to ``((n, ch) int16 array, sample_rate)``. Walks
    the RIFF chunk list (chunks pad to even length per the spec, and unknown
    chunks — LIST/INFO/fact — are skipped, not errors); raises ValueError on
    compressed / non-16-bit payloads rather than mis-decoding them."""
    if payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM WAV supported (fmt={audio_fmt}, bits={bits})")
    arr = np.frombuffer(data, dtype="<i2")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Real-sample decode when a codec applies (16-bit PCM WAV); None when no
    real codec is available — the caller falls back to the marked stub."""
    if payload[:4] == WAV_MAGIC:
        return decode_wav(payload)
    return None


def decode_audio_stub(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decoder — deterministic fake for codec-less formats (mp3/ogg/flac
    in this container). Returns (sample_rate, n_samples, n_channels, features)
    derived from the payload bytes so tests stay deterministic; a real
    deployment replaces this with a library decode, plumbing unchanged."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0xFFFFFFFF
    rate = 8000 * (1 + h % 6)
    n = 256 + (h >> 4) % 4096
    ch = 1 + (h >> 16) % 2
    feats = [((h >> (i * 3)) & 0xFF) / 255.0 for i in range(4)]
    return rate, n, ch, feats


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _audio_features(arr: np.ndarray) -> list[float]:
    """Real decoded-sample features, all scaled to [-1, 1] against int16 full
    scale: mean, RMS, peak, zero-crossing rate — 4 floats, same shape as the
    stub's output."""
    x = arr.astype(np.float64) / 32768.0
    flat = x.reshape(-1)
    mean = flat.mean() if flat.size else 0.0
    rms = float(np.sqrt(np.mean(flat * flat))) if flat.size else 0.0
    peak = float(np.abs(flat).max()) if flat.size else 0.0
    # crossings counted per channel along time, pooled
    signs = np.signbit(x)
    zcr = float((signs[1:] != signs[:-1]).mean()) if x.shape[0] > 1 else 0.0
    return [float(np.float32(v)) for v in (mean, rms, peak, zcr)]


def extract_audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched audio decode/feature-extract over ``mapInPandas`` — the
    audio analog of ``extract_features``. WAV payloads take the REAL sample
    path (true rate/shape, exact mean/RMS/peak/ZCR); codec-less formats take
    the deterministic stub."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, ns, chs, feats = [], [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                decoded = decode_audio(raw) if raw else None
                if decoded is not None:
                    arr, rate = decoded
                    rates.append(rate)
                    ns.append(arr.shape[0])
                    chs.append(arr.shape[1])
                    feats.append(_audio_features(arr))
                else:
                    rate, n, ch, f = decode_audio_stub(raw)
                    rates.append(rate)
                    ns.append(n)
                    chs.append(ch)
                    feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rates,
                    "n_samples": ns,
                    "n_channels": chs,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_decode, AUDIO_FEATURE_SCHEMA)


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _resample_linear(arr: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample per channel (the library-free path; a real
    deployment swaps in a windowed-sinc resampler here). Endpoint-anchored:
    output spans the same duration, first/last samples preserved."""
    n = arr.shape[0]
    if n == 0 or src_rate == dst_rate:
        return arr.copy()
    m = max(int(round(n * dst_rate / src_rate)), 1)
    src_pos = np.linspace(0.0, n - 1, m)
    lo = np.floor(src_pos).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = (src_pos - lo)[:, None]
    out = arr[lo] * (1.0 - frac) + arr[hi] * frac
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


def resample_audio(
    df: DataFrame, target_rate: int, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched resample over ``mapInPandas`` — the audio analog of
    ``resize_images``. WAV payloads take the REAL path: decode → per-channel
    linear interpolation → re-encode as WAV at ``target_rate`` (output is a
    valid payload of actual resampled audio). Codec-less payloads pass through
    unchanged with a NULL n_samples, never silently fabricated."""

    def _one(payload: bytes) -> tuple[int | None, bytes]:
        decoded = decode_audio(payload)
        if decoded is None:
            return None, payload
        arr, rate = decoded
        out = _resample_linear(arr.astype(np.float64), rate, target_rate)
        return out.shape[0], encode_wav(out, target_rate)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, payloads = [], []
            for payload in pdf[payload_col]:
                n, p = _one(bytes(payload)) if payload is not None else (None, None)
                ns.append(n)
                payloads.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": target_rate,
                    "n_samples": pd.array(ns, dtype="Int32"),
                    "payload": payloads,
                }
            )

    return df.mapInPandas(_batches, RESAMPLED_SCHEMA)
