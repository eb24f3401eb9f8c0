"""Video modality: YUV4MPEG2 (.y4m) payloads — REAL frame decode, pure numpy.

Y4M is the uncompressed interchange format (mjpegtools/ffmpeg's raw pipe
format): one ASCII header line ``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C420jpeg``
followed by ``FRAME``-delimited planar YUV 4:2:0 frames. Like PPM/BMP/WAV it
needs no media library, so the video path — probe → sample-every-Nth-frame →
per-frame decode/features — runs end to end on actual pixel data in this
container, not a stub.

Scale shape: ``sample_video_frames`` crosses each payload into Python ONCE per
batch and emits one row per sampled frame from inside the kernel (mapInPandas
output is not 1:1 with input), instead of exploding frame indexes first and
shipping the payload once per frame. ``frame_sample_plan``
(multimodal/binary.py) remains the columnar plan-side variant for sources
where frames are already individually addressable.

Color math is full-range BT.601 (the ``C420jpeg`` chroma siting Y4M declares):
for gray frames (R=G=B) the RGB→YUV420→RGB round trip is EXACT — Y carries the
gray value, U=V=128, and the 2x2 chroma subsample of a constant plane is
lossless — which is what makes a plain-arithmetic DuckDB oracle possible for
the driver-contract query.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

Y4M_MAGIC = b"YUV4MPEG2 "
Y4M_MEDIA_TYPE = "video/x-yuv4mpeg"


def _rgb_to_yuv420(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-range BT.601 RGB → planar YUV 4:2:0 (2x2 mean chroma subsample)."""
    if frame.ndim != 3 or frame.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB frame, got shape {frame.shape}")
    h, w = frame.shape[:2]
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dimensions, got {w}x{h}")
    x = frame.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def sub(p: np.ndarray) -> np.ndarray:
        return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)
    return clip(y), clip(sub(u)), clip(sub(v))


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Planar YUV 4:2:0 → RGB (nearest chroma upsample, full-range BT.601)."""
    yf = y.astype(np.float64)
    uf = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1).astype(np.float64) - 128.0
    vf = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """Y4M encode of a list of (h, w, 3) uint8 RGB frames — pure numpy/bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    parts = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n" % (w, h, fps[0], fps[1])]
    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        y, u, v = _rgb_to_yuv420(frame)
        parts.append(b"FRAME\n")
        parts.extend((y.tobytes(), u.tobytes(), v.tobytes()))
    return b"".join(parts)


def _parse_y4m_header(payload: bytes) -> tuple[int, int, tuple[int, int], int]:
    """(width, height, fps, header_end_offset) from the stream header line."""
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    for tok in payload[len(Y4M_MAGIC) : nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = (int(num), int(den))
        elif tok[:1] == b"C" and not tok[1:].startswith(b"420"):
            raise ValueError(f"only 4:2:0 chroma supported, got {tok!r}")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    return w, h, fps, nl + 1


def probe_y4m(payload: bytes) -> tuple[int, int, int, tuple[int, int]]:
    """(width, height, n_frames, fps) WITHOUT converting any pixels — walks
    frame headers by size arithmetic (each 4:2:0 frame body is w*h*3/2 bytes);
    tolerates per-frame parameters after ``FRAME`` per the spec."""
    w, h, fps, pos = _parse_y4m_header(payload)
    frame_bytes = (w * h * 3) // 2
    n = 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        pos = payload.index(b"\n", pos) + 1 + frame_bytes
        n += 1
    if pos != len(payload):
        raise ValueError("truncated final frame")
    return w, h, n, fps


def decode_y4m_frames(
    payload: bytes, indexes: list[int] | None = None
) -> list[tuple[int, np.ndarray]]:
    """Decode the given frame indexes (all frames when None) to RGB arrays,
    returned as (frame_idx, (h, w, 3) uint8) pairs. Only requested frames are
    converted; skipped frames cost pointer arithmetic, not pixel math."""
    w, h, _, pos = _parse_y4m_header(payload)
    frame_bytes = (w * h * 3) // 2
    ysz, csz = w * h, (w // 2) * (h // 2)
    want = None if indexes is None else set(indexes)
    out: list[tuple[int, np.ndarray]] = []
    idx = 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        body = payload.index(b"\n", pos) + 1
        if want is None or idx in want:
            y = np.frombuffer(payload, np.uint8, ysz, body).reshape(h, w)
            u = np.frombuffer(payload, np.uint8, csz, body + ysz).reshape(h // 2, w // 2)
            v = np.frombuffer(payload, np.uint8, csz, body + ysz + csz).reshape(
                h // 2, w // 2
            )
            out.append((idx, _yuv420_to_rgb(y, u, v)))
        pos = body + frame_bytes
        idx += 1
    return out


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_video_frames(
    df: DataFrame, every_n: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched every-Nth-frame sampling over ``mapInPandas``: each Y4M
    payload is probed once, the sampled frames decode to real RGB pixels, and
    one output row per sampled frame carries per-channel means (scaled [0,1])
    as the feature — the video analog of ``extract_features``. Each payload
    crosses the Arrow boundary exactly once regardless of frame count."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, ns, feats = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                w, h, n, _ = probe_y4m(raw)
                wanted = list(range(0, n, every_n))
                for idx, rgb in decode_y4m_frames(raw, wanted):
                    means = rgb.astype(np.float64).mean(axis=(0, 1)) / 255.0
                    ids.append(doc_id)
                    idxs.append(idx)
                    ws.append(w)
                    hs.append(h)
                    ns.append(n)
                    feats.append([float(np.float32(m)) for m in means])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "n_frames": ns,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_decode, VIDEO_FRAME_SCHEMA)
