"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow batch shape
through ``mapInPandas`` — while the actual codec step is stubbed (no image/audio libs
in this container): ``decode_image_stub`` produces a deterministic fake "decoded"
feature row per payload, clearly marked. Swapping in a real decoder is a one-function
change with an identical batch signature.

Design rule for 100 TB: binary payloads ride in their own column so Parquet column
pruning keeps metadata-only queries from ever touching the bytes; decode runs as an
Arrow-batched ``mapInPandas`` (one Python worker round-trip per batch, not per row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image/fake"
) -> DataFrame:
    """Typed metadata columns alongside the opaque binary payload."""
    return df.withColumn("media_type", F.lit(media_type)).withColumn(
        "payload_bytes", F.octet_length(F.col(payload_col)).cast("int")
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake. A real deployment replaces this body with
    e.g. PIL/torchvision decode; the Spark plumbing around it is unchanged.

    Raises NotImplementedError when asked for a real codec via media_type dispatch;
    the fake path derives (width, height, 8-dim feature) from the payload bytes so
    tests are deterministic.
    """
    if payload is None:
        raise NotImplementedError("real image decoding unavailable in this environment")
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0xFFFFFFFF
    width = 16 + (h % 64)
    height = 16 + ((h >> 8) % 64)
    feature = [((h >> (i * 2)) & 0xFF) / 255.0 for i in range(8)]
    return width, height, feature


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``: each incoming
    pandas batch yields one outgoing batch; the codec runs per-payload inside the
    batch (vectorizable when a real library takes array input)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats = [], [], []
            for payload in pdf[payload_col]:
                w, h, f = decode_image_stub(bytes(payload) if payload is not None else b"")
                ws.append(w)
                hs.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf.get("media_type", pd.Series(["image/fake"] * len(pdf))),
                    "payload_bytes": pdf[payload_col].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "width": ws,
                    "height": hs,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_decode, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched image resize over ``mapInPandas`` — same contract as
    extract_features: the Spark plumbing (schema, batch shape, binary-out column)
    is real; the pixel resample itself is STUBBED deterministically (no codec
    libs in this container — a real deployment replaces the inner function with
    e.g. PIL ``Image.resize`` on the decoded array, identical signature).

    The fake emits ``target_w * target_h`` bytes derived from a rolling hash of
    the source payload, so output size and determinism are test-checkable."""

    def _resize_stub(payload: bytes) -> bytes:
        h = 2166136261
        for b in payload[:256]:
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        n = target_w * target_h
        return bytes((h >> (8 * (i % 4))) & 0xFF for i in range(min(n, 4096)))

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf[payload_col].map(
                        lambda p: _resize_stub(bytes(p)) if p is not None else None
                    ),
                }
            )

    return df.mapInPandas(_batches, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, frame_count_col: str = "n_frames"
) -> DataFrame:
    """Video frame-sampling plan: explode the frame indexes to decode (every Nth),
    columnar (sequence+explode) so the sampling plan itself never enters Python."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.col(frame_count_col) - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_idx", F.explode(idx))
