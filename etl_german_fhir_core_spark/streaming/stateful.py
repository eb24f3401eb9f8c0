"""Custom stateful streaming operator via applyInPandasWithState.

``streaming_lww_state``: maintains per-key last-write-wins state inside the
Structured Streaming state store — the continuous counterpart of the batch MERGE,
for deployments that want per-key state resident in the stream instead of merged
into the lake every micro-batch (reference analog: the RAM dictionaries the ETL
holds between chunks, DbMappings.java:37-72, made fault-tolerant by the state
store + checkpoint).

Emits one row per key whose state CHANGED in the micro-batch (an update stream —
op='U'|'D' downstream consumers can feed into the lake or a cache).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
    ]
)


def _lww_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key reducer: fold the micro-batch's events into the stored LWW winner
    under the (ts, lsn) total order; emit the new state iff it changed."""
    conv_id, turn_idx = key
    cur = state.get if state.exists else (None, None, None, None, None, False)
    best_ts, best_lsn = cur[0], cur[1]

    changed = False
    best = cur
    for pdf in pdfs:
        # vectorized inside the batch: pick the max (ts, lsn) row once per pandas chunk.
        # datetime64[ns] int view is NANOseconds — divide to true microseconds so the
        # stored ts_us matches the unix_micros convention used engine-wide.
        pdf = pdf.assign(_ts_us=pdf["ts"].astype("int64") // 1000)
        top = pdf.sort_values(["_ts_us", "lsn"], kind="mergesort").iloc[-1]
        if (
            best_ts is None
            or (int(top["_ts_us"]), int(top["lsn"]))
            > (
                # explicit None checks: ts_us == 0 (epoch zero) is legitimate state
                int(best_ts) if best_ts is not None else -1,
                int(best_lsn) if best_lsn is not None else -1,
            )
        ):
            best = (
                int(top["_ts_us"]), int(top["lsn"]), top["role"], top["text"],
                top["tool"], top["op"] == "D",
            )
            best_ts, best_lsn = best[0], best[1]
            changed = True

    if changed:
        state.update(best)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "op": "D" if best[5] else "U",
                    "role": best[2],
                    "text": best[3],
                    "tool": best[4],
                    "ts_us": best[0],
                    "lsn": best[1],
                }
            ]
        )


def streaming_lww_state(feed_stream: DataFrame):
    """Wire the stateful LWW reducer over a streaming change feed (grouped by key).
    Returns the update-stream DataFrame (start it with writeStream)."""
    return feed_stream.groupBy("conv_id", "turn_idx").applyInPandasWithState(
        _lww_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_id", T.LongType(), True),
        T.StructField("first_ts_us", T.LongType(), True),
    ]
)

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts_us", T.LongType(), True),
    ]
)


def _make_first_seen_update(ttl_ms: int | None):
    """Build the per-fingerprint reducer (ttl captured by CLOSURE — a module
    function attribute would not survive pickling to executors): emit the FIRST
    document carrying this content fingerprint (min (ts, doc_id) within the
    batch for determinism under within-batch ties); later arrivals are
    duplicates and emit nothing. State expires on EVENT-time timeout — set to
    (first ts + TTL) against the watermark, never wall clock, so replays are
    bit-identical."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:  # drain: all duplicates
                pass
            return
        best = None
        for pdf in pdfs:
            pdf = pdf.assign(_ts_us=pdf["ts"].astype("int64") // 1000)
            top = pdf.sort_values(["_ts_us", "doc_id"], kind="mergesort").iloc[0]
            cand = (int(top["_ts_us"]), int(top["doc_id"]))
            if best is None or cand < best:
                best = cand
        if best is None:
            return
        ts_us, doc_id = best
        state.update((doc_id, ts_us))
        if ttl_ms is not None:
            # event-time TTL: expire once the watermark passes first_ts + ttl
            state.setTimeoutTimestamp(ts_us // 1000 + ttl_ms)
        yield pd.DataFrame([{"fingerprint": fp, "doc_id": doc_id, "ts_us": ts_us}])

    return _update


def streaming_dedup_first_seen(
    doc_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    ttl_seconds: int | None = None,
    watermark: str = "10 minutes",
):
    """Streaming exact dedup — the ``dropDuplicatesWithinWatermark`` analog with
    an explicit content key: each document's normalized-text xxhash64
    fingerprint keys per-fingerprint state; only the FIRST occurrence is
    emitted, duplicates are swallowed. ``ttl_seconds`` bounds state size (the
    100 TB concern: unbounded fingerprint state grows with corpus cardinality):
    a fingerprint's state expires once the EVENT-TIME watermark passes its first
    occurrence + TTL — data-derived, no wall clock, so a checkpoint replay
    deduplicates identically. After expiry a re-occurrence is treated as new
    (the same retention contract as tombstone expiry, CLAUDE.md)."""
    from pyspark.sql import functions as F

    from etl_german_fhir_core_spark.functions.text import normalize_text

    update_fn = _make_first_seen_update(
        ttl_seconds * 1000 if ttl_seconds is not None else None
    )
    keyed = (
        # drop null event times BEFORE keying: a NaT would int64-cast to
        # INT64_MIN in the reducer, win 'first seen', and set a negative
        # event-time timeout (ADVICE r04 low). A row with no event time has no
        # position under the watermark contract anyway.
        doc_stream.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            F.xxhash64(F.lower(normalize_text(F.col(text_col)))).alias("_fp"),
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ts"),
        )
    )
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("_fp").applyInPandasWithState(
        update_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
