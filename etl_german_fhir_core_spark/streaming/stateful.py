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
