"""Watermarked session-window aggregation — the streaming counterpart of the
batch gaps-and-islands era collapse (operators/eras.py, reference
post_process_condition_era.sql:37-116).

SURVEY §2.6 notes the reference's 30-day era gap is the closest thing it has to a
session window; when the feed is a live stream, the same semantics are
`F.session_window` + a watermark: the state store holds only open sessions, the
watermark bounds how late an event may arrive and still extend one, and closed
sessions are emitted exactly once in append mode (late-data handling the batch
engine gets from the retry queue instead).

Boundary note: a batch era keeps an event at EXACTLY gap seconds in the same era
(collapse_eras uses a strict `> gap` test); `session_window` half-open windows
``[start, last+gap)`` start a NEW session for that event. Identical everywhere
else — at microsecond-resolution event time exact-boundary ties are measure-zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_eras(
    feed_stream: DataFrame,
    entity_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 30 * 60,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-entity session eras over a stream: events of one entity within
    ``gap_seconds`` of each other merge into one era; events later than
    ``watermark`` behind the max seen event time are dropped (bounded state).
    Output (append mode, one row per CLOSED era): entity_cols + era_start,
    era_end, n_events."""
    sess = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        feed_stream.withWatermark(ts_col, watermark)
        .groupBy(*entity_cols, sess)
        .agg(F.count("*").alias("n_events"))
        .select(
            *entity_cols,
            F.col("session_window.start").alias("era_start"),
            F.col("session_window.end").alias("era_end"),
            "n_events",
        )
    )
