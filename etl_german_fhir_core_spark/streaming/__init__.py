"""Structured Streaming ingest path (SURVEY §2.8)."""

from etl_german_fhir_core_spark.streaming.changefeed import (
    AggFeedSync,
    ChangeFeedSync,
)
from etl_german_fhir_core_spark.streaming.ingest import stream_feed_into_table
from etl_german_fhir_core_spark.streaming.stateful import (
    streaming_dedup_first_seen,
    streaming_lww_state,
)
from etl_german_fhir_core_spark.streaming.windows import streaming_session_eras

__all__ = [
    "stream_feed_into_table",
    "streaming_session_eras",
    "streaming_lww_state",
    "streaming_dedup_first_seen",
    "ChangeFeedSync",
    "AggFeedSync",
]
