"""Structured Streaming ingest path (SURVEY §2.8)."""

from etl_german_fhir_core_spark.streaming.ingest import stream_feed_into_table

__all__ = ["stream_feed_into_table"]
