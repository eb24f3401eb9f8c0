"""CDC / incremental-ingest core: deterministic change-feed fixtures, epoch manager
with exactly-once idempotent commits, LWW dedup, lineage metrics, retry queue."""

from etl_german_fhir_core_spark.cdc.engine import (
    CascadeSpec,
    CdcEngine,
    EpochResult,
    ProjectionSpec,
    RollupSpec,
)
from etl_german_fhir_core_spark.cdc.feed import FEED_SCHEMA, synth_feed, write_feed
from etl_german_fhir_core_spark.cdc.oracle import replay_oracle

__all__ = [
    "CascadeSpec",
    "CdcEngine",
    "EpochResult",
    "ProjectionSpec",
    "RollupSpec",
    "FEED_SCHEMA",
    "synth_feed",
    "write_feed",
    "replay_oracle",
]
