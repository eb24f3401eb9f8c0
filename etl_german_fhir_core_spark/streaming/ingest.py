"""Structured Streaming CDC ingest: readStream over the feed directory →
foreachBatch → keyed MERGE into a SnapshotTable.

This is the continuous-tail counterpart of the batch epoch manager: Spark's
checkpointLocation tracks which feed files each micro-batch consumed (the Spring
Batch ExecutionContext analog, FhirServerItemReader.java:160-191), and the table
manifest's idempotent epoch commits make foreachBatch replays after a crash no-ops —
together: exactly-once (north rule).

The micro-batch body is the same plan as CdcEngine.apply_epoch: vectorized
normalize → validity gate → LWW MERGE. Epoch id = "stream-<batchId>"; Spark
guarantees batchId/content stability on replay from the checkpoint, which is the
determinism requirement for idempotent commits (SURVEY §7.3 hard part (a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_german_fhir_core_spark.functions.text import normalize_final, validity_filter
from etl_german_fhir_core_spark.lake import SnapshotTable


def stream_feed_into_table(
    spark: SparkSession,
    feed_path: str,
    table: SnapshotTable,
    checkpoint_path: str,
    schema=None,
    max_files_per_trigger: int = 4,
    normalize: bool = True,
    max_text_len: int | None = 32768,
):
    """Start (and return) the streaming query. Callers drive it with
    ``q.processAllAvailable(); q.stop()`` for bounded feeds, or leave it running for
    a live tail."""
    if schema is None:
        schema = spark.read.parquet(feed_path).schema

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_path)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        valid, _ = validity_filter(batch, table.key_cols())
        table.merge(
            valid,
            epoch_id=f"stream-{batch_id}",
            finalize_payload=(
                (lambda df: normalize_final(df, max_text_len)) if normalize else None
            ),
        )

    return (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
