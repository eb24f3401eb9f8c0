"""Source connectors (SURVEY §2.1)."""

from etl_german_fhir_core_spark.sources.readers import (
    csv_seed,
    jdbc_paged,
    parquet_feed,
    rest_paged_stub,
)

__all__ = ["parquet_feed", "csv_seed", "jdbc_paged", "rest_paged_stub"]
