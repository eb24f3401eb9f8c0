"""Source connectors (SURVEY §2.1)."""

from etl_german_fhir_core_spark.sources.readers import (
    csv_seed,
    jdbc_paged,
    parquet_feed,
)
from etl_german_fhir_core_spark.sources.rest import (
    rest_link_walk_scan,
    rest_page_plan,
    rest_paged_scan,
)

__all__ = [
    "parquet_feed",
    "csv_seed",
    "jdbc_paged",
    "rest_page_plan",
    "rest_paged_scan",
    "rest_link_walk_scan",
]
