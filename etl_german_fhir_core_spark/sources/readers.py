"""Source readers — the reference's scan operators re-expressed (SURVEY §2.1).

S1 JDBC paging scan  → spark.read.jdbc with partitionColumn bounds
S3 incremental scan  → parquet_feed with an lsn/ts window (pushed-down predicate)
S7 CSV seed loads    → csv_seed with explicit schema (no inference in prod)
S6 FHIR-REST pager   → sources.rest.rest_paged_scan (deterministic page grid +
                       executor-parallel fetch via an injected transport)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_feed(
    spark: SparkSession,
    path: str,
    lo_lsn: int | None = None,
    hi_lsn: int | None = None,
    ts_lo=None,
    ts_hi=None,
) -> DataFrame:
    """Change-feed scan with optional LSN / timestamp windows — the incremental
    reader (TaskConfiguration.java:316-336 ``last_updated_at BETWEEN``; date-range
    builder :225-247). Both predicates push down to Parquet (range-partitioned files
    prune whole row groups)."""
    df = spark.read.parquet(path)
    if lo_lsn is not None:
        df = df.where(F.col("lsn") > lo_lsn)
    if hi_lsn is not None:
        df = df.where(F.col("lsn") <= hi_lsn)
    if ts_lo is not None:
        df = df.where(F.col("ts") >= F.lit(ts_lo))
    if ts_hi is not None:
        df = df.where(F.col("ts") <= F.lit(ts_hi))
    return df


def csv_seed(
    spark: SparkSession, path: str, schema, sep: str = ";", header: bool = True
) -> DataFrame:
    """Semicolon-CSV seed loader (S7 analog: orpha_snomed_mapping.csv / CARE_SITE.csv
    hand-split on ';' — InitOmopDb.java:144-184). Explicit schema, never inference."""
    return spark.read.csv(path, sep=sep, header=header, schema=schema)


def jdbc_paged(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    properties: dict | None = None,
) -> DataFrame:
    """JDBC parallel scan (S1 analog: JdbcPagingItemReader ORDER BY id paging,
    TaskConfiguration.java:256-274). Spark's partitionColumn bounds replace keyset
    pagination — each executor reads an id range. Requires a JDBC driver jar on
    the classpath (exercised end-to-end against embedded Derby in
    tests/test_plans.py::test_jdbc_paged_scan_roundtrip_derby)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


