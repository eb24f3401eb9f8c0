"""SparkSession factory tuned for the CDC/ingest engine.

Local-mode testing uses ``local[N]``; the same builder settings are what a
spark-submit deployment on a real cluster would carry in ``spark-defaults.conf``.
Reference analog: the job's sizing configuration (application.yml:1-4,
BATCH_THROTTLELIMIT worker threads — TaskConfiguration.java:121-122) becomes
Spark parallelism + AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_german_fhir_core_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults matter at scale:
    - AQE on: runtime coalescing + skew-join splitting (the engine additionally
      salts hot keys explicitly before its dedup shuffle; see cdc.engine).
    - Arrow on: every pandas UDF crosses via Arrow batches, never per-row pickle.
    - UTC session timezone: oracle comparison (DuckDB is UTC-naive) and replay
      determinism (north rule forbids wall-clock-dependent results).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # min/max/count over parquet become footer-stat reads (epoch planning scans)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # collect_set/collect_list aggregates (dedup shingle-set building) run in
        # ObjectHashAggregateExec; the default sort-based fallback triggers at a
        # mere 128 distinct keys per task, silently re-introducing a full sort of
        # the corpus. The buffers here are bounded per key (one doc's shingle
        # hashes ≈ a few KB), so a generous key budget is safe at any scale —
        # memory per task stays (keys × per-doc set), execution-memory-tracked.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
