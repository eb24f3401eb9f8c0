"""Deterministic synthetic change feed (WAL/binlog analog) — FIXTURES.md §2.

Modeled on the reference's source table ``resources``
(/root/reference/deploy/init-test-data/0-init-fhir-gw.sql:1-16): ``id SERIAL`` → lsn,
``fhir_id`` → key, ``last_updated_at`` → ts, ``is_deleted`` → op='D'.

Generation is **Spark-side and hash-deterministic** (no RNG, no wall clock): every
column derives from ``xxhash64(lsn, seed)``. That makes the generator itself scale to
10^10 events on a cluster (spark.range parallelizes) and guarantees the pandas oracle
and any replay see byte-identical input. Seeded properties:

- event mix ≈ 70% insert / 25% update / 5% delete (FIXTURES.md §2),
- optional hot-key skew: one conv_id receives ``skew_frac`` of all events,
- optional out-of-order ts: a fraction of events carry a timestamp up to
  ``ooo_back_secs`` earlier than their LSN position, plus exact-ts duplicates that
  differ only in lsn (exercises the total-order tie-break),
- optional schema evolution: ``tool`` is NULL (column conceptually absent) for
  ``lsn <= tool_from_lsn`` and populated after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["bash", "search", "calculator", "browser"]
_BASE_TS = "2025-01-01 00:00:00"


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 'random' stream: non-negative xxhash64 of (cols..., seed)."""
    return F.abs(F.xxhash64(*cols, F.lit(seed)))


def synth_feed(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 100,
    max_turns: int = 20,
    seed: int = 42,
    skew_frac: float = 0.0,
    ooo_frac: float = 0.0,
    ooo_back_secs: int = 3600,
    tool_from_lsn: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Build the change-event DataFrame for lsn ∈ [1, n_events]."""
    rng = spark.range(1, n_events + 1, 1, partitions or spark.sparkContext.defaultParallelism)
    df = rng.select((F.col("id")).alias("lsn"))

    # key: hot conv_id soaks up skew_frac of events; rest uniform over n_convs
    conv_pick = _h(seed * 11 + 1, "lsn") % 10_000
    uniform_conv = F.concat(F.lit("conv-"), (_h(seed * 11 + 2, "lsn") % n_convs).cast("string"))
    conv = (
        F.when(conv_pick < int(skew_frac * 10_000), F.lit("conv-hot")).otherwise(uniform_conv)
        if skew_frac > 0
        else uniform_conv
    )
    df = df.withColumn("conv_id", conv)
    df = df.withColumn("turn_idx", (_h(seed * 11 + 3, "lsn") % max_turns).cast("int"))

    # op mix: first event of a key is logically an insert; we emit ops independently
    # (the engine's LWW/upsert semantics make I vs U equivalent, as in the reference's
    # delete-then-insert which never distinguishes them)
    opsel = _h(seed * 11 + 4, "lsn") % 100
    df = df.withColumn(
        "op",
        F.when(opsel < 70, "I").when(opsel < 95, "U").otherwise("D"),
    )

    # ts: monotone base (1 second per lsn) with a deterministic subset pushed back
    oosel = _h(seed * 11 + 5, "lsn") % 10_000
    back = F.when(
        oosel < int(ooo_frac * 10_000), _h(seed * 11 + 6, "lsn") % ooo_back_secs
    ).otherwise(F.lit(0))
    # exact-ts duplicates: every 10th event reuses the previous second → (ts, lsn)
    # tie-break is exercised
    quantize = F.when(_h(seed * 11 + 7, "lsn") % 10 == 0, F.lit(1)).otherwise(F.lit(0))
    secs = (F.col("lsn") - back - quantize).cast("long")
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp(F.lit(_BASE_TS)) + secs)
    )

    df = df.withColumn(
        "role", F.element_at(F.array(*[F.lit(r) for r in _ROLES]), (F.col("turn_idx") % 4 + 1).cast("int"))
    )
    tool_val = F.element_at(
        F.array(*[F.lit(t) for t in _TOOLS]), (_h(seed * 11 + 8, "lsn") % 4 + 1).cast("int")
    )
    has_tool = (F.col("role") == "tool")
    if tool_from_lsn is not None:
        has_tool = has_tool & (F.col("lsn") > tool_from_lsn)
    df = df.withColumn("tool", F.when(has_tool, tool_val).otherwise(F.lit(None).cast("string")))

    # text payload: versioned so LWW outcomes are observable via text equality
    df = df.withColumn(
        "text",
        F.concat(
            F.lit("turn "), F.col("turn_idx").cast("string"),
            F.lit(" of "), F.col("conv_id"),
            F.lit(" v"), F.col("lsn").cast("string"),
            F.lit("  padding: "),
            F.repeat(F.lit("lorem ipsum dolor sit amet "), (_h(seed * 11 + 9, "lsn") % 8 + 1).cast("int")),
        ),
    )
    # tombstones carry no payload (reference: is_deleted rows are never parsed —
    # processor/ConditionProcessor.java:44-48 short-circuits on isDeleted)
    is_del = F.col("op") == "D"
    for c in ("role", "text", "tool"):
        df = df.withColumn(c, F.when(is_del, F.lit(None).cast("string")).otherwise(F.col(c)))

    return df.select([f.name for f in FEED_SCHEMA])


def write_feed(df: DataFrame, path: str, n_files: int = 8) -> None:
    """Materialize a feed to parquet, range-partitioned by lsn so epoch scans
    (``lsn BETWEEN lo AND hi``) prune files — the analog of the reference's keyset
    pagination ORDER BY id (TaskConfiguration.java:344-348)."""
    df.repartitionByRange(n_files, "lsn").write.mode("overwrite").parquet(path)
