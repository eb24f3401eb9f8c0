"""Surrogate-id minting at scale (T13 analog).

The reference mints dense surrogate ids from a Postgres sequence while streaming
records through a single writer (reference: IncreaseBurdenUtils.java's
fhir_omop_id handling and the OmopWriter insert path) — inherently serial. A
naive Spark translation is ``row_number() OVER (ORDER BY key)``: a global
no-partition window that funnels the whole table through ONE task.

``dense_surrogate_ids`` instead does classic two-pass parallel numbering:

1. pick P-1 order-preserving split points from a small deterministic sample
   (fixed seed → replays are bit-identical), assign each row a range-partition
   id ``_pid`` as a pure function of the key (monotone sum of comparisons —
   whole-stage-codegen'd, no shuffle to decide);
2. count rows per pid (one narrow single-column agg), cumulate the counts on the
   driver (≤P integers) into prefix offsets;
3. number rows with a PARTITION-LOCAL window ``row_number() OVER (PARTITION BY
   _pid ORDER BY key)`` and add the broadcast offset.

Every task sorts only its own range; the result equals the global
``row_number() OVER (ORDER BY key)`` for unique keys regardless of where the
sampled split points fall, because ranges are disjoint and ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_surrogate_ids(
    df: DataFrame,
    key_col: str,
    num_partitions: int | None = None,
    sample_per_partition: int = 200,
    out_col: str = "surrogate_id",
) -> DataFrame:
    """Dense 1..N ids ordered by ``key_col`` (must be unique), without a global
    single-partition window. Returns (key_col, out_col)."""
    spark = df.sparkSession
    keys = df.select(key_col)
    n = keys.count()
    if n == 0:
        return keys.withColumn(out_col, F.lit(None).cast("long"))
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    P = max(1, min(P, n))

    # order-preserving split points from a seeded sample (deterministic replay);
    # duplicates collapse, so skew in the sample only costs balance, not order
    boundaries: list = []
    if P > 1:
        frac = min(1.0, (P * sample_per_partition) / n)
        sample = sorted(r[0] for r in keys.sample(False, frac, seed=42).collect())
        if sample:
            raw = [sample[(len(sample) * i) // P] for i in range(1, P)]
            seen = set()
            for v in raw:
                if v not in seen:
                    seen.add(v)
                    boundaries.append(v)

    pid = F.lit(0)
    for b in boundaries:
        pid = pid + F.when(F.col(key_col) > F.lit(b), 1).otherwise(0)
    with_pid = keys.withColumn("_pid", pid.cast("int"))

    counts = with_pid.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    acc, offsets = 0, []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((int(r["_pid"]), acc))
        acc += int(r["_n"])
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy(key_col)
    # surrogate ids are LONG: the module's contract is numbering at scale, and an
    # int cast would silently overflow past 2^31 rows (ADVICE r02 low). Callers
    # that know N is small can downcast.
    return (
        with_pid.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .select(key_col, (F.col("_off") + F.col("_rn")).cast("long").alias(out_col))
    )
