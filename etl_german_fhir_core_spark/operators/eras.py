"""Era / period operators — the reference's post-processing window-function class.

- ``collapse_eras``: gaps-and-islands collapse of per-entity events into eras when
  consecutive events are within ``gap`` of each other. Re-expresses the
  condition_era / drug_era algorithm
  (/root/reference/src/main/resources/post_processing/post_process_condition_era.sql:37-116,
  post_process_drug_era.sql:63-149) with the lag+cumsum island idiom instead of the
  reference's UNION-ALL-of-start/end-events trick — one shuffle on (entity), all
  window work stays in whole-stage codegen.
- ``period_rollup``: min/max/count per entity — the observation_period rollup
  (post_process_observation_period.sql:5-16) whose MERGE-widening upsert (W8) is
  exercised via SnapshotTable.merge in the engine tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def collapse_eras(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 30 * 60,
) -> DataFrame:
    """Collapse events into eras: a new era starts when the gap to the previous event
    of the same entity exceeds ``gap_seconds``. Output: one row per era with
    era_id (1-based per entity), era_start, era_end, n_events.

    Physical shape: single hash shuffle on entity_cols; two window passes (lag, then
    running max of island starts as a cumulative sum over the new-era flag) — both in
    the same window partitioning, so Catalyst plans one Exchange + one Sort.
    """
    w_order = Window.partitionBy(*entity_cols).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w_order)
    # microsecond-exact gap test (second-truncation would misclassify boundary gaps)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731 — NTZ-safe micros
    is_new = F.when(
        prev_ts.isNull()
        | (us(F.col(ts_col)) - us(prev_ts) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    with_era = df.withColumn("_new_era", is_new).withColumn(
        "era_id",
        F.sum("_new_era")
        .over(w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        with_era.groupBy(*entity_cols, "era_id")
        .agg(
            F.min(ts_col).alias("era_start"),
            F.max(ts_col).alias("era_end"),
            F.count("*").alias("n_events"),
        )
    )


def period_rollup(df: DataFrame, entity_cols: list[str], ts_col: str = "ts") -> DataFrame:
    """Observation-period analog: [min(ts), max(ts)] + event count per entity."""
    return df.groupBy(*entity_cols).agg(
        F.min(ts_col).alias("period_start"),
        F.max(ts_col).alias("period_end"),
        F.count("*").alias("n_events"),
    )
