"""Temporal mapper functions (T8/T9 analogs).

The reference anchors patient birth dates at a fixed zone regardless of where the
ETL runs (PatientMapper.java:474-486: `ZoneId.of("Europe/Berlin")`). The Spark
re-expression must be DRIVER-SESSION-TIMEZONE-INDEPENDENT: parquet naive
timestamps load as TIMESTAMP_NTZ in Spark 4, and `convert_timezone` on NTZ never
consults `spark.sql.session.timeZone`, so replays are bit-identical on any box.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tz_anchor(
    col: Column | str,
    source_tz: str = "UTC",
    target_tz: str = "Europe/Berlin",
) -> Column:
    """Timezone-anchored conversion (T8): interpret a naive timestamp as
    ``source_tz`` wall time and return the ``target_tz`` wall time (NTZ),
    DST-aware. The cast to TIMESTAMP_NTZ is a no-op for parquet-sourced columns
    and guards LTZ inputs against session-zone leakage via an explicit contract
    (LTZ → NTZ cast uses the session zone; pass NTZ for deterministic replays)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.convert_timezone(
        F.lit(source_tz), F.lit(target_tz), c.cast("timestamp_ntz")
    )


def null_when(value: Column | str, absent: Column) -> Column:
    """Data-absent-reason unwrap (T14, ResourceCheckDataAbsentReason.java): when
    the absent marker holds, the value is NULL (the reference drops the field and
    records the reason); otherwise the value passes through unchanged."""
    v = F.col(value) if isinstance(value, str) else value
    return F.when(absent, F.lit(None)).otherwise(v)
