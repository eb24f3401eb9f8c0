"""T8 timezone anchoring + T14 data-absent unwrap + J7 materialized dim."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_german_fhir_core_spark.functions.temporal import null_when, tz_anchor
from etl_german_fhir_core_spark.operators.routing import materialize_dim


def _ts_df(spark):
    return spark.createDataFrame(
        [("2024-01-15 12:00:00",), ("2024-06-15 12:00:00",)], "t string"
    ).select(F.col("t").cast("timestamp_ntz").alias("ts"))


def test_tz_anchor_dst_aware(spark):
    out = {
        str(r["ts"]): str(r["b"])
        for r in _ts_df(spark).select("ts", tz_anchor("ts").alias("b")).collect()
    }
    assert out["2024-01-15 12:00:00"] == "2024-01-15 13:00:00"  # CET +1
    assert out["2024-06-15 12:00:00"] == "2024-06-15 14:00:00"  # CEST +2


def test_tz_anchor_session_tz_independent(spark):
    """The anchor must not consult spark.sql.session.timeZone (bit-identical
    replays on any driver box — PatientMapper.java:474-486 pins the zone)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        ref = [str(r["b"]) for r in _ts_df(spark).select(tz_anchor("ts").alias("b")).collect()]
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        alt = [str(r["b"]) for r in _ts_df(spark).select(tz_anchor("ts").alias("b")).collect()]
        assert ref == alt
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_null_when_unwrap(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, 7.0, "error")], "id int, v double, status string"
    )
    out = {
        r["id"]: r["v2"]
        for r in df.select(
            "id", null_when("v", F.col("status") == "error").alias("v2")
        ).collect()
    }
    assert out == {1: 5.0, 2: None}


def test_materialize_dim_caches_and_releases(spark):
    from etl_german_fhir_core_spark.plans import explain_str

    dim = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    cached, release = materialize_dim(dim, name="vocab_test")
    try:
        cached.count()  # populate
        plan = explain_str(cached.filter(F.col("k") > 2), "simple")
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
        assert spark.sql("SELECT COUNT(*) AS n FROM vocab_test").collect()[0]["n"] == 10
    finally:
        release()
    assert cached.storageLevel.useMemory is False  # unpersisted
