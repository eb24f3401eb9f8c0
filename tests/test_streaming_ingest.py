"""Structured Streaming ingest: feed dir → foreachBatch MERGE, checkpointed resume."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

from etl_german_fhir_core_spark.cdc import replay_oracle, synth_feed
from etl_german_fhir_core_spark.lake import SnapshotTable
from etl_german_fhir_core_spark.streaming import stream_feed_into_table

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def test_stream_ingest_matches_oracle_and_resumes(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    full = synth_feed(spark, n_events=3000, n_convs=50, max_turns=10, ooo_frac=0.15)
    # many small files → several micro-batches with maxFilesPerTrigger
    full.repartitionByRange(6, "lsn").write.parquet(feed_path)

    root = str(tmp_path / "tbl")
    tbl = SnapshotTable.create(spark, root, SCHEMA, ["conv_id", "turn_idx"], num_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    q = stream_feed_into_table(spark, feed_path, tbl, ckpt, max_files_per_trigger=2)
    q.awaitTermination()
    n_epochs_first = len(tbl.committed_epochs())
    assert n_epochs_first >= 2  # several micro-batches

    # restart from checkpoint: no new files → no new commits, state unchanged
    sid = tbl.current_snapshot_id()
    q2 = stream_feed_into_table(spark, feed_path, tbl, ckpt, max_files_per_trigger=2)
    q2.awaitTermination()
    assert tbl.current_snapshot_id() == sid

    # state equivalence vs global-LWW oracle (normalization is idempotent on this
    # feed's text except whitespace collapse — apply the same mapping)
    from pyspark.sql import functions as F

    from etl_german_fhir_core_spark.functions.text import normalize_text

    raw = spark.read.parquet(feed_path).withColumn(
        "text",
        F.when(F.col("op") == "D", F.col("text")).otherwise(
            normalize_text(F.col("text"), 32768)
        ),
    )
    oracle = replay_oracle(raw.toPandas())
    got = (
        tbl.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pd.testing.assert_frame_equal(got[cols], oracle[cols], check_dtype=False)


def test_streaming_session_eras_matches_batch_collapse(spark, tmp_path):
    """Watermarked session-window eras over a stream equal the batch
    gaps-and-islands collapse on the same events (era extents + event counts;
    era numbering is a batch-side artifact). Append mode emits each closed era
    exactly once."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_german_fhir_core_spark.operators.eras import collapse_eras
    from etl_german_fhir_core_spark.streaming import streaming_session_eras

    TS0 = dt.datetime(2025, 1, 1)
    rows = []
    for u in (1, 2):
        # era A: three events 5 min apart; era B: 2h later, one event
        for k in range(3):
            rows.append((u, TS0 + dt.timedelta(minutes=5 * k + u)))
        rows.append((u, TS0 + dt.timedelta(hours=2, minutes=u)))
    # sentinel far in the future: advances the watermark so every real session
    # CLOSES and is emitted (append mode only emits watermark-passed sessions)
    rows.append((999, TS0 + dt.timedelta(days=1)))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    feed_path = str(tmp_path / "sess_feed")
    df.write.parquet(feed_path)

    src = spark.readStream.schema(df.schema).parquet(feed_path)
    out = streaming_session_eras(src, ["user_id"], "ts", gap_seconds=1800,
                                 watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("sess_eras")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["era_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_eras WHERE user_id <> 999").collect()
    }
    expect = {
        (r["user_id"], r["era_start"], r["n_events"])
        for r in collapse_eras(
            df.filter("user_id <> 999"), ["user_id"], "ts", gap_seconds=1800
        ).collect()
    }
    assert got == expect and len(got) == 4  # 2 users x 2 eras
