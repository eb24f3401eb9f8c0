"""applyInPandasWithState LWW reducer: update stream carries per-key winners across
micro-batches; late (older-ts) events produce no update."""

from __future__ import annotations

from etl_german_fhir_core_spark.cdc import synth_feed
from etl_german_fhir_core_spark.streaming.stateful import streaming_lww_state


def test_streaming_lww_state_updates(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    full = synth_feed(spark, n_events=2000, n_convs=30, max_turns=8, ooo_frac=0.2)
    full.repartitionByRange(4, "lsn").write.parquet(feed_path)

    src = (
        spark.readStream.schema(spark.read.parquet(feed_path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_path)
    )
    updates = streaming_lww_state(src)
    q = (
        updates.writeStream.format("memory")
        .queryName("lww_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql(
        """
        SELECT conv_id, turn_idx, op, text, ts_us, lsn FROM lww_updates
        """
    ).toPandas()
    assert len(out) > 0

    # the LAST update emitted per key must equal the global LWW winner
    last = (
        out.sort_values(["ts_us", "lsn"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"])
        .tail(1)
        .set_index(["conv_id", "turn_idx"])
    )
    import pandas as pd

    from etl_german_fhir_core_spark.cdc import replay_oracle

    raw = spark.read.parquet(feed_path).toPandas()
    oracle = replay_oracle(raw)
    oracle_keys = set(zip(oracle.conv_id, oracle.turn_idx))
    for key, row in last.iterrows():
        if row["op"] == "D":
            assert key not in oracle_keys, key
        else:
            assert key in oracle_keys, key
            expect = oracle[(oracle.conv_id == key[0]) & (oracle.turn_idx == key[1])]
            assert expect.iloc[0]["text"] == row["text"], key
    # every surviving oracle key appeared in the update stream
    assert oracle_keys <= set(last.index)


def test_streaming_dedup_first_seen_and_event_time_ttl(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark analog): only the
    first occurrence of each content fingerprint is emitted, across micro-batch
    boundaries and restarts; with ttl_seconds the fingerprint state expires on
    EVENT-time (data-derived watermark — replay-deterministic), after which a
    re-occurrence is treated as new."""
    import datetime as dt

    from etl_german_fhir_core_spark.streaming.stateful import (
        streaming_dedup_first_seen,
    )

    TS0 = dt.datetime(2025, 1, 1)
    feed_dir = tmp_path / "docs"
    feed_dir.mkdir()
    schema = "doc_id long, text string, ts timestamp"

    def _emit(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed_dir / name))

    out_dir = str(tmp_path / "out")

    def _run(qname):
        src = (
            spark.readStream.schema(
                spark.createDataFrame([], schema).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed_dir / "*"))
        )
        out = streaming_dedup_first_seen(
            src, ttl_seconds=60, watermark="1 seconds"
        )
        # file sink (not memory): it supports resuming from the shared
        # checkpoint across the staged restarts this test performs
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).toPandas()

    # run 1: duplicates within and across files + a far-future doc that pushes
    # the watermark past doc A's TTL window
    _emit("f1", [(1, "alpha beta gamma", TS0),
                 (2, "alpha  BETA gamma", TS0 + dt.timedelta(seconds=1)),  # dup of A (normalization)
                 (3, "different content here", TS0)])
    _emit("f2", [(4, "alpha beta gamma", TS0 + dt.timedelta(seconds=2)),  # dup of A again
                 (5, "far future doc", TS0 + dt.timedelta(hours=2))])
    out1 = _run("dedup_run1")
    emitted = {int(r.doc_id) for _, r in out1.iterrows()}
    assert emitted == {1, 3, 5}  # one per distinct content, first occurrence wins

    # run 2 (restart from checkpoint): a batch with only unrelated data lets the
    # event-time timeout sweep expire doc A's fingerprint state
    _emit("f3", [(6, "unrelated sweep trigger", TS0 + dt.timedelta(hours=2, seconds=1))])
    out2 = _run("dedup_run2")
    assert {int(r.doc_id) for _, r in out2.iterrows()} == {1, 3, 5, 6}

    # run 3: doc A's content re-occurs AFTER expiry → treated as new (the
    # documented retention contract); an un-expired dup (content 6) stays quiet
    _emit("f4", [(7, "alpha beta gamma", TS0 + dt.timedelta(hours=2, seconds=2)),
                 (8, "unrelated sweep trigger", TS0 + dt.timedelta(hours=2, seconds=3))])
    out3 = _run("dedup_run3")
    assert {int(r.doc_id) for _, r in out3.iterrows()} == {1, 3, 5, 6, 7}
