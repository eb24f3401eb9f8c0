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
