"""Property-based LWW correctness: for RANDOM event sequences (hypothesis) with
forced timestamp ties, duplicate keys, tombstones, and out-of-order arrival, the
engine's epoch-split merge must equal the sequential pandas oracle — the
table-state-equivalence contract under adversarial inputs (ts ties are broken by
lsn; tombstones must not be resurrected by older events)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_german_fhir_core_spark.cdc import CdcEngine, replay_oracle
from etl_german_fhir_core_spark.lake import SnapshotTable

TS0 = dt.datetime(2025, 1, 1)

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

# small domains force key collisions and ts ties; ops weighted toward updates
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["cA", "cB"]),          # conv_id
        st.integers(0, 2),                      # turn_idx
        st.sampled_from(["I", "U", "U", "D"]),  # op
        st.integers(0, 3),                      # ts offset seconds (ties likely)
        st.sampled_from(["x", "y", "zz"]),      # text payload
    ),
    min_size=1,
    max_size=24,
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@given(events=events_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lww_state_matches_oracle_on_random_feeds(_spark, tmp_path_factory, events):
    spark = _spark
    rows = [
        (
            i + 1,  # lsn: arrival order
            op,
            conv,
            turn,
            None if op == "D" else "user",
            None if op == "D" else text,
            None,
            TS0 + dt.timedelta(seconds=ts_off),
        )
        for i, (conv, turn, op, ts_off, text) in enumerate(events)
    ]
    feed = spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    tmp = tmp_path_factory.mktemp("prop")
    feed_path = str(tmp / "feed")
    feed.write.parquet(feed_path)

    tbl = SnapshotTable.create(
        spark, str(tmp / "tbl"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    # tiny epochs: every LSN range boundary becomes a merge boundary
    CdcEngine(spark, feed_path, tbl, epoch_rows=5, normalize=False).run()

    got = (
        tbl.read().toPandas()[["conv_id", "turn_idx", "text", "ts"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    expect = replay_oracle(feed.toPandas())[["conv_id", "turn_idx", "text", "ts"]]
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


@given(events=events_strategy, split=st.integers(1, 23))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_changes_between_transforms_a_into_b(_spark, tmp_path_factory, events, split):
    """Property: for ANY event sequence cut at ANY point, applying the emitted
    snapshot diff (changes_between) to live state A reproduces live state B —
    inserts/updates/deletes classified correctly under ties, tombstones, and
    out-of-order arrival; unchanged keys never appear in the diff."""
    spark = _spark
    rows = [
        (
            i + 1, op, conv, turn,
            None if op == "D" else "user",
            None if op == "D" else text,
            None, TS0 + dt.timedelta(seconds=ts_off),
        )
        for i, (conv, turn, op, ts_off, text) in enumerate(events)
    ]
    feed = spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    tmp = tmp_path_factory.mktemp("prop_diff")
    tbl = SnapshotTable.create(
        spark, str(tmp / "tbl"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    split = min(split, len(rows))
    tbl.merge(feed.filter(feed.lsn <= split), epoch_id="a")
    s1 = tbl.current_snapshot_id()
    state_a = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in tbl.read().collect()
    }
    if feed.filter(feed.lsn > split).count() > 0:
        tbl.merge(feed.filter(feed.lsn > split), epoch_id="b")
    s2 = tbl.current_snapshot_id()
    state_b = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in tbl.read().collect()
    }

    derived = dict(state_a)
    for r in tbl.changes_between(s1, s2).collect():
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            assert k in state_a and k not in state_b
            derived.pop(k)
        elif r["op"] == "I":
            assert k not in state_a
            derived[k] = r["text"]
        else:  # U
            assert k in state_a and k in state_b
            derived[k] = r["text"]
    assert derived == state_b


@given(
    events=events_strategy,
    cuts=st.lists(st.integers(1, 23), min_size=1, max_size=3, unique=True),
    cadence=st.integers(1, 3),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_changefeed_consumers_converge_on_random_feeds(
    _spark, tmp_path_factory, events, cuts, cadence
):
    """Property: for ANY event sequence merged in ANY epoch slicing, a replica
    fed only by snapshot diffs (ChangeFeedSync) and a COUNT/SUM view fed only
    by signed deltas (AggFeedSync) both converge to the source's live state at
    EVERY sync point, regardless of sync cadence — under ties, tombstones,
    duplicate keys, out-of-order arrival, and empty epochs."""
    from etl_german_fhir_core_spark.streaming import AggFeedSync, ChangeFeedSync

    spark = _spark
    rows = [
        (
            i + 1, op, conv, turn,
            None if op == "D" else "user",
            None if op == "D" else text,
            None, TS0 + dt.timedelta(seconds=ts_off),
        )
        for i, (conv, turn, op, ts_off, text) in enumerate(events)
    ]
    feed = spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    tmp = tmp_path_factory.mktemp("prop_cdf")
    src = SnapshotTable.create(
        spark, str(tmp / "src"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    replica = SnapshotTable.create(
        spark, str(tmp / "rep"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    agg = SnapshotTable.create(
        spark, str(tmp / "agg"),
        T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_rows", T.LongType(), True),
            T.StructField("sum_turn", T.LongType(), True),
        ]),
        ["conv_id"], num_buckets=2,
    )
    rep_sync = ChangeFeedSync(src, replica, str(tmp / "rep_state"))
    agg_sync = AggFeedSync(src, agg, str(tmp / "agg_state"),
                           group_cols=["conv_id"],
                           sum_cols={"sum_turn": "turn_idx"})

    def _check():
        src_live = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in src.read().collect()
        }
        rep_live = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in replica.read().collect()
        }
        assert rep_live == src_live
        from pyspark.sql import functions as F

        expect = {
            r["conv_id"]: (r["n"], r["s"])
            for r in src.read().groupBy("conv_id")
            .agg(F.count("*").alias("n"), F.sum("turn_idx").alias("s"))
            .collect()
        }
        got = {
            r["conv_id"]: (r["n_rows"], r["sum_turn"])
            for r in agg.read().filter("n_rows > 0").collect()
        }
        assert got == expect

    bounds = sorted(set(min(c, len(rows)) for c in cuts)) + [len(rows)]
    lo = 0
    for i, hi in enumerate(b for b in bounds if b > 0):
        if hi > lo:
            src.merge(
                feed.filter((feed.lsn > lo) & (feed.lsn <= hi)),
                epoch_id=f"e{i + 1:06d}",
            )
            lo = hi
        if (i + 1) % cadence == 0:
            rep_sync.sync_once()
            agg_sync.sync_once()
            _check()
    rep_sync.sync_once()
    agg_sync.sync_once()
    _check()


@given(events=events_strategy, do_compact=st.booleans())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mor_lww_state_matches_oracle_on_random_feeds(
    _spark, tmp_path_factory, events, do_compact
):
    """Merge-on-read storage property: for RANDOM adversarial feeds (ts ties,
    duplicate keys, tombstones, out-of-order arrival) split into tiny epochs,
    a MoR table's read-time resolution — optionally after a delta-folding
    compaction — must equal the same sequential pandas oracle as CoW. The
    storage layout must never be observable in the resolved state."""
    spark = _spark
    rows = [
        (
            i + 1,
            op,
            conv,
            turn,
            None if op == "D" else "user",
            None if op == "D" else text,
            None,
            TS0 + dt.timedelta(seconds=ts_off),
        )
        for i, (conv, turn, op, ts_off, text) in enumerate(events)
    ]
    feed = spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    tmp = tmp_path_factory.mktemp("prop_mor")
    feed_path = str(tmp / "feed")
    feed.write.parquet(feed_path)

    tbl = SnapshotTable.create(
        spark, str(tmp / "tbl"), SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=2, merge_mode="mor",
    )
    CdcEngine(spark, feed_path, tbl, epoch_rows=5, normalize=False).run()
    assert tbl.manifest()["files"] == {}  # epochs never wrote base files
    if do_compact:
        tbl.compact(epoch_id="fold")
        assert all(not fs for fs in tbl.manifest()["deltas"].values())

    got = (
        tbl.read().toPandas()[["conv_id", "turn_idx", "text", "ts"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    expect = replay_oracle(feed.toPandas())[["conv_id", "turn_idx", "text", "ts"]]
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
