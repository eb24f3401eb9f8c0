"""W1/T15: per-record multi-table fan-out — one change feed routed into multiple
domain tables per epoch, FK-ordered, exactly-once per child, resume-safe
(reference: ConditionMapper emits condition_occurrence/measurement/observation
from one resource; OmopWriter flushes the wrapped batch per transaction)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_german_fhir_core_spark.cdc import CdcEngine, ProjectionSpec
from etl_german_fhir_core_spark.lake import SnapshotTable

TARGET = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

USER_TURNS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TOOL_CALLS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TS0 = dt.datetime(2025, 1, 1)


def _mk_feed(spark, path, n=60):
    rows = []
    for i in range(n):
        role = ["user", "assistant", "tool"][i % 3]
        rows.append((i + 1, "I", f"c{i % 5}", i % 12, role, f"text {i}",
                     f"tool_{i % 4}" if role == "tool" else None,
                     TS0 + dt.timedelta(seconds=i)))
    spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    ).write.parquet(path)


def _route_user(batch):
    return batch.filter(F.col("role") == "user").select(
        "op", "lsn", "conv_id", "turn_idx", "text", "ts"
    )


def _route_tool(batch):
    return batch.filter(F.col("role") == "tool").select(
        "op", "lsn", "conv_id", "turn_idx", "tool", "ts"
    )


def _mk(spark, tmp_path, tag):
    feed_path = str(tmp_path / "feed")
    main = SnapshotTable.create(
        spark, str(tmp_path / f"main_{tag}"), TARGET, ["conv_id", "turn_idx"], num_buckets=4
    )
    ut = SnapshotTable.create(
        spark, str(tmp_path / f"ut_{tag}"), USER_TURNS, ["conv_id", "turn_idx"], num_buckets=4
    )
    tc = SnapshotTable.create(
        spark, str(tmp_path / f"tc_{tag}"), TOOL_CALLS, ["conv_id", "turn_idx"], num_buckets=4
    )
    return feed_path, main, ut, tc


def _eng(spark, feed_path, main, ut, tc):
    return CdcEngine(
        spark, feed_path, main, epoch_rows=20,
        projections=[
            ProjectionSpec(table=ut, transform=_route_user),
            ProjectionSpec(table=tc, transform=_route_tool),
        ],
    )


def _state(tbl):
    return (
        tbl.read().toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_projections_consume_effective_batch(spark, tmp_path):
    """ADVICE r02 medium: children must see the SAME validity-filtered +
    retry-adjusted frame the main merge applies — dead-lettered rows never reach
    a child, and a row parked in epoch k fans out when it retries in epoch k+1."""
    rows = [
        (1, "I", "c1", 0, "user", "hello", None, TS0),
        # turn 3 before its conversation has any turn 0 → parked in epoch 1
        (2, "I", "c9", 3, "user", "late ref", None, TS0 + dt.timedelta(seconds=2)),
        # invalid (I with null text) → dead-lettered, must never reach the child
        (3, "I", "c1", 1, "user", None, None, TS0 + dt.timedelta(seconds=3)),
        # epoch 2: the anchor arrives → c9/3 retries and applies here
        (4, "I", "c9", 0, "user", "anchor", None, TS0 + dt.timedelta(seconds=4)),
        (5, "I", "c1", 2, "user", "more", None, TS0 + dt.timedelta(seconds=5)),
    ]
    feed_path = str(tmp_path / "feed")
    spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    ).write.parquet(feed_path)

    def _identity(batch):
        return batch.select("op", "lsn", "conv_id", "turn_idx", "text", "ts")

    def _engine(tag):
        main = (
            SnapshotTable.load(spark, str(tmp_path / f"m_{tag}"))
            if SnapshotTable.exists(str(tmp_path / f"m_{tag}"))
            else SnapshotTable.create(
                spark, str(tmp_path / f"m_{tag}"), TARGET,
                ["conv_id", "turn_idx"], num_buckets=4,
            )
        )
        child = (
            SnapshotTable.load(spark, str(tmp_path / f"u_{tag}"))
            if SnapshotTable.exists(str(tmp_path / f"u_{tag}"))
            else SnapshotTable.create(
                spark, str(tmp_path / f"u_{tag}"), USER_TURNS,
                ["conv_id", "turn_idx"], num_buckets=4,
            )
        )
        return CdcEngine(
            spark, feed_path, main, epoch_rows=3,
            dead_letter_path=str(tmp_path / f"dlq_{tag}"),
            require_turn0=True, max_retries=3,
            projections=[ProjectionSpec(table=child, transform=_identity)],
        ), child

    eng, child = _engine("a")
    eng.run()

    def keys(tbl):
        return sorted(
            (r["conv_id"], r["turn_idx"])
            for r in tbl.read().select("conv_id", "turn_idx").collect()
        )

    parent_keys = keys(eng.table)
    assert parent_keys == [("c1", 0), ("c1", 2), ("c9", 0), ("c9", 3)]
    # child == parent: no dead-lettered row, and the retried row IS present
    assert keys(child) == parent_keys

    # kill-and-resume: child still converges to the identical state (the resume
    # path re-derives the effective batch deterministically)
    eng_b, child_b = _engine("b")
    eng_b.run(max_epochs=1)
    eng_b2, child_b2 = _engine("b")
    eng_b2.run()
    assert keys(child_b2) == parent_keys
    pd.testing.assert_frame_equal(_state(child), _state(child_b2))


def test_resume_anchor_check_uses_pre_epoch_snapshot(spark, tmp_path):
    """Edge: an epoch both DELETES a conversation's turn 0 and UPDATES one of its
    later turns. At original-run time the anchor (turn 0) was in the table, so
    the update applied; on the skipped-commit resume path the CURRENT snapshot
    no longer shows the anchor (the same epoch tombstoned it), so re-deriving
    the effective batch must read the PRE-epoch snapshot — otherwise the child
    projection silently loses the update."""
    rows = [
        (1, "I", "c1", 0, "user", "anchor c1", None, TS0),
        (2, "I", "c2", 0, "user", "anchor c2", None, TS0 + dt.timedelta(seconds=1)),
        # epoch 2: delete c1's anchor AND update c1 turn 5 in the same epoch
        (3, "D", "c1", 0, None, None, None, TS0 + dt.timedelta(seconds=2)),
        (4, "I", "c1", 5, "user", "late turn five", None, TS0 + dt.timedelta(seconds=3)),
    ]
    feed_path = str(tmp_path / "feed_anchor")
    spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    ).write.parquet(feed_path)

    main = SnapshotTable.create(
        spark, str(tmp_path / "m_anchor"), TARGET, ["conv_id", "turn_idx"], num_buckets=4
    )
    # original run: main commits both epochs, NO projection wired (the crash
    # window between main commit and child commit)
    CdcEngine(spark, feed_path, main, epoch_rows=2, require_turn0=True).run()
    keys_main = {
        (r["conv_id"], r["turn_idx"])
        for r in main.read().select("conv_id", "turn_idx").collect()
    }
    assert ("c1", 5) in keys_main  # anchored at original time → applied

    # resume with the projection wired: replays must re-anchor against the
    # PRE-epoch snapshot (turn 0 still visible there) and fan c1/5 out
    child = SnapshotTable.create(
        spark, str(tmp_path / "u_anchor"), USER_TURNS, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    eng = CdcEngine(
        spark, feed_path, main, epoch_rows=2, require_turn0=True,
        projections=[ProjectionSpec(
            table=child,
            transform=lambda b: b.select("op", "lsn", "conv_id", "turn_idx", "text", "ts"),
        )],
    )
    res = eng.run()
    assert all(r.skipped_commit for r in res)
    keys_child = {
        (r["conv_id"], r["turn_idx"])
        for r in child.read().select("conv_id", "turn_idx").collect()
    }
    assert ("c1", 5) in keys_child


def test_multi_table_fanout_routes_and_resumes(spark, tmp_path):
    _mk_feed(spark, str(tmp_path / "feed"))

    feed_path, main, ut, tc = _mk(spark, tmp_path, "a")
    _eng(spark, feed_path, main, ut, tc).run()
    assert main.read().count() == 60
    assert ut.read().count() == 20 and tc.read().count() == 20
    assert {r["tool"] for r in tc.read().select("tool").distinct().collect()} == {
        "tool_0", "tool_1", "tool_2", "tool_3"
    }
    # children committed per epoch (3 epochs of 20); the bounded ledger settles
    # all but the newest epoch into the watermark
    assert all(ut.has_epoch(e) for e in ("e000001", "e000002", "e000003"))
    assert ut.epochs_through().get("e", 0) + len(ut.committed_epochs()) == 3

    # kill-and-resume: children written by a fresh engine match uninterrupted run
    feed_path, main_b, ut_b, tc_b = _mk(spark, tmp_path, "b")
    _eng(spark, feed_path, main_b, ut_b, tc_b).run(max_epochs=1)
    _eng(spark, feed_path, main_b, ut_b, tc_b).run()
    pd.testing.assert_frame_equal(_state(ut), _state(ut_b))
    pd.testing.assert_frame_equal(_state(tc), _state(tc_b))

    # crash between main commit and child fan-out: resume repairs the children.
    # Fault injected AFTER the main merge, BEFORE projections — every epoch is
    # committed but UNSETTLED (settlement happens only after all derived
    # commits), so resume takes the replay path and re-derives the fan-out
    # instead of fast-skipping (the bounded-ledger watermark must never cover
    # an epoch with pending derived work).
    feed_path, main_c, ut_c, tc_c = _mk(spark, tmp_path, "c")
    eng_c = _eng(spark, feed_path, main_c, ut_c, tc_c)

    def _boom(batch, epoch_id):
        raise RuntimeError("injected crash before fan-out")

    eng_c._apply_projections = _boom
    import pytest

    with pytest.raises(RuntimeError, match="injected crash"):
        eng_c.run()
    assert main_c.has_epoch("e000001") and ut_c.read().count() == 0
    assert main_c.epochs_through() == {}  # nothing settled past the crash
    res = _eng(spark, feed_path, main_c, ut_c, tc_c).run()
    assert all(r.skipped_commit for r in res[:1])  # e000001 replayed, not skipped
    pd.testing.assert_frame_equal(_state(ut), _state(ut_c))

    # replay is a no-op for children
    sid = ut_b.current_snapshot_id()
    _eng(spark, feed_path, main_b, ut_b, tc_b).run()
    assert ut_b.current_snapshot_id() == sid
