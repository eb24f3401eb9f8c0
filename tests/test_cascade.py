"""Cross-table cascade delete (O9 analog: reference rewrites FKs to ON DELETE
CASCADE, pre_processing/pre_process_alter_tables.sql:48-98): tombstoning a parent
conversation removes child rows in dependent tables within the same epoch,
idempotently, and kill-and-resume stays bit-identical."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_german_fhir_core_spark.cdc import CascadeSpec, CdcEngine
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

CHILD = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("annotation", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TS0 = dt.datetime(2025, 1, 1)


def _conv_delete_keys(batch):
    """Parent-delete fan-out rule: a tombstone for turn 0 deletes the conversation.
    Carries the delete event's (ts, lsn) so the child tombstones adopt the
    cascade's order position (late older child events cannot resurrect)."""
    return batch.filter((F.col("op") == "D") & (F.col("turn_idx") == 0)).select(
        "conv_id", "ts", "lsn"
    )


def _mk_feed(spark, path):
    rows = []
    lsn = 0
    for c in ("cA", "cB", "cC"):
        for t in range(4):
            lsn += 1
            rows.append(("I", lsn, c, t, "user", f"{c} turn {t}", None,
                         TS0 + dt.timedelta(seconds=lsn)))
    # epoch 2: conversation-level delete of cB (tombstone turn 0)
    lsn = 20
    rows.append(("D", 21, "cB", 0, None, None, None, TS0 + dt.timedelta(seconds=100)))
    rows.append(("I", 22, "cA", 4, "user", "cA turn 4", None, TS0 + dt.timedelta(seconds=101)))
    df = spark.createDataFrame(
        [(r[1], r[0], r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    df.write.parquet(path)


def _mk_child(spark, root):
    child = SnapshotTable.create(spark, root, CHILD, ["conv_id", "turn_idx"], num_buckets=4)
    seed = spark.createDataFrame(
        [("I", i + 1, c, t, f"note {c}/{t}", TS0)
         for i, (c, t) in enumerate((c, t) for c in ("cA", "cB", "cC") for t in range(4))],
        "op string, lsn long, conv_id string, turn_idx int, annotation string, ts timestamp",
    )
    child.merge(seed, epoch_id="seed")
    return child


def _run(spark, tmp_path, tag, max_epochs=None, resume=False):
    feed_path = str(tmp_path / "feed")
    main_root = str(tmp_path / f"main_{tag}")
    child_root = str(tmp_path / f"child_{tag}")
    if not resume:
        SnapshotTable.create(spark, main_root, TARGET, ["conv_id", "turn_idx"], num_buckets=4)
        _mk_child(spark, child_root)
    main = SnapshotTable.load(spark, main_root)
    child = SnapshotTable.load(spark, child_root)
    eng = CdcEngine(
        spark, feed_path, main, epoch_rows=12,
        cascades=[CascadeSpec(table=child, keys=_conv_delete_keys)],
    )
    eng.run(max_epochs=max_epochs)
    return main, child


def _state(tbl) -> pd.DataFrame:
    return (
        tbl.read().toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_cascade_delete_no_orphans_and_resume_identical(spark, tmp_path):
    _mk_feed(spark, str(tmp_path / "feed"))

    # uninterrupted run
    main_a, child_a = _run(spark, tmp_path, "a")
    child_convs = {r["conv_id"] for r in child_a.read().select("conv_id").distinct().collect()}
    assert "cB" not in child_convs  # no orphans in the child
    assert {"cA", "cC"} <= child_convs  # unrelated conversations untouched
    main_convs = {r["conv_id"] for r in main_a.read().select("conv_id").distinct().collect()}
    assert "cB" in main_convs  # only turn 0 tombstoned in the parent feed here

    # killed after epoch 1 (before the delete epoch), then resumed
    _run(spark, tmp_path, "b", max_epochs=1)
    main_b, child_b = _run(spark, tmp_path, "b", resume=True)
    pd.testing.assert_frame_equal(_state(main_a), _state(main_b))
    pd.testing.assert_frame_equal(_state(child_a), _state(child_b))

    # replaying everything is a no-op for the child too (exactly-once)
    sid = child_b.current_snapshot_id()
    _run(spark, tmp_path, "b", resume=True)
    assert child_b.current_snapshot_id() == sid


def test_cascade_tombstones_suppress_late_resurrection(spark, tmp_path):
    """ADVICE r02 medium: cascaded child rows must become RETAINED tombstones with
    the cascade's order position — a child-directed change event for the cascaded
    key arriving in a later epoch with an OLDER (ts, lsn) must stay suppressed,
    while a genuinely NEWER event still applies (real LWW semantics)."""
    _mk_feed(spark, str(tmp_path / "feed"))
    main_a, child_a = _run(spark, tmp_path, "t")

    # cascaded keys are retained as hidden tombstones, not physically removed
    meta = child_a.read(include_meta=True)
    tombs = meta.filter(F.coalesce(F.col("_deleted"), F.lit(False))).select("conv_id")
    assert {r["conv_id"] for r in tombs.distinct().collect()} == {"cB"}

    # late re-delivery of the ORIGINAL child row (ts older than the cascade's
    # ts=TS0+100s): LWW suppresses it
    late_old = spark.createDataFrame(
        [("I", 50, "cB", 1, "resurrected note", TS0 + dt.timedelta(seconds=5))],
        "op string, lsn long, conv_id string, turn_idx int, annotation string, ts timestamp",
    )
    child_a.merge(late_old, epoch_id="late-old")
    assert child_a.read().filter(F.col("conv_id") == "cB").count() == 0

    # a genuinely NEWER child event (ts after the cascade) re-creates the row
    late_new = spark.createDataFrame(
        [("I", 60, "cB", 1, "legit new note", TS0 + dt.timedelta(seconds=500))],
        "op string, lsn long, conv_id string, turn_idx int, annotation string, ts timestamp",
    )
    child_a.merge(late_new, epoch_id="late-new")
    got = child_a.read().filter(F.col("conv_id") == "cB").collect()
    assert len(got) == 1 and got[0]["annotation"] == "legit new note"


def test_cascade_discordant_parent_deletes_carry_one_event(spark, tmp_path):
    """ADVICE r03 low: two parent deletes for one scope key with DISCORDANT
    ordering (higher ts but lower lsn vs lower ts, higher lsn) must synthesize a
    tombstone carrying ONE actual event's (ts, lsn) — the composite-order max —
    never a per-column mix (ts from one, lsn from the other) that belongs to
    neither and would shift the LWW boundary for late child events."""
    child = _mk_child(spark, str(tmp_path / "child_d"))
    # delete A: ts=+100s, lsn=5 (composite winner); delete B: ts=+90s, lsn=7.
    # Per-column max would fabricate (ts=+100s, lsn=7).
    keys = spark.createDataFrame(
        [("cB", TS0 + dt.timedelta(seconds=100), 5),
         ("cB", TS0 + dt.timedelta(seconds=90), 7)],
        "conv_id string, ts timestamp, lsn long",
    )
    child.cascade_tombstones(keys, epoch_id="casc-discordant")
    tomb = (
        child.read(include_meta=True)
        .filter(F.coalesce(F.col("_deleted"), F.lit(False)) & (F.col("conv_id") == "cB"))
        .select("ts", "_lsn")
        .distinct()
        .collect()
    )
    assert len(tomb) == 1
    assert tomb[0]["ts"] == TS0 + dt.timedelta(seconds=100)
    assert tomb[0]["_lsn"] == 5  # the winner's own lsn, not max-of-lsns (7)


def test_cascade_applies_on_resume_after_main_commit(spark, tmp_path):
    """Crash between the parent merge commit and the child delete: the resume path
    must still fan the delete out (the child's own ledger decides)."""
    _mk_feed(spark, str(tmp_path / "feed"))
    feed_path = str(tmp_path / "feed")
    main_root, child_root = str(tmp_path / "main_c"), str(tmp_path / "child_c")
    SnapshotTable.create(spark, main_root, TARGET, ["conv_id", "turn_idx"], num_buckets=4)
    child = _mk_child(spark, child_root)

    # crash simulation: run ALL epochs with no cascade wired (parent committed,
    # child never touched)
    CdcEngine(spark, feed_path, SnapshotTable.load(spark, main_root), epoch_rows=12).run()
    assert {r["conv_id"] for r in child.read().select("conv_id").distinct().collect()} == {
        "cA", "cB", "cC"
    }

    # resume with the cascade wired: skipped epochs still fan out the delete
    eng = CdcEngine(
        spark, feed_path, SnapshotTable.load(spark, main_root), epoch_rows=12,
        cascades=[CascadeSpec(table=child, keys=_conv_delete_keys)],
    )
    results = eng.run()
    assert all(r.skipped_commit for r in results)
    child_convs = {r["conv_id"] for r in child.read().select("conv_id").distinct().collect()}
    assert "cB" not in child_convs
