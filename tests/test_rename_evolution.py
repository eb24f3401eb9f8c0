"""Column-rename schema evolution (VERDICT r04 missing #3 / next #6): a
metadata-only rename preserved across merge, LWW replay, and changes_between —
the reference's ALTER TABLE ... RENAME migrations
(pre_process_alter_tables.sql:45-46, InitOmopDb.java:111-141), re-expressed as
Iceberg-style identity carried by the manifest (rename map) instead of data
rewrites."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from etl_german_fhir_core_spark.cdc import CdcEngine, synth_feed, write_feed
from etl_german_fhir_core_spark.lake import SnapshotTable

TS0 = dt.datetime(2025, 1, 1, 0, 0, 0)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, lsn long, conv_id string, turn_idx int, role string, "
        "text string, ts timestamp"
    )


def _mk(spark, root):
    return SnapshotTable.create(spark, root, SCHEMA, ["conv_id", "turn_idx"],
                                num_buckets=4)


def test_rename_mid_stream_reads_merges_and_replays(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    tbl.merge(_batch(spark, [
        ("U", 1, "c1", 0, "user", "hello", TS0),
        ("U", 2, "c2", 0, "assistant", "hi", TS0),
    ]), epoch_id="e000001")
    snap_pre = tbl.current_snapshot_id()

    tbl.rename_column("role", "speaker", epoch_id="rename-role")
    assert [f.name for f in tbl.user_schema()] == ["conv_id", "turn_idx",
                                                   "speaker", "text", "ts"]
    # old files (written under 'role') resolve through the rename map
    got = {r["conv_id"]: r["speaker"] for r in tbl.read().collect()}
    assert got == {"c1": "user", "c2": "assistant"}

    # a feed that still ships the FORMER name keeps merging (identity by map,
    # not wire name) — including an LWW overwrite of a pre-rename row
    tbl.merge(_batch(spark, [
        ("U", 3, "c1", 0, "system", "hello v2", TS0 + dt.timedelta(seconds=5)),
        ("U", 4, "c3", 0, "user", "new", TS0),
    ]), epoch_id="e000002")
    got = {r["conv_id"]: (r["speaker"], r["text"]) for r in tbl.read().collect()}
    assert got["c1"] == ("system", "hello v2") and got["c3"] == ("user", "new")

    # and a feed already using the NEW name merges identically
    tbl.merge(
        spark.createDataFrame(
            [("U", 5, "c4", 0, "tool", "four", TS0)],
            "op string, lsn long, conv_id string, turn_idx int, "
            "speaker string, text string, ts timestamp",
        ),
        epoch_id="e000003",
    )
    assert tbl.read().filter("conv_id = 'c4'").collect()[0]["speaker"] == "tool"

    # old-epoch replay is a ledgered no-op — bit-identical snapshot
    sid = tbl.current_snapshot_id()
    assert tbl.merge(_batch(spark, [("U", 1, "c1", 0, "user", "hello", TS0)]),
                     epoch_id="e000001").skipped
    assert tbl.current_snapshot_id() == sid

    # diff ACROSS the rename: payload arrives under the new name with correct
    # old-file values (D/U sides conformed through the map)
    diff = {(r["op"], r["conv_id"]): r["speaker"]
            for r in tbl.changes_between(snap_pre, sid).collect()}
    assert diff[("U", "c1")] == "system"
    assert diff[("I", "c3")] == "user" and diff[("I", "c4")] == "tool"


def test_rename_chain_and_guards(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    tbl.merge(_batch(spark, [("U", 1, "c1", 0, "user", "hello", TS0)]),
              epoch_id="e000001")
    tbl.rename_column("role", "speaker", epoch_id="r1")
    tbl.rename_column("speaker", "actor", epoch_id="r2")
    # the whole former-name history rides along: oldest files still resolve
    assert tbl.read().collect()[0]["actor"] == "user"
    assert tbl.manifest()["renamed_cols"] == {"actor": ["speaker", "role"]}

    # pinned columns refuse to rename
    with pytest.raises(ValueError, match="pinned"):
        tbl.rename_column("conv_id", "cid", epoch_id="rk")
    with pytest.raises(ValueError, match="pinned"):
        tbl.rename_column("ts", "event_ts", epoch_id="rt")
    # retired names cannot come back — neither as a rename target...
    with pytest.raises(ValueError, match="retired"):
        tbl.rename_column("text", "role", epoch_id="rr")
    # ...nor as a fresh column introduced by a batch that also carries 'actor'
    with pytest.raises(TypeError, match="retired"):
        tbl.merge(
            spark.createDataFrame(
                [("U", 9, "c9", 0, "x", "y", "z", TS0)],
                "op string, lsn long, conv_id string, turn_idx int, "
                "actor string, role string, text string, ts timestamp",
            ),
            epoch_id="e000009",
        )
    # idempotent replay of the rename itself
    sid = tbl.current_snapshot_id()
    assert tbl.rename_column("text", "body", epoch_id="r3").snapshot_id == sid + 1
    assert tbl.rename_column("text", "body", epoch_id="r3").skipped


def test_engine_resume_across_rename(spark, tmp_path):
    """Kill → rename a payload column → resume with the UNCHANGED feed: the
    engine's remaining epochs conform through the map and the final state
    matches the pre-rename oracle modulo the column name."""
    feed_path = str(tmp_path / "feed")
    write_feed(synth_feed(spark, 1200, n_convs=30, max_turns=8, ooo_frac=0.15),
               feed_path, 2)
    schema = T.StructType(list(SCHEMA) + [T.StructField("tool", T.StringType(), True)])

    def _eng(root):
        tbl = (SnapshotTable.load(spark, root) if SnapshotTable.exists(root)
               else SnapshotTable.create(spark, root, schema,
                                         ["conv_id", "turn_idx"], num_buckets=4))
        return CdcEngine(spark, feed_path, tbl, epoch_rows=400)

    ref = _eng(str(tmp_path / "ref"))
    ref.run()

    eng = _eng(str(tmp_path / "t"))
    eng.run(max_epochs=1)
    eng.table.rename_column("tool", "tool_name", epoch_id="migrate-tool")
    eng2 = _eng(str(tmp_path / "t"))
    eng2.run()

    import pandas as pd

    a = (ref.table.read().toPandas().rename(columns={"tool": "tool_name"})
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (eng2.table.read().toPandas()
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
