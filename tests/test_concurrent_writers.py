"""Concurrent-writer commit rebase (VERDICT r04 missing #2): two engines feeding
ONE table — the standard backfill-plus-live-stream lakehouse pattern. Iceberg's
optimistic-concurrency model retries a commit whose conflict is disjoint
(different buckets / epoch ids); a true overlap must still raise.

The race is deterministic: writer A's committer fires the rival's commit right
before A's own PUT-IF-ABSENT, so A always loses the CAS and must rebase.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from etl_german_fhir_core_spark.lake import SnapshotTable
from etl_german_fhir_core_spark.lake.commit import CommitConflict, PosixCommitter

TS0 = dt.datetime(2025, 1, 1, 0, 0, 0)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


class _LoseFirstRace:
    """Committer that triggers ``rival()`` immediately before this writer's
    first commit attempt — guaranteeing the CAS loss that exercises rebase."""

    def __init__(self, rival):
        self._rival = rival
        self._fired = False
        self._inner = PosixCommitter()

    def commit(self, path: str, payload: bytes) -> None:
        if not self._fired:
            self._fired = True
            self._rival()
        self._inner.commit(path, payload)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, lsn long, conv_id string, turn_idx int, "
        "text string, ts timestamp"
    )


def _bucket_of(spark, tbl, conv_id: str) -> int:
    from pyspark.sql import functions as F

    from etl_german_fhir_core_spark.lake.table import _bucket_expr

    return (
        spark.createDataFrame([(conv_id,)], "conv_id string")
        .select(_bucket_expr("conv_id", tbl.num_buckets()).alias("b"))
        .collect()[0]["b"]
    )


def _mk(spark, root) -> SnapshotTable:
    return SnapshotTable.create(spark, root, SCHEMA, ["conv_id", "turn_idx"],
                                num_buckets=8)


def _disjoint_keys(spark, tbl) -> tuple[str, str]:
    """Two conv ids living in different buckets (deterministic scan of c0..c31)."""
    seen: dict[int, str] = {}
    for i in range(32):
        b = _bucket_of(spark, tbl, f"c{i}")
        for ob, ok in seen.items():
            if ob != b:
                return ok, f"c{i}"
        seen[b] = f"c{i}"
    raise AssertionError("no disjoint buckets in 32 keys")


def test_disjoint_concurrent_commits_both_land(spark, tmp_path):
    tbl_b = _mk(spark, str(tmp_path / "t"))
    ka, kb = _disjoint_keys(spark, tbl_b)
    rows_a = [("U", 1, ka, 0, "from-A", TS0)]
    rows_b = [("U", 2, kb, 0, "from-B", TS0)]

    tbl_a = SnapshotTable.load(spark, str(tmp_path / "t"))
    tbl_a.committer = _LoseFirstRace(
        lambda: tbl_b.merge(_batch(spark, rows_b), epoch_id="e-live")
    )
    r = tbl_a.merge(_batch(spark, rows_a), epoch_id="e-backfill")
    assert not r.skipped

    assert tbl_b.has_epoch("e-live") and tbl_b.has_epoch("e-backfill")
    state = {(x["conv_id"], x["text"]) for x in tbl_a.read().collect()}
    # serial reference: same two batches applied one after the other
    ref = _mk(spark, str(tmp_path / "ref"))
    ref.merge(_batch(spark, rows_b), epoch_id="e-live")
    ref.merge(_batch(spark, rows_a), epoch_id="e-backfill")
    ref_state = {(x["conv_id"], x["text"]) for x in ref.read().collect()}
    assert state == ref_state == {(ka, "from-A"), (kb, "from-B")}


def test_overlapping_buckets_still_conflict(spark, tmp_path):
    tbl_b = _mk(spark, str(tmp_path / "t"))
    rows_a = [("U", 1, "cX", 0, "from-A", TS0)]
    rows_b = [("U", 2, "cX", 1, "from-B", TS0)]  # same conv -> same bucket

    tbl_a = SnapshotTable.load(spark, str(tmp_path / "t"))
    tbl_a.committer = _LoseFirstRace(
        lambda: tbl_b.merge(_batch(spark, rows_b), epoch_id="e-live")
    )
    with pytest.raises(CommitConflict, match="same bucket"):
        tbl_a.merge(_batch(spark, rows_a), epoch_id="e-backfill")
    # the winner's commit is intact; the loser's epoch never landed
    assert tbl_b.has_epoch("e-live") and not tbl_b.has_epoch("e-backfill")
    assert {x["text"] for x in tbl_b.read().collect()} == {"from-B"}


def test_duplicate_epoch_race_is_idempotent(spark, tmp_path):
    """Two at-least-once deliveries of the SAME epoch racing: the loser detects
    its epoch already committed at rebase time and returns the idempotent skip."""
    tbl_b = _mk(spark, str(tmp_path / "t"))
    rows = [("U", 1, "cY", 0, "payload", TS0)]

    tbl_a = SnapshotTable.load(spark, str(tmp_path / "t"))
    tbl_a.committer = _LoseFirstRace(
        lambda: tbl_b.merge(_batch(spark, rows), epoch_id="e1")
    )
    r = tbl_a.merge(_batch(spark, rows), epoch_id="e1")
    assert r.skipped
    assert tbl_b.read().count() == 1


def test_disjoint_rebase_with_schema_evolution(spark, tmp_path):
    """The rival adds a column concurrently; the rebased commit unions the
    evolved schema instead of clobbering it."""
    tbl_b = _mk(spark, str(tmp_path / "t"))
    ka, kb = _disjoint_keys(spark, tbl_b)

    def _rival():
        evolved = spark.createDataFrame(
            [("U", 2, kb, 0, "from-B", TS0, "extra-B")],
            "op string, lsn long, conv_id string, turn_idx int, "
            "text string, ts timestamp, tool string",
        )
        tbl_b.merge(evolved, epoch_id="e-live")

    tbl_a = SnapshotTable.load(spark, str(tmp_path / "t"))
    tbl_a.committer = _LoseFirstRace(_rival)
    tbl_a.merge(_batch(spark, [("U", 1, ka, 0, "from-A", TS0)]),
                epoch_id="e-backfill")

    cols = [f.name for f in tbl_a.user_schema()]
    assert "tool" in cols
    got = {(x["conv_id"], x["text"], x["tool"]) for x in tbl_a.read().collect()}
    assert got == {(ka, "from-A", None), (kb, "from-B", "extra-B")}
