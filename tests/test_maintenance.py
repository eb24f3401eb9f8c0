"""Table maintenance: small-file compaction, tombstone expiry, crash-mid-merge
recovery (staging orphans never corrupt; vacuum reclaims them)."""

from __future__ import annotations

import datetime as dt
import os
import signal
import subprocess
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_german_fhir_core_spark.lake import SnapshotTable

TS0 = dt.datetime(2025, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, lsn long, conv_id string, turn_idx int, text string, ts timestamp"
    )


def test_compact_merges_small_files(spark, tmp_path):
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=2, files_per_bucket=4,
    )
    rows = [("I", i, f"c{i % 5}", i, f"t{i}", TS0) for i in range(200)]
    tbl.merge(_batch(spark, rows), epoch_id="1")
    before = tbl.read().sort("conv_id", "turn_idx").collect()
    m = tbl.manifest()
    assert any(len(fs) > 1 for fs in m["files"].values())  # salted multi-file

    tbl.compact(epoch_id="compact1")
    m2 = tbl.manifest()
    assert all(len(fs) <= 1 for fs in m2["files"].values())
    after = tbl.read().sort("conv_id", "turn_idx").collect()
    assert before == after  # content-preserving
    # idempotent
    sid = tbl.current_snapshot_id()
    assert tbl.compact(epoch_id="compact1").skipped
    assert tbl.current_snapshot_id() == sid


def test_expire_tombstones_and_resurrection_boundary(spark, tmp_path):
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    tbl.merge(
        _batch(spark, [("I", 1, "c1", 0, "x", TS0), ("I", 2, "c2", 0, "y", TS0)]),
        epoch_id="1",
    )
    tbl.merge(
        _batch(spark, [("D", 3, "c1", 0, None, TS0 + dt.timedelta(days=1))]),
        epoch_id="2",
    )
    # tombstone retained: an older event cannot resurrect
    tbl.merge(_batch(spark, [("U", 4, "c1", 0, "stale", TS0)]), epoch_id="3")
    assert {r["conv_id"] for r in tbl.read().collect()} == {"c2"}

    # expire tombstones older than day 2 → the c1 tombstone goes away
    tbl.expire_tombstones(TS0 + dt.timedelta(days=2), epoch_id="exp1")
    meta = tbl.read(include_meta=True)
    assert meta.filter(F.coalesce(F.col("_deleted"), F.lit(False))).count() == 0
    # past the retention watermark, a late stale event WOULD resurrect (documented
    # watermark contract — same as Kafka compaction)
    tbl.merge(_batch(spark, [("U", 5, "c1", 0, "post-expiry", TS0)]), epoch_id="4")
    assert {r["conv_id"] for r in tbl.read().collect()} == {"c1", "c2"}


def test_noop_expiry_commits_ledger_marker(spark, tmp_path):
    """ADVICE r03 medium: an expiry pass that finds NO candidates must still
    commit its ledger entry — otherwise a crash-resume replay of that epoch
    re-runs expiry against post-crash state (which may hold late tombstones
    older than the watermark) and drops rows an uninterrupted run retained."""
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    tbl.merge(
        _batch(spark, [("I", 1, "c1", 0, "x", TS0 - dt.timedelta(days=3))]),
        epoch_id="1",
    )
    before = tbl.read().collect()

    r = tbl.expire_tombstones(TS0 - dt.timedelta(days=1), epoch_id="e1/expire")
    assert not r.skipped and tbl.has_epoch("e1/expire")  # decision is durable
    assert tbl.read().collect() == before  # data untouched

    # a LATE tombstone (older than that watermark) lands after the no-op pass;
    # the replayed expiry must short-circuit on the ledger, not re-evaluate
    tbl.merge(
        _batch(spark, [("D", 2, "c1", 0, None, TS0 - dt.timedelta(days=2))]),
        epoch_id="2",
    )
    sid = tbl.current_snapshot_id()
    assert tbl.expire_tombstones(TS0 - dt.timedelta(days=1), epoch_id="e1/expire").skipped
    assert tbl.current_snapshot_id() == sid
    # the late tombstone is still retained (replay did NOT drop it)
    meta = tbl.read(include_meta=True)
    assert meta.filter(F.coalesce(F.col("_deleted"), F.lit(False))).count() == 1


def test_staged_files_narrow_exception_handling(spark, tmp_path):
    """ADVICE r03 medium: _staged_files maps ONLY genuinely-empty-stage
    conditions (missing path / schema-inference failure on an empty dir) to {};
    any transient read failure re-raises — a manifest must never commit empty
    file lists for touched buckets because of a blip."""
    import pytest

    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    # genuinely missing stage dir → empty mapping
    assert tbl._staged_files("data/no-such-stage") == {}

    # transient failure (not an AnalysisException) → re-raised, not swallowed
    class _BoomReader:
        def parquet(self, *_a, **_k):
            raise RuntimeError("transient fs failure")

    class _BoomSpark:
        read = _BoomReader()

    broken = SnapshotTable(spark, str(tmp_path / "t"))
    broken.spark = _BoomSpark()
    with pytest.raises(RuntimeError, match="transient fs failure"):
        broken._staged_files("data/whatever")


def test_crash_mid_merge_leaves_no_corruption(spark, tmp_path):
    """SIGKILL a spark-submit ingest while epochs are committing; the table must
    stay readable at the last committed snapshot, resume must converge to the
    uninterrupted result, and vacuum must reclaim orphaned staging files."""
    import shutil

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = str(tmp_path)
    subprocess.run(
        ["zip", "-qr", f"{work}/engine.zip", "etl_german_fhir_core_spark"],
        cwd=repo, check=True,
    )
    cmd = [
        "spark-submit", "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", f"{work}/engine.zip",
        os.path.join(repo, "jobs", "cdc_ingest_job.py"),
        "--feed", f"{work}/feed", "--table", f"{work}/tbl",
        "--events", "30000", "--epoch-rows", "3000", "--num-buckets", "4",
    ]
    # start, wait until ≥2 epochs committed, then SIGKILL the whole tree
    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    manifest_dir = f"{work}/tbl/_manifests"
    deadline = time.time() + 240
    while time.time() < deadline:
        n = len(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else 0
        if n >= 3:  # snapshot 0 + ≥2 epochs
            break
        time.sleep(0.5)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    assert os.path.isdir(manifest_dir) and len(os.listdir(manifest_dir)) >= 3

    # table readable at last committed snapshot despite the kill; the bounded
    # ledger settles all but the newest epoch, so count committed epochs via
    # watermark + tail, not the tail alone
    tbl = SnapshotTable.load(spark, f"{work}/tbl")
    n_committed = (
        tbl.epochs_through().get("e", 0) + len(tbl.committed_epochs())
    )
    assert n_committed >= 2
    _ = tbl.read().count()

    # resume to completion (same feed, --events dropped so it isn't regenerated)
    resume_cmd = cmd.copy()
    i = resume_cmd.index("--events")
    del resume_cmd[i : i + 2]
    out = subprocess.run(resume_cmd, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]

    # reference: fresh uninterrupted run on the same feed
    ref_cmd = resume_cmd.copy()
    ref_cmd[ref_cmd.index("--table") + 1] = f"{work}/tbl_ref"
    assert subprocess.run(ref_cmd, capture_output=True).returncode == 0

    got = (
        tbl.read().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    ref = (
        SnapshotTable.load(spark, f"{work}/tbl_ref")
        .read().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, ref)

    # vacuum reclaims any staging orphans from the killed merge
    removed = tbl.vacuum()
    assert removed >= 0
    pd.testing.assert_frame_equal(
        tbl.read().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        ref,
    )
    shutil.rmtree(f"{work}/tbl_ref", ignore_errors=True)


def test_commit_race_exactly_one_winner(spark, tmp_path):
    """Two writers racing for the same snapshot id: exactly one commit wins, the
    loser gets CommitConflict (FileExistsError) and the winner's manifest is the
    one readers see — the optimistic-concurrency contract the committer must keep
    on any store (POSIX link here; conditional PUT on S3/GCS)."""
    import pyspark.sql.types as T
    import pytest

    from etl_german_fhir_core_spark.lake import CommitConflict, SnapshotTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "race"), schema, ["conv_id", "turn_idx"], num_buckets=2
    )
    base = tbl.manifest()
    winner = {**base, "snapshot_id": base["snapshot_id"] + 1,
              "parent_id": base["snapshot_id"], "epoch_id": "winner"}
    loser = {**base, "snapshot_id": base["snapshot_id"] + 1,
             "parent_id": base["snapshot_id"], "epoch_id": "loser"}
    tbl._write_manifest(winner)
    with pytest.raises(CommitConflict):
        tbl._write_manifest(loser)
    with pytest.raises(FileExistsError):  # catchable as the stdlib class too
        tbl._write_manifest(loser)
    assert tbl.manifest()["epoch_id"] == "winner"
    # no torn tmp files left behind
    import os

    mdir = os.path.join(str(tmp_path / "race"), "_manifests")
    assert not [f for f in os.listdir(mdir) if ".tmp-" in f]


def test_conditional_put_committer_race_and_fault(spark, tmp_path):
    """The committer interface must actually decouple (VERDICT r02 missing #4):
    (1) the race test passes under the object-store-style conditional-PUT
    committer (CAS authority = key set, no os.link), and (2) the classic
    object-store fault — PUT landed, response lost — is absorbed by the
    idempotent epoch ledger: the caller's retry sees the epoch committed."""
    import pytest

    from etl_german_fhir_core_spark.lake import (
        CommitConflict,
        ConditionalPutCommitter,
        SnapshotTable,
    )

    # (1) race: exactly one winner per snapshot id
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "cas"), SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    tbl.committer = ConditionalPutCommitter()
    base = tbl.manifest()
    winner = {**base, "snapshot_id": base["snapshot_id"] + 1,
              "parent_id": base["snapshot_id"], "epoch_id": "winner"}
    loser = {**base, "snapshot_id": base["snapshot_id"] + 1,
             "parent_id": base["snapshot_id"], "epoch_id": "loser"}
    tbl._write_manifest(winner)
    with pytest.raises(CommitConflict):
        tbl._write_manifest(loser)
    assert tbl.manifest()["epoch_id"] == "winner"

    # (2) fault injection: first PUT lands but the client sees an error
    root2 = str(tmp_path / "cas_fault")
    tbl2 = SnapshotTable.create(
        spark, root2, SCHEMA, ["conv_id", "turn_idx"], num_buckets=2
    )
    tbl2.committer = ConditionalPutCommitter(fail_after_put=1)
    rows = [("I", i, f"c{i % 3}", i, f"t{i}", TS0) for i in range(20)]
    with pytest.raises(TimeoutError):
        tbl2.merge(_batch(spark, rows), epoch_id="e1")
    # at-least-once retry by a fresh writer: ledger says committed → no-op skip
    tbl3 = SnapshotTable.load(spark, root2)
    assert tbl3.merge(_batch(spark, rows), epoch_id="e1").skipped
    assert tbl3.read().count() == 20  # the faulted commit's data is fully live


def test_engine_scheduled_tombstone_expiry(spark, tmp_path):
    """expire_every + tombstone_retention_sec: tombstones older than (epoch max ts
    − retention) are physically dropped on cadence; the watermark derives from
    DATA (replays bit-identical); newer tombstones are retained; a late event
    past the watermark resurrects (documented boundary contract)."""
    import pandas as pd
    import pyspark.sql.types as T

    from etl_german_fhir_core_spark.cdc import CdcEngine, synth_feed, write_feed
    from etl_german_fhir_core_spark.lake import SnapshotTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    feed_path = str(tmp_path / "feed")
    write_feed(synth_feed(spark, 2000, n_convs=30, max_turns=8), feed_path, 2)

    def _run(root, max_epochs=None, **kw):
        tbl = (
            SnapshotTable.load(spark, root)
            if SnapshotTable.exists(root)
            else SnapshotTable.create(spark, root, schema, ["conv_id", "turn_idx"],
                                      num_buckets=4)
        )
        CdcEngine(spark, feed_path, tbl, epoch_rows=500, **kw).run(max_epochs=max_epochs)
        return tbl

    exp_kw = dict(expire_every=2, tombstone_retention_sec=300.0)
    tbl = _run(str(tmp_path / "t"), **exp_kw)
    assert any(e.endswith("/expire") for e in tbl.committed_epochs())

    # every surviving tombstone is younger than the LAST expiry's watermark
    feed = spark.read.parquet(feed_path)
    last_hi = feed.filter((F.col("lsn") > 1500) & (F.col("lsn") <= 2000)).agg(
        F.max("ts")
    ).collect()[0][0]
    wm = last_hi - dt.timedelta(seconds=300)
    tombs = tbl.read(include_meta=True).filter(
        F.coalesce(F.col("_deleted"), F.lit(False))
    )
    assert tombs.filter(F.col("ts") < F.lit(wm)).count() == 0
    n_kept = tombs.count()

    # without expiry the tombstone set is strictly larger (retention bounds it)
    tbl_ref = _run(str(tmp_path / "t_ref"))
    n_all = tbl_ref.read(include_meta=True).filter(
        F.coalesce(F.col("_deleted"), F.lit(False))
    ).count()
    assert n_all > n_kept

    # kill-and-resume with expiry wired stays bit-identical (watermark is data-derived)
    _run(str(tmp_path / "t_resume"), max_epochs=2, **exp_kw)
    tbl_r = _run(str(tmp_path / "t_resume"), **exp_kw)

    def _full(t):
        return (
            t.read(include_meta=True).toPandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(_full(tbl), _full(tbl_r))

    # boundary: an event older than the watermark for an EXPIRED key resurrects
    expired_key = (
        tbl_ref.read(include_meta=True)
        .filter(F.coalesce(F.col("_deleted"), F.lit(False)) & (F.col("ts") < F.lit(wm)))
        .select("conv_id", "turn_idx").limit(1).collect()
    )
    if expired_key:  # deterministic feed → stable, but guard anyway
        ck, tk = expired_key[0]["conv_id"], expired_key[0]["turn_idx"]
        stale = spark.createDataFrame(
            [("U", 99999, ck, tk, None, "stale resurrection", None, TS0)],
            "op string, lsn long, conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp",
        )
        tbl.merge(stale, epoch_id="late-stale")
        got = tbl.read().filter(
            (F.col("conv_id") == ck) & (F.col("turn_idx") == tk)
        ).collect()
        assert len(got) == 1 and got[0]["text"] == "stale resurrection"


def test_engine_scheduled_compaction(spark, tmp_path):
    """compact_every: salted multi-file buckets get rewritten to one file per
    bucket on schedule; state unchanged; replay/resume safe (ledger-gated)."""
    import pyspark.sql.types as T

    from etl_german_fhir_core_spark.cdc import CdcEngine, synth_feed, write_feed
    from etl_german_fhir_core_spark.lake import SnapshotTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    feed_path = str(tmp_path / "feed")
    write_feed(synth_feed(spark, 2000, n_convs=30, max_turns=8, ooo_frac=0.1),
               feed_path, 2)
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, ["conv_id", "turn_idx"],
        num_buckets=4, files_per_bucket=4,  # salted multi-file staging
    )
    eng = CdcEngine(spark, feed_path, tbl, epoch_rows=1000, compact_every=2)
    eng.run()

    m = tbl.manifest()
    assert all(len(fs) <= 1 for fs in m["files"].values())  # compacted
    assert any(e.endswith("/compact") for e in m["committed_epochs"])
    state_before = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in tbl.read().collect()
    )

    # replay: everything (incl. compaction epochs) is a no-op
    sid = tbl.current_snapshot_id()
    CdcEngine(spark, feed_path, tbl, epoch_rows=1000, compact_every=2).run()
    assert tbl.current_snapshot_id() == sid
    state_after = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in tbl.read().collect()
    )
    assert state_before == state_after
