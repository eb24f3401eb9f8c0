"""spark-submit entry point: replay a change feed into a SnapshotTable.

Usage:
  spark-submit --py-files engine.zip jobs/cdc_ingest_job.py \
      --feed /path/feed_parquet --table /path/table_root \
      [--epoch-rows 100000] [--events N  # synthesize feed first] \
      [--num-buckets 16] [--lineage /path/lineage]

The job is restartable: re-submitting after a kill resumes from the last committed
epoch (manifest = checkpoint). Prints one JSON line with throughput + lineage totals.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--epoch-rows", type=int, default=100_000)
    ap.add_argument("--events", type=int, default=0, help="synthesize feed of N events first")
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--merge-mode", choices=["cow", "mor"], default="cow",
                    help="'mor' appends per-bucket delta files per epoch "
                         "(write cost O(batch), LWW resolved at read; pair "
                         "with --compact-every to fold deltas) instead of "
                         "copy-on-writing whole touched buckets")
    ap.add_argument("--skew-frac", type=float, default=0.0)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--rollup", default=None,
                    help="maintain a per-conversation period rollup table at this "
                         "root (state-mode: delete-aware, recomputed from final "
                         "LWW state per epoch)")
    ap.add_argument("--dead-letter", default=None,
                    help="preserve validity-gate failures per epoch under this dir")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="rewrite multi-file buckets to one file every k-th epoch")
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--bulk-until-lsn", type=int, default=None,
                    help="bootstrap a FRESH table by bulk-overwriting the feed "
                         "slice lsn <= N first (reference bulk mode); the engine "
                         "then resumes incrementally strictly after that offset "
                         "(bootstrap_hi_lsn handoff, persisted in the manifest)")
    ap.add_argument("--gen-only", action="store_true",
                    help="only synthesize the feed, then exit (keeps bench runs "
                         "unpolluted by generation-phase JVM state)")
    ap.add_argument("--warmup-epochs", type=int, default=0,
                    help="run this many epochs before starting the throughput "
                         "timer (JVM/codegen warmup; the metric is SUSTAINED "
                         "events/sec per BASELINE.json)")
    ap.add_argument("--repeat-epoch", type=int, default=0,
                    help="fixed-work bench mode: after one warmup epoch, re-apply "
                         "the SAME lsn range as fresh epoch ids this many times — "
                         "table size and per-epoch work stay constant, so epoch "
                         "times are directly comparable and min() filters "
                         "environment noise bursts")
    args = ap.parse_args()

    from etl_german_fhir_core_spark.cdc import CdcEngine, synth_feed, write_feed
    from etl_german_fhir_core_spark.lake import SnapshotTable

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.events:
        write_feed(
            synth_feed(spark, args.events, n_convs=max(args.events // 100, 10),
                       skew_frac=args.skew_frac, ooo_frac=0.1),
            args.feed,
            n_files=max(spark.sparkContext.defaultParallelism, 8),
        )
        if args.gen_only:
            print(json.dumps({"generated": args.events, "feed": args.feed}))
            return

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
    if SnapshotTable.exists(args.table):
        tbl = SnapshotTable.load(spark, args.table)
    else:
        tbl = SnapshotTable.create(
            spark, args.table, schema, ["conv_id", "turn_idx"],
            num_buckets=args.num_buckets, merge_mode=args.merge_mode,
        )
        if args.bulk_until_lsn is not None:
            from pyspark.sql import functions as F

            from etl_german_fhir_core_spark.functions.text import normalize_turns

            # same per-turn mapper pipeline the incremental engine applies to
            # winners — bulk-loaded and incrementally-merged rows must be
            # byte-identical for the same events (table-state equivalence)
            bulk = normalize_turns(
                spark.read.parquet(args.feed).filter(F.col("lsn") <= args.bulk_until_lsn)
            )
            tbl.overwrite(bulk, epoch_id="bulk")

    rollups = []
    if args.rollup:
        from pyspark.sql import functions as F

        from etl_german_fhir_core_spark.cdc import RollupSpec

        rollup_schema = T.StructType(
            [
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("period_start", T.TimestampType(), True),
                T.StructField("period_end", T.TimestampType(), True),
                T.StructField("n_turns", T.LongType(), True),
            ]
        )
        rtbl = (
            SnapshotTable.load(spark, args.rollup)
            if SnapshotTable.exists(args.rollup)
            else SnapshotTable.create(
                spark, args.rollup, rollup_schema, ["conv_id"],
                num_buckets=args.num_buckets,
            )
        )
        rollups.append(
            RollupSpec(
                table=rtbl,
                partial=lambda state: state.groupBy("conv_id").agg(
                    F.min("ts").alias("period_start"),
                    F.max("ts").alias("period_end"),
                    F.count("*").alias("n_turns"),
                ),
                mode="state",
            )
        )

    eng = CdcEngine(
        spark, args.feed, tbl, epoch_rows=args.epoch_rows, lineage_path=args.lineage,
        rollups=rollups, dead_letter_path=args.dead_letter,
        compact_every=args.compact_every,
    )
    if args.repeat_epoch:
        eng.run(max_epochs=1)  # warmup + establish steady-state table
        t0 = time.time()
        for i in range(args.repeat_epoch):
            eng.apply_epoch(f"rep{i:03d}", 0, args.epoch_rows)
        elapsed = time.time() - t0
        results = eng.results[1:]
    else:
        if args.warmup_epochs:
            eng.run(max_epochs=args.warmup_epochs)
        t0 = time.time()
        results = eng.run(max_epochs=args.max_epochs)
        elapsed = time.time() - t0
    applied = [r for r in results if not r.skipped_commit]
    events = sum(r.rows_in for r in applied)
    print(
        json.dumps(
            {
                "epoch_secs": [r.elapsed_sec for r in results if not r.skipped_commit],
                "epochs_total": len(results),
                "epochs_applied": len(applied),
                "events_processed": events,
                "elapsed_sec": round(elapsed, 2),
                "events_per_sec": round(events / elapsed, 1) if elapsed > 0 else None,
                "rows_upserted": sum(r.rows_applied for r in applied),
                "rows_deleted": sum(r.rows_deleted for r in applied),
                "conflicts": sum(r.conflict_count for r in applied),
                "final_rows": tbl.read().count(),
                "snapshot": tbl.current_snapshot_id(),
            }
        )
    )


if __name__ == "__main__":
    main()
