"""spark-submit entry point: fixed-work MinHash+LSH dedup for the N-vs-4N scaling
protocol (BENCH/BASELINE.md — the dedup-family counterpart of cdc_ingest_job).

Usage:
  spark-submit --py-files engine.zip jobs/dedup_scale_job.py \
      --docs /path/docs_parquet [--n-docs 40000 --gen-only] [--repeat 3]

Corpus generation is hash-deterministic (no RNG/wall clock): every 10th document
is a near-duplicate of its predecessor (same word stream + a 3-word tail), giving
a stable ~10% duplicate density at any size. Generation runs in its own JVM
(--gen-only) so the timed run is unpolluted. The timed phase repeats the IDENTICAL
minhash_lsh_pairs job ``--repeat`` times after one warmup; min() filters sandbox
noise bursts. Prints one JSON line {"rep_secs": [...], "pairs": N}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WORDS_PER_DOC = 60
VOCAB = 5000


def synth_docs(spark, n_docs: int):
    """Deterministic near-dup corpus: doc i's words derive from xxhash64(base, j)
    where base collapses every (9 mod 10)-th doc onto its predecessor."""
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    base = F.when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base, F.lit(j)), F.lit(VOCAB)).cast("string"),
        )
        for j in range(WORDS_PER_DOC)
    ]
    text = F.concat_ws(" ", *words)
    text = F.when(
        F.col("doc_id") % 10 == 9, F.concat(text, F.lit(" neardup tail marker"))
    ).otherwise(text)
    return df.select("doc_id", text.alias("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--n-docs", type=int, default=0)
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--stages", action="store_true",
        help="additionally time the pipeline PREFIXES once each (signature agg; "
        "+bucket-join candidates) so a scaling gap can be attributed to a stage",
    )
    args = ap.parse_args()

    from etl_german_fhir_core_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.n_docs:
        synth_docs(spark, args.n_docs).repartition(
            max(spark.sparkContext.defaultParallelism, 8)
        ).write.mode("overwrite").parquet(args.docs)
        if args.gen_only:
            print(json.dumps({"generated": args.n_docs, "docs": args.docs}))
            return

    docs = spark.read.parquet(args.docs)

    def one_run() -> tuple[float, int]:
        spark.catalog.clearCache()
        t0 = time.time()
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8, verify_threshold=0.5
        )
        n = pairs.count()
        return round(time.time() - t0, 3), n

    one_run()  # warmup (JIT/codegen)
    rep_secs, n_pairs = [], 0
    for _ in range(args.repeat):
        s, n_pairs = one_run()
        rep_secs.append(s)
    out = {"rep_secs": rep_secs, "pairs": n_pairs}

    if args.stages:
        # pipeline-prefix timings (warm JVM): sig = shingle explode + signature
        # agg; cand = sig + banded bucket self-join + distinct. Stage deltas
        # (cand − sig, full − cand) attribute the scaling curve to a stage.
        spark.catalog.clearCache()
        t0 = time.time()
        n_sigs = minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=32).count()
        out["sig_secs"] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        t0 = time.time()
        n_cand = minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8,
            verify_threshold=None,
        ).count()
        out["cand_secs"] = round(time.time() - t0, 3)
        out["n_sigs"], out["n_cand"] = n_sigs, n_cand
    print(json.dumps(out))


if __name__ == "__main__":
    main()
