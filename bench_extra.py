"""Extra benchmarks for the optimization round (guide §1): per-query noop-sink
isolation timings + .explain("formatted") capture. bench.py is FROZEN for
measurement; this file holds the round's before/after evidence only.

Usage:
    python bench_extra.py --tag before [--sf-dir /root/testdata/sf1.0] [query ...]
    python bench_extra.py --stages-ngram   # per-stage breakdown of ngram_jaccard

Writes plans/r06/<query>_<tag>.txt and prints one JSON line of timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "cdc_lww_final_state",
    "agg_pricing_summary",
    "era_islands",
    "join_concept_lookup",
    "join_pairing_reciprocal",
    "window_latest_per_key",
    "text_token_count",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as df.explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--tag", default=None, help="plans/r06/<q>_<tag>.txt capture tag")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--stages-ngram", action="store_true")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from etl_german_fhir_core_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sf = args.sf_dir
    qs = entry.queries()

    # arrow-worker warmup (same as bench.py)
    from etl_german_fhir_core_spark.functions.vectorized import token_count_pd

    spark.range(CPUS * 4).repartition(CPUS).select(
        token_count_pd(F.lit("warm up the arrow workers"))
    ).write.format("noop").mode("overwrite").save()

    if args.stages_ngram:
        _stages_ngram(spark, sf)
        return

    names = args.queries or DEFAULT_QUERIES
    plans_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            _noop(qs[name](spark, sf))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        if args.tag:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(_explain_formatted(qs[name](spark, sf)))
    out["_total"] = round(sum(out.values()), 3)
    out["_sf_dir"] = sf
    print(json.dumps(out))


def _stages_ngram(spark, sf: str) -> None:
    """Pipeline-prefix breakdown of ngram_jaccard_pairs (guide §1.1)."""
    from pyspark.sql import functions as F

    from etl_german_fhir_core_spark.operators.dedup import (
        _shingle_rows,
        ngram_jaccard_pairs,
    )

    d = spark.read.parquet(f"{sf}/documents.parquet")
    res = {"docs": d.count()}

    def timed(label, fn, reps=2):
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ngram stage: {label}")
            t0 = time.time()
            _noop(fn())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        res[label] = round(best, 3)

    timed("shingles_distinct", lambda: _shingle_rows(d, "doc_id", "text", 3))
    timed("sizes", lambda: _shingle_rows(d, "doc_id", "text", 3).groupBy("doc").agg(F.count("*").alias("sz")))

    def _join_only():
        sh = _shingle_rows(d, "doc_id", "text", 3)
        a, b = sh.alias("a"), sh.alias("b")
        return (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
            .groupBy(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
            .agg(F.count("*").alias("inter"))
        )

    timed("self_join_intersect", _join_only)
    timed("full_query", lambda: ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
