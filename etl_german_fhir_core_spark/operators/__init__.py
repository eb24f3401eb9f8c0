"""Reusable relational operators — the Spark-first re-expression of the reference's
fixed-function ETL stages (SURVEY §2.4-2.7) plus the training-data-pipeline operator
family (dedup, similarity search)."""

from etl_german_fhir_core_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from etl_german_fhir_core_spark.operators.ids import dense_surrogate_ids
from etl_german_fhir_core_spark.operators.eras import collapse_eras, period_rollup
from etl_german_fhir_core_spark.operators.routing import (
    concept_lookup,
    lookup_with_default,
    temporal_validity_join,
)
from etl_german_fhir_core_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
)

__all__ = [
    "collapse_eras",
    "period_rollup",
    "concept_lookup",
    "lookup_with_default",
    "temporal_validity_join",
    "dedup_exact",
    "dense_surrogate_ids",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_buckets",
    "cosine_topk_bruteforce",
    "lsh_ann_topk",
]
