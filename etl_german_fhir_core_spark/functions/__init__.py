"""Vectorized per-turn functions — the analog of the reference's 12 per-record mapper
classes (SURVEY §2.3), re-expressed as native DataFrame expressions and Arrow-batched
pandas UDFs. No row-at-a-time Python anywhere (input_hint requirement)."""

from etl_german_fhir_core_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    normalize_text,
    normalize_turns,
    quality_score,
    token_count,
)

__all__ = [
    "normalize_text",
    "normalize_turns",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
]
