"""Physical-plan inspection utilities."""

from etl_german_fhir_core_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_hint,
    has_broadcast_join,
    pushed_filters,
    uses_whole_stage_codegen,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_broadcast_hint",
    "pushed_filters",
    "count_exchanges",
    "uses_whole_stage_codegen",
]
