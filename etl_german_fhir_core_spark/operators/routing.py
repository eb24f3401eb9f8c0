"""Lookup / routing joins — the reference's dictionary-join family (SURVEY §2.4).

All dimension joins broadcast the small side explicitly (the RAM-dictionary analog,
DbMappings.java:37-72); fact-fact joins are left to Catalyst (sort-merge + AQE skew
splitting). At 100 TB the dims here (vocabularies, concept maps) are MBs — broadcast
is strictly correct; never let a dim shuffle the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concept_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Equi lookup join against a small dimension (J1 analog:
    mapper/helpers/FindOmopConcepts.java:75-129 — RAM map in bulk mode, i.e. a
    broadcast hash join)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def lookup_with_default(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    value_col: str,
    default,
    out_col: str | None = None,
) -> DataFrame:
    """Lookup with fallback default (J4 analog: source_to_concept_map default
    concept 0 when unmapped — FindOmopConcepts.java:109-112, 139-153)."""
    out_col = out_col or value_col
    joined = fact.join(F.broadcast(dim), on=on, how="left")
    return joined.withColumn(out_col, F.coalesce(F.col(value_col), F.lit(default)))


def temporal_validity_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_date: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """As-of/range join (J2 analog: keep the candidate concept whose
    [valid_start_date, valid_end_date] covers the record date —
    FindOmopConcepts.java:116-128). Broadcast + residual range filter: Catalyst plans
    BroadcastHashJoin on the equi keys with the range predicate as a post-join
    filter — no shuffle of the fact side."""
    cond: Column | None = None
    for k in on:
        c = fact[k] == dim[k]
        cond = c if cond is None else cond & c
    cond = cond & (fact[fact_date] >= dim[valid_from]) & (fact[fact_date] <= dim[valid_to])
    joined = fact.join(F.broadcast(dim), on=cond, how=how)
    # drop the dim's duplicate key columns
    return joined.drop(*[dim[k] for k in on])


def route_by_domain(
    mapped: DataFrame, domain_col: str, domains: list[str]
) -> dict[str, DataFrame]:
    """Domain-routing fan-out (J3 analog: ICD→SNOMED 1:N mappings each carrying a
    target domain_id; the mapper switches on it — ConditionMapper.java:922-989).
    One filtered projection per target table; Catalyst collapses each into the scan."""
    return {d: mapped.filter(F.col(domain_col) == d) for d in domains}


def reciprocal_pairs(
    pairs: DataFrame,
    left_cols: list[str],
    right_cols: list[str],
    relation_col: str = "relationship_id",
    forward: str = "primary_of",
    backward: str = "secondary_of",
) -> DataFrame:
    """Reciprocal fact-relationship emission (J8 analog: primary/secondary ICD pairs
    insert BOTH directions, concepts 44818770/44818868 —
    post_processing/post_process_primary_secondary_icd.sql:257-326):
    union of the pair frame with its column-swapped projection."""
    fwd = pairs.select(
        *[F.col(c).alias(f"e1_{i}") for i, c in enumerate(left_cols)],
        *[F.col(c).alias(f"e2_{i}") for i, c in enumerate(right_cols)],
        F.lit(forward).alias(relation_col),
    )
    bwd = pairs.select(
        *[F.col(c).alias(f"e1_{i}") for i, c in enumerate(right_cols)],
        *[F.col(c).alias(f"e2_{i}") for i, c in enumerate(left_cols)],
        F.lit(backward).alias(relation_col),
    )
    return fwd.unionByName(bwd)


def materialize_dim(df, name: str | None = None, storage_level=None):
    """J7: materialized vocabulary view (reference precomputes 3-way dim joins into
    helper tables once per job and reuses them across every mapper,
    pre_process_create_etl_helper_tables.sql:27-233).

    Persists the (small, dim-sized) frame so repeated broadcast joins against it
    re-read memory instead of re-running the dim join, optionally registers a temp
    view for SQL access, and returns ``(cached_df, release)`` — call ``release()``
    at end-of-job (the reference drops its helper tables in post-processing).

    Scale contract: ONLY for dim-sized frames (vocabularies, concept maps) — this
    is the one place persist is correct; fact-sized persists were measured 6x
    slower than re-scanning pruned parquet (CLAUDE.md).
    """
    from pyspark import StorageLevel

    cached = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    if name:
        cached.createOrReplaceTempView(name)

    def release():
        cached.unpersist()
        if name:
            cached.sparkSession.catalog.dropTempView(name)

    return cached, release
