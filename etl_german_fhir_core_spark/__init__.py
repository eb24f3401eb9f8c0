"""etl_german_fhir_core_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the query and data-processing capabilities of OHDSI/ETL-German-FHIR-Core,
re-expressed Spark-first over transcript-shaped data.

The reference (at /root/reference, read-only) is a Spring Batch Java ETL that tails a
change feed of FHIR resources (``resources.id`` = LSN, ``last_updated_at`` = change ts,
``is_deleted`` = tombstone — deploy/init-test-data/0-init-fhir-gw.sql:1-16) and applies
per-record pure mappers with delete-then-insert upsert semantics into a multi-table
warehouse (mapper/ConditionMapper.java:131-140). This package rebuilds those semantics
as batch-columnar DataFrame plans:

- ``lake``       — Iceberg-style snapshot tables over bucketed Parquet with atomic JSON
                   manifest commits, copy-on-write keyed MERGE, additive schema evolution.
- ``cdc``        — deterministic change-feed fixtures, the epoch manager (exactly-once
                   idempotent commits, kill-and-resume), LWW dedup, lineage metrics,
                   late-reference retry queue.
- ``functions``  — vectorized per-turn text transforms (the 12-mapper analog), language
                   ID, quality scoring, token counting, fingerprinting.
- ``operators``  — lookup/routing joins, era (gaps-and-islands) windows, pairing
                   self-joins, dedup family (exact/minhash/simhash/jaccard/embedding),
                   similarity search.
- ``sources``    — parquet/CSV/JDBC/REST-paging readers (reference §2.1).
- ``streaming``  — Structured Streaming ingest path (readStream → foreachBatch → MERGE).
- ``multimodal`` — binary-column plumbing for image/audio payloads (decode stubbed).
"""

__version__ = "0.1.0"
