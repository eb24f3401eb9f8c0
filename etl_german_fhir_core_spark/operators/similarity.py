"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k neighbors per query vector. Dot products are
  native ``F.zip_with`` + ``F.aggregate`` (JVM-side, no Python); queries are broadcast
  so the corpus never shuffles. Baseline / verification path.
- ``lsh_ann_topk``: random-hyperplane LSH buckets (deterministic, hash-derived planes)
  → candidates share a bucket → exact rerank within candidates. The 100 TB path:
  candidate count per query is ~corpus/2^bits, and the join is bucket-equi.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row (query_id, neighbor_id, sim).
    Cross join with a broadcast query side: corpus stays partition-local; the only
    shuffle is the final per-query top-k window (tiny: q×k rows after rank filter is
    applied per partition via AQE)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qv"), F.col("_cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplane(dim: int, plane_idx: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from a splitmix-style integer
    hash (no numpy RNG state; reproducible across runs/executors)."""
    vals = []
    x = (seed * 1_000_003 + plane_idx) & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x = x ^ (x >> 31)
        vals.append(((x & 0xFFFF) / 32768.0) - 1.0)  # uniform-ish in [-1, 1)
    return vals


def lsh_bucket_col(vec_col, dim: int, bits: int = 8, seed: int = 42):
    """Random-hyperplane LSH bucket id: bit i = sign(v · plane_i). Pure columnar."""
    bucket = F.lit(0)
    for i in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i, seed)])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, exact cosine rerank within bucket.
    Recall improves with multiple tables (union over seeds) — single-table here;
    callers union seeds for higher recall."""
    cb = lsh_bucket_col(F.col(vec_col), dim, bits, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), cb.alias("_b"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), cb.alias("_b"))
    scored = c.join(F.broadcast(q), "_b").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id", cosine_similarity(F.col("_qv"), F.col("_cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
