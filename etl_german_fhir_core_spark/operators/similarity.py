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


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def _assign_cells(
    df: DataFrame, key_cols: list[str], vec_col: str, cents_df: DataFrame, out: str = "_cell"
) -> DataFrame:
    """Nearest-centroid assignment via a BROADCAST join (k rows) + min_by — no
    per-element literal expressions (a 16×64 literal tree made Catalyst/codegen
    explode; the join form compiles once and stays columnar)."""
    j = df.crossJoin(F.broadcast(cents_df)).withColumn(
        "_d", _sqdist(F.col(vec_col), F.col("_cvec"))
    )
    return j.groupBy(*key_cols).agg(
        F.min_by("_cell0", "_d").alias(out), F.first(vec_col).alias(vec_col)
    )


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Deterministic mini k-means for IVF coarse quantization: init = the k corpus
    vectors with smallest xxhash64(id) (hash-picked, seed-free deterministic), then
    ``iters`` Lloyd steps as DataFrame aggs (assign via broadcast-join argmin;
    recompute via posexplode + groupBy(cluster, pos) mean). Returns a k-row
    DataFrame (_cell0 int, _cvec array<double>) — driver-tiny at any corpus scale."""
    spark = corpus.sparkSession
    sample = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    cents = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(sample)]

    def to_df(c):
        return spark.createDataFrame(c, "_cell0 int, _cvec array<double>")

    for _ in range(iters):
        assigned = _assign_cells(
            corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("v")),
            ["_id"], "v", to_df(cents),
        )
        new = (
            assigned.select("_cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("_cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_c: dict[int, list[float]] = {}
        for r in new:
            by_c.setdefault(r["_cell"], [0.0] * dim)[r["pos"]] = float(r["m"])
        cents = [(i, by_c.get(i, v)) for i, v in cents]
    return to_df(cents)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid cells, probe
    each query's ``nprobe`` nearest cells, exact cosine rerank inside them. The 100 TB
    path: the corpus is scanned once to build cells (and would be stored partitioned
    by cell); each query touches ~nprobe/n_centroids of the data via a cell-equi join."""
    cents_df = kmeans_centroids(corpus, dim, k=n_centroids, vec_col=vec_col, id_col=id_col)
    c = _assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        ["neighbor_id"], "_cv", cents_df,
    )
    # per-query probe cells: rank centroid distances, keep nprobe smallest
    qd = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        .crossJoin(F.broadcast(cents_df))
        .withColumn("_d", _sqdist(F.col("_qv"), F.col("_cvec")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_d"), F.col("_cell0"))
    probes = (
        qd.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", F.col("_cell0").alias("_cell"))
    )
    scored = c.join(F.broadcast(probes), "_cell").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id", cosine_similarity(F.col("_qv"), F.col("_cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
