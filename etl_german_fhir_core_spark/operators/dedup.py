"""Deduplication operator family for large-scale training-data pipelines.

All variants are pure DataFrame compositions (shuffle-conscious, no Python in the hot
path except where noted):

- exact: normalize → group on content (or 64-bit fingerprint) → keep min id.
- n-gram Jaccard: shingle → explode → self-join on shingle → pair-count / union-size.
- MinHash + LSH: k hash functions via xxhash64(shingle, seed) → min per seed →
  band signatures → band-bucket self-join → candidate pairs (verify with Jaccard).
- SimHash: weighted bit-vote over shingle hashes → 64-bit signature → bucket by
  rotated prefixes for near-match candidates.

Scale notes: the explode self-join is bounded by document shingle counts; LSH keeps
the candidate set near-linear (band buckets), which is the 100 TB path — exact
pairwise Jaccard is only for small corpora / verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_german_fhir_core_spark.functions.text import normalize_text, tokenize_ws


_NJP_SIDE_CACHE: dict = {}
_NJP_STAGES: list[str] = []


def _njp_register_stage(path: str) -> None:
    """Track a staged kernel side for atexit cleanup — stages live on tmpfs
    (/dev/shm) for I/O determinism, so they must not outlive the driver
    process. They cannot be deleted earlier: the returned frame reads them
    lazily for the caller's whole session."""
    if not _NJP_STAGES:
        import atexit
        import shutil

        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _NJP_STAGES]
        )
    _NJP_STAGES.append(path)


def _njp_load_side(path: str):
    """Load the staged (doc, sz, _hs) side of ngram_jaccard_pairs' kernel ONCE
    per Python worker (guide §4.5: heavyweight init cached in a module-level
    global keyed by path+pid so reused workers keep it across tasks; single
    entry so successive stagings replace, never accumulate). Returns
    (hashes sorted ascending, doc-index per hash, doc ids, set sizes)."""
    import os

    import numpy as np

    key = (path, os.getpid())
    hit = _NJP_SIDE_CACHE.get("side")
    if hit is not None and hit[0] == key:
        return hit[1]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # use_threads=False: every reused worker on the host loads the side at
    # once; with pyarrow's default per-process thread pool that is
    # workers × cpus threads thrashing one tmpfs directory (measured 3.6 s
    # first-call medians vs 0.5 s warm) — single-threaded reads of a few
    # tens of MB are faster and contention-free
    t = pq.read_table(path, columns=["doc", "sz", "_hs"], use_threads=False)
    doc = t.column("doc").to_numpy(zero_copy_only=False)
    sz = t.column("sz").to_numpy(zero_copy_only=False)
    flat, lens = [], []
    for chunk in t.column("_hs").chunks:
        flat.append(chunk.flatten().to_numpy(zero_copy_only=False))
        lens.append(pc.list_value_length(chunk).to_numpy(zero_copy_only=False))
    if flat:
        h = np.concatenate(flat)
        idx = np.repeat(np.arange(len(doc)), np.concatenate(lens).astype(np.int64))
    else:
        h = np.empty(0, np.int64)
        idx = np.empty(0, np.int64)
    order = np.argsort(h, kind="stable")
    data = (h[order], idx[order], doc, sz)
    _NJP_SIDE_CACHE["side"] = (key, data)
    return data


def _spread_small_input(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition a SMALL scan up to the session's default parallelism (r06,
    guide §2.5 input skew / §6 split sizing): a few-MB parquet corpus arrives
    as 1-2 input splits (openCostInBytes floors the split size), so the whole
    shingle+partial-aggregate stage — the expensive per-row work — runs
    near-single-core while 30 cores idle. Scale-adaptive by construction:
    when the scan already has >= parallelism partitions (any real corpus),
    this is a no-op and nothing is shuffled.

    With ``key`` the repartition HASH-clusters on that column: downstream
    per-doc aggregates (distinct, collect_set, signature mins, bit votes)
    then satisfy their distribution from this one small-frame exchange and
    plan NO exchange of the much larger exploded shingle rows (guide §2.4
    "two operations keyed the same way share one exchange")."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, F.col(key)) if key else df.repartition(p)
    return df


def _materialize_small(df: DataFrame) -> DataFrame:
    """Persist AND eagerly populate (count) a small multi-consumer frame.

    A lazy persist is not enough when several consumers sit in ONE downstream
    job: stages race the cache and each recomputes the full lineage (measured 6x
    on the LSH verify path). The eager count is one extra tiny job and makes the
    expensive pipeline upstream run exactly once. Callers must guarantee the
    frame is small (candidate pairs / candidate-doc shingles — near-linear in
    duplicate count, never corpus-sized)."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles of the normalized, lowercased text, as exploded
    (doc, shingle) rows — DISTINCT per doc by default (set-Jaccard semantics).

    Built as explode(sequence(0, size-n)) + n element_at lookups — the same
    codegen-only Generate+Project shape as chunk_exact_dupes, with NO exchange
    and NO sort (r06: the previous posexplode + lead()-window shape paid a
    hash exchange by doc plus a per-doc sort before a single shingle existed,
    and every consumer of the lazy frame re-paid it; guide §2.4 "remove
    shuffles outright"). Array-transform HOFs remain off the table: their
    lambdas evaluate interpreted per element (measured 6x slower at sf0.1) —
    element_at with a column index is a plain codegen'd projection.

    ``distinct=False`` skips the dedup shuffle for consumers whose aggregate is
    duplicate-insensitive (MinHash mins: min over a multiset == min over its
    set) — one full-corpus shuffle saved on the signature path."""
    toks = tokenize_ws(F.col(text_col))
    base = _spread_small_input(df, key=id_col).select(
        F.col(id_col).alias("doc"), toks.alias("_w")
    ).filter(
        F.size("_w") >= n  # guard: sequence(0, negative) would step DOWNWARD
    )
    idx = base.select(
        "doc", F.col("_w"), F.explode(F.sequence(F.lit(0), F.size("_w") - n)).alias("_i")
    )
    parts = [F.element_at(F.col("_w"), F.col("_i") + (j + 1)) for j in range(n)]
    out = idx.select("doc", F.concat_ws(" ", *parts).alias("shingle"))
    return out.distinct() if distinct else out


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str, use_fingerprint: bool = True
) -> DataFrame:
    """Exact dedup on normalized content. ``use_fingerprint`` groups on a 64-bit
    xxhash64 fingerprint (constant-width shuffle keys — the 100 TB path); otherwise
    groups on the normalized text itself (oracle-friendly). Returns one surviving row
    (min id) per content group with the duplicate count."""
    norm = F.lower(normalize_text(F.col(text_col)))
    key = F.xxhash64(norm) if use_fingerprint else norm
    grouped = (
        df.withColumn("_k", key)
        .groupBy("_k")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
    )
    return grouped.drop("_k") if use_fingerprint else grouped.withColumnRenamed("_k", "content_key")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with n-gram Jaccard ≥ threshold.

    inverted-index self-join: explode shingles → join on shingle (id1 < id2) →
    |intersection| per pair → Jaccard via |A|+|B|-|inter|. The shuffle key is the
    shingle, so a stop-shingle shared by everything is the skew risk — at scale,
    drop shingles with document frequency above a cap (cheap pre-agg) before the join.
    """
    # r06 rewrite (guide §8 "decide with small rows / co-locate", §4.2 native
    # kernels; before/after plans in plans/r06). The r05 shape referenced the
    # lazy shingle frame from FOUR subtrees (self-join a/b + two size joins):
    # the scan+shingle pipeline ran 4x, Catalyst force-broadcast the
    # multi-million-row shingle frame from a bad post-aggregate estimate, and
    # — measured at sf1.0 — the inverted-index self-join emitted 127M
    # one-shingle candidate rows into a 127M-distinct-key aggregate (92 s).
    # Exact prefix filtering (PPJoin) only cut emissions 2.3x on this dense
    # vocabulary, so the join shape is structurally wrong here. Instead:
    # 1. ONE corpus scan → per-doc distinct shingle-HASH sets + set size in a
    #    single object-hash aggregate (xxhash64 basis: collisions are 2^-64
    #    noise, the same basis the minhash/fingerprint family stands on), and
    #    the (doc, sz, hashes) frame — hashes only, never text — is staged to
    #    parquet once (the decision pass of guide §8).
    # 2. Each task loads the staged side ONCE per worker (module-cached,
    #    hash-sorted) and a numpy kernel computes exact intersection counts
    #    for its slice of documents: searchsorted range lookup per shingle
    #    hash, vectorized multi-range expansion, one np.unique per chunk —
    #    Σ df² total match work with NO shuffle of candidate rows, no join,
    #    no broadcast, no sort. The per-pair arithmetic (inter, sizes,
    #    float64 division, >= threshold) is bit-identical to the SQL form.
    # Scale note: the staged side is O(corpus shingle hashes) per worker —
    # the exact all-pairs operator stays the small-corpus/verification path
    # (LSH is the 100 TB candidate path); max_df drops stop-shingles from the
    # intersection (df is a free by-product of the range lookup), sizes stay
    # pre-filter — semantics identical to the r05 semi-join formulation.
    import os
    import tempfile

    from pyspark.sql import types as T

    spark = df.sparkSession
    # hash-only shingle basis: xxhash64 over the n token columns directly —
    # same set semantics as hashing the concat'd shingle string (tokens carry
    # no spaces, so the n-tuple is the shingle) without materializing 2.6M+
    # intermediate strings per corpus scan
    toks = tokenize_ws(F.col(text_col))
    base = _spread_small_input(df, key=id_col).select(
        F.col(id_col).alias("doc"), toks.alias("_w")
    ).filter(F.size("_w") >= n)
    idx = base.select(
        "doc", F.col("_w"), F.explode(F.sequence(F.lit(0), F.size("_w") - n)).alias("_i")
    )
    sh = idx.select(
        "doc",
        F.xxhash64(
            *[F.element_at(F.col("_w"), F.col("_i") + (j + 1)) for j in range(n)]
        ).alias("_h"),
    )
    ds_sets = (
        sh.groupBy("doc")
        .agg(F.collect_set("_h").alias("_hs"))
        .select("doc", F.size("_hs").alias("sz"), "_hs")
    )
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    stage = tempfile.mkdtemp(prefix="njp_stage_", dir=shm)
    _njp_register_stage(stage)
    ds_sets.write.mode("overwrite").parquet(stage)
    # leaked until /tmp GC by design: the returned frame reads these files
    # lazily (same precedent as q_cdc_snapshot_diff's in-query table)
    a = spark.read.parquet(stage).repartition(
        spark.sparkContext.defaultParallelism
    )
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id1", id_type),
            T.StructField("id2", id_type),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    md = -1 if max_df is None else int(max_df)
    thr = float(threshold)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        bh, bidx, b_doc, b_sz = _njp_load_side(stage)
        nb = len(b_doc)
        for pdf in batches:
            m = len(pdf)
            if m == 0 or nb == 0:
                continue
            a_doc = pdf["doc"].to_numpy()
            a_sz = pdf["sz"].to_numpy()
            hs_col = pdf["_hs"].to_numpy()
            for c0 in range(0, m, 1024):  # chunk: bounds match-expansion memory
                c1 = min(c0 + 1024, m)
                lens = np.fromiter(
                    (len(hs_col[i]) for i in range(c0, c1)), np.int64, c1 - c0
                )
                if lens.sum() == 0:
                    continue
                ah = np.concatenate([np.asarray(hs_col[i]) for i in range(c0, c1)])
                ad = np.repeat(np.arange(c0, c1), lens)
                lo = np.searchsorted(bh, ah, "left")
                hi = np.searchsorted(bh, ah, "right")
                cnt = hi - lo  # == global document frequency of the shingle
                if md >= 0:
                    cnt = np.where(cnt <= md, cnt, 0)
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                ends = np.cumsum(cnt)
                pos = np.arange(tot) + np.repeat(lo - (ends - cnt), cnt)
                a_rep = np.repeat(ad, cnt)
                b_hit = bidx[pos]
                # keep only b_doc > a_doc BEFORE the unique: drops self-matches
                # and the mirrored direction (each unordered pair survives in
                # exactly the chunk holding its smaller doc), halving the sort
                # volume of the counting unique — and making every output pair
                # globally unique with no distinct afterwards
                fwd = b_doc[b_hit] > a_doc[a_rep]
                if not fwd.any():
                    continue
                key = a_rep[fwd] * nb + b_hit[fwd]
                uk, inter = np.unique(key, return_counts=True)
                ai = uk // nb
                bi = uk - ai * nb
                jac = inter / (a_sz[ai] + b_sz[bi] - inter)
                ok = jac >= thr
                yield pd.DataFrame(
                    {"id1": a_doc[ai[ok]], "id2": b_doc[bi[ok]], "jaccard": jac[ok]}
                )

    return a.mapInPandas(kernel, out_schema)


def _pair_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    pairs: DataFrame,
    eager: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN pair set only — cost O(|pairs| × shingles
    per doc), never O(all pairs).

    The candidate-doc semi join happens at the DOCUMENT level, before shingling,
    so only pair members are normalized/exploded at all (at corpus scale the
    candidate set is a sliver of the table). The intersection is computed by
    routing id1's shingles through the pair list and equi-joining on
    (id2, shingle) — every join key is (doc) or (doc, shingle), so the plan is
    shuffle-bounded by the candidate volume LSH already made near-linear.
    """
    cand_docs = (
        pairs.select(F.col("id1").alias("doc"))
        .union(pairs.select(F.col("id2").alias("doc")))
        .distinct()
    )
    sub = df.join(cand_docs, df[id_col] == cand_docs["doc"], "left_semi")
    # three consumers below (sizes, id1 side, id2 side) — materialize once or each
    # re-scans the corpus for the semi join; bounded by candidate docs' shingles
    # (a sliver of the corpus at scale), so this is small by construction
    sh_c = _materialize_small(_shingle_rows(sub, id_col, text_col, n))
    sizes = sh_c.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh_c.select(F.col("doc").alias("id1"), "shingle")
    b = sh_c.select(F.col("doc").alias("id2"), "shingle")
    inter = (
        pairs.join(a, "id1")
        .join(b, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc").alias("id2"), F.col("sz").alias("sz2"))
    out = (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .select("id1", "id2", "jaccard")
    )
    if eager:
        # materialize the (small) verified pair set and free the candidate-doc
        # shingle cache immediately — lazily-returned frames otherwise pin sh_c
        # in the executor caches for the whole session, the cache-accumulation
        # skew the project notes flag (~2x on later queries; ADVICE r03 low)
        out = out.localCheckpoint(eager=True)
        sh_c.unpersist()
    return out


def _pair_jaccard_pairwise(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    pairs: DataFrame,
) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN pair set, computed pair-local in ONE job.

    Same semantics as :func:`_pair_jaccard` (identical tokenization — the token
    array is built JVM-side with the very same normalize/lower/split expression,
    so shingles are byte-identical; distinct-set Jaccard; pairs with an empty
    intersection are dropped), but a different scale shape: instead of exploding
    candidate-doc shingles and routing them through three joins plus two eager
    materializations (4 sequential Spark jobs — a measured ~10 s constant
    latency floor on small candidate sets, BENCH/BASELINE.md r05), the raw token
    arrays ride the pair join and an Arrow-batched ``mapInPandas`` forms both
    shingle sets and the Jaccard per pair. One shuffle-bounded job, nothing
    persisted.

    Byte math vs the join verify: this ships each candidate doc's tokens once
    per pair membership (~2× text bytes at the near-linear pair degree LSH
    produces), while the join verify explodes shingles (~n× text bytes) and
    shuffles them three times. Pairwise wins unless a hub doc has pair degree
    ≫ n — at that point the join verify (``verify="join"``) amortizes the hub
    doc's shingles across its pairs, so skewed candidate graphs should route
    there (or cap degree upstream via ``max_df``-style pruning).
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from pyspark.sql import types as T

    toks = tokenize_ws(F.col(text_col))
    t = df.select(F.col(id_col).alias("_pj_id"), toks.alias("_pj_toks"))
    j = (
        pairs.select("id1", "id2")
        .join(
            t.select(F.col("_pj_id").alias("id1"), F.col("_pj_toks").alias("_t1")),
            "id1",
        )
        .join(
            t.select(F.col("_pj_id").alias("id2"), F.col("_pj_toks").alias("_t2")),
            "id2",
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("id1", pairs.schema["id1"].dataType),
            T.StructField("id2", pairs.schema["id2"].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            m = len(pdf)
            jac = np.empty(m, dtype=np.float64)
            keep = np.zeros(m, dtype=bool)
            t1s = pdf["_t1"].to_numpy()
            t2s = pdf["_t2"].to_numpy()
            for i in range(m):
                t1, t2 = t1s[i], t2s[i]
                s1 = {" ".join(t1[k : k + n]) for k in range(len(t1) - n + 1)}
                s2 = {" ".join(t2[k : k + n]) for k in range(len(t2) - n + 1)}
                inter = len(s1 & s2)
                if inter:
                    keep[i] = True
                    jac[i] = inter / (len(s1) + len(s2) - inter)
            res = pdf.loc[keep, ["id1", "id2"]].copy()
            res["jaccard"] = jac[keep]
            yield res

    return j.mapInPandas(kernel, out_schema)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(doc, h0..h{k-1}) MinHash signature rows — the shingle-explode +
    map-side-partial min-aggregate stage of :func:`minhash_lsh_pairs`, exposed
    separately so the scaling sweep can attribute wall time per stage
    (signature agg vs bucket join vs verify — BENCH/BASELINE.md).

    r06: the base shingle hash is xxhash64 over the n token columns directly
    (tokens carry no whitespace, so the n-tuple IS the shingle) — same set
    semantics as hashing the concat'd shingle string without materializing
    millions of intermediate strings; with the sort-free shingle builder the
    whole stage is Generate → map-side partial min-agg → ONE exchange of
    k longs per doc (no sort, no distinct: duplicate shingles cannot change a
    min)."""
    toks = tokenize_ws(F.col(text_col))
    base = _spread_small_input(df, key=id_col).select(
        F.col(id_col).alias("doc"), toks.alias("_w")
    ).filter(F.size("_w") >= n)
    idx = base.select(
        "doc", F.col("_w"), F.explode(F.sequence(F.lit(0), F.size("_w") - n)).alias("_i")
    )
    hashed = idx.select(
        "doc",
        F.xxhash64(
            *[F.element_at(F.col("_w"), F.col("_i") + (j + 1)) for j in range(n)]
        ).alias("_h0"),
    )
    return hashed.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.col("_h0"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.5,
    verify: str = "pairwise",
) -> DataFrame:
    """MinHash + banded LSH candidate pairs (optionally Jaccard-verified).

    signature[i] = min over shingles of hash_i(shingle); band j = hash of its
    rows; candidates = pairs sharing any band bucket.

    Scale shape: each shingle string is hashed ONCE (xxhash64 → long); the k
    signature hashes derive from that 64-bit base via fixed-width long hashing
    inside a codegen'd map-side partial aggregate (array-transform HOFs were
    measured 3x SLOWER here — interpreted per element, no whole-stage codegen).
    The groupBy(doc) shuffle moves only k longs per doc thanks to partial
    aggregation; the bucket join then shuffles bands × 16 bytes per doc.
    """
    rows_per_band = num_hashes // bands
    mins = minhash_signatures(df, id_col, text_col, n=n, num_hashes=num_hashes)
    band_cols = [
        F.xxhash64(
            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    sigs = mins.select("doc", *band_cols)
    buckets = sigs.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("id1"), F.col("y.doc").alias("id2"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Verification is CANDIDATE-ONLY: Jaccard is computed just for the pairs LSH
    # surfaced (O(candidates)), never by re-running the all-pairs shingle self-join
    # over the corpus — that quadratic join is exactly what LSH exists to avoid.
    if verify == "pairwise":
        # cand has exactly ONE downstream consumer here, so nothing needs
        # persisting — the whole pipeline (signatures → buckets → self-join →
        # pair-local Jaccard) is a single Spark job.
        verified = _pair_jaccard_pairwise(df, id_col, text_col, n, cand)
    else:
        # join verify: the pair list is consumed 3x downstream (id1 docs, id2
        # docs, pair join); materialize it once or each consumer re-runs the
        # whole signature+bucket pipeline (measured 18x slower at 40k docs).
        # Two longs per candidate pair — near-linear in dup count.
        cand = _materialize_small(cand)
        verified = _pair_jaccard(df, id_col, text_col, n, cand, eager=True)
        cand.unpersist()
    return verified.filter(F.col("jaccard") >= verify_threshold).select(
        "id1", "id2", "jaccard"
    )


def simhash_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    prefix_bits: int = 16,
    hash_basis: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document + a prefix bucket for near-dup candidate grouping.

    bit b of the signature = sign of sum over shingles of (±1 depending on bit b of
    hash(shingle)). Vectorized as an explode + 64 conditional sums (one shuffle).

    ``hash_basis`` selects the per-shingle hash the bit-votes derive from:

    - ``"xxhash64"`` (default): one JVM xxhash64 per shingle — the fast path.
    - ``"md5"``: bits come from the first 16 hex digits of md5(shingle), bit b =
      bit (b % 4) of hex digit (b // 4). md5 exists in every SQL engine, which
      makes the signature CROSS-ENGINE REPRODUCIBLE — the DuckDB-oracle basis
      (xxhash64 bit-votes have no SQL equivalent; VERDICT r03 next #2). Same
      quality (both are uniform bit sources), ~16 extra string ops per shingle.
    """
    if hash_basis == "xxhash64":
        # r06 fast path: the 64 per-bit conditional-sum aggregates were the
        # dominant cost of the whole simhash family (measured 6.5 s of a 13 s
        # candidate run at 40k docs — 64 when/shift/sum expression trees per
        # shingle row). Instead: per-doc DISTINCT shingle-hash sets via one
        # object-hash collect_set (hash basis: xxhash64 of the shingle STRING,
        # unchanged from r05 — signatures stay bit-identical), then
        # an Arrow-batched numpy kernel unpacks the hash bits
        # (np.unpackbits, little-endian = bit b of the uint64) and majority-
        # votes per doc with one segmented reduction. Row-independent — no
        # staged side, no join; one small-frame exchange total.
        import numpy as np  # noqa: F401
        from pyspark.sql import types as T

        toks = tokenize_ws(F.col(text_col))
        base = _spread_small_input(df, key=id_col).select(
            F.col(id_col).alias("doc"), toks.alias("_w")
        ).filter(F.size("_w") >= n)
        idx = base.select(
            "doc",
            F.col("_w"),
            F.explode(F.sequence(F.lit(0), F.size("_w") - n)).alias("_i"),
        )
        sh = idx.select(
            "doc",
            F.xxhash64(
                F.concat_ws(
                    " ",
                    *[
                        F.element_at(F.col("_w"), F.col("_i") + (j + 1))
                        for j in range(n)
                    ],
                )
            ).alias("_h"),
        )
        ds = sh.groupBy("doc").agg(F.collect_set("_h").alias("_hs"))
        out_schema = T.StructType(
            [
                T.StructField("doc", df.schema[id_col].dataType),
                T.StructField("simhash", T.LongType()),
            ]
        )

        def vote_kernel(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                m = len(pdf)
                if m == 0:
                    continue
                hs = pdf["_hs"].to_numpy()
                lens = np.fromiter((len(h) for h in hs), np.int64, m)
                flat = (
                    np.concatenate([np.asarray(h) for h in hs])
                    .astype(np.int64)
                    .view(np.uint64)
                )
                bits = np.unpackbits(
                    flat.view(np.uint8), bitorder="little"
                ).reshape(-1, 64)
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                ones = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
                # vote_b > 0  <=>  2*ones_b > n_hashes (exact tie -> bit 0)
                sigbits = (2 * ones) > lens[:, None]
                sig = (
                    (sigbits.astype(np.uint64) << np.arange(64, dtype=np.uint64))
                    .sum(axis=1, dtype=np.uint64)
                    .view(np.int64)
                )
                yield pd.DataFrame({"doc": pdf["doc"], "simhash": sig})

        out = ds.mapInPandas(vote_kernel, out_schema)
        return out.withColumn(
            "bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
        )
    sh = _shingle_rows(df, id_col, text_col, n)
    if hash_basis == "md5":
        digits = [
            F.conv(F.substring(F.md5(F.col("shingle")), i + 1, 1), 16, 10)
            .cast("int")
            .alias(f"_d{i}")
            for i in range(16)
        ]
        sh = sh.select("doc", *digits)

        def bit(b: int):
            return F.shiftright(F.col(f"_d{b // 4}"), b % 4).bitwiseAND(F.lit(1))

    else:
        raise ValueError(f"unknown hash_basis {hash_basis!r}")
    votes = sh.groupBy("doc").agg(
        *[F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"v{b}") for b in range(64)]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    out = votes.withColumn("simhash", sig).select("doc", "simhash")
    return out.withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )


def _simhash_table_plan(
    max_hamming: int,
    group_size: int | None,
    max_tables: int,
    n_docs: int | None = None,
) -> tuple[int, list[tuple[int, ...]]]:
    """Choose the Manku-style multi-table candidate construction for radius d:
    split the 64-bit signature into ``k = d + g`` blocks and key one candidate
    table on every g-combination of blocks (C(k, g) tables). A pair within
    Hamming distance d flips bits in at most d blocks, leaving ≥ g blocks
    untouched — so at least one whole g-combination agrees: recall is GUARANTEED
    at radius d, same as the plain pigeonhole (g=1), but each table's join key
    is g blocks ≈ 64·g/k bits wide, so bucket self-joins stay near-linear
    instead of collapsing to ~N²/2^w at narrow widths (VERDICT r03 wrong #1).

    ``group_size=None`` auto-picks the smallest g whose composite key reaches
    ≥16 bits within the ``max_tables`` budget (d=3 → g=1, 4 tables × 16-bit
    keys; d=6 → g=2, 28 tables × 16-bit keys); when no g under budget reaches
    16 bits (d ≥ ~9) it takes the widest affordable key — at those radii the
    Hamming pre-filter in simhash_pairs is what bounds the verify set."""
    from itertools import combinations
    from math import comb

    d = max_hamming
    if group_size is not None:
        g = group_size
        if comb(d + g, g) > max_tables:
            raise ValueError(
                f"group_size={g} needs C({d + g},{g})={comb(d + g, g)} candidate "
                f"tables > max_tables={max_tables}"
            )
    else:
        feasible = [
            g for g in range(1, 11) if comb(d + g, g) <= max_tables and d + g <= 64
        ]
        if not feasible:
            raise ValueError(
                f"no block-combination plan fits max_hamming={d}: even g=1 needs "
                f"C({d + 1},1)={d + 1} candidate tables > max_tables={max_tables}; "
                "raise max_tables or lower max_hamming"
            )
        if n_docs is not None and n_docs >= 2:
            # r06 cost-based choice (every candidate pair ≤ radius d survives
            # regardless of g — the plan only trades per-table work against
            # block-collision volume, so g is a pure cost knob): per table the
            # kernel pays ~N·log2 N sort work plus ~N²/2^w_avg collision
            # popcounts (w_avg = g·64/(d+g) composite key bits). Minimize the
            # sum over the feasible g values.
            from math import log2

            n = float(n_docs)

            def cost(gg: int) -> float:
                t = comb(d + gg, gg)
                w = gg * 64.0 / (d + gg)
                return t * n * (log2(n) + 3.0) + t * n * n / (2.0**w)

            g = min(feasible, key=cost)
        else:
            wide = [g for g in feasible if g * (64 // (d + g)) >= 16]
            g = wide[0] if wide else max(
                feasible, key=lambda gg: gg * (64 // (d + gg))
            )
    k = d + g
    if k > 64:
        raise ValueError(f"max_hamming + group_size = {k} exceeds 64 signature bits")
    return k, list(combinations(range(k), g))


_SIM_SIDE_CACHE: dict = {}


def _sim_load_side(path: str):
    """Load the staged (doc, simhash) side of the simhash candidate kernel once
    per Python worker (same module-cache pattern as :func:`_njp_load_side`).
    Returns (doc ids array, signatures as uint64 array)."""
    import os

    import numpy as np

    key = (path, os.getpid())
    hit = _SIM_SIDE_CACHE.get("side")
    if hit is not None and hit[0] == key:
        return hit[1]
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["doc", "simhash"], use_threads=False)
    doc = t.column("doc").to_numpy(zero_copy_only=False)
    sig = (
        t.column("simhash").to_numpy(zero_copy_only=False)
        .astype(np.int64)
        .view(np.uint64)
    )
    data = (doc, sig)
    _SIM_SIDE_CACHE["side"] = (key, data)
    return data


def _popcount64(x):
    """Vectorized 64-bit population count (SWAR; numpy<2 has no bitwise_count).
    ``x`` must be uint64; integer wraparound in the multiply is intended."""
    import numpy as np

    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return (x * h) >> np.uint64(56)


def _simhash_candidates(
    sigs: DataFrame,
    max_hamming: int,
    group_size: int | None,
    max_tables: int,
    n_docs: int | None = None,
) -> DataFrame:
    """Candidate (id1, id2) pairs within Hamming radius ``max_hamming``:
    Manku-style block-combination tables guarantee recall (a pair within
    distance d leaves ≥ g of the d+g blocks untouched, so some whole
    g-combination agrees) and a ``popcount(sig1 XOR sig2) ≤ d`` filter removes
    every block-collision pair — the output is therefore EXACTLY the
    Hamming-ball pair set, independent of the table plan chosen.

    r06 execution (guide §8 / §4.2; the r05 JVM shape was an exploded
    (doc, key) self-join — at wide radii its narrow block keys collapse to
    ~N²/2^w join emissions, measured 213 s at 400k docs, d=12): the
    (doc, simhash) side — 16 bytes/doc — is staged once and each task
    processes a slice of the candidate TABLES in numpy: build its tables'
    composite block keys, argsort, expand equal-key runs into pairs
    (vectorized multi-range), popcount-filter, pre-dedupe. No join, no
    per-table shuffle; table count becomes a pure cost knob the plan chooser
    optimizes against N (``_simhash_table_plan`` cost model), which unlocks
    wide-radius plans (d=12 → hundreds of tables of ~16-bit keys) that the
    expression-tree version could not afford."""
    import os
    import tempfile

    import numpy as np  # noqa: F401  (kernel contract)
    from pyspark.sql import types as T

    spark = sigs.sparkSession
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    stage = tempfile.mkdtemp(prefix="sim_stage_", dir=shm)
    _njp_register_stage(stage)
    sigs.select("doc", "simhash").write.mode("overwrite").parquet(stage)
    if n_docs is None:
        # parquet footer-count over the just-written stage — metadata-only,
        # never recomputes the signature pipeline
        n_docs = spark.read.parquet(stage).count()
    k, combos = _simhash_table_plan(max_hamming, group_size, max_tables, n_docs)
    base, extra = divmod(64, k)
    widths = [base + (1 if i < extra else 0) for i in range(k)]
    offsets = [sum(widths[:i]) for i in range(k)]

    par = spark.sparkContext.defaultParallelism
    tables = spark.range(0, len(combos), 1, min(len(combos), par))
    id_type = sigs.schema["doc"].dataType
    out_schema = T.StructType(
        [T.StructField("id1", id_type), T.StructField("id2", id_type)]
    )
    d = int(max_hamming)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        doc, sig = _sim_load_side(stage)
        nb = len(doc)
        for pdf in batches:
            if nb < 2 or len(pdf) == 0:
                continue
            out1, out2 = [], []
            for t in pdf["id"].to_numpy():
                combo = combos[int(t)]
                key = np.zeros(nb, dtype=np.uint64)
                acc = 0
                for b in combo:
                    blk = (sig >> np.uint64(offsets[b])) & np.uint64(
                        (1 << widths[b]) - 1
                    )
                    key |= blk << np.uint64(acc)
                    acc += widths[b]
                order = np.argsort(key, kind="stable")
                ks = key[order]
                # equal-key runs -> within-run pair expansion (each element
                # pairs with every earlier element of its run)
                run_start = np.zeros(nb, dtype=np.int64)
                new_run = np.flatnonzero(ks[1:] != ks[:-1]) + 1
                run_start[new_run] = new_run
                np.maximum.accumulate(run_start, out=run_start)
                npairs = np.arange(nb, dtype=np.int64) - run_start
                tot = int(npairs.sum())
                if tot == 0:
                    continue
                idx = np.arange(nb, dtype=np.int64)
                a_pos = np.repeat(idx, npairs)
                ends = np.cumsum(npairs)
                b_pos = np.arange(tot) - np.repeat(ends - npairs, npairs) + np.repeat(
                    run_start, npairs
                )
                ai, bi = order[a_pos], order[b_pos]
                keep = _popcount64(sig[ai] ^ sig[bi]) <= np.uint64(d)
                if not keep.any():
                    continue
                ai, bi = ai[keep], bi[keep]
                lo = np.minimum(ai, bi)
                hi = np.maximum(ai, bi)
                out1.append(lo)
                out2.append(hi)
            if not out1:
                continue
            lo = np.concatenate(out1)
            hi = np.concatenate(out2)
            # pre-dedupe across this task's tables (a near-identical pair is
            # caught by MANY tables; without this the distinct would shuffle
            # tables× duplicates)
            packed = np.unique(lo.astype(np.int64) * nb + hi)
            li = packed // nb
            ri = packed - li * nb
            yield pd.DataFrame({"id1": doc[li], "id2": doc[ri]})

    out = tables.mapInPandas(kernel, out_schema)
    # doc-id order (the public contract is id1 < id2 by DOC id, not by row
    # position): swap where needed, then global distinct (tiny: ≈ true pairs)
    return (
        out.select(
            F.least("id1", "id2").alias("id1"), F.greatest("id1", "id2").alias("id2")
        )
        .distinct()
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 6,
    group_size: int | None = None,
    max_tables: int = 4096,
) -> DataFrame:
    """Hamming-filtered simhash candidate pairs (pre-verify) — the probe surface
    for candidate-volume measurement (bench.py compares this count against
    minhash's candidate count at equal recall). ``max_tables`` default raised
    in r06: with the kernel execution the table count is a pure cost knob
    (the output is the exact Hamming ball for ANY plan), and wide radii
    genuinely want hundreds of tables — the cost model picks.

    r06: no persist and no localCheckpoint — the signature pipeline runs
    exactly once into the kernel's staged side (the stage IS the
    materialization barrier), so the former persist+count+checkpoint job
    chain (three extra actions of the r05 verify-floor attribution) is gone."""
    sigs = simhash_buckets(df, id_col, text_col, n).select("doc", "simhash")
    return _simhash_candidates(sigs, max_hamming, group_size, max_tables)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 6,
    verify_threshold: float = 0.5,
    group_size: int | None = None,
    max_tables: int = 4096,
    verify: str = "pairwise",
) -> DataFrame:
    """Near-dup pairs via SimHash candidates + exact Jaccard verify — the
    end-to-end simhash pipeline (simhash_buckets emits the raw signatures).

    Candidate generation is the multi-table block-combination scheme (Manku et
    al., WWW'07 §3 made Spark-first — see _simhash_table_plan): recall within
    Hamming radius ``max_hamming`` is guaranteed, join keys are ≥16 bits at
    d ≤ 6, and a JVM-side ``bit_count(xor) ≤ d`` pre-filter bounds the verify
    set to true Hamming-ball pairs even at larger radii. Verification is
    candidate-only exact n-gram Jaccard (same _pair_jaccard as minhash), so
    precision is exact. Scale shape: C(d+g, g) 16-byte keys per doc through one
    equi self-join, pre-filter on two longs per candidate, Jaccard only on
    Hamming-confirmed pairs.

    r06: the signature frame is consumed exactly once (the candidate
    kernel's staged side materializes it), so the former sigs persist +
    eager count + output localCheckpoint — three of the barrier jobs behind
    the r05 ~10 s verify-stage latency floor — are gone; the pairwise path
    is now one staged write plus one verify job."""
    sigs = simhash_buckets(df, id_col, text_col, n).select("doc", "simhash")
    if verify == "pairwise":
        cand = _simhash_candidates(sigs, max_hamming, group_size, max_tables)
        verified = _pair_jaccard_pairwise(df, id_col, text_col, n, cand)
        return verified.filter(F.col("jaccard") >= verify_threshold).select(
            "id1", "id2", "jaccard"
        )
    # join verify consumes the candidate list 3x — materialize it once
    cand = _materialize_small(
        _simhash_candidates(sigs, max_hamming, group_size, max_tables)
    )
    verified = _pair_jaccard(df, id_col, text_col, n, cand, eager=True)
    cand.unpersist()
    return verified.filter(F.col("jaccard") >= verify_threshold).select(
        "id1", "id2", "jaccard"
    )


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination check — the train/eval hygiene pass every
    pre-training pipeline needs: for each document, the fraction of its distinct
    word n-grams that also occur anywhere in ``benchmark`` (the held-out eval
    corpus). Output: (doc, n_shingles, n_contaminated, contamination_rate).

    Scale shape: the benchmark shingle set is tiny relative to a training corpus
    (an eval suite is MBs against TBs), so it broadcasts and the corpus-side
    shingles stream through a broadcast LEFT join — one corpus shuffle for the
    per-doc aggregate, no benchmark-side skew. Set
    ``broadcast_benchmark=False`` for a benchmark too large to broadcast (falls
    back to a shuffle join)."""
    sh = _shingle_rows(df, id_col, text_col, n)
    bench = (
        _shingle_rows(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    marked = sh.join(bench, "shingle", "left")
    return (
        marked.groupBy("doc")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),  # non-null = benchmark hit
        )
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def chunk_exact_dupes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 10,
    min_dupes: int = 2,
    use_fingerprint: bool = False,
) -> DataFrame:
    """Sub-document exact dedup: split each normalized document into fixed-width
    word chunks and find chunks repeated across the corpus — the
    paragraph/boilerplate-level pass that document-level dedup misses (shared
    footers, license blocks, templated spans). Output: (chunk, keep_id,
    n_dupes) for every chunk occurring ≥ ``min_dupes`` times.

    The chunk text is built by slicing the token array per chunk index
    (sequence + explode + slice — all codegen'd; no collect_list whose order
    would be nondeterministic), then one hash-agg on the chunk.
    ``use_fingerprint=True`` groups on ``xxhash64(chunk)`` instead of the raw
    string — constant-width shuffle keys, the 100 TB path (same trade as
    dedup_exact); the string key is the oracle-friendly default."""
    toks = F.split(F.lower(normalize_text(F.col(text_col))), " ")
    base = df.select(F.col(id_col).alias("doc"), toks.alias("_w"))
    n_chunks = F.ceil(F.size("_w") / F.lit(chunk_words)).cast("int")
    chunks = base.select(
        "doc",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("_ci"),
        "_w",
    ).select(
        "doc",
        F.concat_ws(
            " ", F.slice("_w", F.col("_ci") * chunk_words + 1, chunk_words)
        ).alias("chunk"),
    )
    key = F.xxhash64("chunk").alias("chunk_key") if use_fingerprint else F.col("chunk")
    grouped = (
        chunks.groupBy(key)
        .agg(F.min("doc").alias("keep_id"), F.count("*").alias("n_dupes"))
        .filter(F.col("n_dupes") >= min_dupes)
    )
    return grouped


def top_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 20
) -> DataFrame:
    """Corpus n-gram document-frequency statistics: the ``k`` distinct word
    n-grams appearing in the most documents (ties broken lexicographically —
    deterministic top-k). The boilerplate-discovery / stop-shingle-selection
    companion to ``ngram_jaccard_pairs``'s ``max_df`` knob: its output IS the
    evidence for choosing that cap. One hash-agg + a global top-k (Spark runs
    ORDER BY+LIMIT as per-partition TakeOrdered — no full sort)."""
    sh = _shingle_rows(df, id_col, text_col, n)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(k)
    )


def dedup_clusters_star(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR contraction —
    the O(log n)-round algorithm (public MapReduce formulation: Kiveris et al.,
    "Connected Components in MapReduce and Beyond"), the scale path where
    ``dedup_clusters``'s min-label propagation (O(diameter) rounds) would need
    one round per hop on chain-shaped components.

    large-star: every node u connects its LARGER neighbors to m = min(Γ(u)∪{u});
    small-star: every node u connects its smaller-or-equal neighborhood to its
    minimum. The edge set contracts to stars centered at each component's
    minimum id; each round is a handful of hash joins/aggregations on the pair
    graph (near-linear in duplicate count, never corpus-sized).

    Input: (id1, id2) pairs. Output: (doc_id, cluster_id) for every paired doc.
    """
    nodes = _materialize_small(
        pairs.select(F.col("id1").alias("doc_id"))
        .union(pairs.select(F.col("id2").alias("doc_id")))
        .distinct()
    )
    e = _materialize_small(
        pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )

    def _large_star(edges: DataFrame) -> DataFrame:
        nbr = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = nbr.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        return (
            nbr.join(m, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(edges: DataFrame) -> DataFrame:
        d = edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).where(F.col("a") != F.col("b")).distinct()
        m = d.groupBy("a").agg(F.min("b").alias("m"))
        joined = d.join(m, "a")
        out = joined.select(F.col("b").alias("a"), F.col("m").alias("b")).union(
            m.select(F.col("a"), F.col("m").alias("b"))
        )
        return out.where(F.col("a") != F.col("b")).distinct()

    converged = False
    for _ in range(max_iters):
        # localCheckpoint (eager) truncates the logical plan each round —
        # without it Catalyst re-analyzes a plan that doubles per iteration and
        # analysis time explodes long before execution does (measured: a
        # 40-node chain went from minutes to seconds)
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        changed = (
            e2.subtract(e).limit(1).count() + e.subtract(e2).limit(1).count()
        )
        e.unpersist()
        e = e2
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters_star did not converge within max_iters={max_iters}"
        )
    # converged stars: every non-minimum node carries an edge to its component
    # minimum; minima label themselves
    star = e.select(
        F.greatest("a", "b").alias("doc_id"), F.least("a", "b").alias("cluster_id")
    ).groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
    out = nodes.join(star, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id")
    )
    nodes.unpersist()
    return out


def dedup_clusters(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected components with
    the min doc id as the canonical representative — the step a real dedup
    pipeline needs after pair generation (keep one doc per component, not per
    pair; A~B and B~C must collapse A,B,C together even though (A,C) was never
    emitted).

    Algorithm: iterative min-label propagation over the undirected edge list —
    each round every node adopts the smallest label among itself and its
    neighbors; converges in O(component diameter) rounds (near-dup components
    are shallow in practice; ``max_iters`` bounds pathological chains, and the
    loop exits as soon as a round changes nothing). Each round is one
    shuffle-join + one aggregate, all JVM-side; the classic large-star/small-star
    optimization drops in here unchanged if components ever get deep.

    Input: (id1, id2) pairs. Output: (doc_id, cluster_id).
    """
    edges = (
        pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
        .union(pairs.select(F.col("id2").alias("a"), F.col("id1").alias("b")))
        .distinct()
    )
    edges = _materialize_small(edges)  # reused every round
    labels = _materialize_small(
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        new_labels = _materialize_small(
            labels.join(neighbor_min, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # a chain-shaped component longer than max_iters would otherwise return
        # silently WRONG cluster ids (ADVICE r02 low) — fail loudly; callers with
        # genuinely deep components should raise max_iters or switch to the
        # large-star/small-star contraction (O(log n) rounds).
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iters={max_iters} "
            "(component diameter exceeds the iteration budget; raise max_iters)"
        )
    return labels
