"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; an LSH (random hyperplane)
bucketed variant as the 100 TB scale path. Dot products stay JVM-side via
``F.zip_with`` + ``F.aggregate`` (no Python in the hot loop); hyperplanes
are deterministic (seeded numpy) and broadcast as literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus — a broadcast nested-loop join that scans the corpus ONCE for
    all queries — then per-query top-k via window rank (Spark executes the
    rank + filter as a per-partition top-k before the final shuffle).

    Ties broken by corpus id asc for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "_qid",
        "_cid",
        cosine_expr(F.col("_cv"), F.col("_qv")).alias("_cos"),
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_cid").alias(id_col),
            F.round("_cos", 6).alias("cosine"),
            F.col("_rn").cast("int").alias("rank"),
        )
    )


def _hyperplanes(
    dim: int, n_planes: int, seed: int = 42, axis_aligned: bool = False
) -> list[list[float]]:
    if axis_aligned:
        # unit-basis "hyperplanes": sign(v·e_i) = sign(v[i]). Slightly lower
        # quality than random planes on correlated dims, but exactly
        # reproducible in ANSI SQL — used when an oracle must replicate the
        # bucketing.
        return [[1.0 if j == i else 0.0 for j in range(dim)] for i in range(n_planes)]
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    out_col: str = "lsh_bucket",
    axis_aligned: bool = False,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = bit-string of sign(v·plane_i).
    Vectors in the same bucket are cosine-close with high probability.
    Hyperplanes are literal arrays (deterministic, shipped in the plan)."""
    planes = _hyperplanes(dim, n_planes, seed, axis_aligned)
    v = F.col(vec_col).cast("array<double>")
    bits = [
        F.when(dot_expr(v, F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return df.withColumn(out_col, F.concat(*bits))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    axis_aligned: bool = False,
) -> DataFrame:
    """Approximate top-k: equi-join corpus and queries on the LSH bucket,
    exact cosine within the bucket only. At 100 TB the bucket join is a
    shuffle hash join on the bucket key — candidate count drops ~2^planes×
    versus brute force. Recall is tunable via n_planes (fewer planes =
    bigger buckets = higher recall, more compute)."""
    c = lsh_bucket(
        corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).cast("array<double>").alias("_cv")),
        "_cv",
        dim,
        n_planes,
        seed,
        axis_aligned=axis_aligned,
    )
    q = lsh_bucket(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(query_vec_col).cast("array<double>").alias("_qv"),
        ),
        "_qv",
        dim,
        n_planes,
        seed,
        axis_aligned=axis_aligned,
    )
    scored = c.join(q, "lsh_bucket").select(
        "_qid", "_cid", cosine_expr(F.col("_cv"), F.col("_qv")).alias("_cos")
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_cid").alias(id_col),
            F.round("_cos", 6).alias("cosine"),
            F.col("_rn").cast("int").alias("rank"),
        )
    )


def ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic IVF centroid selection: md5-hash-ordered sample of
    corpus vectors (a uniform pseudo-random but reproducible draw), refined
    with one Lloyd iteration computed distributed (groupBy assigned
    centroid → mean). Centroid count stays driver-side tiny; the corpus is
    never collected."""
    seed_rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    cents = [r["_v"] for r in seed_rows]
    assigned = ivf_assign(corpus, vec_col, cents, id_col).select("_cluster", F.col(vec_col).cast("array<double>").alias("_v"))
    # one Lloyd refinement: per-cluster elementwise mean (posexplode + agg)
    dim = len(cents[0])
    refined = (
        assigned.select("_cluster", F.posexplode("_v").alias("_pos", "_x"))
        .groupBy("_cluster", "_pos")
        .agg(F.avg("_x").alias("_m"))
        .groupBy("_cluster")
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pairs"))
        .select("_cluster", F.transform("_pairs", lambda p: p["_m"]).alias("_centroid"))
        .collect()
    )
    by_cluster = {r["_cluster"]: r["_centroid"] for r in refined}
    return [by_cluster.get(i, cents[i]) for i in range(len(cents))]


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    out_col: str = "_cluster",
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine) with a
    pure column expression over literal centroid arrays."""
    v = F.col(vec_col).cast("array<double>")
    sims = [
        cosine_expr(v, F.array(*[F.lit(float(x)) for x in c])) for c in centroids
    ]
    best = F.array_position(
        F.array(*sims), F.array_max(F.array(*sims))
    ) - 1  # 0-based cluster id
    return df.withColumn(out_col, best.cast("int"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest clusters per
    query, exact cosine only within probed clusters. The candidate join is
    an equi-join on cluster id — at 100 TB this cuts the scanned corpus to
    n_probe/n_centroids of the data per query, and the corpus side can be
    stored pre-partitioned by cluster."""
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).cast("array<double>").alias("_cv")),
        "_cv",
        centroids,
        out_col="_cluster",
    )
    qv = F.col(query_vec_col).cast("array<double>")
    sims = [cosine_expr(qv, F.array(*[F.lit(float(x)) for x in cc])) for cc in centroids]
    ranked = F.array_sort(
        F.array(*[F.struct((-s).alias("d"), F.lit(i).alias("i")) for i, s in enumerate(sims)])
    )
    probes = F.slice(F.transform(ranked, lambda p: p["i"]), 1, n_probe)
    q = queries.select(
        F.col(query_id_col).alias("_qid"), qv.alias("_qv"), F.explode(probes).alias("_cluster")
    )
    scored = c.join(q, "_cluster").select(
        "_qid", "_cid", cosine_expr(F.col("_cv"), F.col("_qv")).alias("_cos")
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_cid").alias(id_col),
            F.round("_cos", 6).alias("cosine"),
            F.col("_rn").cast("int").alias("rank"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings around fixed centroids, then
    inside each cluster drop every vector that has an earlier (lower-id)
    cluster-mate with cosine ≥ threshold.  Only within-cluster pairs are
    ever compared — the cross-cluster quadratic blowup of exact semantic
    dedup never materializes.

    ``centroids`` come from :func:`ivf_centroids` (deterministic md5-seeded
    sample + one Lloyd step), so the whole operator is reproducible and
    ANSI-SQL-expressible for the oracle.

    Output: one row per input vector — (vec_id, cluster, is_kept,
    dup_of) where dup_of is the smallest cluster-mate id that shadows a
    dropped vector (NULL when kept).

    Scale: assignment is a narrow map against literal centroids; the
    within-cluster comparison is a self-equi-join on cluster id (shuffle
    hash join — candidate volume is Σ cluster_size², bounded by choosing
    n_centroids ∝ √N as IVF practice dictates; the corpus can be stored
    pre-partitioned by cluster so the join is co-located).
    """
    c = ivf_assign(
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
        ),
        "_v",
        centroids,
        out_col="_cluster",
    )
    lo = c.select(
        F.col("_cluster"), F.col("_id").alias("_lo"), F.col("_v").alias("_lv")
    )
    hi = c.select(
        F.col("_cluster"), F.col("_id").alias("_hi"), F.col("_v").alias("_hv")
    )
    shadows = (
        lo.join(hi, "_cluster")
        .filter(F.col("_lo") < F.col("_hi"))
        .filter(cosine_expr(F.col("_lv"), F.col("_hv")) >= threshold)
        .groupBy("_hi")
        .agg(F.min("_lo").alias("dup_of"))
    )
    return (
        c.join(shadows, c["_id"] == shadows["_hi"], "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_cluster").cast("int").alias("cluster"),
            F.col("dup_of").isNull().alias("is_kept"),
            F.col("dup_of"),
        )
    )
