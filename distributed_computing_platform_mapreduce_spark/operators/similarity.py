"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; random-hyperplane LSH
bucketing is the scale path (candidates only within matching buckets).
Dot products use ``F.zip_with`` + ``F.aggregate`` — sequential fold in
array order, JVM-side, deterministic.

At 100 TB the exact variant is a broadcast of the (small) query set
against the corpus — no corpus shuffle; top-k per query is a bounded
window. The LSH variant buckets the corpus once and probes buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast the query set (queries ≪ corpus), compute cosine per
    (query, corpus) pair map-side, then per-query top-k via ranking
    window (shuffles only the query-id-keyed scored rows; with k small,
    a per-partition pre-truncation would bound it further — AQE handles
    the residual skew).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG stream —
    no RNG import, reproducible across runs)."""
    planes, state = [], 42
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 12) -> Column:
    """Random-hyperplane (sign) LSH bucket id: bit i = sign(v·planeᵢ).

    2^n_planes buckets; cosine-similar vectors land together w.h.p.
    """
    planes = _hyperplanes(dim, n_planes)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(v, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    The corpus is bucketed once (reusable across query batches — on a
    real deployment this is a bucketed/partitioned table on disk). Probe
    joins on bucket equality, so comparison count ≈ corpus/2^planes per
    query instead of the full corpus.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        lsh_bucket(corpus, vec_col, dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        lsh_bucket(queries, vec_col, dim, n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-bucketing:
    same-bucket pairs verified with exact cosine ≥ threshold."""
    b = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket(corpus, vec_col, dim, n_planes).alias("bucket"),
    )
    a2 = b.alias("a")
    b2 = b.alias("b")
    return (
        a2.join(b2, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
