"""Embedding similarity search (§2.9): brute-force cosine top-k baseline
and a random-hyperplane LSH bucketed variant as the scale path.

The vector math stays in Catalyst (``zip_with`` dot products over
double arrays) — no Python in the hot path. The LSH planes are
deterministic (seeded numpy) and shipped as literal arrays so results
are reproducible and cluster-independent.

Scale posture: brute force is O(Q·N) with the query side broadcast —
correct baseline and fine for Q ≪ N; the LSH variant prunes N to the
matching buckets (multi-probe by construction since each vector lands
in ``n_tables`` buckets), which is the 100 TB shape. An IVF variant
would follow the same skeleton with learned centroids instead of random
planes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: queries broadcast against the corpus.
    Deterministic tie-break on (cosine desc, neighbor id asc).
    Output: (q_id, n_id, rank, cos)."""
    base = embeddings.select(
        F.col(id_col).alias("n_id"), as_double(F.col(vec_col)).alias("v")
    )
    queries = base.filter(F.col("n_id").isin(query_ids)).select(
        F.col("n_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        base.join(F.broadcast(queries), F.col("n_id") != F.col("q_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("cos", 6).alias("cos"))
    )


def near_dup_pairs(embeddings: DataFrame, threshold: float = 0.4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   modulus: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, cos ≥ τ).

    ``modulus`` subsamples ids (id % modulus == 0) — the oracle-able
    correctness slice; the scale path replaces the self-join with the
    LSH bucketing below."""
    base = embeddings.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    if modulus:
        base = base.filter(F.col("id") % modulus == 0)
    a = base.select(F.col("id").alias("a_id"), F.col("v").alias("va"))
    b = base.select(F.col("id").alias("b_id"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", F.round("cos", 6).alias("cos"))
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from random hyperplanes (one 64-bit key)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def ann_lsh_topk(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                 n_planes: int = 6, n_tables: int = 8, dim: int = 64,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ANY of
    ``n_tables`` independent hyperplane tables, then exact cosine + rank.
    Recall grows with n_tables (multi-probe); precision is exact on the
    candidate set. Output: (q_id, n_id, rank, cos)."""
    base = embeddings.select(
        F.col(id_col).alias("n_id"), as_double(F.col(vec_col)).alias("v")
    )
    tables = [
        _planes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    bucketed = base.select(
        "n_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("table"), lsh_bucket(F.col("v"), tables[t]).alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("n_id", "v", "tb.table", "tb.bucket")
    queries = bucketed.filter(F.col("n_id").isin(query_ids)).select(
        F.col("n_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("table").alias("qt"),
        F.col("bucket").alias("qb"),
    )
    cand = (
        bucketed.join(
            F.broadcast(queries),
            (F.col("table") == F.col("qt"))
            & (F.col("bucket") == F.col("qb"))
            & (F.col("n_id") != F.col("q_id")),
        )
        .select("q_id", "qv", "n_id", "v")
        .distinct()
    )
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("cos", 6).alias("cos"))
    )
