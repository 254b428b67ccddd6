"""Embedding covariance + PCA — the representation-analysis pass of an
embedding pipeline (whitening, dimensionality reduction, drift checks).

100 TB shape: the covariance is computed as PER-PARTITION PARTIAL SUMS
in one Arrow pass (each partition emits ONE row: n, Σx, flattened
Σxxᵀ — a numpy matmul per batch), combined driver-side across the
partition-count rows — the treeAggregate pattern, no shuffle of the
data at all, driver work bounded by partitions × dim². The
eigendecomposition runs on the driver over the dim×dim matrix (64×64
here — microseconds; this is how MLlib's PCA works too), and the
projection back over the corpus is a map-only Arrow matmul.

Gate split (the usual trained-model pattern): the COVARIANCE is plain
arithmetic and fully hash-gated in SQL (``embed_covariance`` replays it
as an exploded dim-pair self-join aggregation); the eigendecomposition
is not SQL-expressible, so projection correctness is pinned by spectral
property tests (orthonormal components, descending explained variance,
projection = X·W, reconstruction error shrinking in k).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_instrument_spark.session import local_df


def _partial_moments(dim: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            n += X.shape[0]
            s += X.sum(axis=0)
            ss += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
        )

    return run


def moments(embeddings: DataFrame, vec_col: str = "embedding",
            dim: int = 64) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, covariance) via one Arrow pass of per-partition partial
    sums + a driver combine over partition-count rows. Population
    covariance (divide by n), matching the SQL oracle's arithmetic."""
    parts = (
        embeddings.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(_partial_moments(dim), "n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("moments() over an empty embedding table")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def covariance_table(embeddings: DataFrame, vec_col: str = "embedding",
                     dim: int = 64) -> DataFrame:
    """(i, j, cov) rows of the population covariance, rounded to 6 —
    the oracle-gateable face of :func:`moments` (driver-computed from
    the same partial sums, emitted as a small DataFrame: dim² rows)."""
    _, _, cov = moments(embeddings, vec_col, dim)
    spark = embeddings.sparkSession
    rows = [
        (i, j, round(float(cov[i, j]), 6)) for i in range(dim) for j in range(dim)
    ]
    return local_df(spark, rows, "i int, j int, cov double")


def pca(embeddings: DataFrame, k: int = 8, vec_col: str = "embedding",
        dim: int = 64) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components[k×dim], explained_variance[k]) — eigh on the
    driver-side covariance, eigenvectors by descending eigenvalue with
    a deterministic sign convention (largest-|coord| entry positive)."""
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    _, mean, cov = moments(embeddings, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # k × dim
    for r in range(k):
        j = int(np.abs(comps[r]).argmax())
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return mean, comps, vals[order]


def pca_project(embeddings: DataFrame, mean: np.ndarray,
                components: np.ndarray, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Map-only Arrow projection: (id, proj array<double>) with
    proj = (x - mean) · componentsᵀ. Rounded to 6 for cross-run
    stability of downstream comparisons."""
    mean = np.asarray(mean, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64) - mean
            P = np.round(X @ W.T, 6)
            yield pd.DataFrame({"id": pdf["id"], "proj": list(map(list, P))})

    return embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).mapInPandas(run, "id long, proj array<double>")
