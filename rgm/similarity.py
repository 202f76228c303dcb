"""Approximate-nearest-neighbor search over embedding columns.

- brute_topk: exact cosine top-k, query side broadcast, dot products as
  built-in zip_with/aggregate expressions (JVM) — the correctness baseline.
- ivf_topk: IVF-style two-stage search — deterministic coarse centroids,
  cells assigned once (batch matmul in an Arrow UDF), queries probe the
  nprobe nearest cells only. The 100 TB path: candidate set shrinks by
  ~n_cells/nprobe and the scan is partition-pruned on cell id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(u, v):
    return F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def brute_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "q_embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against all vectors.

    Queries are broadcast; the big vector table streams through one
    projection + window — no shuffle of the vectors themselves."""
    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col),
        F.sqrt(_dot(F.col(q_vec_col), F.col(q_vec_col))).alias("q_norm"),
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("v_norm"),
    )
    scored = v.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col(q_vec_col))
        / (F.col("v_norm") * F.col("q_norm")),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def make_centroids(
    vectors: DataFrame, n_cells: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic coarse quantizer: the n_cells vectors with the smallest
    ids, L2-normalized (kmeans-free but stable; swap for kmeans on a real
    corpus)."""
    rows = vectors.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    c = np.asarray([r[0] for r in rows], dtype=np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def assign_cells(
    vectors: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``cell`` = argmax centroid cosine, via a batched Arrow UDF
    (one numpy matmul per batch)."""
    cent = centroids

    @F.pandas_udf(T.IntegerType())
    def cell_of(v: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int32))

    return vectors.withColumn("cell", cell_of(F.col(vec_col)))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "q_embedding",
) -> DataFrame:
    """IVF top-k: probe only the nprobe nearest coarse cells per query.

    Approximate (recall < 1 when the true neighbor lives in an unprobed
    cell); tests measure recall against brute_topk."""
    centroids = make_centroids(vectors, n_cells, vec_col, id_col)
    v_cells = assign_cells(vectors, centroids, vec_col)

    cent = centroids

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cent.T), axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col),
        F.explode(probe_cells(F.col(q_vec_col))).alias("cell"),
    )
    cand = v_cells.join(F.broadcast(q), on="cell")
    scored = cand.withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col(q_vec_col))
        / (
            F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
            * F.sqrt(_dot(F.col(q_vec_col), F.col(q_vec_col)))
        ),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )
