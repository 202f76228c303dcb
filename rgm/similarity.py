"""Approximate-nearest-neighbor search over embedding columns.

- brute_topk: exact cosine top-k, query side broadcast, dot products as
  built-in zip_with/aggregate expressions (JVM) — the correctness baseline.
- ivf_topk: IVF-style two-stage search — deterministic coarse centroids,
  cells assigned once, queries probe the nprobe nearest cells only. The
  100 TB path: candidate set shrinks by ~n_cells/nprobe and the scan is
  partition-pruned on cell id.

Top-k execution: scoring never funnels full-volume rows into one partition
per query. Each scan partition first reduces to its local top-k per query
(_partial_topk, an Arrow-batched in-place pass — no shuffle), and only the
k x n_partitions survivors reach the final per-query window. At 10^9
vectors the r1 plan (row_number window straight over all scored rows) was a
single-reducer top-k; this one shuffles k rows per partition per query.

Small-n_cells IVF runs the quantizer as pure JVM expressions (centroid
literals + zip_with/aggregate dot products) instead of a numpy UDF: same
math, no Arrow hop, and bit-identical to the DuckDB oracle mirror
(rgm.benchqueries) because both sides fold the same double literals with
sequential sums. The numpy path remains for large centroid banks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(u, v):
    return F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def _norm(v):
    """Norm with the same 1e-12 floor the numpy paths use: a zero-norm
    vector scores cosine 0 instead of raising DIVIDE_BY_ZERO under ANSI
    mode (or NaN with ANSI off, which the two top-k stages would order
    differently — ADVICE r2). A no-op bit-for-bit for every real vector."""
    return F.greatest(F.sqrt(_dot(v, v)), F.lit(1e-12))


def _const_array(c: np.ndarray):
    return F.array(*[F.lit(float(x)) for x in c])


def _partial_topk(scored: DataFrame, q_id_col: str, id_col: str, k: int) -> DataFrame:
    """Per-partition top-k per query — runs where the rows already are (no
    shuffle), bounding what the final global window must sort to
    k x n_partitions rows per query. Ordering matches the final window:
    cosine desc, id asc."""

    def part(it):
        best: pd.DataFrame | None = None
        for pdf in it:
            cur = pd.concat([best, pdf], ignore_index=True) if best is not None else pdf
            # na_position='first': a NaN cosine (zero-norm vector) must rank
            # as GREATEST under the descending sort, matching Spark's window
            # ordering (NaN > any value) — pandas' default na_position='last'
            # would prune a row here that the final window ranks first
            cur = cur.sort_values(
                [q_id_col, "cosine", id_col],
                ascending=[True, False, True],
                kind="mergesort",
                na_position="first",
            )
            best = cur.groupby(q_id_col, sort=False).head(k)
        if best is not None and len(best):
            yield best

    return scored.mapInPandas(part, scored.schema)


def _final_topk(scored_slim: DataFrame, q_id_col: str, id_col: str, k: int) -> DataFrame:
    reduced = _partial_topk(scored_slim, q_id_col, id_col, k)
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        reduced.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


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
    projection + per-partition top-k — the vectors are never shuffled and
    only k survivors per (query, partition) reach the final window."""
    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col),
        _norm(F.col(q_vec_col)).alias("q_norm"),
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col),
        _norm(F.col(vec_col)).alias("v_norm"),
    )
    scored = v.crossJoin(F.broadcast(q)).select(
        F.col(q_id_col), F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("v_norm") * F.col("q_norm"))
        ).alias("cosine"),
    )
    return _final_topk(scored, q_id_col, id_col, k)


def make_centroids(
    vectors: DataFrame, n_cells: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic coarse quantizer: the n_cells vectors with the smallest
    ids, RAW (cell ranking uses full cosine, so no pre-normalization — this
    keeps the doubles identical to what an oracle reads from the table).
    Swap for kmeans on a real corpus; the collect is n_cells rows."""
    rows = vectors.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _centroid_cosines(vec_col_expr, v_norm_expr, centroids: np.ndarray) -> list:
    """cos(v, c_i) for every centroid, as JVM expressions; centroid norms
    are in-expression (sqrt of an aggregate over the literal array) so
    constant folding computes them with the same sequential-sum semantics
    an oracle uses."""
    out = []
    for i in range(len(centroids)):
        arr = _const_array(centroids[i])
        out.append(
            _dot(vec_col_expr, arr) / (v_norm_expr * F.sqrt(_dot(arr, arr)))
        )
    return out


def assign_cells(
    vectors: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    use_expr: bool | None = None,
) -> DataFrame:
    """Add ``cell`` = argmax centroid cosine (first max wins on ties).

    Expression mode (default for small banks): array_max over
    struct(cosine, -idx) — pure JVM. numpy mode: one batched matmul per
    Arrow batch, for centroid banks too large to inline as literals."""
    if use_expr is None:
        use_expr = centroids.size <= 8192
    if use_expr:
        v_norm = _norm(F.col(vec_col))
        cosines = _centroid_cosines(F.col(vec_col), v_norm, centroids)
        structs = [
            F.struct(c.alias("c"), F.lit(-i).alias("ni")) for i, c in enumerate(cosines)
        ]
        best = F.array_max(F.array(*structs))
        return vectors.withColumn("cell", (-best["ni"]).cast("int"))

    cent = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.IntegerType())
    def cell_of(v: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int32))

    return vectors.withColumn("cell", cell_of(F.col(vec_col)))


def probe_cells_col(
    q_vec_expr, centroids: np.ndarray, nprobe: int, use_expr: bool = True
):
    """Column: array of the nprobe nearest centroid indices for a query
    vector (cosine desc, index asc on ties)."""
    if use_expr:
        v_norm = _norm(q_vec_expr)
        cosines = _centroid_cosines(q_vec_expr, v_norm, centroids)
        structs = [
            F.struct(c.alias("c"), F.lit(-i).alias("ni")) for i, c in enumerate(cosines)
        ]
        ordered = F.sort_array(F.array(*structs), asc=False)
        return F.transform(
            F.slice(ordered, 1, nprobe), lambda s: (-s["ni"]).cast("int")
        )

    cent = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cent.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    return probe(q_vec_expr)


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
    use_expr: bool | None = None,
) -> DataFrame:
    """IVF top-k: probe only the nprobe nearest coarse cells per query.

    Approximate (recall < 1 when the true neighbor lives in an unprobed
    cell); tests measure recall against brute_topk, and the driver oracle
    (rgm.benchqueries) mirrors the exact same centroid/probe math in SQL."""
    centroids = make_centroids(vectors, n_cells, vec_col, id_col)
    if use_expr is None:
        use_expr = centroids.size <= 8192
    v_cells = assign_cells(vectors, centroids, vec_col, use_expr)

    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col),
        F.explode(
            probe_cells_col(F.col(q_vec_col), centroids, nprobe, use_expr)
        ).alias("cell"),
    )
    cand = v_cells.join(F.broadcast(q), on="cell")
    scored = cand.select(
        F.col(q_id_col), F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (_norm(F.col(vec_col)) * _norm(F.col(q_vec_col)))
        ).alias("cosine"),
    )
    return _final_topk(scored, q_id_col, id_col, k)
