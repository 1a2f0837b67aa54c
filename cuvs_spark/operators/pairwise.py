"""Pairwise distances, eps-neighborhood range join, KDE, refine.

Reference surfaces:
* ``distance.pairwise_distance`` — ``python/cuvs/cuvs/distance/distance.pyx:51``,
  C++ ``distance.hpp:163-461`` (full m×n matrix, 17 named metrics).
* ``epsilon_neighborhood.compute`` — ``epsilon_neighborhood.hpp:62``
  (adjacency dist ≤ eps + per-row degree) — a *range join* in Spark.
* ``distance.kde`` — ``kde.hpp:48`` (sum of kernel(dist/h) per query,
  kernels at ``distance.hpp:93-100``).
* ``refine`` — ``refine.pyx:34-50`` / ``cpp/src/neighbors/refine/``
  (exact re-rank of approximate candidates).

All are declarative DataFrame plans: Catalyst broadcasts the small side,
pushes predicates below the join, and codegens the scalar math. The m×n
output of ``pairwise_distance`` is long-form ``(i, j, distance)`` — at
scale callers should aggregate below it (kde/eps do) rather than
materialize it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import distance_sql_spark, is_min_close
from cuvs_spark.operators.select_k import select_k


def _sides(X: DataFrame, Y: DataFrame | None, x_id, x_vec, y_id, y_vec):
    a = X.select(F.col(x_id).cast("long").alias("i"), F.col(x_vec).alias("_xa"))
    yy = X if Y is None else Y
    b = yy.select(F.col(y_id).cast("long").alias("j"), F.col(y_vec).alias("_xb"))
    return a, b


def pairwise_distance(X: DataFrame, Y: DataFrame | None = None,
                      metric: str = "sqeuclidean", *,
                      x_id: str = "id", x_vec: str = "vec",
                      y_id: str = "id", y_vec: str = "vec",
                      minkowski_p: float = 2.0,
                      broadcast_y: bool = True) -> DataFrame:
    """Full distance matrix in long form ``(i, j, distance)``.

    Cosine hoists its two per-vector norm folds into one projection
    per side (r14, guide §1.2 step 2) so the m×n pair loop folds once
    (dot) instead of three times — bit-identical values, see
    :func:`cuvs_spark.functions.distance.cosine_norm_sql_spark`."""
    from cuvs_spark.functions.distance import METRICS
    a, b = _sides(X, Y, x_id, x_vec, y_id, y_vec)
    if METRICS[metric].name == "cosine":
        from cuvs_spark.functions.distance import (cosine_norm_sql_spark,
                                                   cosine_pair_sql_spark)
        a = a.withColumn("_na", F.expr(cosine_norm_sql_spark("_xa")))
        b = b.withColumn("_nb", F.expr(cosine_norm_sql_spark("_xb")))
        dist = F.expr(cosine_pair_sql_spark("_xa", "_xb", "_na", "_nb"))
    else:
        dist = F.expr(distance_sql_spark(metric, "_xa", "_xb", minkowski_p))
    b = F.broadcast(b) if broadcast_y else b
    return a.join(b).select("i", "j", dist.alias("distance"))


def epsilon_neighborhood(X: DataFrame, Y: DataFrame | None = None,
                         eps: float = 1.0, metric: str = "sqeuclidean", *,
                         x_id: str = "id", x_vec: str = "vec",
                         y_id: str = "id", y_vec: str = "vec") -> DataFrame:
    """Range join: all pairs with distance ≤ eps (``epsilon_neighborhood
    .hpp:62``). Returns ``(i, j, distance)``; degrees via
    ``eps_degrees``. The filter sits directly on the join output so no
    m×n relation is ever shuffled."""
    pd_ = pairwise_distance(X, Y, metric, x_id=x_id, x_vec=x_vec,
                            y_id=y_id, y_vec=y_vec)
    return pd_.filter(F.col("distance") <= eps)


def epsilon_neighborhood_blas(X: DataFrame, Y: DataFrame | None = None,
                              eps: float = 1.0,
                              metric: str = "sqeuclidean", *,
                              x_id: str = "id", x_vec: str = "vec",
                              y_id: str = "id",
                              y_vec: str = "vec") -> DataFrame:
    """BLAS-tiled range join — the throughput path for dense vectors.

    Broadcast Y as a matrix; each X partition computes a distance tile
    with NumPy and emits only pairs ≤ eps: no m×n relation exists
    outside a partition-local tile, and only matches hit the exchange
    (mirrors the filtered path of ``knn_brute_force.cuh:585``)."""
    import numpy as np
    import pandas as pd

    from cuvs_spark.operators.brute_force import _pairwise_np

    spark = X.sparkSession
    yy = X if Y is None else Y
    yp = yy.select(F.col(y_id).cast("long").alias("j"),
                   F.col(y_vec).alias("v")).toPandas()
    j_ids = yp["j"].to_numpy()
    M = np.vstack(yp["v"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((j_ids, M, metric, eps))

    def tiles(batches):
        j_ids, M, metric, eps = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
            ids = pdf["_i"].to_numpy().astype(np.int64)
            D = _pairwise_np(Q, M, metric)
            ii, jj = np.nonzero(D <= eps)
            yield pd.DataFrame({"i": ids[ii], "j": j_ids[jj],
                                "distance": D[ii, jj]})

    xp = X.select(F.col(x_id).cast("long").alias("_i"),
                  F.col(x_vec).alias("_v"))
    return xp.mapInPandas(tiles, schema="i long, j long, distance double")


def score_pairs(pairs: DataFrame, vectors: DataFrame, *,
                right_vectors: DataFrame | None = None,
                metric: str = "sqeuclidean",
                left_col: str = "src", right_col: str = "dst",
                id_col: str = "id", vec_col: str = "vec",
                method: str = "expr") -> DataFrame:
    """Distance for an explicit (left, right) id-pair relation —
    the scoring kernel of the iterative graph algorithms (NN-Descent
    rounds, CAGRA frontiers), where candidates arrive as edges, not as
    matrices.

    ``method="blas"`` evaluates the metric row-wise over Arrow batches
    (vectorized NumPy; ~10× the interpreted-HOF throughput); the join
    shape is identical, only the projection changes."""
    l = vectors.select(F.col(id_col).alias(left_col),
                       F.col(vec_col).alias("_va"))
    rv = vectors if right_vectors is None else right_vectors
    r = rv.select(F.col(id_col).alias(right_col),
                  F.col(vec_col).alias("_vb"))
    joined = pairs.join(l, left_col).join(r, right_col)
    if method == "blas":
        import numpy as np
        import pandas as pd

        def rowwise(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                A = np.vstack(pdf["_va"].to_numpy()).astype(np.float64)
                B = np.vstack(pdf["_vb"].to_numpy()).astype(np.float64)
                if metric == "sqeuclidean":
                    d = ((A - B) ** 2).sum(1)
                elif metric in ("euclidean", "l2"):
                    d = np.sqrt(((A - B) ** 2).sum(1))
                elif metric == "cosine":
                    d = 1.0 - (A * B).sum(1) / (
                        np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
                elif metric in ("inner_product", "dot"):
                    d = (A * B).sum(1)
                elif metric in ("cityblock", "l1"):
                    d = np.abs(A - B).sum(1)
                else:
                    raise ValueError(f"no rowwise kernel for {metric!r}")
                yield pd.DataFrame({left_col: pdf[left_col],
                                    right_col: pdf[right_col],
                                    "distance": d})

        return joined.select(left_col, right_col, "_va", "_vb").mapInPandas(
            rowwise, schema=f"{left_col} long, {right_col} long, distance double")
    dist = F.expr(distance_sql_spark(metric, "_va", "_vb"))
    return joined.select(left_col, right_col, dist.alias("distance"))


def eps_degrees(adj: DataFrame) -> DataFrame:
    """Per-row neighborhood size (the ``vd`` output of the reference)."""
    return adj.groupBy("i").agg(F.count("*").alias("degree"))


_KERNELS = {
    # kernel(u) templates over u = dist/h  (distance.hpp:93-100)
    "gaussian": "exp(CAST(-0.5 AS DOUBLE) * {u} * {u})",
    "epanechnikov": ("CASE WHEN abs({u}) < CAST(1 AS DOUBLE) THEN "
                     "CAST(1 AS DOUBLE) - {u} * {u} ELSE CAST(0 AS DOUBLE) END"),
    "exponential": "exp(-abs({u}))",
    "tophat": ("CASE WHEN abs({u}) < CAST(1 AS DOUBLE) THEN CAST(1 AS DOUBLE) "
               "ELSE CAST(0 AS DOUBLE) END"),
    "linear": ("CASE WHEN abs({u}) < CAST(1 AS DOUBLE) THEN "
               "CAST(1 AS DOUBLE) - abs({u}) ELSE CAST(0 AS DOUBLE) END"),
    "cosine_kernel": ("CASE WHEN abs({u}) < CAST(1 AS DOUBLE) THEN "
                      "cos(CAST(pi() AS DOUBLE) / CAST(2 AS DOUBLE) * {u}) "
                      "ELSE CAST(0 AS DOUBLE) END"),
}


def kde(dataset: DataFrame, queries: DataFrame, bandwidth: float = 1.0,
        kernel: str = "gaussian", metric: str = "euclidean", *,
        id_col: str = "id", vec_col: str = "vec",
        qid_col: str = "qid", qvec_col: str = "vec") -> DataFrame:
    """Kernel density estimate per query (``kde.hpp:48``): the m×n join
    collapses through a partial-aggregated sum — map-side combine keeps
    the shuffle at one row per (qid, partition)."""
    from cuvs_spark.functions.distance import METRICS
    a, b = _sides(queries, dataset, qid_col, qvec_col, id_col, vec_col)
    if METRICS[metric].name == "cosine":
        # r15 (guide §1.2 step 2, the r14 factored-cosine template):
        # hoist the two per-vector norm folds into one projection per
        # side so the m×n pair loop folds once (dot) — bit-identical
        # values (see distance.cosine_norm_sql_spark), same 6-dp round.
        from cuvs_spark.functions.distance import (cosine_norm_sql_spark,
                                                   cosine_pair_sql_spark)
        a = a.withColumn("_na", F.expr(cosine_norm_sql_spark("_xa")))
        b = b.withColumn("_nb", F.expr(cosine_norm_sql_spark("_xb")))
        dist = cosine_pair_sql_spark("_xa", "_xb", "_na", "_nb")
    else:
        dist = distance_sql_spark(metric, "_xa", "_xb")
    u = f"(({dist}) / CAST({bandwidth} AS DOUBLE))"
    kern = _KERNELS[kernel].format(u=u)
    # float group-sum order is engine/run-dependent → round to 6 dp so the
    # DuckDB oracle hash-matches (see plans/oracle.py kde_sql)
    return (a.join(b)
            .select(F.col("i").alias("qid"), F.expr(kern).alias("_k"))
            .groupBy("qid").agg(F.round(F.sum("_k"), 6).alias("density")))


def refine(dataset: DataFrame, queries: DataFrame, candidates: DataFrame,
           k: int = 10, metric: str = "sqeuclidean", *,
           id_col: str = "id", vec_col: str = "vec",
           qid_col: str = "qid", qvec_col: str = "vec") -> DataFrame:
    """Exact re-rank of approximate candidates (``refine.pyx:34-50``):
    candidates ⋈ dataset on id → exact distance vs the query vector →
    top-k. Pure DataFrame op; the candidate set is tiny relative to the
    dataset so the vector fetch is an id-equi-join that AQE turns into a
    broadcast when it fits."""
    cand = candidates.select(F.col("qid").cast("long").alias("qid"),
                             F.col("id").cast("long").alias("nid"))
    d = dataset.select(F.col(id_col).cast("long").alias("nid"),
                       F.col(vec_col).alias("_dv"))
    q = queries.select(F.col(qid_col).cast("long").alias("qid"),
                       F.col(qvec_col).alias("_qv"))
    from cuvs_spark.functions.distance import METRICS
    if METRICS[metric].name == "cosine":
        # r15: factored cosine (r14 template) — each dataset/query
        # vector's norm folds once in its own projection instead of
        # once per candidate pair; bit-identical values.
        from cuvs_spark.functions.distance import (cosine_norm_sql_spark,
                                                   cosine_pair_sql_spark)
        d = d.withColumn("_dn", F.expr(cosine_norm_sql_spark("_dv")))
        q = q.withColumn("_qn", F.expr(cosine_norm_sql_spark("_qv")))
        dist = F.expr(cosine_pair_sql_spark("_qv", "_dv", "_qn", "_dn"))
    else:
        dist = F.expr(distance_sql_spark(metric, "_qv", "_dv"))
    pairs = (cand.join(d, "nid").join(F.broadcast(q), "qid")
             .select("qid", "nid", dist.alias("distance")))
    return select_k(pairs, "qid", "distance", k,
                    select_min=is_min_close(metric), tie_cols=["nid"])
