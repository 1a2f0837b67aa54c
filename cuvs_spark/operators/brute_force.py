"""Exact brute-force kNN — top-k similarity join (SURVEY.md §2.5).

Reference: ``python/cuvs/cuvs/neighbors/brute_force/brute_force.pyx:60,120``
(build/search with optional prefilter); physical impl
``cpp/src/neighbors/detail/knn_brute_force.cuh`` — tiled pairwise GEMM
(:62), per-tile select_k (:267), cross-tile merge (:309), filtered path
(:585).

Two physical paths, one logical contract
``knn(dataset, queries, k, metric, prefilter) -> (qid, nid, distance, rank)``:

* ``method="expr"`` — declarative: broadcast the query side into a
  nested-loop join, compute the distance as a JVM SQL expression, then
  two-phase top-k. Catalyst sees the whole plan (filters push below the
  join, column pruning reaches the scan). Exact-oracle path.
* ``method="blas"`` — the throughput path and the direct analog of the
  reference's tiled kernel: the query matrix is broadcast to every
  executor; each *dataset partition* computes a NumPy/BLAS distance tile
  and reduces it to its local top-k **before any shuffle** — so the
  exchange carries only ``n_parts × n_queries × k`` rows instead of
  ``n_rows × n_queries``. At 100 TB this is the difference between a
  bounded merge and an impossible shuffle. Mirrors
  ``tiled_brute_force_knn`` + ``knn_merge_parts``.

Prefilters (reference ``filters.pyx:29,39,89``):
* ``prefilter`` — arbitrary boolean Column over dataset rows (bitset
  analog, shared by all queries). Applied *before* distance — Catalyst
  pushes it into the parquet scan.
* ``allow_pairs`` — per-(qid, id) allow DataFrame (bitmap analog),
  applied as a join predicate / semi-join before distance.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import distance_sql_spark, is_min_close
from cuvs_spark.operators.select_k import knn_merge_parts, select_k

_OUT_SCHEMA = "qid long, nid long, distance double"


def knn(dataset: DataFrame,
        queries: DataFrame,
        k: int = 10,
        metric: str = "sqeuclidean",
        *,
        id_col: str = "id",
        vec_col: str = "vec",
        qid_col: str = "qid",
        qvec_col: str = "vec",
        prefilter: Column | None = None,
        allow_pairs: DataFrame | None = None,
        method: str = "expr",
        minkowski_p: float = 2.0,
        with_distance: bool = True,
        broadcast_queries: bool | None = None,
        broadcast_query_limit: int = 500_000) -> DataFrame:
    """Exact k nearest neighbors of every query row against the dataset.

    Returns ``(qid, nid, distance, rank)`` sorted best-first per qid,
    ties broken by nid (matching the tie-tolerant comparison of
    ``cpp/tests/neighbors/ann_utils.cuh:257``).

    **Query-side bound.** Both physical paths assume the query set is
    the small side (the reference's batch-search shape — ~10k queries
    against millions of rows): ``blas`` collects the query matrix to
    the driver and broadcasts it to every executor; ``expr`` broadcasts
    the query table into a nested-loop join. The blas collect is
    self-guarding: it fetches at most ``broadcast_query_limit + 1``
    rows (so an unexpectedly huge query table can't OOM the driver)
    and auto-falls back to the non-broadcast expr plan when the limit
    trips — a partition-pair cartesian where each task streams one
    (dataset-partition × query-partition) block, so memory stays
    bounded; the n×m *compute* is inherent to exact brute force. Pass
    ``broadcast_queries=False`` to force that plan on the expr path
    too. For a genuinely huge query side prefer the bucketed paths
    (``ivf_flat_search`` / ``lsh_knn``), which avoid the n×m work
    entirely.
    """
    if prefilter is not None:
        dataset = dataset.filter(prefilter)
    if broadcast_queries is False and method == "blas":
        method = "expr"   # the tiled kernel requires the collected matrix
    if method == "blas":
        out = _knn_blas(dataset, queries, k, metric,
                        id_col=id_col, vec_col=vec_col,
                        qid_col=qid_col, qvec_col=qvec_col,
                        allow_pairs=allow_pairs,
                        query_limit=broadcast_query_limit)
    else:
        out = _knn_expr(dataset, queries, k, metric,
                        id_col=id_col, vec_col=vec_col,
                        qid_col=qid_col, qvec_col=qvec_col,
                        allow_pairs=allow_pairs, p=minkowski_p,
                        broadcast_queries=broadcast_queries is not False)
    if not with_distance:
        out = out.drop("distance")
    return out


def _knn_expr(dataset, queries, k, metric, *, id_col, vec_col, qid_col,
              qvec_col, allow_pairs, p=2.0,
              broadcast_queries=True) -> DataFrame:
    from cuvs_spark.plans.layout import spread_narrow
    # r14: the n×m distance fold is the whole cost of exact brute force
    # — spread a narrow dataset side over the cores (no-op when the
    # scan already has enough splits; guide §2.5)
    d = spread_narrow(
        dataset.select(F.col(id_col).cast("long").alias("nid"),
                       F.col(vec_col).alias("_dv")), "nid")
    q = queries.select(F.col(qid_col).cast("long").alias("qid"),
                       F.col(qvec_col).alias("_qv"))
    # Query side is the small side by contract (n_queries << n_rows):
    # broadcast it so the dataset scan streams with no shuffle. With
    # broadcast_queries=False (huge query sets) the same logical plan
    # runs as a partition-pair cartesian instead — memory-bounded,
    # no driver collect, inherent n×m compute.
    # r14 (guide §1.2 step 2): cosine's two norm folds are per-vector,
    # not per-pair — hoist them into one projection per side so the
    # n×m hot loop folds once (dot) instead of three times. Values are
    # bit-identical (same folds, evaluated earlier; see
    # cosine_norm_sql_spark).
    from cuvs_spark.functions.distance import METRICS
    factored_cos = METRICS[metric].name == "cosine"
    if factored_cos:
        from cuvs_spark.functions.distance import (cosine_norm_sql_spark,
                                                   cosine_pair_sql_spark)
        d = d.withColumn("_dn", F.expr(cosine_norm_sql_spark("_dv")))
        q = q.withColumn("_qn", F.expr(cosine_norm_sql_spark("_qv")))
    joined = d.join(F.broadcast(q)) if broadcast_queries else d.crossJoin(q)
    if allow_pairs is not None:
        ap = allow_pairs.select(F.col("qid").cast("long").alias("qid"),
                                F.col("id").cast("long").alias("nid"))
        joined = joined.join(ap, ["qid", "nid"], "left_semi")
    if factored_cos:
        dist = F.expr(cosine_pair_sql_spark("_qv", "_dv", "_qn", "_dn"))
    else:
        dist = F.expr(distance_sql_spark(metric, "_qv", "_dv", p))
    pairs = joined.select("qid", "nid", dist.alias("distance"))
    return select_k(pairs, "qid", "distance", k,
                    select_min=is_min_close(metric), tie_cols=["nid"])


# ---------------------------------------------------------------------------
# BLAS-tiled path
# ---------------------------------------------------------------------------

def _pairwise_np(Q: np.ndarray, X: np.ndarray, metric: str) -> np.ndarray:
    """Dense (n_queries × n_rows) distance tile in float64 via BLAS."""
    if metric in ("sqeuclidean", "euclidean", "l2", "l2_expanded",
                  "l2sqrt_expanded"):
        # in-place accumulation on the GEMM output: a (q, x) tile is
        # touched once, not 4x via broadcast temporaries (the adds are
        # memory-bound — this is ~5x on big tiles)
        D = Q @ X.T
        D *= -2.0
        D += (Q * Q).sum(1)[:, None]
        D += (X * X).sum(1)[None, :]
        np.maximum(D, 0.0, out=D)
        if metric in ("euclidean", "l2", "l2sqrt_expanded"):
            np.sqrt(D, out=D)
        return D
    if metric in ("inner_product", "dot"):
        return Q @ X.T
    if metric == "cosine":
        qn = np.linalg.norm(Q, axis=1)[:, None]
        xn = np.linalg.norm(X, axis=1)[None, :]
        D = Q @ X.T
        D /= np.maximum(qn * xn, 1e-300)
        np.subtract(1.0, D, out=D)
        return D
    if metric in ("cityblock", "l1", "manhattan"):
        # chunked to bound the (q, x, d) intermediate
        out = np.empty((Q.shape[0], X.shape[0]))
        step = max(1, int(2**24 / max(1, Q.shape[0] * Q.shape[1])))
        for s in range(0, X.shape[0], step):
            out[:, s:s + step] = np.abs(
                Q[:, None, :] - X[None, s:s + step, :]).sum(-1)
        return out
    if metric in ("chebyshev", "linf"):
        out = np.empty((Q.shape[0], X.shape[0]))
        step = max(1, int(2**24 / max(1, Q.shape[0] * Q.shape[1])))
        for s in range(0, X.shape[0], step):
            out[:, s:s + step] = np.abs(
                Q[:, None, :] - X[None, s:s + step, :]).max(-1)
        return out
    raise ValueError(f"metric {metric!r} has no BLAS kernel; use method='expr'")


def _knn_blas(dataset, queries, k, metric, *, id_col, vec_col, qid_col,
              qvec_col, allow_pairs, query_limit=500_000) -> DataFrame:
    """Tiled-GEMM exact kNN. The query matrix is collected to the
    driver and broadcast — the reference's batch-search design point
    (``tiled_brute_force_knn``'s host-resident query batch). The
    collect is bounded to ``query_limit + 1`` rows so a huge query
    table can't OOM the driver; past the limit the call falls back to
    the non-broadcast expr plan (partition-pair cartesian), and truly
    huge query sides belong on the bucketed paths (IVF / LSH)."""
    if allow_pairs is not None:
        # bitmap-filtered search stays on the declarative path
        return _knn_expr(dataset, queries, k, metric, id_col=id_col,
                         vec_col=vec_col, qid_col=qid_col, qvec_col=qvec_col,
                         allow_pairs=allow_pairs)
    spark = dataset.sparkSession
    qp = (queries.select(F.col(qid_col).cast("long").alias("qid"),
                         F.col(qvec_col).alias("v"))
          .limit(query_limit + 1).toPandas())
    if len(qp) > query_limit:
        return _knn_expr(dataset, queries, k, metric, id_col=id_col,
                         vec_col=vec_col, qid_col=qid_col,
                         qvec_col=qvec_col, allow_pairs=None,
                         broadcast_queries=False)
    q_ids = qp["qid"].to_numpy()
    Q = np.vstack(qp["v"].to_numpy()).astype(np.float64)
    minimize = is_min_close(metric)
    bc = spark.sparkContext.broadcast((q_ids, Q, metric, minimize, k))

    def tile_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, Q, metric, minimize, k = bc.value
        nq = Q.shape[0]
        best_d = np.full((nq, 0), np.nan)
        best_i = np.full((nq, 0), -1, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
            ids = pdf["_id"].to_numpy().astype(np.int64)
            D = _pairwise_np(Q, X, metric)
            if not minimize:
                D = -D
            cat_d = np.concatenate([best_d, D], axis=1)
            cat_i = np.concatenate(
                [best_i, np.broadcast_to(ids, (nq, len(ids)))], axis=1)
            keep = min(k, cat_d.shape[1])
            part = np.argpartition(cat_d, keep - 1, axis=1)[:, :keep]
            best_d = np.take_along_axis(cat_d, part, axis=1)
            best_i = np.take_along_axis(cat_i, part, axis=1)
        if best_d.shape[1]:
            m = best_d.shape[1]
            yield pd.DataFrame({
                "qid": np.repeat(q_ids, m),
                "nid": best_i.ravel(),
                "distance": (best_d if minimize else -best_d).ravel(),
            })

    pairs = dataset.select(F.col(id_col).cast("long").alias("_id"),
                           F.col(vec_col).alias("_v"))
    local = pairs.mapInPandas(tile_topk, schema=_OUT_SCHEMA)
    return knn_merge_parts(local, k, select_min=minimize)


class BruteForceIndex:
    """The reference's ``brute_force.Index`` (``brute_force.pyx:60``):
    for an exact index the "build" is just binding the dataset and
    metric — Spark's lazy DataFrame IS the index; ``search`` delegates
    to :func:`knn`.  Exists so the save/load and tiered/composite
    surfaces can treat brute force like any other index type."""

    def __init__(self, dataset: DataFrame, metric: str = "sqeuclidean",
                 *, id_col: str = "id", vec_col: str = "vec"):
        self.dataset = dataset.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("vec"))
        self.metric = metric

    def search(self, queries: DataFrame, k: int = 10, **kw) -> DataFrame:
        return knn(self.dataset, queries, k, self.metric, **kw)


def bf_build(dataset: DataFrame, metric: str = "sqeuclidean", *,
             id_col: str = "id", vec_col: str = "vec") -> BruteForceIndex:
    return BruteForceIndex(dataset, metric, id_col=id_col, vec_col=vec_col)


def knn_udf_metric(dataset: DataFrame, queries: DataFrame, k: int,
                   metric_fn, *, select_min: bool = True,
                   id_col: str = "id", vec_col: str = "vec",
                   qid_col: str = "qid", qvec_col: str = "vec") -> DataFrame:
    """kNN with a user-supplied Python distance — the ``CustomUDF``
    metric surface (``distance.hpp:66``, ``fern/pages/udf_usage.md``,
    test ``cpp/tests/neighbors/ann_ivf_flat/test_udf.cu``).

    ``metric_fn(A, B) -> np.ndarray`` takes two (n, dim) float64 blocks
    and returns n pairwise distances — an Arrow-batched pandas UDF, the
    Spark analog of the reference's NVRTC-JIT'd device lambda. The
    builtin expression metrics are the precompiled fast path; this is
    the escape hatch."""
    import pandas as pd

    @F.pandas_udf("double")
    def _d(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        return pd.Series(metric_fn(A, B))

    d = dataset.select(F.col(id_col).cast("long").alias("nid"),
                       F.col(vec_col).alias("_dv"))
    q = queries.select(F.col(qid_col).cast("long").alias("qid"),
                       F.col(qvec_col).alias("_qv"))
    pairs = (d.join(F.broadcast(q))
             .select("qid", "nid", _d("_qv", "_dv").alias("distance")))
    return select_k(pairs, "qid", "distance", k, select_min=select_min,
                    tie_cols=["nid"])


def knn_precomputed(distances: DataFrame, k: int, *,
                    select_min: bool = True) -> DataFrame:
    """``DistanceType.Precomputed`` (``distance.hpp:64``): the caller
    supplies the ``(qid, nid, distance)`` relation; we only rank."""
    return select_k(distances.select("qid", "nid", "distance"),
                    "qid", "distance", k, select_min=select_min,
                    tie_cols=["nid"])


def masked_nn(dataset: DataFrame, queries: DataFrame, mask: DataFrame,
              k: int = 10, metric: str = "sqeuclidean", **kw) -> DataFrame:
    """``masked_nn`` (``cpp/src/distance/masked_nn.cuh:103``): NN under
    an adjacency mask — the mask is the bitmap prefilter semi-join."""
    return knn(dataset, queries, k, metric, allow_pairs=mask, **kw)


def knn_self(dataset: DataFrame, k: int, metric: str = "sqeuclidean",
             *, id_col: str = "id", vec_col: str = "vec",
             include_self: bool = False, method: str = "expr") -> DataFrame:
    """All-pairs kNN of a table against itself (kNN-graph building block,
    reference ``all_neighbors.pyx:198``)."""
    q = dataset.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    out = knn(dataset, q, k + (0 if include_self else 1), metric,
              id_col=id_col, vec_col=vec_col, qid_col="qid", qvec_col="qv",
              method=method)
    if not include_self:
        out = (out.filter(F.col("qid") != F.col("nid"))
               .drop("rank"))
        out = select_k(out, "qid", "distance", k,
                       select_min=is_min_close(metric), tie_cols=["nid"])
    return out
