"""Vamana (DiskANN) graph build: alpha-robust pruning over a kNN graph.

Reference: ``python/cuvs/cuvs/neighbors/vamana/vamana.pyx:58-120``
(``graph_degree=32``, ``visited_size=64``, ``alpha=1.2``,
``max_fraction``) and ``cpp/src/neighbors/detail/vamana/`` (batched GPU
insertion: greedy-search candidates -> RobustPrune -> reverse-edge
insert -> re-prune). The DiskANN export format itself is handled by
``sources/graph_export.py``.

Spark-first re-expression of the *batch* build (no per-point sequential
insertion, which is a serving-side construction):

1. candidate generation = ``all_neighbors``-style partitioned kNN
   (``visited_size`` candidates per node — the |V| visited-list cap);
2. **RobustPrune** (alpha-RNG rule, Vamana Algorithm 2): per node walk
   candidates best-first, keep a candidate only if no already-kept
   neighbor covers it (``alpha * d(kept, cand) <= d(src, cand)``), stop
   at ``graph_degree``. A bounded per-node greedy -> one
   ``applyInPandas`` over (node, <=visited_size candidates);
3. reverse-edge insert + final degree cap (the batched stand-in for
   DiskANN's inter-batch back-edge pass).

Exact DuckDB oracle: the greedy is a recursive CTE over per-src sorted
candidate lists with pair distances pre-joined per candidate — decisions
compare the same template-generated doubles, so the whole build is
bit-reproducible across engines.

Scale notes (100 TB): every stage is bounded — candidates n*V rows,
pair table n*V^2 (V=64 -> 4096/node), the greedy is partition-local
after one shuffle on src; no stage materializes n^2 anything.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import (
    distance_sql_duckdb,
    distance_sql_spark,
)
from cuvs_spark.operators.graph import all_neighbors_build
from cuvs_spark.operators.select_k import select_k

__all__ = ["robust_prune", "robust_prune_sql", "vamana_build",
           "vamana_build_sql"]

_PRUNE_SCHEMA = "src long, dst long, distance double, rank long"


def robust_prune(edges: DataFrame, dataset: DataFrame,
                 graph_degree: int = 32, alpha: float = 1.2, *,
                 visited_size: int = 64, id_col: str = "id",
                 vec_col: str = "vec", metric: str = "sqeuclidean",
                 method: str = "expr") -> DataFrame:
    """Vamana RobustPrune on an edge table -> ``(src, dst, distance,
    rank)`` with <= ``graph_degree`` out-edges per src.

    ``method="expr"`` (oracle path): candidate-pair distances come from
    the same SQL expression template as the candidate distances (not
    NumPy), so the greedy's comparisons are bit-identical to the DuckDB
    oracle's — at the cost of materializing the n*V^2 pair relation.

    ``method="local"`` (scale path): only candidate *vectors* are
    shuffled (n*V rows); each node's V x V distance matrix is a local
    GEMM inside the grouped pandas greedy. Same greedy, float64 BLAS
    sums instead of sequential folds — what you run at 100 TB.
    """
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    cand = select_k(edges.select("src", "dst", "distance"),
                    "src", "distance", visited_size, tie_cols=["dst"],
                    rank_col=None)
    if method == "local":
        import numpy as np

        # one pandas group per node would mean n tiny applyInPandas
        # invocations (the per-group overhead dwarfs the V x V GEMM);
        # bucket ~2k nodes per group and loop srcs with NumPy inside
        def greedy_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["src", "distance", "dst"])
            srcs, dsts, dists = [], [], []
            ranks = []
            for src, grp in pdf.groupby("src", sort=False):
                X = np.vstack(grp["vec"].to_numpy()).astype(np.float64)
                nrm = (X * X).sum(1)
                D = nrm[:, None] + nrm[None, :] - 2.0 * (X @ X.T)
                dv = grp["distance"].to_numpy()
                dd = grp["dst"].to_numpy()
                kept: list[int] = []
                for i in range(len(dd)):
                    if len(kept) >= graph_degree:
                        break
                    if alpha * D[kept, i].min(initial=np.inf) > dv[i]:
                        kept.append(i)
                srcs.extend([src] * len(kept))
                dsts.extend(dd[kept])
                dists.extend(dv[kept])
                ranks.extend(range(1, len(kept) + 1))
            return pd.DataFrame({"src": srcs, "dst": dsts,
                                 "distance": dists, "rank": ranks})

        withvec = (cand.select("src", "dst", "distance")
                   .join(d.select(F.col("id").alias("dst"), "vec"), "dst")
                   .withColumn("_b", F.pmod(F.xxhash64("src"), F.lit(512))))
        return (withvec.groupBy("_b")
                .applyInPandas(greedy_bucket, _PRUNE_SCHEMA))
    pdist = F.expr(distance_sql_spark(metric, "_va", "_vb"))
    cp = (cand.select("src", F.col("dst").alias("a"))
          .join(cand.select("src", F.col("dst").alias("b")), "src")
          .filter(F.col("a") != F.col("b"))
          .join(d.select(F.col("id").alias("a"), F.col("vec").alias("_va")),
                "a")
          .join(d.select(F.col("id").alias("b"), F.col("vec").alias("_vb")),
                "b")
          .select("src", "a", "b", pdist.alias("dab")))
    pairs = (cp.groupBy("src", F.col("a").alias("dst"))
             .agg(F.collect_list(F.struct("b", "dab")).alias("pairs")))
    packed = (cand.select("src", "dst", "distance")
              .join(pairs, ["src", "dst"], "left"))

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["distance", "dst"])
        kept: list[tuple] = []
        kept_ids: set = set()
        for r in pdf.itertuples():
            if len(kept) >= graph_degree:
                break
            dab = ({} if r.pairs is None else
                   {int(p["b"]): float(p["dab"]) for p in r.pairs})
            # missing pair distance → +inf (candidate kept), matching the
            # oracle's coalesce(dab, 'inf') when a vector is absent from
            # the dataset side of the cp join
            if all(alpha * dab.get(j, float("inf")) > r.distance
                   for j in kept_ids):
                kept.append((r.src, r.dst, r.distance, len(kept) + 1))
                kept_ids.add(int(r.dst))
        return pd.DataFrame(kept,
                            columns=["src", "dst", "distance", "rank"])

    return packed.groupBy("src").applyInPandas(greedy, _PRUNE_SCHEMA)


def robust_prune_sql(edges_sql: str, dataset_sql: str, graph_degree: int,
                     alpha: float = 1.2, *, visited_size: int = 64,
                     metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for :func:`robust_prune`. ``edges_sql`` yields
    ``(src, dst, distance)``; ``dataset_sql`` yields ``(id, dv)``.

    The greedy is a recursive CTE: state per src = (sorted remaining
    candidate list, kept list); each step keeps the best remaining
    candidate and filters the ones it alpha-covers. Structs are ROW()s
    accessed positionally: remaining = (d, dst, pairs[(b, dab)])."""
    pdist = distance_sql_duckdb(metric, "da.dv", "db.dv")
    return f"""
WITH e AS ({edges_sql}), dt AS ({dataset_sql}),
cand AS (
  SELECT src, dst, distance FROM (
    SELECT src, dst, distance,
           row_number() OVER (PARTITION BY src
                              ORDER BY distance ASC, dst ASC) rn
    FROM e) WHERE rn <= {visited_size}),
cp AS (
  SELECT x.src AS src, x.dst AS a, y.dst AS b, {pdist} AS dab
  FROM cand x JOIN cand y ON x.src = y.src AND x.dst <> y.dst
       JOIN dt da ON da.id = x.dst JOIN dt db ON db.id = y.dst),
packed AS (
  SELECT c.src AS src,
         list_sort(list(ROW(c.distance, c.dst, pr.pairs))) AS remaining
  FROM cand c LEFT JOIN (
    SELECT src, a, list(ROW(b, dab)) AS pairs FROM cp GROUP BY src, a
  ) pr ON pr.src = c.src AND pr.a = c.dst
  GROUP BY c.src),
pruned AS (
  WITH RECURSIVE r AS (
    SELECT src, 0 AS step, remaining,
           []::STRUCT(d DOUBLE, dst BIGINT)[] AS kept
    FROM packed
    UNION ALL
    SELECT src, step + 1,
           list_filter(remaining[2:], x ->
             NOT (CAST({alpha!r} AS DOUBLE) *
                  coalesce(list_filter(x[3],
                    pp -> pp[1] = remaining[1][2])[1][2], CAST('inf' AS DOUBLE))
                  <= x[1])),
           list_append(kept, ROW(remaining[1][1], remaining[1][2]))
    FROM r WHERE len(remaining) > 0 AND len(kept) < {graph_degree})
  SELECT src, kept FROM (
    SELECT src, kept, row_number() OVER (PARTITION BY src
                                         ORDER BY step DESC) rn
    FROM r) WHERE rn = 1)
SELECT src, u.k.dst AS dst, u.k.d AS distance,
       CAST(row_number() OVER (PARTITION BY src
                               ORDER BY u.k.d ASC, u.k.dst ASC) AS BIGINT)
       AS rank
FROM pruned, unnest(kept) AS u(k)
"""


def vamana_build(dataset: DataFrame, graph_degree: int = 32, *,
                 alpha: float = 1.2, visited_size: int = 64,
                 metric: str = "sqeuclidean", id_col: str = "id",
                 vec_col: str = "vec", prune_method: str = "expr",
                 **builder_kw) -> DataFrame:
    """Batch Vamana build -> ``(src, dst, distance, rank)``.

    candidates (partitioned kNN, ``visited_size`` wide) -> RobustPrune
    (alpha rule, degree cap) -> reverse-edge insert -> final degree cap.
    The reverse pass is the batched analog of DiskANN's back-edge
    insertion; the final cap is a plain top-k (deterministic), keeping
    the full build SQL-expressible for the oracle."""
    base = all_neighbors_build(dataset, visited_size, metric=metric,
                               id_col=id_col, vec_col=vec_col, **builder_kw)
    pruned = robust_prune(base.drop("rank"), dataset, graph_degree, alpha,
                          visited_size=visited_size, id_col=id_col,
                          vec_col=vec_col, metric=metric,
                          method=prune_method)
    rev = pruned.select(F.col("dst").alias("src"),
                        F.col("src").alias("dst"), "distance")
    merged = (pruned.select("src", "dst", "distance").unionByName(rev)
              .groupBy("src", "dst").agg(F.min("distance").alias("distance")))
    return select_k(merged, "src", "distance", graph_degree,
                    tie_cols=["dst"])


def vamana_build_sql(dataset_sql: str, cent_sql: str, graph_degree: int,
                     alpha: float = 1.2, *, visited_size: int = 64,
                     overlap_factor: int = 2,
                     metric: str = "sqeuclidean") -> str:
    """Full-build oracle over fixed centroids (mirrors
    ``all_neighbors_sql`` candidates -> prune -> reverse -> cap)."""
    from cuvs_spark.operators.graph import all_neighbors_sql
    base = all_neighbors_sql(dataset_sql, cent_sql, visited_size,
                             overlap_factor, metric)
    pruned = robust_prune_sql(
        f"SELECT src, dst, distance FROM ({base})", dataset_sql,
        graph_degree, alpha, visited_size=visited_size, metric=metric)
    return f"""
WITH p AS ({pruned}),
merged AS (
  SELECT src, dst, min(distance) AS distance FROM (
    SELECT src, dst, distance FROM p
    UNION ALL
    SELECT dst AS src, src AS dst, distance FROM p
  ) GROUP BY src, dst),
ranked AS (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src
                            ORDER BY distance ASC, dst ASC) rank
  FROM merged)
SELECT src, dst, distance, rank FROM ranked WHERE rank <= {graph_degree}
"""
