"""kNN-graph builders and graph ANN search (SURVEY.md §2.5, Phase 3).

Reference surfaces:
* ``all_neighbors.build`` — ``python/cuvs/cuvs/neighbors/all_neighbors/
  all_neighbors.pyx:66-140,198``: partition into ``n_clusters`` batches
  with ``overlap_factor``, per-batch local kNN, merge. **This is the
  reference's own distributed blueprint and maps 1:1 onto Spark**:
  multi-assignment = top-o centroid join, batches = partitions,
  merge = union + per-key top-k.
* ``nn_descent.build`` — ``nn_descent.pyx:39-100,210`` (``graph_degree``,
  ``max_iterations=20``, ``termination_threshold``): iterate
  neighbor-of-neighbor candidate joins until convergence.
* ``cagra.build/optimize/search`` — ``cagra.pyx:241-331,601-689``;
  C++ ``cagra.hpp:934,3300,1552``; ``detail/cagra/graph_core.cuh``
  (optimize: degree-bounded pruning + reverse edges). Build here =
  kNN graph + optimize on the edge table; search = batched beam
  traversal as an iterative frontier join (batch analytics only — the
  recommended serving paths are exact/IVF, per BASELINE.json).

Edge tables are ``(src, dst, distance)`` DataFrames — GraphFrames-
compatible and the natural Spark shape. Iterative loops cut lineage
with ``localCheckpoint`` each round (SURVEY §7 "what's hard").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.cluster.kmeans import coarse_sorted_sql, kmeans_fit
from cuvs_spark.functions.distance import distance_sql_spark, is_min_close
from cuvs_spark.operators.select_k import select_k


def all_neighbors_build(dataset: DataFrame, k: int = 10, *,
                        n_clusters: int = 8, overlap_factor: int = 2,
                        metric: str = "sqeuclidean",
                        id_col: str = "id", vec_col: str = "vec",
                        centroids: np.ndarray | None = None,
                        kmeans_n_iters: int = 8, seed: int = 42,
                        method: str = "expr") -> DataFrame:
    """Approximate all-pairs kNN graph → ``(src, dst, distance, rank)``.

    Each point joins its ``overlap_factor`` nearest clusters; candidate
    pairs exist only *within* a shared cluster, so the join is
    partition-local after one shuffle on cluster id — the exact shape
    the reference distributes over GPUs (``all_neighbors.pyx:198``).

    ``method="blas"`` computes each cluster's local kNN as one
    applyInPandas GEMM tile with a bounded top-k before the merge
    (~20× the per-pair throughput of the interpreted expression path;
    the 100 TB batch shape). ``"expr"`` stays oracle-exact.

    DIRECTIONAL since r12 (r11 verdict #3, the graph family's last
    min-close guard): the overlap batching stays on the L2 k-means
    geometry — exactly the reference's batch partitioner,
    ``all_neighbors.pyx:66-140`` — while local scoring, the duplicate
    fold and the final top-k follow ``is_min_close(metric)``, matching
    how the reference's per-batch builders accept inner_product."""
    close = is_min_close(metric)
    spark = dataset.sparkSession
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    if centroids is None:
        model = kmeans_fit(d, n_clusters, max_iter=kmeans_n_iters, seed=seed,
                           balanced=True)
        centroids = model.centroids
    if method == "blas":
        import pandas as pd

        from cuvs_spark.operators.brute_force import _pairwise_np

        # multi-assignment as one GEMM map pass that carries the vector
        # through — no n*n_clusters relation, no window shuffle, and
        # (r14, guide §8 "move heavy bytes once") no join back on id:
        # the old skinny-assign + join re-shuffled the corpus by id
        # just to re-attach a vector this pass already holds, so the
        # payload crossed the network twice (join, then the cl
        # repartition below) instead of once
        C = np.asarray(centroids, np.float64)
        cn = (C * C).sum(1)[None, :]
        o = overlap_factor

        def assign_topo(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                D = cn - 2.0 * (X @ C.T)
                part = np.argpartition(D, o - 1, axis=1)[:, :o]
                idx = np.repeat(np.arange(len(pdf)), o)
                yield pd.DataFrame({
                    "id": pdf["id"].to_numpy(np.int64)[idx],
                    "cl": part.astype(np.int64).ravel(),
                    "vec": pdf["vec"].to_numpy()[idx]})

        asg = d.mapInPandas(assign_topo,
                            "id long, cl long, vec array<float>")
    else:
        # r14: multi-assignment as a map-only literal slice — same
        # rows/ties as the old broadcast-join + window (guide §2.4)
        cs = coarse_sorted_sql("vec", centroids)
        asg = (d.select(
            "id", "vec",
            F.explode(F.expr(f"slice({cs}, 1, {overlap_factor})"))
            .alias("_s"))
            .select("id", F.col("_s.l").cast("int").alias("cl"), "vec"))
    if method == "blas":

        def local_knn(pdf: pd.DataFrame) -> pd.DataFrame:
            m = len(pdf)
            if m < 2:
                return pd.DataFrame(columns=["src", "dst", "distance"])
            X = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            ids = pdf["id"].to_numpy().astype(np.int64)
            kk = min(k, m - 1)
            # tile the query side so a skewed cluster costs O(chunk*m)
            # memory, never a full m*m matrix
            chunk = max(256, int(2 ** 27 / max(1, m)))
            outs = []
            for s in range(0, m, chunk):
                D = _pairwise_np(X[s:s + chunk], X, metric)
                c = D.shape[0]
                D[np.arange(c), np.arange(s, s + c)] = (np.inf if close
                                                        else -np.inf)
                part = np.argpartition(D if close else -D,
                                       kk - 1, axis=1)[:, :kk]
                outs.append(pd.DataFrame({
                    "src": np.repeat(ids[s:s + c], kk),
                    "dst": ids[part].ravel(),
                    "distance": np.take_along_axis(D, part,
                                                   axis=1).ravel()}))
            return pd.concat(outs, ignore_index=True)

        # pre-partition on cl with an explicit count: the grouped-map
        # exchange is reused as-is, so AQE cannot coalesce the pandas
        # stage down to a couple of tasks (quadratic local work must
        # spread over every core)
        local = (asg.repartition(max(32, n_clusters), "cl")
                 .groupBy("cl").applyInPandas(
                     local_knn, schema="src long, dst long, distance double"))
        # best-edge fold for pairs sharing several clusters (GEMM tile
        # floats aren't bit-pinned across tiles, so the fold direction
        # matters here; on the expr path the duplicates are identical)
        best = F.min if close else F.max
        pairs = (local.groupBy("src", "dst")
                 .agg(best("distance").alias("distance")))
        return select_k(pairs, "src", "distance", k, tie_cols=["dst"],
                        select_min=close)
    a = asg.select(F.col("id").alias("src"), "cl", F.col("vec").alias("_va"))
    b = asg.select(F.col("id").alias("dst"), "cl", F.col("vec").alias("_vb"))
    dist = F.expr(distance_sql_spark(metric, "_va", "_vb"))
    best = F.min if close else F.max
    pairs = (a.join(b, "cl")
             .filter(F.col("src") != F.col("dst"))
             .select("src", "dst", dist.alias("distance"))
             .groupBy("src", "dst").agg(best("distance").alias("distance")))
    return select_k(pairs, "src", "distance", k, tie_cols=["dst"],
                    select_min=close)


def all_neighbors_sql(dataset_sql: str, cent_sql: str, k: int,
                      overlap_factor: int = 2,
                      metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for the fixed-centroid all_neighbors pipeline.
    Directional since r12: assignment stays on the L2 batching
    geometry, the duplicate fold and the rank flip with
    ``is_min_close(metric)`` like the Spark side."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    best = "min" if is_min_close(metric) else "max"
    order = "ASC" if is_min_close(metric) else "DESC"
    adist = distance_sql_duckdb("sqeuclidean", "d.dv", "c.cv")
    pdist = distance_sql_duckdb(metric, "a.dv", "b.dv")
    return f"""
WITH d AS ({dataset_sql}), c AS ({cent_sql}),
asg AS (
  SELECT id, cl FROM (
    SELECT d.id AS id, c.label AS cl,
           row_number() OVER (PARTITION BY d.id ORDER BY {adist} ASC, c.label ASC) rn
    FROM d CROSS JOIN c) WHERE rn <= {overlap_factor}),
pairs AS (
  SELECT x.id AS src, y.id AS dst, {best}({pdist}) AS distance
  FROM asg x JOIN asg y ON x.cl = y.cl AND x.id <> y.id
       JOIN d a ON a.id = x.id JOIN d b ON b.id = y.id
  GROUP BY x.id, y.id),
ranked AS (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src ORDER BY distance {order}, dst ASC) rank
  FROM pairs)
SELECT src, dst, distance, rank FROM ranked WHERE rank <= {k}
"""


def nn_descent_build(dataset: DataFrame, k: int = 10, *,
                     max_iterations: int = 6,
                     termination_threshold: float = 0.001,
                     metric: str = "sqeuclidean", id_col: str = "id",
                     vec_col: str = "vec", score_method: str = "expr",
                     sample_per_node: int | None = None,
                     init_graph: DataFrame | None = None) -> DataFrame:
    """NN-Descent (``nn_descent.pyx:210``): start from a deterministic
    pseudo-random graph, iterate (neighbors-of-neighbors join →
    distance → per-node top-k) until < threshold of edges change.

    Each round is one self-join on the bounded edge table (n·k rows) —
    never on the full pair space; lineage is cut per round.

    ``init_graph``: caller-provided ``(src, dst)`` starting edges in
    place of the default pseudo-random bucketed init — the oracle hook
    (:func:`nn_descent_sql` reproduces an md5-ranked init both engines
    can compute) and the warm-start hook (resume descent from a saved
    graph).

    Direction follows ``is_min_close(metric)`` (``distance.hpp:72-85``;
    the reference's NN-Descent accepts inner_product,
    ``nn_descent.pyx:48``): every per-node top-k keeps the k best —
    smallest for min-close metrics, largest for inner_product."""
    close = is_min_close(metric)
    d = (dataset.select(F.col(id_col).cast("long").alias("id"),
                        F.col(vec_col).alias("vec"))
         .persist())
    n = d.count()
    if init_graph is not None:
        init = init_graph.select(F.col("src").cast("long"),
                                 F.col("dst").cast("long"))
    else:
        # init: k pseudo-random distinct neighbors WITHOUT an n² cross
        # join — two INDEPENDENT hash bucketings of ~4k members are
        # equi-joined, so each node draws its ~4k candidates from an
        # unrelated slice of the whole dataset (O(n·k) pairs, no
        # bucket-local connectivity trap)
        n_buckets = max(1, n // (4 * k))
        bx = d.select("id", (F.pmod(F.xxhash64("id", F.lit(1)),
                                    F.lit(n_buckets))).alias("_b"))
        by = d.select("id", (F.pmod(F.xxhash64("id", F.lit(2)),
                                    F.lit(n_buckets))).alias("_b"))
        init = (bx.alias("x")
                .join(by.alias("y"), (F.col("x._b") == F.col("y._b"))
                      & (F.col("x.id") != F.col("y.id")))
                .select(F.col("x.id").alias("src"),
                        F.col("y.id").alias("dst"))
                .withColumn("_h", F.xxhash64("src", "dst")))
        init = select_k(init, "src", "_h", k, tie_cols=["dst"],
                        rank_col=None).select("src", "dst")
    from cuvs_spark.operators.pairwise import score_pairs

    def with_dist(edges: DataFrame) -> DataFrame:
        return score_pairs(edges, d, metric=metric, method=score_method)

    g = select_k(with_dist(init), "src", "distance", k, select_min=close,
                 tie_cols=["dst"], rank_col=None).localCheckpoint()
    for it in range(max_iterations):
        fwd = g.select("src", "dst")
        rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        und = fwd.unionByName(rev)
        # neighbor-of-neighbor candidates grow as n·(2k)² per round;
        # sample_per_node bounds that to n·s² at corpus scale (the
        # reference's internal per-round sampling, nn_descent.cuh) at
        # some recall cost per round — leave None below ~10⁵ rows
        sampled = und
        if sample_per_node is not None:
            sampled = select_k(
                und.withColumn("_h", F.xxhash64("src", "dst", F.lit(it))),
                "src", "_h", sample_per_node, tie_cols=["dst"],
                rank_col=None).select("src", "dst")
        cand = (sampled.alias("x")
                .join(sampled.alias("y"), F.col("x.dst") == F.col("y.src"))
                .select(F.col("x.src").alias("src"),
                        F.col("y.dst").alias("dst"))
                .filter(F.col("src") != F.col("dst"))
                .unionByName(fwd)
                .distinct())
        new_g = select_k(with_dist(cand), "src", "distance", k,
                         select_min=close, tie_cols=["dst"],
                         rank_col=None).localCheckpoint()
        changed = (new_g.select("src", "dst")
                   .exceptAll(g.select("src", "dst")).count())
        g = new_g
        if changed <= termination_threshold * n * k:
            break
    d.unpersist()
    return select_k(g, "src", "distance", k, select_min=close,
                    tie_cols=["dst"])


def nn_descent_sql(dataset_sql: str, k: int, *, max_iterations: int = 2,
                   metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for a FIXED-ITERATION NN-Descent run — the
    neighbor-of-neighbor rounds (``nn_descent.pyx:210`` semantics)
    unrolled into ``max_iterations`` CTE rounds over an md5-ranked
    init graph both engines compute identically (per src, the ``k``
    smallest ``md5(src || '_' || dst)`` — same hex on both engines).

    Exactly mirrors :func:`nn_descent_build` when the Spark side
    passes the same md5 init via ``init_graph=`` and
    ``termination_threshold=0.0``: the Spark loop then breaks only at
    a fixed point, where every further unrolled round here is a no-op
    by construction (``cand`` depends only on ``g``), so early
    termination and full unrolling agree.

    ``dataset_sql`` → ``(nid, dv)``. Distance orderings follow
    ``is_min_close(metric)`` exactly as the Spark side's ``select_k``
    calls do (DESC for inner_product); the md5 init ranking is
    direction-independent."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dirn = "ASC" if is_min_close(metric) else "DESC"
    dist = distance_sql_duckdb(metric, "a.dv", "b.dv")
    parts = [f"""
WITH d AS MATERIALIZED ({dataset_sql}),
init AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.nid AS src, b.nid AS dst,
           row_number() OVER (PARTITION BY a.nid
             ORDER BY md5(CAST(a.nid AS VARCHAR) || '_' ||
                          CAST(b.nid AS VARCHAR)) ASC, b.nid ASC) rn
    FROM d a JOIN d b ON a.nid <> b.nid) WHERE rn <= {k}),
g0 AS MATERIALIZED (
  SELECT src, dst, distance FROM (
    SELECT i.src, i.dst, {dist} AS distance,
           row_number() OVER (PARTITION BY i.src
                              ORDER BY {dist} {dirn}, i.dst ASC) rn
    FROM init i JOIN d a ON a.nid = i.src JOIN d b ON b.nid = i.dst)
  WHERE rn <= {k})"""]
    prev = "g0"
    for i in range(1, max_iterations + 1):
        parts.append(f""",
und{i} AS MATERIALIZED (
  SELECT src, dst FROM {prev}
  UNION ALL
  SELECT dst AS src, src AS dst FROM {prev}),
cand{i} AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT x.src AS src, y.dst AS dst
    FROM und{i} x JOIN und{i} y ON x.dst = y.src
    WHERE x.src <> y.dst
    UNION ALL
    SELECT src, dst FROM {prev})),
g{i} AS MATERIALIZED (
  SELECT src, dst, distance FROM (
    SELECT c.src, c.dst, {dist} AS distance,
           row_number() OVER (PARTITION BY c.src
                              ORDER BY {dist} {dirn}, c.dst ASC) rn
    FROM cand{i} c JOIN d a ON a.nid = c.src JOIN d b ON b.nid = c.dst)
  WHERE rn <= {k})""")
        prev = f"g{i}"
    parts.append(f"""
SELECT src, dst, distance, rank FROM (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src
                            ORDER BY distance {dirn}, dst ASC) rank
  FROM {prev}) WHERE rank <= {k}""")
    return "".join(parts)


def nn_descent_md5_init(dataset: DataFrame, k: int, *,
                        id_col: str = "id") -> DataFrame:
    """The Spark twin of :func:`nn_descent_sql`'s init CTE: per src the
    ``k`` smallest ``md5(src || '_' || dst)`` over all distinct pairs.
    O(n²) hashing — a gate/small-corpus construction; the operator's
    default bucketed init is the at-scale path."""
    ids = dataset.select(F.col(id_col).cast("long").alias("id"))
    a = ids.select(F.col("id").alias("src"))
    b = ids.select(F.col("id").alias("dst"))
    pairs = (a.crossJoin(b).filter(F.col("src") != F.col("dst"))
             .withColumn("_h", F.md5(F.concat_ws(
                 "_", F.col("src").cast("string"),
                 F.col("dst").cast("string")))))
    return select_k(pairs, "src", "_h", k, tie_cols=["dst"],
                    rank_col=None).select("src", "dst")


def cagra_optimize(edges: DataFrame, graph_degree: int = 16, *,
                   intermediate_degree: int | None = None,
                   select_min: bool = True) -> DataFrame:
    """CAGRA graph optimize (``cagra.hpp:3300``, ``graph_core.cuh``):
    bound out-degree, add reverse edges for reachability, re-bound.
    Pure edge-table transforms → ``(src, dst, distance, rank)``.
    ``select_min=False`` keeps the LARGEST distances (pass
    ``is_min_close(metric)`` — inner_product graphs, r11) and folds
    duplicate edges with max instead of min."""
    best = F.min if select_min else F.max
    inter = intermediate_degree or 2 * graph_degree
    e = edges.select("src", "dst", "distance")
    fwd = select_k(e, "src", "distance", inter, select_min=select_min,
                   tie_cols=["dst"], rank_col=None)
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "distance")
    merged = (fwd.unionByName(rev)
              .groupBy("src", "dst").agg(best("distance").alias("distance")))
    return select_k(merged, "src", "distance", graph_degree,
                    select_min=select_min, tie_cols=["dst"])


def cagra_optimize_sql(edges_sql: str, graph_degree: int,
                       intermediate_degree: int | None = None,
                       select_min: bool = True) -> str:
    inter = intermediate_degree or 2 * graph_degree
    dirn = "ASC" if select_min else "DESC"
    best = "min" if select_min else "max"
    return f"""
WITH e AS ({edges_sql}),
fwd AS (
  SELECT src, dst, distance FROM (
    SELECT src, dst, distance,
           row_number() OVER (PARTITION BY src ORDER BY distance {dirn}, dst ASC) rn
    FROM e) WHERE rn <= {inter}),
merged AS (
  SELECT src, dst, {best}(distance) AS distance FROM (
    SELECT src, dst, distance FROM fwd
    UNION ALL
    SELECT dst AS src, src AS dst, distance FROM fwd
  ) GROUP BY src, dst),
ranked AS (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src ORDER BY distance {dirn}, dst ASC) rank
  FROM merged)
SELECT src, dst, distance, rank FROM ranked WHERE rank <= {graph_degree}
"""


def cagra_build(dataset: DataFrame, graph_degree: int = 16, *,
                build_algo: str = "all_neighbors", metric: str = "sqeuclidean",
                id_col: str = "id", vec_col: str = "vec",
                **builder_kw) -> DataFrame:
    """kNN graph via the chosen builder + optimize (``cagra.pyx:241-331``
    ``build_algo``: ivf_pq/nn_descent/ace → here all_neighbors or
    nn_descent)."""
    inter = 2 * graph_degree
    if build_algo in ("iterative", "iterative_cagra_search"):
        return cagra_build_iterative(dataset, graph_degree, metric=metric,
                                     id_col=id_col, vec_col=vec_col,
                                     **builder_kw)
    if build_algo == "nn_descent":
        g = nn_descent_build(dataset, inter, metric=metric, id_col=id_col,
                             vec_col=vec_col, **builder_kw)
    else:
        g = all_neighbors_build(dataset, inter, metric=metric, id_col=id_col,
                                vec_col=vec_col, **builder_kw)
    return cagra_optimize(g.drop("rank"), graph_degree,
                          select_min=is_min_close(metric))


def cagra_build_iterative(dataset: DataFrame, graph_degree: int = 16, *,
                          n_iters: int = 2, metric: str = "sqeuclidean",
                          id_col: str = "id", vec_col: str = "vec",
                          itopk: int | None = None,
                          search_width: int = 8,
                          search_iterations: int = 6) -> DataFrame:
    """``build_algo='iterative_cagra_search'`` (``cagra.pyx:261-272``):
    build the graph by self-search instead of an all-neighbors stage —
    the reference's memory-lean build, which is also the Spark shape
    that avoids any per-cluster quadratic work.

    Seed: a deterministic bucketed pseudo-random graph — hash every id
    into buckets of ~2·degree nodes, within-bucket exact kNN (a plain
    equi-join on the bucket key; never cartesian). Refine: each round,
    every point beam-searches the CURRENT graph for its own neighbors
    (one :func:`cagra_search` over the full point set — bounded
    frontier joins) and the found edges fold back through
    :func:`cagra_optimize` (reverse edges + degree bound). Lineage is
    cut per round. NN-Descent-style convergence, but the candidate
    generator is the searchable index itself."""
    close = is_min_close(metric)
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec")).persist()
    n = d.count()
    bucket_sz = max(2 * graph_degree + 1, 8)
    n_buckets = max(1, int(n) // bucket_sz)
    left = d.select(F.col("id").alias("src"), F.col("vec").alias("_sv"),
                    F.expr(f"pmod(xxhash64(id), {n_buckets})").alias("_b"))
    right = d.select(F.col("id").alias("dst"), F.col("vec").alias("_dv"),
                     F.expr(f"pmod(xxhash64(id), {n_buckets})").alias("_b"))
    pairs = (left.join(right, "_b")
             .filter(F.col("src") != F.col("dst"))
             .select("src", "dst",
                     F.expr(distance_sql_spark(metric, "_sv", "_dv"))
                     .alias("distance")))
    seed = select_k(pairs, "src", "distance", 2 * graph_degree,
                    select_min=close, tie_cols=["dst"], rank_col=None)
    g = cagra_optimize(seed, graph_degree,
                       select_min=close).localCheckpoint()
    q = d.select(F.col("id").alias("qid"), F.col("vec").alias("qv"))
    for _ in range(max(0, n_iters)):
        found = cagra_search(
            g, d, q, graph_degree + 1,
            itopk=itopk or max(32, 2 * graph_degree),
            search_width=search_width,
            max_iterations=search_iterations, metric=metric,
            qvec_col="qv")
        new_edges = (found.filter(F.col("qid") != F.col("nid"))
                     .select(F.col("qid").alias("src"),
                             F.col("nid").alias("dst"), "distance"))
        merged = g.select("src", "dst", "distance").unionByName(new_edges)
        g = cagra_optimize(merged, graph_degree,
                           select_min=close).localCheckpoint()
    d.unpersist()
    return g


def cagra_from_graph(graph: DataFrame, *, src_col: str = "src",
                     dst_col: str = "dst") -> DataFrame:
    """``cagra.from_graph`` (``cagra.pyx``): adopt a pre-built adjacency
    as a CAGRA index. Our index IS the ``(src, dst)`` edge table, so
    this just normalizes column names — any kNN graph (NN-Descent,
    all_neighbors, an imported HNSW base layer) becomes searchable."""
    return graph.select(F.col(src_col).cast("long").alias("src"),
                        F.col(dst_col).cast("long").alias("dst"))


def cagra_search(graph: DataFrame, dataset: DataFrame, queries: DataFrame,
                 k: int = 10, *, itopk: int = 32, search_width: int = 8,
                 max_iterations: int = 8, metric: str = "sqeuclidean",
                 id_col: str = "id", vec_col: str = "vec",
                 qid_col: str = "qid", qvec_col: str = "vec",
                 n_seeds: int = 16, score_method: str = "expr",
                 prefilter: DataFrame | None = None,
                 seeds: DataFrame | None = None,
                 stop_on_empty: bool = True) -> DataFrame:
    """Batched beam search over the graph (``cagra_search.cuh:137``):
    per query keep an ``itopk`` candidate pool; each round expands the
    best ``search_width`` unexpanded nodes through the edge table,
    scores new candidates, re-selects the pool. All rounds are bounded
    joins on (n_queries × width) frontiers — batch analytics, not a
    serving path.

    ``prefilter``: an allowed-ids DataFrame (one ``id`` column — the
    bitset analog). Reference semantics (filtered CAGRA search): the
    graph is traversed UNFILTERED so connectivity through removed nodes
    survives; only the result pool is filtered. Size ``itopk`` above
    ``k / keep-fraction`` to hold recall.

    ``stop_on_empty=False`` drops the per-round empty-frontier check —
    one eager driver job per beam round that fixed-iteration callers
    (small ``max_iterations``, e.g. the hash-exact gates) don't
    need: an empty frontier
    makes every remaining round a no-op by construction (no candidates,
    pool unchanged), so skipping the check never changes the result,
    only trades ≤``max_iterations`` wasted no-op rounds for
    ``max_iterations`` saved Spark jobs. Keep the default ``True`` when
    ``max_iterations`` is large relative to the expected convergence.

    Direction follows ``is_min_close(metric)`` (``cagra.pyx:250`` lists
    inner_product): frontier choice, pool reselection and the final
    top-k all keep the k best — largest for max-close metrics."""
    close = is_min_close(metric)
    d = (dataset.select(F.col(id_col).cast("long").alias("nid"),
                        F.col(vec_col).alias("_dv")).persist())
    q = (queries.select(F.col(qid_col).cast("long").alias("qid"),
                        F.col(qvec_col).alias("_qv")).persist())
    edges = graph.select("src", "dst").persist()
    dist = F.expr(distance_sql_spark(metric, "_qv", "_dv"))

    def score(cand: DataFrame) -> DataFrame:
        if score_method == "blas":
            from cuvs_spark.operators.pairwise import score_pairs
            out = score_pairs(
                cand.select(F.col("qid").alias("src"),
                            F.col("nid").alias("dst")),
                q.select(F.col("qid").alias("id"), F.col("_qv").alias("vec")),
                right_vectors=d.select(F.col("nid").alias("id"),
                                       F.col("_dv").alias("vec")),
                metric=metric, method="blas")
            return out.select(F.col("src").alias("qid"),
                              F.col("dst").alias("nid"), "distance")
        return (cand.join(d, "nid").join(F.broadcast(q), "qid")
                .select("qid", "nid", dist.alias("distance")))

    # seeds: caller-provided per-query (qid, nid) entry points (the
    # hierarchical-HNSW descent hands its layer-(l+1) winners down), or
    # one deterministic pseudo-random sample of the dataset shared by
    # every query (n_seeds rows crossed with the query set — never the
    # full n × n_queries relation)
    if seeds is not None:
        seed_pairs = seeds.select(F.col("qid").cast("long").alias("qid"),
                                  F.col("nid").cast("long").alias("nid"))
    else:
        seed_ids = (d.select("nid")
                    .orderBy(F.xxhash64("nid"), "nid").limit(n_seeds))
        seed_pairs = q.select("qid").join(F.broadcast(seed_ids))
    pool = (score(seed_pairs).withColumn("expanded", F.lit(False))
            .localCheckpoint())
    for _ in range(max_iterations):
        frontier = select_k(pool.filter(~F.col("expanded")),
                            "qid", "distance", search_width,
                            select_min=close, tie_cols=["nid"],
                            rank_col=None)
        if stop_on_empty and frontier.isEmpty():
            break
        expanded_now = frontier.select("qid", "nid",
                                       F.lit(True).alias("expanded"))
        cand = (frontier.select("qid", F.col("nid").alias("src"))
                .join(edges, "src")
                .select("qid", F.col("dst").alias("nid"))
                .distinct()
                .join(pool.select("qid", "nid"), ["qid", "nid"],
                      "left_anti"))
        scored = score(cand).withColumn("expanded", F.lit(False))
        merged = (pool.join(expanded_now.withColumnRenamed("expanded", "_e"),
                            ["qid", "nid"], "left")
                  .select("qid", "nid", "distance",
                          F.coalesce("_e", F.col("expanded")).alias("expanded"))
                  .unionByName(scored))
        pool = select_k(merged, "qid", "distance", itopk,
                        select_min=close, tie_cols=["nid"],
                        rank_col=None).localCheckpoint()
    results = pool.select("qid", "nid", "distance")
    if prefilter is not None:
        allowed = prefilter.select(F.col("id").cast("long").alias("nid"))
        results = results.join(F.broadcast(allowed), "nid", "left_semi")
    out = select_k(results, "qid", "distance", k, select_min=close,
                   tie_cols=["nid"])
    d.unpersist(); q.unpersist(); edges.unpersist()
    return out


def cagra_search_sql(dataset_sql: str, queries_sql: str, edges_sql: str,
                     k: int, *, itopk: int = 32, search_width: int = 8,
                     max_iterations: int = 2, n_seeds: int = 16,
                     metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for a FIXED-ITERATION ``cagra_search`` run — the
    beam loop (``cagra_search.cuh:137`` semantics) unrolled into
    ``max_iterations`` rounds of frontier → expand → score → reselect
    CTEs. Exactly mirrors :func:`cagra_search` when the Spark side
    passes the same graph and an explicit md5-ordered shared seed set
    (``seeds=``): seed ids are the ``n_seeds`` smallest by
    ``md5(CAST(nid AS VARCHAR))`` — both engines produce identical hex
    digests for identical integer strings, so the entry points match
    bit-for-bit, and the distance folds are the parity-proven
    templates, so every frontier/pool ordering agrees.

    ``dataset_sql`` → ``(nid, dv)``; ``queries_sql`` → ``(qid, qv)``;
    ``edges_sql`` → at least ``(src, dst)``. An empty frontier round
    degenerates to a no-op here exactly as the Spark loop's ``break``
    does (no candidates, pool unchanged). Distance orderings follow
    ``is_min_close(metric)`` exactly as the Spark side's ``select_k``
    calls do (DESC for inner_product); md5 seed ranking is
    direction-independent."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dirn = "ASC" if is_min_close(metric) else "DESC"
    dist = distance_sql_duckdb(metric, "q.qv", "d.dv")
    parts = [f"""
WITH d AS MATERIALIZED ({dataset_sql}), q AS MATERIALIZED ({queries_sql}),
edges AS MATERIALIZED (SELECT src, dst FROM ({edges_sql})),
seed_ids AS MATERIALIZED (
  SELECT nid FROM d
  ORDER BY md5(CAST(nid AS VARCHAR)) ASC, nid ASC
  LIMIT {n_seeds}),
pool0 AS MATERIALIZED (
  SELECT q.qid, d.nid, {dist} AS distance, FALSE AS expanded
  FROM q CROSS JOIN seed_ids s JOIN d ON d.nid = s.nid)"""]
    prev = "pool0"
    for i in range(1, max_iterations + 1):
        parts.append(f""",
front{i} AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY distance {dirn}, nid ASC) rn
    FROM {prev} WHERE NOT expanded) WHERE rn <= {search_width}),
cand{i} AS MATERIALIZED (
  SELECT DISTINCT f.qid, e.dst AS nid
  FROM front{i} f JOIN edges e ON e.src = f.nid
  WHERE NOT EXISTS (SELECT 1 FROM {prev} p
                    WHERE p.qid = f.qid AND p.nid = e.dst)),
scored{i} AS MATERIALIZED (
  SELECT c.qid, c.nid, {dist} AS distance, FALSE AS expanded
  FROM cand{i} c JOIN d ON d.nid = c.nid JOIN q ON q.qid = c.qid),
merged{i} AS (
  SELECT p.qid, p.nid, p.distance,
         (p.expanded OR f.nid IS NOT NULL) AS expanded
  FROM {prev} p LEFT JOIN front{i} f
       ON f.qid = p.qid AND f.nid = p.nid
  UNION ALL
  SELECT qid, nid, distance, expanded FROM scored{i}),
pool{i} AS MATERIALIZED (
  SELECT qid, nid, distance, expanded FROM (
    SELECT qid, nid, distance, expanded,
           row_number() OVER (PARTITION BY qid
                              ORDER BY distance {dirn}, nid ASC) rn
    FROM merged{i}) WHERE rn <= {itopk})""")
        prev = f"pool{i}"
    parts.append(f"""
SELECT qid, nid, distance, rank FROM (
  SELECT qid, nid, distance,
         row_number() OVER (PARTITION BY qid
                            ORDER BY distance {dirn}, nid ASC) rank
  FROM {prev}) WHERE rank <= {k}""")
    return "".join(parts)


def cagra_extend(graph: DataFrame, dataset: DataFrame,
                 new_rows: DataFrame, graph_degree: int = 16, *,
                 metric: str = "sqeuclidean", id_col: str = "id",
                 vec_col: str = "vec", itopk: int = 32,
                 search_width: int = 8, max_iterations: int = 4,
                 score_method: str = "expr",
                 seeds: DataFrame | None = None,
                 stop_on_empty: bool = True) -> tuple[DataFrame, DataFrame]:
    """``cagra.extend`` (``cagra.hpp:1255``, ``cagra.pyx:1065``): add a
    batch of vectors to a built graph without a full rebuild.

    The reference's batched extend searches the existing graph for each
    new vector and splices it in; here: (1) beam-search the graph for
    each new row's approximate neighbors, (2) brute-force kNN *within*
    the new batch (new↔new edges — batches are small relative to the
    index), (3) union forward+reverse edges with the old graph and
    re-bound degree with the optimize rule. Returns
    ``(extended_graph, extended_dataset)``.

    Scale notes: the only work proportional to the index is the beam
    search (bounded frontier joins); everything else is sized by the
    new batch. This is the CAGRA tier's compaction step for the
    streaming/tiered ingestion path (``tiered.py``).

    Direction follows ``is_min_close(metric)``: the intra-batch kNN
    (``knn_self``), the per-edge fold (min for min-close, max for
    inner_product) and the optimize re-bound all flip together."""
    from cuvs_spark.operators.brute_force import knn_self
    close = is_min_close(metric)
    best = F.min if close else F.max
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    new = new_rows.select(F.col(id_col).cast("long").alias("id"),
                          F.col(vec_col).alias("vec"))
    found = cagra_search(graph, d,
                         new.select(F.col("id").alias("qid"), "vec"),
                         graph_degree, itopk=itopk,
                         search_width=search_width,
                         max_iterations=max_iterations, metric=metric,
                         qvec_col="vec", score_method=score_method,
                         seeds=seeds, stop_on_empty=stop_on_empty)
    splice = found.select(F.col("qid").alias("src"),
                          F.col("nid").alias("dst"), "distance")
    intra = (knn_self(new, graph_degree, metric)
             .select(F.col("qid").alias("src"),
                     F.col("nid").alias("dst"), "distance"))
    merged = (graph.select("src", "dst", "distance")
              .unionByName(splice).unionByName(intra)
              .groupBy("src", "dst").agg(best("distance").alias("distance")))
    return (cagra_optimize(merged, graph_degree, select_min=close),
            d.unionByName(new))


def cagra_extend_sql(dataset_sql: str, new_sql: str, graph_sql: str,
                     graph_degree: int, *, itopk: int = 32,
                     search_width: int = 8, max_iterations: int = 4,
                     n_seeds: int = 16,
                     metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for :func:`cagra_extend`'s extended GRAPH — the
    full splice composition: fixed-iteration beam search of the old
    graph for every new row (:func:`cagra_search_sql` with the
    md5-ordered seed rule over the BASE dataset), brute-force kNN
    within the new batch, union + per-edge min with the old edges, and
    the optimize re-bound (:func:`cagra_optimize_sql`). Mirrors the
    Spark operator exactly when it is called with the matching
    ``seeds=`` (new qids × md5-top-``n_seeds`` base ids).

    ``dataset_sql``/``new_sql`` → ``(nid, dv)``; ``graph_sql`` →
    ``(src, dst, distance)``.

    Direction follows ``is_min_close(metric)`` (r11, per ADVICE r10
    #1): the intra-batch kNN ordering matches ``knn_self``'s
    directional top-k, the per-edge fold flips min↔max, and the beam /
    optimize stages inherit the flip from their own generators."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    close = is_min_close(metric)
    dirn = "ASC" if close else "DESC"
    best = "min" if close else "max"
    beam = cagra_search_sql(
        dataset_sql, f"SELECT nid AS qid, dv AS qv FROM ({new_sql})",
        graph_sql, graph_degree, itopk=itopk, search_width=search_width,
        max_iterations=max_iterations, n_seeds=n_seeds, metric=metric)
    intra_dist = distance_sql_duckdb(metric, "a.dv", "b.dv")
    merged = f"""
SELECT src, dst, {best}(distance) AS distance FROM (
  SELECT src, dst, distance FROM ({graph_sql})
  UNION ALL
  SELECT qid AS src, nid AS dst, distance FROM ({beam})
  UNION ALL
  SELECT src, dst, distance FROM (
    SELECT a.nid AS src, b.nid AS dst, {intra_dist} AS distance,
           row_number() OVER (PARTITION BY a.nid
                              ORDER BY {intra_dist} {dirn}, b.nid ASC) rn
    FROM ({new_sql}) a JOIN ({new_sql}) b ON a.nid <> b.nid)
  WHERE rn <= {graph_degree}
) GROUP BY src, dst"""
    return cagra_optimize_sql(merged, graph_degree, select_min=close)


def cagra_merge(graphs: list[DataFrame], graph_degree: int = 16, *,
                strategy: str = "physical",
                select_min: bool = True) -> DataFrame:
    """Merge CAGRA indexes (``cagra.hpp:2477``; ``MergeStrategy``
    PHYSICAL/LOGICAL, ``common.hpp:129``).

    PHYSICAL: union the edge tables and re-optimize (what the reference
    does to the underlying graphs). LOGICAL merging happens at *search*
    time — union of per-index search results + top-k — which in Spark
    is ``knn_merge_parts`` and needs no operator here.
    ``select_min=False`` folds duplicate edges with max and keeps the
    largest distances (inner_product graphs)."""
    if strategy != "physical":
        raise ValueError("logical merge = search both + knn_merge_parts")
    best = F.min if select_min else F.max
    merged = graphs[0].select("src", "dst", "distance")
    for g in graphs[1:]:
        merged = merged.unionByName(g.select("src", "dst", "distance"))
    merged = (merged.groupBy("src", "dst")
              .agg(best("distance").alias("distance")))
    return cagra_optimize(merged, graph_degree, select_min=select_min)


# ---------------------------------------------------------------------------
# VPQ dataset compression (cagra.pyx:50-124 ``compression``;
# common.hpp:411 ``vpq_dataset``): the graph stays exact, the VECTORS
# the beam search scores against are PQ codes — at 100 TB the raw
# vectors dominate storage, so the searchable copy shrinks ~dim·4 /
# pq_dim bytes per row; ``refinement_rate`` re-ranks the shortlist
# against the raw table to recover exact-recall.
# ---------------------------------------------------------------------------

def cagra_compress(dataset: DataFrame, pq_dim: int = 8, pq_bits: int = 8,
                   *, kmeans_n_iters: int = 10, seed: int = 42,
                   id_col: str = "id", vec_col: str = "vec",
                   codebook=None) -> tuple[DataFrame, DataFrame]:
    """Compress the dataset to a VPQ codes table →
    ``(codes_df(id, codes), codebook_df(sub, code, centroid))``."""
    from cuvs_spark.preprocessing.pq import PQCodebook, pq_build, pq_transform
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                      F.col(vec_col).alias("vec"))
    if codebook is None:
        codebook = pq_build(d, pq_dim, pq_bits,
                            kmeans_n_iters=kmeans_n_iters, seed=seed)
    cb_df = (codebook.to_df(dataset.sparkSession)
             if isinstance(codebook, PQCodebook) else codebook)
    return pq_transform(d, cb_df), cb_df


def cagra_search_compressed(graph: DataFrame, codes: DataFrame,
                            codebook_df: DataFrame, queries: DataFrame,
                            k: int = 10, *, refinement_rate: float = 1.0,
                            dataset: DataFrame | None = None,
                            metric: str = "sqeuclidean",
                            qid_col: str = "qid", qvec_col: str = "vec",
                            **search_kw) -> DataFrame:
    """Beam search against DECODED vpq codes (``cagra.pyx:286``
    ``refinement_rate``): search the graph scoring approximate
    (decoded) distances for ``k·refinement_rate`` candidates, then
    exact re-rank against the raw ``dataset`` table. With
    ``refinement_rate=1`` the compressed scores rank directly."""
    import math

    from cuvs_spark.operators.pairwise import refine
    from cuvs_spark.preprocessing.pq import pq_inverse_transform
    decoded = pq_inverse_transform(codes, codebook_df)
    k0 = max(k, int(math.ceil(k * refinement_rate)))
    approx = cagra_search(graph, decoded, queries, k0, metric=metric,
                          qid_col=qid_col, qvec_col=qvec_col, **search_kw)
    if k0 == k:
        return approx
    if dataset is None:
        # no raw vectors to re-rank against: honor the requested k by
        # truncating the (already ranked 1..k0) approximate pool
        return approx.filter(F.col("rank") <= k)
    cand = approx.select("qid", F.col("nid").alias("id"))
    return refine(dataset, queries, cand, k, metric,
                  qid_col=qid_col, qvec_col=qvec_col)


# ---------------------------------------------------------------------------
# ACE: out-of-core partitioned CAGRA build (cagra.pyx:127-175 — ACE
# ``npartitions``, host/disk spill dirs, per-partition build + merge).
# Spark is out-of-core by construction, so what this surfaces is the
# LIFECYCLE: per-partition graphs are independent jobs whose edge
# tables land in a spill directory (restartable; each partition's
# working set is ~n/npartitions rows), then merge + re-optimize folds
# them into one graph.
# ---------------------------------------------------------------------------

def cagra_build_ace(dataset: DataFrame, graph_degree: int = 16, *,
                    npartitions: int = 4, spill_dir: str | None = None,
                    overlap_factor: int = 2, metric: str = "sqeuclidean",
                    id_col: str = "id", vec_col: str = "vec",
                    kmeans_n_iters: int = 4, seed: int = 42,
                    method: str = "expr",
                    centroids: np.ndarray | None = None,
                    builder_centroids: np.ndarray | None = None,
                    **builder_kw) -> DataFrame:
    """Partitioned CAGRA build: balanced k-means split into
    ``npartitions`` overlapping shards, per-shard graph build (spilled
    to ``spill_dir`` as parquet when given), physical merge +
    optimize. ``overlap_factor`` shards per row supplies the
    cross-partition edges the merge needs.

    ``centroids`` pins the PARTITIONER and ``builder_centroids`` the
    per-shard all_neighbors batching (the reference's Array-init
    analog, same hook as ``ivf_flat_build``): with both fixed, the
    whole composition is deterministic and SQL-expressible
    (:func:`cagra_ace_sql`)."""
    import os
    import tempfile

    from cuvs_spark.cluster.kmeans import kmeans_fit
    from cuvs_spark.operators.select_k import select_k as _sk
    from cuvs_spark.functions.distance import distance_sql_spark as _dss

    spark = dataset.sparkSession
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    if centroids is None:
        model = kmeans_fit(d, npartitions, max_iter=kmeans_n_iters,
                           seed=seed, balanced=True)
        centroids = model.centroids
    from cuvs_spark.cluster.kmeans import coarse_sorted_sql as _css
    cs = _css("vec", centroids)
    asg = (d.select(
        "id",
        F.explode(F.expr(
            f"slice({cs}, 1, {min(overlap_factor, npartitions)})"))
        .alias("_s"))
        .select("id", F.col("_s.l").cast("int").alias("part")))
    if builder_centroids is not None:
        builder_kw = {**builder_kw, "centroids": builder_centroids}
    spill = spill_dir or tempfile.mkdtemp(prefix="cagra_ace_")
    parts = []
    for p in range(npartitions):
        sub = (asg.filter(F.col("part") == p).join(d, "id")
               .select("id", "vec"))
        g = cagra_build(sub, graph_degree, metric=metric,
                        kmeans_n_iters=kmeans_n_iters, seed=seed,
                        method=method, **builder_kw)
        path = os.path.join(spill, f"part={p}")
        g.write.mode("overwrite").parquet(path)
        parts.append(spark.read.parquet(path))
    return cagra_merge(parts, graph_degree,
                       select_min=is_min_close(metric))


def cagra_ace_sql(dataset_sql: str, part_cent_sql: str, an_cent_sql: str,
                  graph_degree: int, *, npartitions: int,
                  overlap_factor: int = 2, an_overlap: int = 2,
                  metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for the FIXED-CENTROID :func:`cagra_build_ace`
    composition (``cagra.pyx`` ACE / partitioned spill build): the
    partition assignment (top-``overlap_factor`` partition centroids
    per row — :func:`select_k`'s window shape), one
    :func:`all_neighbors_sql` + :func:`cagra_optimize_sql` per shard
    (exactly ``cagra_build``'s default builder with the shard's rows
    and the shared fixed builder centroids), then the physical merge:
    union + per-edge min + optimize — :func:`cagra_merge`. Exactly
    mirrors ``cagra_build_ace(centroids=…, builder_centroids=…)``; the
    parquet spill round-trips longs/doubles losslessly so the spilled
    and in-plan shard graphs are identical.

    ``dataset_sql`` → ``(id, dv)``; ``part_cent_sql`` →
    ``(part, cv)``; ``an_cent_sql`` → ``(label, cv)``. Directional
    since r12: the partition assignment stays L2, the per-shard
    builds, the min/max-union merge and the optimize passes follow
    ``is_min_close(metric)`` like :func:`cagra_build_ace`."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    close = is_min_close(metric)
    pdist = distance_sql_duckdb("sqeuclidean", "d.dv", "c.cv")
    o = min(overlap_factor, npartitions)
    pasg = f"""
SELECT id, part FROM (
  SELECT d.id AS id, c.part AS part,
         row_number() OVER (PARTITION BY d.id
                            ORDER BY {pdist} ASC, c.part ASC) rn
  FROM ({dataset_sql}) d CROSS JOIN ({part_cent_sql}) c) WHERE rn <= {o}"""
    shard_graphs = []
    for p in range(npartitions):
        shard = f"""
SELECT dd.id AS id, dd.dv AS dv FROM ({dataset_sql}) dd
JOIN ({pasg}) pa ON pa.id = dd.id AND pa.part = {p}"""
        an = all_neighbors_sql(shard, an_cent_sql, 2 * graph_degree,
                               an_overlap, metric=metric)
        shard_graphs.append(cagra_optimize_sql(
            f"SELECT src, dst, distance FROM ({an})", graph_degree,
            select_min=close))
    union = "\nUNION ALL\n".join(
        f"SELECT src, dst, distance FROM ({g})" for g in shard_graphs)
    best = "min" if close else "max"
    merged = (f"SELECT src, dst, {best}(distance) AS distance FROM ({union}) "
              "GROUP BY src, dst")
    return cagra_optimize_sql(merged, graph_degree, select_min=close)


def degree_histogram(graph: DataFrame, *, nodes: DataFrame | None = None,
                     src_col: str = "src",
                     dst_col: str = "dst") -> DataFrame:
    """In-degree histogram of a kNN/CAGRA graph →
    ``(in_degree, n_nodes)`` — the graph-quality audit the reference's
    users run on CAGRA adjacency (out-degree is fixed by construction;
    IN-degree skew is what predicts search behavior: hub nodes absorb
    beam traffic, in-degree-0 nodes are unreachable by graph descent
    and only found via entry-point seeding). Degree 0 is reported
    (nodes present as a source — or in ``nodes`` when given — that
    never appear as a destination), so the unreachable count is the
    ``in_degree = 0`` row rather than a silent omission.

    Scale shape: one map-side-combined groupBy on dst, a broadcast-able
    anti-join for the zero-degree row set, and a second tiny groupBy on
    the degree value — per-node state never leaves the reducers."""
    node_ids = (nodes.select(F.col(nodes.columns[0]).alias("_n"))
                if nodes is not None
                else graph.select(F.col(src_col).alias("_n")).distinct())
    deg = (graph.groupBy(F.col(dst_col).alias("_n"))
           .agg(F.count("*").alias("_d")))
    per_node = (node_ids.join(deg, "_n", "left")
                .select(F.coalesce(F.col("_d"), F.lit(0)).alias("_d")))
    return (per_node.groupBy("_d")
            .agg(F.count("*").alias("n_nodes"))
            .select(F.col("_d").cast("long").alias("in_degree"),
                    F.col("n_nodes").cast("long").alias("n_nodes")))


def degree_histogram_sql(graph_sql: str) -> str:
    """DuckDB twin: ``graph_sql`` yields ``(src, dst)`` edges; node
    universe = distinct sources, as the Spark default."""
    return f"""
WITH g AS ({graph_sql}),
nodes AS (SELECT DISTINCT src AS _n FROM g),
deg AS (SELECT dst AS _n, count(*) AS _d FROM g GROUP BY dst),
per_node AS (
  SELECT COALESCE(d._d, 0) AS _d
  FROM nodes n LEFT JOIN deg d ON n._n = d._n
)
SELECT CAST(_d AS BIGINT) AS in_degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM per_node GROUP BY _d
"""

def reciprocal_rate(graph: DataFrame, *, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Reciprocal-edge rate of a directed kNN graph → one row
    ``(n_edges, n_reciprocal, reciprocal_rate)`` — the symmetry audit
    behind CAGRA's optimize step (graph.py's optimize adds REVERSE
    edges precisely because beam search needs a path back into
    low-in-degree regions; reference ``cagra/graph_core.cuh`` ranks
    candidate edges by reverse-edge presence). A rate near 1.0 means
    mutual-neighbor structure (easy descent); a low rate predicts
    hub-and-spoke graphs where :func:`degree_histogram` shows mass at
    in_degree 0.

    Engine parity: both counts are exact BIGINTs and the rate is ONE
    division of exact integers (correctly rounded, bit-equal across
    engines — the gate-design rule).

    Scale shape: a single self-equi-join on the (dst, src) key pair —
    shuffle-partitioned both sides, no broadcast assumption (the edge
    table is n·k rows); counts are map-side-combined."""
    e = graph.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    # distinct reverse side -> the left join matches each edge at most
    # once (= the semi-join), and BOTH counts come from ONE scalar agg,
    # so the (possibly expensive) edge lineage evaluates exactly once
    rev = (e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
           .distinct().withColumn("_f", F.lit(1)))
    agg = (e.join(rev, ["src", "dst"], "left")
           .agg(F.count("*").alias("n"),
                F.sum(F.coalesce(F.col("_f"), F.lit(0))).alias("r"))
           .collect()[0])
    n_edges, n_recip = int(agg["n"]), int(agg["r"] or 0)
    rate = float(n_recip) / float(n_edges) if n_edges else 0.0
    spark = graph.sparkSession
    return spark.createDataFrame(
        [(n_edges, n_recip, rate)],
        "n_edges bigint, n_reciprocal bigint, reciprocal_rate double")


def reciprocal_rate_sql(graph_sql: str) -> str:
    """DuckDB twin of :func:`reciprocal_rate` — same integer counts,
    same single exact-integer division."""
    return f"""
WITH _g AS ({graph_sql}),
_e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
       FROM _g),
_r AS (
  SELECT count(*) AS n_recip
  FROM _e WHERE EXISTS (
    SELECT 1 FROM _e rev WHERE rev.dst = _e.src AND rev.src = _e.dst)
),
_n AS (SELECT count(*) AS n_edges FROM _e)
SELECT CAST(_n.n_edges AS BIGINT) AS n_edges,
       CAST(_r.n_recip AS BIGINT) AS n_reciprocal,
       CASE WHEN _n.n_edges = 0 THEN 0.0
            ELSE CAST(_r.n_recip AS DOUBLE) / CAST(_n.n_edges AS DOUBLE)
       END AS reciprocal_rate
FROM _n, _r
"""

def triangle_stats(graph: DataFrame, *, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Triangle census of the MUTUAL kNN graph → one row ``(n_nodes,
    n_mutual_edges, n_wedges, n_triangles, clustering_coeff)`` — the
    local-neighborhood-consistency audit: a high global clustering
    coefficient (3·triangles / wedges) means neighbors-of-neighbors
    are neighbors, the regime where greedy graph descent (CAGRA/HNSW)
    converges in few hops; a low one means the graph is tree-like and
    beam search needs wider beams. Complements
    :func:`reciprocal_rate` (edge-level symmetry) with the
    second-order structure.

    Mutualization keeps only edges present in BOTH directions (the
    undirected core CAGRA's optimize preserves), stored once as
    ``a < b``. Wedges = Σ d(d−1)/2 over mutual degrees — exact
    BIGINTs (d(d−1) is even); triangles count each closed triple once
    via the sorted x<y<z join; the coefficient is ONE division of
    exact integers (0.0 when wedge-free).

    Scale shape: joins are node-key equi-joins whose fanout is
    bounded by the mutual degree (≤ k for a kNN graph, so the wedge
    join is ≤ k² rows per node, never n²); the triangle-closing check
    is a semi-join against the edge table."""
    # e feeds the mutualization twice (both join sides) plus the node
    # count; und feeds five consumers — persist both across the actions
    e = graph.select(F.col(src_col).cast("long").alias("s"),
                     F.col(dst_col).cast("long").alias("d")).persist()
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    und = (e.join(rev, ["s", "d"], "left_semi")
           .filter(F.col("s") < F.col("d"))
           .select(F.col("s").alias("a"), F.col("d").alias("b"))
           .persist())
    try:
        deg = (und.select(F.col("a").alias("_n"))
               .unionAll(und.select(F.col("b").alias("_n")))
               .groupBy("_n").agg(F.count("*").alias("_d")))
        nodes = e.select(F.col("s").alias("_n")).distinct()
        wedges = deg.agg(
            F.sum(F.expr("_d * (_d - 1) DIV 2")).cast("long").alias("w"))
        e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
        tri = (e1.join(e2, "y")
               .join(und.select(F.col("a").alias("x"),
                                F.col("b").alias("z")), ["x", "z"],
                     "left_semi"))
        n_nodes = nodes.count()
        n_edges = und.count()
        n_wedges = int(wedges.collect()[0]["w"] or 0)
        n_tri = tri.count()
    finally:
        und.unpersist()
        e.unpersist()
    cc = 3.0 * float(n_tri) / float(n_wedges) if n_wedges else 0.0
    spark = graph.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_wedges, n_tri, cc)],
        "n_nodes bigint, n_mutual_edges bigint, n_wedges bigint, "
        "n_triangles bigint, clustering_coeff double")


def triangle_stats_sql(graph_sql: str) -> str:
    """DuckDB twin of :func:`triangle_stats` — same mutualization,
    sorted-triple join, and single exact division."""
    return f"""
WITH _g AS ({graph_sql}),
_e AS (SELECT CAST(src AS BIGINT) AS s, CAST(dst AS BIGINT) AS d
       FROM _g),
_und AS (
  SELECT _e.s AS a, _e.d AS b FROM _e
  WHERE _e.s < _e.d AND EXISTS (
    SELECT 1 FROM _e r WHERE r.s = _e.d AND r.d = _e.s)
),
_deg AS (
  SELECT _n, count(*) AS _d FROM (
    SELECT a AS _n FROM _und UNION ALL SELECT b AS _n FROM _und)
  GROUP BY _n
),
_w AS (SELECT CAST(COALESCE(sum(_d * (_d - 1) // 2), 0) AS BIGINT) AS w
       FROM _deg),
_tri AS (
  SELECT count(*) AS t
  FROM _und e1 JOIN _und e2 ON e1.b = e2.a
  WHERE EXISTS (SELECT 1 FROM _und e3
                WHERE e3.a = e1.a AND e3.b = e2.b)
),
_n AS (SELECT count(DISTINCT s) AS n_nodes FROM _e),
_m AS (SELECT count(*) AS n_edges FROM _und)
SELECT CAST(_n.n_nodes AS BIGINT) AS n_nodes,
       CAST(_m.n_edges AS BIGINT) AS n_mutual_edges,
       _w.w AS n_wedges, CAST(_tri.t AS BIGINT) AS n_triangles,
       CASE WHEN _w.w = 0 THEN 0.0
            ELSE 3.0 * CAST(_tri.t AS DOUBLE) / CAST(_w.w AS DOUBLE)
       END AS clustering_coeff
FROM _n, _m, _w, _tri
"""
