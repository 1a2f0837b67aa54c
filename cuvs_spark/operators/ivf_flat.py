"""IVF-Flat: inverted-file index via coarse k-means partitioning.

Reference: ``python/cuvs/cuvs/neighbors/ivf_flat/ivf_flat.pyx``
(build :41-115 — ``n_lists=1024``, ``kmeans_n_iters=20``,
``kmeans_trainset_fraction=0.5``, ``add_data_on_build``,
``adaptive_centers``; search :265-295 — ``n_probes``; extend :467);
impl ``cpp/src/neighbors/ivf_flat/ivf_flat_build.cuh`` (kmeans predict
:222), ``ivf_flat_search.cuh:41``.

Spark design (SURVEY.md §2.5): the index IS a partitioning.

* **build** — balanced k-means over a seeded trainset fraction gives
  ``n_lists`` centroids; the assignment table ``(id, list_id, vec)`` is
  the inverted file. Persisted ``partitionBy(list_id)`` so searches
  prune at the *file listing* level.
* **search** — coarse stage: queries × broadcast centroids → top
  ``n_probes`` lists per query (tiny). Fine stage: the probe set is
  broadcast against the assignment table, so only rows whose
  ``list_id`` is probed are scanned — Spark's dynamic partition
  pruning / broadcast-hash-join does exactly what the reference's
  ``select_clusters`` + per-list scan does, and the dataset side never
  shuffles. At 1000 executors the scan reads
  ``n_probes / n_lists`` of the data — same asymptotic win as the GPU.
* **extend** — append + assign to nearest existing center
  (``ivf_flat.pyx:467``): a union plus one broadcast join.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cuvs_spark.cluster.kmeans import (KMeansModel, assign,
                                       coarse_sorted_sql, kmeans_fit)
from cuvs_spark.functions.distance import distance_sql_spark, is_min_close
from cuvs_spark.operators.select_k import select_k


@dataclass
class IVFFlatIndex:
    centroids: np.ndarray            # (n_lists, dim) float64
    lists: DataFrame                 # (id, list_id, vec) — the inverted file
    metric: str = "sqeuclidean"

    @property
    def n_lists(self) -> int:
        return len(self.centroids)


def ivf_flat_build(dataset: DataFrame, n_lists: int = 64, *,
                   metric: str = "sqeuclidean", kmeans_n_iters: int = 20,
                   trainset_fraction: float = 0.5, seed: int = 42,
                   id_col: str = "id", vec_col: str = "vec",
                   centroids: np.ndarray | None = None,
                   add_data_on_build: bool = True) -> IVFFlatIndex:
    """Train the coarse quantizer and materialize the inverted file.

    ``centroids`` short-circuits training (the reference's Array init) —
    used by the deterministic oracle path and by ``extend``.
    """
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    fixed = centroids is not None
    if centroids is None:
        train = d.sample(fraction=min(1.0, trainset_fraction), seed=seed)
        model = kmeans_fit(train, n_lists, max_iter=kmeans_n_iters,
                           seed=seed, metric=metric, balanced=True)
        centroids = model.centroids
    lists = None
    if add_data_on_build:
        if fixed:
            # oracle-exact expr path (gate queries pin the centroids).
            # r14: label via the map-only literal-fold argmin — the old
            # assign + join-back (BroadcastNestedLoopJoin + exchange +
            # 2 SortAggregates + a second join) is now one Project.
            cs = coarse_sorted_sql("vec", centroids)
            lists = d.select(
                "id", F.expr(f"element_at({cs}, 1).l").alias("list_id"),
                "vec")
        else:
            # trained path: one map-only pass emits (id, list_id, vec) —
            # GEMM argmin AND the vector carry, no label re-join shuffle
            lists = _assign_with_vec(d, np.asarray(centroids, float))
    return IVFFlatIndex(centroids=np.asarray(centroids, float), lists=lists,
                        metric=metric)


def _assign_with_vec(d: DataFrame, C: np.ndarray) -> DataFrame:
    import pandas as pd

    spark = d.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def argmin(batches):
        C = bc.value
        cn = (C * C).sum(1)[None, :]
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            lab = (cn - 2.0 * (X @ C.T)).argmin(1)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                "list_id": lab.astype(np.int32),
                                "vec": pdf["vec"].to_numpy()})

    return d.mapInPandas(argmin,
                         schema="id long, list_id int, vec array<float>")


def ivf_flat_search(index: IVFFlatIndex, queries: DataFrame, k: int = 10,
                    n_probes: int = 8, *, qid_col: str = "qid",
                    qvec_col: str = "vec", metric: str | None = None,
                    method: str = "expr",
                    prefilter: Column | None = None) -> DataFrame:
    """Partition-pruned ANN search → ``(qid, nid, distance, rank)``.

    ``method="expr"`` scores the probed rows with the JVM distance
    expression (oracle-exact). ``method="blas"`` runs the fine stage as
    a *cogroup* on list_id — each list's vectors meet exactly the
    queries probing it in one Arrow batch, scored by a NumPy GEMM tile
    and reduced to a local top-k before the merge. At the 200k-row
    probe this is ~10× faster per scanned pair; it is the 100 TB fine
    stage (``ivfflat_interleaved_scan`` analog). ``method="broadcast"``
    goes further when the inverted file dwarfs the query batch: probing
    queries are broadcast and each lists partition scores in place —
    the dataset never shuffles (2.6× the cogroup at the 200k probe)."""
    metric = metric or index.metric
    spark = queries.sparkSession
    # bitset-filter analog (filters.pyx works across index types): a
    # boolean Column over the inverted file (id / list_id / vec),
    # applied BEFORE any distance math, shared by all three methods —
    # Catalyst pushes id-predicates into the (partition-pruned) scan
    lists = index.lists if prefilter is None else index.lists.filter(prefilter)
    from cuvs_spark.plans.layout import spread_narrow
    # r14: the coarse literal fold is per-QUERY heavy compute — spread a
    # narrow query batch over the cores (no-op when already split)
    q = spread_narrow(
        queries.select(F.col(qid_col).cast("long").alias("qid"),
                       F.col(qvec_col).alias("_qv")), "qid")
    # coarse: top-n_probes lists per query (always by the *coarse* metric
    # of the quantizer — sqeuclidean — matching ivf_flat_search.cuh).
    # r14: map-only literal slice of the best-first sorted centroid fold
    # — same rows and tie order as the old broadcast-join + window
    # (array_sort on (d, l) structs == ORDER BY _cd, list_id), with the
    # BroadcastNestedLoopJoin, Sort and window Exchange all gone.
    cs = coarse_sorted_sql("_qv", index.centroids)
    # r15: the query vector rides along through the probe explode (the
    # probe set is a pure function of q, so re-joining q on qid only
    # re-attached a column this projection already holds) — the
    # probes ⋈ q join and its exchange/broadcast disappear from every
    # fine stage; rows and values are identical by construction.
    probes = (q.select(
        "qid", "_qv",
        F.explode(F.expr(f"slice({cs}, 1, {n_probes})")).alias("_s"))
        .select("qid", F.col("_s.l").alias("list_id"), "_qv"))
    if method == "blas":
        return _fine_blas(lists, q, probes, k, metric)
    if method == "broadcast":
        return _fine_broadcast(lists, q, probes, k, metric)
    # fine: broadcast the (qid, list_id, qv) probe set against the
    # inverted file — only probed lists are scanned, dataset side never
    # shuffles.
    fine = lists.join(F.broadcast(probes), "list_id")
    fdist = F.expr(distance_sql_spark(metric, "_qv", "vec"))
    pairs = fine.select("qid", F.col("id").alias("nid"),
                        fdist.alias("distance"))
    return select_k(pairs, "qid", "distance", k,
                    select_min=is_min_close(metric), tie_cols=["nid"])


def _fine_blas(lists: DataFrame, q: DataFrame, probes: DataFrame,
               k: int, metric: str, *, dedupe: bool = False) -> DataFrame:
    """Cogrouped fine stage: per list_id, (list vectors) × (probing
    queries) → GEMM tile → local top-k; global knn_merge_parts.
    ``lists`` is any ``(list_id, id, vec)`` relation; ``dedupe=True``
    collapses a vector probed through several lists (ScaNN's spilled
    assignment) to its single exact distance before the merge."""
    import pandas as pd

    from cuvs_spark.operators.brute_force import _pairwise_np
    from cuvs_spark.operators.select_k import knn_merge_parts

    minimize = is_min_close(metric)
    # r15: probes that already carry the query vector skip the join-back
    probing_q = (probes.select("list_id", "qid", "_qv")
                 if "_qv" in probes.columns
                 else probes.join(q, "qid").select("list_id", "qid", "_qv"))

    def score(key, rows: pd.DataFrame, queries_pdf: pd.DataFrame):
        if rows.empty or queries_pdf.empty:
            return pd.DataFrame(columns=["qid", "nid", "distance"])
        import numpy as np
        X = np.vstack(rows["vec"].to_numpy()).astype(np.float64)
        ids = rows["id"].to_numpy().astype(np.int64)
        Q = np.vstack(queries_pdf["_qv"].to_numpy()).astype(np.float64)
        qids = queries_pdf["qid"].to_numpy().astype(np.int64)
        D = _pairwise_np(Q, X, metric)
        kk = min(k, D.shape[1])
        part = (np.argpartition(D if minimize else -D, kk - 1, axis=1)
                [:, :kk])
        return pd.DataFrame({
            "qid": np.repeat(qids, kk),
            "nid": np.take_along_axis(
                np.broadcast_to(ids, D.shape), part, axis=1).ravel(),
            "distance": np.take_along_axis(D, part, axis=1).ravel()})

    local = (lists.groupBy("list_id")
             .cogroup(probing_q.groupBy("list_id"))
             .applyInPandas(score, schema="qid long, nid long, distance double"))
    if dedupe:
        local = (local.groupBy("qid", "nid")
                 .agg(F.min("distance").alias("distance")))
    return knn_merge_parts(local, k, select_min=minimize)


def _fine_broadcast(lists: DataFrame, q: DataFrame, probes: DataFrame,
                    k: int, metric: str) -> DataFrame:
    """Broadcast-queries fine stage: the inverted file NEVER shuffles.
    The probing (qid, vector) sets are grouped per list, collected
    (small-side-by-contract, like the brute-force query matrix) and
    broadcast; each *lists partition* GEMM-scores its own lists in
    place and emits a local top-k — the only exchange is the
    ``n_parts × q × k`` merge. Prefer over the cogroup when the
    inverted file dwarfs the query batch."""
    import pandas as pd

    from cuvs_spark.operators.brute_force import _pairwise_np
    from cuvs_spark.operators.select_k import knn_merge_parts

    minimize = is_min_close(metric)
    spark = q.sparkSession
    qp = (probes if "_qv" in probes.columns
          else probes.join(q, "qid"))
    qp_rows = (qp.groupBy("list_id")
               .agg(F.collect_list(F.struct("qid", "_qv")).alias("qs"))
               .collect())
    by_list = {}
    for r in qp_rows:
        import numpy as np
        qids = np.array([x["qid"] for x in r["qs"]], dtype=np.int64)
        Q = np.array([x["_qv"] for x in r["qs"]], dtype=np.float64)
        by_list[int(r["list_id"])] = (qids, Q)
    bc = spark.sparkContext.broadcast(by_list)

    def score_parts(batches):
        import numpy as np
        for pdf in batches:
            outs = []
            for lid, rows in pdf.groupby("list_id"):
                hit = bc.value.get(int(lid))
                if hit is None:
                    continue
                qids, Q = hit
                X = np.vstack(rows["vec"].to_numpy()).astype(np.float64)
                ids = rows["id"].to_numpy().astype(np.int64)
                D = _pairwise_np(Q, X, metric)
                kk = min(k, D.shape[1])
                part = (np.argpartition(D if minimize else -D, kk - 1,
                                        axis=1)[:, :kk])
                outs.append(pd.DataFrame({
                    "qid": np.repeat(qids, kk),
                    "nid": np.take_along_axis(
                        np.broadcast_to(ids, D.shape), part, axis=1).ravel(),
                    "distance": np.take_along_axis(D, part, axis=1).ravel()}))
            if outs:
                yield pd.concat(outs)

    local = lists.select("list_id", "id", "vec").mapInPandas(
        score_parts, "qid long, nid long, distance double")
    return knn_merge_parts(local, k, select_min=minimize)


def ivf_flat_extend(index: IVFFlatIndex, new_rows: DataFrame, *,
                    id_col: str = "id", vec_col: str = "vec",
                    adaptive_centers: bool = False) -> IVFFlatIndex:
    """``extend(new_vectors, new_indices)`` (ivf_flat.pyx:467): assign
    new rows to their nearest existing center and append.

    ``adaptive_centers=True`` (ivf_flat.pyx:78-88) drifts each center to
    the mean of its (now larger) list — one posexplode aggregation over
    the updated inverted file, k×dim rows to the driver."""
    d = new_rows.select(F.col(id_col).cast("long").alias("id"),
                        F.col(vec_col).alias("vec"))
    cs = coarse_sorted_sql("vec", index.centroids)
    add = d.select("id", F.expr(f"element_at({cs}, 1).l").alias("list_id"),
                   "vec")
    lists = index.lists.unionByName(add)
    centroids = index.centroids
    if adaptive_centers:
        rows = (lists.select("list_id", F.posexplode("vec").alias("dim", "x"))
                .groupBy("list_id", "dim")
                .agg(F.avg(F.col("x").cast("double")).alias("m"))
                .collect())
        centroids = np.array(index.centroids, copy=True)
        for r in rows:
            centroids[r["list_id"], r["dim"]] = r["m"]
    return IVFFlatIndex(centroids=centroids, lists=lists,
                        metric=index.metric)

def ivf_list_sizes(index: IVFFlatIndex) -> DataFrame:
    """Per-list occupancy of the inverted file → ``(list_id,
    list_size)`` for every list INCLUDING empties — the direct analog
    of the reference index's per-list size array
    (``ivf_flat::index::list_sizes``, exposed on every IVF variant),
    and the balance audit behind probe-latency tails: a 10× oversized
    hot list makes every query that probes it 10× slower, which is why
    the reference trains with ``balanced`` k-means and why
    ``n_probes`` tuning starts from this table.

    Engine parity: pure BIGINT counts (empty lists via a
    range-generated left join, 0 not NULL).

    Scale shape: one map-side-combined groupBy on list_id over the
    inverted file; the n_lists-row frame joins broadcast."""
    spark = index.lists.sparkSession
    occ = (index.lists.groupBy(F.col("list_id").cast("long")
                               .alias("list_id"))
           .agg(F.count("*").alias("_n")))
    all_lists = spark.range(index.n_lists).select(
        F.col("id").alias("list_id"))
    return (all_lists.join(occ, "list_id", "left")
            .select("list_id",
                    F.coalesce(F.col("_n"), F.lit(0)).cast("long")
                    .alias("list_size")))


def ivf_list_sizes_sql(dataset_sql: str, cent_sql: str) -> str:
    """DuckDB twin of :func:`ivf_list_sizes` for the fixed-centroid
    build: assignment via the shared argmin template
    (``plans/oracle.assign_sql``), then the same zero-including
    rollup."""
    from cuvs_spark.plans.oracle import assign_sql
    return f"""
WITH asg AS ({assign_sql(dataset_sql, cent_sql).strip()}),
occ AS (SELECT label AS list_id, count(*) AS _n FROM asg GROUP BY label),
alll AS (SELECT DISTINCT CAST(label AS BIGINT) AS list_id
         FROM ({cent_sql}))
SELECT alll.list_id,
       CAST(COALESCE(occ._n, 0) AS BIGINT) AS list_size
FROM alll LEFT JOIN occ ON alll.list_id = occ.list_id
"""
