"""Agglomerative single-linkage clustering (SURVEY.md §2.6).

Reference: ``cpp/include/cuvs/cluster/agglomerative.hpp:107``
(``single_linkage``: kNN graph → MST → dendrogram → cut to labels;
``Linkage`` PAIRWISE/KNN_GRAPH at ``agglomerative.hpp:33``;
``build_dendrogram`` at ``:251``).

Spark design: the expensive part — the kNN connectivity graph — is the
distributed ``knn_self``/``all_neighbors`` job. MST extraction runs
Borůvka-style: each round the *distributed* edge table yields one
minimum outgoing edge per component (a groupBy-min over n·k rows);
the per-round component merge is a driver-side union-find over at most
#components rows (the reference's dendrogram step is likewise a serial
finish on contracted data — SURVEY §2.6). KNN_GRAPH linkage means the
graph may be disconnected; remaining components simply stay separate
clusters, matching the reference's connectivity fallback semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.operators.brute_force import knn_self


@dataclass
class Dendrogram:
    children: np.ndarray       # (n_merges, 2) merged component ids
    distances: np.ndarray      # (n_merges,) merge heights
    n_leaves: int


class _UnionFind:
    """Lazy union-find: driver memory is the set of ids it has actually
    seen (per-round merge roots, not all n rows)."""

    def __init__(self, ids=()):
        self.parent = {i: i for i in ids}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra
        return True


def _mst_edges(edges: DataFrame, ids: list[int], *,
               finish_components: int = 1024) -> list[tuple]:
    """Distributed Borůvka with a serial finish. Per round the CLUSTER
    produces one minimum outgoing edge per component (a groupBy-min
    over the edge table — already a k× contraction vs collecting n·k
    edges), and the component map stays a distributed DataFrame: the
    driver sees only that round's min edges and ships back the
    (old_root → new_root) delta, so driver state per round is
    O(#merges), not O(n). Lineage is truncated with localCheckpoint
    each round (Borůvka halves the component count per round →
    ≤ log₂(n) rounds).

    Once ≤ ``finish_components`` components remain, the contracted
    graph — the per-(comp,comp) MINIMUM edge, ≤ finish_components²
    rows by construction — is collected and Kruskal finishes on the
    driver, exactly as the reference serializes the dendrogram tail on
    contracted data (``agglomerative.hpp:251``). This removes the
    long tail of near-empty Spark rounds (each round is a fixed-cost
    job; the last log₂(finish_components) rounds would merge a
    shrinking handful of components each) while keeping driver memory
    bounded by the contracted edge count, not n·k."""
    spark = edges.sparkSession
    uf = _UnionFind()
    # Materialize the kNN graph ONCE: without this every Borůvka round
    # re-runs the upstream kNN job (the expensive part) through the
    # uncached lineage — ≤log₂(n) rounds × full graph build.
    edges = edges.localCheckpoint()
    vertices = (edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id"))))
    if ids:
        # vertices with no edges must still be tracked as singleton
        # components (KNN_GRAPH linkage can leave them edge-less)
        vertices = vertices.unionByName(
            spark.createDataFrame([(int(i),) for i in ids], "id long"))
    comp = (vertices.distinct().withColumn("comp", F.col("id"))
            .localCheckpoint())
    ncomp = comp.count()
    mst: list[tuple] = []
    while True:
        e = (edges
             .join(comp.withColumnRenamed("id", "src")
                   .withColumnRenamed("comp", "ca"), "src")
             .join(comp.withColumnRenamed("id", "dst")
                   .withColumnRenamed("comp", "cb"), "dst")
             .filter(F.col("ca") != F.col("cb")))
        if ncomp <= finish_components:
            # serial finish: per-(ca,cb) minimum edge (cycle property —
            # only the pair minimum can be in the MST), then Kruskal in
            # (distance, src, dst) order — the same deterministic order
            # the per-round min-struct uses.
            contracted = (e.select("ca", "cb",
                                   F.struct("distance", "src", "dst")
                                   .alias("_s"))
                          .groupBy("ca", "cb").agg(F.min("_s").alias("m"))
                          .collect())
            fin = sorted(((r["m"]["distance"], r["m"]["src"], r["m"]["dst"],
                           int(r["ca"]), int(r["cb"])) for r in contracted))
            for dist, src, dst, ca, cb in fin:
                if uf.union(ca, cb):
                    mst.append((int(src), int(dst), float(dist)))
            break
        mins = (e.select("ca", F.struct("distance", "src", "dst", "cb")
                         .alias("_s"))
                .groupBy("ca").agg(F.min("_s").alias("m"))
                .collect())
        if not mins:
            break
        merged_any = False
        # deterministic order: by (distance, src, dst)
        for r in sorted(mins, key=lambda r: (r["m"]["distance"],
                                             r["m"]["src"], r["m"]["dst"])):
            m = r["m"]
            if uf.union(int(r["ca"]), int(m["cb"])):
                mst.append((int(m["src"]), int(m["dst"]),
                            float(m["distance"])))
                merged_any = True
                ncomp -= 1
        if not merged_any:
            break
        # ship only the changed roots back to the cluster
        delta = [(old, uf.find(old)) for old in
                 {v for r in mins for v in (int(r["ca"]), int(r["m"]["cb"]))}]
        delta = [(o, n) for o, n in delta if o != n]
        ddf = spark.createDataFrame(delta, "old long, new long")
        comp = (comp.join(F.broadcast(ddf),
                          comp["comp"] == ddf["old"], "left")
                .select("id", F.coalesce("new", "comp").alias("comp"))
                .localCheckpoint())
    return mst


def build_dendrogram(edges: DataFrame, ids: list[int]) -> Dendrogram:
    """``agglomerative.hpp:251`` — merge list sorted by height."""
    mst = sorted(_mst_edges(edges, ids), key=lambda t: (t[2], t[0], t[1]))
    children = np.array([(a, b) for a, b, _ in mst], dtype=np.int64) \
        if mst else np.zeros((0, 2), np.int64)
    distances = np.array([d for _, _, d in mst])
    return Dendrogram(children=children, distances=distances,
                      n_leaves=len(ids))


def single_linkage_sql(d_sql: str, q_sql: str, n_clusters: int, k: int, *,
                       n_rows: int, metric: str = "sqeuclidean") -> str:
    """DuckDB oracle for :func:`single_linkage` labels at gate scale —
    the conversion of the dendrogram family from rows-only to
    value-hash-exact (``agglomerative.hpp:107,251``).

    Why this is exact: whenever ``n_rows <= finish_components`` (every
    gate-scale call), :func:`_mst_edges` takes the serial-finish path
    on the FIRST round, where the contracted per-(comp, comp) minimum
    over singleton components is simply the full directed kNN edge
    table — so the whole operator degenerates to Kruskal over the
    edges in ``(distance, src, dst)`` ascending order, followed by a
    cut that replays the same accepted-edge sequence until
    ``n_clusters`` components remain. That single sequential process
    is reproduced here as one recursive CTE: the union-find is a flat
    root-label list carried in the recursion's single state row
    (union relabels every occurrence, so lookups are O(1) and roots
    are always the component's minimum id — exactly
    ``_UnionFind.union``'s smaller-root rule, which also makes the
    final root THE ``min-member-id`` label the operator emits).

    Requires contiguous ids ``0..n_rows-1`` (the list index IS the
    id); ``d_sql``/``q_sql`` → ``(nid, dv)`` / ``(qid, qv)`` over the
    same rows. The kNN stage reuses the driver-proven
    ``knn_sql(pair_where=qid<>nid)`` ↔ ``knn_self`` template pair."""
    from cuvs_spark.plans.oracle import knn_sql
    knn = knn_sql(d_sql, q_sql, k, metric, pair_where="q.qid <> d.nid")
    ra = "kr.lab[CAST(e.src AS BIGINT) + 1]"
    rb = "kr.lab[CAST(e.dst AS BIGINT) + 1]"
    return f"""
WITH RECURSIVE g AS MATERIALIZED ({knn}),
edges AS MATERIALIZED (
  SELECT qid AS src, nid AS dst, distance,
         row_number() OVER (ORDER BY distance ASC, qid ASC, nid ASC) AS i
  FROM g),
kr AS (
  SELECT CAST(0 AS BIGINT) AS i,
         (SELECT list(CAST(v AS BIGINT) ORDER BY v)
          FROM range({n_rows}) t(v)) AS lab,
         CAST({n_rows} AS BIGINT) AS comps
  UNION ALL
  SELECT e.i,
         CASE WHEN {ra} <> {rb}
              THEN list_transform(kr.lab,
                     v -> CASE WHEN v = greatest({ra}, {rb})
                               THEN least({ra}, {rb}) ELSE v END)
              ELSE kr.lab END,
         CASE WHEN {ra} <> {rb} THEN kr.comps - 1 ELSE kr.comps END
  FROM kr JOIN edges e
    ON e.i = kr.i + 1 AND kr.comps > {n_clusters}
)
SELECT CAST(t.v AS BIGINT) AS id, f.lab[CAST(t.v AS BIGINT) + 1] AS label
FROM range({n_rows}) t(v),
     (SELECT lab FROM kr ORDER BY i DESC LIMIT 1) f
"""


def mutual_reachability_graph(dataset: DataFrame, k: int = 5, *,
                              metric: str = "sqeuclidean",
                              id_col: str = "id",
                              vec_col: str = "vec") -> DataFrame:
    """HDBSCAN mutual-reachability kNN graph
    (``agglomerative.hpp:133,191`` — ``mutual_reachability_graph`` /
    the HDBSCAN linkage variant): edge weight
    ``mr(a,b) = max(core_k(a), core_k(b), d(a,b))`` where ``core_k`` is
    the distance to the k-th nearest neighbor.

    → ``(src, dst, mr_dist)`` over the directed kNN graph. One kNN job
    produces both the edges and the core distances (``rank == k`` rows);
    the two core joins broadcast an n-row, 2-column table — no extra
    distance pass. Oracle-exact: ``greatest`` over bit-equal doubles.
    """
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    g = knn_self(d, k, metric)
    core = (g.filter(F.col("rank") == k)
            .select(F.col("qid").alias("id"),
                    F.col("distance").alias("core")))
    return (g.join(core.withColumnRenamed("id", "qid")
                   .withColumnRenamed("core", "ca"), "qid")
            .join(core.withColumnRenamed("id", "nid")
                  .withColumnRenamed("core", "cb"), "nid")
            .select(F.col("qid").alias("src"), F.col("nid").alias("dst"),
                    F.greatest("distance", "ca", "cb").alias("mr_dist")))


def single_linkage(dataset: DataFrame, n_clusters: int = 5, *, k: int = 15,
                   metric: str = "sqeuclidean", id_col: str = "id",
                   vec_col: str = "vec", linkage: str = "knn_graph",
                   mutual_reachability_k: int | None = None,
                   finish_components: int = 1024,
                   max_driver_rows: int = 5_000_000) -> DataFrame:
    """single_linkage (``agglomerative.hpp:107``) → ``(id, label)``;
    labels are the minimum member id of each cluster (deterministic).

    ``linkage='pairwise'`` uses the full pairwise graph (exact, m²);
    ``'knn_graph'`` bounds the graph to n·k edges as the reference does
    for scale. ``mutual_reachability_k`` switches edge weights to the
    HDBSCAN mutual-reachability distance
    max(core_k(a), core_k(b), d(a,b)) (``agglomerative.hpp:133,191``) —
    core distances come from the same kNN job.

    **Driver-side bound: O(n) in the number of DATASET ROWS.** The MST
    cut, union-find, and final labeling hold all n ids on the driver
    (the reference's dendrogram step is likewise a serial finish after
    the distributed kNN + Borůvka contraction — SURVEY §2.6): a full
    dendrogram is inherently a serial object of n−1 merges, so the
    driver cost is the algorithm, not an accident. ``max_driver_rows``
    (default 5M ids ≈ a few hundred MB with the MST edge list) raises
    a clear error instead of an opaque driver OOM; clustering more
    rows than that wants the distributed label-propagation family
    (``dedup.connected_components``) or a coarse k-means pre-partition
    rather than an exact dendrogram."""
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    n_rows = d.count()
    if n_rows > max_driver_rows:
        raise ValueError(
            f"single_linkage holds all ids driver-side (exact dendrogram "
            f"finish): dataset has {n_rows} rows > max_driver_rows="
            f"{max_driver_rows}. Raise the bound only with driver memory "
            f"to match, or use a distributed clustering family instead.")
    ids = [r["id"] for r in d.select("id").collect()]
    kk = len(ids) - 1 if linkage == "pairwise" else k
    g = knn_self(d, kk, metric).select(
        F.col("qid").alias("src"), F.col("nid").alias("dst"), "distance",
        "rank")
    if mutual_reachability_k:
        core = (g.filter(F.col("rank") == mutual_reachability_k)
                .select(F.col("src").alias("id"),
                        F.col("distance").alias("core")))
        g = (g.join(core.withColumnRenamed("id", "src")
                    .withColumnRenamed("core", "ca"), "src")
             .join(core.withColumnRenamed("id", "dst")
                   .withColumnRenamed("core", "cb"), "dst")
             .select("src", "dst",
                     F.greatest("distance", "ca", "cb").alias("distance")))
    g = g.select("src", "dst", "distance")
    mst = sorted(_mst_edges(g, ids, finish_components=finish_components),
                 key=lambda t: (t[2], t[0], t[1]))
    # cut: keep merging smallest edges until n_clusters remain
    uf = _UnionFind(ids)
    comps = len(ids)
    for a, b, _ in mst:
        if comps <= n_clusters:
            break
        if uf.union(a, b):
            comps -= 1
    # label = min id in component
    root_min: dict[int, int] = {}
    for i in ids:
        r = uf.find(i)
        root_min[r] = min(root_min.get(r, i), i)
    rows = [(i, root_min[uf.find(i)]) for i in ids]
    spark = dataset.sparkSession
    return spark.createDataFrame(rows, "id long, label long")
