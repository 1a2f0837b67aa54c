"""Single-linkage vs scipy-style oracle on small fixtures + CAGRA merge
and HNSW export sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.cluster.agglomerative import build_dendrogram, single_linkage
from cuvs_spark.operators.brute_force import knn_self
from cuvs_spark.operators.graph import cagra_merge, cagra_optimize


def _np_single_linkage_labels(X, n_clusters):
    """Kruskal MST + cut — the textbook oracle."""
    n = len(X)
    D = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    edges = sorted((D[i, j], i, j) for i in range(n) for j in range(i + 1, n))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    comps = n
    for d, i, j in edges:
        if comps <= n_clusters:
            break
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
            comps -= 1
    roots = {}
    labels = []
    for i in range(n):
        r = find(i)
        roots.setdefault(r, min(j for j in range(n) if find(j) == r))
        labels.append(roots[r])
    return labels


def test_single_linkage_matches_kruskal(spark, rng):
    # three well-separated blobs
    X = np.vstack([rng.normal(c, 0.05, (12, 4)) for c in (0.0, 3.0, 9.0)]) \
        .astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    got = {r["id"]: r["label"]
           for r in single_linkage(df, 3, linkage="pairwise").collect()}
    exp = _np_single_linkage_labels(X.astype(float), 3)
    assert [got[i] for i in range(len(X))] == exp
    # knn_graph linkage finds the same 3 blobs
    got_k = {r["id"]: r["label"]
             for r in single_linkage(df, 3, k=6).collect()}
    assert [got_k[i] for i in range(len(X))] == exp


def test_dendrogram_heights_monotone(spark, rng):
    X = rng.random((20, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    g = knn_self(df, 19).select(F.col("qid").alias("src"),
                                F.col("nid").alias("dst"), "distance")
    dg = build_dendrogram(g, list(range(20)))
    assert len(dg.children) == 19  # fully connected -> spanning tree
    assert (np.diff(dg.distances) >= -1e-12).all()


def test_cagra_merge_physical(spark, rng):
    X = rng.random((40, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    g = knn_self(df, 8).select(F.col("qid").alias("src"),
                               F.col("nid").alias("dst"), "distance")
    g1 = g.filter(F.col("src") < 20)
    g2 = g.filter(F.col("src") >= 20)
    merged = cagra_merge([g1, g2], graph_degree=6)
    single = cagra_optimize(g, 6)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, single.collect())))


def test_hnsw_export_roundtrip(spark, rng, tmp_path):
    from cuvs_spark.sources.graph_export import (
        hnsw_from_cagra, load_graph_index, save_graph_index)
    X = rng.random((30, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    g = knn_self(df, 5).select(F.col("qid").alias("src"),
                               F.col("nid").alias("dst"), "distance")
    h = hnsw_from_cagra(g, M=4)
    assert h.filter(F.size("neighbors") > 4).count() == 0
    path = str(tmp_path / "hnsw_idx")
    save_graph_index(h, path, fmt="hnsw", meta={"M": 4})
    loaded, meta = load_graph_index(spark, path)
    assert meta["M"] == 4
    assert loaded.count() == 30


def test_mutual_reachability_linkage(spark, rng):
    """HDBSCAN-style mutual-reachability weights still recover clean
    blobs and are >= raw distances (agglomerative.hpp:133)."""
    X = np.vstack([rng.normal(c, 0.05, (10, 4)) for c in (0.0, 5.0)]) \
        .astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    got = {r["id"]: r["label"]
           for r in single_linkage(df, 2, k=6,
                                   mutual_reachability_k=3).collect()}
    assert {got[i] for i in range(10)} == {got[0]}
    assert {got[i] for i in range(10, 20)} == {got[10]}
    assert got[0] != got[10]


def test_single_linkage_distributed_rounds_match_serial_finish(spark, rng):
    """finish_components=1 forces the full distributed-Borůvka round
    loop (the serial finish never triggers); results must equal the
    default hybrid path and the NumPy Kruskal oracle."""
    X = np.vstack([rng.normal(c, 0.05, (10, 4)) for c in (0.0, 3.0, 9.0)]) \
        .astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    exp = _np_single_linkage_labels(X.astype(float), 3)
    forced = {r["id"]: r["label"]
              for r in single_linkage(df, 3, linkage="pairwise",
                                      finish_components=1).collect()}
    assert [forced[i] for i in range(len(X))] == exp
