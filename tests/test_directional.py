"""Directional (max-close) support for the graph family — r11.

The reference's CAGRA and NN-Descent accept ``inner_product``
(``cagra.pyx:250``, ``nn_descent.pyx:48``), a max-close metric
(``distance.hpp:72-85``): larger dot product means closer. Before r11
the graph family guarded these out (ADVICE r10 #1's "restrict" arm);
this file pins the "flip" arm — every pool ordering, per-edge fold and
final top-k flips with ``is_min_close(metric)`` on BOTH engines
together, so the Spark operators and their unrolled DuckDB twins stay
value-hash-exact in either direction.

Every test is parametrized over (sqeuclidean, inner_product): the
sqeuclidean rows double as regression anchors proving the min-close
dataflow is unchanged by the parameterization (select_min=True folds to
the exact pre-r11 plans), the inner_product rows prove the new
direction. Vectors are integer-valued so float32 (Spark) and float64
(DuckDB pandas) inputs are identical and the DOUBLE folds match
bit-for-bit.
"""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import graph as G

N, DIM, NQ = 36, 5, 4
METRICS = ("sqeuclidean", "inner_product")


def _data(seed):
    rng = np.random.default_rng(seed)
    vecs = rng.integers(0, 12, size=(N, DIM)).astype(np.float64)
    qvecs = rng.integers(0, 12, size=(NQ, DIM)).astype(np.float64)
    return vecs, qvecs


def _random_edges(seed, out_degree, with_distance=False):
    rng = np.random.default_rng(seed + 1000)
    rows = []
    for s in range(N):
        choices = rng.choice([x for x in range(N) if x != s],
                             size=out_degree, replace=False)
        for d in choices:
            rows.append((s, int(d), float(rng.integers(0, 50)))
                        if with_distance else (s, int(d)))
    return rows


def _spark_ds(spark, vecs, qvecs):
    d = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, vec array<float>")
    q = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qvecs)],
        "qid long, vec array<float>")
    return d, q


def _duck(vecs, qvecs, edges=None, with_distance=False):
    con = duckdb.connect()
    con.register("ds_pd", pd.DataFrame(
        {"nid": np.arange(N, dtype=np.int64), "dv": list(map(list, vecs))}))
    con.register("qs_pd", pd.DataFrame(
        {"qid": np.arange(NQ, dtype=np.int64), "qv": list(map(list, qvecs))}))
    if edges is not None:
        cols = {"src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64)}
        if with_distance:
            cols["distance"] = np.array([e[2] for e in edges], np.float64)
        con.register("eg_pd", pd.DataFrame(cols))
    return con


@pytest.mark.parametrize("metric", METRICS)
def test_nn_descent_directional_matches_unrolled_sql(spark, metric):
    vecs, qvecs = _data(7)
    d, _ = _spark_ds(spark, vecs, qvecs)
    ig = G.nn_descent_md5_init(d, 4)
    got = sorted(map(tuple, G.nn_descent_build(
        d, 4, max_iterations=2, termination_threshold=0.0,
        init_graph=ig, metric=metric).collect()))
    sql = G.nn_descent_sql("SELECT nid, dv FROM ds_pd", 4,
                           max_iterations=2, metric=metric)
    con = _duck(vecs, qvecs)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert len(got) == N * 4
    if metric == "inner_product":
        # max-close sanity: each node's kept edges are its LARGEST dots
        dots = vecs @ vecs.T
        np.fill_diagonal(dots, -np.inf)
        by_src = {}
        for s, dd, dist, _ in got:
            by_src.setdefault(s, []).append(dist)
        # the descent is approximate, but the top-1 of a converged run
        # over the md5 init must be near the true max, never the min
        assert all(max(v) > np.median(dots[s][np.isfinite(dots[s])])
                   for s, v in by_src.items())


@pytest.mark.parametrize("metric", METRICS)
def test_cagra_search_directional_matches_unrolled_sql(spark, metric):
    vecs, qvecs = _data(13)
    edges = _random_edges(13, out_degree=4)
    d, q = _spark_ds(spark, vecs, qvecs)
    g = spark.createDataFrame(edges, "src long, dst long")
    seed_ids = (d.select(F.col("id").alias("nid"))
                .orderBy(F.md5(F.col("nid").cast("string")), "nid")
                .limit(5))
    seeds = q.select("qid").crossJoin(F.broadcast(seed_ids))
    got = sorted(map(tuple, G.cagra_search(
        g, d, q, 3, itopk=8, search_width=3, max_iterations=2,
        seeds=seeds, metric=metric, stop_on_empty=False).collect()))
    sql = G.cagra_search_sql(
        "SELECT nid, dv FROM ds_pd", "SELECT qid, qv FROM qs_pd",
        "SELECT src, dst FROM eg_pd", 3, itopk=8, search_width=3,
        max_iterations=2, n_seeds=5, metric=metric)
    con = _duck(vecs, qvecs, edges)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert len(got) == NQ * 3


@pytest.mark.parametrize("metric", METRICS)
def test_cagra_extend_directional_matches_composed_sql(spark, metric):
    rng = np.random.default_rng(29)
    base = rng.integers(0, 12, size=(30, DIM)).astype(np.float64)
    newv = rng.integers(0, 12, size=(8, DIM)).astype(np.float64)
    edges = []
    for s in range(30):
        for dd in rng.choice([x for x in range(30) if x != s], size=4,
                             replace=False):
            edges.append((s, int(dd), float(rng.integers(0, 50))))
    d = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "id long, vec array<float>")
    new = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(newv)],
        "id long, vec array<float>")
    g = spark.createDataFrame(edges, "src long, dst long, distance double")
    seed_ids = (d.select(F.col("id").alias("nid"))
                .orderBy(F.md5(F.col("nid").cast("string")), "nid")
                .limit(5))
    seeds = (new.select(F.col("id").alias("qid"))
             .crossJoin(F.broadcast(seed_ids)))
    got_graph, got_ds = G.cagra_extend(
        g, d, new, 4, itopk=8, search_width=3, max_iterations=2,
        seeds=seeds, metric=metric)
    got = sorted(map(tuple, got_graph.collect()))
    assert got_ds.count() == 38

    con = duckdb.connect()
    con.register("base_pd", pd.DataFrame(
        {"nid": np.arange(30, dtype=np.int64), "dv": list(map(list, base))}))
    con.register("new_pd", pd.DataFrame(
        {"nid": np.arange(100, 108, dtype=np.int64),
         "dv": list(map(list, newv))}))
    con.register("eg_pd", pd.DataFrame(
        {"src": np.array([e[0] for e in edges], np.int64),
         "dst": np.array([e[1] for e in edges], np.int64),
         "distance": np.array([e[2] for e in edges], np.float64)}))
    sql = G.cagra_extend_sql(
        "SELECT nid, dv FROM base_pd", "SELECT nid, dv FROM new_pd",
        "SELECT src, dst, distance FROM eg_pd", 4, itopk=8,
        search_width=3, max_iterations=2, n_seeds=5, metric=metric)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want


@pytest.mark.parametrize("select_min", (True, False))
def test_cagra_optimize_directional_matches_sql(spark, select_min):
    edges = _random_edges(3, out_degree=6, with_distance=True)
    g = spark.createDataFrame(edges, "src long, dst long, distance double")
    got = sorted(map(tuple, G.cagra_optimize(
        g, 3, select_min=select_min).collect()))
    sql = G.cagra_optimize_sql("SELECT src, dst, distance FROM eg_pd", 3,
                               select_min=select_min)
    vecs, qvecs = _data(3)
    con = _duck(vecs, qvecs, edges, with_distance=True)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert got


def test_cagra_merge_directional_keeps_best_edge(spark):
    """Duplicate edges across merged graphs fold with max when
    select_min=False (the closest edge under a max-close metric)."""
    g1 = spark.createDataFrame([(0, 1, 5.0), (1, 0, 2.0)],
                               "src long, dst long, distance double")
    g2 = spark.createDataFrame([(0, 1, 9.0), (1, 2, 1.0), (2, 1, 1.0)],
                               "src long, dst long, distance double")
    out = {(r["src"], r["dst"]): r["distance"]
           for r in G.cagra_merge([g1, g2], 4,
                                  select_min=False).collect()}
    assert out[(0, 1)] == 9.0          # max fold, not min
    want_min = {(r["src"], r["dst"]): r["distance"]
                for r in G.cagra_merge([g1, g2], 4).collect()}
    # min fold: 2.0 — optimize's reverse pass mirrors (1,0,2.0) into
    # the (0,1) slot, and min(5.0, 9.0, 2.0) keeps it
    assert want_min[(0, 1)] == 2.0     # default unchanged


def test_all_neighbors_still_guards_max_close(spark):
    """The batch-partitioned all_neighbors build (and its ACE SQL
    composition) stays min-close-only — its k-means batching is
    L2-shaped; the error routes callers to build_algo='nn_descent'."""
    d = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])],
                              "id long, vec array<float>")
    with pytest.raises(ValueError, match="max-close"):
        G.all_neighbors_build(d, 1, metric="inner_product")
    with pytest.raises(ValueError, match="max-close"):
        G.all_neighbors_sql("SELECT 1", "SELECT 1", 3,
                            metric="inner_product")
    with pytest.raises(ValueError, match="max-close"):
        G.cagra_ace_sql("SELECT 1", "SELECT 1", "SELECT 1", 3,
                        npartitions=2, metric="inner_product")


def test_cagra_search_directional_corner_width_exceeds_pool(spark):
    """The r10 property-test corner (width > unexpanded pool, n_seeds >
    itopk) exercised in the max-close direction."""
    vecs, qvecs = _data(57)
    edges = _random_edges(57, out_degree=3)
    d, q = _spark_ds(spark, vecs, qvecs)
    g = spark.createDataFrame(edges, "src long, dst long")
    seed_ids = (d.select(F.col("id").alias("nid"))
                .orderBy(F.md5(F.col("nid").cast("string")), "nid")
                .limit(8))
    seeds = q.select("qid").crossJoin(F.broadcast(seed_ids))
    got = sorted(map(tuple, G.cagra_search(
        g, d, q, 2, itopk=5, search_width=5, max_iterations=2,
        seeds=seeds, metric="inner_product").collect()))
    sql = G.cagra_search_sql(
        "SELECT nid, dv FROM ds_pd", "SELECT qid, qv FROM qs_pd",
        "SELECT src, dst FROM eg_pd", 2, itopk=5, search_width=5,
        max_iterations=2, n_seeds=8, metric="inner_product")
    con = _duck(vecs, qvecs, edges)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want


def test_hnsw_inner_product_end_to_end(spark):
    """hnsw_build already forwards builder kwargs to cagra_build, so
    the reference-supported inner_product index works through the
    whole stack (nn_descent base layer, directional upper-layer M-NN,
    layer-descent + base beam in hnsw_search) — recall vs the exact
    max-dot kNN clears the reference's own pass bar."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.sources.graph_export import hnsw_build, hnsw_search

    vecs, qvecs = _data(73)
    d, q = _spark_ds(spark, vecs, qvecs)
    layers = hnsw_build(d, graph_degree=8, metric="inner_product",
                        hierarchy="cpu", build_algo="nn_descent",
                        max_iterations=3)
    got = hnsw_search(layers, d, q, 5, ef=24, metric="inner_product")
    exact = knn(d, q, 5, "inner_product", qvec_col="vec")
    hit = (got.select("qid", "nid")
           .intersect(exact.select("qid", "nid")).count())
    assert hit / (NQ * 5) >= 0.8
    # directional ordering: rank 1 carries the LARGEST dot per query
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["distance"]))
    for qid, pairs in by_q.items():
        ranked = [dist for _, dist in sorted(pairs)]
        assert ranked == sorted(ranked, reverse=True), qid


def test_quantized_ivf_guards_max_close(spark):
    """The directional audit's remaining restrict-arm stopgaps: IVF-PQ
    (its LUT accumulates squared residual distances — L2 by
    construction) and IVF-SQ (decoded scoring is directional but its
    local top-k / merge order ASC) must fail loudly on a max-close
    metric instead of silently keeping the worst k. The flip is the
    tracked r12 follow-up."""
    from dataclasses import replace

    from cuvs_spark.operators.ivf_pq import (ivf_pq_build, ivf_sq_build,
                                             ivf_sq_search,
                                             ivf_sq_search_sql)

    vecs, qvecs = _data(91)
    d, q = _spark_ds(spark, vecs, qvecs)
    with pytest.raises(ValueError, match="max-close"):
        ivf_pq_build(d, 2, 1, metric="inner_product")
    with pytest.raises(ValueError, match="max-close"):
        ivf_sq_build(d, 2, metric="inner_product")
    with pytest.raises(ValueError, match="max-close"):
        ivf_sq_search_sql("a", "b", "c", 1, 1, -1.0, 1.0,
                          metric="inner_product")
    idx = ivf_sq_build(d, 2)
    with pytest.raises(ValueError, match="max-close"):
        ivf_sq_search(replace(idx, metric="inner_product"), q, 2, 1,
                      qvec_col="vec")


def test_cagra_build_nn_descent_inner_product_end_to_end(spark):
    """cagra_build(build_algo='nn_descent', metric='inner_product') —
    the reference's supported combination (cagra.pyx:250) — runs end to
    end and returns a max-close-ordered graph (rank 1 holds the LARGEST
    distance per src)."""
    vecs, _ = _data(41)
    d, _ = _spark_ds(spark, vecs, vecs[:NQ])
    g = G.cagra_build(d, 4, build_algo="nn_descent",
                      metric="inner_product", max_iterations=2)
    rows = g.collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append((r["rank"], r["distance"]))
    for s, pairs in by_src.items():
        ranked = [dist for _, dist in sorted(pairs)]
        assert ranked == sorted(ranked, reverse=True), s
