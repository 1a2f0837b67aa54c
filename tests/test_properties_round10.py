"""Randomized cross-engine equivalence for the round-10 unrolled SQL
oracles (G.cagra_search_sql, G.nn_descent_sql) at parameter corners the
sf0.01 gates don't exercise: width > unexpanded pool, n_seeds > itopk,
single-round and deep unrolls, tiny k. Vectors are integer-valued so
float32 (Spark) and float64 (DuckDB pandas) inputs are identical and
the DOUBLE folds match bit-for-bit.
"""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import graph as G

N, DIM, NQ = 40, 5, 4


def _data(seed):
    rng = np.random.default_rng(seed)
    vecs = rng.integers(0, 12, size=(N, DIM)).astype(np.float64)
    qvecs = rng.integers(0, 12, size=(NQ, DIM)).astype(np.float64)
    return vecs, qvecs


def _random_edges(seed, out_degree):
    rng = np.random.default_rng(seed + 1000)
    rows = []
    for s in range(N):
        choices = rng.choice([x for x in range(N) if x != s],
                             size=out_degree, replace=False)
        rows += [(s, int(d)) for d in choices]
    return rows


def _spark_ds(spark, vecs, qvecs):
    d = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, vec array<float>")
    q = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qvecs)],
        "qid long, vec array<float>")
    return d, q


def _duck(vecs, qvecs, edges=None):
    con = duckdb.connect()
    con.register("ds_pd", pd.DataFrame(
        {"nid": np.arange(N, dtype=np.int64), "dv": list(map(list, vecs))}))
    con.register("qs_pd", pd.DataFrame(
        {"qid": np.arange(NQ, dtype=np.int64), "qv": list(map(list, qvecs))}))
    if edges is not None:
        con.register("eg_pd", pd.DataFrame(
            {"src": np.array([e[0] for e in edges], np.int64),
             "dst": np.array([e[1] for e in edges], np.int64)}))
    return con


@pytest.mark.parametrize(
    "seed,k,itopk,width,iters,n_seeds",
    [
        (11, 3, 6, 2, 1, 5),    # single round
        (22, 4, 10, 3, 3, 4),   # deep unroll
        (33, 2, 5, 5, 2, 8),    # width > pool, n_seeds > itopk
    ])
def test_cagra_search_matches_unrolled_sql(spark, seed, k, itopk, width,
                                           iters, n_seeds):
    vecs, qvecs = _data(seed)
    edges = _random_edges(seed, out_degree=4)
    d, q = _spark_ds(spark, vecs, qvecs)
    g = spark.createDataFrame(edges, "src long, dst long")
    seed_ids = (d.select(F.col("id").alias("nid"))
                .orderBy(F.md5(F.col("nid").cast("string")), "nid")
                .limit(n_seeds))
    seeds = q.select("qid").crossJoin(F.broadcast(seed_ids))
    got = sorted(map(tuple, G.cagra_search(
        g, d, q, k, itopk=itopk, search_width=width,
        max_iterations=iters, seeds=seeds).collect()))
    sql = G.cagra_search_sql(
        "SELECT nid, dv FROM ds_pd", "SELECT qid, qv FROM qs_pd",
        "SELECT src, dst FROM eg_pd", k, itopk=itopk,
        search_width=width, max_iterations=iters, n_seeds=n_seeds)
    con = _duck(vecs, qvecs, edges)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert len(got) == NQ * k


@pytest.mark.parametrize("seed,k,iters", [(44, 3, 1), (55, 4, 2), (66, 2, 3)])
def test_nn_descent_matches_unrolled_sql(spark, seed, k, iters):
    vecs, qvecs = _data(seed)
    d, _ = _spark_ds(spark, vecs, qvecs)
    ig = G.nn_descent_md5_init(d, k)
    got = sorted(map(tuple, G.nn_descent_build(
        d, k, max_iterations=iters, termination_threshold=0.0,
        init_graph=ig).collect()))
    sql = G.nn_descent_sql("SELECT nid, dv FROM ds_pd", k,
                           max_iterations=iters)
    con = _duck(vecs, qvecs)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert len(got) == N * k


def test_cagra_extend_matches_composed_sql(spark):
    """cagra_extend's extended graph equals the composed DuckDB oracle
    (beam splice + intra-batch kNN + min-union + optimize) when called
    with the oracle's md5 seed rule — the r11 gate candidate's
    end-to-end equivalence, proven here without a registry slot."""
    rng = np.random.default_rng(9)
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
        seeds=seeds)
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
        search_width=3, max_iterations=2, n_seeds=5)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
