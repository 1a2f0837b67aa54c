"""Round-trip persistence for the round-3 index types (IVF-PQ, IVF-SQ,
CAGRA, tiered) plus the generic save_index/load_index dispatch —
reference per-index ``save``/``load`` (``ivf_pq_serialize.cuh``,
``cagra_serialize.cuh``, ``tiered_index.pyx``).

Centroids here are TRAINED (k-means means, not dataset rows), so the
round trip exercises the float64 persistence path: a float32 store
would shift assignment/probe boundaries and these equality checks
would flake.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.filter(F.col("id") < 5)
            .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))


@pytest.fixture(scope="module")
def trained_centroids(emb):
    from cuvs_spark.cluster import kmeans_fit
    return kmeans_fit(emb, 8, max_iter=4, seed=11).centroids


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_pq_save_load_roundtrip(spark, emb, queries, trained_centroids,
                                    tmp_path):
    from cuvs_spark.operators.ivf_pq import ivf_pq_build, ivf_pq_search
    from cuvs_spark.sources import load_ivf_pq, save_ivf_pq

    idx = ivf_pq_build(emb, 8, pq_dim=8, centroids=trained_centroids,
                       seed=3)
    before = _rows(ivf_pq_search(idx, queries, 5, 4, qvec_col="qv"))
    path = str(tmp_path / "pq_index")
    save_ivf_pq(idx, path)
    idx2 = load_ivf_pq(spark, path)
    assert np.array_equal(idx2.centroids, np.asarray(trained_centroids,
                                                     float))
    after = _rows(ivf_pq_search(idx2, queries, 5, 4, qvec_col="qv"))
    assert before == after


def test_ivf_pq_residual_rotated_save_load(spark, emb, queries,
                                           trained_centroids, tmp_path):
    """encode/rotation must round-trip: a residual index reloaded as
    encode='raw' would build a raw-query LUT against residual codes and
    silently return wrong distances; a rotated index whose matrix isn't
    persisted is unrecoverable (codes live in the rotated basis)."""
    from cuvs_spark.operators.ivf_pq import ivf_pq_build, ivf_pq_search
    from cuvs_spark.sources import load_ivf_pq, save_ivf_pq

    idx = ivf_pq_build(emb, 8, pq_dim=8, centroids=trained_centroids,
                       seed=3, encode="residual",
                       force_random_rotation=True, method="blas")
    before = _rows(ivf_pq_search(idx, queries, 5, 4, qvec_col="qv",
                                 method="blas"))
    path = str(tmp_path / "pq_res_rot")
    save_ivf_pq(idx, path)
    idx2 = load_ivf_pq(spark, path)
    assert idx2.encode == "residual"
    assert idx2.rotation is not None
    assert np.array_equal(idx2.rotation, idx.rotation)
    after = _rows(ivf_pq_search(idx2, queries, 5, 4, qvec_col="qv",
                                method="blas"))
    assert before == after


def test_ivf_sq_save_load_roundtrip(spark, emb, queries, trained_centroids,
                                    tmp_path):
    from cuvs_spark.operators.ivf_pq import ivf_sq_build, ivf_sq_search
    from cuvs_spark.sources import load_ivf_sq, save_ivf_sq

    idx = ivf_sq_build(emb, 8, centroids=trained_centroids)
    before = _rows(ivf_sq_search(idx, queries, 5, 4, qvec_col="qv"))
    path = str(tmp_path / "sq_index")
    save_ivf_sq(idx, path)
    idx2 = load_ivf_sq(spark, path)
    assert (idx2.lo, idx2.hi) == (idx.lo, idx.hi)
    after = _rows(ivf_sq_search(idx2, queries, 5, 4, qvec_col="qv"))
    assert before == after


def test_cagra_save_load_roundtrip(spark, emb, queries, tmp_path):
    from cuvs_spark.operators.graph import cagra_build, cagra_search
    from cuvs_spark.sources import load_cagra, save_cagra

    d = emb.limit(200)
    g = cagra_build(d, graph_degree=8, n_clusters=4, overlap_factor=2,
                    kmeans_n_iters=4)
    before = _rows(cagra_search(g, d, queries, 5, max_iterations=4,
                               qvec_col="qv"))
    path = str(tmp_path / "cagra_index")
    save_cagra(g, path, dataset=d)
    edges, d2, meta = load_cagra(spark, path)
    assert meta["graph_degree"] == 8 and meta["include_dataset"]
    assert _rows(edges) == _rows(g)
    after = _rows(cagra_search(edges, d2, queries, 5, max_iterations=4,
                              qvec_col="qv"))
    assert before == after


def test_cagra_save_without_dataset(spark, emb, tmp_path):
    from cuvs_spark.operators.graph import cagra_build
    from cuvs_spark.sources import load_cagra, save_cagra

    g = cagra_build(emb.limit(100), graph_degree=4, n_clusters=2,
                    overlap_factor=2, kmeans_n_iters=2)
    path = str(tmp_path / "cagra_graph_only")
    save_cagra(g, path, include_dataset=False)
    edges, d2, meta = load_cagra(spark, path)
    assert d2 is None and not meta["include_dataset"]
    assert edges.count() == g.count()


def test_tiered_save_load_roundtrip(spark, emb, queries, tmp_path):
    from cuvs_spark.operators.tiered import (tiered_build, tiered_extend,
                                             tiered_search)
    from cuvs_spark.sources import load_tiered, save_tiered

    idx = tiered_build(emb.filter(F.col("id") >= 50), 8,
                       min_ann_rows=10_000, kmeans_n_iters=4, seed=5)
    idx = tiered_extend(idx, emb.filter(F.col("id") < 50))
    assert not idx.delta.isEmpty(), "delta tier must stay un-compacted"
    before = _rows(tiered_search(idx, queries, 5, 4, qvec_col="qv"))
    path = str(tmp_path / "tiered_index")
    save_tiered(idx, path)
    idx2 = load_tiered(spark, path)
    assert idx2.min_ann_rows == 10_000
    after = _rows(tiered_search(idx2, queries, 5, 4, qvec_col="qv"))
    assert before == after


def test_generic_dispatch_roundtrip(spark, emb, queries, trained_centroids,
                                    tmp_path):
    from cuvs_spark.operators.ivf_flat import ivf_flat_search
    from cuvs_spark.operators.ivf_pq import ivf_pq_build
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.sources import load_index, save_index

    for name, idx in [
        ("flat", ivf_flat_build(emb, 8, centroids=trained_centroids)),
        ("pq", ivf_pq_build(emb, 8, pq_dim=8,
                            centroids=trained_centroids, seed=3)),
    ]:
        path = str(tmp_path / f"any_{name}")
        save_index(idx, path)
        idx2 = load_index(spark, path)
        assert type(idx2) is type(idx)
    out = ivf_flat_search(load_index(spark, str(tmp_path / "any_flat")),
                          queries, 5, 4, qvec_col="qv")
    assert out.count() == 5 * 5


def test_brute_force_save_load_roundtrip(spark, emb, queries, tmp_path):
    """brute_force.pyx:266,304 — save/load the exact index; a loaded
    index must search identically (it is exact, so identical to a
    direct knn too)."""
    from cuvs_spark.operators import knn
    from cuvs_spark.operators.brute_force import bf_build
    from cuvs_spark.sources import load_index, save_index

    idx = bf_build(emb, "cosine")
    path = str(tmp_path / "bf_index")
    save_index(idx, path)
    idx2 = load_index(spark, path)
    assert idx2.metric == "cosine"
    got = _rows(idx2.search(queries, 5, qvec_col="qv"))
    want = _rows(knn(emb, queries, 5, "cosine", qvec_col="qv"))
    assert got == want


def test_brute_force_save_no_dataset(spark, emb, tmp_path):
    from cuvs_spark.operators.brute_force import bf_build
    from cuvs_spark.sources import load_index, save_brute_force

    path = str(tmp_path / "bf_meta_only")
    save_brute_force(bf_build(emb), path, include_dataset=False)
    with pytest.raises(ValueError):
        load_index(spark, path)
