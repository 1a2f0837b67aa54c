"""CustomUDF metric / precomputed / masked_nn (§2.10) and spectral
embedding/clustering quality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.cluster.spectral import spectral_embedding, spectral_fit_predict
from cuvs_spark.operators import knn
from cuvs_spark.operators.brute_force import (
    knn_precomputed,
    knn_udf_metric,
    masked_nn,
)


def test_udf_metric_matches_builtin(spark, vectors_df, queries_df):
    def sq(A, B):
        return ((A - B) ** 2).sum(1)

    got = knn_udf_metric(vectors_df, queries_df, 5, sq)
    ref = knn(vectors_df, queries_df, 5, "sqeuclidean")
    assert (sorted(map(tuple, got.select("qid", "nid", "rank").collect()))
            == sorted(map(tuple, ref.select("qid", "nid", "rank").collect())))


def test_precomputed_metric(spark, vectors_df, queries_df):
    from cuvs_spark.functions.distance import distance_col
    d = vectors_df.select(F.col("id").alias("nid"), F.col("vec").alias("dv"))
    q = queries_df.select(F.col("qid"), F.col("vec").alias("qv"))
    pre = d.crossJoin(q).select(
        "qid", "nid", distance_col("cityblock", "qv", "dv").alias("distance"))
    got = knn_precomputed(pre, 3)
    ref = knn(vectors_df, queries_df, 3, "cityblock")
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, ref.collect())))


def test_masked_nn(spark, vectors_df, queries_df):
    mask = (queries_df.select("qid").crossJoin(vectors_df.select("id"))
            .filter((F.col("id") % 3) == (F.col("qid") % 3)))
    got = masked_nn(vectors_df, queries_df, mask, 4)
    assert got.count() > 0
    assert all((r["nid"] % 3) == (r["qid"] % 3) for r in got.collect())


def test_spectral_separates_blobs(spark, rng):
    X = np.vstack([rng.normal(c, 0.05, (15, 6)) for c in (0.0, 4.0, 8.0)]) \
        .astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    emb = spectral_embedding(df, 2, k=6)
    E = np.array([r["embedding"] for r in emb.orderBy("id").collect()])
    assert E.shape == (45, 2)
    labels = {r["id"]: r["label"]
              for r in spectral_fit_predict(df, 3, k=6).collect()}
    true = [i // 15 for i in range(45)]
    # perfect blob recovery up to label permutation
    by_pred = {}
    for i, t in enumerate(true):
        by_pred.setdefault(labels[i], set()).add(t)
    assert len(by_pred) == 3
    assert all(len(v) == 1 for v in by_pred.values())


def test_spectral_sparse_path_separates_blobs(spark, rng):
    """Above _DENSE_MAX rows the Lanczos/CSR path runs (no dense n×n on
    the driver) and must still recover well-separated blobs."""
    from cuvs_spark.cluster import spectral as SP

    n_per = (SP._DENSE_MAX // 3) + 40      # total > _DENSE_MAX
    X = np.vstack([rng.normal(c, 0.05, (n_per, 4)) for c in
                   (0.0, 4.0, 8.0)]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "id long, vec array<float>")
    labels = {r["id"]: r["label"]
              for r in spectral_fit_predict(
                  df, 3, k=8, graph_method="approx").collect()}
    true = [i // n_per for i in range(3 * n_per)]
    by_pred = {}
    for i, t in enumerate(true):
        by_pred.setdefault(labels[i], set()).add(t)
    assert len(by_pred) == 3
    assert all(len(v) == 1 for v in by_pred.values())
