"""Property-grid tests for the distance expression family — the
reference's parametrize-everything strategy (``test_brute_force.py:
15-36``) plus metric axioms, evaluated in one Spark job per property
over a seeded random batch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import METRICS, distance_col

PROPER_METRICS = ["sqeuclidean", "euclidean", "cityblock", "chebyshev",
                  "canberra", "braycurtis", "hamming", "cosine"]


@pytest.fixture(scope="module")
def pair_df(spark, rng):
    rows = []
    for i in range(64):
        a = rng.random(12).astype(np.float32)
        b = rng.random(12).astype(np.float32)
        rows.append((i, [float(x) for x in a], [float(x) for x in b]))
    return spark.createDataFrame(
        rows, "i long, a array<float>, b array<float>").cache()


def _all(df, col):
    return [r["v"] for r in df.select(col.alias("v")).collect()]


@pytest.mark.parametrize("metric", PROPER_METRICS)
def test_symmetry_nonneg_identity(pair_df, metric):
    dab = _all(pair_df, distance_col(metric, "a", "b"))
    dba = _all(pair_df, distance_col(metric, "b", "a"))
    daa = _all(pair_df, distance_col(metric, "a", "a"))
    assert all(x == y for x, y in zip(dab, dba)), "symmetry"
    assert all(x >= 0 for x in dab), "non-negativity"
    assert all(abs(x) < 1e-9 for x in daa), "identity"


@pytest.mark.parametrize("metric", ["sqeuclidean", "euclidean", "cityblock",
                                    "chebyshev"])
def test_triangle_like_translation_invariance(spark, pair_df, metric):
    """d(a+c, b+c) == d(a, b) for translation-invariant metrics."""
    shifted = pair_df.select(
        "i",
        F.expr("transform(a, x -> CAST(x + CAST(0.5 AS FLOAT) AS FLOAT))").alias("a"),
        F.expr("transform(b, x -> CAST(x + CAST(0.5 AS FLOAT) AS FLOAT))").alias("b"))
    d0 = _all(pair_df, distance_col(metric, "a", "b"))
    d1 = _all(shifted, distance_col(metric, "a", "b"))
    for x, y in zip(d0, d1):
        assert x == pytest.approx(y, rel=1e-5)


def test_inner_product_bilinearity(pair_df):
    d1 = _all(pair_df, distance_col("inner_product", "a", "b"))
    scaled = pair_df.select(
        "i", F.expr("transform(a, x -> CAST(x * CAST(2 AS FLOAT) AS FLOAT))").alias("a"), "b")
    d2 = _all(scaled, distance_col("inner_product", "a", "b"))
    for x, y in zip(d1, d2):
        assert y == pytest.approx(2 * x, rel=1e-6)


def test_mg_modes_agree(spark, vectors_df, queries_df):
    from cuvs_spark.operators.mg import replicated_knn, sharded_knn
    a = sharded_knn(vectors_df, queries_df, 5, "euclidean", n_shards=4)
    b = replicated_knn(vectors_df, queries_df, 5, "euclidean")
    assert (sorted(map(tuple, a.select("qid", "nid", "rank").collect()))
            == sorted(map(tuple, b.select("qid", "nid", "rank").collect())))
