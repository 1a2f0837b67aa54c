"""Distance expressions vs scipy oracle (mirrors the reference's
``test_brute_force.py:10`` scipy.cdist comparison and the per-metric
kernel tests in ``cpp/tests/distance/``)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import METRICS, distance_col, is_min_close

try:
    from scipy.spatial import distance as spd
    HAVE_SCIPY = True
except ImportError:
    HAVE_SCIPY = False


def _spark_dist(spark, a, b, metric, p=2.0):
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(y) for y in b])],
        "a array<float>, b array<float>")
    return df.select(distance_col(metric, "a", "b", p).alias("d")).head()["d"]


CASES = [
    ("sqeuclidean", lambda a, b: np.sum((a - b) ** 2)),
    ("euclidean", lambda a, b: np.sqrt(np.sum((a - b) ** 2))),
    ("cityblock", lambda a, b: np.abs(a - b).sum()),
    ("chebyshev", lambda a, b: np.abs(a - b).max()),
    ("inner_product", lambda a, b: float(a @ b)),
    ("cosine", lambda a, b: 1 - (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))),
    ("canberra", lambda a, b: (np.abs(a - b) / (np.abs(a) + np.abs(b))).sum()),
    ("braycurtis", lambda a, b: np.abs(a - b).sum() / np.abs(a + b).sum()),
    ("hamming", lambda a, b: (a != b).mean()),
]


@pytest.mark.parametrize("metric,oracle", CASES, ids=[c[0] for c in CASES])
def test_metric_vs_numpy(spark, rng, metric, oracle):
    a = rng.random(16).astype(np.float32).astype(np.float64)
    b = rng.random(16).astype(np.float32).astype(np.float64)
    got = _spark_dist(spark, a, b, metric)
    assert got == pytest.approx(oracle(a, b), rel=1e-9)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy absent")
def test_correlation_minkowski_scipy(spark, rng):
    a = rng.random(16).astype(np.float32).astype(np.float64)
    b = rng.random(16).astype(np.float32).astype(np.float64)
    assert _spark_dist(spark, a, b, "correlation") == pytest.approx(
        spd.correlation(a, b), rel=1e-9)
    assert _spark_dist(spark, a, b, "minkowski", p=3.0) == pytest.approx(
        spd.minkowski(a, b, 3), rel=1e-9)
    assert _spark_dist(spark, a, b, "jensenshannon") >= 0


def test_prob_metrics(spark, rng):
    a = rng.random(8); a /= a.sum()
    b = rng.random(8); b /= b.sum()
    hell = _spark_dist(spark, a, b, "hellinger")
    ref = np.sqrt(max(0.0, 1 - np.sum(np.sqrt(a * b))))
    assert hell == pytest.approx(ref, rel=1e-6)
    kl = _spark_dist(spark, a, b, "kl_divergence")
    assert kl == pytest.approx(float(np.sum(a * np.log(a / b))), rel=1e-6)


def test_binary_metrics(spark):
    a = np.array([1, 0, 1, 1, 0, 0, 1, 0], float)
    b = np.array([1, 1, 0, 1, 0, 0, 0, 1], float)
    inter, uni = 2, 6
    assert _spark_dist(spark, a, b, "jaccard") == pytest.approx(1 - inter / uni)
    assert _spark_dist(spark, a, b, "russellrao") == pytest.approx((8 - inter) / 8)
    nza, nzb = 4, 4
    assert _spark_dist(spark, a, b, "dice") == pytest.approx(1 - 2 * inter / (nza + nzb))


def test_haversine(spark):
    sf = np.radians([37.7749, -122.4194])
    ny = np.radians([40.7128, -74.0060])
    d = _spark_dist(spark, sf, ny, "haversine")
    assert d * 6371.0 == pytest.approx(4129.0, rel=0.01)  # km


def test_is_min_close():
    assert not is_min_close("inner_product")
    assert is_min_close("euclidean")
    assert "l2" in METRICS and "dot" in METRICS
