"""Sparse (CSR) metric dispatch vs a NumPy densified oracle —
reference ``cpp/src/distance/sparse_distance.cu:36`` metric set.

The gate queries cover sqeuclidean / inner_product / cosine / jaccard
against DuckDB; this covers the remaining metrics (euclidean, hamming)
and the n_cols contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from cuvs_spark.operators.sparse import (sparse_knn,
                                         sparse_pairwise_distance,
                                         sparsify)

N, DIM, THR = 40, 12, 0.25


@pytest.fixture(scope="module")
def dense(spark):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((N, DIM)).astype(np.float32)
    X[np.abs(X) <= THR] = 0.0        # true zeros so sparsify is lossless
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(N)],
        "id long, vec array<float>")
    return X.astype(np.float64), df


def _mat(df):
    out = np.zeros((N, N))
    for r in df.collect():
        out[r["i"], r["j"]] = r["distance"]
    return out


def test_sparse_euclidean_matches_numpy(dense):
    X, df = dense
    sp = sparsify(df, THR)
    got = _mat(sparse_pairwise_distance(sp, metric="euclidean"))
    exp = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    # atol: the pair dot is rounded to 9 dp for cross-engine stability,
    # and sqrt amplifies that residue to ~3e-5 near zero
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_sparse_hamming_matches_numpy(dense):
    X, df = dense
    sp = sparsify(df, THR)
    got = _mat(sparse_pairwise_distance(sp, metric="hamming", n_cols=DIM))
    exp = (X[:, None, :] != X[None, :, :]).mean(-1)
    np.testing.assert_allclose(got, exp)


def test_sparse_hamming_requires_n_cols(dense):
    _, df = dense
    sp = sparsify(df, THR)
    with pytest.raises(ValueError, match="n_cols"):
        sparse_pairwise_distance(sp, metric="hamming").collect()


def test_sparse_knn_jaccard_ranks(dense):
    """Self-kNN under jaccard: rank 1 must be the row itself
    (distance 0 against its own sparsity pattern)."""
    X, df = dense
    sp = sparsify(df, THR)
    q = sp.limit(5)
    got = sparse_knn(sp, q, 3, metric="jaccard")
    top = {r["qid"]: r["nid"] for r in got.collect() if r["rank"] == 1}
    assert all(qid == nid for qid, nid in top.items())


def test_sparse_lp_family_matches_numpy(dense):
    """Unexpanded l1/canberra/minkowski (lp_distance.cuh:73-178): the
    norm + collision-correction decomposition must equal the densified
    union sum."""
    X, df = dense
    sp = sparsify(df, THR)
    got = _mat(sparse_pairwise_distance(sp, metric="cityblock"))
    np.testing.assert_allclose(
        got, np.abs(X[:, None, :] - X[None, :, :]).sum(-1), atol=1e-8)
    p = 3.0
    got = _mat(sparse_pairwise_distance(sp, metric="minkowski",
                                        minkowski_p=p))
    exp = (np.abs(X[:, None, :] - X[None, :, :]) ** p).sum(-1) ** (1 / p)
    # the 9-dp corr rounding is amplified to ~1e-3 by the cube root
    # near zero (same effect the euclidean test documents for sqrt)
    np.testing.assert_allclose(got, exp, atol=2e-3)
    got = _mat(sparse_pairwise_distance(sp, metric="canberra"))
    den = np.abs(X[:, None, :]) + np.abs(X[None, :, :])
    num = np.abs(X[:, None, :] - X[None, :, :])
    exp = np.divide(num, den, out=np.zeros_like(num), where=den > 0).sum(-1)
    np.testing.assert_allclose(got, exp, atol=1e-8)


def test_sparse_knn_collision_candidates(dense):
    """candidates='collisions' must agree with exact top-k whenever the
    true neighbors collide (they do on this dense-ish fixture), and its
    plan must not contain the m×n cross relation."""
    X, df = dense
    sp = sparsify(df, THR)
    q = sp.limit(5)
    exact = sparse_knn(sp, q, 3, metric="sqeuclidean")
    coll = sparse_knn(sp, q, 3, metric="sqeuclidean",
                      candidates="collisions")
    assert (sorted(map(tuple, coll.select("qid", "nid").collect()))
            == sorted(map(tuple, exact.select("qid", "nid").collect())))
    plan = coll._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
