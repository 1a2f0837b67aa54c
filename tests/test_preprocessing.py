"""Preprocessing quality tests: PCA vs NumPy eigh, PQ reconstruction
error vs raw variance, scalar quantizer round-trip bounds (mirrors the
reference's transform/inverse_transform grids in
``python/cuvs/cuvs/tests/test_quantize_*.py`` style)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.preprocessing import (
    binary_quantize,
    pq_build,
    pq_inverse_transform,
    pq_transform,
    scalar_inverse_transform,
    scalar_train,
    scalar_transform,
)
from cuvs_spark.preprocessing.pca import pca_fit, pca_inverse_transform, pca_transform

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("id").collect()
    return np.array([r["vec"] for r in rows], dtype=np.float64)


def test_scalar_quantize_roundtrip(spark, emb, X):
    params = scalar_train(emb, quantile=0.98)
    lo, hi = np.quantile(X.ravel(), [0.01, 0.99])
    assert params.qmin == pytest.approx(lo, abs=1e-3)
    assert params.qmax == pytest.approx(hi, abs=1e-3)
    enc = scalar_transform(emb, params)
    codes = enc.select("id", "codes").orderBy("id").collect()
    assert all(-128 <= c <= 127 for r in codes for c in r["codes"])
    dec = scalar_inverse_transform(enc, params, out_col="rec")
    rows = dec.select("id", "rec").orderBy("id").collect()
    R = np.array([r["rec"] for r in rows], dtype=np.float64)
    step = (params.qmax - params.qmin) / 255.0
    inside = (X >= params.qmin) & (X <= params.qmax)
    assert np.abs((R - X)[inside]).max() <= step * 0.5 + 1e-6


def test_binary_quantize_bits(spark):
    d = spark.createDataFrame(
        [(1, [1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 4.0, -4.0, 5.0])],
        "id long, vec array<float>")
    got = binary_quantize(d).head()["bits"]
    # bits 0,2,4,6 set in byte 0 -> 0b01010101 = 85; dim 8 positive -> 1
    assert got == [85, 1]


def test_pq_roundtrip_reduces_error(spark, emb, X):
    book = pq_build(emb, pq_dim=8, pq_bits=4, kmeans_n_iters=6)
    assert book.codebook.shape == (8, 16, 8)
    codes = pq_transform(emb, book)
    dec = pq_inverse_transform(codes, book)
    rows = dec.orderBy("id").collect()
    R = np.array([r["vec"] for r in rows], dtype=np.float64)
    mse = ((R - X) ** 2).mean()
    var = X.var()
    assert mse < var * 0.7, (mse, var)  # beats the all-zeros quantizer


def test_vpq_roundtrip_beats_plain_pq(spark, emb, X):
    """VQ+PQ (``pq.pyx`` ``use_vq``): removing the coarse center before
    PQ must reconstruct at least as well as plain PQ with the same code
    budget, and labels/codes must be within range."""
    from cuvs_spark.preprocessing.pq import (vpq_build,
                                             vpq_inverse_transform,
                                             vpq_transform)
    quant = vpq_build(emb, pq_dim=8, pq_bits=4, vq_n_centers=16,
                      kmeans_n_iters=6)
    assert quant.vq_centroids.shape[0] == 16
    assert quant.pq.codebook.shape == (8, 16, 8)
    codes = vpq_transform(emb, quant).cache()
    got = codes.orderBy("id").collect()
    assert all(0 <= r["vq_label"] < 16 for r in got)
    assert all(0 <= c < 16 for r in got for c in r["codes"])
    dec = vpq_inverse_transform(codes, quant)
    R = np.array([r["vec"] for r in dec.orderBy("id").collect()],
                 dtype=np.float64)
    vpq_mse = ((R - X) ** 2).mean()
    book = pq_build(emb, pq_dim=8, pq_bits=4, kmeans_n_iters=6)
    P = np.array([r["vec"] for r in
                  pq_inverse_transform(pq_transform(emb, book), book)
                  .orderBy("id").collect()], dtype=np.float64)
    pq_mse = ((P - X) ** 2).mean()
    assert vpq_mse <= pq_mse * 1.05, (vpq_mse, pq_mse)


def test_vpq_blas_matches_expr(spark, emb):
    from cuvs_spark.preprocessing.pq import vpq_build, vpq_transform
    quant = vpq_build(emb, pq_dim=4, pq_bits=4, vq_n_centers=8,
                      kmeans_n_iters=4)
    a = {(r["id"], r["vq_label"], tuple(r["codes"]))
         for r in vpq_transform(emb, quant, method="expr").collect()}
    b = {(r["id"], r["vq_label"], tuple(r["codes"]))
         for r in vpq_transform(emb, quant, method="blas").collect()}
    assert a == b


def test_pca_matches_numpy(spark, emb, X):
    model = pca_fit(emb, n_components=4)
    mu = X.mean(0)
    cov = np.cov(X.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    np.testing.assert_allclose(model.mean, mu, atol=1e-9)
    np.testing.assert_allclose(model.explained_variance, vals[order],
                               rtol=1e-8)
    for i in range(4):
        ref = vecs[:, order[i]]
        got = model.components[i]
        assert abs(abs(ref @ got) - 1.0) < 1e-8  # same direction up to sign
    # projection matches numpy
    out = pca_transform(emb, model).orderBy("id").collect()
    P = np.array([r["pc"] for r in out])
    ref_p = (X - mu) @ model.components.T
    np.testing.assert_allclose(P, ref_p, atol=1e-9)
    # reconstruction error = sum of dropped eigenvalues
    rec = pca_inverse_transform(pca_transform(emb, model), model).collect()
    R = np.array([r["vec"] for r in sorted(rec, key=lambda r: r["id"])])
    mse = ((R - X) ** 2).sum(1).mean()
    dropped = vals[np.argsort(vals)[::-1][4:]].sum()
    assert mse == pytest.approx(dropped, rel=1e-4)
