"""IVF-RaBitQ tests — estimator quality scales with bits_per_dim and
refinement recovers the reference recall floor (``ivf_rabitq.hpp:48``
"the smaller the bits_per_dim ... the lower the recall")."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import ivf_rabitq_build, ivf_rabitq_search, knn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.filter(F.col("id") < 20)
            .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))


@pytest.fixture(scope="module")
def centroids(emb):
    rows = emb.filter(F.col("id") < 16).orderBy("id").collect()
    return np.array([r["vec"] for r in rows], dtype=float)


def _recall(ann_df, exact_df):
    a = {(r["qid"], r["nid"]) for r in ann_df.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact_df.select("qid", "nid").collect()}
    return len(a & e) / len(e)


def test_rabitq_bits_monotone_and_refined(spark, emb, queries, centroids):
    exact = knn(emb, queries, 10, "sqeuclidean", qvec_col="qv")
    # probe ceiling: what exhaustive scoring of the probed lists gives
    idx9 = ivf_rabitq_build(emb, 16, bits_per_dim=9, centroids=centroids)
    r9 = _recall(ivf_rabitq_search(idx9, queries, 10, 4, qvec_col="qv"),
                 exact)
    idx1 = ivf_rabitq_build(emb, 16, bits_per_dim=1, centroids=centroids)
    r1 = _recall(ivf_rabitq_search(idx1, queries, 10, 4, qvec_col="qv"),
                 exact)
    idx3 = ivf_rabitq_build(emb, 16, bits_per_dim=3, centroids=centroids)
    r3 = _recall(ivf_rabitq_search(idx3, queries, 10, 4, qvec_col="qv"),
                 exact)
    # more bits -> better estimator (allow equality: tiny query set)
    assert r1 <= r3 + 1e-9 and r3 <= r9 + 1e-9, (r1, r3, r9)
    # at 9 bits the estimator is near-exact within the probed lists:
    # it must match IVF-Flat's recall at the same probes
    from cuvs_spark.operators.ivf_flat import ivf_flat_build, ivf_flat_search
    flat = ivf_flat_search(ivf_flat_build(emb, 16, centroids=centroids),
                           queries, 10, 4, qvec_col="qv")
    rf = _recall(flat, exact)
    assert abs(r9 - rf) <= 0.05, (r9, rf)
    # refinement recovers the probe ceiling from a 3-bit shortlist
    refined = ivf_rabitq_search(idx3, queries, 10, 4, qvec_col="qv",
                                refine_with=emb, refine_k0=30)
    assert _recall(refined, exact) >= rf - 0.05


def test_rabitq_bits_validation(emb, centroids):
    with pytest.raises(ValueError):
        ivf_rabitq_build(emb, 16, bits_per_dim=10, centroids=centroids)


def test_rabitq_save_load_roundtrip(spark, emb, queries, centroids,
                                    tmp_path):
    from cuvs_spark.sources import load_ivf_rabitq, save_ivf_rabitq
    idx = ivf_rabitq_build(emb, 16, bits_per_dim=3, centroids=centroids)
    before = ivf_rabitq_search(idx, queries, 5, 4, qvec_col="qv").collect()
    path = str(tmp_path / "rabitq_index")
    save_ivf_rabitq(idx, path)
    idx2 = load_ivf_rabitq(spark, path)
    after = ivf_rabitq_search(idx2, queries, 5, 4, qvec_col="qv").collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
