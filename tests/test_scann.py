"""ScaNN operator tests — SOAR spill invariants (``scann_soar.cuh:37-147``)
and recall of the two search tiers vs exact brute force, mirroring the
reference's recall-threshold harness (``ann_utils.py:130``)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import knn, scann_build, scann_search, soar_labels

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (emb.filter(F.col("id") < 20)
            .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))


@pytest.fixture(scope="module")
def centroids(emb):
    rows = emb.filter(F.col("id") < 16).orderBy("id").collect()
    return np.array([r["vec"] for r in rows], dtype=float)


def recall_at_k(ann_df, exact_df):
    a = {(r["qid"], r["nid"]) for r in ann_df.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact_df.select("qid", "nid").collect()}
    return len(a & e) / len(e)


def test_soar_labels_invariants(emb, centroids):
    """Every row gets exactly one (label, soar_label) pair; the primary
    label is the true argmin; the SOAR label differs unless forced."""
    lab = soar_labels(emb, centroids).cache()
    n = emb.count()
    assert lab.count() == n
    assert lab.select("id").distinct().count() == n
    rows = lab.collect()
    X = {r["id"]: None for r in rows}
    data = {r["id"]: np.array(r["vec"], float)
            for r in emb.collect()}
    for r in rows:
        x = data[r["id"]]
        d = ((centroids - x) ** 2).sum(1)
        assert r["label"] == int(d.argmin()), r
        # SOAR oracle: lambda * <r_hat, x - c'>^2 + ||x - c'||^2
        res = x - centroids[r["label"]]
        rn = np.linalg.norm(res)
        if rn > 0:
            rhat = res / rn
            score = (rhat @ (x - centroids).T) ** 2 + d
            assert r["soar_label"] == int(score.argmin()), r
    assert X is not None


def test_scann_reorder_recall(emb, queries, centroids):
    exact = knn(emb, queries, 10, "sqeuclidean", qvec_col="qv")
    idx = scann_build(emb, 16, centroids=centroids)
    # spilled assignment covers each id once or twice
    per_id = (idx.assignments.groupBy("id").count()
              .agg(F.min("count").alias("lo"), F.max("count").alias("hi"))
              .head())
    assert per_id["lo"] >= 1 and per_id["hi"] <= 2
    ann = scann_search(idx, queries, 10, 4, qvec_col="qv", method="reorder")
    assert recall_at_k(ann, exact) >= 0.8
    # probing every leaf == exact
    full = scann_search(idx, queries, 10, 16, qvec_col="qv", method="reorder")
    assert recall_at_k(full, exact) == 1.0


def test_scann_pq_recall(emb, queries, centroids):
    """Residual-PQ tier + exact reorder (ScaNN's score-ahead-of-reorder
    design): 4-bit coarse scores select candidates, the reorder tier
    rescores them exactly — combined recall clears the reference's 0.7
    ANN floor even though the raw PQ tier alone is coarser."""
    from cuvs_spark.operators import refine
    exact = knn(emb, queries, 10, "sqeuclidean", qvec_col="qv")
    idx = scann_build(emb, 16, centroids=centroids, pq_dim=8, pq_bits=4)
    cand = scann_search(idx, queries, 40, 8, qvec_col="qv", method="pq")
    assert recall_at_k(cand, exact) >= 0.4  # raw coarse tier
    refined = refine(emb, queries,
                     cand.select("qid", F.col("nid").alias("id")), 10,
                     qvec_col="qv")
    assert recall_at_k(refined, exact) >= 0.7


def test_scann_save_load_roundtrip(spark, emb, queries, centroids, tmp_path):
    """save → load → search equality (reference serialization tests,
    ``test_serialization.py``) — including the residual-PQ tables."""
    from cuvs_spark.sources import load_scann, save_scann
    idx = scann_build(emb, 16, centroids=centroids, pq_dim=8, pq_bits=4)
    before_r = scann_search(idx, queries, 5, 4, qvec_col="qv").collect()
    before_p = scann_search(idx, queries, 5, 4, qvec_col="qv",
                            method="pq").collect()
    path = str(tmp_path / "scann_index")
    save_scann(idx, path)
    idx2 = load_scann(spark, path)
    after_r = scann_search(idx2, queries, 5, 4, qvec_col="qv").collect()
    after_p = scann_search(idx2, queries, 5, 4, qvec_col="qv",
                           method="pq").collect()
    assert sorted(map(tuple, before_r)) == sorted(map(tuple, after_r))
    assert sorted(map(tuple, before_p)) == sorted(map(tuple, after_p))
