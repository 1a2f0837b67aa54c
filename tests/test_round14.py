"""Round-14 pins: the max-close composite serving composition.

``composite_search`` (the ``composite::index`` analog — fan out to
every sub-index, merge) had merge-shape and mixed-metric-rejection
unit tests but no end-to-end correctness pin in the max-close
direction. With EXHAUSTIVE probes each IVF sub-index is exact, so the
composite over disjoint halves must equal brute-force over the union,
bit-for-bit — same pin shape as the r13 tiered one, covering the
composite fan-out path instead of the ann+delta path. One sub-index is
built via the ``dot`` ALIAS of inner_product, pinning that the r12
canonical-name homogeneity assert admits aliases on a real search (not
just the unit assert) and that the alias scores identically.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _two_half_indexes(vectors_df, metric_a="inner_product",
                      metric_b="dot", n_lists=4):
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    a = ivf_flat_build(vectors_df.filter(F.col("id") < 60), n_lists,
                       metric=metric_a, kmeans_n_iters=2)
    b = ivf_flat_build(vectors_df.filter(F.col("id") >= 60), n_lists,
                       metric=metric_b, kmeans_n_iters=2)
    return a, b


def test_composite_search_ip_exhaustive_probes_equals_bruteforce(
        spark, vectors_df, queries_df):
    """Exhaustive probes: composite(a: ids<60, b: ids>=60) ==
    brute-force inner_product kNN over the union — same neighbors,
    same ranks, identical doubles (both sides score with the same JVM
    distance template). Sub-index b is registered under the ``dot``
    alias: the homogeneity check canonicalizes it, and the merged
    scores prove the alias resolves to the identical template."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.tiered import composite_search
    n_lists = 4
    a, b = _two_half_indexes(vectors_df, n_lists=n_lists)
    got = composite_search([a, b], queries_df, 5, n_lists,
                           qvec_col="vec")
    want = knn(vectors_df, queries_df, 5, "inner_product")
    g = sorted(tuple(r) for r in
               got.select("qid", "nid", "distance", "rank").collect())
    w = sorted(tuple(r) for r in
               want.select("qid", "nid", "distance", "rank").collect())
    assert g == w
    # and the merge direction really is max-close: rank-1 carries the
    # LARGEST inner product per query
    top = {r["qid"]: r["distance"]
           for r in got.filter(F.col("rank") == 1).collect()}
    for r in got.collect():
        assert top[r["qid"]] >= r["distance"]


def test_composite_search_alias_rejects_true_mixed_metrics(vectors_df,
                                                           queries_df):
    """The alias path must not weaken the homogeneity check: dot +
    inner_product is ONE canonical metric (allowed, tested above), but
    dot + sqeuclidean is still a loud failure."""
    from cuvs_spark.operators.tiered import composite_search
    a, b = _two_half_indexes(vectors_df, metric_a="dot",
                             metric_b="sqeuclidean")
    with pytest.raises(ValueError, match="disagree on metric"):
        composite_search([a, b], queries_df, 5, 4, qvec_col="vec")


def test_composite_search_ip_plan_has_no_cartesian_product(
        spark, vectors_df, queries_df):
    """Same plan-shape bar as the tiered composition: every
    non-broadcast join in the composite fan-out is an equi-join; the
    only nested-loop joins are the intentional bounded broadcasts
    (centroid table = n_lists rows, query batch = small side by
    contract). A CartesianProduct must never appear."""
    from cuvs_spark.operators.tiered import composite_search
    from cuvs_spark.plans.layout import plan_string
    a, b = _two_half_indexes(vectors_df)
    out = composite_search([a, b], queries_df, 5, 2, qvec_col="vec")
    assert "CartesianProduct" not in plan_string(out)
