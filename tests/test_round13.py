"""Round-13 pins.

1. ``ivf_sq_search_sql`` fail-fast metric validation (ADVICE r12 #2):
   the SQL twin is callable directly, so an unknown metric must raise a
   clear ValueError (mirroring ``ivf_sq_build``) instead of a bare
   KeyError from ``is_min_close``/``distance_sql_duckdb``. The check is
   VALIDATION-ONLY: at build time the generated SQL for every one of
   the 28 registered metrics was proven byte-identical against the
   pre-check version (commit 447fd39) — the test below pins the
   fail-fast plus generation succeeding for the full registered
   surface with the right sort direction.
2. ``tiered_search_ip`` (r12 verdict #6 — the last untested
   direction×composition cell): a max-close (inner_product) tiered
   search exercises the CROSS-TIER ``knn_merge_parts`` direction, not
   just the per-index flips gated in r12. With exhaustive probes the
   ANN tier is exact, so the tiered result must equal brute-force over
   the union — in the max-close direction, bit-for-bit.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- 1. ivf_sq_search_sql fail-fast metric validation -----------------------

def test_ivf_sq_search_sql_rejects_unknown_metric():
    from cuvs_spark.operators.ivf_pq import ivf_sq_search_sql
    with pytest.raises(ValueError, match="unknown metric"):
        ivf_sq_search_sql("SELECT 1 AS id, [1.0] AS dv",
                          "SELECT 1 AS qid, [1.0] AS qv",
                          "SELECT 0 AS label, [0.0] AS cv",
                          10, 8, -1.0, 1.0, metric="nope")


def test_ivf_sq_search_sql_generates_for_every_registered_metric():
    """Validation-only change: every registered metric still generates
    SQL, ranked in its ``is_min_close`` direction (byte-identity vs the
    pre-check version proven at build time, see module docstring)."""
    from cuvs_spark.functions.distance import METRICS, is_min_close
    from cuvs_spark.operators.ivf_pq import ivf_sq_search_sql
    for m in sorted(METRICS):
        sql = ivf_sq_search_sql("SELECT 1 AS id, [1.0] AS dv",
                                "SELECT 1 AS qid, [1.0] AS qv",
                                "SELECT 0 AS label, [0.0] AS cv",
                                10, 8, -1.0, 1.0, metric=m)
        order = "ASC" if is_min_close(m) else "DESC"
        assert (f"ORDER BY distance {order}, nid ASC" in sql), m


# --- 2. directional tiered composition --------------------------------------

def test_tiered_search_ip_exhaustive_probes_equals_bruteforce(
        spark, vectors_df, queries_df):
    """Max-close tiered search with EXHAUSTIVE probes: the IVF tier is
    exact, so ann-tier ∪ delta-tier merged max-close must equal plain
    brute-force inner_product kNN over the union — same neighbors, same
    ranks, identical doubles (both sides score with the same JVM
    distance template). This pins the cross-tier merge DIRECTION
    (``tiered_search`` → ``knn_merge_parts(select_min=False)``), the
    cell the r12 per-index directional gates didn't cover."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import (TieredIndex, tiered_extend,
                                             tiered_search)
    old = vectors_df.filter(F.col("id") < 60)
    new = vectors_df.filter(F.col("id") >= 60)
    n_lists = 4
    ann = ivf_flat_build(old, n_lists, metric="inner_product",
                         kmeans_n_iters=2)
    idx = TieredIndex(ann=ann,
                      delta=spark.createDataFrame(
                          [], "id long, vec array<float>"),
                      min_ann_rows=10**9, metric="inner_product")
    idx = tiered_extend(idx, new)
    got = tiered_search(idx, queries_df, 5, n_lists, qvec_col="vec")
    want = knn(vectors_df, queries_df, 5, "inner_product")
    g = sorted(tuple(r) for r in
               got.select("qid", "nid", "distance", "rank").collect())
    w = sorted(tuple(r) for r in
               want.select("qid", "nid", "distance", "rank").collect())
    assert g == w
    # and the direction really is max-close: rank-1 carries the LARGEST
    # inner product per query
    top = {r["qid"]: r["distance"]
           for r in got.filter(F.col("rank") == 1).collect()}
    for r in got.collect():
        assert top[r["qid"]] >= r["distance"]


def test_tiered_search_ip_plan_has_no_cartesian_product(spark, vectors_df,
                                                        queries_df):
    """Same plan-shape bar as the graph family: every non-broadcast join
    in the tiered composition is an equi-join (probes on list_id/qid);
    the only nested-loop joins are the intentional bounded broadcasts
    (centroid table = n_lists rows, query batch = small side by
    contract). A CartesianProduct — the shape that dies at 100 TB —
    must never appear, in either direction."""
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import (TieredIndex, tiered_extend,
                                             tiered_search)
    from cuvs_spark.plans.layout import plan_string
    ann = ivf_flat_build(vectors_df.filter(F.col("id") < 60), 4,
                         metric="inner_product", kmeans_n_iters=2)
    idx = TieredIndex(ann=ann,
                      delta=spark.createDataFrame(
                          [], "id long, vec array<float>"),
                      min_ann_rows=10**9, metric="inner_product")
    idx = tiered_extend(idx, vectors_df.filter(F.col("id") >= 60))
    out = tiered_search(idx, queries_df, 5, 2, qvec_col="vec")
    assert "CartesianProduct" not in plan_string(out)
