"""Round-15 optimization pins — the changed operator internals.

Each round-15 optimization kept values identical by construction;
these tests pin that construction so a later edit can't silently
break it:

* ``connected_components``' convergence is now read from an
  ``Observation`` collected during each eager ``localCheckpoint``'s
  own materialization job (no separate isEmpty scan per round) — the
  fixpoint, the min-label components, the empty-edge early exit and
  the ``max_iterations`` budget must all be unchanged;
* ``chi2_terms``' label totals read the un-spread source — the
  counts (and therefore every χ² double) must be independent of the
  input's partitioning;
* ``kde``/``refine`` with the cosine metric use the factored-norm
  template — bit-equal to the plain template by the r14-pinned
  equivalence, re-pinned here at the operator level;
* the maxsim/select_k construction collapse (fewer analyzed Datasets,
  canonicalized-plan-equal) must keep values AND output column order.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


def _bits(x):
    return None if x is None else struct.pack("<d", x)


class TestCCObserveFusion:
    def test_path_graph_converges_to_min(self, spark):
        from cuvs_spark.pipeline.dedup import connected_components
        # a 6-node path needs several propagation rounds (diameter > 1)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
            "doc_a long, doc_b long")
        got = {(r["doc_id"], r["canonical_id"])
               for r in connected_components(pairs).collect()}
        want = {(i, 1) for i in range(1, 7)} | {(10, 10), (11, 10)}
        assert got == want

    def test_empty_pairs_short_circuit(self, spark):
        from cuvs_spark.pipeline.dedup import connected_components
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        assert connected_components(pairs).count() == 0

    def test_max_iterations_budget_unchanged(self, spark):
        from cuvs_spark.pipeline.dedup import connected_components
        # with max_iterations=1 only the fused init round runs: each
        # node takes min(id, min neighbor) — the path graph must NOT
        # be fully collapsed yet (node 4's neighbors are 3 and 5)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long")
        got = {r["doc_id"]: r["canonical_id"]
               for r in connected_components(pairs,
                                             max_iterations=1).collect()}
        assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}

    def test_star_converges_in_fused_round(self, spark):
        from cuvs_spark.pipeline.dedup import connected_components
        pairs = spark.createDataFrame(
            [(7, 3), (7, 5), (7, 9)], "doc_a long, doc_b long")
        got = {r["doc_id"]: r["canonical_id"]
               for r in connected_components(pairs).collect()}
        assert got == {3: 3, 5: 3, 7: 3, 9: 3}


class TestChi2TotalsPartitionFree:
    def test_same_chi2_any_partitioning(self, spark):
        from cuvs_spark.pipeline.classify import chi2_terms
        rows = [(i, "en" if i % 3 else "de",
                 f"alpha beta w{i % 5} gamma") for i in range(60)]
        one = spark.createDataFrame(rows, "doc_id long, lang string, "
                                    "text string").coalesce(1)
        many = spark.createDataFrame(rows, "doc_id long, lang string, "
                                    "text string").repartition(12)
        a = sorted(map(tuple, chi2_terms(one, "lang = 'en'", 10).collect()))
        b = sorted(map(tuple, chi2_terms(many, "lang = 'en'", 10).collect()))
        assert [(t, p, n, _bits(c)) for t, p, n, c in a] \
            == [(t, p, n, _bits(c)) for t, p, n, c in b]


class TestFactoredCosineOperators:
    def test_kde_cosine_bit_equal_to_template(self, spark, rng):
        from cuvs_spark.functions.distance import distance_sql_spark
        from cuvs_spark.operators.pairwise import kde
        n, dim = 30, 8
        rows = [(i, [float(v) for v in rng.random(dim).astype(np.float32)])
                for i in range(n)]
        d = spark.createDataFrame(rows, "id long, vec array<float>")
        q = spark.createDataFrame(rows[:5], "qid long, vec array<float>")
        got = kde(d, q, bandwidth=2.0, kernel="epanechnikov",
                  metric="cosine")
        # plain-template twin, inlined (the pre-r15 expression)
        a = q.select(F.col("qid").alias("i"), F.col("vec").alias("_xa"))
        b = d.select(F.col("id").alias("j"), F.col("vec").alias("_xb"))
        dist = distance_sql_spark("cosine", "_xa", "_xb")
        u = f"(({dist}) / CAST(2.0 AS DOUBLE))"
        kern = (f"CASE WHEN abs({u}) < CAST(1 AS DOUBLE) THEN "
                f"CAST(1 AS DOUBLE) - {u} * {u} ELSE CAST(0 AS DOUBLE) END")
        want = (a.join(b)
                .select(F.col("i").alias("qid"), F.expr(kern).alias("_k"))
                .groupBy("qid")
                .agg(F.round(F.sum("_k"), 6).alias("density")))
        g = {r["qid"]: _bits(r["density"]) for r in got.collect()}
        w = {r["qid"]: _bits(r["density"]) for r in want.collect()}
        assert g == w

    def test_refine_cosine_bit_equal_to_template(self, spark, rng):
        from cuvs_spark.functions.distance import distance_sql_spark
        from cuvs_spark.operators.pairwise import refine
        n, dim = 40, 8
        rows = [(i, [float(v) for v in rng.random(dim).astype(np.float32)])
                for i in range(n)]
        d = spark.createDataFrame(rows, "id long, vec array<float>")
        q = spark.createDataFrame(rows[:4], "qid long, qv array<float>")
        cand = spark.createDataFrame(
            [(qi, ni) for qi in range(4) for ni in range(0, n, 3)],
            "qid long, id long")
        got = refine(d, q, cand, 5, "cosine", qvec_col="qv")
        dist = distance_sql_spark("cosine", "_qv", "_dv")
        pairs = (cand.select(F.col("qid"), F.col("id").alias("nid"))
                 .join(d.select(F.col("id").alias("nid"),
                                F.col("vec").alias("_dv")), "nid")
                 .join(F.broadcast(q.select("qid",
                                            F.col("qv").alias("_qv"))),
                       "qid")
                 .select("qid", "nid", F.expr(dist).alias("distance")))
        from cuvs_spark.operators.select_k import select_k
        want = select_k(pairs, "qid", "distance", 5, tie_cols=["nid"])
        g = sorted((r["qid"], r["nid"], r["rank"], _bits(r["distance"]))
                   for r in got.collect())
        w = sorted((r["qid"], r["nid"], r["rank"], _bits(r["distance"]))
                   for r in want.collect())
        assert g == w


class TestCollapsedConstruction:
    def test_select_k_window_columns_and_ranks(self, spark):
        from cuvs_spark.operators.select_k import select_k
        df = spark.createDataFrame(
            [(1, 10, 0.5), (1, 11, 0.25), (1, 12, 0.25), (2, 10, 1.0)],
            "qid long, nid long, distance double")
        out = select_k(df, "qid", "distance", 2, tie_cols=["nid"],
                       strategy="window")
        assert out.columns == ["qid", "nid", "distance", "rank"]
        got = sorted(map(tuple, out.collect()))
        assert got == [(1, 11, 0.25, 1), (1, 12, 0.25, 2), (2, 10, 1.0, 1)]

    def test_maxsim_matches_brute(self, spark, rng):
        from cuvs_spark.pipeline.retrieval import maxsim_search
        dim = 6
        drows = [(d, t, [float(v) for v in
                         rng.random(dim).astype(np.float32)])
                 for d in range(6) for t in range(3)]
        qrows = [(q, t, [float(v) for v in
                         rng.random(dim).astype(np.float32)])
                 for q in range(2) for t in range(2)]
        docs = spark.createDataFrame(
            drows, "doc_id long, tok_idx long, vec array<float>")
        qs = spark.createDataFrame(
            qrows, "qid long, tok_idx long, vec array<float>")
        out = {(r["qid"], r["doc_id"]): r["score"]
               for r in maxsim_search(docs, qs, 10).collect()}
        D = {(d, t): np.array(v, dtype=np.float64)
             for d, t, v in drows}
        Q = {(q, t): np.array(v, dtype=np.float64)
             for q, t, v in qrows}

        def cos(a, b):
            return 1.0 - float(a @ b) / (
                np.sqrt(float(a @ a)) * np.sqrt(float(b @ b)))

        for (q, d), score in out.items():
            want = sum(
                max(1.0 - cos(Q[(q, t)], D[(d, s)]) for s in range(3))
                for t in range(2))
            assert score == pytest.approx(want, rel=1e-9)
