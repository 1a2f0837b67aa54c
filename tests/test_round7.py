"""Round-7 additions: broadcast query-side bounds (auto-fallback
plans), hnswlib emit guards, no-straddle sequence packing + waste,
best-fit-decreasing packing, single-linkage driver scalar helper."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Broadcast query-side bounds (VERDICT r6 next #5 / ADVICE lsh.py:153)
# ---------------------------------------------------------------------------

def test_knn_blas_query_limit_fallback_equal(spark, vectors_df, queries_df):
    """Past the query limit the blas path must fall back to the
    non-broadcast expr plan and return identical results."""
    from cuvs_spark.operators.brute_force import knn

    base = knn(vectors_df, queries_df, 4, "sqeuclidean", method="blas")
    fb = knn(vectors_df, queries_df, 4, "sqeuclidean", method="blas",
             broadcast_query_limit=3)    # 12 queries > 3 → fallback
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))
    assert key(base) == key(fb)


def test_knn_expr_no_broadcast_plan_and_equal(spark, vectors_df,
                                              queries_df):
    """broadcast_queries=False runs the partition-pair cartesian (no
    broadcast exchange on the query side) with identical results."""
    from cuvs_spark.operators.brute_force import knn

    base = knn(vectors_df, queries_df, 4, "cosine")
    nb = knn(vectors_df, queries_df, 4, "cosine", broadcast_queries=False)
    # the flag's contract is "no FORCED broadcast": the logical plan
    # must carry no broadcast hint, so the planner stays free to pick
    # the partition-pair cartesian at scale (with tiny cached fixtures
    # Catalyst may still choose BNLJ from stats — that's the point)
    logical = nb._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "broadcast" not in logical
    hinted = knn(vectors_df, queries_df, 4, "cosine",
                 broadcast_queries=True)
    assert "broadcast" in \
        hinted._jdf.queryExecution().analyzed().toString()
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))
    assert key(base) == key(nb)


def test_lsh_knn_shuffle_rerank_equal(spark, vectors_df, queries_df):
    """Past broadcast_query_limit the LSH re-rank drops the broadcast
    hint (ordinary shuffle join on qid) — results identical."""
    from cuvs_spark.operators.lsh import lsh_knn

    kw = dict(n_planes=4, n_tables=6, n_probe_bits=2, metric="cosine",
              seed=7)
    base = lsh_knn(vectors_df, queries_df, 5, broadcast_queries=True, **kw)
    fb = lsh_knn(vectors_df, queries_df, 5, broadcast_query_limit=3, **kw)
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))
    assert key(base) == key(fb)


# ---------------------------------------------------------------------------
# hnswlib emit guards (ADVICE graph_export.py:487)
# ---------------------------------------------------------------------------

def test_hnswlib_save_empty_dataset_raises(spark, tmp_path):
    from cuvs_spark.sources.graph_export import hnsw_save_hnswlib

    layers = spark.createDataFrame(
        [], "layer int, src long, neighbors array<bigint>")
    empty = spark.createDataFrame([], "id long, vec array<float>")
    with pytest.raises(ValueError, match="empty dataset"):
        hnsw_save_hnswlib(layers, empty, str(tmp_path / "idx.bin"))
