"""Round-12 pins.

1. ``composite_search`` rejects a mixed-metric sub-index list loudly
   (r11 verdict #6 / ADVICE r11 #3) instead of silently merging
   incomparable scores in the first index's direction.
2. The power-iteration headroom guard (ADVICE r11 #1): moment
   magnitudes past the exact-integer bounds raise on the Spark side
   instead of silently wrapping where the DuckDB twin would error.
3. Directional (max-close) quantized IVF — the r11 entry guards
   (``_require_min_close_quant``) are REPLACED by real inner_product
   support, cross-engine hash-exact for IVF-SQ and IVF-PQ (raw and
   residual encodings), matching the r11 directional treatment of the
   graph family (r11 verdict #2).
4. Directional all_neighbors/ACE build (r11 verdict #3): the batch
   partitioning stays L2-shaped (k-means geometry) but local scoring
   and merges follow ``is_min_close(metric)`` — the last graph-family
   guard removed, cross-engine hash-exact for inner_product.
"""
from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

SF_TINY = "/root/testdata/sf0.001"


def _duck(sf=SF_TINY):
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf}/embeddings.parquet'")
    return con


# --- 1. composite_search metric homogeneity --------------------------------

def test_composite_search_rejects_mixed_metrics(spark, vectors_df,
                                                queries_df):
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import composite_search
    a = ivf_flat_build(vectors_df, 4, kmeans_n_iters=2,
                       metric="sqeuclidean")
    b = ivf_flat_build(vectors_df, 4, kmeans_n_iters=2,
                       metric="inner_product")
    with pytest.raises(ValueError, match="metric"):
        composite_search([a, b], queries_df, 3, 2, qvec_col="vec")


def test_composite_search_homogeneous_still_works(spark, vectors_df,
                                                  queries_df):
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import composite_search
    a = ivf_flat_build(vectors_df.filter(F.col("id") % 2 == 0), 4,
                       kmeans_n_iters=2)
    b = ivf_flat_build(vectors_df.filter(F.col("id") % 2 == 1), 4,
                       kmeans_n_iters=2)
    out = composite_search([a, b], queries_df, 3, 2, qvec_col="vec")
    assert out.count() > 0


# --- 1b. directional quantized indexes survive save/load --------------------

def test_directional_index_save_load_roundtrip(spark, vectors_df,
                                               queries_df, tmp_path):
    """The r12 directional/normalized quantized indexes persist their
    metric: a loaded max-close (or cosine-normalized) index must search
    identically to the in-memory one — a load that defaulted to
    sqeuclidean would silently rank worst-first."""
    from cuvs_spark.operators.ivf_pq import (ivf_pq_build, ivf_pq_search,
                                             ivf_sq_build, ivf_sq_search)
    from cuvs_spark.sources import (load_ivf_pq, load_ivf_sq,
                                    save_ivf_pq, save_ivf_sq)

    sq = ivf_sq_build(vectors_df, 4, kmeans_n_iters=2,
                      metric="inner_product", lo=-8.0, hi=8.0)
    want = sorted(map(tuple,
                      ivf_sq_search(sq, queries_df, 3, 2,
                                    qvec_col="vec").collect()))
    save_ivf_sq(sq, str(tmp_path / "sq"))
    sq2 = load_ivf_sq(spark, str(tmp_path / "sq"))
    assert sq2.metric == "inner_product"
    got = sorted(map(tuple,
                     ivf_sq_search(sq2, queries_df, 3, 2,
                                   qvec_col="vec").collect()))
    assert got == want and want

    pq = ivf_pq_build(vectors_df, 4, 2, metric="cosine",
                      kmeans_n_iters=2)
    want = sorted(map(tuple,
                      ivf_pq_search(pq, queries_df, 3, 2,
                                    qvec_col="vec").collect()))
    save_ivf_pq(pq, str(tmp_path / "pq"))
    pq2 = load_ivf_pq(spark, str(tmp_path / "pq"))
    assert pq2.metric == "cosine"
    got = sorted(map(tuple,
                     ivf_pq_search(pq2, queries_df, 3, 2,
                                   qvec_col="vec").collect()))
    assert got == want and want


# --- 1c. the r12 directional novel gates vs their registered oracles --------

def test_directional_gates_match_oracle(spark):
    """The two r12 novel gates that drive-gate the directional surface
    itself (ivf_sq_search_ip, ivf_pq_search_cosine) run green against
    their registered DuckDB oracles at sf0.001 — the same comparison
    the driver makes at sf0.01."""
    from cuvs_spark.entry_queries import ORACLES, QUERIES
    con = _duck()
    for name in ("ivf_sq_search_ip", "ivf_pq_search_cosine"):
        got = sorted(map(tuple, QUERIES[name](spark, SF_TINY).collect()))
        want = sorted(map(tuple, con.sql(ORACLES[name]).fetchall()))
        assert got == want, name
        assert got, f"{name}: empty result"


# --- 1d. metric-alias hygiene (r12 review findings) --------------------------

def test_pq_metric_resolves_aliases(spark, vectors_df, queries_df):
    """Registered aliases of the PQ surface must keep working (the
    pre-r12 guard accepted them): l2_expanded ≡ sqeuclidean builds and
    searches identically, dot resolves to inner_product, and the
    canonical name is what the index stores."""
    from cuvs_spark.operators.ivf_pq import (_pq_metric, ivf_pq_build,
                                             ivf_pq_search)
    assert _pq_metric("l2_expanded") == "sqeuclidean"
    assert _pq_metric("dot") == "inner_product"
    assert _pq_metric("l2") == "euclidean"
    a = ivf_pq_build(vectors_df, 2, 1, metric="l2_expanded",
                     kmeans_n_iters=2, seed=3)
    b = ivf_pq_build(vectors_df, 2, 1, metric="sqeuclidean",
                     kmeans_n_iters=2, seed=3)
    assert a.metric == "sqeuclidean"
    ra = sorted(map(tuple, ivf_pq_search(a, queries_df, 3, 2,
                                         qvec_col="vec").collect()))
    rb = sorted(map(tuple, ivf_pq_search(b, queries_df, 3, 2,
                                         qvec_col="vec").collect()))
    assert ra == rb and ra


def test_composite_search_alias_and_empty(spark, vectors_df, queries_df):
    """Same-metric ALIASES across sub-indexes must not trip the
    homogeneity assert, and an empty index list fails with a clear
    error instead of a bare KeyError."""
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import composite_search
    a = ivf_flat_build(vectors_df.filter(F.col("id") % 2 == 0), 4,
                       kmeans_n_iters=2, metric="sqeuclidean")
    b = ivf_flat_build(vectors_df.filter(F.col("id") % 2 == 1), 4,
                       kmeans_n_iters=2, metric="l2_expanded")
    assert composite_search([a, b], queries_df, 3, 2,
                            qvec_col="vec").count() > 0
    with pytest.raises(ValueError, match="empty"):
        composite_search([], queries_df, 3, 2)


def test_ivf_sq_build_rejects_unknown_metric(spark, vectors_df):
    """ivf_sq_build fails fast on a typo'd metric instead of building
    the whole index and KeyError-ing at search time."""
    from cuvs_spark.operators.ivf_pq import ivf_sq_build
    with pytest.raises(ValueError, match="unknown metric"):
        ivf_sq_build(vectors_df, 2, metric="cosinee")


# --- 2. power-iteration headroom guard --------------------------------------

def test_pca_power_headroom_guard_raises(spark):
    from cuvs_spark.preprocessing.pca import pca_power_fit
    rng = np.random.default_rng(7)
    X = rng.normal(scale=1000.0, size=(40, 8))
    d = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id long, vec array<float>")
    with pytest.raises(ValueError, match="headroom"):
        pca_power_fit(d, 1, 2)
