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
