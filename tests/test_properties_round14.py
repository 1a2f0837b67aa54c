"""Property-based invariant for the round-14 surface: the composite
fan-out (``composite_search``) must equal a single brute-force top-k
over the union — for ANY partitioning of the corpus into sub-indexes,
in BOTH metric directions, with the last sub-index registered under a
metric ALIAS (the canonical-name homogeneity path). The r13 property
pinned the shared merge core (``knn_merge_parts``); this sweeps the
full composite path — per-part IVF build + exhaustive-probe search +
directional merge — over random corpus splits, generalizing the fixed
half-split pin in tests/test_round14.py and gate composite_search_ip.
"""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

_ALIAS = {"inner_product": "dot", "sqeuclidean": "l2_expanded"}


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2 ** 16),
       n_parts=st.integers(min_value=1, max_value=3),
       metric=st.sampled_from(["inner_product", "sqeuclidean"]))
def test_composite_any_partitioning_equals_bruteforce(
        spark, vectors_df, queries_df, seed, n_parts, metric):
    """Invariant: split the corpus into 1–3 random sub-indexes (each
    ≥10 rows), search with EXHAUSTIVE probes (each IVF sub-index is
    exact), merge — the result equals brute-force kNN over the whole
    corpus: same neighbors, same ranks, identical doubles, in either
    direction. The last part is built under the metric's alias, so
    every example also sweeps the homogeneity check's alias path."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import composite_search
    from pyspark.sql import functions as F

    n = vectors_df.count()
    rng = np.random.default_rng(seed)
    perm = [int(i) for i in rng.permutation(n)]
    if n_parts == 1:
        groups = [perm]
    elif n_parts == 2:
        c = int(rng.integers(10, n - 10))
        groups = [perm[:c], perm[c:]]
    else:
        c1 = int(rng.integers(10, n - 20))
        c2 = int(rng.integers(c1 + 10, n - 10))
        groups = [perm[:c1], perm[c1:c2], perm[c2:]]

    n_lists = 4
    indexes = []
    for j, ids in enumerate(groups):
        m = _ALIAS[metric] if j == len(groups) - 1 else metric
        part = vectors_df.filter(F.col("id").isin(ids))
        indexes.append(ivf_flat_build(part, n_lists, metric=m,
                                      kmeans_n_iters=2))
    got = composite_search(indexes, queries_df, 5, n_lists,
                           qvec_col="vec")
    want = knn(vectors_df, queries_df, 5, metric)
    g = sorted(tuple(r) for r in
               got.select("qid", "nid", "distance", "rank").collect())
    w = sorted(tuple(r) for r in
               want.select("qid", "nid", "distance", "rank").collect())
    assert g == w
