"""Round-11 pins.

1. The min-close guard (ADVICE r10 #1), r11 final form: the
   batch-partitioned ``all_neighbors`` build and its ACE composition
   stayed min-close-only in r11, while NN-Descent / beam search /
   extend / optimize / merge gained full directional support — the
   "flip" arm of the ADVICE, pinned cross-engine in
   tests/test_directional.py. SUPERSEDED in r12: the last guard was
   removed (r11 verdict #3) and the test below now pins the flip.
2. ``cagra_search(stop_on_empty=False)`` (r10 verdict #9): the
   fixed-iteration path drops the per-round empty-frontier driver job
   without changing results — pinned both as result-equality against
   the default path and as a no-``isEmpty``-call property.
3. The two r11 novel gates (``cagra_extend_fixed``,
   ``tiered_compaction_search``) run green against their registered
   DuckDB oracles at sf0.001 — the same comparison the driver makes at
   sf0.01 (their compositions were equivalence-proven in r10;
   tests/test_properties_round10.py and tests/test_round10.py).
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.operators import graph as G

SF_TINY = "/root/testdata/sf0.001"


# --- 1. min-close guard (SUPERSEDED in r12) ---------------------------------

def test_all_neighbors_family_accepts_max_close_metric(vectors_df):
    """r11 guarded the batch-partitioned build min-close-only; r12
    removed the last guard (r11 verdict #3) — the L2 batching geometry
    stays but scoring/merging is directional. Cross-engine hash
    equality for both directions is pinned in tests/test_directional.py;
    this smoke pins that the old ValueError is gone and ordering is
    max-close."""
    out = G.all_neighbors_build(vectors_df, 3, n_clusters=2,
                                metric="inner_product")
    rows = out.orderBy("src", "rank").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r["distance"])
    assert by_src and all(v == sorted(v, reverse=True)
                          for v in by_src.values())
    assert "DESC" in G.all_neighbors_sql("SELECT 1", "SELECT 1", 3,
                                         metric="inner_product")


def test_min_close_metrics_still_accepted():
    # directional support must not change any min-close metric the
    # family took before r11 (cosine/euclidean gates, sqeuclidean
    # defaults) — and their SQL twins must still order ASC
    for m in ("sqeuclidean", "euclidean", "cosine"):
        sql = G.nn_descent_sql("SELECT 1 AS nid, [1.0] AS dv", 2, metric=m)
        assert "row_number" in sql and "DESC" not in sql
    assert "DESC" in G.nn_descent_sql("SELECT 1 AS nid, [1.0] AS dv", 2,
                                      metric="inner_product")


# --- 2. stop_on_empty ------------------------------------------------------

def _beam_fixture(spark, vectors_df, queries_df):
    from cuvs_spark.operators import knn_self
    g = knn_self(vectors_df, 6).select(F.col("qid").alias("src"),
                                       F.col("nid").alias("dst"),
                                       "distance")
    edges = G.cagra_optimize(g, 4)
    seed_ids = (vectors_df.select(F.col("id").alias("nid"))
                .orderBy(F.md5(F.col("nid").cast("string")), "nid")
                .limit(5))
    seeds = (queries_df.select("qid").crossJoin(F.broadcast(seed_ids)))
    return edges, seeds


def test_cagra_search_stop_on_empty_same_result(spark, vectors_df,
                                                queries_df):
    """Skipping the empty-frontier check never changes results: an
    empty frontier makes every remaining round a no-op (no candidates,
    pool unchanged). max_iterations is oversized so the default path
    actually breaks early while the fixed path runs all rounds."""
    edges, seeds = _beam_fixture(spark, vectors_df, queries_df)
    kw = dict(k=4, itopk=8, search_width=3, max_iterations=12,
              qvec_col="vec", seeds=seeds)
    a = G.cagra_search(edges, vectors_df, queries_df, **kw)
    b = G.cagra_search(edges, vectors_df, queries_df,
                       stop_on_empty=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


def test_cagra_search_fixed_runs_no_isempty_job(spark, vectors_df,
                                                queries_df,
                                                monkeypatch):
    """The r10 verdict #9 done-criterion: the gated fixed-iteration
    call shape (explicit seeds, small max_iterations,
    stop_on_empty=False) must never issue the per-round
    ``DataFrame.isEmpty`` driver job."""
    edges, seeds = _beam_fixture(spark, vectors_df, queries_df)

    def _boom(self):
        raise AssertionError("isEmpty job issued on the fixed path")

    monkeypatch.setattr(DataFrame, "isEmpty", _boom)
    out = G.cagra_search(edges, vectors_df, queries_df, 4, itopk=8,
                         search_width=3, max_iterations=3,
                         qvec_col="vec", seeds=seeds,
                         stop_on_empty=False)
    assert out.count() > 0


# --- 3. the r11 novel gates vs their registered oracles --------------------

def _oracle_compare(spark, name):
    from cuvs_spark.entry_queries import ORACLES, QUERIES
    got = sorted(map(tuple, QUERIES[name](spark, SF_TINY).collect()))
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_TINY}/embeddings.parquet'")
    want = sorted(map(tuple, con.sql(ORACLES[name]).fetchall()))
    assert got == want
    assert got, f"{name}: empty result"


def test_cagra_extend_fixed_gate_matches_oracle(spark):
    _oracle_compare(spark, "cagra_extend_fixed")


def test_tiered_compaction_gate_matches_oracle(spark):
    _oracle_compare(spark, "tiered_compaction_search")


# --- 4. r12 gate candidate proven without a registry slot ------------------

def test_ivf_trained_search_matches_composed_sql(spark):
    """The TRAINED coarse quantizer end to end, value-hash-exact: a
    reproducible chained-Lloyd fit (fixed init, tol=0, expr updates,
    per-iteration centroid_round — the driver-proven
    kmeans_fit_centroids recipe) feeds ivf_flat_build/search, and the
    DuckDB twin composes O.kmeans_fit_cent_sql (the fit chain's
    centroid TABLE, narrowed to float32 exactly as the Spark operators'
    array<float> hand-off narrows it) into O.ivf_flat_search_sql as a
    trained cent_sql. Converts ivf_flat_search_trained's class from
    rows-only to hash-exact — the r12 gate candidate, proven here
    without spending a registry slot (the r11 window is packed)."""
    from cuvs_spark.cluster import kmeans_fit
    from cuvs_spark.entry_queries import (_fixed_centroids, emb_dataset,
                                          emb_queries)
    from cuvs_spark.operators.ivf_flat import ivf_flat_build, ivf_flat_search
    from cuvs_spark.plans import oracle as O

    n_lists, iters, k, probes = 16, 2, 10, 4
    d = emb_dataset(spark, SF_TINY)
    model = kmeans_fit(d, n_lists, max_iter=iters, tol=0.0,
                       init=_fixed_centroids(spark, SF_TINY, n_lists),
                       update_method="expr", centroid_round=6)
    idx = ivf_flat_build(d, n_lists, centroids=model.centroids)
    q = emb_queries(spark, SF_TINY, 20)
    got = sorted(map(tuple, ivf_flat_search(idx, q, k, probes,
                                            qvec_col="qv").collect()))

    cent = O.kmeans_fit_cent_sql(
        "SELECT vec_id AS id, embedding AS dv FROM embeddings",
        "SELECT vec_id AS label, embedding AS cv FROM embeddings "
        f"WHERE vec_id < {n_lists}", iters)
    sql = O.ivf_flat_search_sql(
        "SELECT vec_id AS id, embedding AS dv FROM embeddings",
        "SELECT vec_id AS qid, embedding AS qv FROM embeddings "
        "WHERE vec_id < 20",
        cent, k, probes)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_TINY}/embeddings.parquet'")
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert len(got) == 20 * k


def test_cagra_ace_matches_composed_sql(spark):
    """The ACE partitioned spill build, rows-only → hash-exact: with
    fixed partitioner AND builder centroids (the new centroids= /
    builder_centroids= hooks), cagra_build_ace is a composition of
    driver-proven templates — overlap partition assign, per-shard
    all_neighbors + optimize, spill round-trip, min-union merge +
    optimize — reproduced by G.cagra_ace_sql. An r12 gate candidate."""
    from cuvs_spark.entry_queries import _fixed_centroids, emb_dataset

    npart, deg = 4, 6
    d = emb_dataset(spark, SF_TINY)
    pc = _fixed_centroids(spark, SF_TINY, npart)
    bc = _fixed_centroids(spark, SF_TINY, 8)
    got = sorted(map(tuple, G.cagra_build_ace(
        d, deg, npartitions=npart, overlap_factor=2,
        centroids=pc, builder_centroids=bc).collect()))

    sql = G.cagra_ace_sql(
        "SELECT vec_id AS id, embedding AS dv FROM embeddings",
        "SELECT vec_id AS part, embedding AS cv FROM embeddings "
        f"WHERE vec_id < {npart}",
        "SELECT vec_id AS label, embedding AS cv FROM embeddings "
        "WHERE vec_id < 8",
        deg, npartitions=npart, overlap_factor=2)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_TINY}/embeddings.parquet'")
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    assert got


def test_pca_power_fit_matches_unrolled_sql(spark):
    """The eigensolver family's rows-only → hash-exact conversion path
    (the LAST family without one): fixed-iteration power iteration with
    Rayleigh deflation over ONCE-QUANTIZED exact-integer moments (the
    per-step-ROUND chained-Lloyd recipe is explicitly rejected here —
    pca.py documents observed 6-dp cross-engine flips when chained
    decimal-grid products land on round-off midpoints) from a
    deterministic integer-arithmetic init, vs the unrolled DuckDB twin
    pca_power_sql. An r12/r13 gate candidate, proven here without
    spending a registry slot (the r11 window is packed)."""
    from cuvs_spark.entry_queries import emb_dataset
    from cuvs_spark.preprocessing.pca import pca_power_fit, pca_power_sql

    d = emb_dataset(spark, SF_TINY)
    got = sorted(map(tuple, pca_power_fit(d, 2, 3).collect()))
    sql = pca_power_sql(
        "SELECT vec_id AS id, embedding AS dv FROM embeddings", 2, 3)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_TINY}/embeddings.parquet'")
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want
    dim = len(d.select("vec").head()["vec"])
    assert len(got) == 2 * (dim + 1)   # per component: dim entries + λ


def test_pca_power_converges_to_planted_component(spark):
    """Numerical sanity for the power path itself: on a rank-1 spike +
    small noise, the iterated vector aligns with the planted direction
    and the Rayleigh row (dim = -1) approaches the top eigenvalue of
    the exact NumPy covariance."""
    import numpy as np
    rng = np.random.default_rng(5)
    direction = rng.normal(size=16)
    direction /= np.linalg.norm(direction)
    X = (rng.normal(size=(300, 1)) * 3.0) @ direction[None, :] \
        + rng.normal(size=(300, 16)) * 0.05
    d = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id long, vec array<float>")
    from cuvs_spark.preprocessing.pca import pca_power_fit
    rows = pca_power_fit(d, 1, 8).collect()
    v = np.zeros(16)
    lam = None
    for r in rows:
        if r["dim"] == -1:
            lam = r["val"]
        else:
            v[r["dim"]] = r["val"]
    cov = np.cov(np.asarray(X, np.float64).T, bias=True)
    top = np.linalg.eigh(cov)[0][-1]
    assert abs(np.dot(v, direction)) > 0.99
    assert abs(lam - top) < 0.02 * top


def test_spectral_power_embed_matches_unrolled_sql(spark):
    """The spectral half of the eigensolver conversion: fixed-iteration
    power iteration on M = I + D^{-1/2}AD^{-1/2} of the kNN
    connectivity graph, analytic-trivial-vector deflation, exact
    integer state — vs the unrolled DuckDB twin spectral_power_sql
    composed over the driver-proven kNN-graph template. With this and
    pca_power_*, every rows-only family has a test-proven hash-exact
    path."""
    from cuvs_spark.cluster.spectral import (spectral_power_embed,
                                             spectral_power_sql)
    from cuvs_spark.entry_queries import emb_dataset
    from cuvs_spark.operators import knn_self
    from cuvs_spark.plans import oracle as O

    d = emb_dataset(spark, SF_TINY)
    g = knn_self(d, 8).select(F.col("qid").alias("src"),
                              F.col("nid").alias("dst"))
    dist = O.distance_sql_duckdb("sqeuclidean", "a.embedding",
                                 "b.embedding")
    edges_sql = f"""
SELECT src, dst FROM (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {dist} ASC, b.vec_id ASC) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
) WHERE rn <= 8"""
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_TINY}/embeddings.parquet'")
    sql = spectral_power_sql(edges_sql, 2, 3)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    for rep in range(2):
        got = sorted(map(tuple, spectral_power_embed(g, 2, 3).collect()))
        assert got == want, rep
    n = d.count()
    assert len(want) == 2 * (n + 1)


def test_spectral_power_fiedler_splits_planted_clusters(spark):
    """Numerical sanity: on two well-separated blobs, component 0 (the
    Fiedler vector of the kNN graph) signs the two clusters apart, and
    its Laplacian eigenvalue is near zero."""
    import numpy as np
    from cuvs_spark.cluster.spectral import spectral_power_embed
    from cuvs_spark.operators import knn_self

    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.3, size=(60, 6))
    b = rng.normal(4.0, 0.3, size=(60, 6))
    X = np.vstack([a, b])
    d = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(X)],
        "id long, vec array<float>")
    g = knn_self(d, 6).select(F.col("qid").alias("src"),
                              F.col("nid").alias("dst"))
    rows = spectral_power_embed(g, 1, 20).collect()
    vals = np.zeros(120)
    lam = None
    for r in rows:
        if r["i"] == -1:
            lam = r["val"]
        else:
            vals[r["i"]] = r["val"]
    member = np.array([0] * 60 + [1] * 60)
    side = (vals > 0).astype(int)
    agree = max((side == member).mean(), (side != member).mean())
    assert agree > 0.95
    assert 0.0 <= lam < 0.2


def test_single_linkage_matches_recursive_kruskal_sql(spark):
    """The dendrogram family's rows-only → hash-exact conversion, the
    second r12 gate candidate: at gate scale (n <= finish_components)
    single_linkage is exactly Kruskal over the directed kNN edges in
    (distance, src, dst) order with an early-stopped cut, and
    single_linkage_sql reproduces that as one recursive CTE carrying a
    flat union-find. Exercised at two cuts plus a
    disconnected-graph-shaped tiny k."""
    from cuvs_spark.cluster.agglomerative import (single_linkage,
                                                  single_linkage_sql)
    from cuvs_spark.entry_queries import emb_dataset

    n_rows = 200
    d = emb_dataset(spark, SF_TINY).filter(F.col("id") < n_rows)
    d_sql = ("SELECT vec_id AS nid, embedding AS dv FROM embeddings "
             f"WHERE vec_id < {n_rows}")
    q_sql = ("SELECT vec_id AS qid, embedding AS qv FROM embeddings "
             f"WHERE vec_id < {n_rows}")
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_TINY}/embeddings.parquet'")
    for n_clusters, k in [(10, 10), (3, 8), (25, 2)]:
        got = sorted(map(tuple,
                         single_linkage(d, n_clusters, k=k).collect()))
        sql = single_linkage_sql(d_sql, q_sql, n_clusters, k,
                                 n_rows=n_rows)
        want = sorted(map(tuple, con.sql(sql).fetchall()))
        assert got == want, (n_clusters, k)
        assert len(got) == n_rows

