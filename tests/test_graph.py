"""Graph builder/search quality — recall thresholds vs exact kNN,
mirroring the reference's ann_cagra/ann_nn_descent test criteria
(recall ≥ 0.7-0.9, ``ann_utils.py:130``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import knn, knn_self
from cuvs_spark.operators.graph import (
    all_neighbors_build,
    cagra_build,
    cagra_optimize,
    cagra_search,
    nn_descent_build,
)

SF = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .limit(200)
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


@pytest.fixture(scope="module")
def exact_graph(emb):
    return knn_self(emb, K).cache()


@pytest.fixture(scope="module")
def cagra_graph_844(emb):
    """The (graph_degree=8, n_clusters=4, overlap_factor=2,
    kmeans_n_iters=4) CAGRA graph over ``emb`` — built identically
    (and deterministically: seeded kmeans, exact folds) by BOTH
    test_cagra_search_recall and test_cagra_vpq_compressed_search_recall
    before r15; shared module-scoped so the suite pays the iterative
    build once (r15, the VERDICT item-7 fixture-scope class — the
    assertions of both tests are unchanged)."""
    return cagra_build(emb, graph_degree=8, n_clusters=4,
                       overlap_factor=2, kmeans_n_iters=4)



@pytest.fixture(scope="module")
def hnsw_layers_m4(vectors_df):
    """The (graph_degree=8, hierarchy='multi', M=4) HNSW index over
    ``vectors_df`` — built identically (deterministic layer draw) by
    THREE tests before r15 (hierarchy_layers_and_search, the hnswlib
    binary roundtrip, hnswlib load-back); shared module-scoped so the
    suite pays the layered build once (r15 fixture-scope class;
    assertions unchanged)."""
    from cuvs_spark.sources.graph_export import hnsw_build
    return hnsw_build(vectors_df, graph_degree=8, hierarchy="multi",
                      M=4).cache()


def graph_recall(approx, exact):
    a = {(r["src"], r["dst"]) for r in approx.select(
        F.col("src"), F.col("dst")).collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    return len(a & e) / len(e)


def test_all_neighbors_recall(emb, exact_graph):
    g = all_neighbors_build(emb, K, n_clusters=6, overlap_factor=3,
                            kmeans_n_iters=4)
    r = graph_recall(g, exact_graph)
    assert r >= 0.8, r


def test_nn_descent_recall(emb, exact_graph):
    g = nn_descent_build(emb, K, max_iterations=5)
    r = graph_recall(g, exact_graph)
    assert r >= 0.8, r


def test_cagra_optimize_properties(emb, exact_graph):
    g = cagra_optimize(exact_graph.select(
        F.col("qid").alias("src"), F.col("nid").alias("dst"), "distance"),
        graph_degree=6)
    per_src = g.groupBy("src").count().collect()
    assert all(r["count"] <= 6 for r in per_src)
    # reverse edges added: union graph should be "more symmetric" than input
    e = {(r["src"], r["dst"]) for r in g.select("src", "dst").collect()}
    sym = sum((b, a) in e for (a, b) in e) / len(e)
    assert sym > 0.5


def test_cagra_search_recall(spark, emb, exact_graph, cagra_graph_844):
    graph = cagra_graph_844
    q = (emb.filter(F.col("id") < 20)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    exact = knn(emb, q, 5, "sqeuclidean", qvec_col="qv")
    got = cagra_search(graph, emb, q, 5, itopk=24, search_width=6,
                       max_iterations=6, qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    r = len(a & e) / len(e)
    assert r >= 0.8, r


def test_cagra_extend_matches_rebuild(spark, emb):
    """``cagra.extend``: splicing a held-out batch into a built graph
    must search as well as the graph rebuilt from scratch (within the
    reference's recall tolerance)."""
    from cuvs_spark.operators.graph import cagra_extend
    old = emb.filter(F.col("id") >= 50).cache()
    new = emb.filter(F.col("id") < 50).cache()
    g_old = cagra_build(old, graph_degree=8, n_clusters=4,
                        overlap_factor=2, kmeans_n_iters=4)
    g_ext, d_ext = cagra_extend(g_old, old, new, 8)
    assert d_ext.count() == emb.count()
    # new ids now have out-edges, bounded by graph_degree
    deg = (g_ext.filter(F.col("src") < 50).groupBy("src").count())
    assert deg.count() == 50
    assert deg.agg(F.max("count")).head()[0] <= 8
    q = (emb.filter(F.col("id") < 20)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    exact = knn(emb, q, 5, "sqeuclidean", qvec_col="qv")
    got = cagra_search(g_ext, d_ext, q, 5, itopk=24, search_width=6,
                       max_iterations=6, qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    r = len(a & e) / len(e)
    assert r >= 0.7, r


def test_cagra_vpq_compressed_search_recall(spark, emb, cagra_graph_844):
    """VPQ compression + refinement_rate (``cagra.pyx:50-124,286``;
    ``common.hpp:411 vpq_dataset``): beam search over decoded codes with
    a 2× exact re-rank must keep recall ≥ 0.9 of the uncompressed
    search's ground truth (the reference's vpq test criterion,
    ``ann_cagra/test_float_uint32_t.cu`` vpq cases)."""
    from cuvs_spark.operators.graph import (cagra_compress,
                                            cagra_search_compressed)
    graph = cagra_graph_844
    codes, cb = cagra_compress(emb, pq_dim=16, pq_bits=6, seed=3)
    q = (emb.filter(F.col("id") < 20)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    exact = knn(emb, q, 5, "sqeuclidean", qvec_col="qv")
    got = cagra_search_compressed(graph, codes, cb, q, 5,
                                  refinement_rate=2.0, dataset=emb,
                                  itopk=24, search_width=6,
                                  max_iterations=6, qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    r = len(a & e) / len(e)
    assert r >= 0.9, r
    # storage shape: codes are pq_dim ints per row, not dim floats
    row = codes.limit(1).collect()[0]
    assert len(row["codes"]) == 16
    # refinement_rate > 1 WITHOUT a dataset: no exact re-rank possible,
    # but the requested k must still be honored (truncated approx pool)
    no_ds = cagra_search_compressed(graph, codes, cb, q, 5,
                                    refinement_rate=2.0, dataset=None,
                                    itopk=24, search_width=6,
                                    max_iterations=6, qvec_col="qv")
    per_q = no_ds.groupBy("qid").count().collect()
    assert per_q and all(r["count"] == 5 for r in per_q)


def test_cagra_build_ace_recall(spark, emb, tmp_path):
    """ACE partitioned build (``cagra.pyx:127-175``): per-shard graphs
    spill to disk, merge + optimize; search recall must match the
    single-shot build's threshold."""
    from cuvs_spark.operators.graph import cagra_build_ace
    spill = str(tmp_path / "ace_spill")
    graph = cagra_build_ace(emb, graph_degree=8, npartitions=3,
                            spill_dir=spill, overlap_factor=2,
                            n_clusters=2)
    import os
    assert sorted(os.listdir(spill)) == ["part=0", "part=1", "part=2"]
    per_src = graph.groupBy("src").count().collect()
    assert all(r["count"] <= 8 for r in per_src)
    q = (emb.filter(F.col("id") < 20)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    exact = knn(emb, q, 5, "sqeuclidean", qvec_col="qv")
    got = cagra_search(graph, emb, q, 5, itopk=24, search_width=6,
                       max_iterations=6, qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    assert len(a & e) / len(e) >= 0.75


def test_hnsw_build_search_recall(spark, emb):
    """hnsw.pyx:472,648 — flat-hierarchy build via CAGRA + base-layer
    beam search with pool size ef."""
    from cuvs_spark.operators import knn
    from cuvs_spark.sources.graph_export import hnsw_build, hnsw_search

    layers = hnsw_build(emb, graph_degree=8, n_clusters=4,
                        overlap_factor=2, kmeans_n_iters=4)
    assert layers.select("layer").distinct().collect() == [(0,)] or \
        [r["layer"] for r in layers.select("layer").distinct().collect()] == [0]
    q = (emb.filter(F.col("id") < 20)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got = hnsw_search(layers, emb, q, 5, ef=24, qvec_col="qv")
    exact = knn(emb, q, 5, "sqeuclidean", qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    assert len(a & e) / len(e) >= 0.8


def test_hnsw_extend_matches_flat_semantics(spark, emb):
    """hnsw.pyx:561 — extending the flat view splices new ids into the
    base layer with bounded degree, and search still works."""
    from cuvs_spark.sources.graph_export import hnsw_build, hnsw_extend

    old = emb.filter(F.col("id") >= 50).cache()
    new = emb.filter(F.col("id") < 50).cache()
    layers = hnsw_build(old, graph_degree=8, n_clusters=4,
                        overlap_factor=2, kmeans_n_iters=4)
    l2, d2 = hnsw_extend(layers, old, new, 8)
    assert d2.count() == emb.count()
    got = l2.filter(F.col("src") < 50)
    assert got.count() == 50
    assert got.agg(F.max(F.size("neighbors"))).head()[0] <= 8


def test_cagra_filtered_search(spark, vectors_df, queries_df):
    """Filtered CAGRA search: traversal unfiltered, results filtered —
    every returned id satisfies the filter, and recall vs the filtered
    exact answer stays high with a deepened pool."""
    from pyspark.sql import functions as F

    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.graph import cagra_build, cagra_search
    g = cagra_build(vectors_df, 16)
    allowed = vectors_df.filter(F.col("id") % 3 != 0).select("id")
    res = cagra_search(g, vectors_df, queries_df, 5, itopk=48,
                       max_iterations=8, prefilter=allowed)
    rows = res.collect()
    assert rows and all(r["nid"] % 3 != 0 for r in rows)
    exact = knn(vectors_df.filter(F.col("id") % 3 != 0), queries_df, 5,
                "sqeuclidean")
    hits = (res.select("qid", "nid")
            .join(exact.select("qid", "nid"), ["qid", "nid"], "left_semi")
            .count())
    assert hits / exact.count() >= 0.8


def test_cagra_iterative_build_improves_recall(spark, vectors_df):
    """build_algo='iterative_cagra_search' analog: self-search refinement
    must raise edge recall over the bucketed pseudo-random seed."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.graph import cagra_build_iterative
    from pyspark.sql import functions as F

    deg = 8
    q = vectors_df.select(F.col("id").alias("qid"),
                          F.col("vec").alias("qv"))
    exact = (knn(vectors_df, q, deg + 1, "sqeuclidean", qvec_col="qv")
             .filter(F.col("qid") != F.col("nid"))
             .select(F.col("qid").alias("src"), F.col("nid").alias("dst")))
    truth = {(r["src"], r["dst"]) for r in exact.collect()}

    def edge_recall(g):
        got = {(r["src"], r["dst"]) for r in g.select("src", "dst").collect()}
        return len(got & truth) / len(truth)

    seed = cagra_build_iterative(vectors_df, deg, n_iters=0)
    refined = cagra_build_iterative(vectors_df, deg, n_iters=2)
    r0, r2 = edge_recall(seed), edge_recall(refined)
    assert r2 > r0
    assert r2 >= 0.55, (r0, r2)


def test_hnsw_hierarchy_layers_and_search(spark, vectors_df, hnsw_layers_m4):
    """hierarchy='cpu' analog: geometric layer sizes, nested subsets,
    and the layer-descent search must match flat-search quality."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.sources.graph_export import hnsw_build, hnsw_search
    from pyspark.sql import functions as F

    layers = hnsw_layers_m4
    # the index carries its M parameter in-band (layer = -1 row)
    meta = layers.filter(F.col("layer") == -1).collect()
    assert len(meta) == 1 and meta[0]["src"] == 4
    sizes = {r["layer"]: r["n"] for r in
             layers.filter(F.col("layer") >= 0).groupBy("layer")
             .agg(F.count("*").alias("n")).collect()}
    assert sizes[0] == 100
    assert 1 in sizes and sizes[1] < sizes[0]
    # nested: every node at layer l is present at every lower layer
    for lvl in sorted(sizes)[1:]:
        above = {r["src"] for r in
                 layers.filter(F.col("layer") == lvl).collect()}
        below = {r["src"] for r in
                 layers.filter(F.col("layer") == lvl - 1).collect()}
        assert above <= below

    q = (vectors_df.filter(F.col("id") < 10)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got = hnsw_search(layers, vectors_df, q, 5, ef=24, qvec_col="qv")
    exact = knn(vectors_df, q, 5, "sqeuclidean", qvec_col="qv")
    g = {(r["qid"], r["nid"]) for r in got.collect()}
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    assert len(g & e) / len(e) >= 0.8


def test_hnsw_extend_preserves_hierarchy(spark, vectors_df):
    from cuvs_spark.sources.graph_export import (hnsw_build, hnsw_extend,
                                                 hnsw_search)
    from pyspark.sql import functions as F

    old = vectors_df.filter(F.col("id") < 80)
    new = vectors_df.filter(F.col("id") >= 80)
    layers = hnsw_build(old, graph_degree=8, hierarchy="multi", M=4)
    layers2, d2 = hnsw_extend(layers, old, new, 8)
    assert d2.count() == 100
    lv = {r["layer"] for r in layers2.select("layer").distinct().collect()}
    assert max(lv) >= 1, "upper layers must survive extend"
    # new-node queries must find themselves via the hierarchical
    # search (cagra_extend's degree re-bound can leave an occasional
    # in-degree-1 node that even flat search misses — same contract as
    # the flat extend recall tests: most, not all)
    q = (vectors_df.filter(F.col("id") >= 90)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got = hnsw_search(layers2, d2, q, 3, ef=24, qvec_col="qv")
    top1 = {r["qid"]: r["nid"] for r in
            got.filter(F.col("rank") == 1).collect()}
    self_found = sum(1 for qid in top1 if top1[qid] == qid)
    assert self_found >= 8, top1


def test_hnswlib_binary_roundtrip(spark, vectors_df, tmp_path, hnsw_layers_m4):
    """hnsw.save binary emit in hnswlib's own serialization
    (hnsw.pyx:317 / hnswlib HierarchicalNSW::saveIndex layout): header,
    level-0 links+data+labels, and upper-level link lists must all
    round-trip exactly, and node levels/entry point must match the
    layered index."""
    import numpy as np
    from pyspark.sql import functions as F

    from cuvs_spark.sources.graph_export import (hnsw_build,
                                                 hnsw_save_hnswlib,
                                                 read_hnswlib_index)

    layers = hnsw_layers_m4
    path = str(tmp_path / "idx.hnswlib")
    meta = hnsw_save_hnswlib(layers, vectors_df, path, ef_construction=120)
    rmeta, level0, upper, data, labels = read_hnswlib_index(path)

    n = vectors_df.count()
    assert rmeta["npts"] == meta["npts"] == n
    assert rmeta["ndims"] == 8
    assert rmeta["M"] == 4  # from the layer=-1 metadata row
    assert rmeta["maxlevel"] == meta["maxlevel"] >= 1
    assert rmeta["enterpoint"] == meta["enterpoint"]
    assert rmeta["ef_construction"] == 120
    assert abs(rmeta["mult"] - 1.0 / np.log(4)) < 1e-12

    # labels are the original row ids, data rows are the vectors
    rows = vectors_df.select(F.col("id").cast("long"), "vec") \
        .orderBy("id").collect()
    assert labels == [r["id"] for r in rows]
    assert np.allclose(data, np.array([r["vec"] for r in rows],
                                      dtype=np.float32))

    # level-0 adjacency matches the layered index exactly
    want0 = {r["src"]: list(r["neighbors"]) for r in
             layers.filter(F.col("layer") == 0).collect()}
    pos = {r["id"]: i for i, r in enumerate(rows)}
    for src, nbrs in want0.items():
        assert list(level0[pos[src]]) == [pos[d] for d in nbrs]

    # upper layers: every stored link list matches, and each node's
    # level (count of link blocks) equals its highest layer
    want_lvl = {}
    for r in layers.filter(F.col("layer") > 0).collect():
        p = pos[r["src"]]
        want_lvl[p] = max(want_lvl.get(p, 0), r["layer"])
        assert upper[r["layer"]][p] == [pos[d] for d in r["neighbors"]]
    for p, lvl in want_lvl.items():
        assert all(p in upper[li] for li in range(1, lvl + 1))

    # entry point = smallest id in the top layer (hnsw_search contract)
    top = max(want_lvl.values())
    entry_id = min(r["src"] for r in
                   layers.filter(F.col("layer") == top).collect())
    assert rmeta["enterpoint"] == pos[entry_id]


def test_hnswlib_load_back_to_layers(spark, vectors_df, tmp_path, hnsw_layers_m4):
    """hnsw.load direction: an hnswlib file parsed back into the
    layered view must search identically to the index it was saved
    from (hnsw.pyx:317 save→load→serve contract)."""
    from pyspark.sql import functions as F

    from cuvs_spark.sources.graph_export import (hnsw_build,
                                                 hnsw_load_hnswlib,
                                                 hnsw_save_hnswlib,
                                                 hnsw_search)

    layers = hnsw_layers_m4
    path = str(tmp_path / "idx.hnswlib")
    hnsw_save_hnswlib(layers, vectors_df, path)
    l2, d2 = hnsw_load_hnswlib(spark, path)

    # adjacency identical per (layer, src), M metadata preserved
    a = {(r["layer"], r["src"]): list(r["neighbors"])
         for r in layers.filter(F.col("layer") >= 0).collect()}
    b = {(r["layer"], r["src"]): list(r["neighbors"])
         for r in l2.filter(F.col("layer") >= 0).collect()}
    assert a == b
    assert l2.filter(F.col("layer") == -1).head()["src"] == 4

    q = (vectors_df.filter(F.col("id") < 10)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got1 = sorted(map(tuple, hnsw_search(layers, vectors_df, q, 5, ef=24,
                                         qvec_col="qv")
                      .select("qid", "nid", "rank").collect()))
    got2 = sorted(map(tuple, hnsw_search(l2, d2, q, 5, ef=24,
                                         qvec_col="qv")
                      .select("qid", "nid", "rank").collect()))
    assert got1 == got2


def test_hnsw_extend_rebuilds_hierarchy_from_meta_row(spark):
    """A multi-layer build whose small seed set drew no level>=1 nodes
    still carries the M metadata row; extend must use it to (re)build
    upper layers over the larger dataset instead of degrading flat."""
    import numpy as np
    from pyspark.sql import functions as F

    from cuvs_spark.sources.graph_export import hnsw_build, hnsw_extend

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)])
            for i in range(120)]
    all_df = spark.createDataFrame(rows, "id long, vec array<float>")
    # seed ids chosen so the (id, M=4) level hash gives all level-0:
    # scan for a 6-id window with no level>=1 draw
    from cuvs_spark.sources.graph_export import _hnsw_level_expr
    lv = spark.range(0, 120).select(
        F.col("id"), F.expr(_hnsw_level_expr("id", 4, 6)).alias("lvl")) \
        .collect()
    lvl = {r["id"]: r["lvl"] for r in lv}
    seed_ids = None
    for s in range(0, 114):
        win = list(range(s, s + 6))
        if all(lvl[i] == 0 for i in win):
            seed_ids = win
            break
    assert seed_ids is not None, "need a flat 6-id window for the test"
    seed = all_df.filter(F.col("id").isin(seed_ids))
    layers = hnsw_build(seed, graph_degree=4, hierarchy="multi", M=4)
    assert layers.filter(F.col("layer") > 0).isEmpty()
    assert layers.filter(F.col("layer") == -1).head()["src"] == 4

    new = all_df.filter(~F.col("id").isin(seed_ids))
    l2, d2 = hnsw_extend(layers, seed, new, 4)
    assert l2.filter(F.col("layer") == -1).head()["src"] == 4
    assert not l2.filter(F.col("layer") > 0).isEmpty(), \
        "120-node extend must have upper layers"
