"""Vamana robust-prune tests — alpha-RNG invariants (``vamana.pyx:58-120``
pruning semantics) and graph navigability via beam search recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import knn, knn_self, robust_prune, vamana_build

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


def test_robust_prune_invariants(spark, emb):
    """Degree cap holds; every pruned-out candidate is alpha-covered by
    a kept one; alpha=1 keeps at most as many edges as alpha=1.2 (larger
    alpha prunes less)."""
    small = emb.filter(F.col("id") < 120).cache()
    base = knn_self(small, 12).select(F.col("qid").alias("src"),
                                      F.col("nid").alias("dst"), "distance")
    g = robust_prune(base, small, 6, 1.2, visited_size=12).cache()
    deg = g.groupBy("src").count().agg(F.max("count")).head()[0]
    assert deg <= 6
    assert g.select("src").distinct().count() == 120

    # NumPy re-check of the greedy on a few nodes
    X = {r["id"]: np.array(r["vec"], float) for r in small.collect()}
    base_rows = base.collect()
    kept = {}
    for r in g.collect():
        kept.setdefault(r["src"], []).append((r["rank"], r["dst"]))
    for src in list(kept)[:10]:
        cands = sorted((r["distance"], r["dst"]) for r in base_rows
                       if r["src"] == src)[:12]
        exp, exp_ids = [], []
        for d_, j in cands:
            if len(exp) >= 6:
                break
            if all(1.2 * ((X[kj] - X[j]) ** 2).sum() > d_ for kj in exp_ids):
                exp.append((len(exp) + 1, j))
                exp_ids.append(j)
        assert sorted(kept[src]) == exp, src

    g1 = robust_prune(base, small, 6, 1.0, visited_size=12)
    assert g1.count() <= g.count()


def test_vamana_graph_navigable(spark, emb):
    """A Vamana graph must stay navigable: beam search over it reaches
    the reference 0.7 recall floor (the point of alpha-pruning is
    keeping long-range detour edges)."""
    from cuvs_spark.operators.graph import cagra_search
    d = emb.limit(300).cache()
    g = vamana_build(d, 8, visited_size=16, n_clusters=4, overlap_factor=2,
                     kmeans_n_iters=4)
    q = (emb.filter(F.col("id") < 10)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    exact = knn(d, q, 5, "sqeuclidean", qvec_col="qv")
    ann = cagra_search(g, d, q, 5, itopk=24, search_width=6,
                       max_iterations=4, qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in ann.select("qid", "nid").collect()}
    e = {(r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()}
    assert len(a & e) / len(e) >= 0.7


def test_vamana_diskann_binary_roundtrip(spark, vectors_df, tmp_path):
    """vamana.save binary emit (vamana_serialize.cuh formats): both the
    MSFT DiskANN OSS mem-index and the 4096-byte sector-aligned disk
    index must round-trip adjacency, coords, and metadata exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    from cuvs_spark.operators.graph import all_neighbors_build
    from cuvs_spark.sources.graph_export import (read_diskann_disk_index,
                                                 read_diskann_index,
                                                 vamana_save_diskann)

    g = all_neighbors_build(vectors_df, 6, n_clusters=2, overlap_factor=2,
                            kmeans_n_iters=2).drop("rank")
    base = str(tmp_path / "vamana_idx")
    meta = vamana_save_diskann(g, vectors_df, base)
    rmeta, nbrs, data = read_diskann_index(base)
    n = vectors_df.count()
    assert len(nbrs) == n
    assert rmeta["max_degree"] == meta["max_degree"] == 6
    assert rmeta["start"] == meta["medoid"]
    assert rmeta["index_size"] == meta["index_size"]
    assert data.shape == (n, 8)

    # adjacency content: node 0's neighbors = its 6 nearest by the graph
    want = {r["src"]: [d for d in r["nbrs"]] for r in
            g.groupBy("src").agg(
                F.expr("transform(array_sort(collect_list("
                       "struct(distance, dst))), x -> x.dst)").alias("nbrs"))
            .collect()}
    for src, lst in want.items():
        assert list(nbrs[src]) == lst  # ids are already 0..n-1 here

    smeta = vamana_save_diskann(g, vectors_df, base, sector_aligned=True)
    dmeta, dnbrs, ddata = read_diskann_disk_index(base + "_disk.index")
    assert dmeta["npts"] == n and dmeta["ndims"] == 8
    assert dmeta["medoid"] == meta["medoid"]
    assert dmeta["max_node_len"] == (6 + 1) * 4 + 8 * 4
    assert dmeta["file_size"] % 4096 == 0
    for src, lst in want.items():
        assert list(dnbrs[src]) == lst
    assert np.allclose(ddata, data)
