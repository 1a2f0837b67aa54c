"""Round-8 fourth-wave tests: triangle census, Kendall rank
agreement, IVF list-size audit, tokenizer fertility."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_triangle_stats_hand_graph(spark):
    """Mutual triangle 0-1-2 plus a mutual pendant edge 2-3 and a
    one-way edge 3-4 (dropped by mutualization): 4 mutual edges,
    degrees (2,2,3,1) → 1+1+3+0 = 5 wedges, 1 triangle, cc = 3/5."""
    from cuvs_spark.operators.graph import triangle_stats
    und = [(0, 1), (0, 2), (1, 2), (2, 3)]
    edges = und + [(b, a) for a, b in und] + [(3, 4)]
    g = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_stats(g).collect()[0]
    assert row.n_mutual_edges == 4
    assert row.n_wedges == 5
    assert row.n_triangles == 1
    assert row.clustering_coeff == 3.0 / 5.0


def test_triangle_stats_triangle_free(spark):
    """A mutual 4-cycle has 4 wedges and no triangle → cc 0.0."""
    from cuvs_spark.operators.graph import triangle_stats
    und = [(0, 1), (1, 2), (2, 3), (0, 3)]
    edges = und + [(b, a) for a, b in und]
    g = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_stats(g).collect()[0]
    assert row.n_triangles == 0 and row.clustering_coeff == 0.0
    assert row.n_wedges == 4


def test_triangle_stats_duckdb_twin(spark, rng):
    import duckdb
    from cuvs_spark.operators.graph import triangle_stats, triangle_stats_sql
    edges = list({(int(rng.integers(0, 20)), int(rng.integers(0, 20)))
                  for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    g = spark.createDataFrame(edges, "src long, dst long")
    got = triangle_stats(g).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_t VALUES (?, ?)", edges)
    want = con.sql(
        triangle_stats_sql("SELECT src, dst FROM edges_t")).fetchone()
    assert tuple(got) == tuple(want)


def test_kendall_perfect_reversed_disjoint(spark):
    from cuvs_spark.stats.metrics import kendall_rank_agreement

    def ranks(items):
        return spark.createDataFrame(
            [(0, n, r) for r, n in enumerate(items, 1)],
            "qid long, nid long, rank long")

    same = kendall_rank_agreement(ranks([5, 6, 7]),
                                  ranks([5, 6, 7])).collect()[0]
    assert same.tau == 1.0 and same.n_pairs == 3
    rev = kendall_rank_agreement(ranks([5, 6, 7]),
                                 ranks([7, 6, 5])).collect()[0]
    assert rev.tau == -1.0
    # disjoint candidate sets: no common items, tau 0.0 null-free
    dis = kendall_rank_agreement(ranks([1, 2]),
                                 ranks([8, 9])).collect()[0]
    assert dis.n_items == 0 and dis.n_pairs == 0 and dis.tau == 0.0


def test_kendall_partial_agreement_exact(spark):
    """Rankings a=(1,2,3,4), b=(2,1,3,4) over the same items: one
    discordant pair of six → τ = (5−1)/6 = 2/3 exactly."""
    from cuvs_spark.stats.metrics import kendall_rank_agreement
    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2), (0, 12, 3),
                               (0, 13, 4)], "qid long, nid long, rank long")
    b = spark.createDataFrame([(0, 10, 2), (0, 11, 1), (0, 12, 3),
                               (0, 13, 4)], "qid long, nid long, rank long")
    row = kendall_rank_agreement(a, b).collect()[0]
    assert (row.concordant, row.discordant) == (5, 1)
    assert row.tau == (5 - 1) / 6


def test_ivf_list_sizes_includes_empty_lists(spark):
    """Centroids far from all data leave empty lists that must report
    0, and sizes must sum to the dataset size."""
    import numpy as np
    from cuvs_spark.operators.ivf_flat import ivf_flat_build, ivf_list_sizes
    rows = [(i, [float(i % 2), 0.0]) for i in range(20)]
    d = spark.createDataFrame(rows, "id long, vec array<float>")
    cents = np.array([[0.0, 0.0], [1.0, 0.0], [100.0, 100.0]])
    idx = ivf_flat_build(d, 3, centroids=cents)
    got = {r.list_id: r.list_size for r in ivf_list_sizes(idx).collect()}
    assert got == {0: 10, 1: 10, 2: 0}


def test_fertility_by_group_exact(spark):
    from cuvs_spark.pipeline.text import fertility_by_group
    docs = [("en", "one two three"), ("en", "four"),
            ("zh", "漢字漢字漢字漢字"), ("empty", "")]
    d = spark.createDataFrame(docs, "lang string, text string")
    got = {r.lang: r for r in fertility_by_group(d).collect()}
    assert got["en"].n_docs == 2 and got["en"].n_tokens == 4
    assert got["en"].n_chars == len("one two three") + len("four")
    assert got["en"].chars_per_token == got["en"].n_chars / 4
    assert got["zh"].n_tokens == 1 and got["zh"].n_chars == 8
    assert got["zh"].chars_per_token == 8.0
    assert got["empty"].n_tokens == 0
    assert got["empty"].chars_per_token == 0.0


def test_fertility_duckdb_twin(spark):
    import duckdb
    from cuvs_spark.pipeline.text import (
        fertility_by_group,
        fertility_by_group_sql,
    )
    docs = [(f"l{i % 3}", " ".join(f"w{j}" for j in range(i + 1)))
            for i in range(12)]
    d = spark.createDataFrame(docs, "lang string, text string")
    got = sorted(tuple(r) for r in fertility_by_group(d).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = sorted(tuple(r) for r in con.sql(fertility_by_group_sql(
        "SELECT lang, text FROM documents")).fetchall())
    assert got == want
