"""Round-8 second-wave tests: graph symmetry/hubness audits, MAP@k,
and the isotropy cosine-pair histogram."""
from __future__ import annotations

from fractions import Fraction

import numpy as np
from pyspark.sql import functions as F


def test_reciprocal_rate_exact_counts(spark):
    """Hand-built graph: 2 of 5 directed edges are reciprocal."""
    from cuvs_spark.operators.graph import reciprocal_rate
    edges = [(0, 1), (1, 0), (0, 2), (2, 3), (3, 4)]
    g = spark.createDataFrame(edges, "src long, dst long")
    row = reciprocal_rate(g).collect()[0]
    assert row.n_edges == 5
    assert row.n_reciprocal == 2
    assert row.reciprocal_rate == 2.0 / 5.0


def test_reciprocal_rate_extremes(spark):
    from cuvs_spark.operators.graph import reciprocal_rate
    sym = spark.createDataFrame([(0, 1), (1, 0), (1, 2), (2, 1)],
                                "src long, dst long")
    assert reciprocal_rate(sym).collect()[0].reciprocal_rate == 1.0
    asym = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                                 "src long, dst long")
    assert reciprocal_rate(asym).collect()[0].reciprocal_rate == 0.0


def test_hubness_moments_vs_numpy(spark):
    """Integer moments and skewness match the NumPy formula on the
    full per-node in-degree vector (including degree-0 nodes)."""
    from cuvs_spark.stats.metrics import hubness_moments
    # node 3 is a hub (in-degree 3), node 0 unreachable (in-degree 0)
    edges = [(0, 3), (1, 3), (2, 3), (3, 1), (0, 2), (1, 2), (2, 1)]
    g = spark.createDataFrame(edges, "src long, dst long")
    row = hubness_moments(g).collect()[0]
    deg = np.array([0, 2, 2, 3], dtype=np.int64)   # nodes 0..3
    n = len(deg)
    s1, s2, s3 = deg.sum(), (deg**2).sum(), (deg**3).sum()
    assert row.n_nodes == n and row.sum_deg == s1
    m2 = n * s2 - s1 * s1
    m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
    assert row.m2_scaled == m2 and row.m3_scaled == m3
    mu = deg.mean()
    skew = ((deg - mu) ** 3).mean() / (deg.var() ** 1.5)
    assert abs(row.skewness - skew) < 1e-12


def test_hubness_zero_variance_is_zero_skew(spark):
    from cuvs_spark.stats.metrics import hubness_moments
    # perfect 1-regular graph: every node in-degree 1
    g = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                              "src long, dst long")
    row = hubness_moments(g).collect()[0]
    assert row.m2_scaled == 0 and row.skewness == 0.0


def test_map_score_hand_case(spark):
    """Two queries: q0 has relevant items at ranks 1 and 3 of 2
    relevant (AP = (1/1 + 2/3)/2 = 5/6); q1 misses both (AP = 0).
    MAP = 5/12 exactly."""
    from cuvs_spark.stats.metrics import map_score
    ann = spark.createDataFrame(
        [(0, 10, 1), (0, 99, 2), (0, 11, 3),
         (1, 98, 1), (1, 97, 2)],
        "qid long, nid long, rank long")
    truth = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 50), (1, 51)], "qid long, nid long")
    got = map_score(ann, truth).collect()[0]["map"]
    assert got == float(Fraction(5, 12))


def test_map_score_perfect_and_empty(spark):
    from cuvs_spark.stats.metrics import map_score
    ann = spark.createDataFrame([(0, 1, 1), (0, 2, 2)],
                                "qid long, nid long, rank long")
    truth = spark.createDataFrame([(0, 1), (0, 2)], "qid long, nid long")
    assert map_score(ann, truth).collect()[0]["map"] == 1.0
    empty = truth.filter(F.col("qid") < 0)
    assert map_score(ann, empty).collect()[0]["map"] == 0.0


def test_cosine_pair_histogram_identical_vectors(spark):
    """All-identical vectors: every pair lands in the top bin (15)
    and the pair count is sum over buckets of floor(count/2)."""
    from cuvs_spark.stats.metrics import cosine_pair_histogram
    n = 101   # odd: one leftover row must be dropped
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = cosine_pair_histogram(df, n_buckets=8).collect()
    by_bin = {r.bin: r.n_pairs for r in out}
    import collections
    per_bucket = collections.Counter(i % 8 for i in range(n))
    want_pairs = sum(c // 2 for c in per_bucket.values())
    assert set(by_bin) == {15}
    assert by_bin[15] == want_pairs


def test_cosine_pair_histogram_orthogonal_mix(spark):
    """Orthogonal unit vectors pair at cos 0 → bin 8; antipodal at
    cos −1 → bin 0."""
    from cuvs_spark.stats.metrics import cosine_pair_histogram
    # bucket 0 (ids 0, 8): orthogonal; bucket 1 (ids 1, 9): antipodal
    rows = [(0, [1.0, 0.0]), (8, [0.0, 1.0]),
            (1, [1.0, 0.0]), (9, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    by_bin = {r.bin: r.n_pairs
              for r in cosine_pair_histogram(df, n_buckets=8).collect()}
    assert by_bin == {8: 1, 0: 1}


def test_hubness_sql_twin_bit_parity(spark, rng):
    """hubness_moments vs its DuckDB twin on a random graph: every
    integer column equal, skewness bit-equal."""
    import duckdb
    from cuvs_spark.stats.metrics import hubness_moments, hubness_moments_sql
    edges = [(int(i), int(rng.integers(0, 40)))
             for i in range(40) for _ in range(5)]
    g = spark.createDataFrame(edges, "src long, dst long")
    got = hubness_moments(g).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = con.sql(hubness_moments_sql("SELECT src, dst FROM e")).fetchone()
    assert (got.n_nodes, got.sum_deg, got.m2_scaled, got.m3_scaled) == \
        tuple(want[:4])
    assert got.skewness == want[4]       # bit parity, not approx


def test_isotropy_sql_twin_bit_parity(spark, rng):
    """cosine_pair_histogram vs its DuckDB twin on random float32
    vectors: identical (bin, n_pairs) sets."""
    import duckdb
    from cuvs_spark.stats.metrics import (
        cosine_pair_histogram,
        cosine_pair_histogram_sql,
    )
    rows = [(i, [float(x) for x in
                 (rng.random(8).astype(np.float32) - 0.5)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    got = {(r.bin, r.n_pairs)
           for r in cosine_pair_histogram(df, n_buckets=8).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE v (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO v VALUES (?, ?)", rows)
    want = set(con.sql(cosine_pair_histogram_sql(
        "SELECT vec_id, embedding FROM v", n_buckets=8)).fetchall())
    assert got == want


def test_map_and_mrr_reject_out_of_range_ranks(spark):
    """Ranks outside 1..k would silently corrupt the exact integer
    arithmetic — both metrics must raise, not mis-score."""
    import pytest as _pt
    from cuvs_spark.stats.metrics import map_score, mrr_score
    truth = spark.createDataFrame([(0, 1)], "qid long, nid long")
    zero_idx = spark.createDataFrame([(0, 1, 0)],
                                     "qid long, nid long, rank long")
    too_deep = spark.createDataFrame([(0, 1, 11)],
                                     "qid long, nid long, rank long")
    for bad in (zero_idx, too_deep):
        with _pt.raises(ValueError, match="ranks"):
            map_score(bad, truth)
        with _pt.raises(ValueError, match="ranks"):
            mrr_score(bad, truth)


def test_rank_auc_excludes_null_scores(spark):
    """NULL scores carry no rank information and sort differently
    across engines — they must be excluded, not counted."""
    from cuvs_spark.stats.metrics import rank_auc
    df = spark.createDataFrame(
        [(1, 0), (2, 1), (None, 1), (None, 0)], "s long, y int")
    row = rank_auc(df, "s", "y = 1").collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (1, 1, 1.0)


def test_hubness_raises_instead_of_wrapping(spark):
    """A degree distribution whose exact MOMENTS exceed int64 must
    raise cleanly even when every distributed cube term fits: 100
    nodes, one absorbing 10⁵ edges → m3 ≈ n²·D³ ≈ 10¹⁹ > int64,
    while s3 = 10¹⁵ passes the ANSI aggregation untouched."""
    import pytest as _pt
    from cuvs_spark.stats.metrics import hubness_moments
    hub = (spark.range(100_000)
           .selectExpr("id % 100 AS src", "CAST(0 AS LONG) AS dst"))
    with _pt.raises(ValueError, match="int64"):
        hubness_moments(hub)
