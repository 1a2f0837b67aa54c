"""Round-5 operators: HDBSCAN mutual reachability, Gopher repetition
stats, SemDeDup semantic dedup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_mutual_reachability_matches_numpy(spark, tiny_vectors, vectors_df):
    from cuvs_spark.cluster.agglomerative import mutual_reachability_graph

    k = 4
    out = mutual_reachability_graph(vectors_df, k=k).toPandas()
    X = tiny_vectors.astype(np.float64)
    D = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(D, np.inf)
    order = np.argsort(D, axis=1, kind="stable")
    core = D[np.arange(len(X)), order[:, k - 1]]
    expected = {}
    for i in range(len(X)):
        for j in order[i, :k]:
            expected[(i, int(j))] = max(D[i, j], core[i], core[int(j)])
    got = {(int(r.src), int(r.dst)): r.mr_dist for r in out.itertuples()}
    assert set(got) == set(expected)
    for key, v in expected.items():
        assert got[key] == pytest.approx(v, rel=1e-6)
    # mr_dist >= raw distance and >= both cores, symmetric where both
    # directions exist
    for (i, j), v in got.items():
        if (j, i) in got:
            assert got[(j, i)] == pytest.approx(v, rel=1e-12)


def test_repetition_stats_known_docs(spark):
    from cuvs_spark.pipeline.text import repetition_stats

    docs = spark.createDataFrame(
        [(0, "a b a b a b"),          # one bigram dominates
         (1, "x y z w"),              # all unique
         (2, "q q q q q"),            # single repeated word
         (3, "t"),                    # too short for any bigram
         (4, "")],                    # empty text
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    # doc 0: words [a b a b a b] → 6 words, 2 distinct → dup 4/6
    assert out[0]["n_words"] == 6
    assert out[0]["dup_word_frac"] == pytest.approx(4 / 6)
    # bigrams: 'a b'×3, 'b a'×2 → top 3/5
    assert out[0]["top_bigram_frac"] == pytest.approx(3 / 5)
    # trigrams: 'a b a'×2, 'b a b'×2 → all 4 are repeats
    assert out[0]["dup_trigram_frac"] == pytest.approx(1.0)

    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == pytest.approx(1 / 3)
    assert out[1]["dup_trigram_frac"] == 0.0

    assert out[2]["dup_word_frac"] == pytest.approx(4 / 5)
    assert out[2]["top_bigram_frac"] == pytest.approx(1.0)

    assert out[3]["n_words"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[4]["n_words"] == 0
    assert out[4]["dup_word_frac"] == 0.0


def test_semantic_dedup_flags_injected_near_dup(spark, rng):
    from cuvs_spark.pipeline.dedup import semantic_dedup

    X = rng.standard_normal((60, 16)).astype(np.float32)
    # rows 50..54 are near-copies of rows 0..4 (tiny perturbation)
    X[50:55] = X[0:5] + 1e-4 * rng.standard_normal((5, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")
    out = semantic_dedup(df, n_clusters=6, tau=0.05).toPandas()
    assert len(out) == 60
    flagged = set(out[out.is_dup].id)
    # each injected copy shares a cluster with its (lower-id) source and
    # sits within tau, so it must be flagged
    assert {50, 51, 52, 53, 54} <= flagged
    # sources themselves are not flagged by their copies (copy has the
    # higher id); random vectors in 16-d are nowhere near tau=0.05
    assert not (flagged & set(range(50)))


def test_curate_repetition_stage(spark):
    from cuvs_spark.pipeline.curate import curate_corpus

    docs = spark.createDataFrame(
        [(0, "one two three four five six seven eight nine ten eleven"),
         (1, "spam spam spam spam spam spam spam spam spam spam spam"),
         (2, "shrt")],   # fails min_tokens → quality, not repetition
        "doc_id long, text string")
    out = {r["doc_id"]: r["stage"]
           for r in curate_corpus(docs, min_tokens=5,
                                  max_dup_word_frac=0.5).collect()}
    assert out[0] == "kept"
    assert out[1] == "repetition"
    assert out[2] == "quality"   # quality precedes repetition

    # thresholds off → no repetition stage at all
    out2 = {r["doc_id"]: r["stage"]
            for r in curate_corpus(docs, min_tokens=5).collect()}
    assert out2[1] == "kept"


def test_semantic_dedup_blas_agrees_with_expr(spark, rng):
    from cuvs_spark.pipeline.dedup import semantic_dedup

    X = rng.standard_normal((80, 12)).astype(np.float32)
    X[70:75] = X[10:15] + 1e-4 * rng.standard_normal((5, 12)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")
    e = (semantic_dedup(df, n_clusters=5, tau=0.05)
         .toPandas().sort_values("id").reset_index(drop=True))
    b = (semantic_dedup(df, n_clusters=5, tau=0.05, method="blas")
         .toPandas().sort_values("id").reset_index(drop=True))
    assert (e["cluster"] == b["cluster"]).all()
    assert (e["is_dup"] == b["is_dup"]).all()


def test_repetition_stats_plan_is_shuffle_free(spark):
    """The 100 TB guarantee: per-doc repetition statistics are one
    map-only projection — no Exchange anywhere in the plan."""
    from cuvs_spark.pipeline.text import repetition_stats
    from cuvs_spark.plans.layout import plan_string

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = plan_string(repetition_stats(docs))
    assert "Exchange" not in plan


def test_streaming_dedup_batch_vs_state(spark, tmp_path):
    from cuvs_spark.streaming import dedup_batch_against_state

    state = str(tmp_path / "state")
    base = ("spark window merge sort table row filter key part batch "
            "value line order data scan hash join group agg column")
    b1 = spark.createDataFrame(
        [(0, base),
         (1, "totally different words about quick brown foxes jumping "
             "over lazy dogs and rivers running deep under bridges"),
         (2, base)],  # in-batch exact dup of 0
        "doc_id long, text string")
    ok1 = dedup_batch_against_state(b1, state).toPandas()
    assert sorted(ok1.doc_id) == [0, 1]

    b2 = spark.createDataFrame(
        [(10, base),                       # exact dup of state doc 0
         (11, base + " zq1"),              # near dup of state doc 0
         (12, "entirely novel content with unique vocabulary nothing "
              "shared with any earlier document in the corpus stream "
              "fresh terms only here")],
        "doc_id long, text string")
    ok2 = dedup_batch_against_state(b2, state, jaccard_threshold=0.5) \
        .toPandas()
    assert sorted(ok2.doc_id) == [12]

    # state now holds 0, 1, 12 — a replay of 12 is rejected
    b3 = spark.createDataFrame([(20, "entirely novel content with unique "
                                 "vocabulary nothing shared with any "
                                 "earlier document in the corpus stream "
                                 "fresh terms only here")],
                               "doc_id long, text string")
    ok3 = dedup_batch_against_state(b3, state).toPandas()
    assert len(ok3) == 0


def test_streaming_dedup_stream_smoke(spark, tmp_path):
    import time

    from cuvs_spark.streaming import start_streaming_dedup

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon"),
         (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon")],
        "doc_id long, text string").write.parquet(src)
    q = start_streaming_dedup(
        spark, src, str(tmp_path / "state2"), str(tmp_path / "ok"),
        trigger_seconds=0.5, checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 60
        n = -1
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(tmp_path / "ok")).count()
                if n == 1:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    assert n == 1   # the exact in-batch dup was dropped


def test_semantic_dedup_accepts_trained_centroids(spark, rng):
    from cuvs_spark.cluster.kmeans import kmeans_fit
    from cuvs_spark.pipeline.dedup import semantic_dedup

    X = rng.standard_normal((40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")
    model = kmeans_fit(
        df.select(F.col("vec_id").alias("id"),
                  F.col("embedding").alias("vec")),
        4, max_iter=3, seed=7)
    cents = spark.createDataFrame(
        [(int(l), [float(v) for v in c])
         for l, c in enumerate(model.centroids)],
        "label long, cv array<float>")
    out = semantic_dedup(df, centroids=cents, tau=0.05).toPandas()
    assert len(out) == 40
    assert set(out.columns) == {"id", "cluster", "is_dup"}
    assert out.cluster.nunique() <= 4
