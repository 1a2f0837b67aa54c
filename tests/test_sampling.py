"""Deterministic sampling / splitting / packing (pipeline/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuvs_spark.pipeline.sampling import (
    deterministic_sample,
    hash_split,
    pack_sequences,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def test_sample_rate_and_stability(spark, ids):
    kept = deterministic_sample(ids, 0.3, id_col="doc_id")
    n = kept.count()
    assert 0.25 * 2000 < n < 0.35 * 2000
    # membership is partitioning-independent
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(ids.repartition(17), 0.3).collect()}
    assert a == b
    # different salt -> different (roughly independent) membership
    c = {r["doc_id"] for r in
         deterministic_sample(ids, 0.3, salt="other").collect()}
    assert a != c
    # nested rates: a 0.1 sample is a subset of the 0.3 sample
    d = {r["doc_id"] for r in deterministic_sample(ids, 0.1).collect()}
    assert d <= a


def test_hash_split_partition(spark, ids):
    out = hash_split(ids, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    frac = {s: sum(1 for r in rows if r["split"] == s) / 2000
            for s in ("train", "val", "test")}
    assert 0.75 < frac["train"] < 0.85
    assert 0.07 < frac["val"] < 0.13
    # growing the corpus never reassigns existing rows
    bigger = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    again = {r["doc_id"]: r["split"]
             for r in hash_split(bigger, {"train": 0.8, "val": 0.1,
                                          "test": 0.1}).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["split"]


def test_hash_split_bad_weights(ids):
    with pytest.raises(ValueError):
        hash_split(ids, {"a": 0.5, "b": 0.4})


def test_pack_sequences_contiguous_fill(spark):
    rows = [(i, t) for i, t in enumerate([100, 200, 300, 150, 512, 60])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_sequences(df, 512).collect()}
    # cumsum starts: 0,100,300,600,750,1262
    assert [(out[i]["seq_id"], out[i]["seq_offset"]) for i in range(6)] == [
        (0, 0), (0, 100), (0, 300), (1, 88), (1, 238), (2, 238)]


def test_pack_sequences_sharded(spark):
    rows = [(i, 100, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, "
                                     "shard long")
    out = pack_sequences(df, 250, key_col="shard").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    # each shard packs independently: 5 docs x 100 tok into 250-budget
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        assert [(r["seq_id"], r["seq_offset"]) for r in rs] == [
            (0, 0), (0, 100), (0, 200), (1, 50), (1, 150)]


def test_cap_per_group_exact(spark):
    """Exact cap: ≤ n_cap per group, ranks 1..n, membership = the
    n_cap smallest md5 keys per group (Python re-check), and the kept
    set is invariant under repartitioning."""
    from cuvs_spark.pipeline.sampling import _MOD, _bucket_spark, cap_per_group

    df = (spark.range(0, 900)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("g"), (F.col("id") % 3)).alias("source")))
    out = cap_per_group(df, 50, group_col="source").cache()
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per.values()) == {50}
    assert out.agg(F.max("rk")).head()[0] == 50

    # python oracle over the same md5 bucket expression
    keys = {r["doc_id"]: r["_k"] for r in
            df.withColumn("_k", F.expr(_bucket_spark("doc_id", "cap")))
            .collect()}
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    for g in ("g0", "g1", "g2"):
        members = sorted((keys[i], i) for i in range(900)
                         if f"g{i % 3}" == g)[:50]
        assert {(g, i) for _, i in members} == {t for t in got if t[0] == g}

    shuffled = cap_per_group(df.repartition(13), 50, group_col="source")
    assert {(r["source"], r["doc_id"], r["rk"]) for r in shuffled.collect()} \
        == {(r["source"], r["doc_id"], r["rk"]) for r in out.collect()}


def test_cap_per_group_threshold(spark):
    """Rate-threshold cap (the 100 TB shape): kept counts track n_cap
    approximately, groups under the cap keep everything, and membership
    is a subset-stable pure function of id."""
    from cuvs_spark.pipeline.sampling import cap_per_group

    df = (spark.range(0, 1100)
          .select(F.col("id").alias("doc_id"),
                  F.when(F.col("id") < 1000, "big").otherwise("small")
                  .alias("source")))
    out = cap_per_group(df, 100, group_col="source", method="threshold")
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["small"] == 100  # under the cap: rate clamps to 1.0
    assert 60 <= per["big"] <= 140  # ~100 expected, md5-uniform
    assert out.agg(F.max("rk")).head()[0] == -1


def test_select_k_partial_matches_window(spark):
    """The salted two-level 'partial' strategy is exact: same rows and
    ranks as the window strategy on skewed per-key counts."""
    from cuvs_spark.operators.select_k import select_k

    df = (spark.range(0, 3000)
          .select((F.col("id") % 7).alias("key"),
                  F.pmod(F.xxhash64("id"), F.lit(1000)).alias("score"),
                  F.col("id").alias("rid")))
    w = select_k(df, "key", "score", 9, tie_cols=["rid"],
                 strategy="window")
    p = select_k(df, "key", "score", 9, tie_cols=["rid"],
                 strategy="partial", n_buckets=8)
    assert (sorted(map(tuple, w.select("key", "rid", "rank").collect()))
            == sorted(map(tuple, p.select("key", "rid", "rank").collect())))
    pm = select_k(df, "key", "score", 9, tie_cols=["rid"],
                  strategy="partial", select_min=False, n_buckets=8)
    wm = select_k(df, "key", "score", 9, tie_cols=["rid"],
                  strategy="window", select_min=False)
    assert (sorted(map(tuple, pm.select("key", "rid", "rank").collect()))
            == sorted(map(tuple, wm.select("key", "rid", "rank").collect())))


def test_keep_best_representative(spark):
    """Argmax-by-(score, -id) per cluster: highest score wins, ties go
    to the lowest id, exactly one keeper per cluster."""
    from cuvs_spark.pipeline.dedup import keep_best_representative

    memb = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)],
        "doc_id long, cluster long")
    sc = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (5, 1.0), (6, 2.0)],
        "doc_id long, score double")
    out = {r["doc_id"]: r["is_kept"] for r in
           keep_best_representative(memb, sc).collect()}
    assert out == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0, 6: 1}


def test_keep_best_unscored_members_survive(spark):
    """Members with no score row stay in the output (score -inf, kept
    only if the whole cluster is unscored — lowest id then wins); a
    NULL cluster key raises instead of silently vanishing."""
    import pytest as _pytest
    from cuvs_spark.pipeline.dedup import keep_best_representative

    memb = spark.createDataFrame(
        [(1, 10), (2, 10), (5, 20), (6, 20)], "doc_id long, cluster long")
    sc = spark.createDataFrame([(2, 4.0)], "doc_id long, score double")
    out = {r["doc_id"]: (r["is_kept"], r["score"]) for r in
           keep_best_representative(memb, sc).collect()}
    assert set(out) == {1, 2, 5, 6}
    assert out[2][0] == 1 and out[1][0] == 0      # scored member wins
    assert out[5][0] == 1 and out[6][0] == 0      # all-unscored: min id
    assert out[1][1] == float("-inf")

    bad = spark.createDataFrame([(1, None)], "doc_id long, cluster string")
    with _pytest.raises(Exception, match="NULL cluster"):
        keep_best_representative(
            bad, sc.select("doc_id", "score")).collect()
