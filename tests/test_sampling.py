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
