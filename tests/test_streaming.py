"""Structured Streaming tests: tiered-index ingestion via foreachBatch
(the `extend` streaming story, tiered_index.pyx semantics) and
watermarked window aggregation equivalence vs batch."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators.ivf_flat import ivf_flat_build
from cuvs_spark.operators.tiered import (
    TieredIndex,
    tiered_build,
    tiered_extend,
    tiered_search,
)
from cuvs_spark.operators import knn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")).cache())


def test_tiered_search_sees_delta(spark, emb):
    old = emb.filter(F.col("id") < 300)
    new = emb.filter(F.col("id") >= 300)
    idx = tiered_build(old, n_lists=8, kmeans_n_iters=4, min_ann_rows=10**9)
    idx = tiered_extend(idx, new)
    assert idx.delta.count() == new.count()  # not compacted yet
    q = (emb.filter(F.col("id") >= 490)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got = tiered_search(idx, q, 5, n_probes=8, qvec_col="qv")
    # a query vector that exists only in the delta must find itself
    top1 = {r["qid"]: r["nid"] for r in got.filter(F.col("rank") == 1).collect()}
    assert all(top1[qid] == qid for qid in top1)


def test_tiered_compaction_threshold(spark, emb):
    old = emb.filter(F.col("id") < 300)
    new = emb.filter(F.col("id") >= 300)
    idx = tiered_build(old, n_lists=8, kmeans_n_iters=4, min_ann_rows=10)
    idx = tiered_extend(idx, new)   # 200 rows >= 10 → compacts
    assert idx.delta.count() == 0
    assert idx.ann.lists.count() == 500


def test_streaming_tiered_ingest(spark, emb, tmp_path):
    from cuvs_spark.streaming import start_tiered_ingest
    src = str(tmp_path / "stream_src")
    (emb.filter(F.col("id") >= 400)
     .write.mode("overwrite").parquet(src))
    old = emb.filter(F.col("id") < 400)
    state = {"index": tiered_build(old, n_lists=8, kmeans_n_iters=4,
                                   min_ann_rows=10**9)}
    q = start_tiered_ingest(spark, src, "id long, vec array<float>", state)
    q.processAllAvailable()
    q.stop()
    assert state.get("epochs", 0) >= 1
    assert state["index"].delta.count() == 100
    qdf = (emb.filter(F.col("id") == 450)
           .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got = tiered_search(state["index"], qdf, 3, n_probes=8, qvec_col="qv")
    assert got.filter(F.col("rank") == 1).head()["nid"] == 450


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from cuvs_spark.streaming import windowed_event_counts
    import sys
    sys.path.insert(0, "/root/repo")
    from cuvs_spark.entry_queries import events_table
    ev = events_table(spark, SF)
    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)
    batch = windowed_event_counts(ev).orderBy("window_start", "event_type")
    stream = (spark.readStream.schema(ev.schema).parquet(src))
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("win_out").start())
    q.processAllAvailable()
    q.stop()
    got = (spark.sql("SELECT * FROM win_out")
           .orderBy("window_start", "event_type"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stateful_running_stats_matches_batch(spark, tmp_path):
    """applyInPandasWithState across micro-batches converges to the
    batch twin's answer."""
    import sys
    sys.path.insert(0, "/root/repo")
    from cuvs_spark.entry_queries import events_table
    from cuvs_spark.streaming.stateful import (
        running_user_stats, user_stats_batch)
    ev = events_table(spark, SF).select("user_id", "ts", "value")
    src = str(tmp_path / "ev_stateful")
    # the running-gap state assumes event-time-ordered arrival (the
    # watermarked-stream contract) — feed two micro-batches split at
    # the median timestamp, second written only after the first drains
    cut = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")).head()[0]
    first = ev.filter(F.col("ts").cast("double") <= cut)
    second = ev.filter(F.col("ts").cast("double") > cut)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (running_user_stats(stream).writeStream.outputMode("update")
         .format("memory").queryName("stateful_out").start())
    q.processAllAvailable()
    second.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    # last emitted row per user == the batch answer
    got = spark.sql("""
      SELECT user_id, n_events, total_value, max_gap_seconds FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY n_events DESC) rn
        FROM stateful_out) WHERE rn = 1""")
    exp = user_stats_batch(ev)
    g = {r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_seconds"])
         for r in got.collect()}
    e = {r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_seconds"])
         for r in exp.collect()}
    assert set(g) == set(e)
    for u in e:
        assert g[u][0] == e[u][0], (u, g[u], e[u])
        assert g[u][1] == pytest.approx(e[u][1], abs=1e-4)
        assert g[u][2] == pytest.approx(e[u][2], abs=1e-4)


def test_tiered_with_rabitq_tier(spark):
    """The ANN tier is pluggable (tiered_index.pyx:48 ann_index_type):
    a RaBitQ tier with its own extend_fn compacts the delta and an
    extended index must equal a from-scratch build over the union."""
    import numpy as np

    from cuvs_spark.operators.ivf_rabitq import (ivf_rabitq_build,
                                                 ivf_rabitq_extend,
                                                 ivf_rabitq_search)
    from cuvs_spark.operators.tiered import (TieredIndex, tiered_extend,
                                             tiered_search)
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select(F.col("vec_id").alias("id"),
                   F.col("embedding").alias("vec")).cache())
    cent = np.array([r["vec"] for r in
                     emb.filter(F.col("id") < 8).orderBy("id").collect()],
                    dtype=float)
    old = emb.filter(F.col("id") >= 100)
    ann = ivf_rabitq_build(old, 8, bits_per_dim=3, centroids=cent)
    empty = spark.createDataFrame([], "id long, vec array<float>")
    idx = TieredIndex(ann=ann, delta=empty, min_ann_rows=40,
                      search_fn=ivf_rabitq_search,
                      extend_fn=ivf_rabitq_extend)
    # below threshold: rows stay in the delta
    idx = tiered_extend(idx, emb.filter(F.col("id") < 30))
    assert idx.delta.count() == 30
    # crossing it: compaction folds the delta into the RaBitQ tier
    idx = tiered_extend(idx, emb.filter((F.col("id") >= 30)
                                        & (F.col("id") < 100)))
    assert idx.delta.count() == 0
    assert idx.ann.codes.count() == emb.count()
    q = (emb.filter(F.col("id") < 10)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    got = tiered_search(idx, q, 5, 4, qvec_col="qv")
    full = ivf_rabitq_search(
        ivf_rabitq_build(emb, 8, bits_per_dim=3, centroids=cent),
        q, 5, 4, qvec_col="qv")
    a = {(r["qid"], r["nid"]) for r in got.collect()}
    b = {(r["qid"], r["nid"]) for r in full.collect()}
    assert a == b


def test_dynamic_batching_dispatch(spark, emb, tmp_path):
    """dynamic_batching (``dynamic_batching.hpp:24-70``): queued single
    queries co-dispatch as batched searches; results must equal a
    direct batch search, and batch formation must be measured with no
    dispatch above max_batch_size."""
    from cuvs_spark.streaming import start_dynamic_batching

    idx = ivf_flat_build(emb, 8, kmeans_n_iters=4, seed=7)
    src = str(tmp_path / "query_stream")
    queries = (emb.filter(F.col("id") < 30)
               .select(F.col("id").alias("qid"), F.col("vec")))
    queries.write.mode("overwrite").parquet(src)
    state: dict = {}
    sink = str(tmp_path / "result_sink")
    q = start_dynamic_batching(
        spark, src, "qid long, vec array<float>", idx, state,
        k=5, n_probes=8, max_batch_size=8, dispatch_timeout_s=0.25,
        sink_dir=sink)
    q.processAllAvailable()
    q.stop()
    assert state["batches"], "no dispatch recorded"
    total_q = sum(b["n_queries"] for b in state["batches"])
    assert total_q == 30
    # queue cap respected: every dispatch ≤ max_batch_size
    for b in state["batches"]:
        assert b["n_dispatches"] >= (b["n_queries"] + 7) // 8
    # results reached the executor-side sink, never the driver
    sunk = spark.read.parquet(sink)
    per_dispatch = sunk.select("epoch", "dispatch", "qid").distinct() \
        .groupBy("epoch", "dispatch").count().collect()
    assert all(r["count"] <= 8 for r in per_dispatch)
    got = {(r["qid"], r["nid"]) for r in sunk.collect()}
    from cuvs_spark.operators.ivf_flat import ivf_flat_search
    want = {(r["qid"], r["nid"])
            for r in ivf_flat_search(idx, queries.withColumnRenamed(
                "vec", "qv"), 5, 8, qvec_col="qv").collect()}
    assert got == want


def test_curation_ops_run_in_streams(spark, tmp_path):
    """The stateless curation family (PII scrub, C4 line filter,
    deterministic sampling, hash split) must run unchanged under
    Structured Streaming — map-only plans are streamable as-is."""
    from pyspark.sql import functions as F

    from cuvs_spark.pipeline.sampling import deterministic_sample, hash_split
    from cuvs_spark.pipeline.text import c4_line_filter, pii_scrub
    src = str(tmp_path / "docs_src")
    docs = spark.createDataFrame(
        [(i, f"Doc {i} writes to a@b.co daily.\nshort\nKeep this line ok.")
         for i in range(40)],
        "doc_id long, text string")
    docs.write.parquet(src)

    def pipe(d):
        from cuvs_spark.pipeline.sampling import mixture_sample
        scrubbed = pii_scrub(d).select(
            "doc_id", F.col("clean_text").alias("text"),
            F.expr("concat('s', doc_id % 2)").alias("source"))
        mixed = mixture_sample(scrubbed, {"s0": 1.0, "s1": 0.8})
        sampled = hash_split(deterministic_sample(mixed, 0.9),
                             {"train": 0.5, "test": 0.5})
        return c4_line_filter(sampled)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (pipe(stream).writeStream.outputMode("append").format("memory")
         .queryName("curate_stream_out").start())
    q.processAllAvailable(); q.stop()
    got = spark.sql("SELECT * FROM curate_stream_out").collect()
    assert got
    # emails were redacted upstream, C4 kept the punctuated lines
    assert all("a@b.co" not in r["clean_text"] for r in got)
    assert all("<EMAIL>" in r["clean_text"] for r in got)
    assert all("short" not in r["clean_text"] for r in got)

    # batch run over the same input must agree row-for-row
    want = {r["doc_id"]: r["clean_text"] for r in pipe(docs).collect()}
    assert {r["doc_id"]: r["clean_text"] for r in got} == want


def test_streaming_classifier_on_ingest(spark, tmp_path):
    """Quality-classifier scoring on ingest: a doc stream scored per
    micro-batch against a broadcast fixed-point model via foreachBatch,
    stream output row-for-row equal to the batch run."""
    from pyspark.sql import functions as F

    from cuvs_spark.pipeline.classify import classifier_score, synthetic_weights

    src = str(tmp_path / "clf_src")
    sink = str(tmp_path / "clf_sink")
    docs = spark.createDataFrame(
        [(i, f"some text number {i} with the and that words w{i % 5}")
         for i in range(60)],
        "doc_id long, text string")
    docs.write.parquet(src)
    weights = synthetic_weights(spark, 512).localCheckpoint()

    def score_batch(batch_df, _bid):
        (classifier_score(batch_df, weights, n_buckets=512)
         .write.mode("append").parquet(sink))

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream.writeStream.foreachBatch(score_batch) \
        .option("checkpointLocation", str(tmp_path / "clf_ckpt")).start()
    q.processAllAvailable(); q.stop()

    got = {r["doc_id"]: (r["n_feats"], r["score_fp"], r["label"])
           for r in spark.read.parquet(sink).collect()}
    want = {r["doc_id"]: (r["n_feats"], r["score_fp"], r["label"])
            for r in classifier_score(docs, weights, n_buckets=512).collect()}
    assert got == want

def test_chunk_and_lm_score_run_in_streams(spark, tmp_path):
    """Round-6 ops under Structured Streaming: sliding-window chunking
    is map-only and streams in append mode as-is; bigram-LM scoring
    (per-doc aggregation) runs per-microbatch via foreachBatch against
    the pre-trained broadcast model — stream == batch row-for-row."""
    from pyspark.sql import functions as F

    from cuvs_spark.pipeline.text import (bigram_lm, chunk_documents,
                                          lm_score_bigram)

    src = str(tmp_path / "docs_src")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 7}" for j in range(10)))
         for i in range(30)],
        "doc_id long, text string")
    docs.write.parquet(src)
    big, ctx, v = bigram_lm(docs)
    big, ctx = big.localCheckpoint(), ctx.localCheckpoint()

    def chunked(d):
        return chunk_documents(d, chunk_tokens=4, overlap=1).select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
            F.col("chunk_text").alias("text"))

    # stateless chunking: append-mode stream
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (chunked(stream).writeStream.outputMode("append").format("memory")
         .queryName("chunk_stream_out").start())
    q.processAllAvailable(); q.stop()
    got_chunks = {(r["doc_id"], r["text"]) for r in
                  spark.sql("SELECT * FROM chunk_stream_out").collect()}
    assert got_chunks == {(r["doc_id"], r["text"])
                          for r in chunked(docs).collect()}

    # agg-bearing scoring: foreachBatch (the dedup_stream pattern)
    acc = []

    def score_batch(bdf, _bid):
        acc.extend(lm_score_bigram(bdf, big, ctx, v).collect())

    q2 = (chunked(spark.readStream.schema(docs.schema).parquet(src))
          .writeStream.foreachBatch(score_batch).start())
    q2.processAllAvailable(); q2.stop()
    got = {r["doc_id"]: (r["n_pairs"], r["mean_pair_prob"]) for r in acc}
    want = {r["doc_id"]: (r["n_pairs"], r["mean_pair_prob"])
            for r in lm_score_bigram(chunked(docs), big, ctx, v).collect()}
    assert got == want and got
