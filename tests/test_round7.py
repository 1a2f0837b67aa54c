"""Round-7 additions: broadcast query-side bounds (auto-fallback
plans), hnswlib emit guards, no-straddle sequence packing + waste,
best-fit-decreasing packing, single-linkage driver scalar helper."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Broadcast query-side bounds (VERDICT r6 next #5 / ADVICE lsh.py:153)
# ---------------------------------------------------------------------------

def test_knn_blas_query_limit_fallback_equal(spark, vectors_df, queries_df):
    """Past the query limit the blas path must fall back to the
    non-broadcast expr plan and return identical results."""
    from cuvs_spark.operators.brute_force import knn

    base = knn(vectors_df, queries_df, 4, "sqeuclidean", method="blas")
    fb = knn(vectors_df, queries_df, 4, "sqeuclidean", method="blas",
             broadcast_query_limit=3)    # 12 queries > 3 → fallback
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))
    assert key(base) == key(fb)


def test_knn_expr_no_broadcast_plan_and_equal(spark, vectors_df,
                                              queries_df):
    """broadcast_queries=False runs the partition-pair cartesian (no
    broadcast exchange on the query side) with identical results."""
    from cuvs_spark.operators.brute_force import knn

    base = knn(vectors_df, queries_df, 4, "cosine")
    nb = knn(vectors_df, queries_df, 4, "cosine", broadcast_queries=False)
    # the flag's contract is "no FORCED broadcast": the logical plan
    # must carry no broadcast hint, so the planner stays free to pick
    # the partition-pair cartesian at scale (with tiny cached fixtures
    # Catalyst may still choose BNLJ from stats — that's the point)
    logical = nb._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "broadcast" not in logical
    hinted = knn(vectors_df, queries_df, 4, "cosine",
                 broadcast_queries=True)
    assert "broadcast" in \
        hinted._jdf.queryExecution().analyzed().toString()
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))
    assert key(base) == key(nb)


def test_lsh_knn_shuffle_rerank_equal(spark, vectors_df, queries_df):
    """Past broadcast_query_limit the LSH re-rank drops the broadcast
    hint (ordinary shuffle join on qid) — results identical."""
    from cuvs_spark.operators.lsh import lsh_knn

    kw = dict(n_planes=4, n_tables=6, n_probe_bits=2, metric="cosine",
              seed=7)
    base = lsh_knn(vectors_df, queries_df, 5, broadcast_queries=True, **kw)
    fb = lsh_knn(vectors_df, queries_df, 5, broadcast_query_limit=3, **kw)
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))
    assert key(base) == key(fb)


# ---------------------------------------------------------------------------
# hnswlib emit guards (ADVICE graph_export.py:487)
# ---------------------------------------------------------------------------

def test_hnswlib_save_empty_dataset_raises(spark, tmp_path):
    from cuvs_spark.sources.graph_export import hnsw_save_hnswlib

    layers = spark.createDataFrame(
        [], "layer int, src long, neighbors array<bigint>")
    empty = spark.createDataFrame([], "id long, vec array<float>")
    with pytest.raises(ValueError, match="empty dataset"):
        hnsw_save_hnswlib(layers, empty, str(tmp_path / "idx.bin"))


# ---------------------------------------------------------------------------
# No-straddle packing + waste (VERDICT r6 next #6)
# ---------------------------------------------------------------------------

def _packed_map(df):
    return {r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in df.collect()}


def test_pack_greedy_next_fit_exact_case(spark):
    """Hand-checked recurrence: budget 10, tokens
    [4, 4, 3, 12, 2, 10, 1] → seqs [0,0,3][12][2][10,1]... verified
    against the documented rule (oversize doc saturates its own seq)."""
    from cuvs_spark.pipeline.sampling import pack_sequences_greedy

    toks = [4, 4, 3, 12, 2, 10, 1]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long")
    got = _packed_map(pack_sequences_greedy(d, 10))
    assert got == {0: (0, 0), 1: (0, 4), 2: (1, 0), 3: (2, 0),
                   4: (3, 0), 5: (4, 0), 6: (5, 0)}
    # doc 2 (3 tokens) can't join seq 0 (fill 8); doc 3 oversize alone;
    # doc 4 opens fresh; doc 5 fills seq 4 exactly; doc 6 new seq


def test_pack_greedy_no_straddle_invariants(spark):
    """Every non-oversize sequence holds <= max_tokens; offsets are the
    running fill; doc coverage is exactly the input set; shard-keyed
    run packs each shard independently."""
    import numpy as np
    from cuvs_spark.pipeline.sampling import pack_sequences_greedy

    rng = np.random.default_rng(11)
    toks = rng.integers(1, 300, 200).tolist()
    rows = [(i, int(t), i % 3) for i, t in enumerate(toks)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens long, shard int")
    out = pack_sequences_greedy(d, 256, key_col="shard").collect()
    assert sorted(r["doc_id"] for r in out) == list(range(200))
    per = {}
    for r in out:
        per.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for members in per.values():
        members.sort(key=lambda r: r["seq_offset"])
        fill = 0
        for r in members:
            assert r["seq_offset"] == fill
            fill += r["n_tokens"]
        if all(m["n_tokens"] <= 256 for m in members):
            assert fill <= 256


def test_pack_best_fit_beats_next_fit(spark):
    """BFD parity: same doc coverage, no overflow, and never more
    padding waste than next-fit."""
    import numpy as np
    from cuvs_spark.pipeline.sampling import pack_sequences_greedy, pack_waste

    rng = np.random.default_rng(5)
    toks = rng.integers(1, 500, 300).tolist()
    rows = [(i, int(t)) for i, t in enumerate(toks)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    nf = pack_waste(d, 512).head()
    bf = pack_waste(d, 512, strategy="best_fit").head()
    assert bf["waste_tokens"] <= nf["waste_tokens"]
    assert 0.0 <= bf["waste_frac"] <= nf["waste_frac"] < 1.0

    packed = pack_sequences_greedy(d, 512, strategy="best_fit").collect()
    assert sorted(r["doc_id"] for r in packed) == list(range(300))
    per = {}
    for r in packed:
        per.setdefault(r["seq_id"], 0)
        per[r["seq_id"]] += r["n_tokens"]
    assert all(v <= 512 for v in per.values())  # no oversize docs drawn


# ---------------------------------------------------------------------------
# Tiered compaction boundary: stream == batch == exact (VERDICT r6 #7)
# ---------------------------------------------------------------------------

def test_tiered_compaction_boundary_stream_equals_batch(spark, tmp_path):
    """Drive the tiered index through N micro-batches so compaction
    fires MID-STREAM, then assert search results are identical (a)
    just before vs just after a compaction on the batch path, and (b)
    between the streamed index and a batch-built twin — all at
    n_probes = n_lists, where the IVF tier is exhaustive and any
    plumbing loss (dropped delta rows, double-counted extends) shows
    up as a hard mismatch."""
    from pyspark.sql import functions as F

    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.tiered import (tiered_build, tiered_extend,
                                             tiered_search)
    from cuvs_spark.streaming import start_tiered_ingest

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select(F.col("vec_id").alias("id"),
                   F.col("embedding").alias("vec")).cache())
    old = emb.filter(F.col("id") < 300)
    q = (emb.filter(F.col("id") % 50 == 0)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    key = lambda df: sorted(map(tuple, df.select(
        "qid", "nid", "rank").collect()))

    # batch path: delta just before the crossing extend vs just after
    pre = tiered_build(old, n_lists=8, kmeans_n_iters=4,
                       min_ann_rows=150)
    pre = tiered_extend(pre, emb.filter(
        (F.col("id") >= 300) & (F.col("id") < 400)))      # delta=100
    assert pre.delta.count() == 100
    post = tiered_extend(pre, emb.filter(F.col("id") >= 400))  # 200→folds
    assert post.delta.count() == 0
    import dataclasses
    pre_full = tiered_extend(  # same rows, threshold too high to fold
        dataclasses.replace(pre, min_ann_rows=10**9),
        emb.filter(F.col("id") >= 400))
    assert pre_full.delta.count() == 200
    s_post = tiered_search(post, q, 5, n_probes=8, qvec_col="qv")
    s_pre = tiered_search(pre_full, q, 5, n_probes=8, qvec_col="qv")
    assert key(s_pre) == key(s_post)
    # and both equal exact brute force at exhaustive probes
    exact = knn(emb, q, 5, "sqeuclidean", qvec_col="qv")
    assert key(s_post) == key(exact)

    # stream path: 4 one-file micro-batches, compaction fires mid-run
    src = str(tmp_path / "tiered_src")
    for i, lo in enumerate(range(300, 500, 50)):
        (emb.filter((F.col("id") >= lo) & (F.col("id") < lo + 50))
         .coalesce(1).write.mode("append").parquet(src))
    state = {"index": tiered_build(old, n_lists=8, kmeans_n_iters=4,
                                   min_ann_rows=120)}
    sq = start_tiered_ingest(spark, src, "id long, vec array<float>",
                             state, max_files_per_trigger=1)
    sq.processAllAvailable()
    sq.stop()
    assert state["epochs"] == 4
    assert state.get("compactions", 0) >= 1        # fired mid-stream
    s_stream = tiered_search(state["index"], q, 5, n_probes=8,
                             qvec_col="qv")
    assert key(s_stream) == key(exact)


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (training order)
# ---------------------------------------------------------------------------

def test_epoch_shuffle_deterministic_and_partition_proof(spark):
    """Ranks are a permutation of 1..n, identical under different input
    partitioning (the offset+local-rank plan is boundary-invariant),
    identical across re-runs, and different epochs decorrelate."""
    from cuvs_spark.pipeline.sampling import epoch_shuffle

    d = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in epoch_shuffle(d, 3).collect()}
    assert sorted(a.values()) == list(range(1, 501))
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in epoch_shuffle(d.repartition(17), 3,
                                n_partitions=5).collect()}
    assert a == b
    e2 = {r["doc_id"]: r["shuffle_rank"]
          for r in epoch_shuffle(d, 4).collect()}
    assert sorted(e2.values()) == list(range(1, 501))
    assert sum(a[k] == e2[k] for k in a) < 25   # epochs decorrelate


# ---------------------------------------------------------------------------
# Round-7 second half: boilerplate lines, token budget, top n-grams
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_removes_every_occurrence(spark):
    from cuvs_spark.pipeline.dedup import boilerplate_lines
    nav = "COOKIE BANNER"
    rows = [(i, f"{nav}\nunique line {i}") for i in range(4)]
    rows.append((9, "rare\nonly twice"))
    rows.append((10, "only twice\nbody ten"))
    out = {r["doc_id"]: r for r in
           boilerplate_lines(_docs(spark, rows), min_docs=3).collect()}
    # the nav line (df=4) is gone from ALL docs, including doc 0
    for i in range(4):
        assert out[i]["clean_text"] == f"unique line {i}"
        assert out[i]["n_removed"] == 1 and out[i]["n_lines"] == 2
    # df=2 line survives everywhere (below min_docs=3)
    assert out[9]["clean_text"] == "rare\nonly twice"
    assert out[10]["n_removed"] == 0


def test_boilerplate_lines_vs_paragraph_dedup_first_occurrence(spark):
    """paragraph_dedup keeps the first copy; boilerplate_lines must not."""
    from cuvs_spark.pipeline.dedup import boilerplate_lines, paragraph_dedup
    rows = [(i, f"SHARED\nbody {i}") for i in range(3)]
    pd_ = {r["doc_id"]: r["clean_text"]
           for r in paragraph_dedup(_docs(spark, rows)).collect()}
    bl = {r["doc_id"]: r["clean_text"]
          for r in boilerplate_lines(_docs(spark, rows),
                                     min_docs=3).collect()}
    assert pd_[0].startswith("SHARED")          # first occurrence kept
    assert all(not t.startswith("SHARED") for t in bl.values())


def test_token_budget_exact_prefix_rule(spark):
    from cuvs_spark.pipeline.sampling import token_budget_sample
    rows = [(i, "g", "tok " * 10) for i in range(20)]   # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    out = token_budget_sample(df, 35, group_col="source").collect()
    # greedy fill: 3 full docs (30) + the boundary doc crossing 35 → 4
    assert len(out) == 4
    assert max(r["cum_tokens"] for r in out) == 40
    # exclusive prefix < budget for every kept row
    assert all(r["cum_tokens"] - r["n_tokens"] < 35 for r in out)


def test_token_budget_rate_approximates_budget(spark):
    from cuvs_spark.pipeline.sampling import token_budget_sample
    rows = [(i, f"g{i % 2}", "tok " * 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    out = token_budget_sample(df, 1000, method="rate").collect()
    kept = {}
    for r in out:
        assert r["cum_tokens"] == -1
        kept[r["source"]] = kept.get(r["source"], 0) + r["n_tokens"]
    for g in ("g0", "g1"):                   # each group holds 2000 tokens
        assert 500 <= kept[g] <= 1500        # ≈ budget, rate = 1/2


def test_token_budget_deterministic_across_partitioning(spark):
    from cuvs_spark.pipeline.sampling import token_budget_sample
    rows = [(i, "g", "w " * (i % 7 + 1)) for i in range(50)]
    df1 = spark.createDataFrame(rows, "doc_id long, source string, "
                                      "text string")
    a = sorted(r["doc_id"] for r in
               token_budget_sample(df1, 60).collect())
    b = sorted(r["doc_id"] for r in
               token_budget_sample(df1.repartition(13), 60).collect())
    assert a == b and len(a) > 0


def test_top_ngrams_counts_exact(spark):
    from cuvs_spark.pipeline.text import top_ngrams
    rows = [(0, "a b a b"), (1, "a b c"), (2, "zz yy")]
    out = {r["gram"]: r for r in
           top_ngrams(_docs(spark, rows), n=2, k=10).collect()}
    assert out["a b"]["total_freq"] == 3      # 2 in doc0 ("a b","a b") +1
    assert out["a b"]["doc_freq"] == 2
    assert out["a b"]["rank"] == 1
    assert out["b a"]["total_freq"] == 1      # the middle bigram of doc0
    assert out["zz yy"]["doc_freq"] == 1
    ranks = sorted(r["rank"] for r in out.values())
    assert ranks == list(range(1, len(out) + 1))


# ---------------------------------------------------------------------------
# BM25 + RRF hybrid retrieval
# ---------------------------------------------------------------------------

def test_bm25_ranks_distinctive_term_first(spark):
    from cuvs_spark.pipeline.retrieval import bm25_search
    docs = _docs(spark, [
        (0, "spark shuffle join"), (1, "spark window agg"),
        (2, "zebra zoo animals"), (3, "spark spark spark shuffle")])
    q = spark.createDataFrame([(0, "zebra"), (1, "shuffle")],
                              "qid long, qtext string")
    out = bm25_search(docs, q, 3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["doc_id"]))
    # 'zebra' appears only in doc 2 → sole hit
    assert sorted(by_q[0]) == [(1, 2)]
    # 'shuffle' hits docs 0 and 3 only
    assert {d for _, d in by_q[1]} == {0, 3}
    assert all(r["score"] > 0 for r in out)


def test_bm25_lucene_idf_monotone_with_rational(spark):
    from cuvs_spark.pipeline.retrieval import bm25_search
    docs = _docs(spark, [(i, f"common term{i} filler") for i in range(6)])
    q = spark.createDataFrame([(0, "term3 common")], "qid long, qtext string")
    top_r = bm25_search(docs, q, 1).collect()[0]["doc_id"]
    top_l = bm25_search(docs, q, 1, idf="lucene").collect()[0]["doc_id"]
    assert top_r == top_l == 3          # the doc holding the rare term


def test_bm25_deterministic_across_partitioning(spark):
    from cuvs_spark.pipeline.retrieval import bm25_search
    rows = [(i, f"w{i % 5} w{i % 3} shared") for i in range(40)]
    docs = _docs(spark, rows)
    q = spark.createDataFrame([(0, "w0 shared"), (1, "w2")],
                              "qid long, qtext string")
    key = lambda d: sorted((r["qid"], r["rank"], r["doc_id"], r["score"])
                           for r in bm25_search(d, q, 5).collect())
    assert key(docs) == key(docs.repartition(17))


def test_rrf_fusion_hand_checked(spark):
    from cuvs_spark.pipeline.retrieval import rrf_fuse
    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2)],
                              "qid long, doc_id long, rank long")
    b = spark.createDataFrame([(0, 11, 1), (0, 12, 2)],
                              "qid long, doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], 10).collect()}
    assert out[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[10]["rrf_score"] == 1.0 / 61
    assert out[12]["rrf_score"] == 1.0 / 62
    # doc 11 (in both rankings) wins
    assert out[11]["rank"] == 1


def test_bm25_max_df_prunes_stopwords(spark):
    from cuvs_spark.pipeline.retrieval import bm25_search
    # 'the' appears in all 10 docs (df_frac=1.0); content words once
    docs = _docs(spark, [(i, f"the unique{i}") for i in range(10)])
    q = spark.createDataFrame([(0, "the unique3")], "qid long, qtext string")
    full = bm25_search(docs, q, 10).collect()
    pruned = bm25_search(docs, q, 10, max_df_frac=0.5).collect()
    # unpruned: every doc matches via 'the'; pruned: only doc 3 matches
    assert len(full) == 10
    assert [(r["doc_id"], r["rank"]) for r in pruned] == [(3, 1)]


# ---------------------------------------------------------------------------
# Third-wave round-7 ops: CDC chunks, dedup-against-base, score
# buckets, kNN label vote
# ---------------------------------------------------------------------------

def test_cdc_chunks_partition_and_shift_resilience(spark):
    from cuvs_spark.pipeline.dedup import cdc_chunks

    base = " ".join(f"w{i}" for i in range(200))
    shifted = "pre1 pre2 pre3 " + base
    out = cdc_chunks(_docs(spark, [(1, base), (2, shifted), (3, "")]))
    rows = out.collect()
    # empty doc yields nothing
    assert not [r for r in rows if r["doc_id"] == 3]
    for did, ntok in ((1, 200), (2, 203)):
        ch = sorted((r["chunk_idx"], r["n_tokens"]) for r in rows
                    if r["doc_id"] == did)
        # chunks partition the token stream, indexes contiguous from 0
        assert [i for i, _ in ch] == list(range(len(ch)))
        assert sum(n for _, n in ch) == ntok
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    # content-defined boundaries re-sync after the 3-token prepend:
    # all but the first chunk(s) coincide
    assert len(h1 & h2) / len(h1) >= 0.5


def test_cdc_chunks_short_doc_single_chunk(spark):
    from cuvs_spark.pipeline.dedup import cdc_chunks

    out = cdc_chunks(_docs(spark, [(1, "a b")]), window=4).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0 and out[0]["n_tokens"] == 2


def test_dedup_against_threshold_and_best_match(spark):
    from cuvs_spark.pipeline.dedup import dedup_against

    body = " ".join(f"t{i}" for i in range(40))
    base = _docs(spark, [(1, body), (2, body),
                         (3, " ".join(f"z{i}" for i in range(40)))])
    delta = _docs(spark, [
        (10, body),                                   # exact dup of 1 AND 2
        (11, " ".join(f"q{i}" for i in range(40))),   # novel
        (12, body + " x1 x2"),                        # near dup
    ])
    got = {r["doc_id"]: r for r in dedup_against(base, delta).collect()}
    assert set(got) == {10, 12}
    # two equal-jaccard base matches → max base_id wins
    assert got[10]["base_id"] == 2 and got[10]["jaccard"] == 1.0
    assert got[12]["base_id"] == 2 and 0.5 <= got[12]["jaccard"] < 1.0


def test_dedup_against_never_pairs_base_with_itself(spark):
    from cuvs_spark.pipeline.dedup import dedup_against

    body = " ".join(f"t{i}" for i in range(40))
    base = _docs(spark, [(1, body), (2, body)])
    delta = _docs(spark, [(10, " ".join(f"n{i}" for i in range(40)))])
    # base-side dups must not appear: output is delta-keyed only
    assert dedup_against(base, delta).count() == 0


def test_score_buckets_ntile_exact(spark):
    from cuvs_spark.pipeline.sampling import score_buckets

    rows = [(gi * 100 + i, g, float(i))
            for gi, g in enumerate(["a", "b"]) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = score_buckets(df, 3, score_col="score").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault((r["source"], r["bucket"]), []).append(r["doc_id"] % 100)
    for g in ["a", "b"]:
        # higher score = better = bucket 1; 9 rows → 3 per tile
        assert sorted(by_bucket[(g, 1)]) == [6, 7, 8]
        assert sorted(by_bucket[(g, 2)]) == [3, 4, 5]
        assert sorted(by_bucket[(g, 3)]) == [0, 1, 2]


def test_score_buckets_approx_matches_on_separated_scores(spark):
    from cuvs_spark.pipeline.sampling import score_buckets

    rows = [(i, "a", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    exact = {r["doc_id"]: r["bucket"]
             for r in score_buckets(df, 3, score_col="score").collect()}
    approx = {r["doc_id"]: r["bucket"]
              for r in score_buckets(df, 3, score_col="score",
                                     method="approx").collect()}
    agree = sum(exact[i] == approx[i] for i in exact)
    assert agree >= 27            # boundary rows may land one tile off


def test_knn_label_vote_majority_and_tie(spark):
    from cuvs_spark.pipeline.classify import knn_label_vote

    pts = [(0, [0.0, 0.1], 1), (1, [0.1, 0.0], 1),
           (2, [0.0, -0.1], 2), (3, [-0.1, 0.0], 2),
           (4, [5.0, 5.0], 7), (5, [5.1, 5.0], 7), (6, [5.0, 5.1], 9)]
    data = spark.createDataFrame(pts, "id long, vec array<float>, label long")
    qs = spark.createDataFrame([(100, [0.0, 0.0]), (101, [5.0, 5.05])],
                               "qid long, qv array<float>")
    got = {r["qid"]: r for r in
           knn_label_vote(data, qs, 4, "sqeuclidean",
                          qvec_col="qv").collect()}
    # qid 100: labels {1,1,2,2} → 2-2 tie → lowest label wins
    assert got[100]["label"] == 1 and got[100]["votes"] == 2
    # qid 101: nearest 4 of the far cluster + one near pt? k=4 around
    # (5,5.05): ids 4,5,6 plus one origin point → 7 wins 2-1-1
    assert got[101]["label"] == 7 and got[101]["votes"] == 2


def _tok_df(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, tok_idx long, vec array<float>")


def test_maxsim_hand_checked(spark):
    from cuvs_spark.pipeline.retrieval import maxsim_search

    docs = _tok_df(spark, [
        (1, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0]),
        (2, 0, [-1.0, 0.0]), (2, 1, [0.0, -1.0])], "doc_id")
    qs = _tok_df(spark, [(7, 0, [1.0, 0.0]), (7, 1, [0.0, 1.0])], "qid")
    got = {r["doc_id"]: r for r in
           maxsim_search(docs, qs, 2).collect()}
    # each query token matches doc 1 exactly (sim 1 + 1 = 2); best
    # doc-2 token per query token is orthogonal (sim 0)
    assert got[1]["score"] == pytest.approx(2.0)
    assert got[1]["rank"] == 1
    assert got[2]["score"] == pytest.approx(0.0)


def test_maxsim_candidates_path_equals_exact(spark):
    import numpy as np
    from cuvs_spark.pipeline.retrieval import maxsim_search

    rng = np.random.default_rng(3)
    docs = _tok_df(spark, [(d, t, [float(x) for x in rng.normal(0, 1, 4)])
                           for d in range(6) for t in range(3)], "doc_id")
    qs = _tok_df(spark, [(q, t, [float(x) for x in rng.normal(0, 1, 4)])
                         for q in range(2) for t in range(3)], "qid")
    exact = maxsim_search(docs, qs, 4)
    allc = spark.createDataFrame([(q, d) for q in range(2)
                                  for d in range(6)],
                                 "qid long, doc_id long")
    cand = maxsim_search(docs, qs, 4, candidates=allc)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(exact) == key(cand)


def test_contamination_report_counts(spark):
    from cuvs_spark.pipeline.text import contamination_report

    g8 = " ".join(f"g{i}" for i in range(8))
    corpus = _docs(spark, [
        (1, g8 + " tail one"), (2, g8 + " tail two"),
        (3, "totally different words " + " ".join(f"x{i}" for i in range(8)))])
    bench = spark.createDataFrame(
        [(100, g8), (101, " ".join(f"z{i}" for i in range(8)))],
        "bench_id long, text string")
    got = {r["bench_id"]: r for r in
           contamination_report(corpus, bench).collect()}
    # item 100's single 8-gram appears in corpus docs 1 and 2
    assert got[100]["n_grams"] == 1 and got[100]["n_docs_hit"] == 2
    assert got[100]["n_grams_hit"] == 1
    # item 101 is clean — and still present with zeros
    assert got[101]["n_docs_hit"] == 0 and got[101]["n_grams_hit"] == 0


def test_length_quantiles_exact_values(spark):
    from cuvs_spark.pipeline.text import length_quantiles

    rows = [(i, "s", " ".join("w" for _ in range(n)))
            for i, n in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = length_quantiles(df, probs=(0.5,)).collect()[0]
    assert r["n_docs"] == 10
    assert r["q1"] == pytest.approx(5.5)     # type-7 median of 1..10


def test_dup_cluster_histogram(spark):
    from cuvs_spark.pipeline.dedup import dup_cluster_histogram

    docs = _docs(spark, [(1, "a"), (2, "a"), (3, "a"),
                         (4, "b"), (5, "b"), (6, "c")])
    got = {r["cluster_size"]: r for r in
           dup_cluster_histogram(docs).collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[1]["n_clusters"] == 1 and got[1]["n_docs"] == 1


def test_script_profile_mixed_scripts(spark):
    from cuvs_spark.pipeline.text import script_profile

    rows = [(1, "Hello мир 世界 123"), (2, "")]
    got = {r["doc_id"]: r for r in
           script_profile(_docs(spark, rows)).collect()}
    r = got[1]
    n = r["n_chars"]
    assert n == 16
    assert r["latin_frac"] == pytest.approx(5 / n)
    assert r["cyrillic_frac"] == pytest.approx(3 / n)
    assert r["cjk_frac"] == pytest.approx(2 / n)
    assert r["digit_frac"] == pytest.approx(3 / n)
    assert r["space_frac"] == pytest.approx(3 / n)
    # empty doc: null-free zeros
    assert got[2]["n_chars"] == 0 and got[2]["latin_frac"] == 0.0


def test_leakage_free_split_colocates_duplicates(spark):
    from cuvs_spark.pipeline.sampling import leakage_free_split

    rows = ([(i, f"unique doc {i} body") for i in range(50)]
            + [(1000 + i, f"unique doc {i} body") for i in range(50)])
    out = {r["doc_id"]: r["split"] for r in leakage_free_split(
        _docs(spark, rows), {"train": 0.7, "test": 0.3}).collect()}
    for i in range(50):
        assert out[i] == out[1000 + i]          # copies co-locate
    assert {"train", "test"} == set(out.values())


def test_leakage_free_split_with_near_dup_labels(spark):
    from cuvs_spark.pipeline.sampling import leakage_free_split

    rows = [(1, "a x"), (2, "a y"), (3, "b z")]
    labels = spark.createDataFrame([(1, 10), (2, 10), (3, 30)],
                                   "doc_id long, label long")
    out = {r["doc_id"]: r["split"] for r in leakage_free_split(
        _docs(spark, rows), {"train": 0.5, "test": 0.5},
        labels=labels).collect()}
    assert out[1] == out[2]                     # same cluster label


# ---------------------------------------------------------------------------
# Fifth-wave round-7 operators: n-gram novelty, vocab coverage,
# cross-source dup audit, Matryoshka truncation recall
# ---------------------------------------------------------------------------

def test_ngram_novelty_hand_checked(spark):
    from cuvs_spark.pipeline.text import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d"),        # grams: "a b c" (shared), "b c d" (novel)
         (2, "a b c x"),        # grams: "a b c" (shared), "b c x" (novel)
         (3, "z z z z z"),      # distinct gram: "z z z" (novel)
         (4, ""),               # no grams
         (5, "m n o p"),        # exact copies: every gram shared →
         (6, "m n o p")],       # novelty 0.0 (not NULL — regression)
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["novel_grams"], r["novelty_frac"])
           for r in ngram_novelty(docs, 3).collect()}
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 1, 1.0)
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (2, 0, 0.0)
    assert got[6] == (2, 0, 0.0)


def test_vocab_coverage_hand_checked(spark):
    from cuvs_spark.pipeline.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    rows = vocab_coverage(docs, 2).orderBy("rank").collect()
    assert [(r["rank"], r["term"], r["term_freq"], r["cum_freq"],
             r["total_tokens"], r["coverage_frac"]) for r in rows] == \
        [(1, "a", 2, 2, 5, 0.4), (2, "b", 2, 4, 5, 0.8)]


def test_cross_source_dups_spanning_only(spark):
    from cuvs_spark.pipeline.dedup import cross_source_dups

    docs = spark.createDataFrame(
        [(1, "x", "s1"), (2, "x", "s2"), (3, "x", "s1"),
         (4, "y", "s1"), (5, "y", "s1"),          # same-source dup: out
         (6, "w", "s3")],                          # singleton: out
        "doc_id long, text string, source string")
    rows = cross_source_dups(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_docs"], r["n_sources"], r["canonical_id"],
            r["sources"]) == (3, 2, 1, "s1,s2")


def test_truncate_dims_matryoshka_recall(spark, vectors_df, queries_df):
    from cuvs_spark.functions.vector import truncate_dims
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.stats.metrics import recall_score

    full = knn(vectors_df, queries_df, 5, "cosine")
    # full-width "truncation" is the identity → recall exactly 1.0
    same = knn(vectors_df.withColumn("vec", truncate_dims("vec", 8)),
               queries_df.withColumn("vec", truncate_dims("vec", 8)),
               5, "cosine")
    assert recall_score(same, full).collect()[0]["recall"] == 1.0
    # a 2-dim prefix loses information but stays a valid kNN result
    trunc = knn(vectors_df.withColumn("vec", truncate_dims("vec", 2)),
                queries_df.withColumn("vec", truncate_dims("vec", 2)),
                5, "cosine")
    assert trunc.count() == 12 * 5
    rec = recall_score(trunc, full).collect()[0]["recall"]
    assert 0.0 <= rec <= 1.0


# ---------------------------------------------------------------------------
# Round-7 self-review fixes
# ---------------------------------------------------------------------------

def test_leakage_free_split_keeps_unlabeled_docs(spark):
    """A PARTIAL label relation (connected_components only labels
    dup-pair members) must not drop singletons; unlabeled exact
    copies still co-locate via the text-hash fallback."""
    from cuvs_spark.pipeline.sampling import leakage_free_split

    docs = spark.createDataFrame(
        [(1, "dup text"), (2, "dup text"), (3, "solo one"),
         (4, "copy two"), (5, "copy two")],
        "doc_id long, text string")
    # labels cover ONLY docs 1-2; 3-5 are unlabeled
    labels = spark.createDataFrame([(1, 1), (2, 1)],
                                   "doc_id long, label long")
    out = leakage_free_split(docs, {"train": 0.5, "test": 0.5},
                             labels=labels)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5}          # nothing dropped
    assert got[1] == got[2]                      # labeled cluster
    assert got[4] == got[5]                      # unlabeled exact copies


def test_paragraph_dedup_literal_sep(spark):
    """sep is literal: '|' must not be parsed as an (empty) regex
    alternation, and reassembly must use the same separator."""
    from cuvs_spark.pipeline.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "alpha|beta"), (2, "beta|gamma")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           paragraph_dedup(docs, sep="|").collect()}
    assert out[1]["clean_text"] == "alpha|beta"
    assert out[2]["clean_text"] == "gamma"       # 'beta' kept in doc 1
    assert out[2]["n_removed"] == 1


def test_boilerplate_lines_literal_sep(spark):
    from cuvs_spark.pipeline.dedup import boilerplate_lines

    docs = spark.createDataFrame(
        [(1, "nav.keep one"), (2, "nav.keep two"), (3, "nav.solo")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           boilerplate_lines(docs, min_docs=3, sep=".").collect()}
    # 'nav' appears in all 3 docs -> removed everywhere, '.'-joined
    assert out[1]["clean_text"] == "keep one"
    assert out[3]["clean_text"] == "solo"
    assert all(out[i]["n_removed"] == 1 for i in (1, 2, 3))


def test_rrf_fuse_empty_rankings_raises(spark):
    from cuvs_spark.pipeline.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], 5)


def test_knn_label_vote_no_broadcast_fallback_equal(spark, vectors_df,
                                                    queries_df):
    """Past broadcast_query_limit the vote must run the partition-pair
    plan (no forced broadcast of the corpus-as-queries side) with
    identical results."""
    from cuvs_spark.pipeline.classify import knn_label_vote

    data = vectors_df.withColumn("label", (F.col("id") % 3).cast("long"))
    base = knn_label_vote(data, queries_df, 5, "sqeuclidean",
                          broadcast_queries=True)
    guarded = knn_label_vote(data, queries_df, 5, "sqeuclidean",
                             broadcast_query_limit=3)   # 12 > 3
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(base) == key(guarded)


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every base text probes positive (Bloom guarantees no false
    negatives); fresh texts stay mostly negative at ~1.6 bits/key
    headroom; m_bits validation rejects non-multiples of 63."""
    from cuvs_spark.pipeline.dedup import (bloom_build, bloom_contains,
                                           dedup_against_bloom)

    base = spark.createDataFrame(
        [(i, f"base doc {i} payload") for i in range(200)],
        "doc_id long, text string")
    novel = spark.createDataFrame(
        [(1000 + i, f"novel doc {i} other") for i in range(200)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["maybe_dup"]
           for r in dedup_against_bloom(
               base, base.unionByName(novel), m_bits=63 * 512).collect()}
    assert all(out[i] == 1 for i in range(200))          # no false negs
    fps = sum(out[1000 + i] for i in range(200))
    assert fps <= 20                                     # loose FP bound
    with pytest.raises(ValueError, match="multiple"):
        bloom_build(base, m_bits=1000)
    # probing an empty filter is all-negative
    empty = bloom_build(base.limit(0), m_bits=63 * 512)
    neg = bloom_contains(novel, empty, m_bits=63 * 512).collect()
    assert all(r["maybe_dup"] == 0 for r in neg)


def test_decontaminate_remove_spans(spark):
    """Leaked n-grams are cut out token-exactly (case-insensitive
    match, original case kept); clean docs survive; a doc that IS the
    eval item empties out."""
    from cuvs_spark.pipeline.text import decontaminate_remove

    docs = spark.createDataFrame(
        [(1, "keep A Q1 Q2 Q3 keep B"),
         (2, "clean text only here now"),
         (3, "q1 q2 q3"), (4, "")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(0, "q1 q2 q3")],
                                  "bench_id long, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in decontaminate_remove(docs, bench, n=3).collect()}
    assert out[1] == ("keep A keep B", 7, 3)
    assert out[2] == ("clean text only here now", 5, 0)
    assert out[3] == ("", 3, 3)
    assert out[4] == ("", 0, 0)
    # overlapping leaks: both grams of "q1 q2 q3 q4" contaminate -> all cut
    docs2 = spark.createDataFrame([(9, "x q1 q2 q3 q4 y")],
                                  "doc_id long, text string")
    bench2 = spark.createDataFrame([(0, "q1 q2 q3 q4")],
                                   "bench_id long, text string")
    r = decontaminate_remove(docs2, bench2, n=3).collect()[0]
    assert (r["clean_text"], r["n_removed"]) == ("x y", 4)


def test_bloom_metadata_guards_parameter_mismatch(spark):
    """The filter carries its build parameters; probing with a
    different m_bits/k must raise instead of silently returning
    false negatives, and omitted parameters are read from it."""
    from cuvs_spark.pipeline.dedup import bloom_build, bloom_contains

    base = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string")
    filt = bloom_build(base, m_bits=63 * 256, k=4).localCheckpoint()
    # parameters read from metadata: every base text probes positive
    out = {r["doc_id"]: r["maybe_dup"]
           for r in bloom_contains(base, filt).collect()}
    assert all(out[i] == 1 for i in range(50))
    with pytest.raises(ValueError, match="m_bits"):
        bloom_contains(base, filt, m_bits=63 * 128)
    with pytest.raises(ValueError, match="k="):
        bloom_contains(base, filt, k=2)


def test_leakage_free_split_stale_labels_colocate_exact_copies(spark):
    """A copy ingested AFTER the label relation was computed must land
    in its labeled original's split (label propagates across the
    exact-text cluster)."""
    from cuvs_spark.pipeline.sampling import leakage_free_split

    docs = spark.createDataFrame(
        [(1, "dup text"), (2, "dup text"), (999, "dup text"),
         (3, "solo one")],
        "doc_id long, text string")
    labels = spark.createDataFrame([(1, 5), (2, 5)],   # 999 is stale
                                   "doc_id long, label long")
    out = leakage_free_split(docs, {"train": 0.5, "test": 0.5},
                             labels=labels)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(got) == {1, 2, 3, 999}
    assert got[1] == got[2] == got[999]


def test_bloom_stream_batch_vs_state(spark, tmp_path):
    """Three ingest steps against the O(m) Bloom state: in-batch dups
    collapse, cross-batch exact replays are rejected, novel docs pass;
    replaying an already-merged batch (checkpoint recovery) is
    idempotent — the state converges, nothing is re-accepted."""
    from cuvs_spark.streaming import bloom_dedup_batch_against_state

    state = str(tmp_path / "bstate")
    kw = dict(m_bits=63 * 256, k=4)
    b1 = spark.createDataFrame(
        [(0, "doc zero text"), (1, "doc one text"), (2, "doc zero text")],
        "doc_id long, text string")
    ok1 = bloom_dedup_batch_against_state(b1, state, **kw).toPandas()
    assert sorted(ok1.doc_id) == [0, 1]

    b2 = spark.createDataFrame(
        [(10, "doc zero text"), (11, "fresh words here")],
        "doc_id long, text string")
    ok2 = bloom_dedup_batch_against_state(b2, state, **kw).toPandas()
    assert sorted(ok2.doc_id) == [11]

    # replay of b2 (recovery): nothing re-accepted, state unchanged
    ok2b = bloom_dedup_batch_against_state(b2, state, **kw).toPandas()
    assert len(ok2b) == 0
    # mismatched parameters must refuse, not silently false-negative
    with pytest.raises(ValueError, match="m_bits"):
        bloom_dedup_batch_against_state(b2, state, m_bits=63 * 128, k=4)


def test_bloom_stream_smoke(spark, tmp_path):
    import time

    from cuvs_spark.streaming import start_streaming_bloom_dedup

    src = str(tmp_path / "bsrc")
    spark.createDataFrame(
        [(0, "streaming bloom alpha"), (1, "streaming bloom alpha"),
         (2, "streaming bloom beta")],
        "doc_id long, text string").write.parquet(src)
    q = start_streaming_bloom_dedup(
        spark, src, str(tmp_path / "bstate2"), str(tmp_path / "bok"),
        m_bits=63 * 256, trigger_seconds=0.5,
        checkpoint_dir=str(tmp_path / "bckpt"))
    try:
        deadline = time.time() + 60
        n = -1
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(tmp_path / "bok")).count()
                if n == 2:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert n == 2
    finally:
        q.stop()
