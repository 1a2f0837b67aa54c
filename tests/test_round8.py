"""Round-8 tests: ADVICE-fix coverage (versioned Bloom state, RIFF
routing, zero-frame WAV, bloom_build_sql metadata parity) plus the
verdict-requested streaming-Bloom checkpoint-recovery replay test and
the single_linkage driver-bound guard."""
from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Versioned Bloom state (ADVICE r7 #1): crash-safe commits
# ---------------------------------------------------------------------------

def test_bloom_state_versioned_commit_and_prune(spark, tmp_path):
    """Each ingest commits a NEW v=<n> table and prunes older ones
    only after the write succeeds; a partial (no _SUCCESS) version
    left by a crash is ignored by readers and cleaned up by the next
    commit."""
    from cuvs_spark.streaming import bloom_dedup_batch_against_state
    from cuvs_spark.streaming.bloom_stream import _state_versions

    state = str(tmp_path / "bstate")
    kw = dict(m_bits=63 * 256, k=4)
    b1 = spark.createDataFrame(
        [(0, "v-test alpha"), (1, "v-test beta")],
        "doc_id long, text string")
    bloom_dedup_batch_against_state(b1, state, **kw)
    bpath = os.path.join(state, "bloom")
    assert _state_versions(bpath) == [1]

    b2 = spark.createDataFrame(
        [(10, "v-test alpha"), (11, "v-test gamma")],
        "doc_id long, text string")
    ok2 = bloom_dedup_batch_against_state(b2, state, **kw).toPandas()
    assert sorted(ok2.doc_id) == [11]
    assert _state_versions(bpath) == [2]          # v=1 pruned post-commit

    # simulate a crash that left a partial new version: no _SUCCESS
    os.makedirs(os.path.join(bpath, "v=3"))
    with open(os.path.join(bpath, "v=3", "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _state_versions(bpath) == [2]          # partial ignored
    b3 = spark.createDataFrame(
        [(20, "v-test gamma"), (21, "v-test delta")],
        "doc_id long, text string")
    ok3 = bloom_dedup_batch_against_state(b3, state, **kw).toPandas()
    assert sorted(ok3.doc_id) == [21]             # state v=2 still probed
    assert _state_versions(bpath) == [3]          # overwrote the partial


def test_bloom_state_survives_crash_between_write_and_prune(spark, tmp_path):
    """If the process dies after committing v=n+1 but before pruning
    v=n, both versions sit on disk; the next ingest reads the newest
    and converges — no accumulated bit is ever lost."""
    import shutil

    from cuvs_spark.streaming import bloom_dedup_batch_against_state
    from cuvs_spark.streaming.bloom_stream import _state_versions

    state = str(tmp_path / "bstate2")
    kw = dict(m_bits=63 * 256, k=4)
    b1 = spark.createDataFrame([(0, "wp one"), (1, "wp two")],
                               "doc_id long, text string")
    bloom_dedup_batch_against_state(b1, state, **kw)
    bpath = os.path.join(state, "bloom")
    # resurrect a stale older version next to the committed one
    shutil.copytree(os.path.join(bpath, "v=1"), os.path.join(bpath, "v=0"))
    assert _state_versions(bpath) == [0, 1]
    b2 = spark.createDataFrame([(10, "wp one"), (11, "wp three")],
                               "doc_id long, text string")
    ok2 = bloom_dedup_batch_against_state(b2, state, **kw).toPandas()
    assert sorted(ok2.doc_id) == [11]             # newest state used
    assert _state_versions(bpath) == [2]          # both stale pruned


def test_bloom_stream_checkpoint_recovery_replay(spark, tmp_path):
    """End-to-end replay claim (r7 verdict #6): stop the stream after
    batch 1, add a second source file (one exact replay of batch 1 +
    one novel doc), restart from the SAME checkpoint — the accepted
    set is exactly one row per distinct text, nothing re-accepted."""
    from cuvs_spark.streaming import start_streaming_bloom_dedup

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    okdir = str(tmp_path / "ok")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def wait_accepted(n_expect, seconds=60):
        deadline = time.time() + seconds
        while time.time() < deadline:
            try:
                got = spark.read.parquet(okdir)
                if got.count() >= n_expect:
                    return got
            except Exception:
                pass
            time.sleep(0.5)
        raise AssertionError(f"accepted dir never reached {n_expect} rows")

    spark.createDataFrame(
        [(0, "ckpt alpha"), (1, "ckpt beta"), (2, "ckpt alpha")],
        "doc_id long, text string").write.parquet(os.path.join(src, "b1"))
    q = start_streaming_bloom_dedup(spark, src + "/*", state, okdir,
                                    m_bits=63 * 256, trigger_seconds=0.5,
                                    checkpoint_dir=ckpt)
    try:
        got1 = wait_accepted(2)
        assert sorted(r["doc_id"] for r in got1.collect()) == [0, 1]
    finally:
        q.stop()
        q.awaitTermination(30)

    spark.createDataFrame(
        [(10, "ckpt alpha"), (11, "ckpt gamma")],
        "doc_id long, text string").write.parquet(os.path.join(src, "b2"))
    q2 = start_streaming_bloom_dedup(spark, src + "/*", state, okdir,
                                     m_bits=63 * 256, trigger_seconds=0.5,
                                     checkpoint_dir=ckpt)
    try:
        got2 = wait_accepted(3)
        ids = sorted(r["doc_id"] for r in got2.collect())
        assert ids == [0, 1, 11]     # replayed text rejected; novel kept
    finally:
        q2.stop()
        q2.awaitTermination(30)


# ---------------------------------------------------------------------------
# epoch_shuffle is plan-only at construction (r7 verdict #3)
# ---------------------------------------------------------------------------

def test_epoch_shuffle_plan_only_construction(spark):
    """Constructing the epoch-shuffle DataFrame must run NO job: the
    bucket is a pure column function (no spark_partition_id, no
    localCheckpoint, no driver collect), so a column that errors at
    runtime passes construction and only fails on the first action."""
    from cuvs_spark.pipeline.sampling import epoch_shuffle

    d = (spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.expr("assert_true(id < 0)").alias("boom")))
    out = epoch_shuffle(d, 1)          # would raise if it materialized
    out.explain()                      # analysis/plan printing is safe too
    with pytest.raises(Exception):
        out.collect()

    # and the ranks themselves: a dense permutation of 1..n that is
    # reproducible and epoch-decorrelated
    d2 = spark.range(100).select(F.col("id").alias("doc_id"))
    r3 = {r["doc_id"]: r["shuffle_rank"]
          for r in epoch_shuffle(d2, 3).collect()}
    r3b = {r["doc_id"]: r["shuffle_rank"]
           for r in epoch_shuffle(d2.repartition(7), 3,
                                  n_partitions=5).collect()}
    assert r3 == r3b                   # topology/bucket-count invariant
    assert sorted(r3.values()) == list(range(1, 101))


# ---------------------------------------------------------------------------
# bloom_build_sql metadata parity (ADVICE r7 #4)
# ---------------------------------------------------------------------------

def test_bloom_build_sql_row_identical_and_self_describing(spark):
    """The DuckDB builder emits the same self-describing table as the
    Spark builder — including the word_idx=-1/-2 metadata rows — so a
    filter materialized from the SQL path probes without explicit
    m_bits/k."""
    import duckdb

    from cuvs_spark.pipeline.dedup import (bloom_build, bloom_build_sql,
                                           bloom_contains)

    texts = [(i, f"sqlpar doc {i} words") for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    m, k = 63 * 128, 3
    spark_rows = sorted(map(tuple, bloom_build(df, m_bits=m, k=k)
                            .select("word_idx", "bits").collect()))

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    duck_rows = sorted(map(tuple, con.execute(
        bloom_build_sql("SELECT doc_id, text FROM documents", m, k))
        .fetchall()))
    assert spark_rows == duck_rows
    assert (-1, m) in duck_rows and (-2, k) in duck_rows

    # a filter rebuilt from the DuckDB rows is probe-able with no params
    filt = spark.createDataFrame(duck_rows, "word_idx long, bits long")
    out = {r["doc_id"]: r["maybe_dup"]
           for r in bloom_contains(df, filt).collect()}
    assert all(out[i] == 1 for i in range(40))


# ---------------------------------------------------------------------------
# single_linkage driver bound (r7 verdict #4)
# ---------------------------------------------------------------------------

def test_single_linkage_driver_row_guard(spark, vectors_df):
    """Above max_driver_rows the exact-dendrogram finish must refuse
    with a clear error (it holds all ids driver-side by design), not
    OOM the driver; under the bound it clusters normally."""
    from cuvs_spark.cluster.agglomerative import single_linkage

    with pytest.raises(ValueError, match="max_driver_rows"):
        single_linkage(vectors_df, 5, max_driver_rows=10)
    out = single_linkage(vectors_df.limit(30), 5, k=10)
    labels = {r["label"] for r in out.collect()}
    assert len(labels) == 5


# ---------------------------------------------------------------------------
# Multimodal routing guards (ADVICE r7 #2, #3)
# ---------------------------------------------------------------------------

def _wav_bytes(samples, rate=8000):
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def test_riff_non_wave_raises_not_implemented():
    """An AVI/WEBP RIFF container must hit the documented
    NotImplementedError, not an opaque wave.Error."""
    from cuvs_spark.pipeline.multimodal import decode_pcm

    avi = b"RIFF" + (1000).to_bytes(4, "little") + b"AVI " + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="AVI"):
        decode_pcm(avi, 16)
    webp = b"RIFF" + (1000).to_bytes(4, "little") + b"WEBP" + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="WEBP"):
        decode_pcm(webp, 16)
    # real WAVE still decodes
    x = decode_pcm(_wav_bytes([100, -100, 200]), 0)
    assert x.tolist() == [100, -100, 200]


def test_audio_features_zero_frame_wav(spark):
    """A valid zero-frame WAV yields silence stats (all-zero row), not
    a NaN or an empty-array crash that fails the whole Arrow batch."""
    from cuvs_spark.pipeline.multimodal import audio_features

    rows = [(1, _wav_bytes([])), (2, _wav_bytes([1000, -1000, 0, 500]))]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r["id"]: r for r in audio_features(df).collect()}
    z = out[1]
    assert (z["rms"], z["zcr"], z["peak"], z["duration_s"]) == (0, 0, 0, 0)
    nz = out[2]
    assert nz["peak"] > 0 and nz["duration_s"] > 0
    assert not any(np.isnan([nz["rms"], nz["zcr"], nz["peak"]]))


# ---------------------------------------------------------------------------
# Round-8 novel operators
# ---------------------------------------------------------------------------

def test_borda_fuse_hand_example(spark):
    """Positional points: depth=3 gives 3/2/1 points by rank; items in
    both lists sum; absent items score only their one list."""
    from cuvs_spark.pipeline.retrieval import borda_fuse

    a = spark.createDataFrame([(1, 10, 1), (1, 11, 2), (1, 12, 3)],
                              "qid long, doc_id long, rank long")
    b = spark.createDataFrame([(1, 11, 1), (1, 13, 2), (1, 10, 3)],
                              "qid long, doc_id long, rank long")
    out = {r["doc_id"]: (r["borda_score"], r["rank"])
           for r in borda_fuse([a, b], 10, depth=3).collect()}
    # 10: (3-1+1)+(3-3+1)=4 ; 11: 2+3=5 ; 12: 1 ; 13: 2
    assert out[11] == (5, 1)
    assert out[10] == (4, 2)
    assert out[13] == (2, 3)
    assert out[12] == (1, 4)
    with pytest.raises(ValueError):
        borda_fuse([], 10)


def test_mmr_diversify_prefers_diverse_pick(spark):
    """Three near-identical high-relevance candidates and one distinct
    lower-relevance one: pure relevance would pick the three clones
    first; MMR (lam=0.5) must pick the distinct vector second."""
    from cuvs_spark.pipeline.retrieval import mmr_diversify

    rows = [
        (1, 100, 0.99, [1.0, 0.0, 0.0]),
        (1, 101, 0.98, [0.999, 0.01, 0.0]),   # clone of 100
        (1, 102, 0.97, [0.998, 0.02, 0.0]),   # clone of 100
        (1, 200, 0.60, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    cand = spark.createDataFrame(
        rows, "qid long, doc_id long, rel double, vec array<double>")
    out = {r["mmr_rank"]: r["doc_id"]
           for r in mmr_diversify(cand, 3, lam=0.5).collect()}
    assert out[1] == 100          # most relevant first
    assert out[2] == 200          # diversity beats the clones
    assert out[3] == 101          # then best remaining clone
    # lam=1.0 degenerates to pure relevance order
    out_rel = {r["mmr_rank"]: r["doc_id"]
               for r in mmr_diversify(cand, 3, lam=1.0).collect()}
    assert (out_rel[1], out_rel[2], out_rel[3]) == (100, 101, 102)
    with pytest.raises(ValueError):
        mmr_diversify(cand, 3, lam=1.5)


def test_mrr_score_rational_exact(spark):
    """Hand example: ranks 1, 4 and one miss over 3 queries →
    MRR = (1 + 1/4 + 0) / 3 exactly."""
    from cuvs_spark.stats.metrics import mrr_score

    ann = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2),
         (2, 20, 1), (2, 21, 2), (2, 22, 3), (2, 23, 4),
         (3, 30, 1)],
        "qid long, nid long, rank long")
    truth = spark.createDataFrame([(1, 10), (2, 23), (3, 99)],
                                  "qid long, nid long")
    got = mrr_score(ann, truth).collect()[0]["mrr"]
    assert got == (1.0 + 0.25 + 0.0) / 3.0
    with pytest.raises(ValueError, match="k <= 10"):
        mrr_score(ann, truth, k=20)


def test_group_mmd_matches_numpy(spark, rng):
    """MMD² equals the squared distance between rounded group means;
    a group duplicated under two labels scores ~0 against itself."""
    from cuvs_spark.stats.metrics import group_mmd

    X = rng.normal(0, 1, (40, 6))
    rows = ([(int(i), 0, [float(v) for v in X[i]]) for i in range(20)]
            + [(int(i + 20), 1, [float(v) for v in X[i + 20]])
               for i in range(10)]
            + [(int(i + 30), 2, [float(v) for v in X[i + 20]])
               for i in range(10)])   # label 2 duplicates label 1
    df = spark.createDataFrame(rows, "id long, label long, vec array<double>")
    out = {(r["group_a"], r["group_b"]): r["mmd2"]
           for r in group_mmd(df, group_col="label").collect()}
    m0 = np.round(X[:20].mean(0), 6)
    m1 = np.round(X[20:30].mean(0), 6)
    assert abs(out[(0, 1)] - float(((m0 - m1) ** 2).sum())) < 1e-9
    assert out[(1, 2)] == 0.0          # identical groups
    assert set(out) == {(0, 1), (0, 2), (1, 2)}


def test_vocab_gini_known_values(spark):
    """Uniform frequencies → gini 0; a known skewed distribution
    matches the direct rank-sum formula computed in Python."""
    from cuvs_spark.pipeline.text import vocab_gini

    uni = spark.createDataFrame([(1, "a b c d")],
                                "doc_id long, text string")
    r = vocab_gini(uni).collect()[0]
    assert (r["gini"], r["n_vocab"], r["total_tokens"]) == (0.0, 4, 4)

    skew = spark.createDataFrame([(1, "a a a a a a b b c")],
                                 "doc_id long, text string")
    r2 = vocab_gini(skew).collect()[0]
    f = sorted([6, 2, 1])              # ascending
    n, s0 = len(f), sum(f)
    s1 = sum((i + 1) * fi for i, fi in enumerate(f))
    assert r2["gini"] == (2.0 * s1 - (n + 1) * s0) / (n * s0)
    assert (r2["n_vocab"], r2["total_tokens"]) == (3, 9)


def test_collocations_counts_and_lift(spark):
    """Tiny corpus with a known bigram structure: counts and lift
    match hand computation; min_count prunes."""
    from cuvs_spark.pipeline.text import collocations

    docs = spark.createDataFrame(
        [(1, "new york new york new york"),
         (2, "new york is big"),
         (3, "big apple big apple")],
        "doc_id long, text string")
    out = {(r["w1"], r["w2"]): (r["pair_count"], r["lift"])
           for r in collocations(docs, 10, min_count=2).collect()}
    # pairs: doc1: (new,york)x3 (york,new)x2 ; doc2: (new,york)(york,is)
    # (is,big) ; doc3: (big,apple)x2 (apple,big)x1  -> N = 11
    assert out[("new", "york")][0] == 4
    # lift(new,york) = 11*4 / (cl(new)=4 * cr(york)=4) = 2.75
    assert out[("new", "york")][1] == 2.75
    assert out[("big", "apple")][0] == 2
    # lift(big,apple) = 11*2 / (cl(big)=2 * cr(apple)=2) = 5.5
    assert out[("big", "apple")][1] == 5.5
    assert ("apple", "big") not in out     # pair_count 1 < min_count


def test_embedding_norm_quantiles_matches_numpy(spark, rng):
    """Squared-norm percentiles equal NumPy's linear-interpolation
    (type-7) percentiles of the sequential-fold squared norms."""
    from cuvs_spark.stats.metrics import embedding_norm_quantiles

    X = rng.normal(0, 1, (60, 5))
    rows = [(int(i), int(i % 2), [float(v) for v in X[i]])
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, label long, vec array<double>")
    out = {r["label"]: [r["q1"], r["q2"], r["q3"], r["q4"]]
           for r in embedding_norm_quantiles(
               df, group_col="label", vec_col="vec").collect()}
    for lbl in (0, 1):
        sq = (X[lbl::2] ** 2).sum(1)
        exp = np.percentile(sq, [25, 50, 75, 90])
        assert np.allclose(out[lbl], np.round(exp, 6), atol=2e-6)


def test_ngram_containment_finds_excerpts_jaccard_misses(spark):
    """A short doc copied verbatim inside a long doc: containment 1.0
    while its Jaccard vs the source is far below any near-dup bar;
    docs sharing only a super-common (df > max_df) gram never pair."""
    from cuvs_spark.pipeline.dedup import (ngram_containment_pairs,
                                           ngram_jaccard_pairs)

    excerpt = "the rare quick zebra vaulted"
    filler = " ".join(f"word{i} filler{i}" for i in range(60))
    # 25 docs sharing ONLY a common block (df=25 > max_df=20 → burned)
    # plus long tails whose grams are unique (df=1 → not rare either)
    docs = [(1, f"{filler} {excerpt} {filler}"),
            (2, excerpt)] + \
           [(10 + i,
             "common shared prefix block "
             + " ".join(f"t{i}w{j} uq{i}x{j}" for j in range(8)))
            for i in range(25)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in ngram_containment_pairs(df, 8, threshold=0.8,
                                            max_df=20).collect()}
    assert out[(1, 2)] == 1.0
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, 8).collect()}
    assert jac[(1, 2)] < 0.05          # Jaccard misses the excerpt
    # burned-gram-only sharing generates no candidate pairs
    assert all(a == 1 and b == 2 for (a, b) in out)


def test_temperature_mixture_sqrt_weights(spark):
    """t=0.5 weights equal sqrt(n_tokens) shares; rates cap at 1 for
    sources smaller than their slice; agrees with the driver-side
    temperature_rates helper on the same counts."""
    from cuvs_spark.pipeline.sampling import (temperature_mixture,
                                              temperature_rates)
    import math

    rows = ([(f"d{i}", "big", "w " * 100) for i in range(90)]
            + [(f"e{i}", "small", "w " * 100) for i in range(10)])
    df = spark.createDataFrame(
        [(i, s, t) for i, (_, s, t) in enumerate(rows)],
        "doc_id long, source string, text string")
    out = {r["source"]: r for r in
           temperature_mixture(df, 5000, tokens_col=None).collect()}
    wb, ws = math.sqrt(9000.0), math.sqrt(1000.0)
    assert abs(out["big"]["weight"] - wb / (wb + ws)) < 1e-12
    assert abs(out["small"]["weight"] - ws / (wb + ws)) < 1e-12
    assert out["big"]["n_tokens"] == 9000
    # budget*weight/n_tokens: big gets ~0.42, small ~1.2 -> capped
    assert out["small"]["sample_rate"] == 1.0
    exp = temperature_rates({"big": 9000, "small": 1000}, 5000)
    assert abs(out["big"]["sample_rate"] - exp["big"]) < 1e-12


def test_round8_plan_shapes(spark):
    """Scale claims pinned: no cartesian products / nested-loop joins
    anywhere in the round-8 family; group_mmd's only join inputs are
    the tiny per-group tables; collocations' marginal joins hash on
    the word keys."""
    from cuvs_spark.pipeline.dedup import ngram_containment_pairs
    from cuvs_spark.pipeline.retrieval import borda_fuse, mmr_diversify
    from cuvs_spark.pipeline.text import collocations, vocab_gini
    from cuvs_spark.plans.layout import plan_string
    from cuvs_spark.stats.metrics import (embedding_norm_quantiles,
                                          group_mmd)

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} delta epsilon zeta", "s1")
         for i in range(30)],
        "doc_id long, text string, source string")
    emb = spark.createDataFrame(
        [(i, i % 3, [float(i), 1.0, 2.0]) for i in range(30)],
        "id long, label long, vec array<double>")
    rk = spark.createDataFrame([(1, 10, 1)],
                               "qid long, doc_id long, rank long")
    cand = spark.createDataFrame(
        [(1, 10, 0.9, [1.0, 0.0]), (1, 11, 0.8, [0.0, 1.0])],
        "qid long, doc_id long, rel double, vec array<double>")
    # no un-broadcast cartesian products anywhere in the family
    for df in (collocations(docs, 10),
               vocab_gini(docs),
               ngram_containment_pairs(docs, 8),
               borda_fuse([rk, rk], 10),
               mmr_diversify(cand, 2),
               group_mmd(emb, group_col="label", vec_col="vec"),
               embedding_norm_quantiles(emb, group_col="label",
                                        vec_col="vec")):
        assert "CartesianProduct" not in plan_string(df)
    # row-level operators must not nested-loop at all (collocations /
    # group_mmd DO carry one BroadcastNestedLoopJoin each by design —
    # a broadcast 1-row scalar attach / the per-group MEAN table
    # cross, both O(groups), never row-level)
    for df in (ngram_containment_pairs(docs, 8),
               borda_fuse([rk, rk], 10),
               mmr_diversify(cand, 2),
               vocab_gini(docs),
               embedding_norm_quantiles(emb, group_col="label",
                                        vec_col="vec")):
        assert "BroadcastNestedLoopJoin" not in plan_string(df)


def test_asof_forward_direction(spark):
    """Forward as-of attaches the EARLIEST right row at-or-after each
    left timestamp; tolerance nulls far matches (sentinel projection
    left to callers)."""
    from cuvs_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100.0), (2, 205.0), (3, 500.0)],
        "event_id long, ts double")
    right = spark.createDataFrame(
        [(150.0, 15), (210.0, 21), (220.0, 22)], "ts double, p long")
    out = {r["event_id"]: (r["r_ts"], r["r_p"])
           for r in asof_join(left, right, on="ts",
                              direction="forward").collect()}
    assert out[1] == (150.0, 15)       # earliest at-or-after 100
    assert out[2] == (210.0, 21)       # not 220
    assert out[3] == (None, None)      # nothing after 500
    # tolerance: match farther than 40s nulls out
    out2 = {r["event_id"]: r["r_p"]
            for r in asof_join(left, right, on="ts", tolerance=40.0,
                               direction="forward").collect()}
    assert out2[1] is None             # gap 50 > 40
    assert out2[2] == 21


def test_degree_histogram_zero_degree_and_counts(spark):
    """Histogram counts match a hand-built graph, including the
    unreachable in_degree=0 row."""
    from cuvs_spark.operators.graph import degree_histogram

    # 1->2, 1->3, 2->3, 3->2 : in-deg 1:0, 2:2, 3:2
    g = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (3, 2)],
                              "src long, dst long")
    out = {r["in_degree"]: r["n_nodes"]
           for r in degree_histogram(g).collect()}
    assert out == {0: 1, 2: 2}
    # explicit node universe adds isolated node 9 to the zero row
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id long")
    out2 = {r["in_degree"]: r["n_nodes"]
            for r in degree_histogram(g, nodes=nodes).collect()}
    assert out2 == {0: 2, 2: 2}


def test_bloom_exactly_once_epoch_replay(spark, tmp_path):
    """Epoch-keyed ingest: the accepted output is written before the
    state commit, and a replay of a committed epoch returns the SAME
    accepted rows instead of re-probing a state that already contains
    the batch (the crash-between-commit-and-output hole)."""
    import os
    from cuvs_spark.streaming import bloom_dedup_batch_against_state

    state = str(tmp_path / "bstate")
    acc = str(tmp_path / "accepted")
    kw = dict(m_bits=63 * 256, k=4)
    b0 = spark.createDataFrame(
        [(0, "eo alpha"), (1, "eo beta")], "doc_id long, text string")
    ok0 = bloom_dedup_batch_against_state(
        b0, state, epoch_id=0,
        accepted_path=os.path.join(acc, "epoch=0"), **kw)
    assert sorted(r.doc_id for r in ok0.collect()) == [0, 1]
    # replay of the committed epoch: same rows, no state double-merge
    replay = bloom_dedup_batch_against_state(
        b0, state, epoch_id=0,
        accepted_path=os.path.join(acc, "epoch=0"), **kw)
    assert sorted(r.doc_id for r in replay.collect()) == [0, 1]
    # next epoch still rejects the epoch-0 texts
    b1 = spark.createDataFrame(
        [(10, "eo alpha"), (11, "eo gamma")], "doc_id long, text string")
    ok1 = bloom_dedup_batch_against_state(
        b1, state, epoch_id=1,
        accepted_path=os.path.join(acc, "epoch=1"), **kw)
    assert sorted(r.doc_id for r in ok1.collect()) == [11]


def test_bloom_epoch_args_must_pair(spark, tmp_path):
    import pytest as _pt
    from cuvs_spark.streaming import bloom_dedup_batch_against_state
    b = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pt.raises(ValueError, match="pair"):
        bloom_dedup_batch_against_state(b, str(tmp_path / "s"),
                                        m_bits=63 * 256, epoch_id=3)
