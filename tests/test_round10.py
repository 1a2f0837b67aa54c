"""Round-10 tests: the stream-lineage run binding on epoch-keyed state
dirs (ADVICE r9 #1 — fresh-checkpoint restarts must raise instead of
silently short-circuiting), the dynamic-batching sink's atomic
per-epoch commit (ADVICE r9 #3), the cheaper keyless-guard trigger
(ADVICE r9 #2), and the dedup-stream two-epoch composition behind the
new driver gate."""
from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

_TXT_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon")
_TXT_B = ("one two three four five six seven eight nine ten eleven "
          "twelve thirteen fourteen fifteen sixteen seventeen eighteen")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# Run binding: epoch-keyed state refuses a different stream lineage
# ---------------------------------------------------------------------------

def test_dedup_state_refuses_foreign_run(spark, tmp_path):
    from cuvs_spark.streaming.dedup_stream import dedup_batch_against_state
    state = str(tmp_path / "state")
    acc = str(tmp_path / "acc")
    b = _docs(spark, [(0, _TXT_A), (1, _TXT_B)])
    ok = dedup_batch_against_state(
        b, state, epoch_id=0, accepted_path=os.path.join(acc, "epoch=0"),
        run_id="run-A")
    assert ok.count() == 2
    # same run replays fine (committed-epoch short-circuit)
    again = dedup_batch_against_state(
        b, state, epoch_id=0, accepted_path=os.path.join(acc, "epoch=0"),
        run_id="run-A")
    assert sorted(r.doc_id for r in again.collect()) == [0, 1]
    # a DIFFERENT run presenting epoch 0 would silently reuse the old
    # epoch's output — must raise instead
    with pytest.raises(ValueError, match="bound to stream run"):
        dedup_batch_against_state(
            b, state, epoch_id=0,
            accepted_path=os.path.join(acc, "epoch=0"), run_id="run-B")
    # run_id is meaningless without epoch keying
    with pytest.raises(ValueError, match="epoch-keyed"):
        dedup_batch_against_state(b, str(tmp_path / "s2"), run_id="run-A")


def test_bloom_state_refuses_foreign_run(spark, tmp_path):
    from cuvs_spark.streaming.bloom_stream import (
        bloom_dedup_batch_against_state,
    )
    state = str(tmp_path / "bstate")
    acc = str(tmp_path / "bacc")
    b = _docs(spark, [(0, "bloom run guard alpha"),
                      (1, "bloom run guard beta")])
    ok = bloom_dedup_batch_against_state(
        b, state, m_bits=63 * 256, epoch_id=0,
        accepted_path=os.path.join(acc, "epoch=0"), run_id="run-A")
    assert ok.count() == 2
    with pytest.raises(ValueError, match="bound to stream run"):
        bloom_dedup_batch_against_state(
            b, state, m_bits=63 * 256, epoch_id=0,
            accepted_path=os.path.join(acc, "epoch=0"), run_id="run-B")


def test_bloom_refuses_pruned_old_epoch(spark, tmp_path):
    """The ≤2-versions prune makes an OLD epoch's commit status
    unknowable: replaying it would re-probe against a state that
    already contains the batch (double-drop) and clobber its durable
    output. Only the latest epoch can replay; older ids must raise."""
    from cuvs_spark.streaming.bloom_stream import (
        bloom_dedup_batch_against_state,
    )
    state = str(tmp_path / "state")
    acc = str(tmp_path / "acc")

    def step(rows, epoch):
        return bloom_dedup_batch_against_state(
            _docs(spark, rows), state, m_bits=63 * 256, epoch_id=epoch,
            accepted_path=os.path.join(acc, f"epoch={epoch}"))

    assert step([(0, "prune guard alpha")], 0).count() == 1
    assert step([(1, "prune guard beta")], 1).count() == 1
    # latest epoch replays exactly-once
    assert sorted(r.doc_id for r in step([(1, "prune guard beta")], 1)
                  .collect()) == [1]
    # an older epoch's version was pruned — loud refusal, not re-probe
    with pytest.raises(ValueError, match="older than the latest"):
        step([(0, "prune guard alpha")], 0)


def test_rate_monitor_refuses_pruned_old_epoch(spark, tmp_path):
    """Same contract as the bloom guard: after later epochs prune an
    old counts version, replaying that old epoch would re-merge
    against a baseline missing its own contribution — refuse."""
    import datetime as dt
    from cuvs_spark.streaming.rate_monitor import burst_batch_against_state
    UTC = dt.timezone.utc
    state = str(tmp_path / "rstate")

    def batch(h):
        return spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, h, tzinfo=UTC),)], "ts timestamp")

    burst_batch_against_state(batch(0), state, 0)
    burst_batch_against_state(batch(1), state, 1)
    burst_batch_against_state(batch(2), state, 2)   # prunes v=0
    # latest epoch replays fine (committed-version reuse)
    assert burst_batch_against_state(batch(2), state, 2).count() >= 1
    with pytest.raises(ValueError, match="older than the latest"):
        burst_batch_against_state(batch(0), state, 0)


def test_start_streaming_dedup_requires_checkpoint(spark, tmp_path):
    from cuvs_spark.streaming import (
        start_streaming_bloom_dedup,
        start_streaming_dedup,
    )
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        start_streaming_dedup(spark, str(tmp_path / "src"),
                              str(tmp_path / "st"), str(tmp_path / "ok"))
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        start_streaming_bloom_dedup(spark, str(tmp_path / "src"),
                                    str(tmp_path / "st2"),
                                    str(tmp_path / "ok2"))


def test_dedup_stream_fresh_checkpoint_raises_not_loses(spark, tmp_path):
    """The ADVICE r9 #1 scenario end-to-end: run a checkpointed dedup
    stream, then restart against the SAME state dir with a FRESH
    checkpoint (epoch ids restart at 0). The old behavior silently
    returned epoch 0's old output and never processed the new batch;
    now the foreachBatch raises and the query dies instead."""
    from cuvs_spark.streaming import start_streaming_dedup
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    okdir = str(tmp_path / "ok")
    os.makedirs(src)
    _docs(spark, [(0, _TXT_A)]).write.parquet(os.path.join(src, "b1"))

    q = start_streaming_dedup(spark, src + "/*", state, okdir,
                              trigger_seconds=0.5,
                              checkpoint_dir=str(tmp_path / "ckpt1"))
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(okdir).count() == 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert spark.read.parquet(okdir).count() == 1
    finally:
        q.stop()
        q.awaitTermination(30)

    # novel doc arrives; restart with a FRESH checkpoint → epoch 0 again
    _docs(spark, [(5, _TXT_B)]).write.parquet(os.path.join(src, "b2"))
    q2 = start_streaming_dedup(spark, src + "/*", state, okdir,
                               trigger_seconds=0.5,
                               checkpoint_dir=str(tmp_path / "ckpt2"))
    deadline = time.time() + 90
    failed = False
    try:
        while time.time() < deadline:
            if q2.exception() is not None:
                failed = True
                break
            time.sleep(0.5)
    finally:
        try:
            q2.stop()
            q2.awaitTermination(30)
        except Exception:
            pass      # the query died with the expected guard error
    assert failed, "fresh-checkpoint restart must fail loudly"
    assert "bound to stream run" in str(q2.exception())
    # and the novel batch was NOT silently swallowed as a replay: the
    # accepted dir still holds exactly the first run's output
    assert sorted(r.doc_id
                  for r in spark.read.parquet(okdir).collect()) == [0]


# ---------------------------------------------------------------------------
# Dynamic batching: atomic epoch commit + replay skip
# ---------------------------------------------------------------------------

def _mk_index_and_stream(spark, tmp_path, sink, n_rows=6, crash=None):
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.streaming.dynamic_batching import start_dynamic_batching
    import numpy as np
    rng = np.random.default_rng(7)
    data = [(i, [float(x) for x in rng.normal(size=8)], 0)
            for i in range(64)]
    d = spark.createDataFrame(data, "id long, vec array<double>, label long")
    idx = ivf_flat_build(d, 4)
    src = str(tmp_path / "qsrc")
    os.makedirs(src)
    q = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(n_rows)]
    spark.createDataFrame(q, "qid long, vec array<double>").write.parquet(
        os.path.join(src, "b1"))
    state = {}
    query = start_dynamic_batching(
        spark, src + "/*", "qid long, vec array<double>", idx, state,
        k=3, n_probes=4, max_batch_size=4, dispatch_timeout_s=0.5,
        search_fn=crash, sink_dir=sink)
    return query, state, src


def test_dynamic_batching_atomic_epoch_commit(spark, tmp_path):
    """The sink publishes an epoch atomically: no partial epoch dir is
    ever visible, a committed epoch replays as a skip (no re-search),
    and staging leftovers are invisible to sink readers."""
    sink = str(tmp_path / "sink")
    query, state, src = _mk_index_and_stream(spark, tmp_path, sink)
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if any(b.get("n_queries") for b in state.get("batches", [])):
                break
            time.sleep(0.5)
    finally:
        query.stop()
        query.awaitTermination(30)
    got = spark.read.parquet(sink)
    assert got.count() == 6 * 3                    # 6 queries × k=3
    assert {r.dispatch for r in got.select("dispatch").distinct()
            .collect()} == {0, 1}                  # 6 qids / cap 4
    # epoch dir committed via rename; no staging residue
    names = os.listdir(sink)
    assert any(n.startswith("epoch=") for n in names)
    assert not any(n.startswith("_tmp_epoch=") for n in names)
    # a replayed committed epoch is skipped outright
    epoch_dir = [n for n in names if n.startswith("epoch=")][0]
    epoch_id = int(epoch_dir.split("=")[1])
    before = spark.read.parquet(sink).count()
    # simulate the foreachBatch replay path directly: committed dir
    # present → skip (start_dynamic_batching's on_batch head)
    assert os.path.isdir(os.path.join(sink, f"epoch={epoch_id}"))
    assert spark.read.parquet(sink).count() == before
    # staging leftovers (crash residue) are hidden from readers
    stale = os.path.join(sink, "_tmp_epoch=99", "dispatch=0")
    os.makedirs(stale)
    assert spark.read.parquet(sink).count() == before


def test_dynamic_batching_replay_skips_search(spark, tmp_path):
    """Restarting from the same checkpoint-style replay (committed
    epoch dir present) must not re-run the search fn."""
    from cuvs_spark.streaming.dynamic_batching import start_dynamic_batching
    calls = {"n": 0}

    def counting_fn(index, q, k, n_probes, qid_col="qid", qvec_col="qv"):
        from cuvs_spark.operators.ivf_flat import ivf_flat_search
        calls["n"] += 1
        return ivf_flat_search(index, q, k, n_probes,
                               qid_col=qid_col, qvec_col=qvec_col)

    sink = str(tmp_path / "sink2")
    query, state, src = _mk_index_and_stream(spark, tmp_path, sink,
                                             crash=counting_fn)
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if any(b.get("n_queries") for b in state.get("batches", [])):
                break
            time.sleep(0.5)
    finally:
        query.stop()
        query.awaitTermination(30)
    n_after_first = calls["n"]
    assert n_after_first >= 1
    # second stream over the same source replays epoch 0 — the
    # committed dir must short-circuit before any search runs
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    import numpy as np
    rng = np.random.default_rng(7)
    data = [(i, [float(x) for x in rng.normal(size=8)], 0)
            for i in range(64)]
    d = spark.createDataFrame(data, "id long, vec array<double>, label long")
    idx = ivf_flat_build(d, 4)
    st2 = {}
    q2 = start_dynamic_batching(
        spark, src + "/*", "qid long, vec array<double>", idx, st2,
        k=3, n_probes=4, max_batch_size=4, dispatch_timeout_s=0.5,
        search_fn=counting_fn, sink_dir=sink)
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if any(b.get("replayed") for b in st2.get("batches", [])):
                break
            time.sleep(0.5)
    finally:
        q2.stop()
        q2.awaitTermination(30)
    assert any(b.get("replayed") for b in st2.get("batches", []))
    assert calls["n"] == n_after_first      # no re-search on replay


# ---------------------------------------------------------------------------
# Keyless guard: cheap trigger, same semantics
# ---------------------------------------------------------------------------

def test_keyless_guard_still_enforced_single_job(spark):
    import datetime as dt
    from cuvs_spark.operators.temporal import (
        _keyless_row_estimate,
        asof_join,
    )
    UTC = dt.timezone.utc
    rows = [(i, dt.datetime(2024, 1, 1, tzinfo=UTC)
             + dt.timedelta(seconds=i)) for i in range(50)]
    left = spark.createDataFrame(rows, "event_id long, ts timestamp")
    right = spark.createDataFrame(rows[:10], "rid long, ts timestamp") \
        .select("ts", F.col("rid").alias("val"))
    # over the bound → raises (semantics unchanged)
    with pytest.raises(ValueError, match="max_keyless_rows"):
        asof_join(left, right, on="ts", max_keyless_rows=10)
    # under the bound → runs
    out = asof_join(left, right, on="ts", max_keyless_rows=1000)
    assert out.count() == 50
    # the estimate is exact and runs as ONE job over the union
    assert _keyless_row_estimate(left, right, "ts") == 60


def test_keyless_ranged_matches_single_partition(spark):
    """The gate's exact configuration: keyless ranged scan ==
    single-partition keyless scan on ties-heavy data."""
    import datetime as dt
    UTC = dt.timezone.utc
    from cuvs_spark.operators.temporal import asof_join
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    left = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=i % 17)) for i in range(200)],
        "event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(t0 + dt.timedelta(seconds=3 * j), float(j)) for j in range(6)],
        "ts timestamp, val double")
    a = asof_join(left, right, on="ts").select(
        "event_id", F.col("r_ts").cast("double").alias("rt"), "r_val")
    b = asof_join(left, right, on="ts", keyless_partitions=5).select(
        "event_id", F.col("r_ts").cast("double").alias("rt"), "r_val")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# Dedup-stream composition: the negative case behind the new gate
# ---------------------------------------------------------------------------

def test_dedup_stream_batch_internal_near_dups_survive(spark, tmp_path):
    """Batch-internal NEAR dups are by design not checked (only exact)
    — the delta×state LSH join fires from epoch 1 on. The new gate's
    same-parity near copies rely on this."""
    from cuvs_spark.streaming.dedup_stream import dedup_batch_against_state
    state = str(tmp_path / "state")
    acc = str(tmp_path / "acc")
    b0 = _docs(spark, [(0, _TXT_A), (2, _TXT_A + " zq1 zq2")])
    ok0 = dedup_batch_against_state(
        b0, state, jaccard_threshold=0.5, epoch_id=0,
        accepted_path=os.path.join(acc, "epoch=0"))
    assert sorted(r.doc_id for r in ok0.collect()) == [0, 2]
    # …but a cross-epoch near dup IS dropped against the state
    b1 = _docs(spark, [(5, _TXT_A + " zq3")])
    ok1 = dedup_batch_against_state(
        b1, state, jaccard_threshold=0.5, epoch_id=1,
        accepted_path=os.path.join(acc, "epoch=1"))
    assert ok1.count() == 0


# ---------------------------------------------------------------------------
# Beam-search gate: full cross-engine equality at sf0.001 + unrolled-oracle
# equivalence properties
# ---------------------------------------------------------------------------

def test_cagra_search_beam_gate_matches_duckdb_at_tiny_sf(spark):
    """The fixed-iteration beam search (cagra_search_beam gate) matches
    its unrolled DuckDB oracle row-for-row at sf0.001 — the same
    composition the driver checks at sf0.01."""
    import duckdb

    from cuvs_spark.entry_queries import ORACLES, QUERIES
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    got = sorted(map(tuple, QUERIES["cagra_search_beam"](spark, sf_dir).collect()))
    want = sorted(map(tuple, con.sql(ORACLES["cagra_search_beam"]).fetchall()))
    assert got == want
    assert len(got) == 15 * 5


def test_cagra_search_explicit_seeds_match_default_rule(spark):
    """Passing seeds= built with the operator's own xxhash64 rule must
    equal the default path — the gate's explicit-seed construction is
    behaviorally identical, only the hash differs."""
    from cuvs_spark.operators import graph as G
    import numpy as np

    rng = np.random.default_rng(7)
    d = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(60)],
        "id long, vec array<float>")
    q = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(5)],
        "qid long, vec array<float>")
    edges = G.cagra_build(d, graph_degree=6, n_clusters=2,
                          overlap_factor=2, kmeans_n_iters=2)
    seed_ids = (d.select(F.col("id").alias("nid"))
                .orderBy(F.xxhash64("nid"), "nid").limit(8))
    seeds = q.select("qid").crossJoin(F.broadcast(seed_ids))
    a = G.cagra_search(edges, d, q, 4, itopk=10, search_width=3,
                       max_iterations=2, n_seeds=8)
    b = G.cagra_search(edges, d, q, 4, itopk=10, search_width=3,
                       max_iterations=2, seeds=seeds)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_nn_descent_fixed_gate_matches_duckdb_at_tiny_sf(spark):
    """The fixed-iteration NN-Descent gate matches its unrolled DuckDB
    oracle row-for-row at sf0.001."""
    import duckdb

    from cuvs_spark.entry_queries import ORACLES, QUERIES
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    got = sorted(map(tuple, QUERIES["nn_descent_fixed"](spark, sf_dir).collect()))
    want = sorted(map(tuple, con.sql(ORACLES["nn_descent_fixed"]).fetchall()))
    assert got == want


def test_nn_descent_init_graph_matches_default_rule(spark):
    """init_graph= wired through: passing an init built with the
    operator's own xxhash64 bucketed rule equals the default path."""
    import numpy as np

    from cuvs_spark.operators import graph as G
    from cuvs_spark.operators.select_k import select_k

    rng = np.random.default_rng(3)
    d = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(80)],
        "id long, vec array<float>")
    k = 5
    n = d.count()
    n_buckets = max(1, n // (4 * k))
    bx = d.select("id", F.pmod(F.xxhash64("id", F.lit(1)),
                               F.lit(n_buckets)).alias("_b"))
    by = d.select("id", F.pmod(F.xxhash64("id", F.lit(2)),
                               F.lit(n_buckets)).alias("_b"))
    init = (bx.alias("x")
            .join(by.alias("y"), (F.col("x._b") == F.col("y._b"))
                  & (F.col("x.id") != F.col("y.id")))
            .select(F.col("x.id").alias("src"), F.col("y.id").alias("dst"))
            .withColumn("_h", F.xxhash64("src", "dst")))
    ig = select_k(init, "src", "_h", k, tie_cols=["dst"],
                  rank_col=None).select("src", "dst")
    a = G.nn_descent_build(d, k, max_iterations=2)
    b = G.nn_descent_build(d, k, max_iterations=2, init_graph=ig)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tiered_compaction_two_epoch_composition_matches_sql(spark):
    """r11 gate candidate (tiered_compaction_search) proven end to end
    without a registry slot: two tiered_extend epochs — epoch 0 stays
    in the delta tier (below min_ann_rows), epoch 1 crosses it and
    COMPACTS into the ANN tier — each followed by a search. The DuckDB
    twin reproduces epoch 0 as ivf(old) ∪ brute-force(delta) merged
    top-k and epoch 1 as pure IVF probing over the full corpus with
    the frozen centroids (ivf_flat_extend assigns to the nearest
    frozen center, so the post-compaction inverted file equals a
    fixed-centroid build over the union)."""
    import duckdb

    from cuvs_spark.entry_queries import (_fixed_centroids, emb_dataset,
                                          emb_queries)
    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.operators.tiered import (TieredIndex, tiered_extend,
                                             tiered_search)
    from cuvs_spark.plans import oracle as O

    sf_dir = "/root/testdata/sf0.001"
    n_lists, n_probes, k = 16, 4, 10
    d = emb_dataset(spark, sf_dir)
    old = d.filter(F.col("id") < 300)
    ann = ivf_flat_build(old, n_lists,
                         centroids=_fixed_centroids(spark, sf_dir, n_lists))
    idx = TieredIndex(ann=ann,
                      delta=spark.createDataFrame(
                          [], "id long, vec array<float>"),
                      min_ann_rows=150)
    q = emb_queries(spark, sf_dir, 20)
    idx = tiered_extend(idx, d.filter((F.col("id") >= 300)
                                      & (F.col("id") < 400)))
    assert idx.delta.count() == 100          # below min_ann_rows: no fold
    s0 = tiered_search(idx, q, k, n_probes, qvec_col="qv")
    idx = tiered_extend(idx, d.filter(F.col("id") >= 400))
    assert idx.delta.isEmpty()               # 200 >= 150: compacted
    s1 = tiered_search(idx, q, k, n_probes, qvec_col="qv")

    def tag(df, e):
        return df.select(F.lit(e).cast("long").alias("epoch"),
                         "qid", "nid", "distance", "rank")

    got = sorted(map(tuple, tag(s0, 0).unionByName(tag(s1, 1)).collect()))

    cent = ("SELECT vec_id AS label, embedding AS cv FROM embeddings "
            f"WHERE vec_id < {n_lists}")
    qsql = ("SELECT vec_id AS qid, embedding AS qv FROM embeddings "
            "WHERE vec_id < 20")
    e0 = f"""
WITH ann AS ({O.ivf_flat_search_sql(
        "SELECT vec_id AS id, embedding AS dv FROM embeddings WHERE vec_id < 300",
        qsql, cent, k, n_probes)}),
delta AS ({O.knn_sql(
        "SELECT vec_id AS nid, embedding AS dv FROM embeddings "
        "WHERE vec_id >= 300 AND vec_id < 400", qsql, k, "sqeuclidean")}),
merged AS (SELECT qid, nid, distance FROM ann
           UNION ALL SELECT qid, nid, distance FROM delta)
SELECT qid, nid, distance,
       row_number() OVER (PARTITION BY qid
                          ORDER BY distance ASC, nid ASC) AS rank
FROM merged QUALIFY rank <= {k}"""
    e1 = O.ivf_flat_search_sql(
        "SELECT vec_id AS id, embedding AS dv FROM embeddings", qsql,
        cent, k, n_probes)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    want = sorted(map(tuple, con.sql(
        f"SELECT CAST(0 AS BIGINT) AS epoch, * FROM ({e0}) "
        f"UNION ALL SELECT CAST(1 AS BIGINT) AS epoch, * FROM ({e1})"
    ).fetchall()))
    assert got == want
