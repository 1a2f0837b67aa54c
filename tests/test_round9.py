"""Round-9 consolidation tests: the rate monitor's exactly-once flag
output (r8 verdict #2 / ADVICE #1), the Bloom state-dir mode guard
(ADVICE #2), mrr_score's error-path unpersist (ADVICE #3), the keyless
as-of bound (r8 verdict #5), and the dispatch-formation rule behind
the new dynamic_batching gate."""
from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _mk_event_rows(hours_counts):
    return [(dt.datetime(2024, 1, 1, h, m % 60, tzinfo=UTC),)
            for h, c in hours_counts for m in range(c)]


# ---------------------------------------------------------------------------
# Rate monitor: exactly-once flag output across checkpoint replay
# ---------------------------------------------------------------------------

def _run_rate_monitor_once(spark, src, state, out, ckpt):
    from cuvs_spark.streaming import start_streaming_rate_monitor
    q = start_streaming_rate_monitor(
        spark, src + "/*", "ts timestamp", state, out, ckpt,
        window_s=3600, lookback=3, trigger_once=True)
    q.awaitTermination(120)


def _flag_multiset(spark, out):
    rows = spark.read.parquet(out).collect()
    return sorted((r.epoch, r.bucket, r.n_events, r.prev_sum, r.is_burst)
                  for r in rows)


def test_rate_monitor_flags_exactly_once_on_replay(spark, tmp_path):
    """The kill-between-write-and-commit replay (the bloom_stream
    treatment, r8 verdict #2): after epoch 1's flags are written but
    its streaming commit is lost, the restarted stream re-runs epoch 1
    — the per-epoch idempotent overwrite must leave the flag table
    byte-identical instead of appending a duplicate epoch (the old
    mode('append') behavior)."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    spark.createDataFrame(
        _mk_event_rows([(0, 2), (1, 2), (2, 2), (3, 2)]),
        "ts timestamp").write.parquet(os.path.join(src, "b1"))
    _run_rate_monitor_once(spark, src, state, out, ckpt)
    first = _flag_multiset(spark, out)
    assert len(first) == 4 and {t[0] for t in first} == {0}

    # second file → epoch 1 (the hour-4 spike must flag as a burst)
    spark.createDataFrame(
        _mk_event_rows([(4, 20), (5, 2)]),
        "ts timestamp").write.parquet(os.path.join(src, "b2"))
    _run_rate_monitor_once(spark, src, state, out, ckpt)
    second = _flag_multiset(spark, out)
    assert len(second) == 6
    bursts = [t for t in second if t[4] == 1]
    assert len(bursts) == 1 and bursts[0][0] == 1

    # simulate a crash AFTER the epoch-1 flag write and state commit
    # but BEFORE the streaming checkpoint commit: drop the commit
    # marker so the restart replays epoch 1 against its committed state
    os.remove(os.path.join(ckpt, "commits", "1"))
    # the local-FS checkpoint writes a .crc sidecar per commit file;
    # drop it too or the replayed commit's rename collides with it
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run_rate_monitor_once(spark, src, state, out, ckpt)
    assert _flag_multiset(spark, out) == second


def test_rate_monitor_flag_output_layout(spark, tmp_path):
    """Flags land under out_dir/epoch=<id>/ so replays overwrite in
    place; reading the root surfaces both the partition column and the
    explicit epoch_id column, and they agree."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(_mk_event_rows([(0, 3), (1, 5)]),
                          "ts timestamp").write.parquet(
        os.path.join(src, "b1"))
    out = str(tmp_path / "out")
    _run_rate_monitor_once(spark, src, str(tmp_path / "state"), out,
                           str(tmp_path / "ckpt"))
    assert os.path.isdir(os.path.join(out, "epoch=0"))
    got = spark.read.parquet(out).collect()
    assert all(int(r.epoch) == int(r.epoch_id) for r in got)


# ---------------------------------------------------------------------------
# Bloom state-dir mode guard (ADVICE r8 #2)
# ---------------------------------------------------------------------------

def _bloom_kw():
    return dict(m_bits=63 * 256, k=4)


def test_bloom_mixed_mode_state_dir_refused(spark, tmp_path):
    from cuvs_spark.streaming import bloom_dedup_batch_against_state
    state = str(tmp_path / "bstate")
    b = spark.createDataFrame([(0, "mm alpha"), (1, "mm beta")],
                              "doc_id long, text string")
    # legacy-mode commit stamps the dir; an epoch-keyed call must refuse
    bloom_dedup_batch_against_state(b, state, **_bloom_kw())
    with pytest.raises(ValueError, match="legacy"):
        bloom_dedup_batch_against_state(
            b, state, epoch_id=1,
            accepted_path=str(tmp_path / "acc" / "epoch=1"), **_bloom_kw())
    # and the reverse: an epoch-keyed dir refuses a legacy call
    state2 = str(tmp_path / "bstate2")
    bloom_dedup_batch_against_state(
        b, state2, epoch_id=0,
        accepted_path=str(tmp_path / "acc2" / "epoch=0"), **_bloom_kw())
    with pytest.raises(ValueError, match="epoch"):
        bloom_dedup_batch_against_state(b, state2, **_bloom_kw())


def test_bloom_premarker_legacy_dir_refuses_epoch_calls(spark, tmp_path):
    """A state dir populated before the MODE marker existed (versions,
    no marker) is legacy by construction: epoch-keyed calls raise
    instead of misreading version 1 as a committed epoch."""
    from cuvs_spark.streaming import bloom_dedup_batch_against_state
    state = str(tmp_path / "bstate")
    b = spark.createDataFrame([(0, "pm alpha")], "doc_id long, text string")
    bloom_dedup_batch_against_state(b, state, **_bloom_kw())
    os.remove(os.path.join(state, "bloom", "MODE"))   # pre-upgrade dir
    with pytest.raises(ValueError, match="MODE marker"):
        bloom_dedup_batch_against_state(
            b, state, epoch_id=1,
            accepted_path=str(tmp_path / "acc" / "epoch=1"), **_bloom_kw())
    # legacy calls keep working against the unmarked dir (and re-stamp)
    b2 = spark.createDataFrame([(5, "pm alpha"), (6, "pm gamma")],
                               "doc_id long, text string")
    ok = bloom_dedup_batch_against_state(b2, state, **_bloom_kw())
    assert sorted(r.doc_id for r in ok.collect()) == [6]
    assert os.path.exists(os.path.join(state, "bloom", "MODE"))


# ---------------------------------------------------------------------------
# MinHash dedup stream: exactly-once accepted output (bloom contract)
# ---------------------------------------------------------------------------

_BASE_TXT = ("spark window merge sort table row filter key part batch "
             "value line order data scan hash join group agg column")
_NOVEL_TXT = ("totally different words about quick brown foxes jumping "
              "over lazy dogs and rivers running deep under bridges")


def test_dedup_stream_exactly_once_epoch_replay(spark, tmp_path):
    from cuvs_spark.streaming import dedup_batch_against_state
    state = str(tmp_path / "dstate")
    acc = str(tmp_path / "acc")
    b0 = spark.createDataFrame(
        [(0, _BASE_TXT), (1, _NOVEL_TXT), (2, _BASE_TXT)],
        "doc_id long, text string")
    ok0 = dedup_batch_against_state(
        b0, state, epoch_id=0, accepted_path=os.path.join(acc, "epoch=0"))
    assert sorted(r.doc_id for r in ok0.collect()) == [0, 1]
    # replay of the committed epoch: same rows, no state double-shard
    replay = dedup_batch_against_state(
        b0, state, epoch_id=0, accepted_path=os.path.join(acc, "epoch=0"))
    assert sorted(r.doc_id for r in replay.collect()) == [0, 1]
    # next epoch still rejects epoch-0 texts (exact AND near dup)
    b1 = spark.createDataFrame(
        [(10, _BASE_TXT), (11, _BASE_TXT + " zq1"),
         (12, "entirely novel content with unique vocabulary nothing "
              "shared with any earlier document in the stream")],
        "doc_id long, text string")
    ok1 = dedup_batch_against_state(
        b1, state, jaccard_threshold=0.5,
        epoch_id=1, accepted_path=os.path.join(acc, "epoch=1"))
    assert sorted(r.doc_id for r in ok1.collect()) == [12]
    # the whole accepted table reads back with epoch partition dirs
    allacc = spark.read.parquet(acc)
    assert sorted(r.doc_id for r in allacc.collect()) == [0, 1, 12]


def test_dedup_stream_crash_before_state_commit_replays_identically(
        spark, tmp_path):
    """Kill between the accepted write and the state-shard _SUCCESS:
    the replay must recompute against the committed-only state (the
    partial shard is invisible) and land the same accepted bytes."""
    from cuvs_spark.streaming import dedup_batch_against_state
    from cuvs_spark.streaming.dedup_stream import _committed_feature_epochs
    state = str(tmp_path / "dstate")
    acc = str(tmp_path / "acc")
    b0 = spark.createDataFrame(
        [(0, _BASE_TXT), (1, _NOVEL_TXT)], "doc_id long, text string")
    dedup_batch_against_state(
        b0, state, epoch_id=0, accepted_path=os.path.join(acc, "epoch=0"))
    succ = os.path.join(state, "features", "epoch=0", "_SUCCESS")
    os.remove(succ)                      # simulate the pre-commit crash
    assert _committed_feature_epochs(os.path.join(state, "features")) == []
    ok = dedup_batch_against_state(
        b0, state, epoch_id=0, accepted_path=os.path.join(acc, "epoch=0"))
    assert sorted(r.doc_id for r in ok.collect()) == [0, 1]
    assert os.path.exists(succ)          # shard re-committed
    # and the state works for the next epoch
    b1 = spark.createDataFrame([(10, _BASE_TXT)], "doc_id long, text string")
    ok1 = dedup_batch_against_state(
        b1, state, epoch_id=1, accepted_path=os.path.join(acc, "epoch=1"))
    assert ok1.count() == 0


def test_dedup_stream_mixed_mode_state_refused(spark, tmp_path):
    from cuvs_spark.streaming import dedup_batch_against_state
    b = spark.createDataFrame([(0, _BASE_TXT)], "doc_id long, text string")
    # legacy commit → epoch-keyed call refuses
    state = str(tmp_path / "dstate")
    dedup_batch_against_state(b, state)
    with pytest.raises(ValueError, match="legacy"):
        dedup_batch_against_state(
            b, state, epoch_id=1,
            accepted_path=str(tmp_path / "a" / "epoch=1"))
    # epoch commit → legacy call refuses
    state2 = str(tmp_path / "dstate2")
    dedup_batch_against_state(
        b, state2, epoch_id=0,
        accepted_path=str(tmp_path / "a2" / "epoch=0"))
    with pytest.raises(ValueError, match="epoch"):
        dedup_batch_against_state(b, state2)
    # pre-marker flat dir (legacy files, no MODE) → epoch call refuses
    state3 = str(tmp_path / "dstate3")
    dedup_batch_against_state(b, state3)
    os.remove(os.path.join(state3, "MODE"))
    with pytest.raises(ValueError, match="MODE marker"):
        dedup_batch_against_state(
            b, state3, epoch_id=0,
            accepted_path=str(tmp_path / "a3" / "epoch=0"))
    with pytest.raises(ValueError, match="pair"):
        dedup_batch_against_state(b, str(tmp_path / "dstate4"), epoch_id=2)


def test_dedup_stream_checkpoint_recovery_exactly_once(spark, tmp_path):
    """End-to-end: stop after batch 0, drop its streaming commit
    marker (crash after output, before checkpoint commit), restart —
    the replayed epoch rewrites the same accepted bytes and a novel
    second file still dedups against the recovered state."""
    from cuvs_spark.streaming import start_streaming_dedup
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    okdir = str(tmp_path / "ok")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run_once():
        q = start_streaming_dedup(spark, src + "/*", state, okdir,
                                  trigger_seconds=0.5,
                                  checkpoint_dir=ckpt)
        deadline = time.time() + 90
        try:
            while time.time() < deadline:
                if os.path.exists(os.path.join(ckpt, "commits", "0")):
                    time.sleep(1.0)     # let the in-flight batch settle
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(30)

    spark.createDataFrame(
        [(0, _BASE_TXT), (1, _NOVEL_TXT), (2, _BASE_TXT)],
        "doc_id long, text string").write.parquet(os.path.join(src, "b1"))
    run_once()
    first = sorted(r.doc_id for r in spark.read.parquet(okdir).collect())
    assert first == [0, 1]
    # crash window: streaming commit lost AFTER the epoch's output
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()
    again = sorted(r.doc_id for r in spark.read.parquet(okdir).collect())
    assert again == [0, 1]               # no duplicate epoch rows


# ---------------------------------------------------------------------------
# mrr_score unpersists on the error path (ADVICE r8 #3)
# ---------------------------------------------------------------------------

def test_mrr_unpersists_cached_truth_on_error(spark):
    from cuvs_spark.stats.metrics import mrr_score
    truth = spark.createDataFrame([(1, 10), (2, 20)], "qid long, nid long")
    bad = spark.createDataFrame([(1, 10, 0), (2, 20, 3)],
                                "qid long, nid long, rank long")
    with pytest.raises(ValueError, match="ranks outside"):
        mrr_score(bad, truth)
    # CacheManager matches by logical plan: the internal persist was on
    # truth.select("qid","nid"), so the same projection must report
    # no storage after the raise
    assert not truth.select("qid", "nid").storageLevel.useMemory


# ---------------------------------------------------------------------------
# Keyless as-of bound (r8 verdict #5)
# ---------------------------------------------------------------------------

def _asof_frames(spark):
    le = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, i, tzinfo=UTC)) for i in range(8)],
        "lid long, ts timestamp")
    ri = spark.createDataFrame(
        [(j, dt.datetime(2024, 1, 1, 0, 2 * j, tzinfo=UTC))
         for j in range(4)],
        "rid long, ts timestamp")
    return le, ri


def test_asof_keyless_guard_raises_over_bound(spark):
    from cuvs_spark.operators.temporal import asof_join
    le, ri = _asof_frames(spark)
    with pytest.raises(ValueError, match="single-partition"):
        asof_join(le, ri, max_keyless_rows=5)


def test_asof_keyless_under_bound_still_exact(spark):
    from cuvs_spark.operators.temporal import asof_join
    le, ri = _asof_frames(spark)
    got = {r.lid: r.r_rid for r in asof_join(le, ri).collect()}
    assert got == {i: i // 2 for i in range(8)}
    # disabling the bound is explicit
    got2 = asof_join(le, ri, max_keyless_rows=None).count()
    assert got2 == 8


def test_asof_keyed_path_ignores_keyless_bound(spark):
    from cuvs_spark.operators.temporal import asof_join
    le, ri = _asof_frames(spark)
    le = le.withColumn("k", F.lit(1))
    ri = ri.withColumn("k", F.lit(1))
    # by= present → distributed window → the keyless bound must not
    # trigger (and must not cost the two count() jobs)
    out = asof_join(le, ri, by="k", max_keyless_rows=1)
    assert out.count() == 8


def test_asof_keyless_ranged_matches_single_partition(spark):
    """The distributed keyless scan (range partition + carry-in
    repair) must reproduce the single-partition window EXACTLY —
    randomized timestamps with heavy duplicates (tie rule must not
    straddle partition boundaries), both directions, with and without
    tolerance, and left rows before the first right row (null carry)."""
    import random

    from cuvs_spark.operators.temporal import asof_join
    rng = random.Random(17)

    def ts(t):
        return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=t)

    left = spark.createDataFrame(
        [(i, ts(rng.randrange(0, 300))) for i in range(400)],
        "lid long, ts timestamp")
    # right offset by +10s so some left rows precede every right row
    right = spark.createDataFrame(
        [(j, ts(10 + rng.randrange(0, 290)), j % 7) for j in range(150)],
        "rid long, ts timestamp, v long")
    for direction in ("backward", "forward"):
        for tol in (None, 45.0):
            a = asof_join(left, right, direction=direction, tolerance=tol,
                          max_keyless_rows=None)
            b = asof_join(left, right, direction=direction, tolerance=tol,
                          keyless_partitions=7)
            got_a = sorted(map(tuple, a.collect()))
            got_b = sorted(map(tuple, b.collect()))
            assert got_a == got_b, (direction, tol)


def test_asof_keyless_partitions_validation(spark):
    from cuvs_spark.operators.temporal import asof_join
    le, ri = _asof_frames(spark)
    with pytest.raises(ValueError, match="by=None"):
        asof_join(le.withColumn("k", F.lit(1)),
                  ri.withColumn("k", F.lit(1)),
                  by="k", keyless_partitions=4)
    with pytest.raises(ValueError, match=">= 1"):
        asof_join(le, ri, keyless_partitions=0)


def test_asof_keyless_ranged_sparse_partitions(spark):
    """More partitions than rows: empty range partitions and
    right-row-free partitions must inherit the correct carry-in."""
    from cuvs_spark.operators.temporal import asof_join

    def ts(t):
        return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=t)

    left = spark.createDataFrame(
        [(i, ts(i * 13)) for i in range(12)], "lid long, ts timestamp")
    right = spark.createDataFrame(
        [(j, ts(j * 40), 100 + j) for j in range(4)],
        "rid long, ts timestamp, v long")
    got = {r.lid: r.r_v for r in
           asof_join(left, right, keyless_partitions=50).collect()}
    want = {r.lid: r.r_v for r in
            asof_join(left, right, max_keyless_rows=None).collect()}
    assert got == want
    assert got[0] == 100 and got[11] == 103   # spot-check endpoints


# ---------------------------------------------------------------------------
# round-9 gates at sf0.001 — a scale the driver window never exercises
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["events_rate_monitor_state",
                                  "dynamic_batching_dispatch"])
def test_round9_gates_match_duckdb_at_tiny_sf(spark, name):
    import duckdb

    from cuvs_spark.entry_queries import ORACLES, QUERIES
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    got = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    want = sorted(map(tuple, con.sql(ORACLES[name]).fetchall()))
    assert got == want


# ---------------------------------------------------------------------------
# dynamic_batching dispatch formation (novel gate's unit twin)
# ---------------------------------------------------------------------------

def test_dispatch_assignments_cap_and_order(spark):
    from cuvs_spark.streaming import dispatch_assignments
    q = spark.createDataFrame([(i,) for i in range(130)], "qid long")
    a = dispatch_assignments(q, 50).collect()
    sizes: dict[int, int] = {}
    for r in a:
        sizes[r._dispatch] = sizes.get(r._dispatch, 0) + 1
        assert r._dispatch == r.qid // 50     # qid-order greedy packing
    assert sizes == {0: 50, 1: 50, 2: 30}
    with pytest.raises(ValueError):
        dispatch_assignments(q, 0)


def test_dispatch_assignments_matches_stream_splitter(spark, tmp_path):
    """start_dynamic_batching's on_batch uses dispatch_assignments
    verbatim: an oversize queue lands as ceil(n/cap) dispatches, none
    above the cap (the §2.5 dynamic_batching contract)."""
    import numpy as np

    from cuvs_spark.operators.ivf_flat import ivf_flat_build
    from cuvs_spark.streaming import start_dynamic_batching

    rng = np.random.default_rng(7)
    vecs = [(int(i), [float(x) for x in rng.random(8)]) for i in range(64)]
    d = spark.createDataFrame(vecs, "id long, vec array<float>")
    idx = ivf_flat_build(d, 4, kmeans_n_iters=4, seed=3)

    src = str(tmp_path / "q")
    os.makedirs(src)
    spark.createDataFrame(vecs, "qid long, vec array<float>") \
        .write.parquet(os.path.join(src, "b1"))
    state: dict = {}
    sink = str(tmp_path / "sink")
    q = start_dynamic_batching(
        spark, src + "/*", "qid long, vec array<float>", idx, state,
        k=3, n_probes=4, max_batch_size=25, dispatch_timeout_s=0.5,
        sink_dir=sink)
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not state.get("batches"):
            time.sleep(0.5)
    finally:
        q.stop()
    assert state["batches"][0]["n_queries"] == 64
    assert state["batches"][0]["n_dispatches"] == 3   # 25+25+14
    out = spark.read.parquet(sink)
    per = {r.dispatch: r.n for r in
           out.select("dispatch", "qid").distinct()
              .groupBy("dispatch").agg(F.count("*").alias("n")).collect()}
    assert per == {0: 25, 1: 25, 2: 14}
