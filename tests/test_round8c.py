"""Round-8 third-wave tests: temporal analytics (gap stats, retention
cohorts, burst detection), χ² feature selection, rank AUC,
edit-distance verification, importance-weighted sampling."""
from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _ts(h, m=0, s=0, day=1):
    return dt.datetime(2024, 1, day, h, m, s, tzinfo=UTC)


def test_gap_stats_hand_case(spark):
    """User 1: gaps of 10 min and 40 min (one over the 30-min bar,
    max 2400 s); user 2: single event (0 gaps, max 0.0)."""
    from cuvs_spark.operators.temporal import gap_stats
    rows = [(1, 1, _ts(10, 0)), (2, 1, _ts(10, 10)), (3, 1, _ts(10, 50)),
            (4, 2, _ts(12, 0))]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "ts timestamp")
    got = {r.user_id: r for r in gap_stats(ev).collect()}
    assert got[1].n_events == 3
    assert got[1].n_gaps_over == 1
    assert got[1].max_gap_s == 2400.0
    assert got[2].n_events == 1
    assert got[2].n_gaps_over == 0 and got[2].max_gap_s == 0.0


def test_retention_cohort_hand_case(spark):
    """Two users start week 0; one returns week 1; a third starts
    week 1 — the (cohort, age) triangle must count exactly that."""
    from cuvs_spark.operators.temporal import retention_cohort
    w = 7 * 86400
    rows = [(1, _ts(0)), (2, _ts(0)),
            (1, dt.datetime.fromtimestamp(_ts(0).timestamp() + w, UTC)),
            (3, dt.datetime.fromtimestamp(_ts(0).timestamp() + w, UTC))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort - min(x.cohort for x in
                           retention_cohort(ev).collect()), r.age):
           r.n_users for r in retention_cohort(ev).collect()}
    assert got[(0, 0)] == 2      # cohort week 0, both present at age 0
    assert got[(0, 1)] == 1      # one returned a week later
    assert got[(1, 0)] == 1      # the week-1 cohort


def test_burst_windows_detects_spike_and_warmup(spark):
    """3 quiet hours (1 event each), then a 10-event hour: burst. The
    first 3 hours have no full 3-window baseline → is_burst 0. An
    EMPTY hour inside the lookback counts as zero (RANGE frame)."""
    from cuvs_spark.operators.temporal import burst_windows
    rows = ([(_ts(0, i),) for i in range(1)]          # hour 0: 1
            + [(_ts(1, i),) for i in range(1)]        # hour 1: 1
            + [(_ts(2, i),) for i in range(1)]        # hour 2: 1
            + [(_ts(3, i),) for i in range(10)]       # hour 3: 10 (burst)
            + [(_ts(5, i),) for i in range(1)])       # hour 5 (4 empty)
    ev = spark.createDataFrame(rows, "ts timestamp")
    got = {r.bucket - min(x.bucket for x in burst_windows(ev).collect()):
           r for r in burst_windows(ev).collect()}
    assert [got[i].is_burst for i in (0, 1, 2)] == [0, 0, 0]   # warmup
    assert got[3].is_burst == 1 and got[3].prev_sum == 3
    # hour 5: trailing frame covers hours 2..4 = 1 + 10 + 0(empty) = 11
    assert got[5].prev_sum == 11 and got[5].is_burst == 0


def test_burst_windows_empty_baseline_counts_zero(spark):
    """A burst right after a silent stretch IS flagged: 3 empty hours
    sum to 0 and count > 0 beats any factor × 0."""
    from cuvs_spark.operators.temporal import burst_windows
    rows = [(_ts(0),)] + [(_ts(4, i),) for i in range(5)]
    ev = spark.createDataFrame(rows, "ts timestamp")
    got = {r.bucket - min(x.bucket for x in burst_windows(ev).collect()):
           r for r in burst_windows(ev).collect()}
    assert got[4].prev_sum == 0 and got[4].is_burst == 1


def test_chi2_terms_exact_formula(spark):
    """χ² for a perfectly-separating term and an uninformative one,
    against the direct 2×2 formula."""
    from cuvs_spark.pipeline.classify import chi2_terms
    docs = [(0, "apple common", 1), (1, "apple common", 1),
            (2, "banana common", 0), (3, "banana common", 0)]
    d = spark.createDataFrame(docs, "doc_id long, text string, y int")
    out = {r.term: r for r in
           chi2_terms(d, "y = 1", 10, min_df=1).collect()}
    # apple: a=2 b=0 c=0 d=2 → chi2 = 4·(2·2)²/(2·2·2·2) = 4
    assert out["apple"].df_pos == 2 and out["apple"].df_neg == 0
    assert out["apple"].chi2 == 4.0
    assert out["banana"].chi2 == 4.0
    assert out["common"].chi2 == 0.0
    # ordering: chi2 DESC then term ASC → apple before banana
    terms = [r.term for r in
             chi2_terms(d, "y = 1", 10, min_df=1).collect()]
    assert terms == ["apple", "banana", "common"]


def test_chi2_terms_duckdb_twin(spark):
    import duckdb
    from cuvs_spark.pipeline.classify import chi2_terms, chi2_terms_sql
    docs = [(i, f"tok{i % 3} shared tok{i % 5}", "en" if i % 2 else "de")
            for i in range(30)]
    d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = [(r.term, r.df_pos, r.df_neg, r.chi2)
           for r in chi2_terms(d, "lang = 'en'", 20).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    want = con.sql(chi2_terms_sql(
        "SELECT doc_id, text, lang FROM documents",
        "lang = 'en'", 20)).fetchall()
    assert got == [tuple(w) for w in want]


def test_rank_auc_known_values(spark):
    """Perfect separation → 1.0; anti-separation → 0.0; all-tied →
    0.5; and a mixed case against direct pair counting."""
    from cuvs_spark.stats.metrics import rank_auc

    def auc_of(scores, labels):
        df = spark.createDataFrame(
            list(zip(scores, labels)), "s long, y int")
        return rank_auc(df, "s", "y = 1").collect()[0]

    assert auc_of([1, 2, 3, 4], [0, 0, 1, 1]).auc == 1.0
    assert auc_of([4, 3, 2, 1], [0, 0, 1, 1]).auc == 0.0
    assert auc_of([7, 7, 7, 7], [0, 1, 0, 1]).auc == 0.5
    # mixed with ties: direct Mann-Whitney count
    scores = [1, 2, 2, 3, 3, 5]
    labels = [0, 1, 0, 1, 0, 1]
    row = auc_of(scores, labels)
    num = sum((1.0 if sp > sn else 0.5 if sp == sn else 0.0)
              for sp, yp in zip(scores, labels) if yp
              for sn, yn in zip(scores, labels) if not yn)
    want = num / (3 * 3)
    assert row.n_pos == 3 and row.n_neg == 3
    assert row.auc == pytest.approx(want, abs=0)  # exact rational
    assert row.auc_num2 == int(2 * num)


def test_rank_auc_degenerate_single_class(spark):
    from cuvs_spark.stats.metrics import rank_auc
    df = spark.createDataFrame([(1, 1), (2, 1)], "s long, y int")
    row = rank_auc(df, "s", "y = 1").collect()[0]
    assert row.n_neg == 0 and row.auc == 0.0


def test_edit_distance_pairs_finds_injected_variant(spark):
    """A single-substitution variant of a 200-char doc pairs with its
    source at lev == 1; an unrelated doc pairs with nothing."""
    from cuvs_spark.pipeline.dedup import edit_distance_pairs
    base = " ".join(f"word{i}" for i in range(40))
    other = " ".join(f"unrel{i}" for i in range(40))
    docs = [(0, base), (1, "Z" + base[1:]), (2, other)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = edit_distance_pairs(d, 0.2).collect()
    assert [(r.doc_a, r.doc_b, r.lev) for r in out] == [(0, 1, 1)]
    assert out[0].len_a == len(base) and out[0].len_b == len(base)


def test_edit_distance_threshold_is_relative(spark):
    """Same Jaccard-overlapping pair, tighter max_frac → excluded."""
    from cuvs_spark.pipeline.dedup import edit_distance_pairs
    base = " ".join(f"word{i}" for i in range(40))
    # rewrite a 30-char chunk: lev ≈ 30 on a ~280-char doc (~11%)
    variant = base[:100] + "X" * 30 + base[130:]
    d = spark.createDataFrame([(0, base), (1, variant)],
                              "doc_id long, text string")
    loose = edit_distance_pairs(d, 0.2, jaccard_floor=0.1).collect()
    tight = edit_distance_pairs(d, 0.05, jaccard_floor=0.1).collect()
    assert len(loose) == 1 and loose[0].lev == 30
    assert tight == []


def test_importance_weighted_sample_properties(spark):
    """Max-weight rows are ALWAYS kept, zero-weight rows never, and
    membership is monotone in the weight for a fixed id."""
    from cuvs_spark.pipeline.sampling import importance_weighted_sample
    rows = [(i, 10 if i < 50 else (0 if i < 60 else 3))
            for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    kept = {r.doc_id for r in
            importance_weighted_sample(d, "w").collect()}
    assert set(range(50)) <= kept            # w == w_max: always kept
    assert kept.isdisjoint(range(50, 60))    # w == 0: never kept
    # monotone: raising every weight to w_max keeps a superset
    d_hi = d.withColumn("w", F.lit(10))
    kept_hi = {r.doc_id for r in
               importance_weighted_sample(d_hi, "w").collect()}
    assert kept <= kept_hi


def test_importance_weighted_sample_duckdb_twin(spark):
    import duckdb
    from cuvs_spark.pipeline.sampling import (
        importance_weighted_sample,
        importance_weighted_sample_sql,
    )
    rows = [(i, (i * 7) % 23 + 1) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(r.doc_id for r in
                 importance_weighted_sample(d, "w").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(r[0] for r in con.sql(importance_weighted_sample_sql(
        "SELECT doc_id, w FROM t", "w")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# Streaming rate monitor (burst detection on ingest)
# ---------------------------------------------------------------------------

_H0 = int(dt.datetime(2024, 1, 1, tzinfo=UTC).timestamp()) // 3600


def _mk_events(spark, hours_counts):
    rows = [(dt.datetime(2024, 1, 1, h, m % 60, tzinfo=UTC),)
            for h, c in hours_counts for m in range(c)]
    return spark.createDataFrame(rows, "ts timestamp")


def test_rate_monitor_stream_equals_batch(spark, tmp_path):
    """Two time-ordered micro-batches produce exactly the flags the
    batch operator computes on the union (trailing baselines only look
    backward, so arrival order = time order reproduces batch)."""
    from cuvs_spark.operators.temporal import burst_windows
    from cuvs_spark.streaming import burst_batch_against_state

    state = str(tmp_path / "rstate")
    b1 = _mk_events(spark, [(0, 2), (1, 2), (2, 2), (3, 2)])
    b2 = _mk_events(spark, [(4, 20), (5, 2)])
    f1 = burst_batch_against_state(b1, state, 0).collect()
    f2 = burst_batch_against_state(b2, state, 1).collect()
    got = {r.bucket - _H0: (r.n_events, r.prev_sum, r.is_burst)
           for r in f1 + f2}
    want = {r.bucket - _H0: (r.n_events, r.prev_sum, r.is_burst)
            for r in burst_windows(b1.unionByName(b2)).collect()}
    assert got == want
    # the hour-4 spike (20 vs trailing avg 2) must be the only burst
    assert sum(v[2] for v in got.values()) == 1


def test_rate_monitor_replay_is_idempotent(spark, tmp_path):
    """Re-processing the same epoch after checkpoint recovery rewrites
    the same state rows — counts never double, flags don't change."""
    from cuvs_spark.streaming import burst_batch_against_state
    state = str(tmp_path / "rstate")
    b1 = _mk_events(spark, [(0, 2), (1, 2), (2, 2)])
    b2 = _mk_events(spark, [(3, 20)])
    burst_batch_against_state(b1, state, 0)
    first = {r.bucket - _H0: tuple(r)[1:]
             for r in burst_batch_against_state(b2, state, 1).collect()}
    replay = {r.bucket - _H0: tuple(r)[1:]
              for r in burst_batch_against_state(b2, state, 1).collect()}
    assert replay == first
    assert first[3] == (20, 6, 1)            # n, prev_sum, is_burst


def test_rate_monitor_bucket_split_across_batches(spark, tmp_path):
    """A window whose events straddle two micro-batches accumulates
    in the state: the second batch's flag sees the FULL count."""
    from cuvs_spark.streaming import burst_batch_against_state
    state = str(tmp_path / "rstate")
    warm = _mk_events(spark, [(0, 2), (1, 2), (2, 2)])
    burst_batch_against_state(warm, state, 0)
    h3a = _mk_events(spark, [(3, 3)])         # 3 events: not a burst yet
    f1 = {r.bucket - _H0: r for r in
          burst_batch_against_state(h3a, state, 1).collect()}
    assert f1[3].n_events == 3 and f1[3].is_burst == 0
    h3b = _mk_events(spark, [(3, 10)])        # 10 more → 13 total: burst
    f2 = {r.bucket - _H0: r for r in
          burst_batch_against_state(h3b, state, 2).collect()}
    assert f2[3].n_events == 13 and f2[3].is_burst == 1


def test_rate_monitor_state_stays_bounded(spark, tmp_path):
    """10 micro-batches leave at most 2 committed count versions on
    disk (merge base + newest), and the merged counts stay correct."""
    import os
    from cuvs_spark.streaming import burst_batch_against_state
    from cuvs_spark.streaming.rate_monitor import _count_versions
    state = str(tmp_path / "rstate")
    for ep in range(10):
        b = _mk_events(spark, [(ep, ep + 1)])
        burst_batch_against_state(b, state, ep)
    counts_dir = os.path.join(state, "counts")
    assert len(_count_versions(counts_dir)) <= 2
    merged = {r.bucket - _H0: r.n_events
              for r in spark.read.parquet(
                  os.path.join(counts_dir, "v=9")).collect()}
    assert merged == {h: h + 1 for h in range(10)}
