"""Randomized-equivalence properties for the round-8 wave-2/3/4
operators: each op is replayed against an independent brute-force
Python reference on seeded random inputs (the repo's property-grid
idiom — one Spark job per property, not one per example)."""
from __future__ import annotations

import datetime as dt
import hashlib
from fractions import Fraction

import numpy as np
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def test_map_score_matches_bruteforce_fractions(spark, rng):
    """map_score == exact Fraction AP averaged in Python, over random
    rankings/relevance (20 queries, k=10)."""
    from cuvs_spark.stats.metrics import map_score
    ann_rows, truth_rows = [], []
    ap = {}
    for q in range(20):
        ranked = list(rng.permutation(50)[:10])
        rel = set(int(x) for x in rng.permutation(50)[:4])
        ann_rows += [(q, int(n), r + 1) for r, n in enumerate(ranked)]
        truth_rows += [(q, int(n)) for n in sorted(rel)]
        hits = 0
        s = Fraction(0)
        for r, n in enumerate(ranked, 1):
            if int(n) in rel:
                hits += 1
                s += Fraction(hits, r)
        ap[q] = s / len(rel)
    want = float(sum(ap.values()) / len(ap))
    ann = spark.createDataFrame(ann_rows, "qid long, nid long, rank long")
    truth = spark.createDataFrame(truth_rows, "qid long, nid long")
    assert map_score(ann, truth).collect()[0]["map"] == want


def test_rank_auc_matches_pair_counting(spark, rng):
    """rank_auc == the O(n²) Mann-Whitney definition (ties = ½) on
    random integer scores with heavy tie mass."""
    from cuvs_spark.stats.metrics import rank_auc
    scores = [int(x) for x in rng.integers(0, 8, 120)]
    labels = [int(x) for x in rng.integers(0, 2, 120)]
    df = spark.createDataFrame(list(zip(scores, labels)), "s long, y int")
    row = rank_auc(df, "s", "y = 1").collect()[0]
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    num2 = sum(2 if p > n else 1 if p == n else 0
               for p in pos for n in neg)
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert row.auc_num2 == num2
    assert row.auc == num2 / (2.0 * len(pos) * len(neg))


def test_kendall_matches_bruteforce_tau(spark, rng):
    """kendall_rank_agreement == brute-force concordant/discordant
    counting over the per-query intersections, with partial overlap
    between the two systems' candidate sets."""
    from cuvs_spark.stats.metrics import kendall_rank_agreement
    a_rows, b_rows = [], []
    C = D = P = 0
    for q in range(12):
        pool = list(rng.permutation(30))
        a_items = [int(x) for x in pool[:10]]
        b_items = [int(x) for x in pool[4:14]]   # overlap = 6
        ra = {n: r + 1 for r, n in enumerate(a_items)}
        rb = {n: r + 1 for r, n in enumerate(
            rng.permutation(b_items).tolist())}
        a_rows += [(q, n, r) for n, r in ra.items()]
        b_rows += [(q, int(n), r) for n, r in rb.items()]
        common = sorted(set(ra) & set(rb))
        for i, n1 in enumerate(common):
            for n2 in common[i + 1:]:
                s = (ra[n1] - ra[n2]) * (rb[int(n1)] - rb[int(n2)])
                P += 1
                C += s > 0
                D += s < 0
    a = spark.createDataFrame(a_rows, "qid long, nid long, rank long")
    b = spark.createDataFrame(b_rows, "qid long, nid long, rank long")
    row = kendall_rank_agreement(a, b).collect()[0]
    assert (row.n_pairs, row.concordant, row.discordant) == (P, C, D)
    assert row.tau == (C - D) / P


def test_burst_flags_match_python_simulation(spark, rng):
    """burst_windows == a pure-Python replay of the trailing-3 rule
    over random sparse hourly counts (empty hours count as zero)."""
    from cuvs_spark.operators.temporal import burst_windows
    hours = sorted(int(x) for x in
                   set(rng.integers(0, 48, 20).tolist()))
    counts = {h: int(rng.integers(1, 30)) for h in hours}
    rows = [(dt.datetime(2024, 1, 1, tzinfo=UTC)
             + dt.timedelta(hours=h, seconds=int(s)),)
            for h, c in counts.items() for s in rng.integers(0, 3000, c)]
    ev = spark.createDataFrame(rows, "ts timestamp")
    base = int(dt.datetime(2024, 1, 1, tzinfo=UTC).timestamp()) // 3600
    got = {r.bucket - base: (r.n_events, r.prev_sum, r.is_burst)
           for r in burst_windows(ev).collect()}
    mn = min(hours)
    for h in hours:
        prev = sum(counts.get(p, 0) for p in (h - 3, h - 2, h - 1))
        burst = int(h - mn >= 3 and counts[h] * 3 > 2 * prev)
        assert got[h] == (counts[h], prev, burst)


def test_importance_sample_replicates_md5_rule(spark, rng):
    """Membership == the documented md5 arithmetic replayed in pure
    Python (bucket·w_max < w·10⁶) — determinism pinned end-to-end."""
    from cuvs_spark.pipeline.sampling import importance_weighted_sample
    rows = [(i, int(rng.integers(0, 50))) for i in range(400)]
    wmax = max(w for _, w in rows)
    d = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(r.doc_id for r in
                 importance_weighted_sample(d, "w").collect())

    def bucket(i, salt="w0"):
        h = hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:15]
        return int(h, 16) % 1_000_000

    want = sorted(i for i, w in rows if bucket(i) * wmax < w * 1_000_000)
    assert got == want


def test_retention_cohort_matches_pandas(spark, rng):
    """retention_cohort == a pandas groupby reference on random
    (user, week) activity."""
    import pandas as pd
    from cuvs_spark.operators.temporal import retention_cohort
    rows = [(int(u), dt.datetime(2024, 1, 1, tzinfo=UTC)
             + dt.timedelta(days=7 * int(w), hours=int(h)))
            for u, w, h in zip(rng.integers(0, 15, 120),
                               rng.integers(0, 6, 120),
                               rng.integers(0, 24, 120))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort, r.age): r.n_users
           for r in retention_cohort(ev).collect()}
    pdf = pd.DataFrame(rows, columns=["u", "ts"])
    pdf["b"] = (pdf.ts.map(lambda t: int(t.timestamp() * 1_000_000))
                // (604_800 * 1_000_000))
    cohort = pdf.groupby("u").b.min()
    act = pdf[["u", "b"]].drop_duplicates()
    act["c"] = act.u.map(cohort)
    act["age"] = act.b - act.c
    want = act.groupby(["c", "age"]).u.nunique()
    assert got == {(int(c), int(a)): int(v)
                   for (c, a), v in want.items()}


def test_chi2_random_corpus_matches_direct_formula(spark, rng):
    """chi2_terms == the direct 2×2 formula computed from raw Python
    counts on a random corpus."""
    from cuvs_spark.pipeline.classify import chi2_terms
    docs = []
    for i in range(40):
        words = [f"w{int(x)}" for x in rng.integers(0, 12, 8)]
        docs.append((i, " ".join(words), int(rng.integers(0, 2))))
    d = spark.createDataFrame(docs, "doc_id long, text string, y int")
    got = {r.term: (r.df_pos, r.df_neg, r.chi2)
           for r in chi2_terms(d, "y = 1", 100, min_df=1).collect()}
    npos = sum(1 for *_, y in docs if y)
    nneg = len(docs) - npos
    vocab = {w for _, t, _ in docs for w in t.split()}
    for w in vocab:
        a = sum(1 for _, t, y in docs if y and w in t.split())
        b = sum(1 for _, t, y in docs if not y and w in t.split())
        c, e = npos - a, nneg - b
        n = npos + nneg
        den = (a + b) * (c + e) * npos * nneg
        want = (n * float(a * e - b * c) * float(a * e - b * c) / den
                if den else 0.0)
        assert got[w][0] == a and got[w][1] == b
        assert got[w][2] == want
