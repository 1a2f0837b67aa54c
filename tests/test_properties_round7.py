"""Property-based invariants (hypothesis) + plan-shape assertions for
the round-7 fifth-wave operators. Each example runs Spark jobs, so
example counts are deliberately small (round-6 convention)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_word = st.integers(min_value=0, max_value=12).map(lambda i: f"w{i}")
_doc_text = st.lists(_word, min_size=0, max_size=15).map(" ".join)
_corpus = st.lists(_doc_text, min_size=1, max_size=12)


def _py_novelty(texts, n=3):
    """Python reference for ngram_novelty."""
    grams = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        gs = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
        grams[i] = gs
    dfreq: dict = {}
    for gs in grams.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    out = {}
    for i, gs in grams.items():
        novel = sum(1 for g in gs if dfreq[g] == 1)
        out[i] = (len(gs), novel,
                  0.0 if not gs else novel / len(gs))
    return out


@settings(max_examples=8, deadline=None)
@given(texts=_corpus)
def test_ngram_novelty_matches_python(spark, texts):
    from cuvs_spark.pipeline.text import ngram_novelty

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["novel_grams"],
                         r["novelty_frac"])
           for r in ngram_novelty(docs, 3).collect()}
    assert got == _py_novelty(texts, 3)


@settings(max_examples=6, deadline=None)
@given(texts=_corpus, k=st.integers(min_value=1, max_value=8))
def test_vocab_coverage_matches_python(spark, texts, k):
    from cuvs_spark.pipeline.text import vocab_coverage

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    rows = sorted(vocab_coverage(docs, k).collect(),
                  key=lambda r: r["rank"])
    freq: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    total = sum(freq.values())
    exp = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(r["term"], r["term_freq"]) for r in rows] == exp
    cum = 0
    for r in rows:
        cum += r["term_freq"]
        assert r["cum_freq"] == cum
        assert r["total_tokens"] == total
        assert r["coverage_frac"] == cum / total
    # coverage is monotone, ends <= 1
    fracs = [r["coverage_frac"] for r in rows]
    assert fracs == sorted(fracs) and (not fracs or fracs[-1] <= 1.0)


def _py_bloom_positions(text, m_bits, k):
    out = []
    for i in range(k):
        h = int(hashlib.md5(
            f"{text}#bloom{i}".encode()).hexdigest()[:15], 16)
        out.append(h % m_bits)
    return out


@settings(max_examples=6, deadline=None)
@given(base=st.lists(_doc_text, min_size=1, max_size=8, unique=True),
       probe=st.lists(_doc_text, min_size=1, max_size=8))
def test_bloom_matches_python_simulation(spark, base, probe):
    """bloom_build/contains agree with a bit-exact Python simulation of
    the same md5 positions — membership verdicts included (so FPs, if
    any example produces one, must match too)."""
    from cuvs_spark.pipeline.dedup import bloom_build, bloom_contains

    m, k = 63 * 16, 3
    bits: set = set()
    for t in base:
        bits.update(_py_bloom_positions(t, m, k))
    exp = {i: int(all(p in bits
                      for p in _py_bloom_positions(t, m, k)))
           for i, t in enumerate(probe)}
    bdf = spark.createDataFrame(list(enumerate(base)),
                                "doc_id long, text string")
    pdf = spark.createDataFrame(list(enumerate(probe)),
                                "doc_id long, text string")
    filt = bloom_build(bdf, m_bits=m, k=k).localCheckpoint()
    got = {r["doc_id"]: r["maybe_dup"]
           for r in bloom_contains(pdf, filt).collect()}
    assert got == exp


# ---------------------------------------------------------------------------
# Plan-shape assertions: the scale claims, pinned
# ---------------------------------------------------------------------------

def test_fifth_wave_plan_shapes(spark):
    from cuvs_spark.pipeline.dedup import cross_source_dups, dedup_against_bloom
    from cuvs_spark.pipeline.text import decontaminate_remove, ngram_novelty
    from cuvs_spark.plans.layout import plan_string

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} delta epsilon zeta eta", "s1")
         for i in range(30)],
        "doc_id long, text string, source string")
    bench = docs.limit(3).selectExpr("doc_id AS bench_id", "text")

    # no cartesian products anywhere in the family
    for df in (ngram_novelty(docs, 3),
               decontaminate_remove(docs, bench),
               cross_source_dups(docs),
               dedup_against_bloom(docs, docs, m_bits=63 * 64)):
        p = plan_string(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
    # decontaminate_remove: eval membership is a broadcast (semi) join,
    # not a literal-array scan (the 33x fix)
    p = plan_string(decontaminate_remove(docs, bench))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
