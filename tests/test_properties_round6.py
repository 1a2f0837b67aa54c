"""Property-based invariants (hypothesis) for the round-6 operators:
randomized inputs catch the boundary cases example tests fix in place.
Each example runs Spark jobs, so example counts are deliberately small."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_words = st.lists(
    st.integers(min_value=0, max_value=30).map(lambda i: f"w{i}"),
    min_size=0, max_size=40)


@settings(max_examples=8, deadline=None)
@given(tokens=_words,
       chunk=st.integers(min_value=2, max_value=10),
       overlap=st.integers(min_value=0, max_value=9))
def test_chunks_reassemble_exactly(spark, tokens, chunk, overlap):
    """Invariant: chunk_0 ++ (chunk_i minus its overlap prefix) == the
    original token stream, for any (chunk, overlap) and any doc."""
    if overlap >= chunk:
        overlap = chunk - 1
    from cuvs_spark.pipeline.text import chunk_documents

    docs = spark.createDataFrame([(1, " ".join(tokens))],
                                 "doc_id long, text string")
    rows = sorted(chunk_documents(docs, chunk, overlap).collect(),
                  key=lambda r: r["chunk_id"])
    if not tokens:
        assert rows == []
        return
    rebuilt = []
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert r["n_tokens"] == len(toks)
        rebuilt.extend(toks if i == 0 else toks[overlap:])
    assert rebuilt == tokens


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 3),       # key
                               st.integers(0, 5),        # score (heavy ties)
                               st.integers(0, 10 ** 6)),  # rid
                     min_size=1, max_size=120, unique_by=lambda t: t[2]),
       k=st.integers(min_value=1, max_value=6))
def test_select_k_partial_always_exact(spark, rows, k):
    """Invariant: the salted two-level partial strategy returns exactly
    the window strategy's rows and ranks — including heavily tied
    scores, where the salt must not collapse (the round-6 fix)."""
    from cuvs_spark.operators.select_k import select_k

    df = spark.createDataFrame(rows, "key int, score int, rid long")
    w = select_k(df, "key", "score", k, tie_cols=["rid"],
                 strategy="window")
    p = select_k(df, "key", "score", k, tie_cols=["rid"],
                 strategy="partial", n_buckets=4)
    assert (sorted(map(tuple, w.select("key", "rid", "rank").collect()))
            == sorted(map(tuple, p.select("key", "rid", "rank").collect())))


@settings(max_examples=6, deadline=None)
@given(n=st.integers(min_value=1, max_value=150),
       cap=st.integers(min_value=1, max_value=40),
       groups=st.integers(min_value=1, max_value=4))
def test_cap_per_group_is_min_k_by_hash(spark, n, cap, groups):
    """Invariant: the exact cap keeps precisely the cap smallest
    md5-keys per group (ties by doc_id), for any corpus shape."""
    from cuvs_spark.pipeline.sampling import _bucket_spark, cap_per_group

    df = (spark.range(0, n)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("g"), (F.col("id") % groups))
                  .alias("source")))
    keys = {r["doc_id"]: r["_k"] for r in
            df.withColumn("_k", F.expr(_bucket_spark("doc_id", "cap")))
            .collect()}
    got = {(r["source"], r["doc_id"]) for r in
           cap_per_group(df, cap, group_col="source").collect()}
    want = set()
    for g in range(groups):
        members = sorted((keys[i], i) for i in range(n) if i % groups == g)
        want |= {(f"g{g}", i) for _, i in members[:cap]}
    assert got == want
