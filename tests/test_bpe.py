"""BPE tokenizer: merge learning, greedy encoding, distributed parity."""

from __future__ import annotations


def test_bpe_train_classic_example():
    from cuvs_spark.pipeline.bpe import bpe_train

    # Sennrich's canonical toy corpus (no end-of-word marker):
    # 'es' is the most frequent pair (9+6? -> est in newest/widest...)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(freqs, 4)
    # hand-derived: es(9) -> est(9) -> lo(7) -> low(7)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_encode_word_follows_rank_order():
    from cuvs_spark.pipeline.bpe import encode_word

    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2, ("lo", "w"): 3}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]
    assert encode_word("low", ranks) == ["low"]


def test_bpe_encode_distributed_matches_local(spark):
    from cuvs_spark.pipeline.bpe import (bpe_encode, bpe_train_sample,
                                         encode_word)

    docs = spark.createDataFrame(
        [(i, f"the lowest newest wid{i % 4}est of the low lands") for i in
         range(30)] + [(30, "")],
        "doc_id long, text string")
    merges = bpe_train_sample(docs, n_merges=30, max_docs=30)
    assert merges
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    counts = {r["doc_id"]: r for r in
              bpe_encode(docs, merges, output="counts").collect()}
    toks = bpe_encode(docs, merges, output="tokens").collect()
    by_doc: dict[int, list] = {}
    for r in toks:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["token"]))

    for doc_id, text in [(i, f"the lowest newest wid{i % 4}est of the "
                          f"low lands") for i in range(30)] + [(30, "")]:
        words = text.lower().split()
        want = [t for w in words for t in encode_word(w, ranks)]
        got = [t for _, t in sorted(by_doc.get(doc_id, []))]
        assert got == want
        assert counts[doc_id]["n_words"] == len(words)
        assert counts[doc_id]["n_bpe_tokens"] == len(want)
        # lossless roundtrip: concatenation preserves every character
        assert "".join(got) == "".join(words)
