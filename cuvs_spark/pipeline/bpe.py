"""Byte-pair-encoding tokenization: driver-trained merges, distributed
Arrow-batched encoding.

Token counting for budget planning / sequence packing needs a real
subword tokenizer, not just the whitespace+regex counts in
``pipeline/text.py``. This is the standard split used by every corpus
pipeline at scale:

* :func:`bpe_train` — classic BPE merge learning (Sennrich et al.
  2016) over a word-frequency table. Training state is O(vocab), not
  O(corpus), so it runs driver-side over a deterministic sample — the
  same shape as training any tokenizer on a 100 TB corpus (sample →
  train once → broadcast).
* :func:`bpe_encode` — greedy rank-based merge inference (the GPT-2
  ``bpe()`` loop) as a ``mapInPandas`` stage: merges ship in the
  closure (broadcast), every partition encodes independently with a
  per-word LRU — embarrassingly parallel, zero shuffles for counts
  output.

Encoding is deterministic but iterative per word, so there is no DuckDB
SQL twin; the gate surface is the lossless-roundtrip invariant
(``stats_bpe_roundtrip``: concat(tokens) == word for every word) plus
exact-equality pytest vs an independent pure-Python reference.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_train_sample", "bpe_encode", "encode_word"]

# Java-regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python str.split()
# additionally splits on Unicode whitespace (U+00A0, U+2028, U+3000, …).
# Every Spark/DuckDB word split in this repo uses \s+, so the Python
# encode path must use the same class or token counts diverge on any
# doc containing a non-breaking space.
_ASCII_WS = re.compile(r"[ \t\n\x0b\x0c\r]+")


def bpe_train(word_freqs: dict[str, int], n_merges: int = 200,
              *, end_of_word: str = "") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.
    Ties in pair frequency break lexicographically (deterministic —
    independent of dict iteration order). Returns merges in rank
    order."""
    vocab = {tuple(w) + ((end_of_word,) if end_of_word else ()): c
             for w, c in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for parts, c in vocab.items():
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_n)
        if best_n < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for parts, c in vocab.items():
            out, i = [], 0
            while i < len(parts):
                if (i + 1 < len(parts)
                        and (parts[i], parts[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_train_sample(df: DataFrame, n_merges: int = 200, *,
                     max_docs: int = 10_000, id_col: str = "doc_id",
                     text_col: str = "text") -> list[tuple[str, str]]:
    """Train merges on a deterministic corpus sample: the ``max_docs``
    lowest-id docs (order-independent), word-counted distributively —
    only the O(vocab) frequency table reaches the driver."""
    freqs = (df.select(F.col(id_col).cast("long").alias("_id"),
                       F.col(text_col).alias("_tx"))
             .orderBy("_id").limit(max_docs)
             .select(F.explode(F.expr(
                 "filter(split(lower(_tx), '\\\\s+'), t -> t <> '')"))
                 .alias("w"))
             .groupBy("w").agg(F.count("*").alias("c")).collect())
    return bpe_train({r["w"]: r["c"] for r in freqs}, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy merge loop: repeatedly merge the
    lowest-ranked adjacent pair until none remains."""
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_pair = None, None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out, i = [], 0
        while i < len(parts):
            if (i + 1 < len(parts)
                    and (parts[i], parts[i + 1]) == best_pair):
                out.append(merged)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]], *,
               id_col: str = "doc_id", text_col: str = "text",
               output: str = "counts") -> DataFrame:
    """Distributed BPE inference. ``output='counts'`` →
    ``(doc_id, n_words, n_bpe_tokens)`` (map-only);
    ``output='tokens'`` → exploded ``(doc_id, pos, token)``."""
    if output not in ("counts", "tokens"):
        raise ValueError(output)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"))

    if output == "counts":
        schema = "doc_id long, n_words long, n_bpe_tokens long"
    else:
        schema = "doc_id long, pos long, token string"

    def run(batches):
        import pandas as pd
        cache: dict[str, list[str]] = {}

        def enc(w):
            got = cache.get(w)
            if got is None:
                got = cache[w] = encode_word(w, ranks)
            return got

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in _ASCII_WS.split((text or "").lower())
                         if w]
                if output == "counts":
                    rows.append((doc_id, len(words),
                                 sum(len(enc(w)) for w in words)))
                else:
                    pos = 0
                    for w in words:
                        for t in enc(w):
                            rows.append((doc_id, pos, t))
                            pos += 1
            cols = [c.split(" ")[0] for c in schema.split(", ")]
            out = pd.DataFrame(rows, columns=cols)
            for c in cols:
                if c != "token":
                    out[c] = out[c].astype("int64")
            yield out

    return d.mapInPandas(run, schema)
