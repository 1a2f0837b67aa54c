"""Text analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length/punct/
stopword/token stats), token counting (whitespace + BPE-ish regex), and
document fingerprinting (winnowing over rolling k-gram hashes).

All pure JVM expression pipelines over the ``documents`` table; each
ships a DuckDB oracle twin (integer counts and single IEEE divisions →
exact hash parity). Scale shape: map-only projections except the
fingerprint window (partitioned by doc — no cross-doc shuffle) and the
langid argmax (shuffle on doc_id only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cuvs_spark.pipeline.dedup import H64_DUCK, H64_SPARK, TOKS_DUCK, TOKS_SPARK

# tiny per-language stopword lists (deterministic heuristic, not a model)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "se", "del", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
}

BPE_REGEX_SPARK = r"\\w+|[^\\w\\s]"
BPE_REGEX_DUCK = r"\w+|[^\w\s]"


def _doc(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # r14: spread narrow inputs so the heavy per-doc folds (winnowing,
    # n-gram run-length, regex scrubs) occupy every core — a no-op
    # whenever the source already has >= parallelism/2 partitions (any
    # real table at scale); measured 2-6x on the one-file bench tables
    from cuvs_spark.plans.layout import spread_narrow
    return spread_narrow(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text")), "doc_id")


# ---------------------------------------------------------------------------
# Language ID
# ---------------------------------------------------------------------------

def _with_lang_hits(d: DataFrame) -> tuple[DataFrame, list[str]]:
    # hit counts staged as columns (HOF lambdas are excluded from
    # subexpression elimination — inlined, each would re-filter per
    # consumer in the greatest + CASE chain below)
    langs = sorted(STOPWORDS)          # alphabetical = tie-break order
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        d = d.withColumn(f"_h_{lang}", F.expr(
            f"size(filter(_tl, t -> array_contains(array({words}), t)))"))
    return d, langs


def _lang_pred(langs: list[str]) -> tuple[Column, Column]:
    best = F.greatest(*[F.col(f"_h_{lang}") for lang in langs])
    pred = F.when(best <= 0, "und")
    for lang in langs:
        pred = pred.when(F.col(f"_h_{lang}") == best, lang)
    return pred, best


def language_id(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Predict language by stopword hits → ``(doc_id, pred_lang, hits)``.

    Ties break alphabetically; zero hits → 'und'. MAP-ONLY: one hit
    count per language as a filter-over-tokens column, argmax as a
    greatest + first-alphabetical-winner CASE — no token explode, no
    (doc, lang) shuffle, no join-back. At corpus scale the old
    explode+groupBy plan moved one row per token; this moves none.
    (The DuckDB oracle keeps the independent join+window formulation,
    so the gate cross-checks two different constructions.)"""
    d = _doc(df, id_col, text_col).withColumn(
        "_tl", F.expr(TOKS_SPARK.format(s="lower(text)")))
    d, langs = _with_lang_hits(d)
    pred, best = _lang_pred(langs)
    return d.select("doc_id", pred.alias("pred_lang"),
                    F.greatest(best, F.lit(0)).cast("long").alias("hits"))


def quality_lang(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens, punct_ratio, pred_lang)`` in ONE map-only
    projection — the fused marking input of :func:`curate_corpus`
    (r14, guide §2.4: two row-wise operators joined on doc_id collapse
    to one pass over the corpus — no second tokenize, no join, no
    exchange). Each column is the identical expression
    :func:`quality_score` / :func:`language_id` emit, so composed
    values are bit-equal to the joined form."""
    d = (_doc(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="text")))
         .withColumn("_tl", F.expr(TOKS_SPARK.format(s="lower(text)"))))
    d, langs = _with_lang_hits(d)
    pred, _ = _lang_pred(langs)
    punct = "length(regexp_replace(text, '[^.,!?;:]', ''))"
    return d.select(
        "doc_id",
        F.expr("CAST(size(_t) AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST({punct} AS DOUBLE) / length(text)")
         .alias("punct_ratio"),
        pred.alias("pred_lang"))


def language_id_sql(doc_sql: str) -> str:
    vals = ", ".join(f"('{lang}', '{w}')"
                     for lang, ws in STOPWORDS.items() for w in ws)
    toks = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d AS ({doc_sql}),
wl(lang, w) AS (VALUES {vals}),
tok AS (SELECT doc_id, unnest({toks}) AS w FROM d),
hits AS (
  SELECT t.doc_id, wl.lang, CAST(count(*) AS BIGINT) AS hits
  FROM tok t JOIN wl ON t.w = wl.w GROUP BY t.doc_id, wl.lang
),
best AS (
  SELECT doc_id, lang, hits FROM (
    SELECT doc_id, lang, hits,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, lang ASC) AS rn
    FROM hits) WHERE rn = 1
)
SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang,
       COALESCE(b.hits, 0) AS hits
FROM d LEFT JOIN best b ON d.doc_id = b.doc_id
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def quality_score(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic quality features per doc: n_chars, n_tokens,
    mean_token_len, punct_ratio, digit_ratio, stopword_ratio — map-only,
    all integer counts + single divisions (oracle-exact)."""
    # tokens staged into columns: HOF lambdas are excluded from Spark's
    # subexpression elimination, so an inlined tokenizer would re-split
    # the text once per consuming expression
    d = (_doc(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="text")))
         .withColumn("_tl", F.expr(TOKS_SPARK.format(s="lower(text)"))))
    n_tok = "size(_t)"
    sum_len = ("aggregate(_t, CAST(0 AS BIGINT), "
               "(acc, t) -> acc + length(t))")
    punct = "length(regexp_replace(text, '[^.,!?;:]', ''))"
    digits = "length(regexp_replace(text, '[^0-9]', ''))"
    stop_en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_stop = (f"size(filter(_tl, "
              f"t -> array_contains(array({stop_en}), t)))")
    return d.select(
        "doc_id",
        F.expr("CAST(length(text) AS BIGINT)").alias("n_chars"),
        F.expr(f"CAST({n_tok} AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST({sum_len} AS DOUBLE) / {n_tok}").alias("mean_token_len"),
        F.expr(f"CAST({punct} AS DOUBLE) / length(text)").alias("punct_ratio"),
        F.expr(f"CAST({digits} AS DOUBLE) / length(text)").alias("digit_ratio"),
        F.expr(f"CAST({n_stop} AS DOUBLE) / {n_tok}").alias("stopword_ratio"),
    )


def quality_score_sql(doc_sql: str) -> str:
    toks = TOKS_DUCK.format(s="text")
    n_tok = f"len({toks})"
    sum_len = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
               f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), "
               f"(acc, t) -> acc + t)")
    punct = "length(regexp_replace(text, '[^.,!?;:]', '', 'g'))"
    digits = "length(regexp_replace(text, '[^0-9]', '', 'g'))"
    stop_en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_stop = (f"len(list_filter({TOKS_DUCK.format(s='lower(text)')}, "
              f"t -> list_contains([{stop_en}], t)))")
    return f"""
WITH d AS ({doc_sql})
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST({n_tok} AS BIGINT) AS n_tokens,
       CAST({sum_len} AS DOUBLE) / {n_tok} AS mean_token_len,
       CAST({punct} AS DOUBLE) / length(text) AS punct_ratio,
       CAST({digits} AS DOUBLE) / length(text) AS digit_ratio,
       CAST({n_stop} AS DOUBLE) / {n_tok} AS stopword_ratio
FROM d
"""


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def token_counts(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex pieces per doc (the two counts
    every corpus-budget estimate needs)."""
    d = _doc(df, id_col, text_col)
    ws = f"size({TOKS_SPARK.format(s='text')})"   # single consumer
    bpe = f"size(regexp_extract_all(text, '{BPE_REGEX_SPARK}', 0))"
    return d.select(
        "doc_id",
        F.expr(f"CAST({ws} AS BIGINT)").alias("ws_tokens"),
        F.expr(f"CAST({bpe} AS BIGINT)").alias("bpe_tokens"))


def token_counts_sql(doc_sql: str) -> str:
    ws = f"len({TOKS_DUCK.format(s='text')})"
    bpe = f"len(regexp_extract_all(text, '{BPE_REGEX_DUCK}'))"
    return f"""
WITH d AS ({doc_sql})
SELECT doc_id, CAST({ws} AS BIGINT) AS ws_tokens,
       CAST({bpe} AS BIGINT) AS bpe_tokens
FROM d
"""


def chunk_documents(df: DataFrame, chunk_tokens: int = 256,
                    overlap: int = 32, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding-window chunking (the embedding/RAG ingestion splitter):
    each doc's whitespace tokens become chunks of ``chunk_tokens`` with
    ``overlap`` tokens carried between consecutive chunks →
    ``(doc_id, chunk_id, chunk_text, n_tokens)``.

    Map-only — one HOF over the per-doc token array; chunk boundaries
    are pure integer functions of the token count, so re-chunking any
    subset reproduces identical chunk ids. The tail chunk keeps the
    remainder (may be shorter); token-less docs yield no rows."""
    C, V = int(chunk_tokens), int(overlap)
    if C <= 0 or V < 0 or V >= C:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"({chunk_tokens}, {overlap})")
    S = C - V  # stride
    d = (_doc(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="text"))))
    # n_chunks = 1 + ceil((n - C) / S) for n > 0, clamped at 1
    nc = (f"CASE WHEN size(_t) = 0 THEN 0 ELSE "
          f"1 + greatest(0, CAST((size(_t) - {C} + {S} - 1) AS INT) "
          f"DIV {S}) END")
    chunks = (f"transform(sequence(0, {nc} - 1), i -> struct("
              f"CAST(i AS BIGINT) AS chunk_id, "
              f"array_join(slice(_t, i * {S} + 1, {C}), ' ') "
              f"AS chunk_text, "
              f"CAST(least({C}, size(_t) - i * {S}) AS BIGINT) "
              f"AS n_tokens))")
    return (d.filter(F.expr("size(_t) > 0"))
            .select("doc_id", F.explode(F.expr(chunks)).alias("c"))
            .select("doc_id", "c.chunk_id", "c.chunk_text",
                    "c.n_tokens"))


def chunk_documents_sql(doc_sql: str, chunk_tokens: int = 256,
                        overlap: int = 32) -> str:
    C, V = int(chunk_tokens), int(overlap)
    S = C - V
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
t AS (SELECT doc_id, {toks} AS _t, len({toks}) AS n FROM d),
c AS (
  SELECT doc_id, _t, n,
         unnest(range(0, CASE WHEN n = 0 THEN 0 ELSE
                  1 + greatest(0, (n - {C} + {S} - 1) // {S}) END))
           AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(_t[chunk_id * {S} + 1 : chunk_id * {S} + {C}],
                       ' ') AS chunk_text,
       CAST(least({C}, n - chunk_id * {S}) AS BIGINT) AS n_tokens
FROM c
"""


# ---------------------------------------------------------------------------
# Repetition filters (Gopher-style)
# ---------------------------------------------------------------------------

def _gram_expr_spark(n: int) -> str:
    # guarded: Spark sequence(1, 0) would generate a DESCENDING range
    return (f"CASE WHEN size(t) < {n} THEN array() "
            f"ELSE transform(sequence(1, size(t) - {n - 1}), "
            f"i -> array_join(slice(t, i, {n}), ' ')) END")


def _gram_expr_duck(n: int) -> str:
    return (f"CASE WHEN len(t) < {n} THEN [] "
            f"ELSE list_transform(range(1, len(t) - {n - 2}), "
            f"i -> array_to_string(t[i:i + {n - 1}], ' ')) END")


def repetition_stats(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    §A1.1 repetition filters): the fraction of duplicate words, the
    share of the most frequent bigram, and the fraction of trigram
    occurrences that are repeats. Degenerate/boilerplate documents score
    high and get dropped before training.

    → ``(doc_id, n_words, dup_word_frac, top_bigram_frac,
    dup_trigram_frac)``. Scale shape: MAP-ONLY — the n-gram mode and
    duplicate counts come from a run-length fold over the per-doc
    sorted gram array (``aggregate`` over ``array_sort``), so the whole
    operator is one projection with zero shuffles; cross-doc traffic is
    never needed because every statistic is per-document. All integer
    counts + one IEEE division each → oracle-exact (the DuckDB twin
    keeps the equivalent unnest+GROUP BY form)."""
    d = _doc(df, id_col, text_col)
    d2 = d.select("doc_id", F.expr(TOKS_SPARK.format(s="text")).alias("t"))

    # run-length fold over the sorted gram array → (maxrun, dup_total):
    # maxrun = occurrences of the most frequent gram, dup_total = total
    # occurrences of grams appearing ≥ 2 times. Any total order groups
    # equal grams adjacently, so sort semantics don't matter.
    _ZERO = "CAST(0 AS BIGINT)"

    def _runs(col):
        step = (f"(a, g) -> CASE WHEN a.run > 0 AND g = a.prev THEN "
                f"named_struct('prev', g, 'run', a.run + 1, "
                f"'maxrun', a.maxrun, 'dup', a.dup) "
                f"ELSE named_struct('prev', g, 'run', CAST(1 AS BIGINT), "
                f"'maxrun', greatest(a.maxrun, a.run), "
                f"'dup', a.dup + IF(a.run >= 2, a.run, {_ZERO})) END")
        fin = (f"a -> named_struct("
               f"'maxrun', greatest(a.maxrun, a.run), "
               f"'dup', a.dup + IF(a.run >= 2, a.run, {_ZERO}))")
        init = (f"named_struct('prev', CAST(NULL AS STRING), "
                f"'run', {_ZERO}, 'maxrun', {_ZERO}, 'dup', {_ZERO})")
        return f"aggregate(array_sort({col}), {init}, {step}, {fin})"

    # gram arrays staged as columns (HOF lambdas get no subexpression
    # elimination — inlining them into the 3 consumers would re-build
    # each gram array 3×)
    d3 = (d2.withColumn("bg", F.expr(_gram_expr_spark(2)))
          .withColumn("tg", F.expr(_gram_expr_spark(3))))
    return d3.select(
        "doc_id",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_words"),
        F.expr("CASE WHEN size(t) = 0 THEN CAST(0 AS DOUBLE) ELSE "
               "CAST(size(t) - size(array_distinct(t)) AS DOUBLE) / size(t) "
               "END").alias("dup_word_frac"),
        F.expr(f"CASE WHEN size(bg) = 0 THEN CAST(0 AS DOUBLE) ELSE "
               f"CAST({_runs('bg')}.maxrun AS DOUBLE) / size(bg) END")
        .alias("top_bigram_frac"),
        F.expr(f"CASE WHEN size(tg) = 0 THEN CAST(0 AS DOUBLE) ELSE "
               f"CAST({_runs('tg')}.dup AS DOUBLE) / size(tg) END")
        .alias("dup_trigram_frac"))


def repetition_stats_sql(doc_sql: str) -> str:
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
d2 AS (SELECT doc_id, {toks} AS t FROM d),
bgc AS (
  SELECT doc_id, g, count(*) AS c FROM (
    SELECT doc_id, unnest({_gram_expr_duck(2)}) AS g FROM d2)
  GROUP BY doc_id, g
),
bg AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
       FROM bgc GROUP BY doc_id),
tgc AS (
  SELECT doc_id, g, count(*) AS c FROM (
    SELECT doc_id, unnest({_gram_expr_duck(3)}) AS g FROM d2)
  GROUP BY doc_id, g
),
tg AS (SELECT doc_id,
              CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
              / sum(c) AS dup_trigram_frac
       FROM tgc GROUP BY doc_id)
SELECT d2.doc_id,
       CAST(len(t) AS BIGINT) AS n_words,
       CASE WHEN len(t) = 0 THEN CAST(0 AS DOUBLE) ELSE
         CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t) END
         AS dup_word_frac,
       COALESCE(bg.top_bigram_frac, 0.0) AS top_bigram_frac,
       COALESCE(tg.dup_trigram_frac, 0.0) AS dup_trigram_frac
FROM d2 LEFT JOIN bg ON d2.doc_id = bg.doc_id
        LEFT JOIN tg ON d2.doc_id = tg.doc_id
"""


def gopher_quality(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", min_words: int = 50,
                   max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_word_ratio: float = 0.1,
                   max_bullet_line_frac: float = 0.9,
                   max_ellipsis_line_frac: float = 0.3,
                   min_alpha_word_frac: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021
    §A1.1) beyond the repetition filters in :func:`repetition_stats`:
    word-count bounds, mean word length bounds, hash/ellipsis
    symbol-to-word ratios, bullet-start and ellipsis-end line
    fractions, alphabetic-word fraction, and the ≥2-distinct-stopwords
    requirement — plus the composed ``gopher_keep`` verdict.

    → ``(doc_id, n_words, mean_word_len, hash_word_ratio,
    ellipsis_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, n_stop_distinct, gopher_keep)``.

    MAP-ONLY (zero shuffles; every statistic is per-document), integer
    counts + one IEEE division each → oracle-exact. String scans use
    replace-and-measure or startswith/endswith — no regex alternation
    (Java vs RE2 agree only on alternation-free patterns), and the one
    regex is a single ASCII char class."""
    d = (_doc(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="text")))
         .withColumn("_lines", F.expr(
             "filter(transform(split(text, '\\n'), l -> trim(l)), "
             "l -> l <> '')")))
    n_words = "size(_t)"
    sum_len = ("aggregate(_t, CAST(0 AS BIGINT), "
               "(acc, w) -> acc + length(w))")
    n_hash = "CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)"
    n_ellipsis = ("CAST((length(text) - length(replace(text, '...', ''))) "
                  "DIV 3 + length(text) - length(replace(text, '…', '')) "
                  "AS BIGINT)")
    n_lines = "size(_lines)"
    n_bullet = ("size(filter(_lines, l -> startswith(l, '-') OR "
                "startswith(l, '*') OR startswith(l, '•')))")
    n_ell_line = ("size(filter(_lines, l -> endswith(l, '...') OR "
                  "endswith(l, '…')))")
    n_alpha = "size(filter(_t, w -> w RLIKE '[A-Za-z]'))"
    stops = ", ".join(f"'{w}'" for w in
                      ["the", "be", "to", "of", "and", "that",
                       "have", "with"])
    n_stop = (f"size(array_intersect("
              f"{TOKS_SPARK.format(s='lower(text)')}, array({stops})))")

    def frac(num, den):
        return (f"CASE WHEN {den} = 0 THEN CAST(0 AS DOUBLE) "
                f"ELSE CAST({num} AS DOUBLE) / {den} END")

    out = d.select(
        "doc_id",
        F.expr(f"CAST({n_words} AS BIGINT)").alias("n_words"),
        F.expr(frac(sum_len, n_words)).alias("mean_word_len"),
        F.expr(frac(n_hash, n_words)).alias("hash_word_ratio"),
        F.expr(frac(n_ellipsis, n_words)).alias("ellipsis_word_ratio"),
        F.expr(frac(n_bullet, n_lines)).alias("bullet_line_frac"),
        F.expr(frac(n_ell_line, n_lines)).alias("ellipsis_line_frac"),
        F.expr(frac(n_alpha, n_words)).alias("alpha_word_frac"),
        F.expr(f"CAST({n_stop} AS BIGINT)").alias("n_stop_distinct"))
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("hash_word_ratio") <= max_symbol_word_ratio)
        & (F.col("ellipsis_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stop_distinct") >= min_stop_hits))
    return out.withColumn("gopher_keep", keep.cast("int"))


def gopher_quality_sql(doc_sql: str, *, min_words: int = 50,
                       max_words: int = 100_000,
                       min_mean_word_len: float = 3.0,
                       max_mean_word_len: float = 10.0,
                       max_symbol_word_ratio: float = 0.1,
                       max_bullet_line_frac: float = 0.9,
                       max_ellipsis_line_frac: float = 0.3,
                       min_alpha_word_frac: float = 0.8,
                       min_stop_hits: int = 2) -> str:
    toks = TOKS_DUCK.format(s="text")
    stops = ", ".join(f"'{w}'" for w in
                      ["the", "be", "to", "of", "and", "that",
                       "have", "with"])
    n_words = "len(_t)"
    sum_len = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
               "list_transform(_t, w -> CAST(length(w) AS BIGINT))), "
               "(acc, x) -> acc + x)")
    n_hash = "CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)"
    n_ellipsis = ("CAST((length(text) - length(replace(text, '...', ''))) "
                  "// 3 + length(text) - length(replace(text, '…', '')) "
                  "AS BIGINT)")
    n_lines = "len(_lines)"
    n_bullet = ("len(list_filter(_lines, l -> starts_with(l, '-') OR "
                "starts_with(l, '*') OR starts_with(l, '•')))")
    n_ell_line = ("len(list_filter(_lines, l -> ends_with(l, '...') OR "
                  "ends_with(l, '…')))")
    n_alpha = "len(list_filter(_t, w -> regexp_matches(w, '[A-Za-z]')))"
    n_stop = (f"len(list_intersect("
              f"{TOKS_DUCK.format(s='lower(text)')}, [{stops}]))")

    def frac(num, den):
        return (f"CASE WHEN {den} = 0 THEN CAST(0 AS DOUBLE) "
                f"ELSE CAST({num} AS DOUBLE) / {den} END")

    return f"""
WITH d AS ({doc_sql}),
d2 AS (
  SELECT doc_id, text, {toks} AS _t,
         list_filter(list_transform(string_split(text, chr(10)),
                     l -> trim(l)), l -> l <> '') AS _lines
  FROM d
),
s AS (
  SELECT doc_id,
         CAST({n_words} AS BIGINT) AS n_words,
         {frac(sum_len, n_words)} AS mean_word_len,
         {frac(n_hash, n_words)} AS hash_word_ratio,
         {frac(n_ellipsis, n_words)} AS ellipsis_word_ratio,
         {frac(n_bullet, n_lines)} AS bullet_line_frac,
         {frac(n_ell_line, n_lines)} AS ellipsis_line_frac,
         {frac(n_alpha, n_words)} AS alpha_word_frac,
         CAST({n_stop} AS BIGINT) AS n_stop_distinct
  FROM d2
)
SELECT *,
       CAST(CASE WHEN n_words >= {min_words} AND n_words <= {max_words}
         AND mean_word_len >= {min_mean_word_len}
         AND mean_word_len <= {max_mean_word_len}
         AND hash_word_ratio <= {max_symbol_word_ratio}
         AND ellipsis_word_ratio <= {max_symbol_word_ratio}
         AND bullet_line_frac <= {max_bullet_line_frac}
         AND ellipsis_line_frac <= {max_ellipsis_line_frac}
         AND alpha_word_frac >= {min_alpha_word_frac}
         AND n_stop_distinct >= {min_stop_hits}
       THEN 1 ELSE 0 END AS INT) AS gopher_keep
FROM s
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------

def doc_fingerprints(df: DataFrame, k: int = 8, w: int = 4, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     hash_fn: str = "md5") -> DataFrame:
    """Winnowing (Schleimer et al.): k-gram rolling hashes, min per
    sliding window of w → distinct ``(doc_id, fp)``. Window is
    partitioned by doc — fingerprinting shuffles nothing across docs.

    ``hash_fn='md5'`` is the cross-engine-reproducible form (the DuckDB
    oracle shares it); ``'xxhash64'`` is the JVM-native throughput form
    (~10× cheaper per k-gram, same winnowing guarantees)."""
    d = _doc(df, id_col, text_col)
    # fully map-only: the sliding-window minimum is a sparse table of
    # zip_with/least steps over the per-doc hash array (log2(w)
    # doubling zips + one final offset zip — O(n·log w) per doc, no
    # per-position slice copies), and the per-doc distinct is
    # array_distinct. ZERO shuffles — the former window-pass form
    # shuffled every k-gram hash by doc_id and the global distinct
    # shuffled again; Spark's `least` skips the NULLs zip_with pads
    # with, which reproduces the window's clipped tail semantics
    # exactly.
    h_lam = (f"xxhash64(substr(text, p, {k}))" if hash_fn == "xxhash64"
             else H64_SPARK.format(s=f"substr(text, p, {k})"))
    out = (d.filter(F.length("text") >= k)
           .withColumn("_m", F.expr(
               f"transform(sequence(1, length(text) - {k} + 1), "
               f"p -> {h_lam})")))
    span = 1
    while span * 2 <= w:
        out = out.withColumn("_m", F.expr(
            f"zip_with(_m, slice(_m, {span + 1}, size(_m)), "
            f"(a, b) -> least(a, b))"))
        span *= 2
    if span < w:
        out = out.withColumn("_m", F.expr(
            f"zip_with(_m, slice(_m, {w - span + 1}, size(_m)), "
            f"(a, b) -> least(a, b))"))
    return out.select("doc_id",
                      F.explode(F.expr("array_distinct(_m)")).alias("fp"))


def doc_fingerprints_sql(doc_sql: str, k: int = 8, w: int = 4) -> str:
    h = H64_DUCK.format(s=f"substr(text, CAST(pos AS INT), {k})")
    return f"""
WITH d AS ({doc_sql}),
pos AS (
  SELECT doc_id, unnest(range(1, length(text) - {k} + 2)) AS pos, text
  FROM d WHERE length(text) >= {k}
),
kh AS (SELECT doc_id, pos, {h} AS h FROM pos)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
FROM kh
"""


# ---------------------------------------------------------------------------
# PII scrubbing (standard pre-training redaction pass)
# ---------------------------------------------------------------------------

# Patterns kept alternation-free so Java (leftmost-first, backtracking)
# and RE2/DuckDB (leftmost-longest) agree on every match. Applied in
# order: emails first so their digit runs can't be re-matched as phones.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def pii_scrub(df: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped digit runs →
    ``(doc_id, clean_text, n_email, n_ipv4, n_phone)``.

    Map-only JVM regex pass — no shuffle, no UDF; counts are taken on
    the pre-redaction text, replacements chain in PII_PATTERNS order."""
    d = _doc(df, id_col, text_col)
    clean = F.col("text")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count("text", F.lit(pat))
                      .cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    return d.select("doc_id", clean.alias("clean_text"), *counts)


def pii_scrub_sql(doc_sql: str) -> str:
    clean = "text"
    counts = []
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) "
            f"AS n_{name}")
        clean = f"regexp_replace({clean}, '{p}', '{repl}', 'g')"
    cols = ",\n       ".join(counts)
    return f"""
WITH d AS ({doc_sql})
SELECT doc_id, {clean} AS clean_text,
       {cols}
FROM d
"""


# ---------------------------------------------------------------------------
# C4-style line filtering (line-level boilerplate removal)
# ---------------------------------------------------------------------------

_TERMINAL_RE = '[.!?"]$'


def c4_line_filter(df: DataFrame, *, min_words: int = 3,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """C4's line-level cleanup: keep only lines with >= ``min_words``
    words that end in terminal punctuation; rejoin survivors →
    ``(doc_id, clean_text, n_lines, n_kept)``.

    Map-only higher-order-function pipeline (split → filter →
    array_join) — boilerplate removal at corpus scale without a
    shuffle."""
    d = _doc(df, id_col, text_col)
    words = TOKS_SPARK.format(s="l")
    keep = (f"filter(split(text, '\\n'), l -> "
            f"size({words}) >= {min_words} AND "
            f"rtrim(l) RLIKE '{_TERMINAL_RE}')")
    d = d.withColumn("_kept", F.expr(keep))
    return d.select(
        "doc_id",
        F.expr("array_join(_kept, '\\n')").alias("clean_text"),
        F.expr("CAST(size(split(text, '\\n')) AS BIGINT)").alias("n_lines"),
        F.expr("CAST(size(_kept) AS BIGINT)").alias("n_kept"))


def c4_line_filter_sql(doc_sql: str, min_words: int = 3) -> str:
    words = TOKS_DUCK.format(s="l")
    keep = (f"list_filter(string_split(text, chr(10)), l -> "
            f"len({words}) >= {min_words} AND "
            f"regexp_matches(rtrim(l), '{_TERMINAL_RE}'))")
    return f"""
WITH d AS ({doc_sql}),
k AS (SELECT doc_id, text, {keep} AS kept FROM d)
SELECT doc_id,
       -- DuckDB array_to_string is NULL on an empty list; Spark
       -- array_join is '' — coalesce for cross-engine parity
       COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
       CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept
FROM k
"""


# ---------------------------------------------------------------------------
# Unigram LM scoring (CCNet-style perplexity filtering stage)
# ---------------------------------------------------------------------------

def unigram_lm(df: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Train a unigram LM over the corpus → ``(w, cnt)`` plus the
    corpus total replicated per row (one groupBy over exploded tokens,
    map-side combined; the vocab is the broadcastable side of every
    downstream score join)."""
    d = _doc(df, id_col, text_col)
    toks = d.select(F.explode(
        F.expr(TOKS_SPARK.format(s="lower(text)"))).alias("w"))
    vocab = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("_t"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "w", "cnt", F.col("_t").alias("total"))


def lm_score(df: DataFrame, vocab: DataFrame, *, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Score docs against a unigram LM → ``(doc_id, n_scored,
    mean_tok_prob, oov_frac)``: mean in-vocab token probability and
    out-of-vocabulary fraction — the rational-arithmetic core of a
    perplexity filter (kept log-free so the cross-engine gate is
    bit-exact; take ``-avg(ln p)`` downstream if you want nats).

    Per-doc sums fold over an array_sort'd struct list, so the IEEE
    accumulation order is engine-independent. Scale shape: token
    explode (map) → broadcast vocab join (map) → one doc_id groupBy
    with map-side combine."""
    d = _doc(df, id_col, text_col)
    toks = d.select("doc_id", F.explode(
        F.expr(TOKS_SPARK.format(s="lower(text)"))).alias("w"))
    joined = (toks.join(F.broadcast(vocab), "w", "left")
              .select("doc_id",
                      (F.col("cnt").isNull()).cast("int").alias("oov"),
                      F.when(F.col("cnt").isNotNull(),
                             F.col("cnt").cast("double")
                             / F.col("total").cast("double"))
                      .otherwise(F.lit(0.0)).alias("p")))
    return (joined.groupBy("doc_id")
            .agg(F.count("*").alias("_n"),
                 F.sum("oov").alias("_oov"),
                 F.array_sort(F.collect_list(
                     F.struct("p", "oov"))).alias("_ps"))
            .select(
                "doc_id",
                F.col("_n").cast("long").alias("n_scored"),
                (F.expr("aggregate(_ps, CAST(0 AS DOUBLE), "
                        "(acc, x) -> acc + x.p)")
                 / F.greatest(F.col("_n") - F.col("_oov"), F.lit(1))
                 .cast("double")).alias("mean_tok_prob"),
                (F.col("_oov").cast("double") / F.col("_n"))
                .alias("oov_frac")))


def lm_score_sql(doc_sql: str, vocab_doc_sql: str | None = None) -> str:
    """DuckDB twin: same vocab construction + sorted-fold sums."""
    vsql = vocab_doc_sql or doc_sql
    toks_v = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d AS ({doc_sql}),
vd AS ({vsql}),
vt AS (SELECT unnest({toks_v}) AS w FROM vd),
vocab AS (SELECT w, count(*) AS cnt FROM vt GROUP BY w),
tot AS (SELECT sum(cnt) AS total FROM vocab),
t AS (SELECT doc_id, unnest({TOKS_DUCK.format(s='lower(text)')}) AS w FROM d),
j AS (
  SELECT t.doc_id,
         CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END AS oov,
         CASE WHEN v.cnt IS NOT NULL
              THEN CAST(v.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE)
              ELSE 0.0 END AS p
  FROM t LEFT JOIN vocab v ON t.w = v.w CROSS JOIN tot
),
g AS (
  SELECT doc_id, count(*) AS _n, sum(oov) AS _oov,
         list_sort(list({{'p': p, 'oov': oov}})) AS _ps
  FROM j GROUP BY doc_id
)
SELECT doc_id, CAST(_n AS BIGINT) AS n_scored,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(_ps, x -> x.p)), (acc, x) -> acc + x)
         / CAST(greatest(_n - _oov, 1) AS DOUBLE) AS mean_tok_prob,
       CAST(_oov AS DOUBLE) / _n AS oov_frac
FROM g
"""


def tfidf_keywords(df: DataFrame, k: int = 5, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Top-``k`` TF-IDF terms per doc → ``(doc_id, term, tfidf, rank)``
    — the keyword-extraction / doc-signature stage of corpus analytics.

    IDF is the log-free rational form ``(N + 1) / (df + 1)`` (a
    monotone transform of the standard log IDF, so rankings are
    identical and the cross-engine gate stays bit-exact; apply ``ln``
    downstream if you want the classical scale). Scale shape: token
    explode → one (doc, term) tf groupBy (map-side combined) → one
    term df groupBy whose output joins back on term (never collected
    or broadcast — the vocabulary can be billions of terms) → per-doc
    top-k via the bounded-slice ``agg`` strategy."""
    from cuvs_spark.operators.select_k import select_k
    d = _doc(df, id_col, text_col)
    # N rides along as a 1-row broadcast (the SQL twin's CROSS JOIN n)
    # so the operator stays lazy — no count() job at plan construction
    n = d.agg(F.count("*").alias("_nd"))
    toks = d.select("doc_id", F.explode(
        F.expr(TOKS_SPARK.format(s="lower(text)"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    scored = (tf.join(dfreq, "term").crossJoin(F.broadcast(n))
              .select("doc_id", "term",
                      (F.col("_tf").cast("double")
                       * ((F.col("_nd") + F.lit(1)).cast("double")
                          / (F.col("_df") + F.lit(1)).cast("double")))
                      .alias("tfidf")))
    return select_k(scored, "doc_id", "tfidf", k, select_min=False,
                    tie_cols=["term"], strategy="agg")


def tfidf_keywords_sql(doc_sql: str, k: int = 5) -> str:
    toks = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d AS ({doc_sql}),
n AS (SELECT count(*) AS nd FROM d),
t AS (SELECT doc_id, unnest({toks}) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS _tf FROM t GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS _df FROM tf GROUP BY 1),
s AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf._tf AS DOUBLE)
         * (CAST(n.nd + 1 AS DOUBLE) / CAST(dfq._df + 1 AS DOUBLE))
           AS tfidf
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM s
)
SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def top_ngrams(df: DataFrame, n: int = 2, k: int = 20, *,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams →
    ``(gram, doc_freq, total_freq, rank)`` ordered by total frequency
    (ties broken by gram text) — the corpus-statistics pass behind
    boilerplate discovery, contamination triage, and mixture audits
    ("what does this crawl actually say").

    Scale shape: one explode → a ``(gram, doc_id)`` groupBy (map-side
    combine collapses within-doc repeats on the mapper) → a per-gram
    rollup carrying both the distinct-doc count and the summed total —
    two shuffles on the gram key, no distinct-count sketch needed, and
    the top-``k`` is a global ``select_k`` over the already-aggregated
    gram table (tiny relative to the corpus). A hot gram ("the of") is
    ONE row after the first combine — no skew exposure."""
    d = _doc(df, id_col, text_col)
    toks = TOKS_SPARK.format(s="text")
    # name the token array `t` so the shared _gram_expr template applies
    grams = (d.select("doc_id", F.expr(toks).alias("t"))
             .select("doc_id",
                     F.explode(F.expr(_gram_expr_spark(n))).alias("g")))
    per_doc = grams.groupBy("g", "doc_id").agg(F.count("*").alias("c"))
    agg = (per_doc.groupBy("g")
           .agg(F.count("*").alias("doc_freq"),
                F.sum("c").alias("total_freq")))
    # top-k FIRST via orderBy+limit (Catalyst's TakeOrderedAndProject:
    # per-partition partial top-k, no global sort of the gram table),
    # then rank only the k survivors
    topk = agg.orderBy(F.col("total_freq").desc(), F.col("g").asc()) \
              .limit(k)
    w = Window.orderBy(F.col("total_freq").desc(), F.col("g").asc())
    return (topk.withColumn("rank", F.row_number().over(w))
            .select(F.col("g").alias("gram"),
                    F.col("doc_freq").cast("long").alias("doc_freq"),
                    F.col("total_freq").cast("long").alias("total_freq"),
                    F.col("rank").cast("long").alias("rank")))


def top_ngrams_sql(doc_sql: str, n: int = 2, k: int = 20) -> str:
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
tk AS (SELECT doc_id, {toks} AS t FROM d),
grams AS (
  SELECT doc_id, unnest({_gram_expr_duck(n)}) AS g FROM tk
),
per_doc AS (
  SELECT g, doc_id, count(*) AS c FROM grams GROUP BY g, doc_id
),
agg AS (
  SELECT g, count(*) AS doc_freq, sum(c) AS total_freq
  FROM per_doc GROUP BY g
),
r AS (
  SELECT g, doc_freq, total_freq,
         row_number() OVER (ORDER BY total_freq DESC, g) AS rank
  FROM agg
)
SELECT g AS gram, CAST(doc_freq AS BIGINT) AS doc_freq,
       CAST(total_freq AS BIGINT) AS total_freq,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def bigram_lm(df: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text"):
    """Train an add-one-smoothed bigram LM over the corpus →
    ``(bigrams, contexts, vocab_size)``: the (w1, w2, cnt) pair counts,
    the per-``w1`` context totals, and the unigram vocabulary size (the
    smoothing denominator). Two map-side-combined groupBys over the
    exploded pair stream; both model tables are the broadcastable side
    of every downstream score join (the CCNet-style perplexity filter
    one order up from :func:`unigram_lm`)."""
    d = (_doc(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="lower(text)"))))
    pairs = (d.filter(F.expr("size(_t) >= 2"))
             .select(F.explode(F.expr(
                 "zip_with(slice(_t, 1, size(_t) - 1), "
                 "slice(_t, 2, size(_t) - 1), "
                 "(a, b) -> struct(a AS w1, b AS w2))")).alias("p"))
             .select("p.w1", "p.w2"))
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    contexts = bigrams.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    vsize = (d.select(F.explode("_t").alias("w"))
             .agg(F.countDistinct("w")).head()[0])
    return bigrams, contexts, int(vsize)


def lm_score_bigram(df: DataFrame, bigrams: DataFrame,
                    contexts: DataFrame, vocab_size: int, *,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Score docs against a bigram LM → ``(doc_id, n_pairs,
    mean_pair_prob)``: mean add-one-smoothed conditional probability
    ``(c(w1,w2)+1) / (c(w1·)+V)`` over the doc's consecutive token
    pairs. Rational arithmetic (one exact-operand division per pair,
    no logs) + a sorted fold, so the cross-engine gate is bit-exact;
    docs with fewer than two tokens score (0, 0.0).

    Scale shape: pair explode (map) → two broadcast model joins (map)
    → one doc_id groupBy with map-side combine."""
    V = int(vocab_size)
    d = (_doc(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="lower(text)"))))
    pairs = (d.filter(F.expr("size(_t) >= 2"))
             .select("doc_id", F.explode(F.expr(
                 "zip_with(slice(_t, 1, size(_t) - 1), "
                 "slice(_t, 2, size(_t) - 1), "
                 "(a, b) -> struct(a AS w1, b AS w2))")).alias("p"))
             .select("doc_id", "p.w1", "p.w2"))
    scored = (pairs
              .join(F.broadcast(bigrams), ["w1", "w2"], "left")
              .join(F.broadcast(contexts), "w1", "left")
              .select("doc_id",
                      ((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
                       .cast("double")
                       / (F.coalesce(F.col("ctx"), F.lit(0)) + F.lit(V))
                       .cast("double")).alias("p")))
    g = (scored.groupBy("doc_id")
         .agg(F.count("*").alias("_n"),
              F.array_sort(F.collect_list(F.struct("p"))).alias("_ps"))
         .select("doc_id",
                 F.col("_n").cast("long").alias("n_pairs"),
                 (F.expr("aggregate(_ps, CAST(0 AS DOUBLE), "
                         "(acc, x) -> acc + x.p)")
                  / F.col("_n").cast("double")).alias("mean_pair_prob")))
    return (d.select("doc_id").join(g, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.coalesce("mean_pair_prob", F.lit(0.0))
                    .alias("mean_pair_prob")))


def lm_score_bigram_sql(doc_sql: str,
                        vocab_doc_sql: str | None = None) -> str:
    """DuckDB twin: same pair stream, model tables, and sorted fold."""
    vsql = vocab_doc_sql or doc_sql
    toks = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d AS ({doc_sql}),
vd AS ({vsql}),
vt AS (SELECT doc_id, {toks} AS _t, len({toks}) AS n FROM vd),
vp AS (
  SELECT unnest(list_transform(range(1, n),
           i -> {{'w1': _t[i], 'w2': _t[i + 1]}})) AS pp
  FROM vt WHERE n >= 2
),
big AS (SELECT pp.w1 AS w1, pp.w2 AS w2, count(*) AS cnt
        FROM vp GROUP BY 1, 2),
ctx AS (SELECT w1, sum(cnt) AS ctx FROM big GROUP BY 1),
vs AS (SELECT count(DISTINCT w) AS v
       FROM (SELECT unnest(_t) AS w FROM vt)),
dt AS (SELECT doc_id, {toks} AS _t, len({toks}) AS n FROM d),
dp AS (
  SELECT doc_id, unnest(list_transform(range(1, n),
           i -> {{'w1': _t[i], 'w2': _t[i + 1]}})) AS pp
  FROM dt WHERE n >= 2
),
j AS (
  SELECT dp.doc_id,
         CAST(COALESCE(b.cnt, 0) + 1 AS DOUBLE)
         / CAST(COALESCE(c.ctx, 0) + vs.v AS DOUBLE) AS p
  FROM dp
  LEFT JOIN big b ON dp.pp.w1 = b.w1 AND dp.pp.w2 = b.w2
  LEFT JOIN ctx c ON dp.pp.w1 = c.w1
  CROSS JOIN vs
),
g AS (
  SELECT doc_id, count(*) AS _n,
         list_sort(list({{'p': p}})) AS _ps
  FROM j GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(g._n, 0) AS BIGINT) AS n_pairs,
       COALESCE(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(g._ps, x -> x.p)), (acc, x) -> acc + x)
         / CAST(g._n AS DOUBLE), 0.0) AS mean_pair_prob
FROM d LEFT JOIN g ON d.doc_id = g.doc_id
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------

def _ngram_hashes_expr(n: int) -> str:
    """Distinct hashed word n-grams of the staged token column ``_t``."""
    gram = f"concat_ws(' ', slice(_t, i, {n}))"
    return (f"array_distinct(CASE WHEN size(_t) >= {n} THEN "
            f"transform(sequence(1, size(_t) - {n} + 1), "
            f"i -> {H64_SPARK.format(s=gram)}) ELSE array() END)")


def _ngram_hashes_duck(n: int, toks: str) -> str:
    gram = f"array_to_string({toks}[i:i+{n - 1}], ' ')"
    return (f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
            f"list_transform(range(1, len({toks}) - {n} + 2), "
            f"i -> {H64_DUCK.format(s=gram)}) ELSE [] END)")


def decontaminate(docs: DataFrame, benchmarks: DataFrame, *, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """Flag training docs that share word ``n``-grams with an eval set →
    ``(doc_id, n_grams, n_contaminated)`` (drop rows with
    ``n_contaminated > 0`` downstream, the GPT-3/Llama-style rule).

    Scale shape: the corpus explodes its distinct gram hashes once and
    semi-joins the (small, broadcast) eval hash table — O(1) hashed
    membership per gram. An earlier cut collected the eval hashes into
    a literal array and scanned it per gram: O(|eval grams|) per
    membership test, measured 33× slower on the span-removal twin of
    this plan at the 200k probe. Only docs with at least one hit
    regroup (the contaminated sliver); the gram count itself is a
    map-only projection, so clean-corpus cost is scan-shaped.
    ``doc_id`` must be unique (the repo-wide contract — every
    aggregate-by-id operator merges rows sharing an id)."""
    bench = (benchmarks.select(F.expr(TOKS_SPARK.format(s=f"lower({bench_text_col})"))
                               .alias("_t"))
             .select(F.explode(F.expr(_ngram_hashes_expr(n))).alias("h"))
             .distinct())
    d = (_doc(docs, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="lower(text)")))
         .withColumn("_g", F.expr(_ngram_hashes_expr(n))))
    hits = (d.select("doc_id", F.explode("_g").alias("h"))
            .join(F.broadcast(bench), "h", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").alias("_nc")))
    return (d.join(hits, "doc_id", "left")
            .select("doc_id",
                    F.expr("CAST(size(_g) AS BIGINT)").alias("n_grams"),
                    F.coalesce("_nc", F.lit(0)).cast("long")
                    .alias("n_contaminated")))


def decontaminate_sql(doc_sql: str, bench_sql: str, n: int = 8) -> str:
    toks = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d0 AS ({doc_sql}),
b0 AS ({bench_sql}),
bh AS (
  SELECT DISTINCT unnest({_ngram_hashes_duck(n, toks)}) AS h FROM b0
),
dg AS (SELECT doc_id, {_ngram_hashes_duck(n, toks)} AS g FROM d0),
un AS (SELECT doc_id, unnest(g) AS h FROM dg),
hits AS (
  SELECT un.doc_id, count(*) AS c FROM un JOIN bh USING (h)
  GROUP BY un.doc_id
)
SELECT dg.doc_id,
       CAST(len(dg.g) AS BIGINT) AS n_grams,
       CAST(COALESCE(hits.c, 0) AS BIGINT) AS n_contaminated
FROM dg LEFT JOIN hits ON dg.doc_id = hits.doc_id
"""


def decontaminate_semantic(corpus_emb: DataFrame, eval_emb: DataFrame, *,
                           tau: float = 0.1, metric: str = "cosine",
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           eval_id_col: str = "vec_id",
                           eval_vec_col: str = "embedding") -> DataFrame:
    """Embedding-space benchmark decontamination: flag corpus docs
    whose embedding sits within ``tau`` (cosine distance) of ANY
    eval-set embedding — the semantic complement of the n-gram
    :func:`decontaminate` (paraphrased eval leakage that shares no
    8-gram). → ``(doc_id, n_close_eval, contaminated)``.

    Delegates to the epsilon range join (corpus × eval, filter at the
    join — never a materialized m×n), count per corpus id, left-join
    back so clean docs report 0. The eval side is small by nature →
    broadcast; at 100 TB the corpus side streams through one scan."""
    from cuvs_spark.operators import epsilon_neighborhood

    X = corpus_emb.select(F.col(id_col).cast("long").alias("id"),
                          F.col(vec_col).alias("vec"))
    Y = eval_emb.select(F.col(eval_id_col).cast("long").alias("id"),
                        F.col(eval_vec_col).alias("vec"))
    close = epsilon_neighborhood(X, Y, tau, metric)
    hits = close.groupBy("i").agg(F.count("*").alias("n_close_eval"))
    return (X.select(F.col("id").alias("doc_id"))
            .join(hits.withColumnRenamed("i", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_close_eval", F.lit(0)).cast("long")
                    .alias("n_close_eval"),
                    (F.coalesce("n_close_eval", F.lit(0)) > 0).cast("int")
                    .alias("contaminated")))


def decontaminate_semantic_sql(corpus_sql: str, eval_sql: str,
                               tau: float, metric: str = "cosine") -> str:
    from cuvs_spark.plans.oracle import eps_sql
    eps = eps_sql(corpus_sql, eval_sql, tau, metric)
    return f"""
WITH close AS ({eps}),
hits AS (SELECT i, count(*) AS c FROM close GROUP BY i),
corpus AS ({corpus_sql})
SELECT corpus.i AS doc_id,
       CAST(COALESCE(hits.c, 0) AS BIGINT) AS n_close_eval,
       CAST(CASE WHEN COALESCE(hits.c, 0) > 0 THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM corpus LEFT JOIN hits ON corpus.i = hits.i
"""


def nfc_normalize(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization (the ftfy-lite cleanup stage every
    multilingual corpus needs before hashing/dedup — composed vs
    decomposed accents hash differently). Arrow-batched ``mapInPandas``
    over Python's unicodedata (both engines implement the same Unicode
    normal form, so the DuckDB ``nfc_normalize`` twin is exact).
    → ``(doc_id, norm_text, changed)``. Map-only."""
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"))

    def run(batches):
        import unicodedata

        import pandas as pd
        for pdf in batches:
            norm = [unicodedata.normalize("NFC", t or "")
                    for t in pdf["text"]]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "norm_text": norm,
                "changed": [int(a != (b or ""))
                            for a, b in zip(norm, pdf["text"])]})
            out["changed"] = out["changed"].astype("int32")
            yield out

    return d.mapInPandas(run, "doc_id long, norm_text string, changed int")


def nfc_normalize_sql(doc_sql: str) -> str:
    # COALESCE both sides: the Spark path maps NULL text to '' with
    # changed=0, and gate outputs must be null-free.
    return f"""
WITH d AS ({doc_sql})
SELECT doc_id, nfc_normalize(COALESCE(text, '')) AS norm_text,
       CAST(CASE WHEN nfc_normalize(COALESCE(text, '')) <> COALESCE(text, '')
            THEN 1 ELSE 0 END AS INT) AS changed
FROM d
"""


def contamination_report(docs: DataFrame, benchmarks: DataFrame, *,
                         n: int = 8, id_col: str = "doc_id",
                         text_col: str = "text",
                         bench_id_col: str = "bench_id",
                         bench_text_col: str = "text") -> DataFrame:
    """Per-EVAL-item contamination audit →
    ``(bench_id, n_grams, n_docs_hit, n_grams_hit)``: for each eval
    item, how many distinct corpus docs share at least one word
    ``n``-gram with it, and how many of its own grams are hit.

    :func:`decontaminate` answers the corpus-side question ("which
    training docs must go"); this is the report the EVAL owner reads —
    which benchmark items have leaked into the corpus, and how widely.
    An item with ``n_docs_hit`` in the thousands is boilerplate-like
    (its grams are generic); one hit by a handful of docs is a true
    leak. Both counts are exact distinct counts, not sketches.

    Scale shape: the corpus explodes to distinct ``(doc, gram-hash)``
    pairs ONCE; the eval side (small by nature) broadcasts into the
    join, so the corpus never shuffles and cost tracks corpus gram
    volume — the same discipline as :func:`decontaminate`."""
    bg = (benchmarks.select(
              F.col(bench_id_col).cast("long").alias("bench_id"),
              F.expr(TOKS_SPARK.format(s=f"lower({bench_text_col})"))
              .alias("_t"))
          .select("bench_id", F.expr(_ngram_hashes_expr(n)).alias("_g")))
    totals = bg.select("bench_id",
                       F.expr("CAST(size(_g) AS BIGINT)").alias("n_grams"))
    bh = bg.select("bench_id", F.explode("_g").alias("h"))
    dg = (_doc(docs, id_col, text_col)
          .withColumn("_t", F.expr(TOKS_SPARK.format(s="lower(text)")))
          .select("doc_id", F.explode(F.expr(_ngram_hashes_expr(n)))
                  .alias("h")))
    hits = (dg.join(F.broadcast(bh), "h")
            .groupBy("bench_id")
            .agg(F.countDistinct("doc_id").alias("n_docs_hit"),
                 F.countDistinct("h").alias("n_grams_hit")))
    return (totals.join(hits, "bench_id", "left")
            .select("bench_id", "n_grams",
                    F.coalesce("n_docs_hit", F.lit(0)).cast("long")
                    .alias("n_docs_hit"),
                    F.coalesce("n_grams_hit", F.lit(0)).cast("long")
                    .alias("n_grams_hit")))


def contamination_report_sql(doc_sql: str, bench_sql: str,
                             n: int = 8) -> str:
    """DuckDB twin (``bench_sql`` yields ``(bench_id, text)``)."""
    toks = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d0 AS ({doc_sql}),
b0 AS ({bench_sql}),
bg AS (SELECT CAST(bench_id AS BIGINT) AS bench_id,
              {_ngram_hashes_duck(n, toks)} AS g FROM b0),
bh AS (SELECT bench_id, unnest(g) AS h FROM bg),
dh AS (SELECT doc_id, unnest({_ngram_hashes_duck(n, toks)}) AS h FROM d0),
hits AS (
  SELECT bh.bench_id, count(DISTINCT dh.doc_id) AS n_docs_hit,
         count(DISTINCT bh.h) AS n_grams_hit
  FROM dh JOIN bh USING (h) GROUP BY bh.bench_id
)
SELECT bg.bench_id, CAST(len(bg.g) AS BIGINT) AS n_grams,
       CAST(COALESCE(hits.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
       CAST(COALESCE(hits.n_grams_hit, 0) AS BIGINT) AS n_grams_hit
FROM bg LEFT JOIN hits ON bg.bench_id = hits.bench_id
"""


def length_quantiles(df: DataFrame,
                     probs: tuple = (0.25, 0.5, 0.75, 0.9), *,
                     group_col: str = "source", id_col: str = "doc_id",
                     text_col: str = "text", ndigits: int = 6) -> DataFrame:
    """Per-domain token-length quantiles →
    ``(group, n_docs, q1..qm)`` — the corpus-audit summary every
    mixture owner looks at first (is this crawl all tweets or all
    books?). Exact type-7 linear-interpolation percentiles (both
    engines' exact quantile), rounded to ``ndigits`` on both sides
    since the interpolation arithmetic is engine-internal.

    Scale shape: one map-only token count, one groupBy per domain.
    Exact percentile holds per-group state O(group rows) on the
    reducer — domains are the partition key, so this is the same
    per-domain-sort budget as the exact token-budget path; swap in
    ``percentile_approx`` upstream for sketch-bounded state if a
    single domain outgrows a reducer."""
    toks = TOKS_SPARK.format(s=text_col)
    d = df.select(F.col(group_col).alias("grp"),
                  F.expr(f"CAST(size({toks}) AS DOUBLE)").alias("_n"))
    pl = [float(p) for p in probs]
    agg = d.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.percentile("_n", F.array(*[F.lit(p) for p in pl])).alias("_q"))
    cols = [F.round(F.col("_q")[i], ndigits).alias(f"q{i + 1}")
            for i in range(len(pl))]
    return agg.select(F.col("grp").alias(group_col), "n_docs", *cols)


def length_quantiles_sql(doc_sql: str,
                         probs: tuple = (0.25, 0.5, 0.75, 0.9), *,
                         group_col: str = "source",
                         ndigits: int = 6) -> str:
    """DuckDB twin (``quantile_cont`` = the same type-7 rule)."""
    toks = TOKS_DUCK.format(s="text")
    pl = ", ".join(repr(float(p)) for p in probs)
    cols = ",\n       ".join(
        f"ROUND(q[{i + 1}], {ndigits}) AS q{i + 1}"
        for i in range(len(probs)))
    return f"""
WITH d AS ({doc_sql}),
t AS (SELECT {group_col} AS grp, CAST(len({toks}) AS DOUBLE) AS _n
      FROM d),
g AS (SELECT grp, count(*) AS n_docs,
             quantile_cont(_n, [{pl}]) AS q
      FROM t GROUP BY grp)
SELECT grp AS {group_col}, CAST(n_docs AS BIGINT) AS n_docs,
       {cols}
FROM g
"""


# script-class char ranges (BMP, embedded as literal chars so both
# engines parse identical classes — no escape-syntax divergence)
# (name, spark class, duckdb class) — identical except \s, whose
# backslash must be doubled inside a Spark SQL string literal but not
# in DuckDB's (standard-SQL literals don't process escapes)
_SCRIPT_CLASSES = (
    ("latin", "a-zA-Z", "a-zA-Z"),
    ("digit", "0-9", "0-9"),
    ("cjk", "一-鿿", "一-鿿"),
    ("cyrillic", "Ѐ-ӿ", "Ѐ-ӿ"),
    ("space", "\\\\s", "\\s"),
)


def script_profile(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unicode script-mix audit per doc → ``(doc_id, n_chars,
    latin_frac, digit_frac, cjk_frac, cyrillic_frac, space_frac)``.

    The multilingual-curation companion to the n-gram
    :func:`language_id` heuristic: script fractions catch what a
    token-level model can't — mixed-script spam ("Ĺíké ťhíś"
    homoglyphs score near-zero on every class), CJK embedded in a
    Latin crawl, digit-heavy table dumps — and they work on text with
    no whitespace tokenization at all. Each count is one
    ``regexp_replace`` with a negated single-range character class
    (alternation-free, the dual-engine regex rule), so the whole op
    is a map-only projection; fractions divide by
    ``greatest(n_chars, 1)`` to stay null-free on empty docs.
    """
    d = _doc(df, id_col, text_col)
    cols = [F.expr("CAST(length(text) AS BIGINT)").alias("n_chars")]
    for nm, cls, _ in _SCRIPT_CLASSES:
        cnt = f"length(regexp_replace(text, '[^{cls}]', ''))"
        cols.append(F.expr(
            f"CAST({cnt} AS DOUBLE) / "
            f"CAST(greatest(length(text), 1) AS DOUBLE)")
            .alias(f"{nm}_frac"))
    return d.select("doc_id", *cols)


def script_profile_sql(doc_sql: str) -> str:
    """DuckDB twin (``regexp_replace`` needs the explicit 'g' flag;
    both engines count codepoints)."""
    parts = []
    for nm, _, cls in _SCRIPT_CLASSES:
        cnt = f"length(regexp_replace(text, '[^{cls}]', '', 'g'))"
        parts.append(f"CAST({cnt} AS DOUBLE) / "
                     f"CAST(greatest(length(text), 1) AS DOUBLE) "
                     f"AS {nm}_frac")
    cols = ",\n       ".join(parts)
    return f"""
WITH d AS ({doc_sql})
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       {cols}
FROM d
"""


# ---------------------------------------------------------------------------
# n-gram novelty (memorization / duplication-pressure audit)
# ---------------------------------------------------------------------------

def ngram_novelty(df: DataFrame, n: int = 3, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc fraction of word ``n``-grams that appear in NO other
    document → ``(doc_id, n_grams, novel_grams, novelty_frac)``.

    The memorization-pressure audit: a doc whose n-grams are mostly
    shared with the rest of the corpus is boilerplate / near-dup
    residue and trains the model to memorize, while novelty ≈ 1 marks
    genuinely fresh text. Used as a soft score where the hard dedup
    passes (:mod:`cuvs_spark.pipeline.dedup`) are too blunt — e.g. to
    down-weight rather than drop (per-doc distinct grams, so within-doc
    repetition is :func:`repetition_stats`'s job, not this one's).

    Scale shape: explode → distinct ``(gram, doc_id)`` pairs (ONE
    gram-string computation; the distinct's exchange is then reused by
    both downstream aggregations), then ``n_grams`` per doc and the
    per-gram ``(dfreq, min(doc_id))`` rollup. A novel gram has exactly
    one owner (its min doc), so ``novel_grams`` regroups only the
    ``dfreq = 1`` SLIVER of the gram rollup by owner — the full pair
    table is never joined back through the gram key (the r7 review's
    plan fix; measured 15.7 s at the 200k probe vs 17.7 s for the
    join-back and 45-50 s for two row-local variants whose dual
    consumers each recomputed the gram transform — per-doc
    ``array_distinct``/md5 arrays are NOT cheaper than one
    distinct exchange). A hot gram is ONE row after the map-side
    combine. The only division is one integer-pair IEEE divide (exact
    on both engines); empty docs survive with ``novelty_frac = 0`` via
    the left join + coalesce.
    """
    d = _doc(df, id_col, text_col)
    toks = TOKS_SPARK.format(s="text")
    pairs = (d.select("doc_id", F.expr(toks).alias("t"))
             .select("doc_id",
                     F.explode(F.expr(_gram_expr_spark(n))).alias("g"))
             .distinct())
    per_doc = pairs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"))
    novel = (pairs.groupBy("g")
             .agg(F.count("*").alias("dfreq"),
                  F.min("doc_id").alias("owner"))
             .filter(F.col("dfreq") == 1)
             .groupBy(F.col("owner").alias("doc_id"))
             .agg(F.count("*").cast("long").alias("novel_grams")))
    uniq = per_doc.join(novel, "doc_id", "left")
    return (d.select("doc_id").join(uniq, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("novel_grams", F.lit(0))
                     .alias("novel_grams"),
                    F.when(F.coalesce(F.col("n_grams"), F.lit(0)) == 0,
                           F.lit(0.0))
                     .otherwise(F.coalesce(F.col("novel_grams"),
                                           F.lit(0)).cast("double")
                                / F.col("n_grams").cast("double"))
                     .alias("novelty_frac")))


def ngram_novelty_sql(doc_sql: str, n: int = 3) -> str:
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
t0 AS (SELECT doc_id, {toks} AS t FROM d),
tk AS (SELECT doc_id, list_distinct({_gram_expr_duck(n)}) AS g FROM t0),
per_doc AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams FROM tk),
pairs AS (SELECT doc_id, unnest(g) AS g FROM tk),
novel AS (
  SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS novel_grams
  FROM (SELECT g, count(*) AS dfreq, min(doc_id) AS owner
        FROM pairs GROUP BY g)
  WHERE dfreq = 1 GROUP BY owner
)
SELECT p.doc_id,
       p.n_grams,
       COALESCE(v.novel_grams, 0) AS novel_grams,
       CASE WHEN p.n_grams = 0 THEN 0.0
            ELSE CAST(COALESCE(v.novel_grams, 0) AS DOUBLE)
                 / CAST(p.n_grams AS DOUBLE)
       END AS novelty_frac
FROM per_doc p LEFT JOIN novel v ON p.doc_id = v.doc_id
"""


# ---------------------------------------------------------------------------
# vocabulary head coverage (tokenizer-design audit)
# ---------------------------------------------------------------------------

def vocab_coverage(df: DataFrame, k: int = 50, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Token-mass coverage of the top-``k`` corpus vocabulary →
    ``(rank, term, term_freq, cum_freq, total_tokens, coverage_frac)``
    ordered by frequency (ties → term text).

    The tokenizer-design / Zipf audit: "how much of the corpus do the
    k most frequent whitespace tokens cover" decides vocab size and
    flags degenerate crawls (a boilerplate-heavy corpus hits 90%
    coverage absurdly early). ``coverage_frac`` at each rank is the
    cumulative head mass.

    Scale shape: one token explode → map-side-combined term count →
    global top-``k`` via orderBy+limit (TakeOrderedAndProject: partial
    per-partition top-k, never a full sort) → the running sum and rank
    are windows over the k survivors only. ``total_tokens`` is a
    1-row global agg cross-joined in (broadcast). Integer counts; one
    exact IEEE division per row.
    """
    d = _doc(df, id_col, text_col)
    toks = TOKS_SPARK.format(s="text")
    terms = (d.select(F.explode(F.expr(toks)).alias("term"))
             .groupBy("term").agg(F.count("*").alias("term_freq")))
    topk = terms.orderBy(F.col("term_freq").desc(),
                         F.col("term").asc()).limit(k)
    w = Window.orderBy(F.col("term_freq").desc(), F.col("term").asc())
    total = (d.select(F.expr(f"size({toks})").alias("_n"))
             .agg(F.sum("_n").cast("long").alias("total_tokens")))
    return (topk
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .withColumn("cum_freq",
                        F.sum("term_freq").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                        .cast("long"))
            .crossJoin(F.broadcast(total))
            .select("rank", "term",
                    F.col("term_freq").cast("long").alias("term_freq"),
                    "cum_freq", "total_tokens",
                    (F.col("cum_freq").cast("double")
                     / F.col("total_tokens").cast("double"))
                    .alias("coverage_frac")))


def vocab_coverage_sql(doc_sql: str, k: int = 50) -> str:
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
tok AS (SELECT unnest({toks}) AS term FROM d),
terms AS (SELECT term, count(*) AS term_freq FROM tok GROUP BY term),
total AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM tok),
ranked AS (
  SELECT term, term_freq,
         row_number() OVER (ORDER BY term_freq DESC, term ASC) AS rank,
         sum(term_freq) OVER (ORDER BY term_freq DESC, term ASC
                              ROWS UNBOUNDED PRECEDING) AS cum_freq
  FROM terms
)
SELECT CAST(rank AS BIGINT) AS rank, term,
       CAST(term_freq AS BIGINT) AS term_freq,
       CAST(cum_freq AS BIGINT) AS cum_freq,
       t.total_tokens AS total_tokens,
       CAST(cum_freq AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)
         AS coverage_frac
FROM ranked CROSS JOIN total t WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# decontamination by SPAN REMOVAL (drop the leaked n-grams, keep the doc)
# ---------------------------------------------------------------------------

def decontaminate_remove(docs: DataFrame, benchmarks: DataFrame, *,
                         n: int = 8, id_col: str = "doc_id",
                         text_col: str = "text",
                         bench_text_col: str = "text") -> DataFrame:
    """Remove every token covered by an eval-set ``n``-gram instead of
    dropping the document → ``(doc_id, clean_text, n_tokens,
    n_removed)``.

    The surgical complement to :func:`decontaminate` (the GPT-3 report
    removes leaked SPANS and keeps the surrounding text; dropping whole
    docs throws away good tokens when the leak is one quoted question).
    A token survives iff NO contaminated gram starting in
    ``[t-n+1, t]`` covers it; reassembly is token-level, so whitespace
    runs normalize to single spaces (the same token space the match is
    defined in). Matching is case-insensitive at the gram level while
    the surviving text keeps its original case.

    Scale shape: the corpus side explodes its gram hashes once and
    semi-joins the (small, broadcast) eval hash table — O(1) hashed
    membership per gram, not a per-gram scan of an eval-set literal
    (an earlier literal-array formulation measured 247 s at the 200k
    probe; this one 10 s). Only the CONTAMINATED docs regroup their
    matched positions and pay the per-token coverage fold (bounded by
    matches-per-doc); clean docs — the overwhelming majority — take
    the map-only token rebuild and never shuffle. The DuckDB twin
    keeps its independent correlated-range construction, so the gate
    cross-checks two formulations. ``doc_id`` must be unique (the
    repo-wide contract — rows sharing an id would merge their matched
    positions)."""
    bench = (benchmarks.select(
                 F.expr(TOKS_SPARK.format(s=f"lower({bench_text_col})"))
                 .alias("_t"))
             .select(F.explode(F.expr(_ngram_hashes_expr(n))).alias("h"))
             .distinct())
    toks = TOKS_SPARK.format(s="text")
    d = _doc(docs, id_col, text_col).withColumn("_t", F.expr(toks))
    gram_h = H64_SPARK.format(
        s=f"lower(concat_ws(' ', slice(_t, p, {n})))")
    grams = d.select(
        "doc_id",
        F.explode(F.expr(
            f"CASE WHEN size(_t) < {n} THEN array() "
            f"ELSE transform(sequence(1, size(_t) - {n - 1}), "
            f"p -> struct(p AS p, {gram_h} AS h)) END")).alias("g"))
    badpos = (grams.select("doc_id", F.col("g.p").alias("p"),
                           F.col("g.h").alias("h"))
              .join(F.broadcast(bench), "h", "left_semi")
              .groupBy("doc_id")
              .agg(F.array_sort(F.collect_list("p")).alias("_bp")))
    # 1..T as an array — guarded because Spark's sequence(1, 0) DESCENDS
    idx = ("CASE WHEN size(_t) = 0 THEN array() "
           "ELSE sequence(1, size(_t)) END")
    # token t is covered iff a matched gram starts in [t-n+1, t]
    cov = (f"CASE WHEN _bp IS NULL THEN array_repeat(false, size(_t)) "
           f"ELSE transform({idx}, t -> exists(_bp, "
           f"p -> p >= t - {n - 1} AND p <= t)) END")
    out = (d.join(badpos, "doc_id", "left")
           .withColumn("_cov", F.expr(cov)))
    return out.select(
        "doc_id",
        F.expr(f"array_join(transform(filter({idx}, "
               "t -> NOT element_at(_cov, t)), "
               "t -> element_at(_t, t)), ' ')").alias("clean_text"),
        F.expr("CAST(size(_t) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(size(filter(_cov, x -> x)) AS BIGINT)")
        .alias("n_removed"))


def decontaminate_remove_sql(doc_sql: str, bench_sql: str,
                             n: int = 8) -> str:
    btoks = TOKS_DUCK.format(s="lower(text)")
    toks = TOKS_DUCK.format(s="text")
    gram = f"lower(array_to_string(t[p:p + {n - 1}], ' '))"
    return f"""
WITH d0 AS ({doc_sql}),
b0 AS ({bench_sql}),
bh AS (
  SELECT DISTINCT unnest({_ngram_hashes_duck(n, btoks)}) AS h FROM b0
),
tk AS (SELECT doc_id, {toks} AS t FROM d0),
grams AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p, {H64_DUCK.format(s=gram)} AS h
  FROM tk, LATERAL (SELECT unnest(range(1, len(t) - {n - 2})) AS p)
  WHERE len(t) >= {n}
),
bad AS (SELECT g.doc_id, g.p FROM grams g JOIN bh ON g.h = bh.h),
toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(t, 1) AS BIGINT) AS pos,
         unnest(t) AS tok, len(t) AS nt
  FROM tk
),
marked AS (
  SELECT tk2.doc_id, tk2.pos, tk2.tok, tk2.nt,
         EXISTS (SELECT 1 FROM bad b WHERE b.doc_id = tk2.doc_id
                 AND b.p BETWEEN tk2.pos - {n - 1} AND tk2.pos) AS cov
  FROM toks tk2
),
agg AS (
  SELECT doc_id,
         COALESCE(array_to_string(list(tok ORDER BY pos)
                                  FILTER (WHERE NOT cov), ' '), '')
           AS clean_text,
         CAST(max(nt) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM marked GROUP BY doc_id
)
SELECT d0.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_removed, 0) AS n_removed
FROM d0 LEFT JOIN agg a ON d0.doc_id = a.doc_id
"""


def collocations(df: DataFrame, k: int = 20, *, min_count: int = 5,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Top-``k`` adjacent-word collocations by LIFT →
    ``(w1, w2, pair_count, lift, rank)`` — statistically-bound word
    pairs ("new york", "machine learning"), the corpus-analysis pass
    behind phrase mining, tokenizer-merge candidates, and boilerplate
    phrase discovery. ``lift = P(w1,w2) / (P(w1·)·P(·w2)) =
    N·c(w1,w2) / (c(w1·)·c(·w2))`` over the adjacent-pair relation —
    PMI's argument WITHOUT the log (the repo-wide no-libm gate rule;
    log is monotone, so the top-k by lift IS the top-k by PMI).

    Determinism: every count is an integer from one groupBy; the lift
    is a single division of two exactly-representable int products
    (computed in doubles so a 100 TB corpus can't overflow the int64
    product). Scale shape: one explode → three map-side-combined
    groupBys (pair, left-word, right-word) → two broadcast-able joins
    onto the pair table (word marginals ≪ pair table) → global top-k
    via TakeOrderedAndProject. ``min_count`` prunes the hapax tail
    before the joins — the classic collocation-noise filter (a pair
    seen twice in one doc scores huge lift)."""
    d = _doc(df, id_col, text_col)
    toks = TOKS_SPARK.format(s="text")
    pairs = (d.select(F.expr(toks).alias("t"))
             .filter(F.expr("size(t) >= 2"))
             .select(F.explode(F.expr(
                 "transform(sequence(1, size(t) - 1), "
                 "i -> struct(t[i - 1] AS w1, t[i] AS w2))"))
                 .alias("p"))
             .select("p.w1", "p.w2"))
    pc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    lc = pairs.groupBy("w1").agg(F.count("*").alias("_cl"))
    rc = pairs.groupBy("w2").agg(F.count("*").alias("_cr"))
    n = pairs.agg(F.count("*").alias("_n"))
    scored = (pc.filter(F.col("pair_count") >= int(min_count))
              .join(lc, "w1").join(rc, "w2").crossJoin(F.broadcast(n))
              .select("w1", "w2",
                      F.col("pair_count").cast("long").alias("pair_count"),
                      (F.col("pair_count").cast("double")
                       * F.col("_n").cast("double")
                       / (F.col("_cl").cast("double")
                          * F.col("_cr").cast("double"))).alias("lift")))
    topk = scored.orderBy(F.col("lift").desc(), F.col("w1").asc(),
                          F.col("w2").asc()).limit(int(k))
    w = Window.orderBy(F.col("lift").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
    return (topk.withColumn("rank", F.row_number().over(w))
            .select("w1", "w2", "pair_count", "lift",
                    F.col("rank").cast("long").alias("rank")))


def collocations_sql(doc_sql: str, k: int = 20, *,
                     min_count: int = 5) -> str:
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
tk AS (SELECT t FROM (SELECT {toks} AS t FROM d) WHERE len(t) >= 2),
pairs AS (
  SELECT p['w1'] AS w1, p['w2'] AS w2 FROM (
    SELECT unnest(list_transform(range(1, len(t)),
                  i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS p
    FROM tk)
),
pc AS (SELECT w1, w2, count(*) AS pair_count FROM pairs GROUP BY w1, w2),
lc AS (SELECT w1, count(*) AS _cl FROM pairs GROUP BY w1),
rc AS (SELECT w2, count(*) AS _cr FROM pairs GROUP BY w2),
n AS (SELECT count(*) AS _n FROM pairs),
scored AS (
  SELECT pc.w1 AS w1, pc.w2 AS w2,
         CAST(pair_count AS BIGINT) AS pair_count,
         CAST(pair_count AS DOUBLE) * CAST(_n AS DOUBLE)
           / (CAST(_cl AS DOUBLE) * CAST(_cr AS DOUBLE)) AS lift
  FROM pc JOIN lc USING (w1) JOIN rc USING (w2) CROSS JOIN n
  WHERE pair_count >= {int(min_count)}
),
r AS (
  SELECT w1, w2, pair_count, lift,
         row_number() OVER (ORDER BY lift DESC, w1 ASC, w2 ASC) AS rank
  FROM scored
)
SELECT w1, w2, pair_count, lift, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {int(k)}
"""


def vocab_gini(df: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Gini coefficient of the token-frequency distribution → one row
    ``(gini, n_vocab, total_tokens)`` — the single-number Zipf audit
    complementing :func:`vocab_coverage`'s head table: 0 = perfectly
    uniform vocabulary, → 1 = a few tokens dominate (template spam,
    boilerplate floods, collapsed crawls move it up; diverse prose
    sits lower). Tracked per source/snapshot it flags distribution
    drift without eyeballing the whole frequency table.

    Exactness + scale in one trick: the rank-sum formula
    ``G = (2·Σᵢ i·fᵢ − (n+1)·Σf) / (n·Σf)`` needs frequencies sorted
    ascending — but ranks within a TIE contribute a constant sum, so
    grouping by distinct frequency value collapses the n-row sort to a
    ≤#distinct-frequencies-row cumsum (a few thousand rows even at
    100 TB: bounded by the largest token count, with one row per
    distinct value actually present). Everything stays INTEGER until
    one final double expression; the window runs over the tiny
    distinct-frequency table, never the vocab.

    Int64 envelope: the rank-sum ``Σ i·fᵢ`` is bounded by
    vocab_size × total_tokens, so the exact path is safe while
    V·T < 9.2·10¹⁸ (e.g. a 10⁸-term vocab over 10¹⁰ tokens); past
    that — trillion-token corpora with extreme vocabularies — shard
    the corpus (per-source Ginis are the drift-tracking use anyway)
    or recompute the final sums in doubles."""
    d = _doc(df, id_col, text_col)
    toks = TOKS_SPARK.format(s="text")
    freq = (d.select(F.explode(F.expr(toks)).alias("w"))
            .groupBy("w").agg(F.count("*").alias("f")))
    by_f = freq.groupBy("f").agg(F.count("*").alias("m"))
    w = (Window.orderBy("f")
         .rowsBetween(Window.unboundedPreceding, -1))
    # tokens with strictly smaller frequency precede the block; the
    # block's rank sum is C·m + m(m+1)/2 regardless of tie order
    ranked = by_f.withColumn(
        "_c", F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long"))
    agg = ranked.agg(
        # all-integer rank-sum (m·(m+1) is even, so DIV 2 is exact):
        # the sum is over longs — order-independent by construction
        F.sum(F.expr("f * (_c * m + (m * (m + 1)) DIV 2)"))
        .cast("double").alias("_s1"),
        F.sum(F.col("f") * F.col("m")).cast("long").alias("_s0"),
        F.sum("m").cast("long").alias("_nv"))
    return agg.select(
        ((F.lit(2.0) * F.col("_s1")
          - (F.col("_nv") + F.lit(1)).cast("double")
          * F.col("_s0").cast("double"))
         / (F.col("_nv").cast("double")
            * F.col("_s0").cast("double"))).alias("gini"),
        F.col("_nv").alias("n_vocab"),
        F.col("_s0").alias("total_tokens"))


def vocab_gini_sql(doc_sql: str) -> str:
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
freq AS (
  SELECT w, count(*) AS f FROM (
    SELECT unnest({toks}) AS w FROM d) GROUP BY w
),
by_f AS (SELECT f, count(*) AS m FROM freq GROUP BY f),
ranked AS (
  SELECT f, m,
         CAST(COALESCE(sum(m) OVER (ORDER BY f
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS _c
  FROM by_f
),
agg AS (
  SELECT CAST(sum(f * (_c * m + (m * (m + 1)) // 2)) AS DOUBLE) AS _s1,
         CAST(sum(f * m) AS BIGINT) AS _s0,
         CAST(sum(m) AS BIGINT) AS _nv
  FROM ranked
)
SELECT (2.0 * _s1 - CAST(_nv + 1 AS DOUBLE) * CAST(_s0 AS DOUBLE))
         / (CAST(_nv AS DOUBLE) * CAST(_s0 AS DOUBLE)) AS gini,
       _nv AS n_vocab, _s0 AS total_tokens
FROM agg
"""

def fertility_by_group(df: DataFrame, *, group_col: str = "lang",
                       text_col: str = "text") -> DataFrame:
    """Tokenizer fertility audit per group → ``(lang, n_docs,
    n_tokens, n_chars, chars_per_token)`` — how many characters one
    whitespace token carries per language. The tokenizer-budget
    planning table: scripts without whitespace (zh/ja) show extreme
    fertility under a whitespace pre-tokenizer, which is exactly when
    a byte/char-level segmenter must replace it before token-budget
    sampling trusts ``n_tokens``.

    Engine parity: three map-side-combined integer sums + ONE exact
    division (0-token groups report 0.0, null-free).

    Scale shape: map-only token/char counting, one tiny groupBy on
    the group key — no shuffle of text."""
    d = df.select(
        F.col(group_col).alias("grp"),
        F.expr(f"CAST(size({TOKS_SPARK.format(s=text_col)}) AS BIGINT)")
        .alias("_nt"),
        F.length(text_col).cast("long").alias("_nc"))
    return (d.groupBy("grp")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("_nt").cast("long").alias("n_tokens"),
                 F.sum("_nc").cast("long").alias("n_chars"))
            .select(F.col("grp").alias(group_col), "n_docs", "n_tokens",
                    "n_chars",
                    F.expr("CASE WHEN n_tokens = 0 THEN 0.0 ELSE "
                           "CAST(n_chars AS DOUBLE) / "
                           "CAST(n_tokens AS DOUBLE) END")
                    .alias("chars_per_token")))


def fertility_by_group_sql(doc_sql: str, *, group_col: str = "lang",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`fertility_by_group` — same integer sums,
    same single division."""
    toks = TOKS_DUCK.format(s=text_col)
    return f"""
WITH src AS ({doc_sql}),
d AS (
  SELECT {group_col} AS grp,
         CAST(len({toks}) AS BIGINT) AS _nt,
         CAST(length({text_col}) AS BIGINT) AS _nc
  FROM src
),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_nt) AS BIGINT) AS n_tokens,
         CAST(sum(_nc) AS BIGINT) AS n_chars
  FROM d GROUP BY grp
)
SELECT grp AS {group_col}, n_docs, n_tokens, n_chars,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       END AS chars_per_token
FROM g
"""
