"""Lexical retrieval (BM25) and hybrid rank fusion (RRF).

The lexical sibling of the vector-search stack: a corpus user of the
reference engine (cuVS brute-force / IVF / graph kNN — SURVEY.md §2.5)
pairs ANN with BM25 for hybrid retrieval and hard-negative mining
(``dedup.mine_hard_negatives`` consumes either ranking). No
reference-engine analog (cuVS is vectors-only); this is the corpus-side
operator its users run next to it, re-expressed Spark-first.

Scale shape:
- the posting relation ``(term, doc_id, tf, dl)`` shuffles ONCE on the
  term key; document-frequency joins it on the same key (co-located);
  corpus scalars (N, avgdl) ride along as a broadcast 1-row table;
- query terms join postings on term — the classic sharded-by-term IR
  layout; per-(query, doc) accumulation is one groupBy with map-side
  combine; top-k uses :func:`select_k` (no global sort);
- RRF fusion is a union + one groupBy over candidate rows only.

Gate determinism: scores use the log-free Robertson IDF ratio
``(N - df + 0.5) / (df + 0.5)`` (the same rational-IDF discipline as
``text.tfidf_keywords`` — pow/log are not correctly rounded across
JVM/DuckDB libm, the repo-wide gate rule), and per-document sums fold
in sorted term order (``array_sort`` + ``aggregate`` / ``list_sort`` +
``list_reduce``) so both engines add the same doubles in the same
order. ``idf='lucene'`` switches to the classical ``ln(1 + ...)`` form
for downstream use — identical plan shape, not oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cuvs_spark.pipeline.dedup import TOKS_DUCK, TOKS_SPARK


def _lit(x: float) -> str:
    """Shortest round-trip literal — parses to the identical IEEE
    double in Spark SQL and DuckDB."""
    return repr(float(x))


def bm25_search(docs: DataFrame, queries: DataFrame, k: int = 10, *,
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text",
                qid_col: str = "qid", qtext_col: str = "qtext",
                idf: str = "rational",
                max_df_frac: float | None = None) -> DataFrame:
    """BM25 top-``k`` documents per query →
    ``(qid, doc_id, score, rank)``.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    over the query's distinct lowercased whitespace terms.
    ``idf='rational'`` (default, oracle-gated) uses the Robertson
    ratio without the log; ``'lucene'`` applies ``ln(1 + ratio)``.

    ``max_df_frac`` is the SCALE lever: terms whose document frequency
    exceeds ``max_df_frac · N`` are dropped from scoring (classic
    stopword pruning — the candidate set for a (query, term) pair is
    that term's posting list, so one stopword otherwise fans a single
    query out to a large fraction of the corpus; BM25's IDF gives such
    terms near-zero weight anyway, which is why every production IR
    engine prunes or impact-orders them). None scores every term —
    exact, and what the oracle gate uses."""
    if idf not in ("rational", "lucene"):
        raise ValueError(idf)
    from cuvs_spark.plans.layout import spread_narrow

    # r14 (guide §2.5): spread a narrow doc source so tokenize +
    # explode + the map-side partial of the tf aggregation run on
    # every core (no-op for any real table at scale)
    d = spread_narrow(
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("text")), "doc_id")
    toks = TOKS_SPARK.format(s="lower(text)")
    t = d.select("doc_id", F.explode(F.expr(toks)).alias("w"))
    tf = t.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    # dl = Σ tf per doc (identical integers to counting raw tokens):
    # derives from the (doc, term)-aggregated relation so the raw token
    # explode is shuffled ONCE, not twice (r14, guide §2.3 — the old
    # plan re-exploded every token a second time just to count it)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("sum_dl"))

    ratio = ("(CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / "
             "(CAST(df AS DOUBLE) + 0.5)")
    idf_expr = ratio if idf == "rational" else f"ln(1.0 + ({ratio}))"
    tnorm = (f"CAST(tf AS DOUBLE) + {_lit(k1)} * "
             f"(1.0 - {_lit(b)} + {_lit(b)} * (CAST(dl AS DOUBLE) / "
             f"(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))")
    score = (f"({idf_expr}) * "
             f"((CAST(tf AS DOUBLE) * {_lit(k1 + 1.0)}) / ({tnorm}))")
    qt = (queries.select(F.col(qid_col).cast("long").alias("qid"),
                         F.col(qtext_col).alias("qtext"))
          .select("qid", F.explode(F.expr(
              TOKS_SPARK.format(s="lower(qtext)"))).alias("w"))
          .distinct())
    # r14 join reorder (guide §2.3): restrict the posting list to the
    # query's terms FIRST — inner equi-joins commute, so the surviving
    # rows and their scores are identical, but dfreq/dl/stats now
    # attach to candidate rows only instead of the whole (doc, term)
    # relation.
    # r15 (guide §3.1/§3.2): document frequency is counted AFTER a
    # left-semi of the posting relation against the SAME broadcast qt
    # the hits join uses — one broadcast build shared by both joins
    # (a semi join cannot multiply rows on right-side duplicates, so
    # the r14 `qt.select("w").distinct()` aggregation + second
    # broadcast is gone). The semi drops whole term groups and never
    # rows within one, so the per-term counts are identical to
    # counting the full vocabulary first — scores bit-identical — but
    # the full-vocabulary aggregation tower disappears, and the
    # resulting dfreq is query-sized, so it BROADCASTS into the hits
    # join instead of shuffling the candidate relation by term.
    dfreq = (tf.join(F.broadcast(qt), "w", "left_semi")
             .groupBy("w").agg(F.count("*").alias("df")))
    if max_df_frac is not None:
        # prune stopwords BEFORE the posting join — df is already
        # aggregated, so the filter costs one scalar comparison per
        # distinct term and caps every posting list the query side
        # can fan out to
        dfreq = (dfreq.crossJoin(F.broadcast(stats.select("n_docs")))
                 .filter(F.col("df")
                         <= F.lit(float(max_df_frac)) * F.col("n_docs"))
                 .select("w", "df"))
    hits = (tf.join(F.broadcast(qt), "w")
            .join(F.broadcast(dfreq), "w")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("qid", "doc_id", "w", F.expr(score).alias("s")))
    per_doc = (hits.groupBy("qid", "doc_id")
               .agg(F.array_sort(F.collect_list(F.struct("w", "s")))
                    .alias("_ts"))
               .select("qid", "doc_id", F.expr(
                   "aggregate(_ts, CAST(0.0 AS DOUBLE), "
                   "(acc, x) -> acc + x.s)").alias("score")))
    from cuvs_spark.operators.select_k import select_k
    return (select_k(per_doc, "qid", "score", k, select_min=False,
                     tie_cols=["doc_id"], rank_col="rank",
                     strategy="auto")
            .select("qid", "doc_id", "score",
                    F.col("rank").cast("long").alias("rank")))


def bm25_search_sql(doc_sql: str, query_sql: str, k: int = 10, *,
                    k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of the rational-IDF path — the same expression tree
    on the same operands in the same sorted fold order."""
    toks = TOKS_DUCK.format(s="lower(text)")
    qtoks = TOKS_DUCK.format(s="lower(qtext)")
    ratio = ("(CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / "
             "(CAST(df AS DOUBLE) + 0.5)")
    tnorm = (f"CAST(tf AS DOUBLE) + {_lit(k1)} * "
             f"(1.0 - {_lit(b)} + {_lit(b)} * (CAST(dl AS DOUBLE) / "
             f"(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))")
    score = (f"({ratio}) * "
             f"((CAST(tf AS DOUBLE) * {_lit(k1 + 1.0)}) / ({tnorm}))")
    return f"""
WITH d AS ({doc_sql}),
t AS (SELECT doc_id, unnest({toks}) AS w FROM d),
tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY doc_id, w),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
q AS ({query_sql}),
qt AS (SELECT DISTINCT CAST(qid AS BIGINT) AS qid, unnest({qtoks}) AS w
       FROM q),
hits AS (
  SELECT qt.qid, tf.doc_id, qt.w, {score} AS s
  FROM qt JOIN tf USING (w)
       JOIN dfreq USING (w)
       JOIN dl USING (doc_id)
       CROSS JOIN stats
),
per_doc AS (
  SELECT qid, doc_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_sort(list({{'w': w, 's': s}})),
                            x -> x.s)),
             (acc, x) -> acc + x) AS score
  FROM hits GROUP BY qid, doc_id
),
r AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM per_doc
)
SELECT qid, doc_id, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def rrf_fuse(rankings: list[DataFrame], k: int = 10, *,
             k_rrf: int = 60, qid_col: str = "qid",
             id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N rankings →
    ``(qid, doc_id, rrf_score, rank)`` with
    ``rrf_score = Σ_i 1 / (k_rrf + rank_i)`` over the rankings that
    contain the (query, doc) pair — the standard hybrid-search combiner
    for BM25 + vector kNN (rank-based, so the incomparable score
    scales never meet).

    Rational arithmetic on integer ranks; the per-pair sum folds in
    source order (each input is tagged 0..N−1 and the fold sorts on the
    tag), so the gate is bit-exact. One union + one groupBy over
    candidate rows only — cost tracks Σ|rankings|, never the corpus."""
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    tagged = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(qid_col).cast("long").alias("qid"),
                      F.col(id_col).cast("long").alias("doc_id"),
                      F.lit(i).alias("_src"),
                      F.col(rank_col).cast("long").alias("_rk"))
        tagged = ri if tagged is None else tagged.unionByName(ri)
    contrib = tagged.select(
        "qid", "doc_id", "_src",
        F.expr(f"1.0 / (CAST({int(k_rrf)} AS DOUBLE) + "
               f"CAST(_rk AS DOUBLE))").alias("_c"))
    fused = (contrib.groupBy("qid", "doc_id")
             .agg(F.array_sort(F.collect_list(F.struct("_src", "_c")))
                  .alias("_cs"))
             .select("qid", "doc_id", F.expr(
                 "aggregate(_cs, CAST(0.0 AS DOUBLE), "
                 "(acc, x) -> acc + x._c)").alias("rrf_score")))
    from cuvs_spark.operators.select_k import select_k
    return (select_k(fused, "qid", "rrf_score", k, select_min=False,
                     tie_cols=["doc_id"], rank_col="rank",
                     strategy="auto")
            .select("qid", "doc_id", "rrf_score",
                    F.col("rank").cast("long").alias("rank")))


def rrf_fuse_sql(ranking_sqls: list[str], k: int = 10, *,
                 k_rrf: int = 60) -> str:
    """DuckDB twin: each input SQL must yield (qid, doc_id, rank)."""
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST(qid AS BIGINT) AS qid, CAST(doc_id AS BIGINT) AS "
        f"doc_id, {i} AS _src, CAST(rank AS BIGINT) AS _rk "
        f"FROM ({s.strip()})"
        for i, s in enumerate(ranking_sqls))
    return f"""
WITH tagged AS (
{unions}
),
contrib AS (
  SELECT qid, doc_id, _src,
         1.0 / (CAST({int(k_rrf)} AS DOUBLE) + CAST(_rk AS DOUBLE)) AS _c
  FROM tagged
),
fused AS (
  SELECT qid, doc_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_sort(list({{'_src': _src, '_c': _c}})),
                            x -> x._c)),
             (acc, x) -> acc + x) AS rrf_score
  FROM contrib GROUP BY qid, doc_id
),
r AS (
  SELECT qid, doc_id, rrf_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused
)
SELECT qid, doc_id, rrf_score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def maxsim_search(doc_tokens: DataFrame, query_tokens: DataFrame,
                  k: int = 10, *, metric: str = "cosine",
                  doc_col: str = "doc_id", dtok_col: str = "tok_idx",
                  dvec_col: str = "vec", qdoc_col: str = "qid",
                  qtok_col: str = "tok_idx", qvec_col: str = "vec",
                  candidates: DataFrame | None = None) -> DataFrame:
    """ColBERT-style late-interaction retrieval over MULTI-vector
    documents: ``score(q, d) = Σ_{query token} max_{doc token}
    sim(qv, dv)`` → top-``k`` docs per query as
    ``(qid, doc_id, score, rank)``.

    Single-vector retrieval pools a document to one embedding and
    loses token-level alignment; late interaction (Khattab & Zaharia,
    SIGIR 2020) keeps one vector per token on both sides and lets each
    query token pick its best-matching document token. ``metric`` is
    ``'cosine'`` (sim = 1 − cosine distance) or ``'inner_product'``
    (sim = the dot itself) — both rendered from the shared
    ``functions/distance.py`` templates, so the oracle twin is
    bit-identical.

    Determinism for the gate: the inner max is an exact double
    min/max; the outer sum folds in sorted ``qtok`` order
    (``array_sort`` + ``aggregate``), the repo-wide sorted-fold rule.

    **Scale shape.** The exact form pairs every query token with every
    doc token — correct at gate scale and for re-ranking. At corpus
    scale, pass ``candidates`` (``(qid, doc_id)`` — e.g. top-100 of an
    ANN search over POOLED per-doc vectors, the standard two-stage
    ColBERT serving layout): token pairing then touches candidate
    pairs only, so cost tracks ``|candidates| · q_toks · d_toks``
    instead of ``|Q| · |D|``.
    """
    if metric not in ("cosine", "inner_product"):
        raise ValueError(f"maxsim metric must be cosine or "
                         f"inner_product, got {metric}")
    from cuvs_spark.functions.distance import distance_sql_spark
    from cuvs_spark.operators.select_k import select_k

    # r14 (guide §1.2 step 2): hoist cosine's per-vector norm folds
    # into one projection per token side — the |candidates|·q_toks·
    # d_toks pair loop then folds once (dot) per pair instead of three
    # times. Bit-identical (see distance.cosine_norm_sql_spark).
    # r15 (construction latency): the norm rides in the SAME select as
    # the column staging — one analyzed Dataset per side instead of
    # two; the optimized plan is identical (CollapseProject).
    dcols = [F.col(doc_col).cast("long").alias("doc_id"),
             F.col(dtok_col).cast("long").alias("dtok"),
             F.col(dvec_col).alias("dv")]
    qcols = [F.col(qdoc_col).cast("long").alias("qid"),
             F.col(qtok_col).cast("long").alias("qtok"),
             F.col(qvec_col).alias("qv")]
    if metric == "cosine":
        from cuvs_spark.functions.distance import (cosine_norm_sql_spark,
                                                   cosine_pair_sql_spark)
        dcols.append(F.expr(cosine_norm_sql_spark(dvec_col)).alias("_dn"))
        qcols.append(F.expr(cosine_norm_sql_spark(qvec_col)).alias("_qn"))
    d = doc_tokens.select(*dcols)
    q = query_tokens.select(*qcols)
    if candidates is not None:
        cand = candidates.select(F.col("qid").cast("long").alias("qid"),
                                 F.col("doc_id").cast("long")
                                 .alias("doc_id"))
        pairs = q.join(cand, "qid").join(d, "doc_id")
    else:
        pairs = q.crossJoin(d)
    if metric == "cosine":
        dist = F.expr(cosine_pair_sql_spark("qv", "dv", "_qn", "_dn"))
    else:
        dist = F.expr(distance_sql_spark(metric, "qv", "dv"))
    if metric == "cosine":
        contrib = (F.lit(1.0) - F.min(dist)).alias("_c")
    else:
        contrib = F.max(dist).alias("_c")
    # r15 (construction latency): the contrib transform rides in the
    # inner aggregate's result expression and the sorted fold in the
    # outer's — two fewer analyzed Datasets; the canonicalized
    # optimized plan is byte-identical to the r14 three-step form
    # (CollapseProject had already merged both projections there).
    per_qtok = (pairs.groupBy("qid", "doc_id", "qtok")
                .agg(contrib))
    scored = (per_qtok.groupBy("qid", "doc_id")
              .agg(F.expr(
                  "aggregate(array_sort(collect_list(struct(qtok, _c))), "
                  "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x._c)")
                  .alias("score")))
    return (select_k(scored, "qid", "score", k, select_min=False,
                     tie_cols=["doc_id"], rank_col="rank",
                     strategy="auto")
            .select("qid", "doc_id", "score",
                    F.col("rank").cast("long").alias("rank")))


def maxsim_search_sql(doc_sql: str, query_sql: str, k: int = 10, *,
                      metric: str = "cosine") -> str:
    """DuckDB twin: same distance template, same exact inner min/max,
    same sorted qtok fold, same (score DESC, doc_id ASC) rank.
    ``doc_sql`` yields ``(doc_id, tok_idx, dv)``; ``query_sql`` yields
    ``(qid, tok_idx, qv)``."""
    if metric not in ("cosine", "inner_product"):
        raise ValueError(metric)
    from cuvs_spark.functions.distance import distance_sql_duckdb

    dist = distance_sql_duckdb(metric, "q.qv", "d.dv")
    agg, contrib = (("min", "1.0 - best") if metric == "cosine"
                    else ("max", "best"))
    return f"""
WITH d AS ({doc_sql}),
q AS ({query_sql}),
pt AS (
  SELECT q.qid AS qid, d.doc_id AS doc_id,
         CAST(q.tok_idx AS BIGINT) AS qtok, {agg}({dist}) AS best
  FROM q CROSS JOIN d GROUP BY 1, 2, 3
),
s AS (
  SELECT qid, doc_id,
         list_sort(list({{'qtok': qtok, 'c': {contrib}}})) AS cs
  FROM pt GROUP BY qid, doc_id
),
sc AS (
  SELECT qid, doc_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(cs, x -> x.c)), (acc, x) -> acc + x) AS score
  FROM s
),
r AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM sc
)
SELECT qid, doc_id, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def borda_fuse(rankings: list[DataFrame], k: int = 10, *,
               depth: int = 10, qid_col: str = "qid",
               id_col: str = "doc_id",
               rank_col: str = "rank") -> DataFrame:
    """Borda-count fusion of N top-``depth`` rankings →
    ``(qid, doc_id, borda_score, rank)`` with
    ``borda_score = Σ_i max(0, depth − rank_i + 1)`` — the
    positional-points alternative to :func:`rrf_fuse` (RRF's 1/(60+r)
    barely separates deep ranks; Borda weights the whole list
    linearly, the standard choice when every input list is trusted
    equally, e.g. fusing BM25 with dense retrieval for training-pair
    mining).

    PURE INTEGER arithmetic end-to-end — the score sum is
    order-independent by construction (no fold-ordering machinery
    needed, unlike RRF's double reciprocals), so the gate is exact by
    the cheapest possible route. Same scale shape as RRF: one union +
    one map-side-combined groupBy over candidate rows only."""
    if not rankings:
        raise ValueError("borda_fuse: rankings must be non-empty")
    tagged = None
    for r in rankings:
        ri = r.select(F.col(qid_col).cast("long").alias("qid"),
                      F.col(id_col).cast("long").alias("doc_id"),
                      F.col(rank_col).cast("long").alias("_rk"))
        tagged = ri if tagged is None else tagged.unionByName(ri)
    pts = tagged.select(
        "qid", "doc_id",
        F.greatest(F.lit(0).cast("long"),
                   F.lit(int(depth) + 1) - F.col("_rk")).alias("_p"))
    fused = (pts.groupBy("qid", "doc_id")
             .agg(F.sum("_p").cast("long").alias("borda_score")))
    from cuvs_spark.operators.select_k import select_k
    return (select_k(fused, "qid", "borda_score", k, select_min=False,
                     tie_cols=["doc_id"], rank_col="rank",
                     strategy="auto")
            .select("qid", "doc_id", "borda_score",
                    F.col("rank").cast("long").alias("rank")))


def borda_fuse_sql(ranking_sqls: list[str], k: int = 10, *,
                   depth: int = 10) -> str:
    """DuckDB twin: each input SQL must yield (qid, doc_id, rank)."""
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST(qid AS BIGINT) AS qid, CAST(doc_id AS BIGINT) AS "
        f"doc_id, CAST(rank AS BIGINT) AS _rk FROM ({s.strip()})"
        for s in ranking_sqls)
    return f"""
WITH tagged AS (
{unions}
),
fused AS (
  SELECT qid, doc_id,
         CAST(sum(greatest(CAST(0 AS BIGINT),
                           {int(depth) + 1} - _rk)) AS BIGINT)
           AS borda_score
  FROM tagged GROUP BY qid, doc_id
),
r AS (
  SELECT qid, doc_id, borda_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY borda_score DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT qid, doc_id, borda_score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def mmr_diversify(cand: DataFrame, k: int = 5, *, lam: float = 0.5,
                  qid_col: str = "qid", id_col: str = "doc_id",
                  rel_col: str = "rel",
                  vec_col: str = "vec") -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998)
    of a per-query CANDIDATE set → ``(qid, doc_id, mmr_rank)``: pick
    the most relevant candidate first, then greedily the candidate
    maximizing ``lam·rel − (1−lam)·max_sim_to_selected`` — the
    diversity-aware serving stage every production vector search runs
    after ANN (near-duplicate hits crowd out coverage; cuVS users
    re-rank its top-k the same way).

    ``cand`` is the ANN/BM25 top-N per query with a relevance column
    (higher = better) and the candidate's vector; similarity between
    candidates is cosine (1 − the shared cosine-distance fold, so both
    engines and the oracle agree bit-for-bit; ties break on doc_id).

    Scale shape: CANDIDATES-ONLY, like the MaxSim re-rank — per query
    the loop touches N candidates × ≤k selected, never the corpus, and
    all queries proceed in parallel inside each unrolled step (k
    dataframe steps, each one join + one groupBy + one top-1 window
    over candidate rows). Per-step lineage is cut with a lazy
    localCheckpoint so the plan stays O(k), not O(2^k)."""
    from cuvs_spark.functions.distance import distance_sql_spark
    if not 0.0 <= lam <= 1.0:
        raise ValueError("mmr_diversify: lam must be in [0, 1]")
    c = cand.select(F.col(qid_col).cast("long").alias("qid"),
                    F.col(id_col).cast("long").alias("doc_id"),
                    F.col(rel_col).cast("double").alias("rel"),
                    F.col(vec_col).alias("vec"))
    sim = (f"CAST(1 AS DOUBLE) - "
           f"({distance_sql_spark('cosine', 'vec', '_sv')})")
    lam_l, lam_r = _lit(lam), _lit(1.0 - lam)
    w1 = Window.partitionBy("qid").orderBy(F.col("rel").desc(),
                                           F.col("doc_id").asc())
    sel = (c.withColumn("_rn", F.row_number().over(w1))
           .filter(F.col("_rn") == 1)
           .select("qid", "doc_id", "vec", F.lit(1).alias("mmr_rank")))
    for i in range(2, int(k) + 1):
        sel = sel.localCheckpoint(eager=False)
        rem = c.join(sel.select("qid", "doc_id"),
                     ["qid", "doc_id"], "left_anti")
        ms = (rem.join(sel.select("qid", F.col("vec").alias("_sv")),
                       "qid")
              .select("qid", "doc_id", F.expr(sim).alias("_s"))
              .groupBy("qid", "doc_id").agg(F.max("_s").alias("_ms")))
        wi = Window.partitionBy("qid").orderBy(F.col("_score").desc(),
                                               F.col("doc_id").asc())
        pick = (rem.join(ms, ["qid", "doc_id"])
                .withColumn("_score",
                            F.expr(f"{lam_l} * rel") -
                            F.expr(f"{lam_r} * _ms"))
                .withColumn("_rn", F.row_number().over(wi))
                .filter(F.col("_rn") == 1)
                .select("qid", "doc_id", "vec",
                        F.lit(i).alias("mmr_rank")))
        sel = sel.unionByName(pick)
    return (sel.select("qid", "doc_id",
                       F.col("mmr_rank").cast("long").alias("mmr_rank")))


def mmr_diversify_sql(cand_sql: str, k: int = 5, *,
                      lam: float = 0.5) -> str:
    """DuckDB twin, unrolled: ``cand_sql`` yields
    ``(qid, doc_id, rel, vec)``; k CTE steps mirror the Spark loop
    exactly (same cosine fold, same lam split, same doc_id ties)."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    sim = (f"CAST(1 AS DOUBLE) - "
           f"({distance_sql_duckdb('cosine', 'r.vec', 's.vec')})")
    lam_l, lam_r = _lit(lam), _lit(1.0 - lam)
    parts = [f"cand AS ({cand_sql})",
             """sel_1 AS (
  SELECT qid, doc_id, vec, 1 AS mmr_rank FROM (
    SELECT qid, doc_id, vec,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, doc_id ASC) AS _rn
    FROM cand) WHERE _rn = 1
)""",
             "selu_1 AS (SELECT * FROM sel_1)"]
    for i in range(2, int(k) + 1):
        parts.append(f"""rem_{i} AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM selu_{i - 1} s
                    WHERE s.qid = c.qid AND s.doc_id = c.doc_id)
)""")
        parts.append(f"""ms_{i} AS (
  SELECT r.qid AS qid, r.doc_id AS doc_id, max({sim}) AS _ms
  FROM rem_{i} r JOIN selu_{i - 1} s ON r.qid = s.qid
  GROUP BY r.qid, r.doc_id
)""")
        parts.append(f"""sel_{i} AS (
  SELECT qid, doc_id, vec, {i} AS mmr_rank FROM (
    SELECT r.qid AS qid, r.doc_id AS doc_id, r.vec AS vec,
           row_number() OVER (PARTITION BY r.qid
             ORDER BY {lam_l} * r.rel - {lam_r} * m._ms DESC,
                      r.doc_id ASC) AS _rn
    FROM rem_{i} r JOIN ms_{i} m ON r.qid = m.qid
                               AND r.doc_id = m.doc_id) WHERE _rn = 1
)""")
        parts.append(f"""selu_{i} AS (
  SELECT * FROM selu_{i - 1} UNION ALL SELECT * FROM sel_{i}
)""")
    return f"""
WITH {', '.join(parts)}
SELECT qid, doc_id, CAST(mmr_rank AS BIGINT) AS mmr_rank
FROM selu_{int(k)}
"""
