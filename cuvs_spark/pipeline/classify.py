"""Model-based quality filtering: hashed-n-gram linear classifier
inference and DSIR-style importance weighting.

Two standard corpus-curation stages the heuristic filters in
``pipeline/text.py`` don't cover:

* :func:`classifier_score` — fastText-style linear classifier inference
  over hashed unigram+bigram features (the GPT-3 / CCNet "quality
  classifier" stage). The model is a ``(bucket, weight)`` table; weights
  are fixed-point BIGINT so scoring is pure integer arithmetic —
  hash-exact across engines and overflow-safe in int64.
* :func:`dsir_importance` — Data Selection via Importance Resampling
  (Xie et al., 2023) re-expressed with rational arithmetic: per-token
  likelihood ratio between a target-domain and raw hashed-unigram model
  (Laplace-smoothed), folded to a per-doc mean. The published method
  sums log-ratios; the gate-able variant here averages the ratios
  themselves, which needs no libm (log is not correctly rounded — see
  the verify skill's gate rules) and preserves the ordering signal the
  resampling step consumes.

Scale shape: both operators are token-explode (map) → broadcast join
against an ``n_buckets``-row table (tiny by construction: 2^12–2^22
rows regardless of corpus size) → one ``doc_id`` groupBy with map-side
combine. Nothing shuffles the corpus except the final per-doc
aggregation, and feature hashing keeps state O(n_buckets), not
O(vocab), which is what makes the design hold at 100 TB.

No reference-engine analog (cuVS is a vector-search library); these are
north-star pipeline extensions per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_spark.pipeline.dedup import H64_DUCK, H64_SPARK, TOKS_DUCK, TOKS_SPARK

__all__ = [
    "classifier_score",
    "classifier_score_sql",
    "dsir_importance",
    "dsir_importance_sql",
    "dsir_select",
    "dsir_select_sql",
    "knn_label_vote",
    "knn_label_vote_sql",
    "synthetic_weights",
]

# integer LCG-style weight in [-1000, 1000] for the synthetic gate
# model: pure integer arithmetic, reproducible inline on both engines
_W_A = 2654435761
_W_B = 40503
_W_P = 1000003
_W_R = 2001


def _w_expr(b: str) -> str:
    """Weight formula (Spark and DuckDB share int semantics here)."""
    return f"((({b}) * {_W_A} + {_W_B}) % {_W_P}) % {_W_R} - 1000"


def synthetic_weights(spark: SparkSession, n_buckets: int) -> DataFrame:
    """Deterministic stand-in model ``(bucket, weight)`` — the shape a
    real exported linear model arrives in (fastText / sklearn coef_
    quantized to 1e-6 fixed point)."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        F.expr(_w_expr("id")).cast("long").alias("weight"))


def _features_spark(n_buckets: int) -> str:
    """Hashed unigram+bigram buckets of the staged token column ``_t``."""
    uni = f"transform(_t, t -> {H64_SPARK.format(s='t')} % {n_buckets})"
    gram = "concat(element_at(_t, i), ' ', element_at(_t, i + 1))"
    bi = (f"CASE WHEN size(_t) >= 2 THEN "
          f"transform(sequence(1, size(_t) - 1), "
          f"i -> {H64_SPARK.format(s=gram)} % {n_buckets}) "
          f"ELSE array() END")
    return f"concat({uni}, {bi})"


def _features_duck(n_buckets: int, toks: str) -> str:
    uni = f"list_transform({toks}, t -> {H64_DUCK.format(s='t')} % {n_buckets})"
    gram = f"{toks}[i] || ' ' || {toks}[i + 1]"
    bi = (f"CASE WHEN len({toks}) >= 2 THEN "
          f"list_transform(range(1, len({toks})), "
          f"i -> {H64_DUCK.format(s=gram)} % {n_buckets}) "
          f"ELSE [] END")
    return f"list_concat({uni}, {bi})"


def classifier_score(df: DataFrame, weights: DataFrame, *,
                     n_buckets: int = 4096, bias_fp: int = 0,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Linear classifier inference → ``(doc_id, n_feats, score_fp,
    label)``.

    ``weights`` is ``(bucket: long, weight: long)`` with weights in
    1e-6 fixed point; ``score_fp = bias + Σ weight[bucket(f)]`` over
    hashed unigram+bigram features (sum of BIGINTs — order-free, exact).
    ``label = 1`` iff ``score_fp > 0``. Overflow headroom: |weight| ≤
    ~2^31 fixed-point leaves 2^32 features per doc before int64 wraps.
    """
    from cuvs_spark.plans.layout import spread_narrow

    # r14 (guide §2.5): the tokenize + 2·hash-per-token feature fold is
    # the entry's whole cost — spread a narrow source over the cores
    # (no-op whenever the scan already has >= parallelism/2 splits)
    d = spread_narrow(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text")), "doc_id") \
        .withColumn("_t", F.expr(TOKS_SPARK.format(s="lower(text)")))
    feats = d.select("doc_id", F.explode_outer(
        F.expr(_features_spark(n_buckets))).alias("bucket"))
    scored = (feats.join(F.broadcast(weights), "bucket", "left")
              .groupBy("doc_id")
              .agg(F.count("bucket").alias("n_feats"),
                   F.coalesce(F.sum("weight"), F.lit(0)).alias("_s")))
    return scored.select(
        "doc_id",
        F.col("n_feats").cast("long").alias("n_feats"),
        (F.col("_s") + F.lit(bias_fp)).cast("long").alias("score_fp"),
        ((F.col("_s") + F.lit(bias_fp)) > 0).cast("int").alias("label"))


def classifier_score_sql(doc_sql: str, *, n_buckets: int = 4096,
                         bias_fp: int = 0) -> str:
    """DuckDB twin against the synthetic model (weights recomputed
    inline from the same integer formula)."""
    toks = TOKS_DUCK.format(s="lower(text)")
    return f"""
WITH d AS ({doc_sql}),
f AS (
  SELECT doc_id, unnest({_features_duck(n_buckets, toks)}) AS bucket
  FROM d
),
s AS (
  SELECT f.doc_id, count(*) AS n_feats,
         sum({_w_expr('f.bucket')}) AS _s
  FROM f GROUP BY f.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(COALESCE(s._s, 0) + {bias_fp} AS BIGINT) AS score_fp,
       CAST(CASE WHEN COALESCE(s._s, 0) + {bias_fp} > 0
            THEN 1 ELSE 0 END AS INT) AS label
FROM d LEFT JOIN s ON d.doc_id = s.doc_id
"""


def dsir_importance(df: DataFrame, target_filter: str, *,
                    n_buckets: int = 4096, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """DSIR importance weight per doc → ``(doc_id, n_toks,
    mean_ratio)``.

    ``target_filter`` is a boolean SQL expression naming the target
    domain (e.g. ``"source = 'wiki'"``). Hashed-unigram bucket counts
    are taken over the target slice and the full corpus; each token's
    Laplace-smoothed likelihood ratio is

        r = ((ct+1) · (Traw + NB)) / ((cr+1) · (Ttgt + NB))

    and ``mean_ratio`` is the per-doc mean of ``r`` (sorted fold →
    engine-independent IEEE accumulation). Rows with ``mean_ratio``
    above a chosen quantile are the DSIR keep-set; thresholding
    composes with :func:`cuvs_spark.pipeline.sampling.deterministic_sample`
    for the stochastic variant."""
    from cuvs_spark.plans.layout import spread_narrow

    # r14 (guide §2.5): spread a narrow source so tokenize + per-token
    # hashing runs on every core (no-op for any real table at scale)
    d = spread_narrow(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"),
                  F.expr(target_filter).alias("_tgt")), "doc_id") \
        .withColumn("_t", F.expr(TOKS_SPARK.format(s="lower(text)")))
    toks = d.select(
        "doc_id", "_tgt",
        F.explode(F.expr(
            f"transform(_t, t -> {H64_SPARK.format(s='t')} % {n_buckets})"
        )).alias("b"))
    counts = (toks.groupBy("b")
              .agg(F.count("*").alias("cr"),
                   F.sum(F.col("_tgt").cast("long")).alias("ct")))
    totals = counts.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    lut = counts.crossJoin(F.broadcast(totals))
    nb = float(n_buckets)
    ratio = (
        (F.col("ct").cast("double") + F.lit(1.0))
        * (F.col("tr").cast("double") + F.lit(nb))
        / ((F.col("cr").cast("double") + F.lit(1.0))
           * (F.col("tt").cast("double") + F.lit(nb)))).alias("r")
    per_tok = toks.join(F.broadcast(lut.select("b", ratio)), "b")
    return (per_tok.groupBy("doc_id")
            .agg(F.count("*").alias("_n"),
                 F.array_sort(F.collect_list(F.struct("r"))).alias("_rs"))
            .select(
                "doc_id",
                F.col("_n").cast("long").alias("n_toks"),
                (F.expr("aggregate(_rs, CAST(0 AS DOUBLE), "
                        "(acc, x) -> acc + x.r)")
                 / F.col("_n").cast("double")).alias("mean_ratio")))


def dsir_select(df: DataFrame, target_filter: str, *, n_keep: int,
                n_buckets: int = 4096, id_col: str = "doc_id",
                text_col: str = "text",
                method: str = "rank") -> DataFrame:
    """DSIR selection: the ``n_keep`` highest-importance docs →
    ``(doc_id, mean_ratio, rk)``.

    ``method='rank'`` is the exact form (one global row_number window —
    fine up to the ~10⁸-row scores table, which is tiny next to the
    corpus it ranks). At 100 TB use ``method='threshold'``: an
    approximate quantile of ``mean_ratio`` (one percentile_approx agg)
    becomes a plain filter, so nothing ever funnels through a single
    partition; the keep-count is then approximate, which resampling
    tolerates."""
    w = dsir_importance(df, target_filter, n_buckets=n_buckets,
                        id_col=id_col, text_col=text_col)
    if method == "threshold":
        frac = None  # resolved against the corpus row count
        total = w.count()
        frac = max(0.0, 1.0 - float(n_keep) / max(total, 1))
        thr = w.agg(F.percentile_approx("mean_ratio", frac).alias("t"))
        return (w.crossJoin(F.broadcast(thr))
                .filter(F.col("mean_ratio") >= F.col("t"))
                .select("doc_id", "mean_ratio",
                        F.lit(None).cast("long").alias("rk")))
    if method != "rank":
        raise ValueError(method)
    from pyspark.sql import Window
    rk = F.row_number().over(
        Window.orderBy(F.col("mean_ratio").desc(), F.col("doc_id")))
    return (w.withColumn("rk", rk.cast("long"))
            .filter(F.col("rk") <= n_keep)
            .select("doc_id", "mean_ratio", "rk"))


def dsir_select_sql(doc_sql: str, target_filter: str, *, n_keep: int,
                    n_buckets: int = 4096) -> str:
    inner = dsir_importance_sql(doc_sql, target_filter,
                                n_buckets=n_buckets)
    return f"""
WITH w AS ({inner}),
r AS (SELECT doc_id, mean_ratio,
             row_number() OVER (ORDER BY mean_ratio DESC, doc_id) AS rk
      FROM w)
SELECT doc_id, mean_ratio, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {n_keep}
"""


def dsir_importance_sql(doc_sql: str, target_filter: str, *,
                        n_buckets: int = 4096) -> str:
    toks = TOKS_DUCK.format(s="lower(text)")
    nb = float(n_buckets)
    return f"""
WITH d AS ({doc_sql}),
t AS (
  SELECT doc_id,
         CASE WHEN {target_filter} THEN 1 ELSE 0 END AS _tgt,
         unnest(list_transform({toks},
                t -> {H64_DUCK.format(s='t')} % {n_buckets})) AS b
  FROM d
),
c AS (SELECT b, count(*) AS cr, sum(_tgt) AS ct FROM t GROUP BY b),
tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM c),
lut AS (
  SELECT b,
         (CAST(ct AS DOUBLE) + 1.0) * (CAST(tr AS DOUBLE) + {nb})
         / ((CAST(cr AS DOUBLE) + 1.0) * (CAST(tt AS DOUBLE) + {nb})) AS r
  FROM c CROSS JOIN tot
),
g AS (
  SELECT t.doc_id, count(*) AS _n,
         list_sort(list({{'r': lut.r}})) AS _rs
  FROM t JOIN lut ON t.b = lut.b GROUP BY t.doc_id
)
SELECT doc_id, CAST(_n AS BIGINT) AS n_toks,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(_rs, x -> x.r)), (acc, x) -> acc + x)
         / CAST(_n AS DOUBLE) AS mean_ratio
FROM g
"""


def knn_label_vote(data: DataFrame, queries: DataFrame, k: int = 10,
                   metric: str = "sqeuclidean", *,
                   id_col: str = "id", vec_col: str = "vec",
                   label_col: str = "label", qid_col: str = "qid",
                   qvec_col: str = "vec",
                   method: str = "expr",
                   broadcast_queries: bool | None = None,
                   broadcast_query_limit: int = 500_000) -> DataFrame:
    """kNN majority-vote label propagation: label every query row with
    the most common label among its ``k`` exact nearest neighbors in a
    labeled seed set → ``(qid, label, votes)``.

    The corpus-curation use: a few thousand hand- or LLM-labeled
    documents (quality tiers, topic tags, toxicity flags) propagate to
    the whole corpus through embedding space — the standard seed-set
    auto-labeling stage of a training-data pipeline (and the classic
    companion op to a vector-search engine; the reference stops at
    ``select_k``, this is the one-groupBy consumer of it).

    Ties break deterministically: highest vote count, then lowest
    label. The vote aggregation is a partial-agg ``min(struct(...))``
    (map-side combine), never a per-query window.

    **Scale shape.** The seed set is the *dataset* side and is small by
    construction; the corpus is the *query* side and may be huge, so
    this wrapper applies the same guard as ``lsh_knn``: with
    ``broadcast_queries=None`` it probes the query count (a bounded
    ``limit(n+1).count()``, never a collect) and only broadcasts below
    ``broadcast_query_limit`` rows — past it the exact kNN runs as the
    memory-bounded partition-pair plan, so a 100 TB query side degrades
    to a scan × broadcast-sized-seed join, not a forced broadcast of
    the corpus. For ANN-scale seed sets, run any index search producing
    ``(qid, nid)`` and call the vote aggregation on it directly.
    """
    from cuvs_spark.operators.brute_force import knn

    if broadcast_queries is None:
        broadcast_queries = (queries.select(qid_col)
                             .limit(broadcast_query_limit + 1)
                             .count() <= broadcast_query_limit)
    nbrs = knn(data, queries, k, metric, id_col=id_col, vec_col=vec_col,
               qid_col=qid_col, qvec_col=qvec_col, method=method,
               with_distance=False, broadcast_queries=broadcast_queries,
               broadcast_query_limit=broadcast_query_limit)
    lab = data.select(F.col(id_col).cast("long").alias("nid"),
                      F.col(label_col).cast("long").alias("label"))
    votes = (nbrs.join(F.broadcast(lab), "nid")
             .groupBy("qid", "label").agg(F.count("*").alias("votes")))
    # min(struct) keeps the agg partial: (k+1-votes) is positive and
    # ascending in -votes, so the struct min is (max votes, min label)
    best = (votes.groupBy("qid")
            .agg(F.min(F.struct(
                (F.lit(k + 1) - F.col("votes")).alias("_nv"),
                F.col("label").alias("_l"))).alias("_b"))
            .select("qid", F.col("_b._l").alias("label"),
                    (F.lit(k + 1) - F.col("_b._nv")).alias("votes")))
    return best


def knn_label_vote_sql(dataset_sql: str, queries_sql: str, k: int = 10,
                       metric: str = "sqeuclidean") -> str:
    """DuckDB twin: the shared kNN oracle (identical distance template
    and nid tie-break) + the same (votes DESC, label ASC) vote rule.
    ``dataset_sql`` must yield ``(nid, dv, label)``."""
    from cuvs_spark.plans.oracle import knn_sql

    base = knn_sql(f"SELECT nid, dv FROM ({dataset_sql})", queries_sql,
                   k, metric, with_distance=False)
    return f"""
WITH nbrs AS ({base}),
lab AS (SELECT nid, CAST(label AS BIGINT) AS label FROM ({dataset_sql})),
v AS (SELECT qid, label, count(*) AS votes
      FROM nbrs JOIN lab USING (nid) GROUP BY qid, label),
r AS (SELECT qid, label, votes,
             row_number() OVER (PARTITION BY qid
                                ORDER BY votes DESC, label ASC) AS rn
      FROM v)
SELECT qid, label, CAST(votes AS BIGINT) AS votes FROM r WHERE rn = 1
"""

def chi2_terms(df: DataFrame, label_expr: str, top_n: int = 50, *,
               id_col: str = "doc_id", text_col: str = "text",
               min_df: int = 2) -> DataFrame:
    """χ² term-label association for classifier feature selection →
    the ``top_n`` tokens most associated with a binary document label
    as ``(term, df_pos, df_neg, chi2)`` — the classic first step
    before training a quality/topic classifier (pick the vocabulary
    that actually separates the classes instead of hashing blindly).

    ``label_expr`` is a boolean SQL expression over the input columns
    (e.g. ``"lang = 'en'"``). For each token with document frequency
    ≥ ``min_df``, the 2×2 presence/label contingency (a, b, c, d) is
    built from EXACT integer document counts and
    ``χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))``.

    Engine parity: counts are BIGINTs; the numerator difference
    ``ad − bc`` stays integer (int64-safe to ~3·10⁹ docs), is cast to
    DOUBLE once, and the rest is correctly-rounded double mults + ONE
    division — bit-equal across engines. Ranking ties break on the
    term string.

    Scale shape: one explode + distinct on (term, doc) — the same
    exchange every df-based text op here uses — then a
    map-side-combined groupBy(term) with the two label counts as
    conditional sums, a broadcast one-row totals join, and a
    TakeOrderedAndProject top-n; nothing quadratic, no driver state."""
    from cuvs_spark.plans.layout import spread_narrow

    # r14 (guide §2.5): spread a narrow source so the tokenize +
    # explode feeding the (term, doc) distinct runs on every core
    src = df.select(F.col(id_col).cast("long").alias("_doc"),
                    F.expr(f"CASE WHEN {label_expr} THEN 1 ELSE 0 END")
                    .alias("_y"),
                    F.col(text_col).alias("_x"))
    d = spread_narrow(src, "_doc").select(
        "_doc", "_y", F.expr(TOKS_SPARK.format(s="_x")).alias("_t"))
    # r15: the label totals are a global partial-aggregated sum of _y
    # only — reading them off the UN-spread source drops the spread
    # exchange (and its materialization for the broadcast build) from
    # this branch; same rows, same integers.
    totals = src.agg(
        F.sum("_y").cast("long").alias("_np"),
        F.sum(F.expr("1 - _y")).cast("long").alias("_nn"))
    pres = (d.select("_doc", "_y", F.explode("_t").alias("term"))
            .groupBy("term", "_doc")
            .agg(F.max("_y").alias("_y")))
    cnt = (pres.groupBy("term")
           .agg(F.sum("_y").cast("long").alias("df_pos"),
                F.sum(F.expr("1 - _y")).cast("long").alias("df_neg"))
           .filter(F.col("df_pos") + F.col("df_neg") >= min_df))
    chi = (cnt.crossJoin(F.broadcast(totals))
           .withColumn("chi2", F.expr(
               "CASE WHEN (df_pos + df_neg) = 0 "
               "OR (_np + _nn - df_pos - df_neg) = 0 "
               "OR _np = 0 OR _nn = 0 THEN 0.0 ELSE "
               "CAST(_np + _nn AS DOUBLE) * "
               "CAST(df_pos * (_nn - df_neg) - df_neg * (_np - df_pos) "
               "AS DOUBLE) * "
               "CAST(df_pos * (_nn - df_neg) - df_neg * (_np - df_pos) "
               "AS DOUBLE) / "
               "(CAST(df_pos + df_neg AS DOUBLE) * "
               "CAST(_np + _nn - df_pos - df_neg AS DOUBLE) * "
               "CAST(_np AS DOUBLE) * CAST(_nn AS DOUBLE)) END")))
    return (chi.orderBy(F.col("chi2").desc(), "term")
            .limit(top_n)
            .select("term", "df_pos", "df_neg", "chi2"))


def chi2_terms_sql(doc_sql: str, label_expr: str, top_n: int = 50, *,
                   min_df: int = 2) -> str:
    """DuckDB twin of :func:`chi2_terms` — same integer contingency,
    same single-division χ² expression, same (chi2 DESC, term) order."""
    toks = TOKS_DUCK.format(s="text")
    return f"""
WITH src AS ({doc_sql}),
d AS (
  SELECT doc_id AS _doc,
         CASE WHEN {label_expr} THEN 1 ELSE 0 END AS _y,
         {toks} AS _t
  FROM src
),
totals AS (
  SELECT CAST(sum(_y) AS BIGINT) AS _np,
         CAST(sum(1 - _y) AS BIGINT) AS _nn
  FROM d
),
pres AS (
  SELECT term, _doc, max(_y) AS _y
  FROM (SELECT _doc, _y, unnest(_t) AS term FROM d)
  GROUP BY term, _doc
),
cnt AS (
  SELECT term, CAST(sum(_y) AS BIGINT) AS df_pos,
         CAST(sum(1 - _y) AS BIGINT) AS df_neg
  FROM pres GROUP BY term
  HAVING CAST(sum(_y) AS BIGINT) + CAST(sum(1 - _y) AS BIGINT)
         >= {min_df}
),
chi AS (
  SELECT term, df_pos, df_neg,
         CASE WHEN (df_pos + df_neg) = 0
              OR (_np + _nn - df_pos - df_neg) = 0
              OR _np = 0 OR _nn = 0 THEN 0.0 ELSE
         CAST(_np + _nn AS DOUBLE) *
         CAST(df_pos * (_nn - df_neg) - df_neg * (_np - df_pos)
              AS DOUBLE) *
         CAST(df_pos * (_nn - df_neg) - df_neg * (_np - df_pos)
              AS DOUBLE) /
         (CAST(df_pos + df_neg AS DOUBLE) *
          CAST(_np + _nn - df_pos - df_neg AS DOUBLE) *
          CAST(_np AS DOUBLE) * CAST(_nn AS DOUBLE)) END AS chi2
  FROM cnt, totals
)
SELECT term, df_pos, df_neg, chi2
FROM chi ORDER BY chi2 DESC, term LIMIT {top_n}
"""
