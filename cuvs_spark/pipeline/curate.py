"""End-to-end corpus curation — the composition the pipeline operators
exist for: quality gate → language filter → exact dedup → near-dup
collapse, in one declarative plan.

Each stage is one of the oracle-checked operators; composing them stays
a single Catalyst plan (the quality/lang projections fuse into the scan,
dedup adds one digest shuffle, near-dup adds the LSH band shuffle).
Output: the surviving canonical documents plus per-stage drop counts —
what a 100 TB training-data run reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.pipeline.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)
from cuvs_spark.pipeline.text import (gopher_quality, ngram_novelty,
                                      quality_lang, quality_score,
                                      repetition_stats)


def curate_corpus(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_tokens: int = 10, max_punct_ratio: float = 0.2,
                  langs: tuple[str, ...] | None = None,
                  near_dup_jaccard: float = 0.8,
                  max_dup_word_frac: float | None = None,
                  max_top_bigram_frac: float | None = None,
                  max_dup_trigram_frac: float | None = None,
                  gopher_rules: dict | None = None,
                  min_novelty: float | None = None,
                  novelty_n: int = 3) -> DataFrame:
    """Return the curated corpus ``(doc_id, text, stage)`` where
    ``stage`` records the first filter each *dropped* doc hit
    ('quality', 'lang', 'repetition', 'gopher_rules', 'exact_dup',
    'near_dup', 'novelty') or 'kept'. The repetition stage
    (Gopher-style; off unless one of its thresholds is set) joins
    per-doc n-gram repetition fractions into the same marking pass —
    one extra (doc, gram) shuffle, no extra anti-join. ``gopher_rules``
    (a dict of :func:`gopher_quality` thresholds, ``{}`` for the
    published defaults) adds the full document-quality rule set the
    same way — the stage is map-only, so it fuses into the marking
    projection. ``min_novelty`` (off unless set) appends a
    memorization-pressure stage AFTER dedup: survivors whose
    :func:`~cuvs_spark.pipeline.text.ngram_novelty` fraction over the
    SURVIVING corpus falls below the threshold are staged 'novelty' —
    the soft boilerplate filter for cross-doc repetition that the hard
    dedup stages don't collapse (runs last so its corpus statistic is
    computed over what dedup kept, matching the rule's intent)."""
    # each stage feeds several consumers (the mark union AND the next
    # stage's anti-join); checkpoint stage outputs so Catalyst doesn't
    # re-derive the whole upstream chain per consumer. Quality and
    # language are both row-wise projections, so they fuse into ONE
    # marking pass (quality precedence preserved by the CASE order) —
    # one checkpoint and one anti-join instead of two of each.
    # d itself is NOT checkpointed: it is a plain projection of the
    # source (at 100 TB, materializing the whole corpus to executor
    # disk costs far more than re-scanning columnar storage with
    # pushdown per consumer).
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"))
    bad_quality = ((F.col("n_tokens") < min_tokens)
                   | (F.col("punct_ratio") > max_punct_ratio))
    stage_case = F.when(bad_quality, "quality")
    if langs is not None:
        # r14 (guide §2.4): quality + language are both row-wise —
        # ONE fused projection (identical expressions, so identical
        # values) instead of two corpus passes joined on doc_id
        marked = quality_lang(d)
        stage_case = stage_case.when(~F.col("pred_lang").isin(*langs), "lang")
    else:
        marked = quality_score(d).select("doc_id", "n_tokens",
                                         "punct_ratio")
    rep_thresholds = [
        ("dup_word_frac", max_dup_word_frac),
        ("top_bigram_frac", max_top_bigram_frac),
        ("dup_trigram_frac", max_dup_trigram_frac)]
    if any(t is not None for _, t in rep_thresholds):
        rep = repetition_stats(d).select(
            "doc_id", "dup_word_frac", "top_bigram_frac",
            "dup_trigram_frac")
        marked = marked.join(rep, "doc_id")
        bad_rep = F.lit(False)
        for col, t in rep_thresholds:
            if t is not None:
                bad_rep = bad_rep | (F.col(col) > t)
        stage_case = stage_case.when(bad_rep, "repetition")
    if gopher_rules is not None:
        gq = gopher_quality(d, **gopher_rules).select(
            "doc_id", "gopher_keep")
        marked = marked.join(gq, "doc_id")
        stage_case = stage_case.when(F.col("gopher_keep") == 0,
                                     "gopher_rules")
    flags = marked.select("doc_id", stage_case.alias("stage"))
    # cache, not localCheckpoint: the marking pass is a row-wise
    # projection straight off the source scan, so a lazy cache lets
    # the first consumer materialize it without the extra eager job
    bad_ql = flags.filter(F.col("stage").isNotNull()).cache()
    # stage boundaries checkpoint the surviving doc-ID SET only (tiny
    # — ids, never text); each stage re-derives its text by a semi-join
    # against the source scan. At 100 TB this replaces materializing
    # the surviving corpus to executor disk per stage with columnar
    # re-scans, and the checkpointed state that must survive is bytes
    # per doc instead of the doc itself.
    # r14: lazy checkpoints — the stage-boundary id sets still
    # materialize exactly once (first consumer), but the separate
    # blocking checkpoint job disappears (~5% off the composition)
    ids1 = (d.select("doc_id")
            .join(bad_ql.select("doc_id"), "doc_id", "left_anti")
            .localCheckpoint(eager=False))
    survivors = d.join(ids1, "doc_id", "left_semi")
    marks = [bad_ql]
    groups = exact_dedup(survivors)
    canon = groups.select(F.col("canonical_id").alias("doc_id"))
    bad_e = (ids1.join(canon, "doc_id", "left_anti")
             .select("doc_id", F.lit("exact_dup").alias("stage")))
    ids2 = ids1.join(canon, "doc_id", "left_semi").localCheckpoint(eager=False)
    survivors = d.join(ids2, "doc_id", "left_semi")
    marks.append(bad_e)
    pairs = minhash_lsh_pairs(survivors, jaccard_threshold=near_dup_jaccard)
    comp = connected_components(pairs)
    bad_n = (comp.filter(F.col("doc_id") != F.col("canonical_id"))
             .select("doc_id", F.lit("near_dup").alias("stage")))
    survivors = ids2.join(bad_n.select("doc_id"), "doc_id", "left_anti")
    marks.append(bad_n)
    if min_novelty is not None:
        ids3 = survivors.localCheckpoint(eager=False)
        nov = ngram_novelty(d.join(ids3, "doc_id", "left_semi"),
                            novelty_n)
        bad_v = (nov.filter(F.col("novelty_frac") < min_novelty)
                 .select("doc_id", F.lit("novelty").alias("stage")))
        survivors = ids3.join(bad_v.select("doc_id"), "doc_id",
                              "left_anti")
        marks.append(bad_v)
    dropped = marks[0]
    for m in marks[1:]:
        dropped = dropped.unionByName(m)
    kept = survivors.select("doc_id", F.lit("kept").alias("stage"))
    return (d.select("doc_id", "text")
            .join(kept.unionByName(dropped), "doc_id")
            .select("doc_id", "stage"))


def curate_with_semantic(docs: DataFrame, emb: DataFrame, *,
                         n_clusters: int = 8, tau: float = 0.15,
                         emb_id_col: str = "vec_id",
                         emb_vec_col: str = "embedding",
                         **curate_kw) -> DataFrame:
    """Full text+embedding curation: ``curate_corpus`` stages first,
    then SemDeDup over the *kept* docs' embeddings — survivors whose
    embedding sits within cosine ``tau`` of a lower-id kept survivor
    are re-staged as 'semantic_dup'. → ``(doc_id, stage)``.

    The embedding table joins on ``doc_id``; docs without an embedding
    pass through the semantic stage untouched (left join). Semantic
    dedup runs on the kept subset only, so its cluster buckets shrink
    with every earlier filter — the cheap textual stages prune before
    the GEMM stage, the same cost ordering a 100 TB run wants."""
    from cuvs_spark.pipeline.dedup import semantic_dedup

    cur = curate_corpus(docs, **curate_kw).localCheckpoint()
    kept = (cur.filter(F.col("stage") == "kept")
            .select(F.col("doc_id").alias(emb_id_col)))
    embk = emb.join(kept, emb_id_col, "left_semi")
    sem = semantic_dedup(embk, n_clusters=n_clusters, tau=tau,
                         id_col=emb_id_col, vec_col=emb_vec_col)
    return (cur.join(sem.select(F.col("id").alias("doc_id"), "is_dup"),
                     "doc_id", "left")
            .select("doc_id",
                    F.when((F.col("stage") == "kept")
                           & F.col("is_dup"), "semantic_dup")
                    .otherwise(F.col("stage")).alias("stage")))


def curate_stats(curated: DataFrame) -> DataFrame:
    """Per-stage counts — the run report."""
    return (curated.groupBy("stage").agg(F.count("*").alias("n"))
            .orderBy("stage"))
