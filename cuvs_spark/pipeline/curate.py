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
from cuvs_spark.pipeline.text import language_id, quality_score


def curate_corpus(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_tokens: int = 10, max_punct_ratio: float = 0.2,
                  langs: tuple[str, ...] | None = None,
                  near_dup_jaccard: float = 0.8) -> DataFrame:
    """Return the curated corpus ``(doc_id, text, stage)`` where
    ``stage`` records the first filter each *dropped* doc hit
    ('quality', 'lang', 'exact_dup', 'near_dup') or 'kept'."""
    # each stage feeds several consumers (the mark union AND the next
    # stage's anti-join); checkpoint stage outputs so Catalyst doesn't
    # re-derive the whole upstream chain per consumer
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text")).localCheckpoint()
    q = quality_score(d)
    bad_q = (q.filter((F.col("n_tokens") < min_tokens)
                      | (F.col("punct_ratio") > max_punct_ratio))
             .select("doc_id", F.lit("quality").alias("stage")))
    survivors = d.join(bad_q.select("doc_id"), "doc_id", "left_anti") \
        .localCheckpoint()
    marks = [bad_q]
    if langs is not None:
        lid = language_id(survivors)
        bad_l = (lid.filter(~F.col("pred_lang").isin(*langs))
                 .select("doc_id", F.lit("lang").alias("stage")))
        survivors = survivors.join(bad_l.select("doc_id"), "doc_id",
                                   "left_anti").localCheckpoint()
        marks.append(bad_l)
    groups = exact_dedup(survivors)
    canon = groups.select(F.col("canonical_id").alias("doc_id"))
    bad_e = (survivors.join(canon, "doc_id", "left_anti")
             .select("doc_id", F.lit("exact_dup").alias("stage")))
    survivors = survivors.join(canon, "doc_id", "left_semi") \
        .localCheckpoint()
    marks.append(bad_e)
    pairs = minhash_lsh_pairs(survivors, jaccard_threshold=near_dup_jaccard)
    comp = connected_components(pairs)
    bad_n = (comp.filter(F.col("doc_id") != F.col("canonical_id"))
             .select("doc_id", F.lit("near_dup").alias("stage")))
    survivors = survivors.join(bad_n.select("doc_id"), "doc_id", "left_anti")
    marks.append(bad_n)
    dropped = marks[0]
    for m in marks[1:]:
        dropped = dropped.unionByName(m)
    kept = survivors.select("doc_id", F.lit("kept").alias("stage"))
    return (d.select("doc_id", "text")
            .join(kept.unionByName(dropped), "doc_id")
            .select("doc_id", "stage"))


def curate_stats(curated: DataFrame) -> DataFrame:
    """Per-stage counts — the run report."""
    return (curated.groupBy("stage").agg(F.count("*").alias("n"))
            .orderBy("stage"))
