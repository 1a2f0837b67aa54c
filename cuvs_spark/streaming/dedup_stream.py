"""Streaming incremental dedup — the corpus-ingest counterpart of the
batch dedup operators (SURVEY §2.9 maps the reference's ``extend``
surfaces onto foreachBatch; dedup-on-ingest is the pipeline analog: new
documents are checked against everything already accepted before they
enter the corpus).

Per micro-batch:
1. exact digest (md5-64) — drop docs whose text hash is already in the
   accepted-state table (or duplicated inside the batch);
2. MinHash signatures + LSH band keys vs the state table — candidates
   verified by exact shingle Jaccard, near-dups dropped;
3. survivors appended to the state (Parquet, partitioned by band for
   the band-key equi-join).

State is two Parquet tables (digests, band keys + shingles), so the
stream restarts idempotently alongside the checkpoint dir, and the
band join stays an equi-join at any corpus size — identical physics to
the batch ``minhash_lsh_pairs``, applied delta × corpus instead of
corpus × corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_spark.pipeline.dedup import (
    BAND_R,
    H32_SPARK,
    H64_SPARK,
    N_HASHES,
    SHINGLES_SPARK,
    TOKS_SPARK,
    _check_bands,
    _sig_exprs_spark,
)


def _featurize(docs: DataFrame, n_hashes: int, band_r: int) -> DataFrame:
    """(doc_id, text) → (doc_id, text_hash, sh, band, key) exploded per
    band — the staged tokenize→shingle→hash→sig pipeline."""
    n_bands = _check_bands(n_hashes, band_r)
    sig = F.array(*[F.expr(e) for e in _sig_exprs_spark(n_hashes=n_hashes)])
    staged = (docs
              .withColumn("text_hash", F.expr(H64_SPARK.format(s="text")))
              .withColumn("t", F.expr(TOKS_SPARK.format(s="text")))
              .withColumn("sh", F.expr(SHINGLES_SPARK.format(t="t")))
              .withColumn("hs", F.expr(
                  "transform(sh, s -> " + H32_SPARK.format(s="s") + ")"))
              .select("doc_id", "text_hash", "sh", sig.alias("sig")))
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("-", *[F.col("sig")[b * band_r + r]
                                    for r in range(band_r)]).alias("key"))
        for b in range(n_bands)])
    return (staged.select("doc_id", "text_hash", "sh",
                          F.explode(bands).alias("bk"))
            .select("doc_id", "text_hash", "sh",
                    F.col("bk.band").alias("band"),
                    F.col("bk.key").alias("key")))


def dedup_batch_against_state(batch: DataFrame, state_dir: str, *,
                              jaccard_threshold: float = 0.8,
                              n_hashes: int = N_HASHES,
                              band_r: int = BAND_R) -> DataFrame:
    """One delta-vs-corpus dedup step → the accepted subset of
    ``batch`` (lowest doc_id wins inside the batch; anything matching
    the existing state is dropped). Appends the survivors' features to
    ``state_dir``. Usable directly in batch jobs and from foreachBatch.
    """
    spark = batch.sparkSession
    feat = _featurize(
        batch.select(F.col("doc_id").cast("long"), "text"),
        n_hashes, band_r).localCheckpoint()

    state_path = os.path.join(state_dir, "features")
    have_state = os.path.exists(state_path)
    if have_state:
        state = spark.read.parquet(state_path)
    else:
        state = spark.createDataFrame(
            [], "doc_id long, text_hash long, sh array<string>, "
                "band int, key string")

    # 1. exact: batch-internal lowest-id per digest, then anti-join the
    # state's digest set
    batch_canon = (feat.groupBy("text_hash")
                   .agg(F.min("doc_id").alias("doc_id")))
    exact_ok = batch_canon.join(
        state.select("text_hash").distinct(), "text_hash", "left_anti")

    # 2. near: LSH band equi-join delta × state, verify exact Jaccard on
    # candidates only
    cand = (feat.join(exact_ok.select("doc_id"), "doc_id", "left_semi")
            .join(state.select(F.col("doc_id").alias("s_id"),
                               F.col("sh").alias("s_sh"), "band", "key"),
                  ["band", "key"])
            .select("doc_id", "s_id", "sh", "s_sh").distinct())
    jac = (F.size(F.array_intersect("sh", "s_sh"))
           / F.size(F.array_union("sh", "s_sh")))
    near_dup = (cand.filter(jac >= jaccard_threshold)
                .select("doc_id").distinct())
    accepted = (exact_ok.join(near_dup, "doc_id", "left_anti")
                .select("doc_id"))

    # 3. persist survivors' features (partitioned by band → the next
    # delta's state join prunes to matching band partitions)
    surv = feat.join(accepted, "doc_id", "left_semi").localCheckpoint()
    surv.write.mode("append").partitionBy("band").parquet(state_path)
    return batch.join(accepted, "doc_id", "left_semi")


def start_streaming_dedup(spark: SparkSession, source_dir: str,
                          state_dir: str, accepted_dir: str, *,
                          jaccard_threshold: float = 0.8,
                          trigger_seconds: float | None = None):
    """Stream (doc_id, text) Parquet from ``source_dir``; per
    micro-batch run the delta-vs-corpus dedup and append accepted docs
    to ``accepted_dir``."""
    stream = (spark.readStream
              .schema("doc_id long, text string").parquet(source_dir))

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ok = dedup_batch_against_state(
            batch_df, state_dir, jaccard_threshold=jaccard_threshold)
        ok.write.mode("append").parquet(accepted_dir)

    writer = stream.writeStream.foreachBatch(on_batch).outputMode("append")
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
