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
3. survivors persisted to the state (Parquet, partitioned by band for
   the band-key equi-join) — flat append in legacy calls, or one
   ``features/epoch=<id>`` shard per micro-batch in epoch-keyed calls.

With ``epoch_id``/``accepted_path`` (what ``start_streaming_dedup``
passes), accepted output is EXACTLY-ONCE across checkpoint-recovery
replays: each epoch's accepted rows are overwritten idempotently
BEFORE the epoch's state shard commits (the shard's ``_SUCCESS`` is
the commit record, the same discipline as ``bloom_stream``), a
replayed committed epoch returns the durable output instead of
re-probing a state that already contains it, and uncommitted partial
shards are never read. The band join stays an equi-join at any corpus
size — identical physics to the batch ``minhash_lsh_pairs``, applied
delta × corpus instead of corpus × corpus.

Bounds, stated plainly: the feature state is inherently O(accepted
corpus) — that's what near-dup membership requires (the fixed-size
alternative is the Bloom stream, which answers exact membership only)
— and the epoch-sharded layout adds one directory per micro-batch
(O(epochs) listings, cheap at any realistic trigger cadence; folding
old shards would break committed-epoch replay detection, so shard
count is traded for exactly-once).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_spark.streaming.commit import check_run_marker, checkpoint_run_id

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


def _committed_feature_epochs(state_path: str) -> list[int]:
    """Committed per-epoch feature shards (``epoch=<n>`` dirs holding
    a Spark ``_SUCCESS`` marker), ascending."""
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in os.listdir(state_path):
        if name.startswith("epoch="):
            try:
                e = int(name[6:])
            except ValueError:
                continue
            if os.path.exists(os.path.join(state_path, name, "_SUCCESS")):
                out.append(e)
    return sorted(out)


def _check_dedup_state_mode(state_dir: str, mode: str) -> None:
    """Refuse mixed-mode state dirs (the bloom_stream rule): legacy
    calls append flat files under ``features/``; epoch-keyed calls
    write ``features/epoch=<n>`` shards. The first commit stamps a
    ``MODE`` marker at ``state_dir`` (one level above ``features/`` so
    the legacy flat read never sees a non-parquet file); a pre-marker
    dir with flat feature files is legacy by construction."""
    marker = os.path.join(state_dir, "MODE")
    if os.path.exists(marker):
        with open(marker) as fh:
            stored = fh.read().strip()
        if stored != mode:
            raise ValueError(
                f"dedup state dir {state_dir!r} was committed in "
                f"{stored!r} mode but this call is {mode!r}-keyed — "
                "mixing flat-append and epoch-sharded feature layouts "
                "corrupts replay detection; use a fresh state_dir")
        return
    feat_path = os.path.join(state_dir, "features")
    if mode == "epoch" and os.path.isdir(feat_path) and any(
            not n.startswith(("epoch=", "_", "."))
            for n in os.listdir(feat_path)):
        raise ValueError(
            f"dedup state dir {state_dir!r} holds flat feature files "
            "committed before epoch-keying (no MODE marker); an "
            "epoch-keyed call cannot replay-detect against them — use "
            "a fresh state_dir for epoch-keyed ingest")


def _stamp_dedup_state_mode(state_dir: str, mode: str) -> None:
    marker = os.path.join(state_dir, "MODE")
    if not os.path.exists(marker):
        os.makedirs(state_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(mode)


_EMPTY_FEATURES = ("doc_id long, text_hash long, sh array<string>, "
                   "band int, key string")


def dedup_batch_against_state(batch: DataFrame, state_dir: str, *,
                              jaccard_threshold: float = 0.8,
                              n_hashes: int = N_HASHES,
                              band_r: int = BAND_R,
                              epoch_id: int | None = None,
                              accepted_path: str | None = None,
                              run_id: str | None = None) -> DataFrame:
    """One delta-vs-corpus dedup step → the accepted subset of
    ``batch`` (lowest doc_id wins inside the batch; anything matching
    the existing state is dropped). Persists the survivors' features
    to ``state_dir``. Usable directly in batch jobs and foreachBatch.

    **Exactly-once accepted output** needs BOTH extra arguments (the
    ``bloom_dedup_batch_against_state`` contract): with ``epoch_id``
    the survivors' features commit as a ``features/epoch=<id>`` shard
    whose ``_SUCCESS`` marker doubles as the epoch's commit record,
    and with ``accepted_path`` the accepted rows are overwritten there
    BEFORE that commit. Crash before the shard commits → the replay
    recomputes the identical accepted set against the committed-only
    state (a partial shard has no ``_SUCCESS`` and is never read) and
    overwrites the same path; crash after → the committed shard
    short-circuits the replay and the pre-commit output is already
    durable. Without them the call keeps the original flat-append
    layout, which is at-least-once across restarts.

    ``run_id`` (what ``start_streaming_dedup`` passes: the checkpoint's
    stable stream UUID) binds the state dir to one stream lineage —
    epoch ids are only meaningful within the checkpoint that issued
    them, so a restart with a FRESH checkpoint (epoch ids back at 0)
    against this state raises instead of silently short-circuiting new
    batches as "already committed" (see ``streaming.commit``)."""
    if (epoch_id is None) != (accepted_path is None):
        raise ValueError("epoch_id and accepted_path work as a pair: "
                         "both or neither")
    if run_id is not None and epoch_id is None:
        raise ValueError("run_id only applies to epoch-keyed calls")
    spark = batch.sparkSession
    mode = "epoch" if epoch_id is not None else "legacy"
    _check_dedup_state_mode(state_dir, mode)
    _stamp_dedup_state_mode(state_dir, mode)
    if run_id is not None:
        check_run_marker(state_dir, run_id, what="dedup")

    state_path = os.path.join(state_dir, "features")
    committed = _committed_feature_epochs(state_path)
    if epoch_id is not None and int(epoch_id) in committed:
        # replay of a fully committed epoch: the accepted output was
        # written BEFORE the shard's _SUCCESS, so it is durable —
        # return it instead of re-probing a state that already
        # contains this batch's survivors
        return spark.read.parquet(accepted_path)

    feat = _featurize(
        batch.select(F.col("doc_id").cast("long"), "text"),
        n_hashes, band_r).localCheckpoint()

    if epoch_id is not None:
        if committed:
            state = (spark.read.option("basePath", state_path)
                     .parquet(*[os.path.join(state_path, f"epoch={e}")
                                for e in committed]))
        else:
            state = spark.createDataFrame([], _EMPTY_FEATURES)
    elif os.path.exists(state_path):
        state = spark.read.parquet(state_path)
    else:
        state = spark.createDataFrame([], _EMPTY_FEATURES)

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
    out = batch.join(accepted, "doc_id", "left_semi")
    if epoch_id is not None:
        # exactly-once ordering: accepted output lands BEFORE the
        # state shard's _SUCCESS (the epoch's commit record) — a crash
        # on either side of that marker replays to the same bytes
        out.write.mode("overwrite").parquet(accepted_path)
        out = spark.read.parquet(accepted_path)
        (surv.write.mode("overwrite").partitionBy("band")
         .parquet(os.path.join(state_path, f"epoch={int(epoch_id)}")))
    else:
        surv.write.mode("append").partitionBy("band").parquet(state_path)
    return out


def start_streaming_dedup(spark: SparkSession, source_dir: str,
                          state_dir: str, accepted_dir: str, *,
                          jaccard_threshold: float = 0.8,
                          trigger_seconds: float | None = None,
                          checkpoint_dir: str | None = None):
    """Stream (doc_id, text) Parquet from ``source_dir``; per
    micro-batch run the delta-vs-corpus dedup and write accepted docs
    exactly-once to ``accepted_dir/epoch=<id>/`` (idempotent per-epoch
    overwrite BEFORE the epoch's state-shard commit — the
    ``bloom_stream`` discipline; read the whole accepted table with
    ``spark.read.parquet(accepted_dir)``). ``checkpoint_dir`` is
    REQUIRED: replay detection keys the state by epoch id, and epoch
    ids are only meaningful within one checkpoint lineage — the
    checkpoint's stable stream UUID is stamped on the state dir, so
    restarting from the SAME checkpoint replays exactly-once while a
    fresh checkpoint against this state raises instead of silently
    misreading committed epochs."""
    if not checkpoint_dir:
        raise ValueError(
            "start_streaming_dedup requires checkpoint_dir: the "
            "exactly-once state is keyed by epoch id, which only a "
            "checkpointed stream keeps meaningful across restarts "
            "(a fresh run would restart epochs at 0 and misread the "
            "state's committed epochs as its own)")
    stream = (spark.readStream
              .schema("doc_id long, text string").parquet(source_dir))

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dedup_batch_against_state(
            batch_df, state_dir, jaccard_threshold=jaccard_threshold,
            epoch_id=int(epoch_id),
            accepted_path=os.path.join(accepted_dir,
                                       f"epoch={int(epoch_id)}"),
            run_id=checkpoint_run_id(checkpoint_dir))

    writer = stream.writeStream.foreachBatch(on_batch).outputMode("append")
    writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
