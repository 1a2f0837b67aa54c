"""Streaming exact-dedup ingest with O(m) Bloom state.

The fixed-size companion to :mod:`cuvs_spark.streaming.dedup_stream`:
that pipeline's state (digests + band keys + shingles) grows with the
accepted corpus, which is what near-dup verification needs — but a
crawl front-line that only has to answer "have I accepted this exact
text before" can keep its WHOLE state in an ``m_bits`` Bloom filter
(``≤ m/63`` BIGINT words as one tiny Parquet table), regardless of how
many trillions of documents have flowed through. False positives are
tunable (~10 bits per expected key ≈ 1% — route the flagged sliver to
the exact path if over-dropping matters); false negatives are
impossible, so nothing slips past (the guarantee inherited from
``pipeline.dedup.bloom_build``'s deterministic md5 bit positions).

Per micro-batch (``foreachBatch``):
1. batch-internal exact dedup (lowest doc_id per digest);
2. probe the stored filter — ``maybe_dup = 1`` rows are dropped;
3. fold the survivors' bits into the filter (``bit_or`` per word —
   idempotent, so replaying a batch after a checkpoint-recovery
   restart converges to the same state) and commit the state table.

State commits are crash-safe via versioned subpaths: each merge writes
a NEW ``<state_dir>/bloom/v=<n+1>`` table, readers always take the
highest committed version, and older versions are pruned only after
the new write succeeds — so a crash at any point leaves at least one
complete filter on disk and can never lose accumulated bits (a crash
mid-prune just leaves an extra stale version, removed on the next
commit).

The filter's build parameters travel as the metadata rows
(``word_idx = -1/-2``), and the merge ORs them with themselves — a
parameter mismatch between the stored state and the configured stream
raises before any document is misjudged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_spark.streaming.commit import check_run_marker, checkpoint_run_id

from cuvs_spark.pipeline.dedup import (
    H64_SPARK,
    _BLOOM_WORD_BITS,
    bloom_build,
    bloom_contains,
)


def _state_versions(state_path: str) -> list[int]:
    """Committed filter versions under ``state_path`` (``v=<n>`` dirs
    holding a Spark ``_SUCCESS`` marker), ascending."""
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in os.listdir(state_path):
        if name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if os.path.exists(os.path.join(state_path, name, "_SUCCESS")):
                out.append(v)
    return sorted(out)


def _check_state_mode(state_path: str, mode: str) -> None:
    """Refuse mixed-mode state dirs: legacy calls number versions
    1,2,…; epoch-keyed calls number them by epoch id. The two schemes
    collide (an epoch-keyed run over legacy versions would treat epoch
    1 as already committed and read a nonexistent accepted_path), so
    the first commit stamps a ``MODE`` marker and every later call
    must match it. A pre-marker state dir (versions but no marker) is
    legacy by construction — an epoch-keyed call over one raises too."""
    marker = os.path.join(state_path, "MODE")
    if os.path.exists(marker):
        with open(marker) as fh:
            stored = fh.read().strip()
        if stored != mode:
            raise ValueError(
                f"bloom state dir {state_path!r} was committed in "
                f"{stored!r} mode but this call is {mode!r}-keyed — "
                "mixing legacy and epoch-keyed version numbering "
                "corrupts replay detection; use a fresh state_dir")
    elif mode == "epoch" and _state_versions(state_path):
        raise ValueError(
            f"bloom state dir {state_path!r} holds versions committed "
            "before epoch-keying (legacy numbering, no MODE marker); "
            "an epoch-keyed call cannot tell its epochs apart from "
            "them — use a fresh state_dir for epoch-keyed ingest")


def _stamp_state_mode(state_path: str, mode: str) -> None:
    marker = os.path.join(state_path, "MODE")
    if not os.path.exists(marker):
        os.makedirs(state_path, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(mode)


def bloom_dedup_batch_against_state(batch: DataFrame, state_dir: str, *,
                                    m_bits: int = 63 * 16384,
                                    k: int = 4,
                                    epoch_id: int | None = None,
                                    accepted_path: str | None = None,
                                    run_id: str | None = None
                                    ) -> DataFrame:
    """One exact-dedup ingest step → the accepted subset of ``batch``.

    Reads the Bloom state (if any), drops batch-internal duplicate
    texts and anything the filter has seen, then merges the survivors'
    bits back in. Usable directly from batch jobs and foreachBatch.

    The merged filter is committed write-new-then-prune-old (see the
    module docstring): the previous version is deleted only after the
    new one has a ``_SUCCESS`` marker, so a crash anywhere in this
    function leaves the last committed filter intact.

    **Exactly-once accepted output** needs BOTH extra arguments: with
    ``epoch_id``, state versions are keyed by the epoch (so a
    checkpoint-recovery replay of a committed epoch is DETECTED rather
    than re-probed against a state that already contains the batch —
    detection covers the LATEST committed epoch, the only one a
    checkpointed stream can replay; older epoch ids raise, since the
    ≤2-versions prune makes their commit status unknowable), and with
    ``accepted_path`` the accepted rows are written there (overwrite)
    BEFORE the state commit. Crash before the commit →
    replay recomputes the identical accepted set against the unchanged
    state and overwrites the same path; crash after → the committed
    epoch version short-circuits the replay and the pre-commit output
    is already durable. Without them the state stays replay-safe but
    the caller's own output write is only at-most-once across the
    commit boundary.

    ``run_id`` (what ``start_streaming_bloom_dedup`` passes: the
    checkpoint's stable stream UUID) binds the state dir to one stream
    lineage — a restart with a FRESH checkpoint restarts epoch ids at
    0, which would misread this state's committed epoch versions as
    its own; the marker turns that silent loss into a loud error (see
    ``streaming.commit``)."""
    if m_bits % _BLOOM_WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {_BLOOM_WORD_BITS}")
    if (epoch_id is None) != (accepted_path is None):
        raise ValueError("epoch_id and accepted_path work as a pair: "
                         "both or neither")
    if run_id is not None and epoch_id is None:
        raise ValueError("run_id only applies to epoch-keyed calls")
    spark = batch.sparkSession
    b = batch.select(F.col("doc_id").cast("long").alias("doc_id"), "text")

    # batch-internal exact dedup: lowest doc_id per digest
    canon = (b.withColumn("_h", F.expr(H64_SPARK.format(s="text")))
             .groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
             .select("doc_id"))
    b1 = b.join(canon, "doc_id", "left_semi")

    state_path = os.path.join(state_dir, "bloom")
    mode = "epoch" if epoch_id is not None else "legacy"
    _check_state_mode(state_path, mode)
    # stamp BEFORE any commit: a crash between a version write and a
    # later stamp would leave an epoch-keyed dir that the next call
    # misreads as legacy; stamping first can at worst leave a marker
    # with no versions, which constrains nothing incorrectly
    _stamp_state_mode(state_path, mode)
    if run_id is not None:
        check_run_marker(state_path, run_id, what="bloom")
    versions = _state_versions(state_path)
    if epoch_id is not None and int(epoch_id) in versions:
        # replay of a fully committed epoch: the accepted output was
        # written BEFORE that commit, so it is durable — return it
        # instead of re-probing a state that already has this batch
        return spark.read.parquet(accepted_path)
    if epoch_id is not None and versions and int(epoch_id) < versions[-1]:
        # the version this epoch committed was pruned when a LATER
        # epoch superseded it (the ≤2-live-versions bound): whether it
        # committed is no longer knowable, and re-probing would
        # double-drop against a state that already contains the batch
        # AND clobber its durable accepted output. Structured
        # Streaming never replays below the latest commit, so this is
        # out of the streaming replay contract — refuse loudly.
        raise ValueError(
            f"bloom epoch {int(epoch_id)} is older than the latest "
            f"committed state version v={versions[-1]} (its own "
            "version, if any, was pruned by the O(m) ≤2-versions "
            "bound) — only the latest epoch can replay; an older "
            "epoch id here means a corrupted or foreign stream")
    if versions:
        cur = versions[-1]
        state = spark.read.parquet(os.path.join(state_path, f"v={cur}"))
        accepted = (bloom_contains(b1, state, m_bits=m_bits, k=k)
                    .filter(F.col("maybe_dup") == 0)
                    .select("doc_id"))
        # cut lineage BEFORE the prune below deletes the state files
        # this plan reads (and so the survivors' bits and the returned
        # rows are computed once)
        b2 = b1.join(accepted, "doc_id", "left_semi").localCheckpoint()
        merged = (bloom_build(b2, m_bits=m_bits, k=k)
                  .unionByName(state)
                  .groupBy("word_idx")
                  .agg(F.expr("bit_or(bits)").alias("bits")))
    else:
        cur = 0
        b2 = b1.localCheckpoint()
        merged = bloom_build(b2, m_bits=m_bits, k=k)
    out = batch.join(b2.select("doc_id"), "doc_id", "left_semi")
    if accepted_path is not None:
        # exactly-once ordering: accepted output lands BEFORE the state
        # commit (idempotent overwrite — a pre-commit crash replays to
        # the same bytes), and the epoch-keyed version below makes a
        # post-commit replay skip this whole path
        out.write.mode("overwrite").parquet(accepted_path)
        out = spark.read.parquet(accepted_path)
    # commit the new version first; only then prune older ones, so the
    # accumulated bits survive a crash at any point in between
    new_v = int(epoch_id) if epoch_id is not None else cur + 1
    merged.write.mode("overwrite").parquet(
        os.path.join(state_path, f"v={new_v}"))
    for v in _state_versions(state_path):
        if v < new_v:
            shutil.rmtree(os.path.join(state_path, f"v={v}"),
                          ignore_errors=True)
    return out


def start_streaming_bloom_dedup(spark: SparkSession, source_dir: str,
                                state_dir: str, accepted_dir: str, *,
                                m_bits: int = 63 * 16384, k: int = 4,
                                trigger_seconds: float | None = None,
                                checkpoint_dir: str | None = None):
    """Stream (doc_id, text) Parquet from ``source_dir``; per
    micro-batch run the Bloom exact-dedup ingest and append accepted
    docs to ``accepted_dir``.

    ``checkpoint_dir`` is REQUIRED: after a stop or crash, restarting
    with the same checkpoint resumes from the first uncommitted
    micro-batch and the accepted output stays exactly-once per
    distinct text — per-epoch accepted directories are written
    (idempotent overwrite) BEFORE each epoch-keyed state commit, so a
    crash on either side of the commit replays to the same bytes (see
    ``bloom_dedup_batch_against_state``'s exactly-once contract). The
    checkpoint's stable stream UUID is stamped on the state dir, so a
    fresh checkpoint against existing state raises instead of
    misreading its committed epochs."""
    if not checkpoint_dir:
        raise ValueError(
            "start_streaming_bloom_dedup requires checkpoint_dir: the "
            "exactly-once state is keyed by epoch id, which only a "
            "checkpointed stream keeps meaningful across restarts "
            "(a fresh run would restart epochs at 0 and misread the "
            "state's committed epoch versions as its own)")
    stream = (spark.readStream
              .schema("doc_id long, text string").parquet(source_dir))

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bloom_dedup_batch_against_state(
            batch_df, state_dir, m_bits=m_bits, k=k,
            epoch_id=int(epoch_id),
            accepted_path=os.path.join(accepted_dir,
                                       f"epoch={int(epoch_id)}"),
            run_id=checkpoint_run_id(checkpoint_dir))

    writer = stream.writeStream.foreachBatch(on_batch).outputMode("append")
    writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
