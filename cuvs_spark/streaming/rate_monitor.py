"""Streaming event-rate burst monitor — the ingest-time counterpart of
``operators/temporal.burst_windows`` (SURVEY §2.9 maps the reference's
streaming surfaces onto foreachBatch; rate anomaly detection is the
ingestion-guard analog: a crawler loop or replayed feed is flagged in
the micro-batch it arrives, before the data pollutes the corpus).

Per micro-batch:
1. the batch's events collapse to per-window-bucket counts (integer
   division of int64 epoch micros, the batch operator's bucketing);
2. the MERGED counts (previous committed version + this batch) are
   written as a new full table under ``counts/v=<epoch_id>/``
   (``_SUCCESS``-gated, the same versioned-commit discipline as
   ``bloom_stream``); versions older than the merge base are pruned
   AFTER the commit, so at most two versions exist and a crash can
   never lose accumulated counts. A checkpoint-recovery replay of an
   already-committed epoch REUSES its version instead of re-merging —
   counts never double and state never references a pruned base; an
   epoch OLDER than the latest committed version raises (its version,
   if any, was pruned, so its commit status is unknowable — same
   guard as bloom_stream);
3. the batch ``burst_windows`` flag stage
   (``temporal.burst_flags_from_counts``) runs on the merged counts,
   restricted to the buckets THIS batch touched — each window is
   judged against the trailing baseline as of its own arrival.

State size is O(time-span / window_s) rows in ≤2 versions —
independent of event volume AND of stream age (the per-batch-directory
alternative grows a directory per trigger and re-reads all of them),
like the Bloom filter's O(m) — and the per-batch flag job is one
map-side-combined groupBy + a window over the counts table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _count_versions(counts_dir: str) -> list[int]:
    """Committed count versions (``v=<epoch>`` dirs with a Spark
    ``_SUCCESS`` marker), ascending — bloom_stream's convention."""
    if not os.path.isdir(counts_dir):
        return []
    out = []
    for name in os.listdir(counts_dir):
        if name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if os.path.exists(os.path.join(counts_dir, name, "_SUCCESS")):
                out.append(v)
    return sorted(out)


def _bucket_counts(batch: DataFrame, on: str, window_s: int) -> DataFrame:
    div = int(window_s) * 1_000_000
    return (batch.select(F.expr(f"unix_micros({on}) DIV {div}")
                         .alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_events")))


def burst_batch_against_state(batch: DataFrame, state_dir: str,
                              epoch_id: int, *, on: str = "ts",
                              window_s: int = 3600, lookback: int = 3,
                              factor: tuple[int, int] = (2, 1)) -> DataFrame:
    """One micro-batch of the rate monitor → the burst table for the
    buckets this batch touched, judged against the merged state.

    Replay-safe and bounded: the merged counts commit as a full
    ``counts/v=<epoch_id>`` version; a replayed epoch reuses its
    committed version (no re-merge against a state that already
    contains it), and versions older than the merge base are pruned
    only after the new commit — at most two live at once."""
    import shutil

    spark = batch.sparkSession
    counts_dir = os.path.join(state_dir, "counts")
    mine = _bucket_counts(batch, on, window_s).localCheckpoint()
    committed = _count_versions(counts_dir)
    my_v = os.path.join(counts_dir, f"v={int(epoch_id)}")
    if int(epoch_id) in committed:
        # checkpoint-recovery replay of a fully committed epoch: the
        # merge already happened; recompute only the (deterministic)
        # flags from the committed version
        merged = spark.read.parquet(my_v)
    elif committed and int(epoch_id) < committed[-1]:
        # this epoch's version (if it ever committed) was pruned when
        # a later epoch superseded it: re-merging would judge the
        # batch against a baseline missing everything it had merged,
        # and commit a bogus version. Structured Streaming never
        # replays below the latest commit — refuse loudly (the same
        # guard as bloom_stream's pruned-epoch rule).
        raise ValueError(
            f"rate-monitor epoch {int(epoch_id)} is older than the "
            f"latest committed counts version v={committed[-1]} (its "
            "own version, if any, was pruned by the ≤2-versions "
            "bound) — only the latest epoch can replay; an older "
            "epoch id here means a corrupted or foreign stream")
    else:
        bases = [v for v in committed if v < int(epoch_id)]
        base_v = max(bases) if bases else None
        merged = mine
        if base_v is not None:
            base = spark.read.parquet(
                os.path.join(counts_dir, f"v={base_v}"))
            merged = (base.unionByName(mine)
                      .groupBy("bucket")
                      .agg(F.sum("n_events").cast("long")
                           .alias("n_events")))
        merged.coalesce(1).write.mode("overwrite").parquet(my_v)
        merged = spark.read.parquet(my_v)
        # prune strictly-older-than-base versions (base stays until the
        # NEXT epoch commits, so a crash here can never orphan state)
        for v in committed:
            if base_v is not None and v < base_v:
                shutil.rmtree(os.path.join(counts_dir, f"v={v}"),
                              ignore_errors=True)
    # the flagging stage is the batch operator's own, applied to the
    # merged counts and restricted to this batch's buckets — one
    # definition, so batch and stream cannot diverge
    from cuvs_spark.operators.temporal import burst_flags_from_counts
    flags = burst_flags_from_counts(merged, lookback=lookback,
                                    factor=factor)
    return flags.join(mine.select("bucket"), "bucket", "left_semi")


def start_streaming_rate_monitor(spark: SparkSession, source_dir: str,
                                 schema: str, state_dir: str,
                                 out_dir: str, checkpoint_dir: str, *,
                                 on: str = "ts", window_s: int = 3600,
                                 lookback: int = 3,
                                 factor: tuple[int, int] = (2, 1),
                                 trigger_once: bool = True):
    """File-source stream → per-batch burst flags written exactly-once
    to ``out_dir/epoch=<epoch_id>/`` (idempotent per-epoch overwrite;
    read the whole flag table with ``spark.read.parquet(out_dir)`` —
    the ``epoch=`` directory layer surfaces as a partition column).
    The foreachBatch body is exactly
    :func:`burst_batch_against_state`, so batch tests cover the
    streaming semantics (the established pattern of dedup_stream /
    bloom_stream)."""
    src = spark.readStream.schema(schema).parquet(source_dir)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        flags = burst_batch_against_state(
            batch, state_dir, epoch_id, on=on, window_s=window_s,
            lookback=lookback, factor=factor)
        # exactly-once flag output (the bloom_stream discipline,
        # bloom_dedup_batch_against_state): each epoch's flags land in
        # their own subdirectory with an idempotent overwrite, so a
        # checkpoint-recovery replay of a committed epoch rewrites the
        # same bytes — flags are deterministic given the committed
        # count version the replay reuses — instead of appending
        # duplicates the way a flat mode("append") would
        (flags.withColumn("epoch_id", F.lit(int(epoch_id)))
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"epoch={int(epoch_id)}")))

    writer = (src.writeStream.foreachBatch(_process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
