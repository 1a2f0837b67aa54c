"""Streaming event-rate burst monitor — the ingest-time counterpart of
``operators/temporal.burst_windows`` (SURVEY §2.9 maps the reference's
streaming surfaces onto foreachBatch; rate anomaly detection is the
ingestion-guard analog: a crawler loop or replayed feed is flagged in
the micro-batch it arrives, before the data pollutes the corpus).

Per micro-batch:
1. the batch's events collapse to per-window-bucket counts (integer
   division of int64 epoch micros, the batch operator's bucketing);
2. the counts land in the state store under ``batch=<epoch_id>/`` —
   one directory per micro-batch, OVERWRITTEN on replay, so a
   checkpoint-recovery re-run of the same epoch converges instead of
   double-counting (idempotence by construction, the same discipline
   as ``bloom_stream``'s versioned commits);
3. the merged state (a groupBy-sum over all batch directories) runs
   the exact batch ``burst_windows`` logic, restricted to the buckets
   THIS batch touched — each window is judged against the trailing
   baseline as of its own arrival.

State size is O(time-span / window_s) rows — independent of event
volume, like the Bloom filter's O(m) — and the per-batch flag job is
one map-side-combined groupBy + a window over the counts table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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

    Replay-safe: the batch's counts are written to
    ``state_dir/counts/batch=<epoch_id>`` with overwrite, so
    re-processing an epoch after checkpoint recovery rewrites the same
    rows. The merged view sums across batch directories (a bucket
    split across micro-batches accumulates correctly)."""
    spark = batch.sparkSession
    counts_dir = os.path.join(state_dir, "counts")
    mine = _bucket_counts(batch, on, window_s)
    (mine.coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(counts_dir, f"batch={int(epoch_id)}")))
    merged = (spark.read.option("basePath", counts_dir).parquet(counts_dir)
              .groupBy("bucket")
              .agg(F.sum("n_events").cast("long").alias("n_events")))
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
    """File-source stream → per-batch burst flags appended to
    ``out_dir``. The foreachBatch body is exactly
    :func:`burst_batch_against_state`, so batch tests cover the
    streaming semantics (the established pattern of dedup_stream /
    bloom_stream)."""
    src = spark.readStream.schema(schema).parquet(source_dir)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        flags = burst_batch_against_state(
            batch, state_dir, epoch_id, on=on, window_s=window_s,
            lookback=lookback, factor=factor)
        (flags.withColumn("epoch_id", F.lit(int(epoch_id)))
         .write.mode("append").parquet(out_dir))

    writer = (src.writeStream.foreachBatch(_process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
