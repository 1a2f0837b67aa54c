"""Structured Streaming surfaces (SURVEY.md §2.9).

The reference is batch-only; its incremental pieces map here:

* ``extend`` / tiered ingestion → ``foreachBatch``: each micro-batch
  appends to the tiered index's delta tier; compaction folds the delta
  into the ANN tier past ``min_ann_rows`` (``tiered_index.hpp:59-65``).
* ``dynamic_batching`` (``dynamic_batching.hpp:24-70``: queue queries,
  dispatch after ``dispatch_timeout_ms``) → the micro-batch trigger
  interval plays exactly this role.
* watermark + event-time windows (absent in the reference) → standard
  ``withWatermark`` + ``window`` aggregation over the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_tiered_ingest(spark: SparkSession, source_dir: str, schema: str,
                        state: dict, *, id_col: str = "id",
                        vec_col: str = "vec",
                        trigger_seconds: float | None = None,
                        max_files_per_trigger: int | None = None):
    """Stream (id, vec) rows from ``source_dir`` into ``state["index"]``
    (a TieredIndex) via foreachBatch.

    ``state`` is a mutable holder so callers can search mid-stream; the
    trigger interval is the dynamic-batching dispatch timeout.
    ``max_files_per_trigger`` caps files per micro-batch (one file per
    epoch reproduces the reference's per-extend compaction cadence —
    without it a backlog of files collapses into one epoch).
    ``state["compactions"]`` counts the micro-batches whose extend
    crossed ``min_ann_rows`` and folded the delta into the ANN tier."""
    from cuvs_spark.operators.tiered import tiered_extend

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = batch_df.select(F.col(id_col).cast("long").alias("id"),
                               F.col(vec_col).alias("vec")).localCheckpoint()
        state["index"] = tiered_extend(state["index"], rows)
        # rows is non-empty here, so an empty post-extend delta means
        # exactly one thing: the extend crossed min_ann_rows and folded
        if state["index"].delta.isEmpty():
            state["compactions"] = state.get("compactions", 0) + 1
        state["epochs"] = state.get("epochs", 0) + 1

    writer = stream.writeStream.foreachBatch(on_batch).outputMode("append")
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked event-time window aggregation over the ``events``
    fixture (late rows beyond the watermark are dropped in streaming
    mode; in batch mode this is a plain window groupBy)."""
    w = (F.window("ts", window, slide) if slide else F.window("ts", window))
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "total_value"))
