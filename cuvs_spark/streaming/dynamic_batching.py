"""Dynamic batching as a concrete Structured-Streaming operator
(SURVEY.md §2.5 ``dynamic_batching``).

Reference: ``cpp/include/cuvs/neighbors/dynamic_batching.hpp:24-70``
(wrap any index; queue single queries into batches — ``k``,
``max_batch_size=100``, ``n_queues=3``, ``dispatch_timeout_ms=1.0`` —
and dispatch each batch as one search) and ``:159,217``
(build/search); impl ``detail/dynamic_batching.cuh``.

Spark mapping: queries arrive as a STREAM of single rows; the
micro-batch trigger interval IS the dispatch timeout (queries queue in
the source until the trigger fires), and each micro-batch is one
dispatched search against the wrapped index — any index type, via the
same pluggable ``search_fn`` the tiered index uses. Per-dispatch batch
formation (size, latency) is measured and recorded, which is the
observable the reference's batcher exposes through its benchmark hooks.

With ``sink_dir`` set, results flow executor-side straight to the sink
— no query row or result row ever passes through the driver; the
driver only keeps the O(#dispatches) formation measurements. Without a
sink the operator runs as an inspection harness and collects results
into ``state`` (small-queue debugging only).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dispatch_assignments(q: DataFrame, max_batch_size: int, *,
                         qid_col: str = "qid") -> DataFrame:
    """The batcher's queue-splitting rule, factored out so the
    correctness gate exercises the exact production expression: queued
    queries in ``qid_col`` order are packed greedily into consecutive
    dispatches of at most ``max_batch_size``
    (``dynamic_batching.hpp:24-70``'s max_batch_size semantics) —
    ``_dispatch = (row_number - 1) DIV max_batch_size``, pure integer.

    The rank window is unpartitioned ON PURPOSE: it runs per
    micro-batch over the QUEUE (bounded by source rows per trigger),
    never over the corpus — the queue is the reference's in-memory
    structure, dispatch-sized by construction."""
    if max_batch_size < 1:
        raise ValueError("max_batch_size must be >= 1")
    w = Window.orderBy(qid_col)
    return (q.withColumn("_rn", F.row_number().over(w) - 1)
             .withColumn("_dispatch",
                         F.expr(f"CAST(_rn DIV {int(max_batch_size)} "
                                "AS BIGINT)"))
             .drop("_rn"))


def start_dynamic_batching(spark: SparkSession, source_dir: str,
                           schema: str, index, state: dict, *,
                           k: int = 10, n_probes: int = 8,
                           max_batch_size: int = 100,
                           dispatch_timeout_s: float = 0.5,
                           search_fn=None, sink_dir: str | None = None,
                           qid_col: str = "qid", qvec_col: str = "vec"):
    """Stream single-query rows from ``source_dir``; every trigger
    dispatches the queued queries as ONE batched search against
    ``index``.

    ``dispatch_timeout_s`` ≈ ``dispatch_timeout_ms`` (the trigger
    interval: how long single queries wait to co-dispatch);
    ``max_batch_size`` caps rows per dispatch — an oversize queue is
    split into consecutive dispatches by a rank over the queue, so no
    dispatch exceeds the cap (the reference's queue semantics).

    Results land exactly-once under
    ``sink_dir/epoch=<id>/dispatch=<c>/`` as parquet when given, else
    results go to ``state["results"]`` (driver-collected inspection
    mode). The epoch commits ATOMICALLY: every dispatch writes under a
    hidden ``sink_dir/_tmp_epoch=<id>/`` staging path (Spark readers
    skip ``_``-prefixed dirs), and one directory rename publishes the
    whole epoch — so sink readers never see a half-written epoch, and
    a checkpoint-recovery replay of a committed epoch is DETECTED from
    the published directory and skipped outright (no determinism
    assumption on ``search_fn``; the committed bytes are simply kept —
    the ``_SUCCESS``-gated discipline of the other streaming sinks,
    with the rename as the commit record). The rename is
    ``os.rename`` — atomic on a local/NFS POSIX ``sink_dir`` (this
    engine's execution model); pointing the sink at an object store
    or an ``hdfs://`` URI needs the commit step swapped for that
    store's atomic-publish primitive. Batch
    formation measurements go to ``state["batches"]``:
    ``{"epoch", "n_queries", "n_dispatches", "dispatch_sec"}``
    (``{"epoch", "replayed": True}`` for a skipped committed replay).

    **Pass ``sink_dir`` in production.** The no-sink fallback collects
    every dispatch's results into driver memory — it exists for tests
    and notebook inspection of a few batches, and its driver residency
    grows with stream length. The sink path is fully executor-side.
    """
    from cuvs_spark.operators.ivf_flat import ivf_flat_search
    fn = search_fn or ivf_flat_search
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        final = (os.path.join(sink_dir, f"epoch={int(epoch_id)}")
                 if sink_dir is not None else None)
        if final is not None and os.path.isdir(final):
            # checkpoint-recovery replay of a committed epoch: the
            # rename below is the commit record, so the published dir
            # IS the epoch's exactly-once output — keep it, don't
            # re-run the searches (fn may not be deterministic)
            state.setdefault("batches", []).append(
                {"epoch": int(epoch_id), "replayed": True})
            return
        q = (batch_df.select(F.col(qid_col).cast("long").alias("qid"),
                             F.col(qvec_col).alias("qv"))
             .localCheckpoint())
        n = q.count()
        if n == 0:
            return
        # split an oversize queue into ≤ max_batch_size dispatches:
        # rank over the queued qids (queue-sized, executor-side) — the
        # driver never sees a query row
        q = dispatch_assignments(q, max_batch_size).localCheckpoint()
        dispatches = int(q.agg(F.max("_dispatch")).head()[0]) + 1
        staging = (os.path.join(sink_dir, f"_tmp_epoch={int(epoch_id)}")
                   if sink_dir is not None else None)
        if staging is not None and os.path.isdir(staging):
            # leftovers from a crash mid-epoch: replays recompute from
            # scratch, so stale partial dispatches never leak through
            shutil.rmtree(staging, ignore_errors=True)
        for c in range(dispatches):
            out = fn(index, q.filter(F.col("_dispatch") == c)
                     .drop("_dispatch"), k, n_probes,
                     qid_col="qid", qvec_col="qv")
            if staging is not None:
                # dispatches land under the hidden staging dir (Spark
                # readers skip "_" paths); nothing is visible to sink
                # readers until the whole epoch renames into place
                (out.write.mode("overwrite")
                    .parquet(os.path.join(staging, f"dispatch={c}")))
            else:
                state.setdefault("results", []).append(out.collect())
        if staging is not None:
            # the commit: one atomic directory rename publishes every
            # dispatch of the epoch at once
            os.rename(staging, final)
        state.setdefault("batches", []).append(
            {"epoch": int(epoch_id), "n_queries": int(n),
             "n_dispatches": dispatches,
             "dispatch_sec": round(time.time() - t0, 3)})

    return (stream.writeStream.foreachBatch(on_batch)
            .outputMode("append")
            .trigger(processingTime=f"{dispatch_timeout_s} seconds")
            .start())
