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
    ``sink_dir/epoch=<id>/dispatch=<c>/`` as parquet (distributed
    idempotent overwrite per dispatch — replays rewrite the same
    bytes; read the whole sink with ``spark.read.parquet(sink_dir)``
    and ``epoch``/``dispatch`` come back as partition columns) when
    given, else results go to ``state["results"]`` (driver-collected
    inspection mode).  Batch
    formation measurements go to ``state["batches"]``:
    ``{"epoch", "n_queries", "n_dispatches", "dispatch_sec"}``.

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
        for c in range(dispatches):
            out = fn(index, q.filter(F.col("_dispatch") == c)
                     .drop("_dispatch"), k, n_probes,
                     qid_col="qid", qvec_col="qv")
            if sink_dir is not None:
                # exactly-once results: each (epoch, dispatch) writes
                # its own subdirectory with an idempotent overwrite
                # (the rate-monitor/bloom discipline) — a checkpoint-
                # recovery replay re-runs the same deterministic
                # dispatch and rewrites the same bytes instead of
                # appending duplicates; readers of sink_dir get epoch/
                # dispatch back as partition columns
                (out.write.mode("overwrite")
                    .parquet(os.path.join(
                        sink_dir, f"epoch={int(epoch_id)}",
                        f"dispatch={c}")))
            else:
                state.setdefault("results", []).append(out.collect())
        state.setdefault("batches", []).append(
            {"epoch": int(epoch_id), "n_queries": int(n),
             "n_dispatches": dispatches,
             "dispatch_sec": round(time.time() - t0, 3)})

    return (stream.writeStream.foreachBatch(on_batch)
            .outputMode("append")
            .trigger(processingTime=f"{dispatch_timeout_s} seconds")
            .start())
