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
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_dynamic_batching(spark: SparkSession, source_dir: str,
                           schema: str, index, state: dict, *,
                           k: int = 10, n_probes: int = 8,
                           max_batch_size: int = 100,
                           dispatch_timeout_s: float = 0.5,
                           search_fn=None,
                           qid_col: str = "qid", qvec_col: str = "vec"):
    """Stream single-query rows from ``source_dir``; every trigger
    dispatches the queued queries as ONE batched search against
    ``index``.

    ``dispatch_timeout_s`` ≈ ``dispatch_timeout_ms`` (the trigger
    interval: how long single queries wait to co-dispatch);
    ``max_batch_size`` caps rows per dispatch via the file source's
    ``maxFilesPerTrigger``-style admission (oversize micro-batches are
    split into consecutive searches so no dispatch exceeds the cap,
    matching the reference's queue semantics).

    Results append to ``state["results"]`` (list of collected row
    lists) and batch-formation measurements to ``state["batches"]``:
    ``{"epoch", "n_queries", "n_dispatches", "dispatch_sec"}``.
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
        dispatches = 0
        rows = []
        # split an oversize queue into ≤ max_batch_size dispatches
        qids = sorted(r["qid"] for r in q.select("qid").collect())
        for s in range(0, n, max_batch_size):
            chunk_ids = set(qids[s:s + max_batch_size])
            chunk = q.filter(F.col("qid").isin(chunk_ids))
            out = fn(index, chunk, k, n_probes, qid_col="qid",
                     qvec_col="qv")
            rows.extend(out.collect())
            dispatches += 1
        state.setdefault("results", []).append(rows)
        state.setdefault("batches", []).append(
            {"epoch": int(epoch_id), "n_queries": int(n),
             "n_dispatches": dispatches,
             "dispatch_sec": round(time.time() - t0, 3)})

    return (stream.writeStream.foreachBatch(on_batch)
            .outputMode("append")
            .trigger(processingTime=f"{dispatch_timeout_s} seconds")
            .start())
