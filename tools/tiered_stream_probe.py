"""Tiered-index streaming compaction probe (VERDICT r6 next #7).

Drives the tiered index (``operators/tiered.py`` — ANN tier + exact
delta tier, compaction past ``min_ann_rows``, the
``tiered_index.hpp:59-65`` semantics) through a real Structured
Streaming run at probe scale: N one-file micro-batches, a threshold
sized so compaction fires several times MID-STREAM, and an
exhaustive-probe search equality check (streamed index vs exact brute
force over the union) at the end. Prints one JSON line.

Usage: python tools/tiered_stream_probe.py [n_base] [n_batches]
                                           [batch_rows] [min_ann_rows]
Writes /tmp only; not part of the gate.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    min_ann = int(sys.argv[4]) if len(sys.argv) > 4 else 20_000
    dim, nq = 64, 200

    import pandas as pd
    from pyspark.sql import functions as F

    from cuvs_spark import get_spark
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.tiered import tiered_build, tiered_search
    from cuvs_spark.streaming import start_tiered_ingest
    from cuvs_spark.stats.metrics import recall_score

    spark = get_spark("tiered_stream_probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(17)
    centers = rng.normal(0, 1, (64, dim))

    def gen(lo: int, m: int) -> pd.DataFrame:
        lab = rng.integers(0, 64, m)
        X = (centers[lab] + rng.normal(0, 0.3, (m, dim))).astype(np.float32)
        return pd.DataFrame({"id": np.arange(lo, lo + m, dtype=np.int64),
                             "vec": list(X)})

    base = spark.createDataFrame(gen(0, n_base)).repartition(32).cache()
    base.count()
    src = "/tmp/tiered_stream_probe_src"
    shutil.rmtree(src, ignore_errors=True)
    batches = []
    for b in range(n_batches):
        pdf = gen(n_base + b * batch_rows, batch_rows)
        batches.append(pdf)
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(src)

    t0 = time.time()
    n_lists = 64
    state = {"index": tiered_build(base, n_lists=n_lists, kmeans_n_iters=4,
                                   min_ann_rows=min_ann)}
    build_sec = round(time.time() - t0, 2)

    t0 = time.time()
    q = start_tiered_ingest(spark, src, "id long, vec array<float>",
                            state, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    ingest_sec = round(time.time() - t0, 2)
    idx = state["index"]
    delta_rows = idx.delta.count()
    ann_rows = idx.ann.lists.count()

    queries = (base.filter(F.col("id") % (n_base // nq) == 0)
               .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))
    t0 = time.time()
    got = tiered_search(idx, queries, 10, n_probes=n_lists,
                        qvec_col="qv").localCheckpoint()
    got.count()
    search_sec = round(time.time() - t0, 2)

    union = base.unionByName(
        spark.createDataFrame(pd.concat(batches)).repartition(32))
    exact = knn(union, queries, 10, "sqeuclidean", qvec_col="qv",
                method="blas")
    rec = round(float(recall_score(got, exact).head()["recall"]), 4)

    print(json.dumps({
        "n_base": n_base, "n_batches": n_batches, "batch_rows": batch_rows,
        "min_ann_rows": min_ann, "epochs": state.get("epochs", 0),
        "compactions": state.get("compactions", 0),
        "final_delta_rows": delta_rows, "final_ann_rows": ann_rows,
        "build_sec": build_sec, "ingest_sec": ingest_sec,
        "search_sec": search_sec,
        "exhaustive_search_recall_vs_exact": rec}))


if __name__ == "__main__":
    main()
