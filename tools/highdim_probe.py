"""High-dimension hardening probe (VERDICT r6 next #2).

Every gate and the main scale probe run at 64-dim, while the
reference's committed workloads are 128-960-dim (its datasets.yaml:
gist-960, mnist-784, wiki_all 768). This probe runs the BLAS and expr
kNN paths, one IVF search, and the LSH path at reference
dimensionality (default 768 and 960) and prints one JSON line per dim.

The codegen bar extends to this run: wide HOF folds were exactly what
motivated the `methodSplitThreshold=256` fix (session.py), so drive it
with stderr captured and grep for `ERROR CodeGenerator` — zero is the
bar:

    python tools/highdim_probe.py 2>/tmp/highdim_stderr.log
    grep -c "ERROR CodeGenerator" /tmp/highdim_stderr.log   # must be 0

Usage: python tools/highdim_probe.py [n_rows] [n_queries] [dims_csv]
Writes /tmp only; not part of the gate.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_dim(spark, n: int, dim: int, nq: int) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F

    from cuvs_spark.operators import knn
    from cuvs_spark.operators.ivf_flat import ivf_flat_build, ivf_flat_search
    from cuvs_spark.operators.lsh import lsh_knn
    from cuvs_spark.stats.metrics import recall_score

    path = f"/tmp/highdim_probe_{n}x{dim}.parquet"
    if not os.path.exists(path):
        rng = np.random.default_rng(13)
        centers = rng.normal(0, 1, (128, dim))
        dfs = []
        for s in range(0, n, 25_000):
            m = min(25_000, n - s)
            lab = rng.integers(0, 128, m)
            X = (centers[lab]
                 + rng.normal(0, 0.3, (m, dim))).astype(np.float32)
            dfs.append(pd.DataFrame({
                "id": np.arange(s, s + m, dtype=np.int64), "vec": list(X)}))
        spark.createDataFrame(pd.concat(dfs)) \
            .write.mode("overwrite").parquet(path)

    d = spark.read.parquet(path).repartition(32).cache()
    d.count()
    q = (d.filter(F.col("id") < nq)
         .select(F.col("id").alias("qid"), F.col("vec").alias("qv")))

    out = {"dim": dim}
    t0 = time.time()
    exact_blas = knn(d, q, 10, "euclidean", qvec_col="qv", method="blas")
    exact_blas = exact_blas.localCheckpoint()
    exact_blas.count()
    out["knn_blas_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    knn(d, q, 10, "euclidean", qvec_col="qv", method="expr") \
        .write.format("noop").mode("overwrite").save()
    out["knn_expr_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    idx = ivf_flat_build(d, n_lists=64, kmeans_n_iters=4,
                         trainset_fraction=0.2)
    idx.lists.cache().count()
    out["ivf_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    got = ivf_flat_search(idx, q, 10, n_probes=8, qvec_col="qv",
                          method="blas").localCheckpoint()
    got.count()
    out["ivf_search_sec"] = round(time.time() - t0, 2)
    out["ivf_recall"] = round(float(
        recall_score(got, exact_blas).head()["recall"]), 3)

    t0 = time.time()
    lsh_got = lsh_knn(d, q, 10, n_planes=12, n_tables=8, n_probe_bits=3,
                      dim=dim, metric="sqeuclidean", qvec_col="qv") \
        .localCheckpoint()
    lsh_got.count()
    out["lsh_search_sec"] = round(time.time() - t0, 2)
    exact_sq = knn(d, q, 10, "sqeuclidean", qvec_col="qv", method="blas")
    out["lsh_recall"] = round(float(
        recall_score(lsh_got, exact_sq).head()["recall"]), 3)
    d.unpersist()
    idx.lists.unpersist()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    dims = [int(x) for x in sys.argv[3].split(",")] \
        if len(sys.argv) > 3 else [768, 960]

    from cuvs_spark import get_spark
    spark = get_spark("highdim_probe")

    for dim in dims:
        print(json.dumps({"n_rows": n, "n_queries": nq,
                          **run_dim(spark, n, dim, nq)}), flush=True)


if __name__ == "__main__":
    main()
