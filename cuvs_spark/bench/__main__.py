"""CLI for the ANN sweep harness (``python -m cuvs_bench.run`` analog,
reference ``run/__main__.py``: dataset + config in, build/search phases,
exported results out).

Config is JSON (the reference uses YAML; JSON needs no extra dependency)::

    {"configs": [
       {"algo": "ivf_flat", "build": {"n_lists": [16, 32]},
        "search": {"n_probes": [1, 4, 16]}}],
     "k": 10, "n_queries": 100}

Usage::

    python -m cuvs_spark.bench --dataset /root/testdata/sf0.01 \
        --config sweep.json --out /tmp/sweep_results
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="cuvs_spark.bench")
    ap.add_argument("--dataset", required=True,
                    help="sf dir with embeddings.parquet, or a .fbin file")
    ap.add_argument("--config", default=None, help="JSON sweep config")
    ap.add_argument("--out", default=None, help="export dir (CSV+JSON)")
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--n-queries", type=int, default=None)
    ap.add_argument("--tune", default=None, metavar="ALGO",
                    help="random-search tune this algorithm instead of "
                         "running a grid config")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--target-recall", type=float, default=0.9)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    conf = {}
    if args.config:
        with open(args.config) as f:
            conf = json.load(f)
    elif not args.tune:
        ap.error("one of --config or --tune is required")
    k = args.k or conf.get("k", 10)
    nq = args.n_queries or conf.get("n_queries", 100)

    from pyspark.sql import functions as F

    from cuvs_spark import get_spark
    from cuvs_spark.bench.sweep import (export_results, pareto_frontier,
                                        run_sweep)
    spark = get_spark("cuvs_spark_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    if args.dataset.endswith((".fbin", ".u8bin", ".ibin")):
        from cuvs_spark.sources.index_store import read_bin_dataset
        d = read_bin_dataset(spark, args.dataset)
    else:
        d = (spark.read.parquet(f"{args.dataset}/embeddings.parquet")
             .select(F.col("vec_id").alias("id"),
                     F.col("embedding").alias("vec")))
    d = d.cache()
    d.count()
    q = (d.filter(F.col("id") < nq)
          .select(F.col("id").alias("qid"), "vec"))

    if args.tune:
        from cuvs_spark.bench.sweep import tune
        out = tune(spark, d, q, args.tune, n_trials=args.trials, k=k,
                   seed=args.seed, target_recall=args.target_recall)
        results = out["trials"]
        b = out["best"]
        print(f"best: {b['build_params']} {b['search_params']} "
              f"recall={b['recall']:.3f} qps={b['qps']}")
    else:
        results = run_sweep(spark, d, q, conf["configs"], k=k)
    if args.out:
        csv_path, json_path = export_results(results, args.out)
        print(f"wrote {csv_path} and {json_path}")
    print("pareto (recall, qps):")
    for r in pareto_frontier(results):
        print(f"  {r['algo']:>12} {r['build_params']} {r['search_params']}"
              f"  recall={r['recall']:.3f} qps={r['qps']}")


if __name__ == "__main__":
    main()
