"""ANN parameter-sweep harness (cuvs-bench run/export parity).

Reference surface: ``python/cuvs_bench/cuvs_bench/run/run.py`` (expand a
per-algorithm grid of build/search params, build once per build-config,
search once per search-config), ``backends/base.py`` (build/search phases
with recall + qps/latency metrics), ``run/data_export.py`` (flatten result
JSON into build/search CSVs with recall / qps / latency columns), and the
discrete sweep grids of ``config/algos/*.yaml``.

Spark-first shape: every backend builds/searches through the engine's own
DataFrame operators, so the sweep measures the *distributed plans* the
user would actually run — a build is timed to full materialization
(``localCheckpoint``-backed index tables), a search is timed to an action
over the result. Recall is the reference's universal pass criterion
(``benchmark.hpp:419``) computed as a distributed semi-join via
:func:`cuvs_spark.stats.metrics.recall_score`.
"""

from __future__ import annotations

import itertools
import json
import os
import time

from pyspark.sql import DataFrame

from cuvs_spark.operators.brute_force import bf_build, knn


def _force(df: DataFrame) -> DataFrame:
    """Materialize an index table so build timing is honest."""
    return df.localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# Backends: name -> build(spark, dataset, **bp) returning
# search(queries, k, **sp) -> DataFrame(qid, nid, ...).
# Mirrors backends/registry.py with the engine's operators as executables.
# --------------------------------------------------------------------------

def _be_brute_force(spark, dataset, *, metric="sqeuclidean"):
    idx = bf_build(dataset, metric)
    idx.dataset = _force(idx.dataset)

    def search(queries, k, *, method="blas"):
        return idx.search(queries, k, method=method)
    return search


def _be_ivf_flat(spark, dataset, *, n_lists=32, metric="sqeuclidean",
                 kmeans_n_iters=20):
    from cuvs_spark.operators.ivf_flat import ivf_flat_build, ivf_flat_search
    idx = ivf_flat_build(dataset, n_lists, metric=metric,
                         kmeans_n_iters=kmeans_n_iters)
    idx.lists = _force(idx.lists)

    def search(queries, k, *, n_probes=4, method="expr"):
        return ivf_flat_search(idx, queries, k, n_probes, method=method)
    return search


def _be_ivf_pq(spark, dataset, *, n_lists=32, pq_dim=8, pq_bits=4,
               encode="residual"):
    from cuvs_spark.operators.ivf_pq import ivf_pq_build, ivf_pq_search
    idx = ivf_pq_build(dataset, n_lists, pq_dim, pq_bits, encode=encode)
    idx.codes = _force(idx.codes)

    def search(queries, k, *, n_probes=4, method="blas"):
        return ivf_pq_search(idx, queries, k, n_probes, method=method)
    return search


def _be_ivf_sq(spark, dataset, *, n_lists=32, lo=-0.5, hi=0.5):
    from cuvs_spark.operators.ivf_pq import ivf_sq_build, ivf_sq_search
    idx = ivf_sq_build(dataset, n_lists, lo=lo, hi=hi)
    idx.rcodes = _force(idx.rcodes)

    def search(queries, k, *, n_probes=4):
        return ivf_sq_search(idx, queries, k, n_probes)
    return search


def _be_ivf_rabitq(spark, dataset, *, n_lists=32, bits_per_dim=3):
    from cuvs_spark.operators.ivf_rabitq import (ivf_rabitq_build,
                                                 ivf_rabitq_search)
    idx = ivf_rabitq_build(dataset, n_lists, bits_per_dim=bits_per_dim)
    idx.codes = _force(idx.codes)
    raw = _force(dataset)

    def search(queries, k, *, n_probes=4, refine_k0=0):
        return ivf_rabitq_search(
            idx, queries, k, n_probes,
            refine_with=raw if refine_k0 else None,
            refine_k0=refine_k0 or 30)
    return search


def _be_scann(spark, dataset, *, n_leaves=32, soar_lambda=1.5, pq_dim=None):
    from cuvs_spark.operators.scann import scann_build, scann_search
    idx = scann_build(dataset, n_leaves, soar_lambda=soar_lambda,
                      pq_dim=pq_dim)
    idx.assignments = _force(idx.assignments)
    if idx.codes is not None:
        idx.codes = _force(idx.codes)

    def search(queries, k, *, n_probes=4, score_method="blas"):
        return scann_search(idx, queries, k, n_probes,
                            score_method=score_method)
    return search


def _be_cagra(spark, dataset, *, graph_degree=16,
              build_algo="all_neighbors"):
    from cuvs_spark.operators.graph import cagra_build, cagra_search
    graph = _force(cagra_build(dataset, graph_degree,
                               build_algo=build_algo))
    data = _force(dataset)

    def search(queries, k, *, itopk=32, max_iterations=8):
        return cagra_search(graph, data, queries, k, itopk=itopk,
                            max_iterations=max_iterations)
    return search


def _be_hnsw(spark, dataset, *, graph_degree=16, ef_construction=200):
    from cuvs_spark.sources.graph_export import hnsw_build, hnsw_search
    layers = _force(hnsw_build(dataset, graph_degree=graph_degree,
                               ef_construction=ef_construction))
    data = _force(dataset)

    def search(queries, k, *, ef=40):
        return hnsw_search(layers, data, queries, k, ef=ef)
    return search


def _be_tiered(spark, dataset, *, n_lists=16):
    from cuvs_spark.operators.tiered import tiered_build, tiered_search
    idx = tiered_build(dataset, n_lists)
    if idx.ann is not None:
        idx.ann.lists = _force(idx.ann.lists)

    def search(queries, k, *, n_probes=4):
        return tiered_search(idx, queries, k, n_probes)
    return search


BACKENDS = {
    "brute_force": _be_brute_force,
    "ivf_flat": _be_ivf_flat,
    "ivf_pq": _be_ivf_pq,
    "ivf_sq": _be_ivf_sq,
    "ivf_rabitq": _be_ivf_rabitq,
    "scann": _be_scann,
    "cagra": _be_cagra,
    "hnsw": _be_hnsw,
    "tiered": _be_tiered,
}


def expand_grid(grid: dict) -> list[dict]:
    """Discrete sweep expansion (the YAML algos grids / run.py product):
    each value may be a scalar or a list; returns the cartesian product."""
    keys = list(grid)
    vals = [v if isinstance(v, list) else [v] for v in grid.values()]
    return [dict(zip(keys, combo)) for combo in itertools.product(*vals)]


def run_sweep(spark, dataset: DataFrame, queries: DataFrame,
              configs: list[dict], *, k: int = 10,
              groundtruth: DataFrame | None = None,
              metric: str = "sqeuclidean") -> list[dict]:
    """Run a build/search parameter sweep and score each point.

    ``configs``: list of ``{"algo": name, "build": grid, "search": grid}``
    where grid values may be lists (expanded like cuvs-bench sweep mode).
    Per the reference runner, each build config is built ONCE and every
    search config runs against it. Returns one dict per (build, search)
    point with ``build_s``, ``search_s``, ``qps``, ``latency`` and
    ``recall`` (vs ``groundtruth`` — computed exactly here when omitted).
    """
    n_queries = queries.count()
    if groundtruth is None:
        groundtruth = knn(dataset, queries, k, metric, method="blas")
    gt = groundtruth.select("qid", "nid").localCheckpoint(eager=True)

    from cuvs_spark.stats.metrics import recall_score
    results = []
    for conf in configs:
        algo = conf["algo"]
        make = BACKENDS[algo]
        for bp in expand_grid(conf.get("build", {})):
            t0 = time.perf_counter()
            search = make(spark, dataset, **bp)
            build_s = time.perf_counter() - t0
            for sp in expand_grid(conf.get("search", {})):
                t0 = time.perf_counter()
                res = search(queries, k, **sp)
                res = res.select("qid", "nid").localCheckpoint(eager=True)
                search_s = time.perf_counter() - t0
                rec = recall_score(res, gt).first()["recall"]
                results.append({
                    "algo": algo, "build_params": bp, "search_params": sp,
                    "k": k, "n_queries": n_queries,
                    "build_s": round(build_s, 4),
                    "search_s": round(search_s, 4),
                    "qps": round(n_queries / search_s, 2),
                    "latency": round(search_s / n_queries, 6),
                    "recall": rec,
                })
    return results


def export_results(results: list[dict], out_dir: str) -> tuple[str, str]:
    """``data_export.py`` analog: one CSV per phase with the reference's
    headline columns (algo_name, recall, qps, latency, build time) plus
    flattened params, and the raw JSON alongside."""
    import pandas as pd
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for r in results:
        row = {"algo_name": r["algo"], "recall": r["recall"],
               "qps": r["qps"], "latency": r["latency"],
               "build_time": r["build_s"], "search_time": r["search_s"],
               "k": r["k"], "n_queries": r["n_queries"]}
        row.update({f"build.{p}": v for p, v in r["build_params"].items()})
        row.update({f"search.{p}": v for p, v in r["search_params"].items()})
        rows.append(row)
    csv_path = os.path.join(out_dir, "search.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    json_path = os.path.join(out_dir, "results.json")
    with open(json_path, "w") as f:
        json.dump(results, f, indent=1)
    return csv_path, json_path


def pareto_frontier(results: list[dict]) -> list[dict]:
    """Recall/QPS pareto points (what the reference's plots draw:
    ``data_export.py`` metrics map — higher recall, higher qps)."""
    pts = sorted(results, key=lambda r: (-r["recall"], -r["qps"]))
    best_qps = float("-inf")
    front = []
    for r in pts:
        if r["qps"] > best_qps:
            front.append(r)
            best_qps = r["qps"]
    return sorted(front, key=lambda r: r["recall"])


# --------------------------------------------------------------------------
# Tune mode (backends/search_spaces.py + run tune): random search over
# typed parameter spaces instead of a discrete grid. The reference
# explores with Optuna; a seeded random search over the same space
# shapes (int ranges with optional log scale, categoricals, dependent
# upper bounds like n_probes <= n_lists) keeps it dependency-free.
# --------------------------------------------------------------------------

SEARCH_SPACES = {
    "ivf_flat": {
        "build": {"n_lists": {"type": "int", "min": 4, "max": 256,
                              "log": True}},
        "search": {"n_probes": {"type": "int", "min": 1, "max": "n_lists"}},
    },
    "ivf_pq": {
        "build": {"n_lists": {"type": "int", "min": 4, "max": 128,
                              "log": True},
                  "pq_dim": {"type": "int", "min": 2, "max": 16},
                  "pq_bits": {"type": "int", "min": 4, "max": 8},
                  "encode": {"type": "categorical",
                             "choices": ["raw", "residual"]}},
        "search": {"n_probes": {"type": "int", "min": 1, "max": "n_lists"}},
    },
    "ivf_rabitq": {
        "build": {"n_lists": {"type": "int", "min": 4, "max": 128,
                              "log": True},
                  "bits_per_dim": {"type": "int", "min": 1, "max": 7}},
        "search": {"n_probes": {"type": "int", "min": 1, "max": "n_lists"}},
    },
    "scann": {
        "build": {"n_leaves": {"type": "int", "min": 4, "max": 128,
                               "log": True},
                  "soar_lambda": {"type": "float", "min": 0.5, "max": 2.0}},
        "search": {"n_probes": {"type": "int", "min": 1, "max": "n_leaves"}},
    },
    "cagra": {
        "build": {"graph_degree": {"type": "int", "min": 8, "max": 64},
                  "build_algo": {"type": "categorical",
                                 "choices": ["all_neighbors", "nn_descent",
                                             "iterative_cagra_search"]}},
        "search": {"itopk": {"type": "int", "min": 16, "max": 128},
                   "max_iterations": {"type": "int", "min": 4, "max": 16}},
    },
    "hnsw": {
        "build": {"graph_degree": {"type": "int", "min": 8, "max": 64}},
        "search": {"ef": {"type": "int", "min": 10, "max": 200}},
    },
}


def _sample_param(spec, rng, bound_env):
    if spec["type"] == "categorical":
        return spec["choices"][int(rng.integers(len(spec["choices"])))]
    hi = spec["max"]
    if isinstance(hi, str):               # dependent bound (e.g. n_lists)
        hi = bound_env[hi]
    lo = spec["min"]
    if spec["type"] == "float":
        return float(lo + (hi - lo) * rng.random())
    if spec.get("log"):
        import math
        return int(round(math.exp(
            math.log(lo) + (math.log(hi) - math.log(lo)) * rng.random())))
    return int(rng.integers(lo, hi + 1))


def sample_trial(algo: str, rng, space: dict | None = None) -> dict:
    """One random (build, search) point from the algo's search space;
    search-space bounds may reference build params by name."""
    sp = (space or SEARCH_SPACES)[algo]
    bp = {p: _sample_param(s, rng, {}) for p, s in sp["build"].items()}
    spp = {p: _sample_param(s, rng, bp) for p, s in sp["search"].items()}
    return {"algo": algo, "build": bp, "search": spp}


def tune(spark, dataset, queries, algo: str, *, n_trials: int = 10,
         k: int = 10, seed: int = 0, target_recall: float = 0.9,
         space: dict | None = None,
         groundtruth=None) -> dict:
    """Random-search tuning: sample ``n_trials`` points, run each
    through :func:`run_sweep`, and pick the best — highest QPS among
    trials meeting ``target_recall``, else the highest recall.
    Returns ``{"best": point, "trials": [...]}``."""
    import numpy as np
    rng = np.random.default_rng(seed)
    configs = [sample_trial(algo, rng, space) for _ in range(n_trials)]
    trials = run_sweep(spark, dataset, queries, configs, k=k,
                       groundtruth=groundtruth)
    ok = [t for t in trials if t["recall"] >= target_recall]
    best = (max(ok, key=lambda t: t["qps"]) if ok
            else max(trials, key=lambda t: (t["recall"], t["qps"])))
    return {"best": best, "trials": trials}
