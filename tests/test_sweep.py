"""ANN sweep harness (cuvs-bench run/data_export analog)."""

from __future__ import annotations

import csv
import json
import os

from cuvs_spark.bench import (
    expand_grid,
    export_results,
    pareto_frontier,
    run_sweep,
)


def test_expand_grid():
    g = expand_grid({"a": [1, 2], "b": 3})
    assert g == [{"a": 1, "b": 3}, {"a": 2, "b": 3}]
    assert expand_grid({}) == [{}]


def test_sweep_brute_force_exact(spark, vectors_df, queries_df):
    res = run_sweep(spark, vectors_df, queries_df, [
        {"algo": "brute_force", "build": {}, "search": {}},
    ], k=5)
    assert len(res) == 1
    assert res[0]["recall"] == 1.0
    assert res[0]["qps"] > 0 and res[0]["build_s"] >= 0


def test_sweep_grid_and_export(spark, vectors_df, queries_df, tmp_path):
    res = run_sweep(spark, vectors_df, queries_df, [
        {"algo": "ivf_flat", "build": {"n_lists": 8},
         "search": {"n_probes": [1, 8]}},
    ], k=5)
    assert len(res) == 2
    by_probes = {r["search_params"]["n_probes"]: r["recall"] for r in res}
    # probing every list is exact; fewer probes can only lose recall
    assert by_probes[8] == 1.0
    assert 0.0 <= by_probes[1] <= 1.0

    csv_path, json_path = export_results(res, str(tmp_path))
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert {"algo_name", "recall", "qps", "latency",
            "build_time"} <= set(rows[0])
    assert rows[0]["build.n_lists"] == "8"
    assert os.path.exists(json_path)
    assert len(json.load(open(json_path))) == 2


def test_sweep_multiple_algos(spark, vectors_df, queries_df):
    res = run_sweep(spark, vectors_df, queries_df, [
        {"algo": "ivf_pq",
         "build": {"n_lists": 4, "pq_dim": 4, "encode": "residual"},
         "search": {"n_probes": 4, "method": "expr"}},
        {"algo": "cagra", "build": {"graph_degree": 8},
         "search": {"itopk": 16}},
    ], k=3)
    assert [r["algo"] for r in res] == ["ivf_pq", "cagra"]
    for r in res:
        assert 0.0 <= r["recall"] <= 1.0


def test_pareto_frontier():
    res = [
        {"recall": 0.9, "qps": 100.0},
        {"recall": 0.95, "qps": 50.0},
        {"recall": 0.8, "qps": 80.0},   # dominated by the 0.9/100 point
        {"recall": 0.99, "qps": 10.0},
    ]
    front = pareto_frontier(res)
    assert [(r["recall"], r["qps"]) for r in front] == [
        (0.9, 100.0), (0.95, 50.0), (0.99, 10.0)]


def test_sample_trial_respects_bounds():
    import numpy as np

    from cuvs_spark.bench.sweep import sample_trial
    rng = np.random.default_rng(5)
    for _ in range(50):
        t = sample_trial("ivf_flat", rng)
        assert 4 <= t["build"]["n_lists"] <= 256
        # dependent bound: n_probes capped by the sampled n_lists
        assert 1 <= t["search"]["n_probes"] <= t["build"]["n_lists"]
    t = sample_trial("ivf_pq", rng)
    assert t["build"]["encode"] in ("raw", "residual")


def test_tune_random_search(spark, vectors_df, queries_df):
    from cuvs_spark.bench.sweep import tune
    out = tune(spark, vectors_df, queries_df, "ivf_flat", n_trials=3,
               k=5, seed=1, target_recall=0.5)
    assert len(out["trials"]) == 3
    assert out["best"] in out["trials"]
    assert out["best"]["recall"] >= max(
        min(t["recall"] for t in out["trials"]), 0.0)
    # determinism of the sampled space
    out2 = tune(spark, vectors_df, queries_df, "ivf_flat", n_trials=3,
                k=5, seed=1, target_recall=0.5)
    assert [t["build_params"] for t in out2["trials"]] == \
        [t["build_params"] for t in out["trials"]]


def test_every_backend_runs(spark, vectors_df, queries_df):
    """Each registry backend must build and search with its default
    params — catches signature drift between the sweep harness and the
    underlying operators."""
    from cuvs_spark.bench.sweep import BACKENDS, run_sweep
    configs = [{"algo": name, "build": {}, "search": {}}
               for name in BACKENDS]
    res = run_sweep(spark, vectors_df, queries_df, configs, k=3)
    assert len(res) == len(BACKENDS)
    for r in res:
        assert 0.0 <= r["recall"] <= 1.0, r["algo"]
        assert r["qps"] > 0, r["algo"]
