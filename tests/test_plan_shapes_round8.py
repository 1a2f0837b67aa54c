"""Plan-shape pins for the round-8 wave-2/3/4 operators: the scale
claims in the docstrings, asserted against the physical plans."""
from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(i, i % 5, dt.datetime(2024, 1, 1, i % 24, i % 60, tzinfo=UTC))
         for i in range(200)],
        "event_id long, user_id long, ts timestamp")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma delta", "en" if i % 2 else "de")
         for i in range(40)],
        "doc_id long, text string, lang string")


def _exchanges(plan: str) -> int:
    # count tree nodes, not detail-section repeats
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_gap_stats_single_exchange(spark, events):
    """The docstring claim: the per-user rollup reuses the window's
    hash partitioning — ONE exchange total."""
    from cuvs_spark.operators.temporal import gap_stats
    from cuvs_spark.plans.layout import plan_string
    p = plan_string(gap_stats(events))
    assert _exchanges(p) == 1
    assert "CartesianProduct" not in p


def test_round8_family_no_cartesian(spark, events, docs):
    from cuvs_spark.operators.temporal import burst_windows, retention_cohort
    from cuvs_spark.pipeline.classify import chi2_terms
    from cuvs_spark.pipeline.dedup import edit_distance_pairs
    from cuvs_spark.pipeline.text import fertility_by_group
    from cuvs_spark.plans.layout import plan_string
    from cuvs_spark.stats.metrics import (
        cosine_pair_histogram,
        hubness_moments,
        rank_auc,
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(40)],
        "id long, vec array<float>")
    g = spark.createDataFrame([(0, 1), (1, 0), (1, 2)],
                              "src long, dst long")
    for df in (retention_cohort(events),
               burst_windows(events),
               chi2_terms(docs, "lang = 'en'", 10),
               rank_auc(docs.selectExpr("doc_id AS s", "lang"),
                        "s", "lang = 'en'"),
               cosine_pair_histogram(emb, n_buckets=8),
               hubness_moments(g),
               fertility_by_group(docs),
               edit_distance_pairs(docs, 0.2, jaccard_floor=0.1)):
        p = plan_string(df)
        assert "CartesianProduct" not in p


def test_importance_sample_is_map_only_with_broadcast_scalar(spark, docs):
    """w_max rides a broadcast; the filter itself adds no shuffle of
    the data side (the only exchange is inside the scalar agg)."""
    from cuvs_spark.pipeline.sampling import importance_weighted_sample
    from cuvs_spark.plans.layout import plan_string
    p = plan_string(importance_weighted_sample(
        docs.selectExpr("doc_id", "length(text) AS w"), "w"))
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_hubness_degree_conservation(spark, rng):
    """Σ in-degree == #edges on any graph (the moment pipeline drops
    nothing, including zero-degree source-only nodes)."""
    from cuvs_spark.stats.metrics import hubness_moments
    edges = [(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
             for _ in range(150)]
    g = spark.createDataFrame(edges, "src long, dst long")
    row = hubness_moments(g).collect()[0]
    srcs = {a for a, _ in edges}
    in_from_srcs = sum(1 for _, b in edges if b in srcs)
    assert row.sum_deg == in_from_srcs


def test_burst_windows_counts_conserved(spark, events):
    """Window counts sum back to the event count."""
    from cuvs_spark.operators.temporal import burst_windows
    got = burst_windows(events).agg(F.sum("n_events")).collect()[0][0]
    assert got == events.count()
