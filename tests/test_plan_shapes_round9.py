"""Plan-shape pins for the round-9 surfaces: the keyless ranged as-of
must execute with zero single-partition stages, and the new gate
compositions must stay free of cartesian products."""
from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _ts(t):
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=t)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [(i, _ts(i * 3)) for i in range(100)], "lid long, ts timestamp")
    right = spark.createDataFrame(
        [(j, _ts(j * 11), j) for j in range(30)],
        "rid long, ts timestamp, v long")
    return left, right


def test_keyless_ranged_asof_has_no_single_partition_stage(spark,
                                                           asof_frames):
    """The point of keyless_partitions: the executed plan (downstream
    of the pinned range-partitioned checkpoint) runs the window hash-
    partitioned by the range-partition id and repairs boundaries with
    a broadcast — no SinglePartition exchange, no unpartitioned
    window, no cartesian product."""
    from cuvs_spark.operators.temporal import asof_join
    from cuvs_spark.plans.layout import plan_string
    left, right = asof_frames
    out = asof_join(left, right, keyless_partitions=8)
    p = plan_string(out)
    assert "SinglePartition" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoop" in p


def test_keyless_default_asof_is_single_partition_by_contract(
        spark, asof_frames):
    """The documented default: without keyless_partitions the global
    merge-scan IS a single-partition window (what max_keyless_rows
    guards). Pinning it keeps the docstring honest if the
    implementation changes."""
    from cuvs_spark.operators.temporal import asof_join
    from cuvs_spark.plans.layout import plan_string
    left, right = asof_frames
    p = plan_string(asof_join(left, right, max_keyless_rows=None))
    assert "SinglePartition" in p


def test_rate_monitor_flag_window_runs_over_counts(spark, tmp_path):
    """The per-epoch flag stage windows over the per-BUCKET counts
    table (rows = time span / window_s), never the raw events: the
    unpartitioned RANGE frame sits strictly downstream of the bucket
    groupBy in the plan."""
    from cuvs_spark.plans.layout import plan_string
    from cuvs_spark.streaming.rate_monitor import burst_batch_against_state
    b = spark.createDataFrame(
        [(_ts(h * 3600 + m),) for h in range(4) for m in range(5)],
        "ts timestamp")
    flags = burst_batch_against_state(b, str(tmp_path / "st"), 0)
    p = plan_string(flags)
    assert "CartesianProduct" not in p
    # the window's input is the COMMITTED counts table (a parquet scan
    # of state_dir/counts/v=<epoch> — the bucket aggregation ran and
    # was materialized in the commit job), and the raw event rows
    # enter only as the bucket semi-join side via the checkpointed RDD
    assert "Scan parquet" in p
    assert "LeftSemi" in p


def test_dispatch_gate_plan_is_rank_then_partial_agg(spark):
    """dispatch summary = one rank window over the queue + a
    map-side-combined groupBy on the dispatch id; no join at all."""
    import sys
    sys.path.insert(0, "/root/repo")
    from cuvs_spark.entry_queries import QUERIES
    from cuvs_spark.plans.layout import plan_string
    df = QUERIES["dynamic_batching_dispatch"](spark,
                                              "/root/testdata/sf0.001")
    p = plan_string(df)
    assert "Join" not in p and "CartesianProduct" not in p
    assert len(re.findall(r"\(\d+\) Window", p)) == 1
