"""As-of and bounded range joins (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from cuvs_spark.operators.temporal import asof_join, range_self_join


def _t(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px): the "right" side of a classic trades/quotes as-of
    rows = [("a", _t(0), 1.0), ("a", _t(10), 2.0), ("a", _t(20), 3.0),
            ("b", _t(5), 10.0)]
    return spark.createDataFrame(rows, "sym string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [("a", _t(9), 1), ("a", _t(10), 2), ("a", _t(25), 3),
            ("b", _t(4), 4), ("c", _t(7), 5)]
    return spark.createDataFrame(rows, "sym string, ts timestamp, tid int")


def test_asof_backward(spark, trades, quotes):
    out = {r["tid"]: r for r in
           asof_join(trades, quotes, on="ts", by="sym").collect()}
    assert out[1]["r_px"] == 1.0          # t=9 -> quote at 0
    assert out[2]["r_px"] == 2.0          # t=10 -> equal ts is inclusive
    assert out[3]["r_px"] == 3.0          # t=25 -> quote at 20
    assert out[4]["r_px"] is None         # b at t=4 precedes b's quote
    assert out[5]["r_px"] is None         # key with no right rows


def test_asof_forward(spark, trades, quotes):
    out = {r["tid"]: r for r in
           asof_join(trades, quotes, on="ts", by="sym",
                     direction="forward").collect()}
    assert out[1]["r_px"] == 2.0          # t=9 -> next quote at 10
    assert out[2]["r_px"] == 2.0          # equal ts inclusive
    assert out[3]["r_px"] is None         # nothing after t=25
    assert out[4]["r_px"] == 10.0         # b t=4 -> quote at 5


def test_asof_tolerance(spark, trades, quotes):
    out = {r["tid"]: r for r in
           asof_join(trades, quotes, on="ts", by="sym",
                     tolerance=5.0).collect()}
    assert out[1]["r_px"] is None         # gap 9 > 5
    assert out[2]["r_px"] == 2.0          # gap 0
    assert out[3]["r_px"] == 3.0          # gap 5 inclusive


def test_range_self_join_matches_bruteforce(spark):
    import itertools
    # includes cross-bucket pairs (290 vs 310 straddles the 300 s bin)
    rows = [(i, i % 2, _t(s)) for i, s in enumerate(
        [0, 5, 290, 295, 310, 315, 900, 905])]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "ts timestamp")
    got = {(r["a_id"], r["b_id"]) for r in
           range_self_join(df, by="user_id", max_dt=300.0).collect()}
    want = {(a[0], b[0]) for a, b in itertools.combinations(rows, 2)
            if a[1] == b[1] and abs((a[2] - b[2]).total_seconds()) <= 300}
    assert got == want and got  # non-empty


def test_range_join_no_cartesian(spark):
    from cuvs_spark.plans.layout import plan_string
    rows = [(i, 0, _t(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "ts timestamp")
    plan = plan_string(range_self_join(df, by="user_id", max_dt=10.0))
    assert "CartesianProduct" not in plan


def test_asof_single_shuffle(spark, trades, quotes):
    # ONE exchange (the key hash-partition for the window) — the plan
    # must never degrade to a per-key theta-join / cartesian
    from cuvs_spark.plans.layout import count_exchanges, plan_string
    out = asof_join(trades, quotes, on="ts", by="sym")
    shuffles, _ = count_exchanges(out)
    assert shuffles == 1
    assert "CartesianProduct" not in plan_string(out)


def test_asof_tie_break_greater_payload_both_directions(spark):
    """Two right rows at the SAME matching timestamp: the documented
    rule (greater payload struct wins) must hold in both scan
    directions — the forward path used to pick the smaller one."""
    import datetime as dt
    from cuvs_spark.operators.temporal import asof_join
    UTC = dt.timezone.utc
    t = dt.datetime(2024, 1, 1, 12, tzinfo=UTC)
    left = spark.createDataFrame([(1, 1, t)],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t, 5.0), (1, t, 9.0)],
        "user_id long, ts timestamp, v double")
    for direction in ("backward", "forward"):
        out = asof_join(left, right, on="ts", by="user_id",
                        direction=direction).collect()
        assert out[0]["r_v"] == 9.0, direction
