"""Scale probe for the temporal joins: 10⁶-row synthetic event streams
(100× the sf0.1 events table) through asof_join and range_self_join.

Validates the 100 TB claims empirically: the as-of join must cost one
shuffle + one window scan (runtime ~linear in rows), and the range join's
candidate count must track pair density (3-bucket band), not n². Writes
/tmp only; not part of the gate.

Usage: python tools/temporal_scale_probe.py [n_events] [n_users]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    users = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    import pandas as pd
    from pyspark.sql import functions as F

    from cuvs_spark import get_spark
    from cuvs_spark.operators.temporal import asof_join, range_self_join

    spark = get_spark("temporal_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/temporal_probe_{n}.parquet"
    if not os.path.exists(path):
        rng = np.random.default_rng(11)
        ts = np.sort(rng.uniform(0, 30 * 86400, n))  # one month, seconds
        pdf = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "ts": pd.to_datetime(ts, unit="s",
                                 origin=pd.Timestamp("2024-01-01")),
            "value": rng.uniform(0, 100, n),
            "is_click": rng.random(n) < 0.1,
        })
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)

    ev = spark.read.parquet(path).repartition(32).cache()
    ev.count()
    out = {"n_events": n, "n_users": users}

    left = ev.select("event_id", "user_id", "ts", "value")
    right = (ev.filter("is_click")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("click_value")))
    t0 = time.time()
    res = asof_join(left, right, on="ts", by="user_id", tolerance=86400.0)
    matched = res.filter(F.col("r_click_value").isNotNull()).count()
    out["asof_s"] = round(time.time() - t0, 2)
    out["asof_matched"] = matched

    # keyless as-of at scale (round 9): the distributed ranged scan —
    # range partition on ts + broadcast carry-in — instead of the
    # guarded single-partition window (global "latest feed value"
    # attribution, no by= key exists)
    kright = (ev.filter("is_click")
                .groupBy("ts").agg(F.max("value").alias("click_value")))
    t0 = time.time()
    kres = asof_join(left.select("event_id", "ts", "value"), kright,
                     on="ts", keyless_partitions=64)
    out["asof_keyless_matched"] = kres.filter(
        F.col("r_click_value").isNotNull()).count()
    out["asof_keyless_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = range_self_join(ev.select("event_id", "user_id", "ts"),
                            by="user_id", max_dt=300.0)
    out["range_pairs"] = pairs.count()
    out["range_s"] = round(time.time() - t0, 2)

    # round-8 analytics family: one key shuffle each — must stay
    # ~linear in rows like the joins above
    from cuvs_spark.operators.temporal import (
        burst_windows,
        gap_stats,
        retention_cohort,
    )
    t0 = time.time()
    out["gap_users"] = gap_stats(
        ev.select("event_id", "user_id", "ts")).count()
    out["gap_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["cohort_cells"] = retention_cohort(
        ev.select("user_id", "ts")).count()
    out["cohort_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    b = burst_windows(ev.select("ts")).cache()
    out["burst_buckets"] = b.count()
    out["burst_flagged"] = b.filter("is_burst = 1").count()
    out["burst_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
