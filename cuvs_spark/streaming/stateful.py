"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 — the arbitrary-state surface the task's streaming
story calls for).

``running_user_stats`` keeps one state row per user across
micro-batches: event count, value sum, and the max inter-event gap —
the kind of incremental per-key sketch a tiered-index compaction
policy or an ingestion monitor needs. Batch-mode twin
(``user_stats_batch``) exists for correctness comparison.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, n_events long, total_value double, "
              "max_gap_seconds double")
STATE_SCHEMA = "n long, total double, last_ts double, max_gap double"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total, last_ts, max_gap = (
        state.get if state.exists else (0, 0.0, None, 0.0))
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t = ts.timestamp()
            if last_ts is not None:
                max_gap = max(max_gap, t - last_ts)
            last_ts = t
            n += 1
            total += float(value)
    state.update((n, total, last_ts, max_gap))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 6)],
                        "max_gap_seconds": [round(max_gap, 6)]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """Stateful per-user running stats over a stream of
    ``(user_id, ts, value)`` — emits the updated row per user per
    micro-batch."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(_update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stateful operator (window lag for gaps)."""
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("ts")
    gaps = (events
            .withColumn("_gap", F.col("ts").cast("double")
                        - F.lag(F.col("ts").cast("double")).over(w)))
    return (gaps.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"),
                 F.round(F.coalesce(F.max("_gap"), F.lit(0.0)), 6)
                 .alias("max_gap_seconds")))
