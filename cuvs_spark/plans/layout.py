"""Physical layout helpers — the partitioning discipline that makes the
engine's joins cheap at 100 TB (SURVEY.md §4).

The reference's performance comes from data layout (inverted lists,
graph adjacency on-device); ours comes from the Spark equivalents:

* ``partitionBy(list_id)`` parquet for IVF tables → file-level pruning
  (done in ``sources/index_store.py``);
* **bucketing** for repeated equi-joins: two tables bucketed on the
  same key/count co-locate, so joins/self-joins run with NO exchange —
  the Spark analog of the reference's ``mg`` sharded clique, where each
  GPU owns a shard and merges results (``snmg.cuh:248``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32,
                   *, sort_by: str | None = None) -> None:
    """Persist as a bucketed managed table; subsequent joins on ``key``
    between tables bucketed (key, n_buckets)-compatibly skip the
    shuffle entirely."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the
    assertion hook for co-location tests."""
    import re

    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # shuffle exchanges print as "+- Exchange (N"; broadcast exchanges
    # as "BroadcastExchange" — only the former is a shuffle
    return re.search(r"[+:]- Exchange \(", plan) is not None


def plan_string(df: DataFrame) -> str:
    """Formatted physical plan text — for plan-shape assertions (e.g.
    "this join must never be a CartesianProduct")."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def count_exchanges(df: DataFrame) -> tuple[int, int]:
    """(shuffle_exchanges, broadcast_exchanges) in the physical plan —
    the budget hook for plan-shape regression tests."""
    import re

    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    return (len(re.findall(r"[+:]- Exchange \(", plan)),
            len(re.findall(r"BroadcastExchange", plan)))
