"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cuvs_spark/``; this module only wires
operators to testdata tables and generates the matching DuckDB oracle
SQL from the same expression templates (bit-exact parity — see
``cuvs_spark/plans/oracle.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_spark.entry_queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact top-10 cosine neighbors of the first 20
    embedding vectors against the full embeddings table (sf0.001)."""
    return QUERIES["knn_bf_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
