"""Doctest runner for the pure (non-Spark) helper surface — mirrors the
reference's executable-docstring policy
(``python/cuvs/cuvs/tests/test_doctests.py``). SQL-template builders
are pure string functions, so their examples run without a session."""

from __future__ import annotations

import doctest

import cuvs_spark.functions.distance as distance_mod
import cuvs_spark.plans.oracle as oracle_mod


def test_distance_module_doctests():
    results = doctest.testmod(distance_mod, verbose=False)
    assert results.failed == 0, results


def test_template_examples():
    """Spot checks that belong in docs: the dual templates render to
    parseable SQL on both dialects."""
    import duckdb

    from cuvs_spark.functions.distance import (
        METRICS,
        distance_sql_duckdb,
        distance_sql_spark,
    )

    con = duckdb.connect()
    for name, md in METRICS.items():
        if name == "haversine":
            sql = distance_sql_duckdb(name, "[0.1, 0.2]", "[0.3, 0.4]")
        elif name == "bitwise_hamming":
            sql = distance_sql_duckdb(name, "[3, 7]::INT[]", "[1, 5]::INT[]")
        else:
            sql = distance_sql_duckdb(
                name, "[0.1, 0.2, 0.3]::FLOAT[]", "[0.3, 0.1, 0.2]::FLOAT[]",
                p=3.0)
        val = con.sql(f"SELECT {sql} AS d").fetchone()[0]
        assert val is not None, name
        spark_sql = distance_sql_spark(name, "a", "b", p=3.0)
        assert "aggregate(" in spark_sql or "asin" in spark_sql, name
