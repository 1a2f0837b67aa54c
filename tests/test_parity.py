"""THE core invariant, tested directly: for every metric, the Spark
expression and the DuckDB template produce bit-identical doubles on
random vectors (exact_parity metrics) or agree to 1e-12 (libm-based
ones). The whole oracle gate rests on this."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from cuvs_spark.functions.distance import (
    METRICS,
    distance_sql_duckdb,
    distance_sql_spark,
)

N_PAIRS, DIM = 24, 12


@pytest.fixture(scope="module")
def pairs(spark, rng):
    A = rng.random((N_PAIRS, DIM)).astype(np.float32) - 0.5
    B = rng.random((N_PAIRS, DIM)).astype(np.float32) - 0.5
    rows = [(i, [float(x) for x in A[i]], [float(y) for y in B[i]])
            for i in range(N_PAIRS)]
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (i BIGINT, a FLOAT[], b FLOAT[])")
    for i in range(N_PAIRS):
        con.execute("INSERT INTO pairs VALUES (?, ?, ?)",
                    [i, [float(x) for x in A[i]], [float(y) for y in B[i]]])
    return df.cache(), con


_CANON = sorted({md.name for md in METRICS.values()}
                - {"haversine", "bitwise_hamming"})


@pytest.mark.parametrize("metric", _CANON)
def test_bit_parity(pairs, metric):
    from pyspark.sql import functions as F
    df, con = pairs
    md = METRICS[metric]
    got_s = {r["i"]: r["d"] for r in df.select(
        "i", F.expr(distance_sql_spark(metric, "a", "b", p=3.0)).alias("d"))
        .collect()}
    got_d = dict(con.sql(
        f"SELECT i, {distance_sql_duckdb(metric, 'a', 'b', p=3.0)} AS d "
        f"FROM pairs").fetchall())
    for i in range(N_PAIRS):
        s, d = got_s[i], got_d[i]
        if s is None or d is None or (np.isnan(s) and np.isnan(d)):
            continue
        if md.exact_parity:
            assert s == d, (metric, i, s, d, s - d)
        else:
            assert s == pytest.approx(d, rel=1e-12, abs=1e-12), (metric, i)


def test_bitwise_hamming_parity(pairs, spark):
    from pyspark.sql import functions as F
    _, con = pairs
    a, b = [3, 255, 12], [1, 0, 12]
    df = spark.createDataFrame([(a, b)], "a array<int>, b array<int>")
    s = df.select(F.expr(
        distance_sql_spark("bitwise_hamming", "a", "b")).alias("d")).head()["d"]
    d = con.sql(
        "SELECT " + distance_sql_duckdb("bitwise_hamming",
                                        "[3, 255, 12]::INT[]",
                                        "[1, 0, 12]::INT[]")).fetchone()[0]
    assert s == d == 9.0  # bit_count(2) + bit_count(255) + 0
