"""DuckDB oracle-SQL generators.

Each operator's ``queries()`` entry in ``__spark_entry__`` pairs with an
ANSI-SQL string produced here, built from the *same* distance templates
as the Spark expressions (``functions/distance.py``) so double-precision
results are bit-identical and the driver's value-hash comparison passes
exactly — no tolerance games.
"""

from __future__ import annotations

from cuvs_spark.functions.distance import distance_sql_duckdb, is_min_close


def knn_sql(dataset_sql: str, queries_sql: str, k: int, metric: str,
            *, with_distance: bool = True, pair_where: str | None = None,
            p: float = 2.0) -> str:
    """Oracle for brute-force kNN: cross join + window top-k.

    ``dataset_sql``/``queries_sql`` are subqueries yielding
    ``(nid, dv)`` / ``(qid, qv)``.
    """
    order = "ASC" if is_min_close(metric) else "DESC"
    dist = distance_sql_duckdb(metric, "q.qv", "d.dv", p)
    where = f"WHERE {pair_where}" if pair_where else ""
    cols = "qid, nid, distance, rank" if with_distance else "qid, nid, rank"
    return f"""
WITH d AS ({dataset_sql}),
q AS ({queries_sql}),
pairs AS (
  SELECT q.qid AS qid, d.nid AS nid, {dist} AS distance
  FROM q CROSS JOIN d {where}
),
ranked AS (
  SELECT qid, nid, distance,
         row_number() OVER (PARTITION BY qid ORDER BY distance {order}, nid ASC) AS rank
  FROM pairs
)
SELECT {cols} FROM ranked WHERE rank <= {k}
"""


def pairwise_sql(x_sql: str, y_sql: str, metric: str, p: float = 2.0) -> str:
    dist = distance_sql_duckdb(metric, "a.xa", "b.xb", p)
    return f"""
WITH a AS ({x_sql}), b AS ({y_sql})
SELECT a.i AS i, b.j AS j, {dist} AS distance FROM a CROSS JOIN b
"""


def eps_sql(x_sql: str, y_sql: str, eps: float, metric: str) -> str:
    return f"""
WITH a AS ({x_sql}), b AS ({y_sql}),
pairs AS (SELECT a.i AS i, b.j AS j,
  {distance_sql_duckdb(metric, 'a.xa', 'b.xb')} AS distance
  FROM a CROSS JOIN b)
SELECT i, j, distance FROM pairs WHERE distance <= {eps}
"""


def kde_sql(dataset_sql: str, queries_sql: str, bandwidth: float,
            kernel_template: str, metric: str) -> str:
    dist = distance_sql_duckdb(metric, "q.qv", "d.dv")
    u = f"(({dist}) / CAST({bandwidth} AS DOUBLE))"
    kern = kernel_template.format(u=u)
    # group-sum order is engine-dependent → round to 6 dp on both sides
    return f"""
WITH d AS ({dataset_sql}), q AS ({queries_sql})
SELECT q.qid AS qid, ROUND(CAST(sum({kern}) AS DOUBLE), 6) AS density
FROM q CROSS JOIN d GROUP BY q.qid
"""
