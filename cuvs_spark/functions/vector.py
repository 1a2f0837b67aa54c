"""Row-wise vector transforms (SURVEY.md §2.2 — projection surface).

All pure Spark SQL expressions (JVM, no Python), applied with
``df.withColumn``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql(col) -> str:
    return col if isinstance(col, str) else col._jc.toString()


def vector_norm(col, p: int = 2) -> Column:
    """Lp norm of an array<float> column (double)."""
    c = _sql(col)
    if p == 2:
        return F.expr(
            f"sqrt(aggregate({c}, CAST(0 AS DOUBLE), "
            f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    return F.expr(
        f"power(aggregate({c}, CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + power(abs(CAST(v AS DOUBLE)), {p})), 1.0 / {p})")


def l2_normalize(col, eps: float = 1e-12) -> Column:
    """Unit-normalize (the implicit step of cosine pipelines,
    reference ``distance.hpp:26``)."""
    c = _sql(col)
    return F.expr(
        f"transform({c}, v -> CAST(CAST(v AS DOUBLE) / greatest(sqrt("
        f"aggregate({c}, CAST(0 AS DOUBLE), "
        f"(acc, u) -> acc + CAST(u AS DOUBLE) * CAST(u AS DOUBLE))), "
        f"CAST({eps} AS DOUBLE)) AS FLOAT))")
