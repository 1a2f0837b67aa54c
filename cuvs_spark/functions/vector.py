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


def truncate_dims(col, dims: int) -> Column:
    """Matryoshka truncation: keep the first ``dims`` components.

    MRL-trained embeddings (Kusupati et al. 2022) nest coarse
    representations in their prefix, so serving pipelines search the
    truncated prefix (cheaper distance folds, smaller IVF lists) and
    optionally re-rank with the full vector — the same
    prune-then-refine shape as ``operators/pairwise.refine``. Pure
    JVM ``slice``; pair with ``stats.recall_score`` to measure the
    retrieval cost of a given prefix length (the
    ``stats_recall_matryoshka`` gate does exactly that)."""
    return F.expr(f"slice({_sql(col)}, 1, {int(dims)})")
