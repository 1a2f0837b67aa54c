"""Gram / kernel matrices (SURVEY.md §2.3).

Reference: ``cpp/include/cuvs/distance/grammian.hpp`` with kernel types
LINEAR, POLYNOMIAL, RBF, TANH (``distance.hpp:103``);
impl ``cpp/src/distance/detail/kernels/``.

Same cross-join expression family as pairwise_distance: the kernel is a
closed-form scalar over the dot product / squared distance, evaluated
JVM-side. LINEAR and integer-degree POLYNOMIAL are oracle-exact (pure
product folds); RBF/TANH use exp (libm, not correctly rounded) so their
oracle outputs round to 9 dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import distance_sql_duckdb, distance_sql_spark


def _kernel_expr(kernel: str, dot: str, sq: str, *, gamma: float,
                 coef0: float, degree: int) -> str:
    if kernel == "linear":
        return dot
    if kernel == "polynomial":
        base = f"({gamma!r} * ({dot}) + {coef0!r})"
        if float(degree) == int(degree) and 1 <= int(degree) <= 16:
            # Integer power as a repeated-multiplication product fold:
            # bit-exact across engines (libm pow is not correctly rounded
            # and a ~1-ulp divergence can flip a rounding midpoint —
            # observed as the r3 gram_polynomial driver hash mismatch).
            return "(" + " * ".join([base] * int(degree)) + ")"
        return f"power({base}, {degree})"
    if kernel == "rbf":
        return f"exp(-{gamma!r} * ({sq}))"
    if kernel == "tanh":
        return f"tanh({gamma!r} * ({dot}) + {coef0!r})"
    raise ValueError(kernel)


def gram_matrix(X: DataFrame, Y: DataFrame | None = None,
                kernel: str = "linear", *, gamma: float = 1.0,
                coef0: float = 0.0, degree: int = 3,
                x_id: str = "id", x_vec: str = "vec",
                y_id: str = "id", y_vec: str = "vec",
                ndigits: int | None = None) -> DataFrame:
    """Kernel Gram matrix in long form ``(i, j, k)``."""
    a = X.select(F.col(x_id).cast("long").alias("i"), F.col(x_vec).alias("_xa"))
    yy = X if Y is None else Y
    b = yy.select(F.col(y_id).cast("long").alias("j"), F.col(y_vec).alias("_xb"))
    dot = distance_sql_spark("inner_product", "_xa", "_xb")
    sq = distance_sql_spark("sqeuclidean", "_xa", "_xb")
    expr = _kernel_expr(kernel, dot, sq, gamma=gamma, coef0=coef0,
                        degree=degree)
    col = F.expr(expr)
    if ndigits is not None:
        col = F.round(col, ndigits)
    return a.join(F.broadcast(b)).select("i", "j", col.alias("k"))


def gram_matrix_sql(x_sql: str, y_sql: str, kernel: str = "linear", *,
                    gamma: float = 1.0, coef0: float = 0.0, degree: int = 3,
                    ndigits: int | None = None) -> str:
    dot = distance_sql_duckdb("inner_product", "a.xa", "b.xb")
    sq = distance_sql_duckdb("sqeuclidean", "a.xa", "b.xb")
    if kernel == "tanh":
        # DuckDB has no tanh(); the exp identity differs from Java's
        # tanh by ulps only — absorbed by the rounding both sides apply
        u = f"(2.0 * ({gamma!r} * ({dot}) + {coef0!r}))"
        expr = f"((exp({u}) - 1.0) / (exp({u}) + 1.0))"
    else:
        expr = _kernel_expr(kernel, dot, sq, gamma=gamma, coef0=coef0,
                            degree=degree)
    if ndigits is not None:
        expr = f"ROUND({expr}, {ndigits})"
    return f"""
WITH a AS ({x_sql}), b AS ({y_sql})
SELECT a.i AS i, b.j AS j, {expr} AS k FROM a CROSS JOIN b
"""
