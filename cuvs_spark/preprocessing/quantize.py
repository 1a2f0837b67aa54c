"""Scalar and binary quantizers (SURVEY.md §2.2).

Reference: ``python/cuvs/cuvs/preprocessing/quantize/scalar.pyx:75,125,186``
(train fits min/max at ``quantile``, transform maps float→int8
linearly, inverse_transform maps back) and ``binary.pyx:21`` (threshold
each dim to one bit, pack to uint8 — feeds BitwiseHamming).

All map-only JVM expressions. Rounding uses ``floor(x + 0.5)`` so the
Spark and DuckDB oracles agree bit-for-bit (their ``round()`` builtins
differ on .5 ties).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ScalarQuantizerParams:
    qmin: float
    qmax: float


def scalar_train(df: DataFrame, *, vec_col: str = "vec",
                 quantile: float = 0.99) -> ScalarQuantizerParams:
    """Fit [qmin, qmax] at the (1±quantile)/2 tails over *all* elements
    (scalar.pyx:19-27). One pass: explode + exact percentile."""
    lo, hi = (1.0 - quantile) / 2.0, 1.0 - (1.0 - quantile) / 2.0
    row = (df.select(F.explode(vec_col).alias("x"))
           .agg(F.expr(f"percentile(x, {lo})").alias("qmin"),
                F.expr(f"percentile(x, {hi})").alias("qmax"))).head()
    return ScalarQuantizerParams(float(row["qmin"]), float(row["qmax"]))


# int8 mapping: clamp to [qmin,qmax], scale to [-128, 127]
_SQ_SPARK = ("transform({v}, x -> CAST(floor((least(greatest(CAST(x AS DOUBLE), "
             "{lo}), {hi}) - {lo}) / ({hi} - {lo}) * 255.0 + 0.5) - 128 AS INT))")
_SQ_DUCK = ("list_transform({v}, x -> CAST(floor((least(greatest(CAST(x AS DOUBLE), "
            "{lo}), {hi}) - {lo}) / ({hi} - {lo}) * 255.0 + 0.5) - 128 AS INT))")
_ISQ_SPARK = ("transform({c}, q -> CAST({lo} + (CAST(q AS DOUBLE) + 128.0) * "
              "({hi} - {lo}) / 255.0 AS FLOAT))")
_ISQ_DUCK = ("list_transform({c}, q -> CAST({lo} + (CAST(q AS DOUBLE) + 128.0) * "
             "({hi} - {lo}) / 255.0 AS FLOAT))")


def scalar_transform(df: DataFrame, params: ScalarQuantizerParams, *,
                     vec_col: str = "vec",
                     out_col: str = "codes") -> DataFrame:
    e = _SQ_SPARK.format(v=vec_col, lo=repr(params.qmin), hi=repr(params.qmax))
    return df.withColumn(out_col, F.expr(e))


def scalar_transform_sql(v: str, qmin: float, qmax: float) -> str:
    return _SQ_DUCK.format(v=v, lo=repr(qmin), hi=repr(qmax))


def scalar_inverse_transform(df: DataFrame, params: ScalarQuantizerParams, *,
                             codes_col: str = "codes",
                             out_col: str = "vec") -> DataFrame:
    e = _ISQ_SPARK.format(c=codes_col, lo=repr(params.qmin),
                          hi=repr(params.qmax))
    return df.withColumn(out_col, F.expr(e))


def scalar_inverse_transform_sql(c: str, qmin: float, qmax: float) -> str:
    return _ISQ_DUCK.format(c=c, lo=repr(qmin), hi=repr(qmax))


# binary: bit i of byte b = (vec[8b+i] > threshold); packed little-endian
# per byte, matching the reference's uint8 packing (binary.pyx:21)
_BQ_SPARK = (
    "transform(sequence(0, CAST(ceil(size({v}) / 8.0) AS INT) - 1, 1), "
    "b -> aggregate(sequence(0, 7), 0, (acc, i) -> acc + "
    "CASE WHEN 8 * b + i < size({v}) "
    "AND CAST(element_at({v}, 8 * b + i + 1) AS DOUBLE) > {thr} "
    "THEN CAST(pow(2, i) AS INT) ELSE 0 END))")
_BQ_DUCK = (
    "list_transform(range(0, CAST(ceil(len({v}) / 8.0) AS INT)), "
    "b -> list_reduce(list_prepend(0, list_transform(range(0, 8), i -> "
    "CASE WHEN 8 * b + i < len({v}) "
    "AND CAST({v}[CAST(8 * b + i + 1 AS INT)] AS DOUBLE) > {thr} "
    "THEN CAST(pow(2, i) AS INT) ELSE 0 END)), (acc, x) -> acc + x))")


def binary_quantize(df: DataFrame, *, vec_col: str = "vec",
                    threshold: float = 0.0,
                    out_col: str = "bits") -> DataFrame:
    """Pack sign bits into uint8-valued ints (``array<int>``, one per
     8 dims) for BitwiseHamming search."""
    return df.withColumn(
        out_col, F.expr(_BQ_SPARK.format(v=vec_col, thr=repr(threshold))))


def binary_quantize_sql(v: str, threshold: float = 0.0) -> str:
    return _BQ_DUCK.format(v=v, thr=repr(threshold))
