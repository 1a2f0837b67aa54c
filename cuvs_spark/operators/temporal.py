"""Temporal joins: as-of and bounded range joins over event streams.

The reference engine ships no temporal join (its domain is vector
search); these are the event-table operators a training-data /
analytics pipeline needs (BASELINE.json north-star: event processing).
DuckDB's native ``ASOF JOIN`` serves as the oracle for the as-of gate.

Scale shapes:

* ``asof_join`` — the classic distributed as-of: union both sides into
  one frame, hash-partition by the ``by`` key, sort within partition by
  (time, side), and propagate the latest right-side payload with a
  running ``last(..., ignorenulls)`` window. ONE shuffle on the key, a
  single window scan, no join explosion — at 100 TB this is a merge of
  two key-partitioned sorted streams, which is exactly what
  AQE/Tungsten will execute. (A naive ``l.ts >= r.ts`` theta-join is a
  per-key cartesian and dies at scale.)
* ``range_self_join`` — bounded-interval pairing: bucket time into
  ``max_dt``-wide bins and equi-join on (key, bin) x (bin-1, bin, +1),
  then filter to the exact bound. Candidate cost tracks real pair
  density (each row meets only its 3 neighboring buckets), never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str = "ts", by: str | None = None,
              tolerance: float | None = None,
              left_prefix: str = "", right_prefix: str = "r_",
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` (inclusive; ``direction="forward"`` flips
    to the earliest ``right.on >= left.on``).

    ``tolerance`` (seconds) nulls the match when the right row is
    farther than that from the left timestamp. Right payload columns
    (everything but ``on``/``by``) come back prefixed with
    ``right_prefix``. Ties inside the right table on (by, on) are
    broken toward the greater payload struct (deterministic both
    engines; pre-aggregate the right side if you need another rule).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    keys = [by] if by else []
    payload = [c for c in right.columns if c not in keys + [on]]
    l = left.withColumn("_side", F.lit(1)).withColumn("_pay", F.lit(None).cast(
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}"
            for c in payload) + ">"))
    r = (right.withColumn("_side", F.lit(0))
              .withColumn("_pay", F.struct(*payload)))
    lc = [c for c in left.columns]
    both = (l.select(*lc, "_side", "_pay")
             .unionByName(r.select(*[F.col(c) for c in keys],
                                   F.col(on),
                                   *[F.lit(None).cast(left.schema[c].dataType)
                                     .alias(c) for c in lc
                                     if c not in keys + [on]],
                                   "_side", "_pay")))
    order = [F.col(on).asc(), F.col("_side").asc(), F.col("_pay").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("_side").asc(),
                 F.col("_pay").desc()]
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    matched = (both
               .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
               .withColumn("_mt", F.last(
                   F.when(F.col("_side") == 0, F.col(on)),
                   ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    if tolerance is not None:
        gap = F.abs(F.col(on).cast("double") - F.col("_mt").cast("double"))
        matched = (matched
                   .withColumn("_m", F.when(gap <= tolerance, F.col("_m")))
                   .withColumn("_mt", F.when(gap <= tolerance, F.col("_mt"))))
    out = matched.select(
        *[F.col(c).alias(left_prefix + c) for c in lc],
        F.col("_mt").alias(right_prefix + on),
        *[F.col(f"_m.{c}").alias(right_prefix + c) for c in payload])
    return out


def asof_join_sql(left_sql: str, right_sql: str, *, on: str = "ts",
                  by: str | None = None, right_cols: list[str],
                  left_cols: list[str],
                  tolerance: float | None = None,
                  right_prefix: str = "r_",
                  direction: str = "backward") -> str:
    """DuckDB oracle via native ``ASOF LEFT JOIN``. The right subquery
    must be unique on (by, on) — pre-aggregate to guarantee it (DuckDB
    leaves exact-tie winners undefined otherwise).
    ``direction="forward"`` matches the earliest right row at-or-after
    the left timestamp (DuckDB ASOF accepts ``<=``)."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    cmp = ">=" if direction == "backward" else "<="
    key_eq = f"l.{by} = r.{by} AND " if by else ""
    lc = ", ".join(f"l.{c} AS {c}" for c in left_cols)
    rc = ", ".join(f"r.{c} AS {right_prefix}{c}" for c in [on] + right_cols)
    sql = f"""
WITH l AS ({left_sql}), r AS ({right_sql})
SELECT {lc}, {rc}
FROM l ASOF LEFT JOIN r ON {key_eq}l.{on} {cmp} r.{on}
"""
    if tolerance is not None:
        # ASOF has no tolerance clause: null out far matches in a wrapper
        gap = (f"epoch({on}) - epoch({right_prefix}{on})"
               if direction == "backward"
               else f"epoch({right_prefix}{on}) - epoch({on})")
        cols = ", ".join(left_cols)
        rcols = ", ".join(
            f"CASE WHEN {gap} <= "
            f"{tolerance} THEN {right_prefix}{c} END AS {right_prefix}{c}"
            for c in [on] + right_cols)
        sql = f"SELECT {cols}, {rcols} FROM ({sql.strip()})"
    return sql


def range_self_join(df: DataFrame, *, on: str = "ts",
                    by: str | None = None, max_dt: float = 300.0,
                    id_col: str = "event_id") -> DataFrame:
    """All pairs (a, b) with ``a.id < b.id``, same ``by`` key, and
    ``|a.on - b.on| <= max_dt`` seconds → ``(a_id, b_id, dt_s)``.

    Bucketed band join: each row lands in bucket floor(epoch/max_dt)
    and probes buckets {b-1, b, b+1}; the exact predicate filters the
    3-bucket candidates. No per-key cartesian."""
    keys = [by] if by else []
    e = F.col(on).cast("double")
    a = df.select(*keys, F.col(id_col).alias("a_id"), e.alias("_ta"),
                  F.floor(e / max_dt).alias("_b"))
    b = (df.select(*keys, F.col(id_col).alias("b_id"), e.alias("_tb"),
                   F.floor(e / max_dt).alias("_b0"))
           .withColumn("_b", F.explode(F.array(
               F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1))))
    pairs = (a.join(b, keys + ["_b"])
              .filter((F.col("a_id") < F.col("b_id"))
                      & (F.abs(F.col("_ta") - F.col("_tb")) <= max_dt)))
    # each pair matches exactly one (a-bucket, b-exploded-bucket) value,
    # so no dedup shuffle is needed
    return pairs.select(*keys, "a_id", "b_id",
                        (F.col("_tb") - F.col("_ta")).alias("dt_s"))


def range_self_join_sql(df_sql: str, *, on: str = "ts",
                        by: str | None = None, max_dt: float = 300.0,
                        id_col: str = "event_id") -> str:
    key_eq = f"a.{by} = b.{by} AND " if by else ""
    keys = f"a.{by} AS {by}, " if by else ""
    return f"""
WITH d AS ({df_sql})
SELECT {keys}a.{id_col} AS a_id, b.{id_col} AS b_id,
       epoch(b.{on}) - epoch(a.{on}) AS dt_s
FROM d a JOIN d b
  ON {key_eq}a.{id_col} < b.{id_col}
 AND abs(epoch(a.{on}) - epoch(b.{on})) <= {max_dt}
"""
