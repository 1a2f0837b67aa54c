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


def _asof_keyless_ranged(both: DataFrame, *, on: str, direction: str,
                         num_partitions: int) -> DataFrame:
    """Distributed keyless as-of scan: range-partition the unioned
    sides on the timestamp, run the running-``last`` window PER RANGE
    PARTITION, and repair rows that precede their partition's first
    right row with a broadcast carry-in — the last right row of any
    earlier partition (computed as one tiny per-partition max + an
    O(num_partitions) driver prefix scan).

    Correctness relies on two invariants: the range partitioner sends
    EQUAL timestamps to one partition (so the greater-payload tie rule
    never straddles a boundary), and partitions are contiguous in scan
    order (so the carry-in IS the global running-last at partition
    start). The union is localCheckpoint-ed first so the partition ids
    the boundary job observed are byte-identical in the scan job.

    Scale shape: one range exchange + one hash exchange on the
    partition id (both O(n) rows, no single-reducer stage), one
    ≤num_partitions-row collect, one broadcast. Heavy timestamp skew
    (many rows sharing one exact timestamp) still lands in one
    partition — inherent to keeping ties exact."""
    from pyspark.sql.types import LongType, StructField, StructType

    spark = both.sparkSession
    # scan position: ascending (_ts, _side, _pay) reproduces the
    # windowed order for both directions (forward negates the clock)
    is_ts = dict(both.dtypes).get(on, "").startswith("timestamp")
    t = (F.unix_micros(F.col(on).cast("timestamp")) if is_ts
         else F.col(on).cast("double"))
    if direction == "forward":
        t = -t
    b = (both.withColumn("_ts", t)
         .repartitionByRange(int(num_partitions), "_ts")
         .withColumn("_pid", F.spark_partition_id().cast("long"))
         .localCheckpoint())
    # per-partition carry-out: the right row greatest in scan order
    # (struct max: _ts first, then _pay — the documented tie rule)
    top = (b.filter(F.col("_side") == 0)
           .groupBy("_pid")
           .agg(F.max(F.struct(F.col("_ts"),
                               F.col("_pay").alias("_pay"),
                               F.col(on).alias("_on"))).alias("_top")))
    tops = {r["_pid"]: r["_top"] for r in top.collect()}
    cin_type = top.schema["_top"].dataType
    rows, last = [], None
    for pid in range(int(num_partitions)):
        rows.append((pid, last))
        if pid in tops:
            last = tops[pid]
    cin = spark.createDataFrame(
        rows, StructType([StructField("_pid", LongType(), False),
                          StructField("_cin", cin_type, True)]))
    wp = (Window.partitionBy("_pid")
          .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                   F.col("_pay").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    return (b.withColumn("_m", F.last("_pay", ignorenulls=True).over(wp))
            .withColumn("_mt", F.last(
                F.when(F.col("_side") == 0, F.col(on)),
                ignorenulls=True).over(wp))
            .join(F.broadcast(cin), "_pid", "left")
            .withColumn("_m", F.coalesce(F.col("_m"), F.col("_cin._pay")))
            .withColumn("_mt", F.coalesce(F.col("_mt"), F.col("_cin._on")))
            .filter(F.col("_side") == 1)
            .drop("_cin", "_ts", "_pid"))


def _keyless_row_estimate(left: DataFrame, right: DataFrame,
                          on: str) -> int:
    """Combined row count for the keyless single-partition guard: ONE
    count job over the union of the two timestamp projections — a
    single scheduled job instead of the naive two eager ``count()``
    scans, with each side's scan column-pruned to ``on`` (and for
    plain parquet sources the count collapses to row-group metadata).
    Catalyst plan statistics are NOT consulted: without CBO they only
    carry ``sizeInBytes``, never a row count, so there is no cheaper
    honest answer than this one job."""
    return (left.select(F.col(on))
            .unionByName(right.select(F.col(on)))
            .count())


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str = "ts", by: str | None = None,
              tolerance: float | None = None,
              left_prefix: str = "", right_prefix: str = "r_",
              direction: str = "backward",
              max_keyless_rows: int | None = 10_000_000,
              keyless_partitions: int | None = None) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` (inclusive; ``direction="forward"`` flips
    to the earliest ``right.on >= left.on``).

    ``tolerance`` (seconds) nulls the match when the right row is
    farther than that from the left timestamp. Right payload columns
    (everything but ``on``/``by``) come back prefixed with
    ``right_prefix``. Ties inside the right table on (by, on) are
    broken toward the greater payload struct (deterministic both
    engines; pre-aggregate the right side if you need another rule).

    **Keyless bound: ``by=None`` runs a SINGLE-PARTITION window by
    default.** A keyless as-of is inherently a global merge-scan over
    both tables in timestamp order, so without ``by`` the
    running-``last`` window has no partition key and every row passes
    through ONE task (Spark also warns "No Partition Defined for
    Window"). That is fine for dimension-sized inputs and wrong for
    100-TB ones — pass ``by`` (any co-partitioning key present on both
    sides), or set ``keyless_partitions=N`` to run the distributed
    keyless scan (range partition on the timestamp + broadcast
    carry-in boundary repair — see :func:`_asof_keyless_ranged`;
    identical results, no single-reducer stage).
    ``max_keyless_rows`` (default 10M combined rows, the same
    explicit-bound convention as ``single_linkage.max_driver_rows``)
    raises a clear error instead of a silent one-task stall; set it to
    ``None`` only when a single-reducer scan is genuinely intended.
    The guard costs ONE count job over the union of the two timestamp
    projections (column-pruned; parquet sources answer it from
    row-group metadata) — never two separately scheduled full scans.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    if keyless_partitions is not None:
        if by is not None:
            raise ValueError(
                "keyless_partitions applies only to keyless joins "
                "(by=None); a keyed as-of is already distributed by "
                "the key window")
        if int(keyless_partitions) < 1:
            raise ValueError("keyless_partitions must be >= 1")
    if by is None and keyless_partitions is None \
            and max_keyless_rows is not None:
        n = _keyless_row_estimate(left, right, on)
        if n > max_keyless_rows:
            raise ValueError(
                f"asof_join without by= runs a single-partition window "
                f"(global merge-scan): {n} combined rows > "
                f"max_keyless_rows={max_keyless_rows}. Pass by=<key> or "
                f"keyless_partitions=N to distribute, or raise/disable "
                f"the bound only if a one-task scan is intended.")
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
        # _pay still ASCENDS: the running last() then picks the MAX
        # payload among equal-timestamp right rows, matching the
        # documented greater-payload tie rule in both directions
        order = [F.col(on).desc(), F.col("_side").asc(),
                 F.col("_pay").asc()]
    if not keys and keyless_partitions:
        matched = _asof_keyless_ranged(both, on=on, direction=direction,
                                       num_partitions=keyless_partitions)
    else:
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

def gap_stats(df: DataFrame, *, by: str = "user_id", on: str = "ts",
              id_col: str = "event_id",
              threshold_s: float = 1800.0) -> DataFrame:
    """Per-entity inter-event gap audit → ``(user_id, n_events,
    n_gaps_over, max_gap_s)`` — the data-freshness / liveness check
    behind sessionization: how many silences exceeded the threshold,
    and the worst one. (Sessionize assigns ids; this reports WHERE the
    stream goes quiet — ingestion monitoring reads this table, not the
    session labels.)

    Engine parity: gaps are differences of epoch doubles (micros/1e6 —
    one correctly-rounded division per engine, identical), the
    over-threshold count is an integer, and ``max_gap_s`` coalesces to
    0.0 for single-event entities (null-free outputs).

    Scale shape: identical to sessionize — ONE shuffle on the entity
    key, a per-partition sorted lag scan, then a map-side-combined
    groupBy on the same key (no second exchange: the window's hash
    partitioning is reused)."""
    w = Window.partitionBy(by).orderBy(on, id_col)
    gap = (F.col(on).cast("double")
           - F.lag(F.col(on).cast("double")).over(w))
    return (df.withColumn("_gap", gap)
            .groupBy(by)
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(F.when(F.col("_gap") > threshold_s, 1)
                       .otherwise(0)).cast("long").alias("n_gaps_over"),
                 F.coalesce(F.max("_gap"), F.lit(0.0))
                  .alias("max_gap_s")))


def gap_stats_sql(src_sql: str, *, by: str = "user_id", on: str = "ts",
                  id_col: str = "event_id",
                  threshold_s: float = 1800.0) -> str:
    """DuckDB twin of :func:`gap_stats` — same lag/epoch arithmetic."""
    return f"""
WITH src AS ({src_sql}),
g AS (
  SELECT {by},
         epoch({on}) - lag(epoch({on})) OVER
           (PARTITION BY {by} ORDER BY {on}, {id_col}) AS _gap
  FROM src
)
SELECT {by}, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN _gap > {threshold_s} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_gaps_over,
       COALESCE(max(_gap), 0.0) AS max_gap_s
FROM g GROUP BY {by}
"""


def retention_cohort(df: DataFrame, *, by: str = "user_id",
                     on: str = "ts",
                     bucket_s: int = 604_800) -> DataFrame:
    """Cohort retention matrix → ``(cohort, age, n_users)``: users
    grouped by the time bucket of their FIRST event (the cohort), and
    for each later bucket in which they were active, the bucket offset
    (``age``) and how many of the cohort came back — the standard
    product-analytics triangle (age 0 row = cohort size).

    Engine parity: buckets are integer division of int64 epoch
    MICROSECONDS (``unix_micros DIV (bucket_s·10⁶)``) — no float
    touches the output; every column is BIGINT.

    Scale shape: one map-side-combined groupBy(user) for the cohort
    assignment, one distinct on (user, bucket) — both shuffle on the
    same user key and AQE coalesces them; the final (cohort, age)
    rollup is O(buckets²) rows."""
    div = int(bucket_s) * 1_000_000
    b = df.select(F.col(by).alias("_u"),
                  F.expr(f"unix_micros({on}) DIV {div}").alias("_b"))
    cohort = b.groupBy("_u").agg(F.min("_b").alias("_c"))
    active = b.distinct()
    # (_u, _b) is already distinct and (_c, _age) is a function of it,
    # so no second distinct is needed before the rollup
    return (active.join(cohort, "_u")
            .select("_c", (F.col("_b") - F.col("_c")).alias("_age"), "_u")
            .groupBy("_c", "_age")
            .agg(F.count("*").cast("long").alias("n_users"))
            .select(F.col("_c").cast("long").alias("cohort"),
                    F.col("_age").cast("long").alias("age"),
                    "n_users"))


def retention_cohort_sql(src_sql: str, *, by: str = "user_id",
                         on: str = "ts",
                         bucket_s: int = 604_800) -> str:
    """DuckDB twin of :func:`retention_cohort` — same integer-micros
    bucket arithmetic."""
    div = int(bucket_s) * 1_000_000
    return f"""
WITH src AS ({src_sql}),
b AS (SELECT {by} AS _u, epoch_us({on}) // {div} AS _b FROM src),
cohort AS (SELECT _u, min(_b) AS _c FROM b GROUP BY _u),
active AS (SELECT DISTINCT _u, _b FROM b)
SELECT CAST(c._c AS BIGINT) AS cohort,
       CAST(a._b - c._c AS BIGINT) AS age,
       CAST(count(DISTINCT a._u) AS BIGINT) AS n_users
FROM active a JOIN cohort c ON a._u = c._u
GROUP BY c._c, a._b - c._c
"""


def burst_windows(df: DataFrame, *, on: str = "ts",
                  window_s: int = 3600, lookback: int = 3,
                  factor: tuple[int, int] = (2, 1)) -> DataFrame:
    """Event-rate burst detection → per tumbling window ``(bucket,
    n_events, prev_sum, is_burst)``: a window is a burst when its
    count exceeds ``factor`` × the trailing-``lookback``-window
    average — the rate-anomaly audit run on ingestion streams (crawler
    loops, replayed batches, bot storms) before the data is trusted.

    Exactness: the trailing average compare is cross-multiplied into
    pure integers (``n · lookback · fq > fp · prev_sum`` for factor
    fp/fq) — no float division anywhere; EMPTY trailing windows count
    as zero events because the sum runs over a RANGE frame on the
    integer bucket axis, not a ROWS frame over existing rows (a ROWS
    frame would silently skip quiet windows and deflate the baseline).
    The first ``lookback`` buckets after the stream's global start
    have no full baseline and report ``is_burst = 0``.

    Scale shape: one map-side-combined groupBy on the bucket; the
    window scan runs over the per-bucket COUNTS table (rows = time
    span / window_s, independent of event count), so the unpartitioned
    RANGE window is O(buckets), not O(events)."""
    div = int(window_s) * 1_000_000
    counts = (df.select(F.expr(f"unix_micros({on}) DIV {div}")
                        .alias("bucket"))
              .groupBy("bucket")
              .agg(F.count("*").cast("long").alias("n_events")))
    return burst_flags_from_counts(counts, lookback=lookback,
                                   factor=factor)


def burst_flags_from_counts(counts: DataFrame, *, lookback: int = 3,
                            factor: tuple[int, int] = (2, 1)) -> DataFrame:
    """The flagging stage of :func:`burst_windows`, exposed over an
    already-bucketed ``(bucket, n_events)`` counts table so the
    streaming rate monitor shares the exact expressions (RANGE frame,
    warmup guard, cross-multiplied compare) instead of duplicating
    them — one definition, batch and stream cannot diverge."""
    fp, fq = factor
    wr = (Window.orderBy("bucket")
          .rangeBetween(-int(lookback), -1))
    wall = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (counts
            .withColumn("prev_sum",
                        F.coalesce(F.sum("n_events").over(wr), F.lit(0))
                        .cast("long"))
            .withColumn("_min_b", F.min("bucket").over(wall))
            .select(F.col("bucket").cast("long").alias("bucket"),
                    "n_events", "prev_sum",
                    F.expr(f"CAST(CASE WHEN bucket - _min_b >= {lookback} "
                           f"AND n_events * {lookback} * {fq} > "
                           f"{fp} * prev_sum THEN 1 ELSE 0 END AS BIGINT)")
                    .alias("is_burst")))


def burst_windows_sql(src_sql: str, *, on: str = "ts",
                      window_s: int = 3600, lookback: int = 3,
                      factor: tuple[int, int] = (2, 1)) -> str:
    """DuckDB twin of :func:`burst_windows` — same integer bucket,
    RANGE frame, and cross-multiplied compare."""
    div = int(window_s) * 1_000_000
    fp, fq = factor
    return f"""
WITH src AS ({src_sql}),
counts AS (
  SELECT epoch_us({on}) // {div} AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM src GROUP BY 1
),
w AS (
  SELECT bucket, n_events,
         CAST(COALESCE(sum(n_events) OVER
           (ORDER BY bucket RANGE BETWEEN {lookback} PRECEDING
            AND 1 PRECEDING), 0) AS BIGINT) AS prev_sum,
         min(bucket) OVER () AS _min_b
  FROM counts
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_events, prev_sum,
       CAST(CASE WHEN bucket - _min_b >= {lookback}
            AND n_events * {lookback} * {fq} > {fp} * prev_sum
            THEN 1 ELSE 0 END AS BIGINT) AS is_burst
FROM w
"""
