"""Sparse (CSR) distance and brute-force kNN (SURVEY.md §2.3, §2.5).

Reference: ``cpp/src/distance/sparse_distance.cu:36`` (CSR × CSR
pairwise) and ``cpp/src/neighbors/sparse_brute_force.cu:20,28``.

Spark shape: a sparse vector is ``(id, indices array<int>,
values array<float>)`` (MLlib ``SparseVector``-compatible). The dot
product is an *inverted-index join*: explode to (id, dim, val), join on
dim, aggregate products per pair — only pairs sharing a nonzero
dimension ever materialize (the CSR win). The metric dispatch covers
inner_product / sqeuclidean / euclidean / cosine (norm identity:
``d = ‖a‖² + ‖b‖² − 2·dot`` with dot defaulting to 0 for non-colliding
pairs) plus the set family jaccard / hamming (collision counts against
per-row nnz).

Float determinism: the per-pair product sum is rounded to 9 dp on both
engines (group-sum order is engine-dependent), making kNN ranks
oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.operators.select_k import select_k

# dense → sparse projections (0-based dims on both engines)
SPARSIFY_IDX_SPARK = ("filter(transform({v}, (x, i) -> CASE WHEN abs(x) > {thr} "
                      "THEN i ELSE -1 END), i -> i >= 0)")
SPARSIFY_VAL_SPARK = "filter({v}, x -> abs(x) > {thr})"
SPARSIFY_IDX_DUCK = ("list_filter(list_transform({v}, (x, i) -> CASE WHEN "
                     "abs(x) > {thr} THEN i - 1 ELSE -1 END), i -> i >= 0)")
SPARSIFY_VAL_DUCK = "list_filter({v}, x -> abs(x) > {thr})"


def sparsify(df: DataFrame, threshold: float = 0.2, *, id_col: str = "id",
             vec_col: str = "vec") -> DataFrame:
    """Dense → CSR-style rows: keep entries with |x| > threshold."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(SPARSIFY_IDX_SPARK.format(v=vec_col, thr=repr(threshold)))
        .alias("indices"),
        F.expr(SPARSIFY_VAL_SPARK.format(v=vec_col, thr=repr(threshold)))
        .alias("values"))


def _entries(sp: DataFrame, id_alias: str) -> DataFrame:
    return (sp.select(F.col("id").alias(id_alias),
                      F.explode(F.arrays_zip("indices", "values")).alias("e"))
            .select(id_alias, F.col("e.indices").alias("dim"),
                    F.col("e.values").cast("double").alias("val")))


def _norms(sp: DataFrame, id_alias: str, norm_alias: str) -> DataFrame:
    return sp.select(
        F.col("id").alias(id_alias),
        F.expr("aggregate(values, CAST(0 AS DOUBLE), "
               "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
        .alias(norm_alias))


def _nnz(sp: DataFrame, id_alias: str, alias: str) -> DataFrame:
    return sp.select(F.col("id").alias(id_alias),
                     F.size("values").cast("double").alias(alias))


SPARSE_METRICS = ("inner_product", "dot", "sqeuclidean", "euclidean",
                  "cosine", "jaccard", "hamming", "cityblock", "canberra",
                  "minkowski")


def sparse_pairwise_distance(A: DataFrame, B: DataFrame | None = None, *,
                             metric: str = "sqeuclidean",
                             ndigits: int = 9,
                             n_cols: int | None = None,
                             minkowski_p: float = 3.0,
                             pairs_scope: str = "all") -> DataFrame:
    """CSR × CSR distance matrix ``(i, j, distance)`` — the
    ``sparse_distance.cu:36`` metric dispatch over the inverted-index
    join.

    ``inner_product``: only colliding pairs are emitted (others are 0).
    ``sqeuclidean``/``euclidean``/``cosine``: all pairs via the norm
    identity, dot joined with default 0 — the full m×n never shuffles,
    only the collision pairs plus two tiny norm tables.
    ``jaccard``: 1 − |nonzero∩| / |nonzero∪| (set semantics on the
    sparsity patterns, like the dense binary family).
    ``hamming``: #(dims whose values differ) / ``n_cols`` — requires
    the densified column count since zero-zero dims agree implicitly."""
    Bs = A if B is None else B
    ea = _entries(A, "i").withColumnRenamed("val", "va")
    eb = _entries(Bs, "j").withColumnRenamed("val", "vb")
    coll = ea.join(eb, "dim")
    if metric in ("inner_product", "dot", "sqeuclidean", "euclidean",
                  "cosine"):
        dots = (coll.groupBy("i", "j")
                .agg(F.round(F.sum(F.col("va") * F.col("vb")), ndigits)
                     .alias("dot")))
        if metric in ("inner_product", "dot"):
            return dots.select("i", "j", F.col("dot").alias("distance"))
        na = _norms(A, "i", "na")
        nb = _norms(Bs, "j", "nb")
        if pairs_scope == "collisions":
            # the 100 TB shape: norms join ONTO the collision pairs —
            # the m×n cross relation never forms
            allp = dots.join(na, "i").join(nb, "j")
        else:
            allp = na.join(nb).join(dots, ["i", "j"], "left") \
                .withColumn("dot", F.coalesce("dot", F.lit(0.0)))
        if metric == "cosine":
            # zero-norm rows (everything pruned by the sparsify
            # threshold) get the max distance 1.0 — deterministic on
            # both engines instead of a 0/0
            dist = (F.when((F.col("na") * F.col("nb")) == 0.0, F.lit(1.0))
                    .otherwise(1.0 - F.col("dot")
                               / (F.sqrt("na") * F.sqrt("nb"))))
            return allp.select("i", "j", dist.alias("distance"))
        sq = F.col("na") + F.col("nb") - 2.0 * F.col("dot")
        dist = F.sqrt(F.greatest(sq, F.lit(0.0))) \
            if metric == "euclidean" else sq
        return allp.select("i", "j", dist.alias("distance"))
    if metric in ("cityblock", "canberra", "minkowski"):
        # the "unexpanded" lp family (reference lp_distance.cuh:73-178):
        # every metric here is a sum over the dim UNION, which splits as
        # per-row norm folds + a correction over colliding dims only —
        # so the join still materializes nothing but collisions
        va, vb = F.abs(F.col("va")), F.abs(F.col("vb"))
        if metric == "cityblock":
            term = F.abs(F.col("va") - F.col("vb")) - va - vb
            nrm_expr = ("aggregate(values, CAST(0 AS DOUBLE), "
                        "(acc, v) -> acc + abs(CAST(v AS DOUBLE)))")
        elif metric == "minkowski":
            p = float(minkowski_p)
            term = (F.pow(F.abs(F.col("va") - F.col("vb")), p)
                    - F.pow(va, p) - F.pow(vb, p))
            nrm_expr = (f"aggregate(values, CAST(0 AS DOUBLE), "
                        f"(acc, v) -> acc + power(abs(CAST(v AS DOUBLE)), "
                        f"{p!r}))")
        else:                       # canberra: non-colliding dims → 1 each
            term = F.abs(F.col("va") - F.col("vb")) / (va + vb) - 2.0
            nrm_expr = "CAST(size(values) AS DOUBLE)"
        corr = (coll.groupBy("i", "j")
                .agg(F.round(F.sum(term), ndigits).alias("corr")))
        na = A.select(F.col("id").alias("i"), F.expr(nrm_expr).alias("na"))
        nb = Bs.select(F.col("id").alias("j"), F.expr(nrm_expr).alias("nb"))
        if pairs_scope == "collisions":
            allp = corr.join(na, "i").join(nb, "j")
        else:
            allp = (na.join(nb).join(corr, ["i", "j"], "left")
                    .withColumn("corr", F.coalesce("corr", F.lit(0.0))))
        dist = F.col("na") + F.col("nb") + F.col("corr")
        if metric == "minkowski":
            dist = F.pow(F.greatest(dist, F.lit(0.0)),
                         1.0 / float(minkowski_p))
        return allp.select("i", "j", dist.alias("distance"))
    if metric not in ("jaccard", "hamming"):
        raise ValueError(f"sparse metric {metric!r} not supported")
    counts = (coll.groupBy("i", "j")
              .agg(F.count("*").cast("double").alias("ncoll"),
                   F.sum(F.when(F.col("va") == F.col("vb"), 1.0)
                         .otherwise(0.0)).alias("neq")))
    za = _nnz(A, "i", "za")
    zb = _nnz(Bs, "j", "zb")
    if pairs_scope == "collisions":
        allp = counts.join(za, "i").join(zb, "j")
    else:
        allp = (za.join(zb).join(counts, ["i", "j"], "left")
                .withColumn("ncoll", F.coalesce("ncoll", F.lit(0.0)))
                .withColumn("neq", F.coalesce("neq", F.lit(0.0))))
    if metric == "jaccard":
        uni = F.col("za") + F.col("zb") - F.col("ncoll")
        dist = F.when(uni == 0.0, F.lit(0.0)) \
            .otherwise(1.0 - F.col("ncoll") / uni)
        return allp.select("i", "j", dist.alias("distance"))
    if n_cols is None:
        raise ValueError("sparse hamming needs n_cols (zero-zero dims "
                         "agree implicitly)")
    diff = (F.col("za") + F.col("zb") - F.col("ncoll") - F.col("neq"))
    return allp.select(
        "i", "j", (diff / F.lit(float(n_cols))).alias("distance"))


def sparse_knn(A: DataFrame, queries: DataFrame, k: int = 10, *,
               metric: str = "sqeuclidean",
               n_cols: int | None = None,
               minkowski_p: float = 3.0,
               candidates: str = "exact") -> DataFrame:
    """Sparse brute-force kNN (sparse_brute_force.cu:20) →
    ``(qid, nid, distance, rank)``.

    ``candidates="exact"`` scores every (query, row) pair — the
    reference's tiled semantics, and what the oracle checks.  At tf-idf
    corpus scale the all-pairs relation is infeasible even though only
    collision pairs carry a dot: ``candidates="collisions"`` restricts
    scoring to pairs sharing ≥1 nonzero dim (the classic inverted-index
    kNN contract — a neighbor sharing NO term with the query is
    unreachable, which for cosine/IP is also provably never a better
    score than any colliding pair)."""
    pd_ = sparse_pairwise_distance(queries, A, metric=metric, n_cols=n_cols,
                                   minkowski_p=minkowski_p,
                                   pairs_scope=("collisions"
                                                if candidates == "collisions"
                                                else "all"))
    pairs = pd_.select(F.col("i").alias("qid"), F.col("j").alias("nid"),
                       "distance")
    select_min = metric not in ("inner_product", "dot")
    return select_k(pairs, "qid", "distance", k, select_min=select_min,
                    tie_cols=["nid"])


def sparse_knn_cosine_sql(dense_dataset_sql: str, dense_queries_sql: str,
                          k: int, threshold: float = 0.2,
                          ndigits: int = 9) -> str:
    """DuckDB oracle for cosine sparse kNN: sparsify → collision dot
    (rounded) → norm folds → guarded 1 − dot/(‖a‖‖b‖) → top-k."""
    sp_i = SPARSIFY_IDX_DUCK.format(v="dv", thr=repr(threshold))
    sp_v = SPARSIFY_VAL_DUCK.format(v="dv", thr=repr(threshold))
    sq_i = SPARSIFY_IDX_DUCK.format(v="qv", thr=repr(threshold))
    sq_v = SPARSIFY_VAL_DUCK.format(v="qv", thr=repr(threshold))
    nrm = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform("
           "{vals}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), "
           "(acc, v) -> acc + v)")
    return f"""
WITH d0 AS ({dense_dataset_sql}), q0 AS ({dense_queries_sql}),
ds AS (SELECT nid, {sp_i} AS indices, {sp_v} AS vals FROM d0),
qs AS (SELECT qid, {sq_i} AS indices, {sq_v} AS vals FROM q0),
de AS (SELECT nid, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM ds),
qe AS (SELECT qid, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM qs),
dots AS (
  SELECT qe.qid, de.nid, ROUND(sum(qe.val * de.val), {ndigits}) AS dot
  FROM qe JOIN de ON qe.dim = de.dim GROUP BY qe.qid, de.nid),
na AS (SELECT qid, {nrm.format(vals='vals')} AS n FROM qs),
nb AS (SELECT nid, {nrm.format(vals='vals')} AS n FROM ds),
pairs AS (
  SELECT na.qid AS qid, nb.nid AS nid,
         CASE WHEN na.n * nb.n = CAST(0 AS DOUBLE) THEN CAST(1 AS DOUBLE)
              ELSE CAST(1 AS DOUBLE) - COALESCE(dots.dot, CAST(0 AS DOUBLE))
                   / (sqrt(na.n) * sqrt(nb.n)) END AS distance
  FROM na CROSS JOIN nb
  LEFT JOIN dots ON dots.qid = na.qid AND dots.nid = nb.nid),
ranked AS (
  SELECT qid, nid, distance,
         row_number() OVER (PARTITION BY qid ORDER BY distance ASC, nid ASC) rank
  FROM pairs)
SELECT qid, nid, distance, rank FROM ranked WHERE rank <= {k}
"""


def sparse_pairwise_jaccard_sql(dense_x_sql: str,
                                threshold: float = 0.2) -> str:
    """DuckDB oracle for self jaccard pairwise: collision counts vs
    per-row nnz — integer arithmetic, engine-exact."""
    sp_i = SPARSIFY_IDX_DUCK.format(v="v", thr=repr(threshold))
    sp_v = SPARSIFY_VAL_DUCK.format(v="v", thr=repr(threshold))
    return f"""
WITH d0 AS ({dense_x_sql}),
sp AS (SELECT id, {sp_i} AS indices, {sp_v} AS vals FROM d0),
e AS (SELECT id, unnest(indices) AS dim FROM sp),
coll AS (
  SELECT a.id AS i, b.id AS j, CAST(count(*) AS DOUBLE) AS ncoll
  FROM e a JOIN e b ON a.dim = b.dim GROUP BY a.id, b.id),
z AS (SELECT id, CAST(len(vals) AS DOUBLE) AS nz FROM sp),
pairs AS (
  SELECT za.id AS i, zb.id AS j,
         CASE WHEN za.nz + zb.nz - COALESCE(c.ncoll, 0) = 0
              THEN CAST(0 AS DOUBLE)
              ELSE CAST(1 AS DOUBLE) - COALESCE(c.ncoll, 0)
                   / (za.nz + zb.nz - COALESCE(c.ncoll, 0)) END AS distance
  FROM z za CROSS JOIN z zb
  LEFT JOIN coll c ON c.i = za.id AND c.j = zb.id)
SELECT i, j, distance FROM pairs
"""


def sparse_knn_cityblock_sql(dense_dataset_sql: str, dense_queries_sql: str,
                             k: int, threshold: float = 0.2,
                             ndigits: int = 9) -> str:
    """DuckDB oracle for l1 sparse kNN: per-row |·| norm folds + the
    collision correction Σ(|a−b| − |a| − |b|), rounded like the dot."""
    sp_i = SPARSIFY_IDX_DUCK.format(v="dv", thr=repr(threshold))
    sp_v = SPARSIFY_VAL_DUCK.format(v="dv", thr=repr(threshold))
    sq_i = SPARSIFY_IDX_DUCK.format(v="qv", thr=repr(threshold))
    sq_v = SPARSIFY_VAL_DUCK.format(v="qv", thr=repr(threshold))
    nrm = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform("
           "{vals}, v -> abs(CAST(v AS DOUBLE)))), (acc, v) -> acc + v)")
    return f"""
WITH d0 AS ({dense_dataset_sql}), q0 AS ({dense_queries_sql}),
ds AS (SELECT nid, {sp_i} AS indices, {sp_v} AS vals FROM d0),
qs AS (SELECT qid, {sq_i} AS indices, {sq_v} AS vals FROM q0),
de AS (SELECT nid, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM ds),
qe AS (SELECT qid, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM qs),
corr AS (
  SELECT qe.qid, de.nid,
         ROUND(sum(abs(qe.val - de.val) - abs(qe.val) - abs(de.val)),
               {ndigits}) AS corr
  FROM qe JOIN de ON qe.dim = de.dim GROUP BY qe.qid, de.nid),
na AS (SELECT qid, {nrm.format(vals='vals')} AS n FROM qs),
nb AS (SELECT nid, {nrm.format(vals='vals')} AS n FROM ds),
pairs AS (
  SELECT na.qid AS qid, nb.nid AS nid,
         na.n + nb.n + COALESCE(corr.corr, CAST(0 AS DOUBLE)) AS distance
  FROM na CROSS JOIN nb
  LEFT JOIN corr ON corr.qid = na.qid AND corr.nid = nb.nid),
ranked AS (
  SELECT qid, nid, distance,
         row_number() OVER (PARTITION BY qid ORDER BY distance ASC, nid ASC) rank
  FROM pairs)
SELECT qid, nid, distance, rank FROM ranked WHERE rank <= {k}
"""


def sparse_pairwise_canberra_sql(dense_x_sql: str,
                                 threshold: float = 0.2,
                                 ndigits: int = 9) -> str:
    """DuckDB oracle for self canberra pairwise: nnz counts + the
    collision correction Σ(|a−b|/(|a|+|b|) − 2)."""
    sp_i = SPARSIFY_IDX_DUCK.format(v="v", thr=repr(threshold))
    sp_v = SPARSIFY_VAL_DUCK.format(v="v", thr=repr(threshold))
    return f"""
WITH d0 AS ({dense_x_sql}),
sp AS (SELECT id, {sp_i} AS indices, {sp_v} AS vals FROM d0),
e AS (SELECT id, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM sp),
corr AS (
  SELECT a.id AS i, b.id AS j,
         ROUND(sum(abs(a.val - b.val) / (abs(a.val) + abs(b.val))
                   - CAST(2 AS DOUBLE)), {ndigits}) AS corr
  FROM e a JOIN e b ON a.dim = b.dim GROUP BY a.id, b.id),
z AS (SELECT id, CAST(len(vals) AS DOUBLE) AS nz FROM sp),
pairs AS (
  SELECT za.id AS i, zb.id AS j,
         za.nz + zb.nz + COALESCE(c.corr, CAST(0 AS DOUBLE)) AS distance
  FROM z za CROSS JOIN z zb
  LEFT JOIN corr c ON c.i = za.id AND c.j = zb.id)
SELECT i, j, distance FROM pairs
"""


def sparse_knn_sql(dense_dataset_sql: str, dense_queries_sql: str, k: int,
                   threshold: float = 0.2, ndigits: int = 9) -> str:
    """DuckDB oracle: same sparsify → inverted-index join → norm
    identity → window top-k (sqeuclidean)."""
    sp_i = SPARSIFY_IDX_DUCK.format(v="dv", thr=repr(threshold))
    sp_v = SPARSIFY_VAL_DUCK.format(v="dv", thr=repr(threshold))
    sq_i = SPARSIFY_IDX_DUCK.format(v="qv", thr=repr(threshold))
    sq_v = SPARSIFY_VAL_DUCK.format(v="qv", thr=repr(threshold))
    nrm = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform("
           "{vals}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), "
           "(acc, v) -> acc + v)")
    return f"""
WITH d0 AS ({dense_dataset_sql}), q0 AS ({dense_queries_sql}),
ds AS (SELECT nid, {sp_i} AS indices, {sp_v} AS vals FROM d0),
qs AS (SELECT qid, {sq_i} AS indices, {sq_v} AS vals FROM q0),
de AS (SELECT nid, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM ds),
qe AS (SELECT qid, unnest(indices) AS dim, CAST(unnest(vals) AS DOUBLE) AS val FROM qs),
dots AS (
  SELECT qe.qid, de.nid, ROUND(sum(qe.val * de.val), {ndigits}) AS dot
  FROM qe JOIN de ON qe.dim = de.dim GROUP BY qe.qid, de.nid),
na AS (SELECT qid, {nrm.format(vals='vals')} AS n FROM qs),
nb AS (SELECT nid, {nrm.format(vals='vals')} AS n FROM ds),
pairs AS (
  SELECT na.qid AS qid, nb.nid AS nid,
         na.n + nb.n - 2.0 * COALESCE(dots.dot, 0.0) AS distance
  FROM na CROSS JOIN nb
  LEFT JOIN dots ON dots.qid = na.qid AND dots.nid = nb.nid),
ranked AS (
  SELECT qid, nid, distance,
         row_number() OVER (PARTITION BY qid ORDER BY distance ASC, nid ASC) rank
  FROM pairs)
SELECT qid, nid, distance, rank FROM ranked WHERE rank <= {k}
"""
