"""Clustering / embedding quality statistics (SURVEY.md §2.6).

Reference: ``cpp/include/cuvs/stats/silhouette_score.hpp:32,78``
(mean (b−a)/max(a,b), batched variant),
``trustworthiness_score.hpp:31`` (embedding quality vs original-space
ranks), and the recall evaluator every ANN test uses
(``python/cuvs/cuvs/tests/ann_utils.py:24``,
``cpp/bench/ann/src/common/benchmark.hpp:419``).

All are pairwise-join + window/group aggregations; the silhouette
aggregation collapses the n² join through per-(point, label) partial
means (map-side combine), trustworthiness through integer rank windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import distance_sql_spark


def _pairs(df: DataFrame, metric: str, id_col: str, vec_col: str,
           label_col: str | None = None):
    cols = [F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("_va")]
    if label_col:
        cols.append(F.col(label_col).alias("la"))
    a = df.select(*cols)
    cols = [F.col(id_col).cast("long").alias("j"), F.col(vec_col).alias("_vb")]
    if label_col:
        cols.append(F.col(label_col).alias("lb"))
    b = df.select(*cols)
    dist = F.expr(distance_sql_spark(metric, "_va", "_vb"))
    return (a.join(b, F.col("i") != F.col("j"))
            .withColumn("d", dist))


def silhouette_samples(df: DataFrame, *, id_col: str = "id",
                       vec_col: str = "vec", label_col: str = "label",
                       metric: str = "euclidean",
                       ndigits: int = 6) -> DataFrame:
    """Per-point silhouette ``(i, sil)`` — (b−a)/max(a,b), rounded for
    cross-engine group-sum stability."""
    p = _pairs(df, metric, id_col, vec_col, label_col)
    per_label = (p.groupBy("i", "la", "lb")
                 .agg(F.avg("d").alias("md")))
    own = (per_label.filter(F.col("la") == F.col("lb"))
           .select("i", F.col("md").alias("a")))
    other = (per_label.filter(F.col("la") != F.col("lb"))
             .groupBy("i").agg(F.min("md").alias("b")))
    return (own.join(other, "i", "full")
            .select("i", F.round(
                F.when(F.col("a").isNull() | F.col("b").isNull(), F.lit(0.0))
                .otherwise((F.col("b") - F.col("a"))
                           / F.greatest("a", "b")), ndigits).alias("sil")))


def silhouette_score(df: DataFrame, **kw) -> DataFrame:
    """Mean silhouette over all samples (silhouette_score.hpp:32)."""
    nd = kw.pop("ndigits", 6)
    samples = silhouette_samples(df, ndigits=9, **kw)
    return samples.agg(F.round(F.avg("sil"), nd).alias("silhouette"))


def silhouette_samples_sql(dataset_sql: str, metric: str = "euclidean",
                           ndigits: int = 6) -> str:
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dist = distance_sql_duckdb(metric, "a.dv", "b.dv")
    return f"""
WITH d AS ({dataset_sql}),
p AS (
  SELECT a.id AS i, a.label AS la, b.label AS lb, {dist} AS d
  FROM d a JOIN d b ON a.id <> b.id
),
per_label AS (
  SELECT i, la, lb, avg(d) AS md FROM p GROUP BY i, la, lb
),
own AS (SELECT i, md AS a FROM per_label WHERE la = lb),
other AS (SELECT i, min(md) AS b FROM per_label WHERE la <> lb GROUP BY i)
SELECT COALESCE(own.i, other.i) AS i,
       ROUND(CASE WHEN own.a IS NULL OR other.b IS NULL THEN 0.0
             ELSE (other.b - own.a) / greatest(own.a, other.b) END,
             {ndigits}) AS sil
FROM own FULL JOIN other ON own.i = other.i
"""


def trustworthiness_score(orig: DataFrame, embed: DataFrame, k: int = 5, *,
                          id_col: str = "id", orig_vec: str = "vec",
                          embed_vec: str = "vec",
                          metric: str = "sqeuclidean") -> DataFrame:
    """Trustworthiness of an embedding (trustworthiness_score.hpp:31):
    1 − 2/(n·k·(2n−3k−1)) · Σ_{j ∈ kNN_embed(i) \\ kNN_orig(i)}
    (rank_orig(i,j) − k). Integer ranks → oracle-exact."""
    po = _pairs(orig.select(F.col(id_col).alias("id"),
                            F.col(orig_vec).alias("v")), metric, "id", "v")
    wo = Window.partitionBy("i").orderBy(F.col("d").asc(), F.col("j").asc())
    ranks_o = po.select("i", "j", F.row_number().over(wo).alias("r_orig"))
    pe = _pairs(embed.select(F.col(id_col).alias("id"),
                             F.col(embed_vec).alias("v")), metric, "id", "v")
    we = Window.partitionBy("i").orderBy(F.col("d").asc(), F.col("j").asc())
    knn_e = (pe.select("i", "j", F.row_number().over(we).alias("r_emb"))
             .filter(F.col("r_emb") <= k))
    n = orig.count()
    joined = knn_e.join(ranks_o, ["i", "j"])
    penalty = joined.agg(F.sum(
        F.greatest(F.col("r_orig") - k, F.lit(0))).alias("p")).head()["p"] or 0
    denom = n * k * (2 * n - 3 * k - 1)
    spark = orig.sparkSession
    return spark.createDataFrame(
        [(1.0 - 2.0 * float(penalty) / denom,)], "trustworthiness double")


def trustworthiness_sql(orig_sql: str, embed_sql: str, k: int,
                        metric: str = "sqeuclidean") -> str:
    from cuvs_spark.functions.distance import distance_sql_duckdb
    do = distance_sql_duckdb(metric, "a.v", "b.v")
    de = distance_sql_duckdb(metric, "a.v", "b.v")
    return f"""
WITH o AS ({orig_sql}), e AS ({embed_sql}),
n AS (SELECT count(*) AS n FROM o),
ranks_o AS (
  SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY d ASC, j ASC) AS r_orig
  FROM (SELECT a.id AS i, b.id AS j, {do} AS d FROM o a JOIN o b ON a.id <> b.id)
),
knn_e AS (
  SELECT i, j FROM (
    SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY d ASC, j ASC) AS r
    FROM (SELECT a.id AS i, b.id AS j, {de} AS d FROM e a JOIN e b ON a.id <> b.id)
  ) WHERE r <= {k}
),
pen AS (
  SELECT COALESCE(sum(greatest(r.r_orig - {k}, 0)), 0) AS p
  FROM knn_e ke JOIN ranks_o r ON ke.i = r.i AND ke.j = r.j
)
SELECT 1.0 - 2.0 * CAST(p AS DOUBLE) / (n.n * {k} * (2 * n.n - 3 * {k} - 1))
       AS trustworthiness
FROM pen, n
"""


def recall_score(ann: DataFrame, exact: DataFrame) -> DataFrame:
    """|ANN ∩ exact| / |exact| over (qid, nid) pairs — the reference's
    universal ANN pass criterion (benchmark.hpp:419)."""
    hits = ann.select("qid", "nid").join(exact.select("qid", "nid"),
                                         ["qid", "nid"], "left_semi").count()
    total = exact.count()
    spark = ann.sparkSession
    return spark.createDataFrame(
        [(float(hits) / float(total) if total else 0.0,)], "recall double")


def mrr_score(ann: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """Mean reciprocal rank of the true item within an approximate
    ranking → one-row ``(mrr)`` — the position-sensitive companion to
    :func:`recall_score` (recall@k says whether the true neighbor
    appears in the top-k; MRR says WHERE: an index that always buries
    it at rank 10 recalls 1.0 but serves poorly).

    ``ann`` is ``(qid, nid, rank)``; ``truth`` is the relevant
    ``(qid, nid)`` pair per query (e.g. the exact top-1). Exact
    rational arithmetic: with ranks in 1..k ≤ 10, every reciprocal is
    ``lcm(1..10) = 2520 / rank`` — an INTEGER — so the sum is
    order-independent and the single final double division is
    deterministic across engines and shuffle orders (the gate-design
    rule: never sum floats you can sum as ints)."""
    if k > 10:
        raise ValueError("mrr_score: rational-exact path needs k <= 10 "
                         "(reciprocals scaled by lcm(1..10) = 2520)")
    # the truth lineage can be an expensive exact-kNN job and feeds
    # both the hit join and the query count — persist it across the
    # two actions instead of recomputing it
    t = truth.select("qid", "nid").persist()
    try:
        hit = (t.join(ann.select("qid", "nid",
                                 F.col("rank").cast("long").alias("_rk")),
                      ["qid", "nid"]))
        # the NULLIF guard keeps ANSI mode from raising DIVIDE_BY_ZERO
        # on a rank-0 row before the range validation below reports it
        agg = hit.agg(F.sum(F.expr("2520 DIV nullif(_rk, 0)")).alias("s"),
                      F.min("_rk").alias("_rmin"),
                      F.max("_rk").alias("_rmax")).collect()[0]
        # data-level contract check (same reasoning as map_score): an
        # out-of-range rank would silently break the exact arithmetic
        if agg["_rmin"] is not None and (agg["_rmin"] < 1
                                         or agg["_rmax"] > k):
            raise ValueError(
                f"mrr_score: ranks outside 1..{k} in ann "
                f"(min={agg['_rmin']}, max={agg['_rmax']}) — ranks must "
                "be 1-indexed and within k for the exact path")
        num = agg["s"]
        nq = t.select("qid").distinct().count()
    finally:
        # unpersist on the error path too (triangle_stats's pattern) —
        # the out-of-range raise above must not leak the cached truth
        t.unpersist()
    spark = ann.sparkSession
    mrr = float(num or 0) / (2520.0 * float(nq)) if nq else 0.0
    return spark.createDataFrame([(mrr,)], "mrr double")


def group_mmd(df: DataFrame, *, group_col: str = "label",
              vec_col: str = "vec",
              ndigits: int = 6) -> DataFrame:
    """Linear-kernel Maximum Mean Discrepancy between every pair of
    groups → ``(group_a, group_b, n_a, n_b, mmd2)`` for a < b — the
    distribution-shift audit over embedding slices (did the new crawl
    drift from the base corpus? do two sources occupy the same
    region?). For the linear kernel, ``MMD² = ‖mean(X) − mean(Y)‖²``
    exactly (Gretton et al. 2012, eq. 4 with k(x,y)=⟨x,y⟩), so the
    O(n²) kernel double-sum collapses to per-group means — one
    map-side-combined groupBy over (group, dim) and a tiny
    groups²-row cross join; nothing quadratic in rows.

    Engine parity: per-dim means are rounded to ``ndigits`` (the
    kmeans-gate template — shuffle-order FP noise dies at the round),
    and the squared distance between the rounded mean vectors uses the
    shared sequential-fold sqeuclidean template."""
    from cuvs_spark.functions.distance import distance_sql_spark
    d = df.select(F.col(group_col).cast("long").alias("grp"),
                  F.col(vec_col).alias("vec"))
    dims = (d.select("grp", F.posexplode("vec").alias("dim", "x"))
            .groupBy("grp", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), ndigits)
                 .alias("val")))
    means = (dims.groupBy("grp")
             .agg(F.expr("transform(array_sort(collect_list("
                         "struct(dim, val))), s -> s.val)").alias("mv")))
    counts = d.groupBy("grp").agg(F.count("*").alias("n"))
    m = means.join(counts, "grp")
    a = m.select(F.col("grp").alias("group_a"), F.col("mv").alias("ma"),
                 F.col("n").alias("n_a"))
    b = m.select(F.col("grp").alias("group_b"), F.col("mv").alias("mb"),
                 F.col("n").alias("n_b"))
    dist = distance_sql_spark("sqeuclidean", "ma", "mb")
    # broadcast the (tiny) mean table: the groups^2 cross becomes a
    # BroadcastNestedLoopJoin over O(#groups) rows, never a
    # CartesianProduct exchange
    return (a.crossJoin(F.broadcast(b))
            .filter(F.col("group_a") < F.col("group_b"))
            .select("group_a", "group_b",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.expr(dist).alias("mmd2")))


def group_mmd_sql(dataset_sql: str, *, group_col: str = "label",
                  vec_col: str = "embedding", ndigits: int = 6) -> str:
    """DuckDB twin: ``dataset_sql`` yields the raw table; means are
    rounded per dim and folded with the shared sqeuclidean template."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dist = distance_sql_duckdb("sqeuclidean", "a.ma", "b.mb")
    return f"""
WITH src AS ({dataset_sql}),
d AS (SELECT CAST({group_col} AS BIGINT) AS grp, {vec_col} AS vec
      FROM src),
dims AS (
  SELECT grp, CAST(generate_subscripts(vec, 1) AS BIGINT) - 1 AS dim,
         CAST(unnest(vec) AS DOUBLE) AS x
  FROM d
),
md AS (SELECT grp, dim, ROUND(avg(x), {ndigits}) AS val
       FROM dims GROUP BY grp, dim),
means AS (SELECT grp, list(val ORDER BY dim) AS mv FROM md GROUP BY grp),
counts AS (SELECT grp, count(*) AS n FROM d GROUP BY grp),
m AS (SELECT means.grp AS grp, mv, n FROM means JOIN counts USING (grp))
SELECT a.grp AS group_a, b.grp AS group_b,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       {dist.replace('a.ma', 'a.mv').replace('b.mb', 'b.mv')} AS mmd2
FROM m a CROSS JOIN m b
WHERE a.grp < b.grp
"""


def embedding_norm_quantiles(df: DataFrame,
                             probs: tuple = (0.25, 0.5, 0.75, 0.9), *,
                             group_col: str = "label",
                             vec_col: str = "vec",
                             ndigits: int = 6) -> DataFrame:
    """Per-group squared-L2-norm quantiles of an embedding column →
    ``(group, n_rows, q1..qm)`` — the embedding-quality audit twin of
    the text side's ``length_quantiles``: collapsed or exploding norms
    flag a broken encoder batch, a degenerate source, or rows that
    need renormalizing before cosine ANN. Squared norm (the shared
    inner-product fold of vec with itself) keeps the whole pipeline
    libm-free; exact type-7 percentiles rounded to ``ndigits`` on both
    engines. Map-only norm pass + one groupBy — same scale shape as
    length_quantiles."""
    from cuvs_spark.functions.distance import distance_sql_spark
    sq = distance_sql_spark("inner_product", vec_col, vec_col)
    d = df.select(F.col(group_col).cast("long").alias("grp"),
                  F.expr(sq).alias("_n"))
    pl = [float(p) for p in probs]
    agg = d.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.percentile("_n", F.array(*[F.lit(p) for p in pl])).alias("_q"))
    cols = [F.round(F.col("_q")[i], ndigits).alias(f"q{i + 1}")
            for i in range(len(pl))]
    return agg.select(F.col("grp").alias(group_col), "n_rows", *cols)


def embedding_norm_quantiles_sql(dataset_sql: str,
                                 probs: tuple = (0.25, 0.5, 0.75, 0.9), *,
                                 group_col: str = "label",
                                 vec_col: str = "embedding",
                                 ndigits: int = 6) -> str:
    from cuvs_spark.functions.distance import distance_sql_duckdb
    sq = distance_sql_duckdb("inner_product", vec_col, vec_col)
    pl = ", ".join(repr(float(p)) for p in probs)
    cols = ",\n       ".join(
        f"ROUND(q[{i + 1}], {ndigits}) AS q{i + 1}"
        for i in range(len(probs)))
    return f"""
WITH src AS ({dataset_sql}),
t AS (SELECT CAST({group_col} AS BIGINT) AS grp, {sq} AS _n FROM src),
g AS (SELECT grp, count(*) AS n_rows, quantile_cont(_n, [{pl}]) AS q
      FROM t GROUP BY grp)
SELECT grp AS {group_col}, CAST(n_rows AS BIGINT) AS n_rows,
       {cols}
FROM g
"""

def map_score(ann: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """Mean average precision of an approximate ranking against a
    relevant set → one-row ``(map)`` — the order-sensitive companion
    to :func:`recall_score` when MORE than one neighbor is relevant
    per query (MRR only scores the first hit; MAP scores every
    relevant neighbor by the precision at its position — the standard
    ANN-serving quality summary next to recall@k).

    ``ann`` is ``(qid, nid, rank)`` with ranks 1..k unique per query;
    ``truth`` is the relevant ``(qid, nid)`` set (e.g. the exact
    top-k). Exact rational arithmetic: precision-at-hit ``i/r`` is
    scaled by ``lcm(1..10) = 2520`` so every per-hit term
    ``(2520 DIV r) * i`` is an INTEGER — per-query AP sums are
    order-independent BIGINTs, and the cross-query mean is an exact
    ``fractions.Fraction`` sum on the driver with ONE final float
    conversion (deterministic across engines and shuffle orders).

    Driver bound: one row per query is collected (#queries rows —
    the same bound as :func:`mrr_score`'s scalar agg); the per-hit
    and per-query work is distributed."""
    if k > 10:
        raise ValueError("map_score: rational-exact path needs k <= 10 "
                         "(precisions scaled by lcm(1..10) = 2520)")
    # truth (often an exact-kNN job) feeds both the hit join and the
    # per-query relevant counts — persist it so the single collected
    # plan doesn't evaluate the lineage twice
    t = truth.select("qid", "nid").persist()
    try:
        hits = (t.join(ann.select("qid", "nid",
                                  F.col("rank").cast("long").alias("_rk")),
                       ["qid", "nid"]))
        w = Window.partitionBy("qid").orderBy("_rk")
        perq = (hits.withColumn("_i", F.row_number().over(w))
                .withColumn("_term",
                            F.expr("(2520 DIV nullif(_rk, 0)) * _i"))
                .groupBy("qid").agg(F.sum("_term").alias("_ap"),
                                    F.min("_rk").alias("_rmin"),
                                    F.max("_rk").alias("_rmax")))
        rel = t.groupBy("qid").agg(F.count("*").alias("_nrel"))
        rows = (rel.join(perq, "qid", "left")
                .select("_nrel", F.coalesce(F.col("_ap"), F.lit(0))
                        .alias("_ap"),
                        "_rmin", "_rmax")
                .collect())
    finally:
        # unpersist even when collect raises (ANSI arithmetic, lost
        # executors) — the mrr_score error-path rule
        t.unpersist()
    # validate the DATA against the rational-exactness contract, not
    # just the k parameter: an out-of-range rank (0-indexed input, or
    # a top-20 list scored with k=10) would otherwise corrupt the
    # integer arithmetic silently
    bad = [r for r in rows if r["_rmin"] is not None
           and (r["_rmin"] < 1 or r["_rmax"] > k)]
    if bad:
        raise ValueError(
            f"map_score: ranks outside 1..{k} in ann (e.g. "
            f"min={bad[0]['_rmin']}, max={bad[0]['_rmax']}) — ranks "
            "must be 1-indexed and within k for the exact path")
    from fractions import Fraction
    spark = ann.sparkSession
    if not rows:
        return spark.createDataFrame([(0.0,)], "map double")
    total = sum(Fraction(int(r["_ap"]), 2520 * int(r["_nrel"]))
                for r in rows)
    return spark.createDataFrame([(float(total / len(rows)),)],
                                 "map double")


def hubness_moments(graph: DataFrame, *, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Hubness audit of a kNN graph: exact integer in-degree moments
    and the degree-distribution skewness → one row ``(n_nodes,
    sum_deg, m2_scaled, m3_scaled, skewness)``. k-occurrence skewness
    is THE standard hubness measure for high-dimensional ANN
    (Radovanović et al., JMLR 2010): skew ≈ 0 means in-degrees spread
    symmetrically around k; large positive skew means hub formation —
    exactly the regime where graph indexes (CAGRA/HNSW) lose recall
    and the reference's optimize pass prunes/reverses edges.

    Engine parity: ``m2_scaled = n·Σd² − (Σd)²`` (= n²·variance) and
    ``m3_scaled = n²·Σd³ − 3n·Σd·Σd² + 2(Σd)³`` (= n³·third central
    moment) are EXACT BIGINTs (degrees are integers), and
    ``skewness = m3 / (m2·√m2)`` is three correctly-rounded ops on
    exact inputs — bit-equal across engines. Zero variance (every
    node at in-degree k) reports skewness 0.0, null-free.

    Scale shape: one map-side-combined groupBy(dst), an anti-join-free
    left join for degree-0 nodes, then a single 4-sum scalar agg; the
    distributed sums are per-degree CUBES (int64-safe for per-node
    in-degrees < 2²¹ ≈ 2M — any kNN-family graph), and the moment
    ALGEBRA (n²·s3, 2·s1³ — the terms that would wrap int64 silently
    past ~1.6M edges) runs in Python arbitrary-precision integers on
    the collected one-row sums, so no scale wraps silently; if the
    exact moments themselves exceed int64 the function raises instead
    of emitting a truncated row."""
    import math
    node_ids = graph.select(F.col(src_col).cast("long").alias("_n")).distinct()
    deg = (graph.groupBy(F.col(dst_col).cast("long").alias("_n"))
           .agg(F.count("*").alias("_d")))
    per_node = (node_ids.join(deg, "_n", "left")
                .select(F.coalesce(F.col("_d"), F.lit(0))
                        .cast("long").alias("_d")))
    row = per_node.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_d").cast("long").alias("s1"),
        F.sum(F.expr("_d * _d")).cast("long").alias("s2"),
        F.sum(F.expr("_d * _d * _d")).cast("long").alias("s3"),
        # double shadow sums: a silent int64 wrap in the long sums
        # (non-ANSI sessions; ANSI raises instead) shifts the value by
        # ~2^64 while the double sum stays within ~2^-53 relative —
        # the comparison below catches the wrap either way
        F.sum(F.expr("CAST(_d AS DOUBLE) * _d * _d")).alias("s3d"),
        F.sum(F.expr("CAST(_d AS DOUBLE) * _d")).alias("s2d")
    ).collect()[0]
    n, s1 = int(row["n"] or 0), int(row["s1"] or 0)
    s2, s3 = int(row["s2"] or 0), int(row["s3"] or 0)
    for exact, shadow, name in ((s2, row["s2d"], "s2"),
                                (s3, row["s3d"], "s3")):
        if shadow is not None and abs(exact - float(shadow)) > max(
                1.0, 1e-6 * abs(float(shadow))):
            raise ValueError(
                f"hubness_moments: distributed {name} sum wrapped "
                "int64 (degree mass too large for the exact path); "
                "compute the skew from degree_histogram() output in "
                "doubles instead")
    m2 = n * s2 - s1 * s1
    m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    if not (-(2 ** 63) <= m2 < 2 ** 63 and -(2 ** 63) <= m3 < 2 ** 63):
        raise ValueError(
            "hubness_moments: exact integer moments exceed int64 at "
            f"this graph size (n={n}, sum_deg={s1}); compute the "
            "skew from degree_histogram() output in doubles instead")
    # same three correctly-rounded ops as the SQL twin: CAST → × → ÷
    skew = (float(m3) / (float(m2) * math.sqrt(float(m2)))
            if m2 > 0 else 0.0)
    spark = graph.sparkSession
    return spark.createDataFrame(
        [(n, s1, m2, m3, skew)],
        "n_nodes bigint, sum_deg bigint, m2_scaled bigint, "
        "m3_scaled bigint, skewness double")


def hubness_moments_sql(graph_sql: str) -> str:
    """DuckDB twin of :func:`hubness_moments` — same integer moment
    algebra, same three-op skewness expression."""
    return f"""
WITH g AS ({graph_sql}),
nodes AS (SELECT DISTINCT CAST(src AS BIGINT) AS _n FROM g),
deg AS (SELECT CAST(dst AS BIGINT) AS _n, count(*) AS _d
        FROM g GROUP BY CAST(dst AS BIGINT)),
per_node AS (
  SELECT CAST(COALESCE(d._d, 0) AS BIGINT) AS _d
  FROM nodes n LEFT JOIN deg d ON n._n = d._n
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(_d) AS BIGINT) AS s1,
         CAST(sum(_d * _d) AS BIGINT) AS s2,
         CAST(sum(_d * _d * _d) AS BIGINT) AS s3
  FROM per_node
)
SELECT n AS n_nodes, s1 AS sum_deg,
       n * s2 - s1 * s1 AS m2_scaled,
       n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3_scaled,
       CASE WHEN n * s2 - s1 * s1 <= 0 THEN 0.0 ELSE
       CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
            AS DOUBLE) / (CAST(n * s2 - s1 * s1 AS DOUBLE) *
       sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))) END AS skewness
FROM s
"""


def cosine_pair_histogram(df: DataFrame, *, id_col: str = "id",
                          vec_col: str = "vec",
                          n_buckets: int = 64) -> DataFrame:
    """Isotropy audit: histogram of cosine similarity over a
    deterministic pseudo-random pairing of the rows → ``(bin,
    n_pairs)`` with ``bin = floor((cos + 1)·8)`` in 0..15. An
    isotropic embedding space concentrates mass near cos ≈ 0; heavy
    right-tail mass (Ethayarajh 2019's anisotropy) predicts poor
    contrast for cosine ANN — the audit to run before choosing
    ``metric='cosine'`` for an index build.

    Pairing: rows land in ``id % n_buckets`` buckets, are ordered
    within the bucket by ``(md5(id), id)``, and consecutive rows pair
    up (the odd leftover per bucket is dropped) — deterministic on
    both engines, no global sort, parallel across buckets. The cosine
    comes from the shared sequential-fold template (bit-equal), and
    the output is pure integers: floor-binning a bit-equal double is
    exact, out-of-range/NaN distances land in the ``-1`` sentinel bin
    rather than a NULL.

    Scale shape: at 100 TB feed a hash-sampled subset (the audit is a
    distribution estimate; pair counts don't need the full corpus) —
    per-bucket windows then stay O(sample/n_buckets)."""
    d = df.select(F.col(id_col).cast("long").alias("i"),
                  F.col(vec_col).alias("v"))
    d = d.withColumn("_bkt", F.expr(f"i % {n_buckets}"))
    d = d.withColumn("_h", F.md5(F.col("i").cast("string")))
    w = Window.partitionBy("_bkt").orderBy("_h", "i")
    d = (d.withColumn("_rn", F.row_number().over(w))
         .withColumn("_pr", F.expr("CAST((_rn - 1) DIV 2 AS BIGINT)"))
         .withColumn("_side", F.expr("(_rn - 1) % 2")))
    a = (d.filter(F.col("_side") == 0)
         .select("_bkt", "_pr", F.col("v").alias("_va")))
    b = (d.filter(F.col("_side") == 1)
         .select("_bkt", "_pr", F.col("v").alias("_vb")))
    dist = distance_sql_spark("cosine", "_va", "_vb")
    pairs = a.join(b, ["_bkt", "_pr"]).withColumn("_d", F.expr(dist))
    binned = pairs.select(F.expr(
        "CASE WHEN _d >= 0.0 AND _d <= 2.0 THEN "
        "LEAST(CAST(FLOOR((2.0 - _d) * 8.0) AS BIGINT), CAST(15 AS BIGINT)) "
        "ELSE CAST(-1 AS BIGINT) END").alias("bin"))
    return (binned.groupBy("bin")
            .agg(F.count("*").cast("long").alias("n_pairs")))


def cosine_pair_histogram_sql(dataset_sql: str, *, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              n_buckets: int = 64) -> str:
    """DuckDB twin of :func:`cosine_pair_histogram` — same bucketed
    md5 pairing, shared cosine template, same sentinel binning."""
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dist = distance_sql_duckdb("cosine", "_va", "_vb")
    return f"""
WITH src AS ({dataset_sql}),
d AS (
  SELECT CAST({id_col} AS BIGINT) AS i, {vec_col} AS v,
         CAST({id_col} AS BIGINT) % {n_buckets} AS _bkt,
         md5(CAST(CAST({id_col} AS BIGINT) AS VARCHAR)) AS _h
  FROM src
),
rn AS (
  SELECT i, v, _bkt,
         row_number() OVER (PARTITION BY _bkt ORDER BY _h, i) AS _rn
  FROM d
),
sides AS (
  SELECT _bkt, CAST((_rn - 1) // 2 AS BIGINT) AS _pr,
         (_rn - 1) % 2 AS _side, v
  FROM rn
),
pairs AS (
  SELECT a.v AS _va, b.v AS _vb
  FROM (SELECT * FROM sides WHERE _side = 0) a
  JOIN (SELECT * FROM sides WHERE _side = 1) b
    ON a._bkt = b._bkt AND a._pr = b._pr
),
binned AS (
  SELECT CASE WHEN _d >= 0.0 AND _d <= 2.0 THEN
         LEAST(CAST(FLOOR((2.0 - _d) * 8.0) AS BIGINT),
               CAST(15 AS BIGINT))
         ELSE CAST(-1 AS BIGINT) END AS bin
  FROM (SELECT {dist} AS _d FROM pairs)
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs
FROM binned GROUP BY bin
"""

def rank_auc(df: DataFrame, score_col: str, label_expr: str) -> DataFrame:
    """ROC AUC of a score against a binary label via the Mann-Whitney
    rank statistic → one row ``(n_pos, n_neg, auc_num2, auc)`` — the
    threshold-free audit of any quality/classifier score column (does
    the score actually rank positives above negatives?).

    ``AUC = P(score_pos > score_neg) + ½·P(tie)``; the numerator is
    accumulated per DISTINCT score value as
    ``Σ np_s · (2·cum_neg_below + nn_s)`` — an exact BIGINT
    (``auc_num2`` = 2·n_pos·n_neg·AUC) — so the only float op is the
    final division of exact integers (bit-equal across engines).
    Degenerate inputs (no positives or no negatives) report 0.0.

    Scale shape: one map-side-combined groupBy on the score value,
    then ONE ordered window over the distinct-score table (rows =
    #distinct scores, independent of corpus size) — never the
    n_pos × n_neg pair join the textbook definition implies.

    Works for integer scores directly; for float scores quantize
    first (ties must mean bit-equal on both engines). NULL scores are
    EXCLUDED — unscored rows carry no rank information, and leaving
    them in would also diverge across engines (Spark windows sort
    NULLS FIRST ascending, DuckDB NULLS LAST)."""
    g = (df.filter(F.col(score_col).isNotNull())
         .select(F.col(score_col).alias("_s"),
                 F.expr(f"CASE WHEN {label_expr} THEN 1 ELSE 0 END")
                 .alias("_y"))
         .groupBy("_s")
         .agg(F.sum("_y").cast("long").alias("_np"),
              F.sum(F.expr("1 - _y")).cast("long").alias("_nn")))
    w = (Window.orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    acc = (g.withColumn("_cnb",
                        F.coalesce(F.sum("_nn").over(w), F.lit(0))
                        .cast("long"))
           .agg(F.sum("_np").cast("long").alias("n_pos"),
                F.sum("_nn").cast("long").alias("n_neg"),
                F.sum(F.expr("_np * (2 * _cnb + _nn)")).cast("long")
                .alias("auc_num2")))
    acc = acc.select(
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(F.col("auc_num2"), F.lit(0)).cast("long")
        .alias("auc_num2"))
    return acc.select(
        "n_pos", "n_neg", "auc_num2",
        F.expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.0 ELSE "
               "CAST(auc_num2 AS DOUBLE) / "
               "(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) "
               "END").alias("auc"))


def rank_auc_sql(src_sql: str, score_col: str, label_expr: str) -> str:
    """DuckDB twin of :func:`rank_auc` — same distinct-score rank-sum
    integers, same single division, same NULL-score exclusion."""
    return f"""
WITH src AS (SELECT * FROM ({src_sql})
             WHERE {score_col} IS NOT NULL),
g AS (
  SELECT {score_col} AS _s,
         CAST(sum(CASE WHEN {label_expr} THEN 1 ELSE 0 END)
              AS BIGINT) AS _np,
         CAST(sum(CASE WHEN {label_expr} THEN 0 ELSE 1 END)
              AS BIGINT) AS _nn
  FROM src GROUP BY {score_col}
),
acc AS (
  SELECT _np, _nn,
         CAST(COALESCE(sum(_nn) OVER
           (ORDER BY _s ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS BIGINT) AS _cnb
  FROM g
),
s AS (
  SELECT CAST(COALESCE(sum(_np), 0) AS BIGINT) AS n_pos,
         CAST(COALESCE(sum(_nn), 0) AS BIGINT) AS n_neg,
         CAST(COALESCE(sum(_np * (2 * _cnb + _nn)), 0) AS BIGINT)
           AS auc_num2
  FROM acc
)
SELECT n_pos, n_neg, auc_num2,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.0 ELSE
       CAST(auc_num2 AS DOUBLE) /
       (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END AS auc
FROM s
"""

def kendall_rank_agreement(rank_a: DataFrame,
                           rank_b: DataFrame) -> DataFrame:
    """Kendall rank agreement between two retrieval systems → one row
    ``(n_items, n_pairs, concordant, discordant, tau)`` — do lexical
    (BM25) and semantic (embedding) ranking actually agree before you
    fuse them? A τ near 0 says the fused list is dominated by whichever
    system is weighted higher; a τ near 1 says fusion adds nothing.
    The diagnostic to read NEXT TO :func:`~cuvs_spark.pipeline.
    retrieval.rrf_fuse` / ``borda_fuse``.

    Both inputs are ``(qid, nid, rank)`` with unique ranks per query.
    Agreement is computed over the INTERSECTION of the two candidate
    sets per query (items only one system returned carry no rank in
    the other — the standard top-k τ treatment); with unique ranks
    there are no ties, so τ = (C − D) / pairs, all-integer until the
    single exact division.

    Scale shape: one (qid, nid) equi-join, then a per-query pair
    self-join — fanout bounded by k² per query (k ≤ 10s), never
    corpus-sized; the final sums are map-side-combined."""
    a = rank_a.select("qid", "nid", F.col("rank").cast("long").alias("_ra"))
    b = rank_b.select("qid", "nid", F.col("rank").cast("long").alias("_rb"))
    # both ranking lineages (BM25, kNN, ...) are expensive; the
    # intersection feeds the item count AND the pair join — persist it
    # across the two actions
    both = a.join(b, ["qid", "nid"]).persist()
    try:
        p1 = both.select("qid", F.col("nid").alias("n1"),
                         F.col("_ra").alias("a1"), F.col("_rb").alias("b1"))
        p2 = both.select("qid", F.col("nid").alias("n2"),
                         F.col("_ra").alias("a2"), F.col("_rb").alias("b2"))
        pairs = (p1.join(p2, "qid")
                 .filter(F.col("n1") < F.col("n2"))
                 .select(F.expr("CASE WHEN (a1 - a2) * (b1 - b2) > 0 "
                                "THEN 1 ELSE 0 END").alias("_c"),
                         F.expr("CASE WHEN (a1 - a2) * (b1 - b2) < 0 "
                                "THEN 1 ELSE 0 END").alias("_d")))
        n_items = both.count()
        agg = pairs.agg(F.count("*").cast("long").alias("np"),
                        F.sum("_c").cast("long").alias("c"),
                        F.sum("_d").cast("long").alias("d")).collect()[0]
    finally:
        # unpersist even when an action raises (the mrr_score
        # error-path rule)
        both.unpersist()
    np_, c, d = (int(agg["np"] or 0), int(agg["c"] or 0),
                 int(agg["d"] or 0))
    tau = float(c - d) / float(np_) if np_ else 0.0
    spark = rank_a.sparkSession
    return spark.createDataFrame(
        [(n_items, np_, c, d, tau)],
        "n_items bigint, n_pairs bigint, concordant bigint, "
        "discordant bigint, tau double")


def kendall_rank_agreement_sql(rank_a_sql: str, rank_b_sql: str) -> str:
    """DuckDB twin of :func:`kendall_rank_agreement` — same
    intersection, pair predicate, and single exact division."""
    return f"""
WITH ra AS ({rank_a_sql}), rb AS ({rank_b_sql}),
both_r AS (
  SELECT ra.qid, ra.nid, CAST(ra.rank AS BIGINT) AS _ra,
         CAST(rb.rank AS BIGINT) AS _rb
  FROM ra JOIN rb ON ra.qid = rb.qid AND ra.nid = rb.nid
),
pairs AS (
  SELECT CASE WHEN (p1._ra - p2._ra) * (p1._rb - p2._rb) > 0
              THEN 1 ELSE 0 END AS _c,
         CASE WHEN (p1._ra - p2._ra) * (p1._rb - p2._rb) < 0
              THEN 1 ELSE 0 END AS _d
  FROM both_r p1 JOIN both_r p2
    ON p1.qid = p2.qid AND p1.nid < p2.nid
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS np,
         CAST(COALESCE(sum(_c), 0) AS BIGINT) AS c,
         CAST(COALESCE(sum(_d), 0) AS BIGINT) AS d
  FROM pairs
),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM both_r)
SELECT ni.n_items, s.np AS n_pairs, s.c AS concordant,
       s.d AS discordant,
       CASE WHEN s.np = 0 THEN 0.0
            ELSE CAST(s.c - s.d AS DOUBLE) / CAST(s.np AS DOUBLE)
       END AS tau
FROM s, ni
"""
