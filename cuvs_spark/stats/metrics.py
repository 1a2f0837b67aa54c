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
