"""Product quantizer (SURVEY.md §2.2).

Reference: ``python/cuvs/cuvs/preprocessing/quantize/pq.pyx:198,247,314``
(build trains a codebook per subspace — ``pq_bits∈[4,16]``, ``pq_dim``,
``kmeans_n_iters=25``; transform encodes vectors to per-subspace code
ids; inverse_transform decodes). ``codebook_kind=subspace``
(``ivf_pq.pyx:40-172``) is the trained layout.

Spark design: a vector splits into ``pq_dim`` subvectors
(``slice(vec, ...)`` — a zero-copy projection); per-subspace k-means
runs over the exploded (id, sub, subvec) relation; encode is an
argmin broadcast-join per subspace with map-side min-struct combine
(same shape as kmeans.assign — shuffle is one row per (id, sub));
decode is a broadcast lookup join + sorted flatten. Codes are
``array<int>`` (one byte-sized id per subspace) — 64-dim float32 →
8 bytes at pq_dim=8, the same 32× compression the reference gets.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import distance_sql_spark


@dataclass
class PQCodebook:
    codebook: np.ndarray        # (pq_dim, n_codes, sub_width) float64

    @property
    def pq_dim(self) -> int:
        return self.codebook.shape[0]

    @property
    def n_codes(self) -> int:
        return self.codebook.shape[1]

    def to_df(self, spark) -> DataFrame:
        rows = [(s, c, [float(x) for x in self.codebook[s, c]])
                for s in range(self.pq_dim) for c in range(self.n_codes)]
        return spark.createDataFrame(rows,
                                     "sub int, code int, centroid array<float>")


def _subvecs(df: DataFrame, pq_dim: int, *, id_col: str,
             vec_col: str) -> DataFrame:
    """(id, sub, subvec) — one row per subspace slice."""
    d = df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(vec_col).alias("_v"))
    w = f"CAST(size(_v) / {pq_dim} AS INT)"
    return (d.select("id", F.explode(F.expr(
        f"transform(sequence(0, {pq_dim} - 1), "
        f"s -> struct(s AS sub, slice(_v, s * {w} + 1, {w}) AS subvec))"))
        .alias("e"))
        .select("id", F.col("e.sub").alias("sub"),
                F.col("e.subvec").alias("subvec")))


def pq_build(df: DataFrame, pq_dim: int = 8, pq_bits: int = 4, *,
             kmeans_n_iters: int = 10, seed: int = 42, id_col: str = "id",
             vec_col: str = "vec",
             max_train_rows: int = 20000) -> PQCodebook:
    """Train per-subspace codebooks (k = 2^pq_bits) — ``pq.pyx:198``.

    Uses ``max_train_rows`` seeded subsampling, mirroring the
    reference's ``max_train_points_per_pq_code`` guard. The capped
    sample is collected ONCE and all per-subspace Lloyd loops run
    driver-side in NumPy — one Spark job instead of
    ``pq_dim * kmeans_n_iters``; the sample bound (not the dataset
    size) fixes driver memory, so this is the 100 TB shape too (the
    reference likewise trains on a host-side subsample)."""
    n_codes = 1 << pq_bits
    d = df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(vec_col).alias("vec"))
    sample = (d.withColumn("_h", F.xxhash64("id", F.lit(seed)))
              .orderBy("_h", "id").limit(max_train_rows)
              .select("vec").collect())
    if not sample:
        raise ValueError("cannot train PQ codebook on empty input")
    X = np.array([r["vec"] for r in sample], dtype=np.float64)
    w = X.shape[1] // pq_dim
    rng = np.random.default_rng(seed)
    books = []
    for s in range(pq_dim):
        S = X[:, s * w:(s + 1) * w]
        C = S[rng.choice(len(S), min(n_codes, len(S)), replace=False)]
        if len(C) < n_codes:  # degenerate tiny input: pad with repeats
            C = np.vstack([C, C[rng.integers(0, len(C),
                                             n_codes - len(C))]])
        for _ in range(kmeans_n_iters):
            D = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            lab = D.argmin(1)
            for j in range(n_codes):
                if (lab == j).any():
                    C[j] = S[lab == j].mean(0)
        books.append(C.copy())
    return PQCodebook(codebook=np.stack(books))


def pq_transform(df: DataFrame, book: PQCodebook | DataFrame, *,
                 id_col: str = "id", vec_col: str = "vec",
                 method: str = "expr") -> DataFrame:
    """Encode → ``(id, codes array<int>)``: per-subspace argmin vs the
    broadcast codebook, ties to the lowest code id.

    ``method="blas"`` encodes each Arrow batch against the codebook
    tensor in one NumPy pass (map-only, no subvector explosion or
    argmin shuffle) — the bulk-encode path for index builds at scale.
    """
    spark = df.sparkSession
    cb = book if isinstance(book, DataFrame) else book.to_df(spark)
    pq_dim = (book.pq_dim if isinstance(book, PQCodebook)
              else cb.agg(F.max("sub")).head()[0] + 1)
    if method == "blas":
        import pandas as pd
        cb_rows = cb.collect()
        S = pq_dim
        n_codes = max(r["code"] for r in cb_rows) + 1
        w = len(cb_rows[0]["centroid"])
        CB = np.zeros((S, n_codes, w))
        for r in cb_rows:
            CB[r["sub"], r["code"]] = r["centroid"]
        d = df.select(F.col(id_col).cast("long").alias("id"),
                      F.col(vec_col).alias("vec"))

        def encode(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                # slice off remainder dims first (dim % pq_dim != 0) to
                # match the expr path's _subvecs floor-width semantics
                X3 = X[:, :S * w].reshape(len(X), S, w)
                D = ((X3[:, :, None, :] - CB[None]) ** 2).sum(-1)
                codes = D.argmin(-1).astype(np.int32)   # (n, S)
                yield pd.DataFrame({"id": pdf["id"],
                                    "codes": list(codes)})

        return d.mapInPandas(encode, "id long, codes array<int>")
    sv = _subvecs(df, pq_dim, id_col=id_col, vec_col=vec_col)
    dist = F.expr(distance_sql_spark("sqeuclidean", "subvec", "centroid"))
    best = (sv.join(F.broadcast(cb), "sub")
            .select("id", "sub",
                    F.struct(dist.alias("d"), F.col("code").alias("c"))
                    .alias("_s"))
            .groupBy("id", "sub").agg(F.min("_s").alias("_b"))
            .select("id", "sub", F.col("_b.c").alias("code")))
    return (best.groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("sub", "code")))
                 .alias("_sc"))
            .select("id", F.expr("transform(_sc, x -> x.code)").alias("codes")))


def pq_inverse_transform(codes_df: DataFrame, book: PQCodebook | DataFrame, *,
                         id_col: str = "id",
                         codes_col: str = "codes") -> DataFrame:
    """Decode → ``(id, vec array<float>)``: lookup join + ordered
    flatten (``pq.pyx:314``)."""
    spark = codes_df.sparkSession
    cb = book if isinstance(book, DataFrame) else book.to_df(spark)
    d = codes_df.select(F.col(id_col).cast("long").alias("id"),
                        F.posexplode(codes_col).alias("sub", "code"))
    joined = d.join(F.broadcast(cb), ["sub", "code"])
    return (joined.groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("sub", "centroid")))
                 .alias("_sc"))
            .select("id", F.expr(
                "flatten(transform(_sc, x -> x.centroid))").alias("vec")))


# ---------------------------------------------------------------------------
# DuckDB oracle twins (fixed codebook passed as a subquery (sub, code,
# centroid)); same join/argmin/flatten structure.
# ---------------------------------------------------------------------------

def pq_transform_sql(dataset_sql: str, codebook_sql: str, pq_dim: int) -> str:
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dist = distance_sql_duckdb("sqeuclidean", "sv.subvec", "cb.centroid")
    return f"""
WITH d AS ({dataset_sql}), cb AS ({codebook_sql}),
sv AS (
  SELECT d.id AS id, s.sub AS sub,
         d.dv[(s.sub * (len(d.dv) // {pq_dim}) + 1):
              ((s.sub + 1) * (len(d.dv) // {pq_dim}))] AS subvec
  FROM d, (SELECT unnest(range({pq_dim})) AS sub) s
),
best AS (
  SELECT id, sub, code FROM (
    SELECT sv.id, sv.sub, cb.code,
           row_number() OVER (PARTITION BY sv.id, sv.sub
                              ORDER BY {dist} ASC, cb.code ASC) AS rn
    FROM sv JOIN cb ON sv.sub = cb.sub) WHERE rn = 1
)
SELECT id, list(code ORDER BY sub) AS codes FROM best GROUP BY id
"""


def pq_inverse_sql(codes_sql: str, codebook_sql: str) -> str:
    return f"""
WITH c AS ({codes_sql}), cb AS ({codebook_sql}),
ex AS (
  SELECT id, CAST(generate_subscripts(codes, 1) AS INT) - 1 AS sub,
         unnest(codes) AS code
  FROM c
)
SELECT ex.id AS id,
       flatten(list(cb.centroid ORDER BY ex.sub)) AS vec
FROM ex JOIN cb ON ex.sub = cb.sub AND ex.code = cb.code
GROUP BY ex.id
"""
