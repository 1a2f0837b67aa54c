"""Random-hyperplane LSH approximate nearest neighbors.

The LSH-bucketed similarity-search path the corpus brief names
alongside the IVF variant (and the search-side sibling of the SimHash
dedup sketch, ``pipeline/dedup.py:279`` — same hyperplane-sign family,
here with multiple independent tables and an exact re-rank instead of
a Hamming band join).

Scale shape: each row maps to ``n_tables`` (table, bucket) keys — a
skinny explode, never the vector payload times tables (signatures are
computed first, vectors joined back only for surviving candidates).
Candidates exist only where a query and a dataset row share a bucket
in some table, so the join is equi-key and partition-local after one
shuffle on (table, bucket); multi-probe widens recall without more
tables by also probing the ``n_probe_bits`` single-bit-flip
neighboring buckets of each query (query-side only — the dataset is
never re-keyed). Verification is candidates-only exact scoring + one
top-k merge. Recall grows with ``n_tables``/``n_probe_bits`` and
shrinks with ``n_planes`` (finer buckets); cost tracks bucket
collision counts, the standard LSH trade.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.functions.distance import distance_sql_spark, is_min_close
from cuvs_spark.operators.select_k import select_k

__all__ = ["lsh_planes", "lsh_buckets", "lsh_knn"]


def lsh_planes(dim: int, n_planes: int = 12, n_tables: int = 4,
               seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, shape
    ``(n_tables, n_planes, dim)``."""
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, 1.0, (n_tables, n_planes, dim))


def _lit_mat(m: np.ndarray) -> str:
    rows = ", ".join(
        f"array({', '.join(repr(float(x)) for x in r)})" for r in m)
    return f"array({rows})"


def _bucket_expr(planes_t: np.ndarray, vec_col: str) -> str:
    """Bucket id for one table: sign bits of the plane dot products,
    packed little-endian into a BIGINT. One HOF expression — O(1)
    generated code regardless of n_planes × dim (the PCA literal-matrix
    pattern; the array constant folds)."""
    mat = _lit_mat(planes_t)
    dot = (f"aggregate(zip_with({vec_col}, element_at({mat}, p), "
           f"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE), "
           f"(acc, v) -> acc + v)")
    return (f"aggregate(transform(sequence(1, {planes_t.shape[0]}), "
            f"p -> CASE WHEN {dot} >= 0 THEN shiftleft(CAST(1 AS BIGINT), "
            f"p - 1) ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), "
            f"(acc, b) -> acc + b)")


def lsh_buckets(df: DataFrame, planes: np.ndarray, *,
                id_col: str = "id", vec_col: str = "vec",
                out_id: str = "id", method: str = "blas") -> DataFrame:
    """(id, table, bucket) — one skinny row per (row, table).

    ``method='blas'`` (default) computes every table's sign bits as one
    Arrow-batched GEMM ``X @ P.T`` per partition — the signature pass
    is dense linear algebra, exactly the hot-path shape the engine
    always hands to mapInPandas. ``'expr'`` is the pure-JVM fallback
    (measured ~100× slower per row: the per-plane HOF dot re-walks the
    literal plane matrix per element)."""
    n_tables, n_planes, _dim = planes.shape
    if method == "expr":
        cols = [F.expr(_bucket_expr(planes[t], vec_col)).alias(f"_b{t}")
                for t in range(n_tables)]
        sig = df.select(F.col(id_col).cast("long").alias(out_id), *cols)
        pairs = ", ".join(
            f"struct(CAST({t} AS INT) AS table, _b{t} AS bucket)"
            for t in range(n_tables))
        return (sig.select(out_id, F.explode(F.expr(f"array({pairs})"))
                           .alias("tb"))
                .select(out_id, "tb.table", "tb.bucket"))
    import pandas as pd

    P = planes.reshape(n_tables * n_planes, -1).astype(np.float64)
    pw = (1 << np.arange(n_planes, dtype=np.int64))
    d = df.select(F.col(id_col).cast("long").alias(out_id),
                  F.col(vec_col).alias("_v"))

    def sig_parts(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
            bits = (X @ P.T) >= 0            # n × (tables·planes)
            B = (bits.reshape(len(X), n_tables, n_planes)
                 .astype(np.int64) * pw).sum(2)
            ids = pdf[out_id].to_numpy()
            yield pd.DataFrame({
                out_id: np.repeat(ids, n_tables),
                "table": np.tile(np.arange(n_tables, dtype=np.int32),
                                 len(X)),
                "bucket": B.reshape(-1)})

    return d.mapInPandas(sig_parts,
                         f"{out_id} long, table int, bucket long")


def lsh_knn(dataset: DataFrame, queries: DataFrame, k: int = 10, *,
            n_planes: int = 12, n_tables: int = 4, n_probe_bits: int = 0,
            metric: str = "cosine", seed: int = 42, dim: int | None = None,
            method: str = "blas",
            id_col: str = "id", vec_col: str = "vec",
            qid_col: str = "qid", qvec_col: str = "vec",
            broadcast_queries: bool | None = None,
            broadcast_query_limit: int = 500_000) -> DataFrame:
    """LSH-bucketed approximate kNN → ``(qid, nid, distance, rank)``.

    Candidates = rows sharing a (table, bucket) key with the query in
    any table (plus the query's ``n_probe_bits`` single-bit-flip probe
    buckets); exact ``metric`` re-rank on candidates only. Size
    ``n_planes ≈ log2(n / target_bucket_rows)`` — too few planes makes
    candidate sets approach the full cross product. Pass ``dim`` to
    keep the builder lazy (otherwise one head() row probes it).

    **Query-side bound.** The re-rank joins the query vectors back by
    ``qid`` — an equi-join, so unlike brute force there is no inherent
    small-side assumption: the broadcast hint is just the fast plan for
    the reference's 10k-query batch shape. ``broadcast_queries=None``
    (default) probes the query count with a cheap bounded id-only scan
    and drops the hint past ``broadcast_query_limit`` rows, letting a
    million-query join side run as an ordinary shuffle hash join (the
    100 TB-safe plan). Pass ``True``/``False`` to skip the probe."""
    d = dataset.select(F.col(id_col).cast("long").alias("nid"),
                       F.col(vec_col).alias("_dv"))
    q = queries.select(F.col(qid_col).cast("long").alias("qid"),
                       F.col(qvec_col).alias("_qv"))
    if dim is None:
        first = d.select("_dv").head()
        if first is None:
            raise ValueError(
                "lsh_knn: empty dataset and no dim= given — pass dim "
                "explicitly to search a possibly-empty table")
        dim = len(first["_dv"])
    planes = lsh_planes(dim, n_planes, n_tables, seed)
    db = lsh_buckets(d, planes, id_col="nid", vec_col="_dv",
                     out_id="nid", method=method)
    qb = lsh_buckets(q, planes, id_col="qid", vec_col="_qv",
                     out_id="qid", method=method)
    if n_probe_bits > 0:
        # multi-probe: flip each of the first n_probe_bits bits of the
        # QUERY bucket (query side stays tiny; dataset is never re-keyed)
        flips = ", ".join(
            f"CAST(bucket ^ shiftleft(CAST(1 AS BIGINT), {b}) AS BIGINT)"
            for b in range(min(n_probe_bits, n_planes)))
        qb = (qb.select("qid", "table", F.explode(F.expr(
                  f"array(bucket, {flips})")).alias("bucket")))
    cand = (qb.join(db, ["table", "bucket"])
            .select("qid", "nid").distinct())
    dist = F.expr(distance_sql_spark(metric, "_qv", "_dv"))
    if broadcast_queries is None:
        broadcast_queries = (q.select("qid")
                             .limit(broadcast_query_limit + 1)
                             .count() <= broadcast_query_limit)
    qj = F.broadcast(q) if broadcast_queries else q
    scored = (cand.join(d, "nid").join(qj, "qid")
              .select("qid", "nid", dist.alias("distance")))
    return select_k(scored, "qid", "distance", k,
                    select_min=is_min_close(metric), tie_cols=["nid"])
