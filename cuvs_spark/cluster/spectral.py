"""Spectral embedding + spectral clustering (SURVEY.md §2.2, §2.6).

Reference: ``cpp/include/cuvs/preprocessing/spectral_embedding.hpp:
28,118,203`` (Laplacian eigenmaps over a kNN connectivity graph) and
``cpp/include/cuvs/cluster/spectral.hpp:25,87`` (fit_predict =
embedding + k-means).

Spark design: the heavy stage — the kNN connectivity graph — is the
distributed job (``knn_self``/``all_neighbors``); the graph is then
n·k sparse edges. The eigensolve runs driver-side on the sparse
normalized Laplacian (dense eigh here; a distributed Lanczos/power
iteration over edge-table matvecs is the >10⁷-row path — each matvec
is one groupBy-sum join, the classic Spark iterative kernel). Mirrors
the reference, whose eigensolver is likewise a single-GPU LOBPCG over
the assembled sparse matrix.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.cluster.kmeans import kmeans_fit, kmeans_predict
from cuvs_spark.operators.brute_force import knn_self


def _laplacian_eig(dataset: DataFrame, k: int, metric: str, id_col: str,
                   vec_col: str):
    """kNN connectivity graph → normalized Laplacian eigensystem."""
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    ids = [r["id"] for r in d.select("id").orderBy("id").collect()]
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    edges = knn_self(d, k, metric).select("qid", "nid").collect()
    # weak all-pairs coupling: a disconnected kNN graph has a degenerate
    # 0-eigenspace (one per component) whose arbitrary basis loses
    # cluster information; epsilon-coupling makes the trivial
    # eigenvector unique and keeps components in separate eigenvectors.
    eps = 1e-6
    A = np.full((n, n), eps)
    np.fill_diagonal(A, 0.0)
    for r in edges:
        i, j = pos[r["qid"]], pos[r["nid"]]
        A[i, j] = 1.0
        A[j, i] = 1.0
    deg = A.sum(1)
    deg[deg == 0] = 1.0
    Dm12 = 1.0 / np.sqrt(deg)
    L = np.eye(n) - (Dm12[:, None] * A * Dm12[None, :])
    vals, vecs = np.linalg.eigh(L)
    order = np.argsort(vals)
    return ids, vals[order], vecs[:, order], Dm12


def spectral_embedding(dataset: DataFrame, n_components: int = 2, *,
                       k: int = 10, metric: str = "sqeuclidean",
                       id_col: str = "id",
                       vec_col: str = "vec") -> DataFrame:
    """Laplacian eigenmaps → ``(id, embedding array<float>)``: the
    ``n_components`` eigenvectors above the trivial one, rows scaled
    D^{-1/2} (manifold-learning form, spectral_embedding.hpp:118)."""
    ids, _, vecs, Dm12 = _laplacian_eig(dataset, k, metric, id_col, vec_col)
    take = vecs[:, 1:n_components + 1] * Dm12[:, None]
    for c in range(take.shape[1]):
        j = int(np.argmax(np.abs(take[:, c])))
        if take[j, c] < 0:
            take[:, c] = -take[:, c]
    spark = dataset.sparkSession
    rows = [(int(ids[i]), [float(x) for x in take[i]])
            for i in range(len(ids))]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def spectral_fit_predict(dataset: DataFrame, n_clusters: int, *,
                         k: int = 10, seed: int = 42, id_col: str = "id",
                         vec_col: str = "vec", n_init: int = 4,
                         max_iter: int = 20) -> DataFrame:
    """``spectral.hpp:87`` fit_predict → (id, label).

    Ng–Jordan–Weiss: take the first ``n_clusters`` eigenvectors of the
    normalized Laplacian *including* the trivial one and row-normalize
    to the unit sphere before k-means — higher eigenvectors encode
    within-cluster structure and must not dominate (which is exactly
    what happens with the raw eigenmap embedding)."""
    ids, _, vecs, _ = _laplacian_eig(dataset, k, "sqeuclidean", id_col,
                                     vec_col)
    U = vecs[:, :n_clusters]
    norms = np.linalg.norm(U, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    U = U / norms
    spark = dataset.sparkSession
    emb = spark.createDataFrame(
        [(int(ids[i]), [float(x) for x in U[i]]) for i in range(len(ids))],
        "id long, embedding array<float>")
    model = kmeans_fit(emb, n_clusters, max_iter=max_iter, seed=seed,
                       vec_col="embedding", n_init=n_init)
    return kmeans_predict(emb, model, vec_col="embedding")
