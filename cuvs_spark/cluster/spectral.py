"""Spectral embedding + spectral clustering (SURVEY.md §2.2, §2.6).

Reference: ``cpp/include/cuvs/preprocessing/spectral_embedding.hpp:
28,118,203`` (Laplacian eigenmaps over a kNN connectivity graph) and
``cpp/include/cuvs/cluster/spectral.hpp:25,87`` (fit_predict =
embedding + k-means).

Spark design: the heavy stage — the kNN connectivity graph — is the
distributed job (``knn_self``/``all_neighbors``); the graph is then
n·k sparse edges. The eigensolve runs driver-side on the SPARSE
normalized Laplacian: CSR edges + Lanczos (``scipy.sparse.linalg
.eigsh``), so driver memory is O(n·k), never an n×n matrix (dense
``eigh`` only below _DENSE_MAX rows). A distributed Lanczos/power
iteration over edge-table matvecs is the >10⁸-row path — each matvec
is one groupBy-sum join, the classic Spark iterative kernel. Mirrors
the reference, whose eigensolver is likewise a single-GPU LOBPCG over
the assembled sparse matrix.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.cluster.kmeans import kmeans_fit, kmeans_predict
from cuvs_spark.operators.brute_force import knn_self


# Above this row count the dense-eigh fallback gives way to the sparse
# Lanczos path: driver memory is O(n·k) edges, never an n×n matrix.
_DENSE_MAX = 1024


def _laplacian_eig(dataset: DataFrame, k: int, metric: str, id_col: str,
                   vec_col: str, nev: int):
    """kNN connectivity graph → ``nev`` smallest eigenpairs of the
    normalized Laplacian.

    Driver memory is bounded by the n·k edge list (CSR) — the adjacency
    is NEVER densified at scale. The epsilon all-pairs coupling (which
    keeps a disconnected graph's 0-eigenspace non-degenerate) is
    applied *implicitly* inside the matvec as the rank-one term
    ``eps·(sum(x) − x)``, so it costs O(n), not O(n²). Eigenpairs come
    from Lanczos (``eigsh``) on ``2I − L`` (PSD, ‖L‖ ≤ 2), whose
    largest eigenvalues are L's smallest; at ≤ _DENSE_MAX rows a dense
    ``eigh`` keeps tiny cases exact and deterministic.
    """
    import scipy.sparse as sp

    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    ids = [r["id"] for r in d.select("id").orderBy("id").collect()]
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    edges = knn_self(d, k, metric).select("qid", "nid").collect()
    ri = np.array([pos[r["qid"]] for r in edges], dtype=np.int64)
    ci = np.array([pos[r["nid"]] for r in edges], dtype=np.int64)
    S = sp.coo_matrix((np.ones(len(ri)), (ri, ci)), shape=(n, n)).tocsr()
    S = S.maximum(S.T)
    S.data[:] = 1.0
    S.setdiag(0.0)
    S.eliminate_zeros()
    eps = 1e-6
    # A_full = (1-eps)·S + eps·(J - I); degrees follow the same split
    deg = (1.0 - eps) * np.asarray(S.sum(axis=1)).ravel() + eps * (n - 1)
    deg[deg == 0] = 1.0
    Dm12 = 1.0 / np.sqrt(deg)
    nev = max(1, min(nev, n - 1))
    if n <= _DENSE_MAX:
        A = (1.0 - eps) * S.toarray() + eps * (1.0 - np.eye(n))
        L = np.eye(n) - (Dm12[:, None] * A * Dm12[None, :])
        vals, vecs = np.linalg.eigh(L)
        order = np.argsort(vals)[:nev]
        return ids, vals[order], vecs[:, order], Dm12

    from scipy.sparse.linalg import LinearOperator, eigsh

    def mv(x):
        y = Dm12 * x
        ay = (1.0 - eps) * (S @ y) + eps * (y.sum() - y)
        return x + Dm12 * ay           # (2I − L) @ x

    M = LinearOperator((n, n), matvec=mv, dtype=np.float64)
    v0 = np.full(n, 1.0 / np.sqrt(n))  # fixed start → reproducible runs
    w, V = eigsh(M, k=nev, which="LA", v0=v0)
    lam = 2.0 - w
    order = np.argsort(lam)
    return ids, lam[order], V[:, order], Dm12


def spectral_embedding(dataset: DataFrame, n_components: int = 2, *,
                       k: int = 10, metric: str = "sqeuclidean",
                       id_col: str = "id",
                       vec_col: str = "vec") -> DataFrame:
    """Laplacian eigenmaps → ``(id, embedding array<float>)``: the
    ``n_components`` eigenvectors above the trivial one, rows scaled
    D^{-1/2} (manifold-learning form, spectral_embedding.hpp:118)."""
    ids, _, vecs, Dm12 = _laplacian_eig(dataset, k, metric, id_col, vec_col,
                                        n_components + 1)
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
                                     vec_col, n_clusters)
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
