"""Spectral embedding + spectral clustering (SURVEY.md §2.2, §2.6).

Reference: ``cpp/include/cuvs/preprocessing/spectral_embedding.hpp:
28,118,203`` (Laplacian eigenmaps over a kNN connectivity graph) and
``cpp/include/cuvs/cluster/spectral.hpp:25,87`` (fit_predict =
embedding + k-means).

Spark design: the heavy stage — the kNN connectivity graph — is the
distributed job (``knn_self``/``all_neighbors``); the graph is then
n·k sparse edges. The eigensolve runs driver-side on the SPARSE
normalized Laplacian: edge arrays + an iterative matvec solver
(scipy Lanczos when present, else a pure-NumPy subspace iteration),
so driver memory is O(n·k), never an n×n matrix (dense ``eigh`` only
below _DENSE_MAX rows). A distributed Lanczos/power iteration over
edge-table matvecs is the >10⁸-row path — each matvec is one
groupBy-sum join, the classic Spark iterative kernel. Mirrors the
reference, whose eigensolver is likewise a single-GPU LOBPCG over the
assembled sparse matrix.
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
                   vec_col: str, nev: int, graph_method: str = "exact"):
    """kNN connectivity graph → ``nev`` smallest eigenpairs of the
    normalized Laplacian.

    Driver memory is bounded by the n·k edge list — the adjacency is
    NEVER densified at scale. The epsilon all-pairs coupling (which
    keeps a disconnected graph's 0-eigenspace non-degenerate) is
    applied *implicitly* inside the matvec as the rank-one term
    ``eps·(sum(x) − x)``, so it costs O(n), not O(n²). Eigenpairs come
    from an iterative solve on ``2I − L`` (PSD, ‖L‖ ≤ 2), whose largest
    eigenvalues are L's smallest: ``scipy``'s Lanczos when available,
    else a pure-NumPy orthogonal (subspace) iteration with
    Rayleigh–Ritz — every step is the same O(n·k) edge-array matvec
    (``bincount`` gather-sum), no external dependency. At ≤ _DENSE_MAX
    rows a dense ``eigh`` keeps tiny cases exact and deterministic.
    """
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    ids = [r["id"] for r in d.select("id").orderBy("id").collect()]
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    if graph_method == "approx":
        # the scale path: partitioned approximate kNN graph (the
        # all_neighbors batching blueprint) instead of the n² self-join
        from cuvs_spark.operators.graph import all_neighbors_build
        g = all_neighbors_build(d, k, metric=metric, method="blas",
                                n_clusters=max(8, n // 4000),
                                overlap_factor=2)
        edges = (g.select(F.col("src").alias("qid"),
                          F.col("dst").alias("nid")).collect())
    else:
        edges = knn_self(d, k, metric,
                         method="blas" if graph_method == "blas"
                         else "expr").select("qid", "nid").collect()
    ri0 = np.array([pos[r["qid"]] for r in edges], dtype=np.int64)
    ci0 = np.array([pos[r["nid"]] for r in edges], dtype=np.int64)
    keep = ri0 != ci0
    ri0, ci0 = ri0[keep], ci0[keep]
    # symmetrize + dedup via packed (i, j) keys
    key = np.unique(np.concatenate([ri0 * n + ci0, ci0 * n + ri0]))
    ri, ci = key // n, key % n
    eps = 1e-6
    # A_full = (1-eps)·S + eps·(J - I); degrees follow the same split
    deg = ((1.0 - eps) * np.bincount(ri, minlength=n).astype(np.float64)
           + eps * (n - 1))
    deg[deg == 0] = 1.0
    Dm12 = 1.0 / np.sqrt(deg)
    nev = max(1, min(nev, n - 1))
    if n <= _DENSE_MAX:
        A = np.full((n, n), eps)
        np.fill_diagonal(A, 0.0)
        A[ri, ci] = 1.0
        L = np.eye(n) - (Dm12[:, None] * A * Dm12[None, :])
        vals, vecs = np.linalg.eigh(L)
        order = np.argsort(vals)[:nev]
        return ids, vals[order], vecs[:, order], Dm12

    def mv(x):                          # (2I − L) @ x, O(edges)
        y = Dm12 * x
        ay = ((1.0 - eps) * np.bincount(ri, weights=y[ci], minlength=n)
              + eps * (y.sum() - y))
        return x + Dm12 * ay

    try:
        from scipy.sparse.linalg import LinearOperator, eigsh
        M = LinearOperator((n, n), matvec=mv, dtype=np.float64)
        v0 = np.full(n, 1.0 / np.sqrt(n))   # fixed start → reproducible
        w, V = eigsh(M, k=nev, which="LA", v0=v0)
    except ImportError:
        w, V = _subspace_iteration(mv, n, nev)
    lam = 2.0 - w
    order = np.argsort(lam)
    return ids, lam[order], V[:, order], Dm12


def _subspace_iteration(mv, n: int, nev: int, *, extra: int = 4,
                        max_iter: int = 300, tol: float = 1e-9):
    """Orthogonal iteration + Rayleigh–Ritz for the top ``nev``
    eigenpairs of a symmetric PSD operator given only its matvec.
    Deterministic (seeded start); the guard block of ``extra`` vectors
    absorbs slow convergence at the spectral gap."""
    b = min(n, nev + extra)
    rng = np.random.default_rng(0)
    V = np.linalg.qr(rng.standard_normal((n, b)))[0]
    prev = None
    for it in range(max_iter):
        W = np.column_stack([mv(V[:, j]) for j in range(b)])
        V, _ = np.linalg.qr(W)
        if it % 5 == 4 or it == max_iter - 1:
            AV = np.column_stack([mv(V[:, j]) for j in range(b)])
            H = V.T @ AV
            w, U = np.linalg.eigh((H + H.T) / 2.0)
            if prev is not None and np.max(np.abs(w - prev)) < tol:
                V = V @ U
                return w[::-1][:nev], V[:, ::-1][:, :nev]
            prev = w
    V = V @ U
    return w[::-1][:nev], V[:, ::-1][:, :nev]


def _distributed_block_operator(edges: DataFrame, n: int, eps: float,
                                Dm12: np.ndarray):
    """Block matvec ``Y -> (2I − L) @ Y`` where the adjacency lives in a
    Spark edge table — the >10⁸-row path the driver-side ``bincount``
    cannot hold.  One Spark job per call: the n×b Krylov block is
    broadcast (b·n doubles — the ONLY driver-held state), each edge
    partition computes pandas groupby partial row-sums (map-side
    combine; edges are hash-partitioned by row index once and cached,
    so partials are already per-row disjoint across partitions), and
    the driver scatter-adds the ≈n partial rows.  The epsilon all-pairs
    coupling stays the implicit rank-one term — O(n), never an n² join.

    Reference parity: ``spectral_embedding.hpp:118`` assembles the same
    normalized-Laplacian operator for a single-GPU LOBPCG; here the
    operator application itself is distributed.
    """
    spark = edges.sparkSession
    sc = spark.sparkContext
    part = (edges.repartition(sc.defaultParallelism, "i")
            .persist())
    part.count()                        # materialize the cached layout once

    def mvb(Y: np.ndarray) -> np.ndarray:
        b = Y.shape[1]
        W = Dm12[:, None] * Y
        bW = sc.broadcast(W)
        cols = [f"c{t}" for t in range(b)]
        schema = "i long, " + ", ".join(f"{c} double" for c in cols)

        def part_sum(batches):
            # aggregate across ALL Arrow batches of the partition before
            # emitting: rows shipped to the driver are the partition's
            # unique row indices (disjoint across partitions thanks to
            # the hash layout) — Σ ≈ n per iteration, never Σ ≈ edges
            import pandas as pd
            parts = []
            for pdf in batches:
                vals = bW.value[pdf["j"].to_numpy()]
                out = pd.DataFrame(vals, columns=cols)
                out["i"] = pdf["i"].to_numpy()
                parts.append(out.groupby("i", sort=False,
                                         as_index=False).sum())
            if parts:
                allp = pd.concat(parts, ignore_index=True)
                g = allp.groupby("i", sort=False, as_index=False).sum()
                yield g[["i"] + cols]

        got = part.mapInPandas(part_sum, schema).toPandas()
        SW = np.zeros((n, b))
        np.add.at(SW, got["i"].to_numpy(),
                  got[cols].to_numpy(dtype=np.float64))
        bW.destroy()
        AW = (1.0 - eps) * SW + eps * (W.sum(axis=0)[None, :] - W)
        return Y + Dm12[:, None] * AW

    return mvb, part


def _subspace_iteration_block(mvb, n: int, nev: int, *, extra: int = 4,
                              max_iter: int = 60, tol: float = 1e-7):
    """Orthogonal iteration with a BLOCK operator: one operator
    application (= one Spark job on the distributed path) per
    iteration, Rayleigh–Ritz for free from ``H = Vᵀ(AV)`` — no second
    matvec per convergence check."""
    b = min(n, nev + extra)
    rng = np.random.default_rng(0)
    V = np.linalg.qr(rng.standard_normal((n, b)))[0]
    prev = None
    for _ in range(max_iter):
        W = mvb(V)
        H = V.T @ W
        w, U = np.linalg.eigh((H + H.T) / 2.0)
        if prev is not None and np.max(np.abs(w - prev)) < tol:
            R = V @ U
            return w[::-1][:nev], R[:, ::-1][:, :nev]
        prev = w
        V, _ = np.linalg.qr(W)
    R = V @ U
    return w[::-1][:nev], R[:, ::-1][:, :nev]


def spectral_embedding_from_edges(edges: DataFrame, n_components: int = 2, *,
                                  n: int | None = None,
                                  src_col: str = "src", dst_col: str = "dst",
                                  max_iter: int = 60,
                                  tol: float = 1e-7) -> DataFrame:
    """Laplacian eigenmaps over a PREBUILT similarity edge table with a
    fully distributed operator — the ≥10⁶-row scale path
    (``spectral_embedding.hpp:203`` takes the same precomputed
    connectivity).  Vertex ids must be ``0..n-1`` (the natural output
    of the kNN-graph builders after ``row_number`` densification);
    symmetrization, dedup and degrees all run as Spark jobs, the driver
    holds only O(n·b): the Krylov block, degrees and the result.

    Returns ``(id, embedding array<float>)`` rows scaled D^{-1/2},
    trivial eigenvector dropped — same contract as
    :func:`spectral_embedding`.
    """
    e = (edges.select(F.col(src_col).cast("long").alias("i"),
                      F.col(dst_col).cast("long").alias("j"))
         .filter(F.col("i") != F.col("j")))
    sym = (e.unionByName(e.select(F.col("j").alias("i"),
                                  F.col("i").alias("j")))
           .distinct())
    if n is None:
        n = int(sym.agg(F.max(F.greatest("i", "j"))).head()[0]) + 1
    eps = 1e-6
    degrees = sym.groupBy("i").count().toPandas()
    cnt = np.zeros(n)
    cnt[degrees["i"].to_numpy()] = degrees["count"].to_numpy()
    deg = (1.0 - eps) * cnt + eps * (n - 1)
    deg[deg == 0] = 1.0
    Dm12 = 1.0 / np.sqrt(deg)
    nev = max(1, min(n_components + 1, n - 1))
    mvb, cached = _distributed_block_operator(sym, n, eps, Dm12)
    try:
        w, V = _subspace_iteration_block(mvb, n, nev, max_iter=max_iter,
                                         tol=tol)
    finally:
        cached.unpersist()
    take = V[:, 1:nev] * Dm12[:, None]
    for c in range(take.shape[1]):
        jmx = int(np.argmax(np.abs(take[:, c])))
        if take[jmx, c] < 0:
            take[:, c] = -take[:, c]
    import pandas as pd
    spark = edges.sparkSession
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                        "embedding": [row.astype(np.float32)
                                      for row in take]})
    return spark.createDataFrame(pdf, "id long, embedding array<float>")


def spectral_embedding(dataset: DataFrame, n_components: int = 2, *,
                       k: int = 10, metric: str = "sqeuclidean",
                       id_col: str = "id", vec_col: str = "vec",
                       graph_method: str = "exact") -> DataFrame:
    """Laplacian eigenmaps → ``(id, embedding array<float>)``: the
    ``n_components`` eigenvectors above the trivial one, rows scaled
    D^{-1/2} (manifold-learning form, spectral_embedding.hpp:118).
    ``graph_method='approx'`` swaps the n² kNN self-join for the
    partitioned all_neighbors graph — the ≥10⁵-row path."""
    ids, _, vecs, Dm12 = _laplacian_eig(dataset, k, metric, id_col, vec_col,
                                        n_components + 1, graph_method)
    take = vecs[:, 1:n_components + 1] * Dm12[:, None]
    for c in range(take.shape[1]):
        j = int(np.argmax(np.abs(take[:, c])))
        if take[j, c] < 0:
            take[:, c] = -take[:, c]
    spark = dataset.sparkSession
    rows = [(int(ids[i]), [float(x) for x in take[i]])
            for i in range(len(ids))]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


# Integer grids for the power-iteration chain (see
# preprocessing/pca.py for why EXACT INTEGER STATE — not per-step
# ROUND — is required for cross-engine hash equality of iterated
# float chains). _NG scales the normalized-adjacency weights and the
# analytic trivial eigenvector; _VG the iterated vector.
_NG = 1_000_000
_VG = 10_000


def spectral_power_embed(edges: DataFrame, n_components: int = 1,
                         n_iter: int = 3, *, src_col: str = "src",
                         dst_col: str = "dst") -> DataFrame:
    """Fixed-iteration spectral embedding by power iteration on the
    shifted operator ``M = I + D^{-1/2} A D^{-1/2}`` of a PREBUILT
    connectivity edge table → ``(component, i, val)`` rows plus one
    ``i = -1`` Laplacian-eigenvalue row per component (``λ_L = 2 −
    λ_M``). Component 0 is the first NON-trivial eigenvector: the
    trivial one is ``D^{1/2}·1`` ANALYTICALLY (``M(D^{1/2}1) =
    2·D^{1/2}1`` exactly for a connected, eps-free graph), so it is
    deflated by exact Gram–Schmidt against the known vector rather
    than found iteratively.

    Reference semantics: ``spectral_embedding.hpp:118`` (Laplacian
    eigenmaps over a kNN connectivity graph; its LOBPCG is an
    iterative eigensolver whose iteration budget is part of the
    contract). The at-scale default stays :func:`spectral_embedding`
    (edge-array Lanczos / distributed block operator); THIS path is
    the oracle/gate construction (:func:`spectral_power_sql` is its
    unrolled DuckDB twin, the eigensolver family's rows-only →
    hash-exact conversion).

    Parity design — exact integer state end to end: degrees are exact
    BIGINT counts of the symmetrized, de-duplicated, loop-free edge
    set; the per-edge normalized weight ``floor(_NG /
    sqrt(cnt_i·cnt_j) + 0.5)`` and the trivial vector
    ``floor(sqrt(cnt_i)·_NG + 0.5)`` are per-entry float ops on
    identical integers (both engines produce identical doubles →
    identical floors); every matvec and inner product is an exact
    int64 / decimal(38,0)↔HUGEINT sum (order-independent); the only
    re-quantizations (`floor(x + 0.5)`) consume per-entry doubles
    computed from identical integers. eps-coupling is intentionally 0
    here — the gate assumes a connected graph (kNN graphs at gate
    scale are; the production path keeps the implicit rank-one
    eps term). Isolated vertices never enter (no edges)."""
    e = (edges.select(F.col(src_col).cast("long").alias("i"),
                      F.col(dst_col).cast("long").alias("j"))
         .filter(F.col("i") != F.col("j")))
    sym = (e.unionByName(e.select(F.col("j").alias("i"),
                                  F.col("i").alias("j")))
           .distinct().localCheckpoint())
    cnt = sym.groupBy("i").agg(F.count("*").alias("cnt")).localCheckpoint()
    u = cnt.select("i", F.floor(
        F.sqrt(F.col("cnt").cast("double")) * _NG + F.lit(0.5))
        .cast("long").alias("u")).localCheckpoint()
    ci = cnt.select(F.col("i"), F.col("cnt").alias("_ci"))
    cj = cnt.select(F.col("i").alias("j"), F.col("cnt").alias("_cj"))
    nw = (sym.join(ci, "i").join(cj, "j")
          .select("i", "j", F.floor(
              F.lit(float(_NG))
              / F.sqrt((F.col("_ci") * F.col("_cj")).cast("double"))
              + F.lit(0.5)).cast("long").alias("w"))
          .localCheckpoint())
    dec = "decimal(19,0)"

    def matvec(v: DataFrame) -> DataFrame:
        # Y on the _NG·_VG grid: Y_i = V_i·_NG + Σ_j w_ij·V_j (exact)
        s = (nw.join(v.withColumnRenamed("i", "j"), "j")
             .groupBy("i").agg(F.sum(F.col("w") * F.col("v")).alias("s")))
        return (v.join(s, "i")
                .select("i", (F.col("v") * _NG + F.col("s")).alias("y")))

    prev: list[DataFrame] = []
    out = None
    for comp in range(n_components):
        v = cnt.select(
            "i", (((F.col("i") * 37 + 11) % 97 + 1) * (_VG // 100))
            .cast("long").alias("v"))
        for _ in range(n_iter):
            y = matvec(v)
            # exact Gram–Schmidt vs the analytic trivial vector
            # (grid _NG): Z = Y − (ΣUY/ΣU²)·U, per-entry double floor
            # _d in decimal(38,0) like _n (↔ the twin's HUGEINT,
            # ADVICE r11 #1): a plain long sum of u² wraps silently
            # near ~1e6 vertices where DuckDB keeps exact int128
            c0 = (y.join(u, "i")
                  .agg(F.sum(F.col("u").cast(dec) * F.col("y").cast(dec))
                       .alias("_n"),
                       F.sum(F.col("u").cast(dec) * F.col("u").cast(dec))
                       .alias("_d"))
                  .select((F.col("_n").cast("double")
                           / F.col("_d").cast("double")).alias("c")))
            z = (y.join(u, "i").crossJoin(F.broadcast(c0))
                 .select("i", F.floor(
                     F.col("y").cast("double")
                     - F.col("c") * F.col("u").cast("double")
                     + F.lit(0.5)).cast("long").alias("z")))
            for p in prev:
                # …and vs each already-found component (grid _VG):
                # Z ← Z − (ΣPZ/ΣP²)·P·_NG (P in Z's units is P·_NG)
                cp = (z.join(p, "i")
                      .agg(F.sum(F.col("p").cast(dec)
                                 * F.col("z").cast(dec)).alias("_n"),
                           F.sum(F.col("p").cast(dec) * F.col("p").cast(dec))
                           .alias("_d"))
                      .select((F.col("_n").cast("double")
                               / (F.col("_d").cast("double") * float(_NG)))
                              .alias("c")))
                z = (z.join(p, "i").crossJoin(F.broadcast(cp))
                     .select("i", F.floor(
                         F.col("z").cast("double")
                         - F.col("c") * F.col("p").cast("double")
                         * float(_NG) + F.lit(0.5)).cast("long")
                         .alias("z")))
            ss = z.agg(F.sum(F.col("z").cast(dec) * F.col("z").cast(dec))
                       .alias("ss"))
            v = (z.crossJoin(F.broadcast(ss))
                 .select("i", F.floor(
                     F.col("z").cast("double") * _VG
                     / F.sqrt(F.col("ss").cast("double")) + F.lit(0.5))
                     .cast("long").alias("v"))
                 .localCheckpoint())
        yf = matvec(v)
        lam = (yf.join(v, "i")
               .agg(F.sum(F.col("v").cast(dec) * F.col("y").cast(dec))
                    .alias("_n"),
                    F.sum(F.col("v").cast(dec) * F.col("v").cast(dec))
                    .alias("_d"))
               .select((F.lit(2.0) - F.col("_n").cast("double")
                        / (F.col("_d").cast("double") * float(_NG)))
                       .alias("lam")))
        rows = (v.select(F.lit(comp).cast("long").alias("component"),
                         F.col("i").cast("long").alias("i"),
                         (F.col("v").cast("double") / float(_VG))
                         .alias("val"))
                .unionByName(
                    lam.select(F.lit(comp).cast("long").alias("component"),
                               F.lit(-1).cast("long").alias("i"),
                               F.col("lam").alias("val"))))
        out = rows if out is None else out.unionByName(rows)
        prev.append(v.withColumnRenamed("v", "p"))
    return out


def spectral_power_sql(edges_sql: str, n_components: int = 1,
                       n_iter: int = 3) -> str:
    """DuckDB twin of :func:`spectral_power_embed` (unrolled per
    component × iteration; HUGEINT is the int128 analog of the Spark
    side's decimal(38,0) sums). ``edges_sql`` → ``(src, dst)``."""
    parts = [f"""e0 AS (
  SELECT CAST(src AS BIGINT) AS i, CAST(dst AS BIGINT) AS j
  FROM ({edges_sql}) WHERE src <> dst),
sym AS MATERIALIZED (
  SELECT DISTINCT i, j FROM (
    SELECT i, j FROM e0 UNION ALL SELECT j AS i, i AS j FROM e0)),
cnt AS MATERIALIZED (SELECT i, count(*) AS cnt FROM sym GROUP BY i),
u AS MATERIALIZED (
  SELECT i, CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * {_NG} + 0.5)
                 AS BIGINT) AS u
  FROM cnt),
nw AS MATERIALIZED (
  SELECT s.i AS i, s.j AS j,
         CAST(floor({float(_NG)!r}
                    / sqrt(CAST(ci.cnt * cj.cnt AS DOUBLE)) + 0.5)
              AS BIGINT) AS w
  FROM sym s JOIN cnt ci ON ci.i = s.i JOIN cnt cj ON cj.i = s.j)"""]
    selects = []
    prev = []
    for comp in range(n_components):
        parts.append(f"""
v_{comp}_0 AS MATERIALIZED (
  SELECT i, CAST(((i * 37 + 11) % 97 + 1) * {_VG // 100} AS BIGINT) AS v
  FROM cnt)""")
        for t in range(1, n_iter + 1):
            vp = f"v_{comp}_{t - 1}"
            parts.append(f"""
y_{comp}_{t} AS MATERIALIZED (
  SELECT vv.i AS i, vv.v * {_NG} + s.s AS y
  FROM {vp} vv JOIN (
    SELECT nw.i AS i, CAST(sum(nw.w * vj.v) AS BIGINT) AS s
    FROM nw JOIN {vp} vj ON vj.i = nw.j GROUP BY nw.i) s
  ON s.i = vv.i),
c0_{comp}_{t} AS MATERIALIZED (
  SELECT CAST(sum(CAST(u.u AS HUGEINT) * y.y) AS DOUBLE)
         / CAST(sum(CAST(u.u AS HUGEINT) * u.u) AS DOUBLE) AS c
  FROM y_{comp}_{t} y JOIN u ON u.i = y.i),
z0_{comp}_{t} AS MATERIALIZED (
  SELECT y.i AS i,
         CAST(floor(CAST(y.y AS DOUBLE)
                    - (SELECT c FROM c0_{comp}_{t})
                      * CAST(u.u AS DOUBLE) + 0.5) AS BIGINT) AS z
  FROM y_{comp}_{t} y JOIN u ON u.i = y.i)""")
            zname = f"z0_{comp}_{t}"
            for pi, pname in enumerate(prev):
                parts.append(f"""
cp{pi}_{comp}_{t} AS MATERIALIZED (
  SELECT CAST(sum(CAST(p.v AS HUGEINT) * z.z) AS DOUBLE)
         / (CAST(sum(CAST(p.v AS HUGEINT) * p.v) AS DOUBLE)
            * {float(_NG)!r}) AS c
  FROM {zname} z JOIN {pname} p ON p.i = z.i),
z{pi + 1}_{comp}_{t} AS MATERIALIZED (
  SELECT z.i AS i,
         CAST(floor(CAST(z.z AS DOUBLE)
                    - (SELECT c FROM cp{pi}_{comp}_{t})
                      * CAST(p.v AS DOUBLE) * {float(_NG)!r} + 0.5)
              AS BIGINT) AS z
  FROM {zname} z JOIN {pname} p ON p.i = z.i)""")
                zname = f"z{pi + 1}_{comp}_{t}"
            parts.append(f"""
ss_{comp}_{t} AS MATERIALIZED (
  SELECT sum(CAST(z AS HUGEINT) * z) AS ss FROM {zname}),
v_{comp}_{t} AS MATERIALIZED (
  SELECT i, CAST(floor(CAST(z AS DOUBLE) * {_VG}
    / sqrt(CAST((SELECT ss FROM ss_{comp}_{t}) AS DOUBLE)) + 0.5)
    AS BIGINT) AS v
  FROM {zname})""")
        vf = f"v_{comp}_{n_iter}"
        parts.append(f"""
yf_{comp} AS MATERIALIZED (
  SELECT vv.i AS i, vv.v * {_NG} + s.s AS y
  FROM {vf} vv JOIN (
    SELECT nw.i AS i, CAST(sum(nw.w * vj.v) AS BIGINT) AS s
    FROM nw JOIN {vf} vj ON vj.i = nw.j GROUP BY nw.i) s
  ON s.i = vv.i),
lam_{comp} AS MATERIALIZED (
  SELECT 2.0 - CAST(sum(CAST(v.v AS HUGEINT) * y.y) AS DOUBLE)
               / (CAST(sum(CAST(v.v AS HUGEINT) * v.v) AS DOUBLE)
                  * {float(_NG)!r}) AS lam
  FROM yf_{comp} y JOIN {vf} v ON v.i = y.i)""")
        selects.append(f"""
SELECT CAST({comp} AS BIGINT) AS component, CAST(i AS BIGINT) AS i,
       CAST(v AS DOUBLE) / {float(_VG)!r} AS val FROM {vf}
UNION ALL
SELECT CAST({comp} AS BIGINT) AS component, CAST(-1 AS BIGINT) AS i,
       lam AS val FROM lam_{comp}""")
        prev.append(vf)
    return ("WITH " + ",".join(parts) + "\nUNION ALL\n".join(selects))


def spectral_fit_predict(dataset: DataFrame, n_clusters: int, *,
                         k: int = 10, seed: int = 42, id_col: str = "id",
                         vec_col: str = "vec", n_init: int = 4,
                         max_iter: int = 20,
                         graph_method: str = "exact") -> DataFrame:
    """``spectral.hpp:87`` fit_predict → (id, label).

    Ng–Jordan–Weiss: take the first ``n_clusters`` eigenvectors of the
    normalized Laplacian *including* the trivial one and row-normalize
    to the unit sphere before k-means — higher eigenvectors encode
    within-cluster structure and must not dominate (which is exactly
    what happens with the raw eigenmap embedding)."""
    ids, _, vecs, _ = _laplacian_eig(dataset, k, "sqeuclidean", id_col,
                                     vec_col, n_clusters, graph_method)
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
