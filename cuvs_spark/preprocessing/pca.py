"""PCA via covariance eigendecomposition (SURVEY.md §2.2).

Reference: ``python/cuvs/cuvs/preprocessing/pca.pyx:127,200,275,353``
(fit / fit_transform / transform / inverse_transform; ``n_components``,
``whiten``, solver ``cov_eig_dq``/``cov_eig_jacobi``).

Spark design: the Gram/covariance matrix is a *partition-local* NumPy
accumulation (mapInPandas emits one (dim × dim) partial per partition)
summed on the driver — one narrow pass over the data regardless of
scale, no shuffle. The eigensolve is O(dim³) driver-side NumPy (dim is
small by assumption, as in the reference). transform/inverse are
matrix-multiply projections: a JVM expression per component (dot
product with a literal vector), so encoded data never leaves the JVM.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: np.ndarray            # (dim,)
    components: np.ndarray      # (n_components, dim) rows = eigenvectors
    explained_variance: np.ndarray
    whiten: bool = False


def _cov_driver(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed pass → (sum_x, sum_outer, n) on the driver."""
    def partials(batches):
        s = None
        g = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            s = X.sum(0) if s is None else s + X.sum(0)
            g = X.T @ X if g is None else g + X.T @ X
            n += len(X)
        if n:
            yield pd.DataFrame({"s": [s.tolist()], "g": [g.ravel().tolist()],
                                "n": [n]})

    rows = (df.select(vec_col)
            .mapInPandas(partials,
                         schema="s array<double>, g array<double>, n long")
            .collect())
    dim = len(rows[0]["s"])
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    n = 0
    for r in rows:
        s += np.array(r["s"])
        g += np.array(r["g"]).reshape(dim, dim)
        n += r["n"]
    return s, g, n


def pca_fit(df: DataFrame, n_components: int, *, vec_col: str = "vec",
            whiten: bool = False) -> PCAModel:
    s, g, n = _cov_driver(df, vec_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T
    # deterministic sign: largest-|coef| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean=mean, components=comps,
                    explained_variance=vals[order], whiten=whiten)


def _lit_arr(v) -> str:
    return f"array({', '.join(repr(float(x)) for x in v)})"


def _lit_mat(m) -> str:
    return f"array({', '.join(_lit_arr(row) for row in m)})"


def pca_transform(df: DataFrame, model: PCAModel, *, vec_col: str = "vec",
                  out_col: str = "pc") -> DataFrame:
    """Project onto the components: per-component HOF dot products over
    the literal weight matrix (constant-folds to one array literal —
    O(1) generated code per component, never a 512-term unrolled sum
    that blows janino's 64 KB method limit)."""
    cen = (f"zip_with({vec_col}, {_lit_arr(model.mean)}, "
           f"(x, m) -> CAST(x AS DOUBLE) - m)")
    cols = []
    for i, w in enumerate(model.components):
        scale = (1.0 / float(np.sqrt(model.explained_variance[i]))
                 if model.whiten else 1.0)
        dot = (f"aggregate(zip_with(_cen, {_lit_arr(w)}, "
               f"(c, w) -> c * w), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
        cols.append(F.expr(f"{dot} * {repr(float(scale))}"))
    return (df.withColumn("_cen", F.expr(cen))
            .withColumn(out_col, F.array(*cols)).drop("_cen"))


# Integer grids for the power-iteration chain. Mean entries live on
# the 1/_SC grid, covariance entries on 1/_SC² and iterated vector
# entries on 1/_VG. Chosen so every integer stays well inside int64:
# |cov| ≤ ~100 ⇒ |C| ≤ 1e12, |Y| = |Σ_dim C·V| ≤ dim·1e12·1e4 ≈ 1e18.
_SC = 100_000          # mean grid
_SC2 = _SC * _SC       # second-moment / covariance grid (1e10)
_VG = 10_000           # vector grid


def _power_headroom_guard(cov: DataFrame, dim: int, where: str) -> None:
    """ADVICE r11 #1: the power chain's matvec is an exact int64 sum
    (``|y| ≤ dim·max|c|·_VG``) and the square sum that normalizes it
    goes through decimal(38,0)↔HUGEINT (``Σy² ≤ dim·y_max²``). Past
    those bounds Spark (non-ANSI) wraps/nulls silently while the DuckDB
    twin errors — a silent cross-engine divergence. Enforce the proven
    headroom loudly instead, on EVERY cov epoch (deflation mutates the
    magnitudes); the at-scale default stays :func:`pca_fit`
    (mapInPandas GEMM + driver eigh — no integer grid at all).

    ADVICE r12 #3 noted this adds one driver action (this ``agg``) per
    deflation epoch and suggested piggybacking max|c| on the existing
    localCheckpoint materialization if gate latency ever matters.
    Considered and deferred: the guard runs on the gate-construction
    path only (dim 13, a handful of epochs, ~ms per agg against a
    checkpointed cov), and folding it into the checkpoint pass would
    restructure a hash-exact-gated chain for no measurable win —
    revisit only if a caller ever runs the power chain at real dim."""
    mx = cov.agg(F.max(F.abs(F.col("c")))).first()[0] or 0
    y_max = float(dim) * float(mx) * float(_VG)
    if y_max >= float(2 ** 62) or float(dim) * y_max * y_max >= 9e37:
        raise ValueError(
            f"{where}: quantized covariance magnitude {mx} at dim {dim} "
            "exceeds the exact-integer headroom (matvecs must stay inside "
            "int64 and square sums inside decimal(38,0)/HUGEINT; the "
            "DuckDB twin would error where Spark wraps). Reduce the "
            "dimensionality/magnitudes or use pca_fit for at-scale PCA.")


def pca_power_fit(df: DataFrame, n_components: int = 2, n_iter: int = 3,
                  *, vec_col: str = "vec",
                  id_col: str = "id") -> DataFrame:
    """Fixed-iteration PCA by power iteration with Rayleigh deflation —
    the eigensolver as a REPRODUCIBLE dataflow → ``(component, dim,
    val)`` rows (plus one ``dim = -1`` eigenvalue row per component).

    Reference semantics: ``pca.pyx:127`` fit (covariance
    eigendecomposition; solvers ``cov_eig_dq``/``cov_eig_jacobi`` are
    iterative eigensolvers too — this is the analog whose iteration
    count is part of the contract). The at-scale default stays
    :func:`pca_fit` (one mapInPandas GEMM pass + driver eigh); THIS
    path is the oracle/gate construction (:func:`pca_power_sql` is its
    unrolled DuckDB twin, converting the eigensolver family from
    rows-only to value-hash-exact). The covariance is built from an
    exploded (id, dim, x) self-join — O(n·dim²) rows, fine at gate
    scale, deliberately not the 100 TB shape.

    Parity design — EXACT INTEGER STATE, not per-step rounding: the
    chained-Lloyd ROUND recipe is unsafe here because each stage's
    inputs would already sit on a decimal grid, so downstream sums land
    EXACTLY on round-off midpoints where 1e-18 group-order noise flips
    the digit (observed cross-engine at 6 dp). Instead the raw moments
    are quantized ONCE (``floor(avg·grid + 0.5)`` — raw float input, so
    midpoint hits are measure-zero, the same accepted class as the
    kmeans gates) and everything after is integer arithmetic: matvecs
    are exact int64 sums (order-independent by construction), square
    sums go through decimal(38,0) (int128-exact), and the only float
    ops — the normalization's ``/ sqrt(ss)``, the Rayleigh division,
    the deflation product — are PER-ENTRY operations on identical
    integers, so both engines compute identical doubles and the
    ``floor(x + 0.5)`` re-quantization cannot disagree."""
    d = df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(vec_col).alias("vec"))
    ex = d.select("id", F.posexplode(
        F.expr("transform(vec, v -> CAST(v AS DOUBLE))")).alias("i", "x"))
    means = ex.groupBy("i").agg(
        F.floor(F.avg("x") * _SC + F.lit(0.5)).cast("long").alias("m"))
    prods = (ex.alias("a").join(ex.alias("b"), "id")
             .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
             .agg(F.floor(F.avg(F.col("a.x") * F.col("b.x")) * _SC2
                          + F.lit(0.5)).cast("long").alias("s")))
    mi = means.select(F.col("i"), F.col("m").alias("_mi"))
    mj = means.select(F.col("i").alias("j"), F.col("m").alias("_mj"))
    cov = (prods.join(mi, "i").join(mj, "j")
           .select("i", "j",
                   (F.col("s") - F.col("_mi") * F.col("_mj")).alias("c"))
           .localCheckpoint())
    dims = means.select("i")
    dim = d.select(F.size("vec")).first()[0]
    _power_headroom_guard(cov, dim, "pca_power_fit")
    dec = "decimal(19,0)"
    out = None
    for comp in range(n_components):
        v = dims.select(
            "i", (((F.col("i") * 37 + 11) % 97 + 1) * (_VG // 100))
            .cast("long").alias("v"))
        for _ in range(n_iter):
            y = (cov.join(v.withColumnRenamed("i", "j"), "j")
                 .groupBy("i")
                 .agg(F.sum(F.col("c") * F.col("v")).alias("y")))
            ss = y.agg(F.sum(F.col("y").cast(dec) * F.col("y").cast(dec))
                       .alias("ss"))
            v = (y.crossJoin(F.broadcast(ss))
                 .select("i", F.floor(
                     F.col("y").cast("double") * _VG
                     / F.sqrt(F.col("ss").cast("double")) + F.lit(0.5))
                     .cast("long").alias("v"))
                 .localCheckpoint())
        ry = (cov.join(v.withColumnRenamed("i", "j")
                       .withColumnRenamed("v", "_vj"), "j")
              .groupBy("i")
              .agg(F.sum(F.col("c") * F.col("_vj")).alias("y")))
        lam = (ry.join(v, "i")
               .agg(F.sum(F.col("v").cast(dec) * F.col("y").cast(dec))
                    .alias("_rn"),
                    F.sum(F.col("v") * F.col("v")).alias("_ssv"))
               .select((F.col("_rn").cast("double")
                        / (F.col("_ssv").cast("double") * float(_SC2)))
                       .alias("lam")))
        rows = (v.select(F.lit(comp).cast("long").alias("component"),
                         F.col("i").cast("long").alias("dim"),
                         (F.col("v").cast("double") / float(_VG))
                         .alias("val"))
                .unionByName(
                    lam.select(F.lit(comp).cast("long").alias("component"),
                               F.lit(-1).cast("long").alias("dim"),
                               F.col("lam").alias("val"))))
        out = rows if out is None else out.unionByName(rows)
        if comp < n_components - 1:
            vi = v.select(F.col("i"), F.col("v").alias("_vi"))
            vj = v.select(F.col("i").alias("j"), F.col("v").alias("_vj"))
            scale = float(_SC2) / float(_VG * _VG)
            cov = (cov.join(vi, "i").join(vj, "j")
                   .crossJoin(F.broadcast(lam))
                   .select("i", "j",
                           (F.col("c") - F.floor(
                               F.col("lam") * F.col("_vi") * F.col("_vj")
                               * F.lit(scale) + F.lit(0.5)).cast("long"))
                           .alias("c"))
                   .localCheckpoint())
            _power_headroom_guard(cov, dim, "pca_power_fit (deflated)")
    return out


def pca_power_sql(dataset_sql: str, n_components: int = 2,
                  n_iter: int = 3) -> str:
    """DuckDB twin of :func:`pca_power_fit`, unrolled per component ×
    iteration (the nn_descent_sql/cagra_search_sql technique applied to
    the eigensolver): the same once-quantized integer state — BIGINT
    covariance/vector grids, HUGEINT square sums (the int128 analog of
    the Spark side's decimal(38,0)), per-entry float ops on identical
    integers, ``floor(x + 0.5)`` re-quantization. ``dataset_sql`` →
    ``(id, dv)``. See :func:`pca_power_fit` for why integer state (not
    per-step ROUND) is required for cross-engine hash equality."""
    scale = float(_SC2) / float(_VG * _VG)
    parts = [f"""d AS ({dataset_sql}),
ex AS MATERIALIZED (
  SELECT id, CAST(generate_subscripts(dv, 1) AS BIGINT) - 1 AS i,
         CAST(unnest(dv) AS DOUBLE) AS x
  FROM d),
means AS MATERIALIZED (
  SELECT i, CAST(floor(avg(x) * {_SC} + 0.5) AS BIGINT) AS m
  FROM ex GROUP BY i),
prods AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         CAST(floor(avg(a.x * b.x) * {_SC2} + 0.5) AS BIGINT) AS s
  FROM ex a JOIN ex b ON a.id = b.id GROUP BY a.i, b.i),
cov_0 AS MATERIALIZED (
  SELECT p.i AS i, p.j AS j, p.s - mi.m * mj.m AS c
  FROM prods p JOIN means mi ON mi.i = p.i
       JOIN means mj ON mj.i = p.j),
dims AS MATERIALIZED (SELECT i FROM means)"""]
    selects = []
    for comp in range(n_components):
        parts.append(f"""
v_{comp}_0 AS MATERIALIZED (
  SELECT i, CAST(((i * 37 + 11) % 97 + 1) * {_VG // 100} AS BIGINT) AS v
  FROM dims)""")
        for t in range(1, n_iter + 1):
            parts.append(f"""
y_{comp}_{t} AS MATERIALIZED (
  SELECT cv.i AS i, CAST(sum(cv.c * vv.v) AS BIGINT) AS y
  FROM cov_{comp} cv JOIN v_{comp}_{t - 1} vv ON vv.i = cv.j
  GROUP BY cv.i),
ss_{comp}_{t} AS MATERIALIZED (
  SELECT sum(CAST(y AS HUGEINT) * y) AS ss FROM y_{comp}_{t}),
v_{comp}_{t} AS MATERIALIZED (
  SELECT i, CAST(floor(CAST(y AS DOUBLE) * {_VG}
    / sqrt(CAST((SELECT ss FROM ss_{comp}_{t}) AS DOUBLE)) + 0.5)
    AS BIGINT) AS v
  FROM y_{comp}_{t})""")
        parts.append(f"""
ry_{comp} AS MATERIALIZED (
  SELECT cv.i AS i, CAST(sum(cv.c * vv.v) AS BIGINT) AS y
  FROM cov_{comp} cv JOIN v_{comp}_{n_iter} vv ON vv.i = cv.j
  GROUP BY cv.i),
lam_{comp} AS MATERIALIZED (
  SELECT CAST(sum(CAST(vv.v AS HUGEINT) * ry.y) AS DOUBLE)
         / (CAST(sum(CAST(vv.v AS HUGEINT) * vv.v) AS DOUBLE)
            * {float(_SC2)!r}) AS lam
  FROM v_{comp}_{n_iter} vv JOIN ry_{comp} ry ON ry.i = vv.i)""")
        if comp < n_components - 1:
            parts.append(f"""
cov_{comp + 1} AS MATERIALIZED (
  SELECT cv.i AS i, cv.j AS j,
         cv.c - CAST(floor((SELECT lam FROM lam_{comp}) * vi.v * vj.v
                           * {scale!r} + 0.5) AS BIGINT) AS c
  FROM cov_{comp} cv JOIN v_{comp}_{n_iter} vi ON vi.i = cv.i
       JOIN v_{comp}_{n_iter} vj ON vj.i = cv.j)""")
        selects.append(f"""
SELECT CAST({comp} AS BIGINT) AS component, CAST(i AS BIGINT) AS dim,
       CAST(v AS DOUBLE) / {float(_VG)!r} AS val FROM v_{comp}_{n_iter}
UNION ALL
SELECT CAST({comp} AS BIGINT) AS component, CAST(-1 AS BIGINT) AS dim,
       lam AS val FROM lam_{comp}""")
    return ("WITH " + ",".join(parts) + "\nUNION ALL\n".join(selects))


def pca_inverse_transform(df: DataFrame, model: PCAModel, *,
                          pc_col: str = "pc",
                          out_col: str = "vec") -> DataFrame:
    """Reconstruct: x ≈ mean + pcᵀ·W (pca.pyx:353). One HOF expression
    over the literal transposed (and variance-scaled, when whitened)
    weight matrix — code size independent of dim."""
    scaled = model.components * (
        np.sqrt(model.explained_variance)[:, None] if model.whiten
        else 1.0)
    wt = scaled.T  # dim × k
    expr = (
        f"transform(sequence(1, {wt.shape[0]}), j -> CAST("
        f"aggregate(zip_with({pc_col}, element_at({_lit_mat(wt)}, j), "
        f"(p, w) -> CAST(p AS DOUBLE) * w), CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + v) "
        f"+ element_at({_lit_arr(model.mean)}, j) AS FLOAT))")
    return df.withColumn(out_col, F.expr(expr))
