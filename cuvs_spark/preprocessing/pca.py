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
