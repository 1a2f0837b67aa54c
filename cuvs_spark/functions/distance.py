"""Distance metric expression library — the engine's join predicates.

Re-expresses the reference's ``DistanceType`` enum (23 values,
``cpp/include/cuvs/distance/distance.hpp:19-67``; Python name map
``python/cuvs/cuvs/distance/distance.pyx:17-39``) as pairs of SQL
expressions over ``array<float>`` columns:

* a **Spark SQL** expression (JVM-side higher-order functions —
  ``zip_with`` + ``aggregate`` — no Python in the hot path), and
* a **DuckDB SQL** expression with *identical sequential accumulation
  order*, so double-precision results are bit-equal between the two
  engines (verified in tests). This is what lets every kNN / pairwise /
  range-join operator carry an exact DuckDB oracle.

``is_min_close`` mirrors ``distance.hpp:72-85``: for ``inner_product``
larger is closer, so top-k sorts descending.

Design note (100 TB): these expressions evaluate inside the JVM per
row-pair with zero Python serialization. For dense-matrix hot paths the
BLAS-tiled ``mapInPandas`` kernel in ``operators/brute_force.py`` is the
throughput path; this expression family is the correctness-first,
arbitrarily-composable path (usable in any WHERE / join / agg).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "METRICS",
    "MetricDef",
    "distance_col",
    "distance_sql_duckdb",
    "distance_sql_spark",
    "is_min_close",
]

# ---------------------------------------------------------------------------
# Template machinery.
#
# A metric is defined by named "sums" (sequential folds over the zipped
# element pairs) plus a "final" scalar formula over those sums. Each sum's
# per-element term is written once with {x}/{y} placeholders; the engines
# substitute their own element accessors:
#   Spark : zip_with lambda args            x, y
#   DuckDB: list_zip struct fields          p[1], p[2]
# Both engines fold strictly left-to-right => identical IEEE-754 results.
# ---------------------------------------------------------------------------

_SPARK_X = "CAST(x AS DOUBLE)"
_SPARK_Y = "CAST(y AS DOUBLE)"
_DUCK_X = "CAST(p[1] AS DOUBLE)"
_DUCK_Y = "CAST(p[2] AS DOUBLE)"


def _spark_fold(a: str, b: str, term: str, combine: str = "acc + v") -> str:
    term = term.format(x=_SPARK_X, y=_SPARK_Y)
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> {term}), "
        f"CAST(0 AS DOUBLE), (acc, v) -> {combine})"
    )


def _duck_fold(a: str, b: str, term: str, combine: str = "acc + v") -> str:
    term = term.format(x=_DUCK_X, y=_DUCK_Y)
    # list_reduce has no init value; seed the fold by prepending 0.0 so the
    # accumulation order matches Spark's aggregate(…, 0D, …) exactly.
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> {term})), "
        f"(acc, v) -> {combine})"
    )


@dataclass(frozen=True)
class MetricDef:
    """One distance metric, renderable to Spark SQL or DuckDB SQL."""

    name: str
    #: sum-name -> per-element term template with {x}/{y} placeholders
    sums: dict[str, str]
    #: final scalar formula over {sum names} + {d} (dimensionality) + {p}
    final: str
    #: False => larger value means closer (inner_product family)
    min_close: bool = True
    #: fold combiner (default running sum); "greatest(acc, v)" for Linf
    combine: str = "acc + v"
    aliases: tuple[str, ...] = field(default=())
    #: metrics whose final formula uses non-correctly-rounded libm calls
    #: (ln/pow) — cross-engine bit-parity not guaranteed, tests use tolerance
    exact_parity: bool = True

    def spark_sql(self, a: str, b: str, p: float = 2.0) -> str:
        parts = {
            k: _spark_fold(a, b, t.format_map(_SafeMap(p=p, x="{x}", y="{y}")),
                           self.combine)
            for k, t in self.sums.items()
        }
        return self.final.format(**parts, d=f"CAST(size({a}) AS DOUBLE)", p=p)

    def duckdb_sql(self, a: str, b: str, p: float = 2.0) -> str:
        parts = {
            k: _duck_fold(a, b, t.format_map(_SafeMap(p=p, x="{x}", y="{y}")),
                          self.combine)
            for k, t in self.sums.items()
        }
        return self.final.format(**parts, d=f"CAST(len({a}) AS DOUBLE)", p=p)


class _SafeMap(dict):
    def __missing__(self, key):  # leave unknown placeholders intact
        return "{" + key + "}"


def _m(name, sums, final, **kw) -> MetricDef:
    return MetricDef(name=name, sums=sums, final=final, **kw)


# Per-element reusable terms
_D2 = "({x} - {y}) * ({x} - {y})"
_AD = "abs({x} - {y})"

METRICS: dict[str, MetricDef] = {}


def _register(md: MetricDef) -> None:
    METRICS[md.name] = md
    for al in md.aliases:
        METRICS[al] = md


# --- L2 family (distance.hpp:23-27) ---------------------------------------
_register(_m("sqeuclidean", {"s": _D2}, "{s}", aliases=("l2_expanded",)))
_register(_m("euclidean", {"s": _D2}, "sqrt({s})", aliases=("l2", "l2sqrt_expanded")))
# --- L1 / Linf / Lp -------------------------------------------------------
_register(_m("cityblock", {"s": _AD}, "{s}", aliases=("l1", "manhattan", "taxicab")))
_register(_m("chebyshev", {"s": _AD}, "{s}", combine="greatest(acc, v)",
             aliases=("linf",)))
_register(_m("minkowski",
             {"s": "power(abs({x} - {y}), CAST({p} AS DOUBLE))"},
             "power({s}, CAST(1 AS DOUBLE) / CAST({p} AS DOUBLE))",
             aliases=("lp",), exact_parity=False))
# --- inner product / cosine / correlation ---------------------------------
_register(_m("inner_product", {"s": "{x} * {y}"}, "{s}", min_close=False,
             aliases=("dot",)))
_register(_m("cosine",
             {"dot": "{x} * {y}", "na": "{x} * {x}", "nb": "{y} * {y}"},
             "CAST(1 AS DOUBLE) - ({dot} / (sqrt({na}) * sqrt({nb})))"))
_register(_m("correlation",
             {"dot": "{x} * {y}", "sa": "{x}", "sb": "{y}",
              "na": "{x} * {x}", "nb": "{y} * {y}"},
             "CAST(1 AS DOUBLE) - "
             "(({dot} - ({sa} * {sb} / {d})) / "
             "(sqrt({na} - ({sa} * {sa} / {d})) * "
             "sqrt({nb} - ({sb} * {sb} / {d}))))"))
# --- elementwise-ratio family ---------------------------------------------
_register(_m("canberra",
             {"s": "CASE WHEN abs({x}) + abs({y}) = CAST(0 AS DOUBLE) "
                   "THEN CAST(0 AS DOUBLE) "
                   "ELSE abs({x} - {y}) / (abs({x}) + abs({y})) END"},
             "{s}"))
_register(_m("braycurtis",
             {"num": _AD, "den": "abs({x} + {y})"},
             "CASE WHEN {den} = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
             "ELSE {num} / {den} END"))
# --- probability-vector family --------------------------------------------
_register(_m("hellinger",
             {"s": "sqrt(abs({x} * {y}))"},
             "sqrt(greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - {s}))"))
_register(_m("jensenshannon",
             # defined on probability vectors; the x+y guard keeps both
             # engines total on junk input (Spark would NaN, DuckDB
             # raises on ln(<0))
             {"s": "(CASE WHEN {x} <= CAST(0 AS DOUBLE) "
                   "OR {x} + {y} <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
                   "ELSE {x} * ln(CAST(2 AS DOUBLE) * {x} / ({x} + {y})) END) + "
                   "(CASE WHEN {y} <= CAST(0 AS DOUBLE) "
                   "OR {x} + {y} <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
                   "ELSE {y} * ln(CAST(2 AS DOUBLE) * {y} / ({x} + {y})) END)"},
             "sqrt(greatest(CAST(0 AS DOUBLE), CAST(0.5 AS DOUBLE) * {s}))",
             exact_parity=False))
_register(_m("kl_divergence",
             {"s": "CASE WHEN {x} <= CAST(0 AS DOUBLE) OR {y} <= CAST(0 AS DOUBLE) "
                   "THEN CAST(0 AS DOUBLE) ELSE {x} * ln({x} / {y}) END"},
             "{s}", exact_parity=False))
# --- binary / set family --------------------------------------------------
_NZ_BOTH = ("CASE WHEN {x} <> CAST(0 AS DOUBLE) AND {y} <> CAST(0 AS DOUBLE) "
            "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END")
_NZ_ANY = ("CASE WHEN {x} <> CAST(0 AS DOUBLE) OR {y} <> CAST(0 AS DOUBLE) "
           "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END")
_register(_m("hamming",
             {"s": "CASE WHEN {x} <> {y} THEN CAST(1 AS DOUBLE) "
                   "ELSE CAST(0 AS DOUBLE) END"},
             "{s} / {d}"))
_register(_m("jaccard", {"inter": _NZ_BOTH, "uni": _NZ_ANY},
             "CASE WHEN {uni} = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
             "ELSE CAST(1 AS DOUBLE) - ({inter} / {uni}) END"))
_register(_m("russellrao", {"inter": _NZ_BOTH}, "({d} - {inter}) / {d}"))
_register(_m("dice",
             {"inter": _NZ_BOTH,
              "nza": "CASE WHEN {x} <> CAST(0 AS DOUBLE) THEN CAST(1 AS DOUBLE) "
                     "ELSE CAST(0 AS DOUBLE) END",
              "nzb": "CASE WHEN {y} <> CAST(0 AS DOUBLE) THEN CAST(1 AS DOUBLE) "
                     "ELSE CAST(0 AS DOUBLE) END"},
             "CASE WHEN {nza} + {nzb} = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
             "ELSE CAST(1 AS DOUBLE) - (CAST(2 AS DOUBLE) * {inter} / "
             "({nza} + {nzb})) END"))
# --- geo ------------------------------------------------------------------
_register(_m("haversine",
             {"slat": "0",  # unused; haversine handled in `final` via element access
              },
             "__HAVERSINE__", exact_parity=False))


# haversine needs positional element access, not a fold — special-cased.
_HAVERSINE_SPARK = (
    "CAST(2 AS DOUBLE) * asin(sqrt("
    "pow(sin((CAST(element_at({b}, 1) AS DOUBLE) - CAST(element_at({a}, 1) AS DOUBLE)) / 2), 2) + "
    "cos(CAST(element_at({a}, 1) AS DOUBLE)) * cos(CAST(element_at({b}, 1) AS DOUBLE)) * "
    "pow(sin((CAST(element_at({b}, 2) AS DOUBLE) - CAST(element_at({a}, 2) AS DOUBLE)) / 2), 2)))"
)
_HAVERSINE_DUCK = (
    "CAST(2 AS DOUBLE) * asin(sqrt("
    "pow(sin((CAST({b}[1] AS DOUBLE) - CAST({a}[1] AS DOUBLE)) / 2), 2) + "
    "cos(CAST({a}[1] AS DOUBLE)) * cos(CAST({b}[1] AS DOUBLE)) * "
    "pow(sin((CAST({b}[2] AS DOUBLE) - CAST({a}[2] AS DOUBLE)) / 2), 2)))"
)

# --- bitwise hamming over packed codes (array<int> of bytes/words) --------
_BITWISE_SPARK = ("aggregate(zip_with({a}, {b}, (x, y) -> "
                  "CAST(bit_count(x ^ y) AS DOUBLE)), CAST(0 AS DOUBLE), "
                  "(acc, v) -> acc + v)")
_BITWISE_DUCK = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                 "list_transform(list_zip({a}, {b}), p -> "
                 "CAST(bit_count(xor(p[1], p[2])) AS DOUBLE))), "
                 "(acc, v) -> acc + v)")


def distance_sql_spark(metric: str, a: str, b: str, p: float = 2.0) -> str:
    """Spark SQL text computing ``metric`` between array columns a, b."""
    md = METRICS[metric]
    if md.name == "haversine":
        return _HAVERSINE_SPARK.format(a=a, b=b)
    if md.name == "bitwise_hamming":
        return _BITWISE_SPARK.format(a=a, b=b)
    return md.spark_sql(a, b, p)


def distance_sql_duckdb(metric: str, a: str, b: str, p: float = 2.0) -> str:
    """DuckDB SQL text — bit-identical to the Spark expression for
    ``exact_parity`` metrics (same fold order, correctly-rounded ops only)."""
    md = METRICS[metric]
    if md.name == "haversine":
        return _HAVERSINE_DUCK.format(a=a, b=b)
    if md.name == "bitwise_hamming":
        return _BITWISE_DUCK.format(a=a, b=b)
    return md.duckdb_sql(a, b, p)


_register(_m("bitwise_hamming", {"s": "0"}, "__BITWISE__"))


def cosine_norm_sql_spark(a: str) -> str:
    """``sqrt(Σ x·x)`` over ONE array column — the per-side factor of
    the cosine template, hoisted so an n×m pair relation folds each
    vector's norm once (in a projection on its own side) instead of
    once per pair. The fold is the cosine template's ``na`` fold
    verbatim, zipped with itself: with equal-length inputs every term
    is identical, and with ragged inputs the pair's ``dot`` fold is
    NULL either way, so the final distance agrees bit-for-bit in all
    cases (r14, guide §1.2 step 2: per-task work on the n×m hot loop)."""
    return "sqrt(" + _spark_fold(a, a, "{x} * {x}") + ")"


def cosine_pair_sql_spark(a: str, b: str, sqa: str, sqb: str) -> str:
    """The cosine template's final formula with the two norm factors
    read from pre-projected columns ``sqa``/``sqb`` (each produced by
    :func:`cosine_norm_sql_spark`) instead of re-folded per pair.
    Bit-identical to ``distance_sql_spark('cosine', a, b)``: the same
    ``dot`` fold, divided by the product of the same two sqrt values."""
    dot = _spark_fold(a, b, "{x} * {y}")
    return f"CAST(1 AS DOUBLE) - ({dot} / ({sqa} * {sqb}))"


def distance_col(metric: str, a, b, p: float = 2.0) -> Column:
    """Distance between two array<float> Columns as a Spark Column."""
    a_sql = a if isinstance(a, str) else a._jc.toString()
    b_sql = b if isinstance(b, str) else b._jc.toString()
    return F.expr(distance_sql_spark(metric, a_sql, b_sql, p))


def is_min_close(metric: str) -> bool:
    """True if smaller distance means closer (distance.hpp:72-85)."""
    return METRICS[metric].min_close
