"""Ball-cover API parity (SURVEY.md §2.5).

Reference: ``cpp/include/cuvs/neighbors/ball_cover.hpp:39,173``
(build), ``:226`` (all_knn_query), ``:247`` (eps_nn), ``:334``
(knn_query) — exact kNN/eps-NN accelerated by triangle-inequality
pruning over a ball cover.

In Spark the pruning role is played by IVF partitioning (SURVEY §2.5:
"Spark gets pruning from IVF partitioning instead; semantics covered by
brute force"), so this module keeps the reference's *API* while
delegating to the exact operators — a user of the reference can switch
call-for-call. The landmark/radius structure the GPU uses to skip
distance computations is a physical optimization the declarative plan
replaces with broadcast tiling + partition-local top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cuvs_spark.operators.brute_force import knn, knn_self
from cuvs_spark.operators.pairwise import epsilon_neighborhood


def ball_cover_build(dataset: DataFrame, **kw) -> DataFrame:
    """``ball_cover.hpp:173`` — the "index" here is the dataset itself
    (exact operators need no trained state)."""
    return dataset


def knn_query(index: DataFrame, queries: DataFrame, k: int = 10,
              metric: str = "euclidean", **kw) -> DataFrame:
    """``ball_cover.hpp:334`` — exact kNN."""
    return knn(index, queries, k, metric, **kw)


def all_knn_query(index: DataFrame, k: int = 10,
                  metric: str = "euclidean", **kw) -> DataFrame:
    """``ball_cover.hpp:226`` — exact all-pairs kNN graph."""
    return knn_self(index, k, metric, **kw)


def eps_nn(index: DataFrame, queries: DataFrame | None = None,
           eps: float = 1.0, metric: str = "sqeuclidean", **kw) -> DataFrame:
    """``ball_cover.hpp:247`` — range query."""
    return epsilon_neighborhood(index, queries, eps, metric, **kw)
