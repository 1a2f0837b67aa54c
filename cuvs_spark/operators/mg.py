"""Multi-node search modes — the SNMG analog (SURVEY.md §2.5).

Reference: ``python/cuvs/cuvs/neighbors/mg/*.pyx`` (``distribution_mode``
replicated/sharded, ``mg/ivf_flat.pyx:63-66``); replicated search
LOAD_BALANCER/ROUND_ROBIN, sharded merge MERGE_ON_ROOT_RANK/TREE_MERGE
(``common.hpp:959-1001``, ``cpp/src/neighbors/mg/snmg.cuh:248,358,378``);
``mg.distribute`` (``mg/ivf_flat/ivf_flat.pyx:533``).

In Spark these modes ARE the execution model, so the functions here are
thin, explicit spellings of what the engine already does:

* **sharded** — the dataset DataFrame is the shard set; each partition
  searches its shard and the per-shard top-k merge is a tree-shaped
  exchange (``knn_merge_parts`` ≈ TREE_MERGE; collecting the merged
  result to the driver ≈ MERGE_ON_ROOT_RANK). This is exactly the
  ``method="blas"`` kNN path.
* **replicated** — the small side (index/queries) is broadcast to every
  executor; Spark's scheduler is the LOAD_BALANCER.
* **distribute** — loading an index and broadcasting/sharding it maps
  to ``broadcast()`` / ``repartition(n, key)`` on the index tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.operators.brute_force import knn


def sharded_knn(dataset: DataFrame, queries: DataFrame, k: int = 10,
                metric: str = "euclidean", *, n_shards: int | None = None,
                **kw) -> DataFrame:
    """SHARDED distribution: partition the dataset, search each shard
    locally, tree-merge the per-shard top-k (snmg.cuh:378)."""
    if n_shards:
        dataset = dataset.repartition(n_shards)
    return knn(dataset, queries, k, metric, method="blas", **kw)


def replicated_knn(dataset: DataFrame, queries: DataFrame, k: int = 10,
                   metric: str = "euclidean", **kw) -> DataFrame:
    """REPLICATED distribution: the query batch is broadcast (the
    declarative path broadcasts the small side; executors scan their
    dataset partitions independently — round-robin by scheduler)."""
    return knn(dataset, queries, k, metric, method="expr", **kw)


def distribute(index_df: DataFrame, mode: str = "replicated",
               n_shards: int = 32, key: str = "list_id") -> DataFrame:
    """``mg.distribute``: broadcast or shard an index table."""
    if mode == "replicated":
        return F.broadcast(index_df)
    return index_df.repartition(n_shards, key)
