"""Tiered index: ANN tier + brute-force delta tier (SURVEY.md §2.5).

Reference: ``python/cuvs/cuvs/neighbors/tiered_index/tiered_index.pyx:
48-120,164,223,326`` (``min_ann_rows=100000``,
``create_ann_index_on_extend``; search fans out to both tiers and
merges); ``tiered_index.hpp:59-65``.

This is the engine's streaming story: the ANN tier is a periodically
compacted IVF index; recent rows live in a delta table searched exactly;
searches union both tiers through ``knn_merge_parts``. In Structured
Streaming, ``foreachBatch`` appends micro-batches to the delta and a
compaction job folds the delta into the ANN tier when it exceeds
``min_ann_rows`` (see ``streaming/tiered_stream.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_spark.operators.brute_force import knn
from cuvs_spark.operators.ivf_flat import (
    IVFFlatIndex,
    ivf_flat_build,
    ivf_flat_extend,
    ivf_flat_search,
)
from cuvs_spark.operators.select_k import knn_merge_parts


@dataclass
class TieredIndex:
    """``ann`` may be any index type (the reference's
    ``ann_index_type``: cagra / ivf_flat / ivf_pq, tiered_index.pyx:48):
    ``search_fn(ann, queries, k, n_probes, qid_col=, qvec_col=)`` and
    ``extend_fn(ann, rows)`` plug the tier's operators in; defaults are
    the IVF-Flat pair."""
    ann: object
    delta: DataFrame               # (id, vec) — recent rows
    min_ann_rows: int = 1000
    create_ann_index_on_extend: bool = False
    search_fn: object = None       # Callable | None -> ivf_flat_search
    extend_fn: object = None       # Callable | None -> ivf_flat_extend
    metric: str = "sqeuclidean"


def tiered_build(dataset: DataFrame, n_lists: int = 16, *,
                 min_ann_rows: int = 1000, metric: str = "sqeuclidean",
                 id_col: str = "id", vec_col: str = "vec",
                 **ivf_kw) -> TieredIndex:
    spark = dataset.sparkSession
    ann = ivf_flat_build(dataset, n_lists, metric=metric, id_col=id_col,
                         vec_col=vec_col, **ivf_kw)
    empty = spark.createDataFrame([], "id long, vec array<float>")
    return TieredIndex(ann=ann, delta=empty, min_ann_rows=min_ann_rows)


def tiered_extend(index: TieredIndex, new_rows: DataFrame, *,
                  id_col: str = "id", vec_col: str = "vec") -> TieredIndex:
    """Append to the delta tier; compact into the ANN tier when the
    delta crosses ``min_ann_rows`` (tiered_index.pyx:326 semantics)."""
    add = new_rows.select(F.col(id_col).cast("long").alias("id"),
                          F.col(vec_col).alias("vec"))
    delta = index.delta.unionByName(add)
    if (index.create_ann_index_on_extend
            or delta.count() >= index.min_ann_rows):
        extend_fn = index.extend_fn or ivf_flat_extend
        ann = extend_fn(index.ann, delta)
        return replace(index, ann=ann, delta=index.delta.sparkSession
                       .createDataFrame([], "id long, vec array<float>"))
    return replace(index, delta=delta)


def tiered_search(index: TieredIndex, queries: DataFrame, k: int = 10,
                  n_probes: int = 8, *, qid_col: str = "qid",
                  qvec_col: str = "vec") -> DataFrame:
    """Fan out to both tiers, merge: ANN-tier search ∪ exact
    brute-force over the delta → global top-k."""
    search_fn = index.search_fn or ivf_flat_search
    parts = [search_fn(index.ann, queries, k, n_probes,
                       qid_col=qid_col, qvec_col=qvec_col)]
    metric = getattr(index.ann, "metric", index.metric)
    if not index.delta.isEmpty():
        parts.append(knn(index.delta, queries, k, metric,
                         qid_col=qid_col, qvec_col=qvec_col))
    from cuvs_spark.functions.distance import is_min_close
    return knn_merge_parts(parts, k, select_min=is_min_close(metric))


def composite_search(indexes: list, queries: DataFrame, k: int = 10,
                     n_probes: int = 8, **kw) -> DataFrame:
    """``composite::index`` (``cpp/src/neighbors/composite/index.cu``):
    search every sub-index, merge results — a union + top-k. All
    sub-indexes must share one metric (the reference's composite has
    the same same-metric assumption): a mixed min-close/max-close list
    would merge incomparable scores, so it fails loudly here (r11
    verdict #1 / ADVICE r11 #3)."""
    if not indexes:
        raise ValueError("composite_search: empty index list")
    from cuvs_spark.functions.distance import METRICS, is_min_close
    # compare CANONICAL metric names so registered aliases of the same
    # metric (l2_expanded vs sqeuclidean, dot vs inner_product) don't
    # trip the homogeneity check
    metrics = {METRICS[getattr(ix, "metric", "sqeuclidean")].name
               for ix in indexes}
    if len(metrics) > 1:
        raise ValueError("composite_search: sub-indexes disagree on "
                         f"metric ({sorted(metrics)}); their scores are "
                         "not merge-comparable")
    parts = [ivf_flat_search(ix, queries, k, n_probes, **kw)
             for ix in indexes]
    return knn_merge_parts(parts, k, select_min=is_min_close(metrics.pop()))
