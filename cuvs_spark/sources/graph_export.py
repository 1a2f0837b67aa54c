"""Cross-format graph index export (SURVEY.md §2.1).

Reference: ``hnsw.from_cagra`` (``hnsw.pyx:410``,
``cpp/include/cuvs/neighbors/hnsw.hpp:474`` — build on GPU, serve on
CPU) and ``vamana.save`` DiskANN format (``vamana.pyx:228``).

The binary hnswlib/DiskANN file formats are CPU-serving concerns out of
scope for a Spark engine (per BASELINE.json); what we preserve is the
*conversion semantics*: a CAGRA graph re-keyed into an HNSW-style
layer-0 adjacency (``from_cagra`` is exactly a re-keying — the
reference reuses the CAGRA graph as HNSW's base layer) plus a JSON/
Parquet layout any exporter can serialize from.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hnsw_from_cagra(graph: DataFrame, *, ef_construction: int = 200,
                    M: int | None = None) -> DataFrame:
    """CAGRA edge table → HNSW base-layer adjacency
    ``(layer, src, neighbors array<long>)`` (hierarchy='none', as
    ``hnsw.pyx:120-151`` when built from CAGRA)."""
    deg = (graph.groupBy("src")
           .agg(F.array_sort(F.collect_list(F.struct("distance", "dst")))
                .alias("_n")))
    out = deg.select(F.lit(0).alias("layer"), "src",
                     F.expr("transform(_n, x -> x.dst)").alias("neighbors"))
    if M is not None:
        out = out.withColumn("neighbors", F.expr(f"slice(neighbors, 1, {M})"))
    return out


def hnsw_build(dataset: DataFrame, *, graph_degree: int = 16,
               ef_construction: int = 200, metric: str = "sqeuclidean",
               id_col: str = "id", vec_col: str = "vec",
               **builder_kw) -> DataFrame:
    """``hnsw.build`` (``hnsw.pyx:472``): the reference builds via
    CAGRA and re-keys the graph as the HNSW base layer (hierarchy
    'none'); same composition here — :func:`cagra_build` then
    :func:`hnsw_from_cagra`.  Returns the layered adjacency view."""
    from cuvs_spark.operators.graph import cagra_build
    g = cagra_build(dataset, graph_degree, metric=metric, id_col=id_col,
                    vec_col=vec_col, **builder_kw)
    return hnsw_from_cagra(g)


def hnsw_search(layers: DataFrame, dataset: DataFrame, queries: DataFrame,
                k: int = 10, *, ef: int = 40, metric: str = "sqeuclidean",
                id_col: str = "id", vec_col: str = "vec",
                qid_col: str = "qid", qvec_col: str = "vec") -> DataFrame:
    """``hnsw.search`` (``hnsw.pyx:648``) over a flat-hierarchy view:
    with hierarchy 'none' the HNSW search IS a base-layer beam search
    with pool size ``ef`` — delegate to the CAGRA batched beam over the
    un-keyed layer-0 adjacency."""
    from cuvs_spark.operators.graph import cagra_search
    edges = (layers.filter(F.col("layer") == 0)
             .select("src", F.explode("neighbors").alias("dst")))
    return cagra_search(edges, dataset, queries, k, itopk=max(ef, k),
                        metric=metric, id_col=id_col, vec_col=vec_col,
                        qid_col=qid_col, qvec_col=qvec_col)


def hnsw_extend(layers: DataFrame, dataset: DataFrame,
                new_rows: DataFrame, graph_degree: int = 16, *,
                metric: str = "sqeuclidean", id_col: str = "id",
                vec_col: str = "vec") -> tuple[DataFrame, DataFrame]:
    """``hnsw.extend`` (``hnsw.pyx:561``) on the flat hierarchy:
    splice the batch into the base layer via :func:`cagra_extend`,
    re-key back to the layered view.  Returns (layers, dataset)."""
    from cuvs_spark.operators.graph import cagra_extend
    edges = (layers.filter(F.col("layer") == 0)
             .select("src", F.explode("neighbors").alias("dst")))
    d = dataset.select(F.col(id_col).cast("long").alias("nid"),
                       F.col(vec_col).alias("_v"))
    scored = (edges.join(d.withColumnRenamed("nid", "src")
                         .withColumnRenamed("_v", "_sv"), "src")
              .join(d.withColumnRenamed("nid", "dst")
                    .withColumnRenamed("_v", "_dv"), "dst"))
    from cuvs_spark.functions.distance import distance_sql_spark
    g = scored.select("src", "dst",
                      F.expr(distance_sql_spark(metric, "_sv", "_dv"))
                      .alias("distance"))
    g2, d2 = cagra_extend(g, dataset, new_rows, graph_degree,
                          metric=metric, id_col=id_col, vec_col=vec_col)
    return hnsw_from_cagra(g2), d2


def save_graph_index(graph: DataFrame, path: str, *, fmt: str = "hnsw",
                     meta: dict | None = None) -> None:
    """Persist an adjacency table + metadata sidecar; a CPU-side
    exporter can rewrite this into hnswlib/DiskANN binaries."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"format": fmt, **(meta or {})}, f)
    graph.write.mode("overwrite").parquet(os.path.join(path, "adjacency"))


def load_graph_index(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(path, "adjacency")), meta
