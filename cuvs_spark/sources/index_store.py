"""Index serialization — the save/load surface (SURVEY.md §2.1).

Reference: per-index ``save``/``load`` (``brute_force.pyx:266,304``,
``ivf_flat.pyx:397,434``, ``cagra.pyx:910,954``; C++
``ivf_flat_serialize.cuh``, ``cagra_serialize.cuh``). The reference
writes an opaque binary stream; our index is *named Parquet tables + a
JSON metadata sidecar* — readable by any Spark job, partition-pruned on
read, and trivially versioned.

Layout for IVF-Flat::

    <dir>/meta.json                       {"type": "ivf_flat", "metric": ..,
                                           "n_lists": .., "dim": ..}
    <dir>/centroids.parquet               (list_id int, centroid array<double>)
    <dir>/lists/ (partitionBy list_id)    (id long, vec array<float>, list_id)

``partitionBy(list_id)`` is the load-bearing choice: a search that
probes 8 of 1024 lists reads 8/1024 of the files (partition pruning at
the file-listing level) — the Spark analog of the reference's per-list
device arrays.

Also: binary benchmark-dataset readers (.fbin/.u8bin/.ibin — reference
``python/cuvs_bench/cuvs_bench/get_dataset/``) as mapInPandas parquet-
less ingestion.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_spark.operators.ivf_flat import IVFFlatIndex


def save_ivf_flat(index: IVFFlatIndex, path: str, *,
                  include_dataset: bool = True) -> None:
    """``include_dataset=False`` mirrors ``cagra.save(include_dataset=)``
    (cagra.pyx:910) — metadata + centroids only."""
    os.makedirs(path, exist_ok=True)
    spark = index.lists.sparkSession
    dim = int(index.centroids.shape[1])
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "ivf_flat", "metric": index.metric,
                   "n_lists": int(index.n_lists), "dim": dim,
                   "include_dataset": include_dataset}, f)
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(index.centroids)],
        "list_id int, centroid array<double>")
    # ^ double: trained centroids must round-trip bit-exact
    # (float32 truncation would shift assignment/probe boundaries)
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids.parquet"))
    if include_dataset:
        (index.lists.write.mode("overwrite").partitionBy("list_id")
         .parquet(os.path.join(path, "lists")))


def load_ivf_flat(spark: SparkSession, path: str) -> IVFFlatIndex:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cent_rows = (spark.read.parquet(os.path.join(path, "centroids.parquet"))
                 .orderBy("list_id").collect())
    centroids = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    lists = None
    if meta.get("include_dataset", True):
        lists = spark.read.parquet(os.path.join(path, "lists"))
    return IVFFlatIndex(centroids=centroids, lists=lists,
                        metric=meta["metric"])


# ---------------------------------------------------------------------------
# ANN-benchmark binary formats (.fbin/.u8bin/.ibin): little-endian
# int32 n_rows, int32 dim header then row-major payload.
# ---------------------------------------------------------------------------

_DTYPES = {".fbin": np.float32, ".u8bin": np.uint8, ".ibin": np.int32}


def read_bin_dataset(spark: SparkSession, path: str,
                     batch_rows: int = 65536) -> DataFrame:
    """Read a bigann-style binary vector file as (id, vec).

    Driver reads the header; rows stream in via parallelized offsets so
    the file is ingested in partition-sized chunks (no single-node
    materialization)."""
    ext = os.path.splitext(path)[1]
    dtype = _DTYPES[ext]
    with open(path, "rb") as f:
        n_rows, dim = struct.unpack("<ii", f.read(8))
    offsets = [(s, min(batch_rows, n_rows - s))
               for s in range(0, n_rows, batch_rows)]

    item = np.dtype(dtype).itemsize

    def load_chunk(part):
        for start, count in part:
            with open(path, "rb") as f:
                f.seek(8 + start * dim * item)
                buf = np.frombuffer(f.read(count * dim * item), dtype=dtype)
            M = buf.reshape(count, dim).astype(np.float32)
            for i in range(count):
                yield (start + i, M[i].tolist())

    rdd = spark.sparkContext.parallelize(offsets, max(1, len(offsets))) \
        .mapPartitions(lambda p: load_chunk(p))
    return spark.createDataFrame(rdd, "id long, vec array<float>")


# ---------------------------------------------------------------------------
# ScaNN / IVF-RaBitQ index persistence — same named-tables layout;
# quantized code tables partition by list_id for probe-time pruning.
# ---------------------------------------------------------------------------

def _write_centroids(spark, centroids, path: str) -> None:
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id int, centroid array<double>")
    # ^ double: trained centroids must round-trip bit-exact
    # (float32 truncation would shift assignment/probe boundaries)
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids.parquet"))


def _read_centroids(spark, path: str) -> np.ndarray:
    rows = (spark.read.parquet(os.path.join(path, "centroids.parquet"))
            .orderBy("list_id").collect())
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def save_scann(index, path: str, *, include_dataset: bool = True) -> None:
    """ScaNN serialize analog (``scann.hpp``; reference is
    build/serialize-only). Tables: spilled assignment (partitioned by
    list_id), raw reordering vectors, optional residual-PQ codes +
    codebook."""
    from cuvs_spark.operators.scann import ScannIndex
    assert isinstance(index, ScannIndex)
    os.makedirs(path, exist_ok=True)
    spark = index.vectors.sparkSession
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "scann", "metric": index.metric,
                   "n_leaves": int(index.centroids.shape[0]),
                   "dim": int(index.centroids.shape[1]),
                   "soar_lambda": index.soar_lambda,
                   "pq_dim": index.pq_dim,
                   "include_dataset": include_dataset}, f)
    _write_centroids(spark, index.centroids, path)
    (index.assignments.write.mode("overwrite").partitionBy("list_id")
     .parquet(os.path.join(path, "assignments")))
    if include_dataset:
        index.vectors.write.mode("overwrite").parquet(
            os.path.join(path, "vectors.parquet"))
    if index.codes is not None:
        (index.codes.write.mode("overwrite").partitionBy("list_id")
         .parquet(os.path.join(path, "codes")))
        index.codebook_df.write.mode("overwrite").parquet(
            os.path.join(path, "codebook.parquet"))


def load_scann(spark: SparkSession, path: str):
    from cuvs_spark.operators.scann import ScannIndex
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    codes = cb = vectors = None
    if meta.get("include_dataset", True):
        vectors = spark.read.parquet(os.path.join(path, "vectors.parquet"))
    if meta.get("pq_dim") is not None:
        codes = spark.read.parquet(os.path.join(path, "codes"))
        cb = spark.read.parquet(os.path.join(path, "codebook.parquet"))
    return ScannIndex(centroids=_read_centroids(spark, path),
                      assignments=spark.read.parquet(
                          os.path.join(path, "assignments")),
                      vectors=vectors, codes=codes, codebook_df=cb,
                      pq_dim=meta.get("pq_dim"),
                      soar_lambda=meta["soar_lambda"],
                      metric=meta["metric"])


def save_ivf_rabitq(index, path: str) -> None:
    """IVF-RaBitQ serialize analog (``ivf_rabitq.hpp`` index): codes
    table (codes + estimator scalars) partitioned by list_id."""
    from cuvs_spark.operators.ivf_rabitq import IVFRabitQIndex
    assert isinstance(index, IVFRabitQIndex)
    os.makedirs(path, exist_ok=True)
    spark = index.codes.sparkSession
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "ivf_rabitq",
                   "n_lists": int(index.centroids.shape[0]),
                   "dim": int(index.centroids.shape[1]),
                   "bits_per_dim": index.bits_per_dim}, f)
    _write_centroids(spark, index.centroids, path)
    (index.codes.write.mode("overwrite").partitionBy("list_id")
     .parquet(os.path.join(path, "codes")))


def load_ivf_rabitq(spark: SparkSession, path: str):
    from cuvs_spark.operators.ivf_rabitq import IVFRabitQIndex
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return IVFRabitQIndex(centroids=_read_centroids(spark, path),
                          codes=spark.read.parquet(
                              os.path.join(path, "codes")),
                          bits_per_dim=meta["bits_per_dim"])


# ---------------------------------------------------------------------------
# IVF-PQ / IVF-SQ persistence — reference ivf_pq_serialize.cuh /
# ivf_flat_serialize.cuh semantics: everything a search needs (coarse
# centroids, codebook, per-list codes) round-trips; codes partition by
# list_id so a probed search prunes files exactly like the live index.
# ---------------------------------------------------------------------------

def save_ivf_pq(index, path: str) -> None:
    """IVF-PQ serialize analog (``ivf_pq_serialize.cuh``,
    ``ivf_pq.pyx`` save): centroids + subspace codebook + codes."""
    from cuvs_spark.operators.ivf_pq import IVFPQIndex
    assert isinstance(index, IVFPQIndex)
    os.makedirs(path, exist_ok=True)
    spark = index.codes.sparkSession
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "ivf_pq", "metric": index.metric,
                   "n_lists": int(index.centroids.shape[0]),
                   "dim": int(index.centroids.shape[1]),
                   "pq_dim": int(index.pq_dim),
                   "encode": index.encode,
                   # rotation is dim×dim doubles — small (≤ a few KB for
                   # embedding dims); inline in meta.json keeps the sidecar
                   # self-contained. Dropping it would make a rotated index
                   # unrecoverable (codes are in the rotated basis).
                   "rotation": (None if index.rotation is None
                                else np.asarray(index.rotation,
                                                dtype=np.float64).tolist())},
                  f)
    _write_centroids(spark, index.centroids, path)
    index.codebook_df.write.mode("overwrite").parquet(
        os.path.join(path, "codebook.parquet"))
    (index.codes.write.mode("overwrite").partitionBy("list_id")
     .parquet(os.path.join(path, "codes")))


def load_ivf_pq(spark: SparkSession, path: str):
    from cuvs_spark.operators.ivf_pq import IVFPQIndex
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    rot = meta.get("rotation")
    return IVFPQIndex(centroids=_read_centroids(spark, path),
                      codebook_df=spark.read.parquet(
                          os.path.join(path, "codebook.parquet")),
                      codes=spark.read.parquet(os.path.join(path, "codes")),
                      pq_dim=meta["pq_dim"], metric=meta["metric"],
                      encode=meta.get("encode", "raw"),
                      rotation=(None if rot is None
                                else np.array(rot, dtype=np.float64)))


def save_ivf_sq(index, path: str) -> None:
    """IVF-SQ serialize analog (``ivf_sq.pyx`` save): centroids +
    int8 residual codes + the (lo, hi) quantization range."""
    from cuvs_spark.operators.ivf_pq import IVFSQIndex
    assert isinstance(index, IVFSQIndex)
    os.makedirs(path, exist_ok=True)
    spark = index.rcodes.sparkSession
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "ivf_sq", "metric": index.metric,
                   "n_lists": int(index.centroids.shape[0]),
                   "dim": int(index.centroids.shape[1]),
                   "lo": float(index.lo), "hi": float(index.hi)}, f)
    _write_centroids(spark, index.centroids, path)
    (index.rcodes.write.mode("overwrite").partitionBy("list_id")
     .parquet(os.path.join(path, "rcodes")))


def load_ivf_sq(spark: SparkSession, path: str):
    from cuvs_spark.operators.ivf_pq import IVFSQIndex
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return IVFSQIndex(centroids=_read_centroids(spark, path),
                      rcodes=spark.read.parquet(
                          os.path.join(path, "rcodes")),
                      lo=meta["lo"], hi=meta["hi"], metric=meta["metric"])


# ---------------------------------------------------------------------------
# CAGRA persistence — cagra_serialize.cuh: the graph is the index; the
# dataset rides along unless include_dataset=False (cagra.pyx:910).
# ---------------------------------------------------------------------------

def save_cagra(graph: DataFrame, path: str, *,
               dataset: DataFrame | None = None,
               include_dataset: bool = True,
               metric: str = "sqeuclidean") -> None:
    """CAGRA serialize analog. ``graph`` is the optimized edge table
    ``(src, dst, distance[, rank])``; ``dataset`` the ``(id, vec)``
    rows a search scores against."""
    os.makedirs(path, exist_ok=True)
    degree = graph.groupBy("src").count().agg(
        F.max("count")).collect()[0][0]
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "cagra", "metric": metric,
                   "graph_degree": int(degree or 0),
                   "include_dataset": bool(include_dataset
                                           and dataset is not None)}, f)
    graph.write.mode("overwrite").parquet(os.path.join(path, "edges.parquet"))
    if include_dataset and dataset is not None:
        dataset.write.mode("overwrite").parquet(
            os.path.join(path, "vectors.parquet"))


def load_cagra(spark: SparkSession, path: str):
    """→ ``(edges_df, dataset_df | None, meta)``."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    edges = spark.read.parquet(os.path.join(path, "edges.parquet"))
    dataset = None
    if meta.get("include_dataset", False):
        dataset = spark.read.parquet(os.path.join(path, "vectors.parquet"))
    return edges, dataset, meta


# ---------------------------------------------------------------------------
# Tiered persistence — tiered_index.pyx:48: ANN tier (any saved index
# type, nested directory) + brute-force delta tier + threshold.
# ---------------------------------------------------------------------------

def save_tiered(index, path: str) -> None:
    from cuvs_spark.operators.tiered import TieredIndex
    assert isinstance(index, TieredIndex)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "tiered", "metric": index.metric,
                   "min_ann_rows": int(index.min_ann_rows),
                   "create_ann_index_on_extend":
                       bool(index.create_ann_index_on_extend)}, f)
    save_index(index.ann, os.path.join(path, "ann"))
    index.delta.write.mode("overwrite").parquet(
        os.path.join(path, "delta.parquet"))


def load_tiered(spark: SparkSession, path: str):
    from cuvs_spark.operators.tiered import TieredIndex
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    delta = spark.read.parquet(os.path.join(path, "delta.parquet"))
    return TieredIndex(ann=load_index(spark, os.path.join(path, "ann")),
                       delta=delta, min_ann_rows=meta["min_ann_rows"],
                       create_ann_index_on_extend=meta[
                           "create_ann_index_on_extend"],
                       metric=meta["metric"])


def save_brute_force(index, path: str, *,
                     include_dataset: bool = True) -> None:
    """``brute_force.pyx:266`` — the exact index serializes as its
    dataset + metric (``include_dataset=False`` writes metadata only,
    matching the reference's flag)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"type": "brute_force", "metric": index.metric,
                   "include_dataset": include_dataset}, f)
    if include_dataset:
        index.dataset.write.mode("overwrite").parquet(
            os.path.join(path, "dataset"))


def load_brute_force(spark: SparkSession, path: str):
    """``brute_force.pyx:304``."""
    from cuvs_spark.operators.brute_force import BruteForceIndex
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if not meta.get("include_dataset", True):
        raise ValueError("index was saved with include_dataset=False; "
                         "re-bind a dataset via bf_build")
    ds = spark.read.parquet(os.path.join(path, "dataset"))
    return BruteForceIndex(ds, meta["metric"])


# ---------------------------------------------------------------------------
# Generic dispatch — the reference's one-call cuvsSerialize surface.
# ---------------------------------------------------------------------------

def save_index(index, path: str, **kw) -> None:
    """Type-dispatched save (per-index ``*.save`` in the reference)."""
    from cuvs_spark.operators.brute_force import BruteForceIndex
    from cuvs_spark.operators.ivf_flat import IVFFlatIndex
    from cuvs_spark.operators.ivf_pq import IVFPQIndex, IVFSQIndex
    from cuvs_spark.operators.ivf_rabitq import IVFRabitQIndex
    from cuvs_spark.operators.scann import ScannIndex
    from cuvs_spark.operators.tiered import TieredIndex
    savers = [(IVFFlatIndex, save_ivf_flat), (IVFPQIndex, save_ivf_pq),
              (IVFSQIndex, save_ivf_sq), (IVFRabitQIndex, save_ivf_rabitq),
              (ScannIndex, save_scann), (TieredIndex, save_tiered),
              (BruteForceIndex, save_brute_force)]
    for cls, fn in savers:
        if isinstance(index, cls):
            fn(index, path, **kw)
            return
    raise TypeError(f"no saver for index type {type(index).__name__}")


def load_index(spark: SparkSession, path: str):
    """Type-dispatched load keyed on the meta.json ``type`` field."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    loaders = {"ivf_flat": load_ivf_flat, "ivf_pq": load_ivf_pq,
               "ivf_sq": load_ivf_sq, "ivf_rabitq": load_ivf_rabitq,
               "scann": load_scann, "tiered": load_tiered,
               "brute_force": load_brute_force}
    if meta["type"] not in loaders:
        raise ValueError(f"unknown index type {meta['type']!r}")
    return loaders[meta["type"]](spark, path)
