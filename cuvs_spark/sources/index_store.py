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
    <dir>/centroids.parquet               (list_id int, centroid array<float>)
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
        "list_id int, centroid array<float>")
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
        "list_id int, centroid array<float>")
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
