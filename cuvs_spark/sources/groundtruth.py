"""Groundtruth generation + big-ann binary writers (cuvs-bench parity).

Reference surface: ``python/cuvs_bench/cuvs_bench/generate_groundtruth/
__main__.py`` (random/chosen queries, batched exact kNN, neighbors+distances
file emit), ``split_groundtruth/__main__.py`` (+ the big-ann ``.pl`` split of
a combined groundtruth file), and ``_bin_format.py`` (legacy 8-byte uint32 /
extended 16-byte uint64 headers, dtype-by-extension).

Spark-first shape: the exact kNN runs through
:func:`cuvs_spark.operators.brute_force.knn` ``method="blas"`` — each
*dataset partition* reduces its BLAS tile to a local top-k before the only
shuffle (``n_parts x n_queries x k`` rows), which is the distributed analog
of the reference's 500k-row batching loop (``__main__.py:183``). File emit
streams ``toLocalIterator`` one Arrow batch at a time, so driver memory is
O(batch), never O(dataset) — the file is a serving-side export artifact, the
same role it has in the reference.
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cuvs_spark.operators.brute_force import knn

# dtype-by-extension (reference utils.py:14 dtype_from_filename /
# suffix_from_dtype; superset of index_store._DTYPES)
BIN_DTYPES = {
    ".fbin": np.float32,
    ".hbin": np.float16,
    ".f16bin": np.float16,
    ".ibin": np.int32,
    ".u64bin": np.uint64,
    ".u8bin": np.uint8,
    ".i8bin": np.int8,
}

_UINT32_MAX = (1 << 32) - 1


def suffix_from_dtype(dtype) -> str:
    """Reference ``utils.py:31``."""
    dt = np.dtype(dtype)
    for ext, d in BIN_DTYPES.items():
        if ext != ".f16bin" and np.dtype(d) == dt:
            return ext
    raise ValueError(f"no big-ann suffix for dtype {dt}")


def neighbor_index_dtype(n_base: int):
    """uint64 ids above int32 range (reference ``utils.py:48``)."""
    return np.uint64 if n_base > np.iinfo(np.int32).max else np.int32


def read_bin_header(path: str, itemsize: int) -> tuple[int, int, int]:
    """Size-balanced legacy/extended header detection (``_bin_format.py``).

    Returns (n_rows, n_cols, header_bytes)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(16)
    if len(head) >= 8:
        n, d = struct.unpack("<II", head[:8])
        if 8 + n * d * itemsize == size:
            return n, d, 8
    if len(head) == 16:
        n, d = struct.unpack("<QQ", head)
        if 16 + n * d * itemsize == size:
            return n, d, 16
    raise ValueError(f"{path}: no header layout balances the file size")


def _write_header(f, n_rows: int, n_cols: int) -> None:
    if n_rows > _UINT32_MAX or n_cols > _UINT32_MAX:
        f.write(struct.pack("<QQ", n_rows, n_cols))
    else:
        f.write(struct.pack("<II", n_rows, n_cols))


def write_bin_dataset(df: DataFrame, path: str, *,
                      id_col: str = "id", vec_col: str = "vec",
                      dtype=None) -> tuple[int, int]:
    """Export an (id, vec) DataFrame to a big-ann binary file.

    Rows are emitted in ``id_col`` order; the header row count comes from a
    distributed count, and the payload streams through ``toLocalIterator``
    (one partition in driver memory at a time). Returns (n_rows, dim)."""
    if dtype is None:
        dtype = BIN_DTYPES[os.path.splitext(path)[1]]
    dtype = np.dtype(dtype)
    ordered = df.select(F.col(id_col).alias("_i"),
                        F.col(vec_col).alias("_v")).orderBy("_i")
    n_rows = ordered.count()
    dim = None
    wrote = 0
    with open(path, "wb") as f:
        f.seek(0)
        # header written once dim is known; placeholder if empty
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            if dim is None:
                dim = len(row["_v"])
                _write_header(f, n_rows, dim)
            f.write(np.asarray(row["_v"], dtype=dtype).tobytes())
            wrote += 1
        if dim is None:
            dim = 0
            _write_header(f, 0, 0)
    assert wrote == n_rows, f"row drift during export: {wrote} != {n_rows}"
    return n_rows, dim


def _write_matrix_bin(df: DataFrame, path: str, value_col: str, k: int,
                      dtype, *, qid_col: str = "qid",
                      rank_col: str = "rank") -> int:
    """Write per-qid rank-ordered values as an (n_queries, k) bin matrix."""
    dtype = np.dtype(dtype)
    rows = (df.groupBy(qid_col)
              .agg(F.array_sort(F.collect_list(F.struct(
                  F.col(rank_col).alias("r"),
                  F.col(value_col).alias("v")))).alias("rv"))
              .select(F.col(qid_col).alias("_q"),
                      F.col("rv.v").alias("_vals"))
              .orderBy("_q"))
    n = rows.count()
    with open(path, "wb") as f:
        _write_header(f, n, k)
        for row in rows.toLocalIterator(prefetchPartitions=True):
            vals = row["_vals"]
            assert len(vals) == k, f"qid {row['_q']}: {len(vals)} != k={k}"
            f.write(np.asarray(vals, dtype=dtype).tobytes())
    return n


def generate_groundtruth(spark: SparkSession, dataset: DataFrame, *,
                         k: int = 100, metric: str = "sqeuclidean",
                         queries: DataFrame | None = None,
                         n_queries: int = 10000,
                         queries_mode: str = "choose", seed: int = 42,
                         output_dir: str | None = None,
                         id_col: str = "id", vec_col: str = "vec"
                         ) -> DataFrame:
    """Exact-kNN groundtruth over a vector table (reference ``__main__.py``).

    ``queries_mode``: ``"choose"`` samples ``n_queries`` dataset rows with a
    seeded shuffle (reference ``choose_random_queries``); ``"random"`` draws
    uniform vectors (reference ``generate_random_queries``); or pass a
    ``queries`` DataFrame directly. When ``output_dir`` is set, emits
    ``queries<ext>``, ``groundtruth.neighbors.ibin`` (or ``.u64bin`` for
    >int32 bases) and ``groundtruth.distances.fbin`` exactly like the
    reference CLI. Returns the long-form (qid, nid, distance, rank) frame.
    """
    base = dataset.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if queries is None:
        if queries_mode == "choose":
            queries = (base.orderBy(F.xxhash64("id", F.lit(seed)))
                           .limit(n_queries)
                           .select(F.col("id"),
                                   F.col("vec").alias("qvec")))
            # stable, dense qids independent of which rows were sampled
            queries = queries.select(
                (F.row_number().over(Window.orderBy("id")) - 1).alias("qid"),
                F.col("qvec").alias("vec"))
        elif queries_mode == "random":
            dim = len(base.select("vec").first()["vec"])
            rng = np.random.default_rng(seed)
            Q = rng.uniform(size=(n_queries, dim)).astype(np.float32)
            queries = spark.createDataFrame(
                [(int(i), Q[i].tolist()) for i in range(n_queries)],
                "qid long, vec array<float>")
        else:
            raise ValueError(queries_mode)
    else:
        queries = queries.select(F.col("qid"), F.col(vec_col).alias("vec"))

    n_base = base.count()
    gt = knn(base, queries, k=k, metric=metric, method="blas")

    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)
        write_bin_dataset(queries, os.path.join(output_dir, "queries.fbin"),
                          id_col="qid", vec_col="vec")
        nbr_dtype = neighbor_index_dtype(n_base)
        nbr_path = os.path.join(
            output_dir, "groundtruth.neighbors"
            + (".u64bin" if nbr_dtype == np.uint64 else ".ibin"))
        gt = gt.localCheckpoint(eager=True)  # one kNN, two file scans
        _write_matrix_bin(gt, nbr_path, "nid", k, nbr_dtype)
        _write_matrix_bin(
            gt, os.path.join(output_dir, "groundtruth.distances.fbin"),
            "distance", k, np.float32)
    return gt


def split_groundtruth(path: str, out_prefix: str | None = None
                      ) -> tuple[str, str]:
    """Split a combined big-ann groundtruth file (reference
    ``split_groundtruth.pl``): header (n, k), then ``n*k`` int32 neighbor
    ids, then ``n*k`` float32 distances. Emits
    ``<prefix>.neighbors.ibin`` / ``<prefix>.distances.fbin``."""
    if out_prefix is None:
        out_prefix = os.path.splitext(path)[0]
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        n, k = struct.unpack("<II", f.read(8))
        if 8 + n * k * 8 != size:
            raise ValueError(f"{path}: not a combined groundtruth file")
        nbr_path = out_prefix + ".neighbors.ibin"
        dst_path = out_prefix + ".distances.fbin"
        with open(nbr_path, "wb") as out:
            _write_header(out, n, k)
            _copy_stream(f, out, n * k * 4)
        with open(dst_path, "wb") as out:
            _write_header(out, n, k)
            _copy_stream(f, out, n * k * 4)
    return nbr_path, dst_path


def convert_bin(src: str, dst: str, *, normalize: bool = False,
                chunk_rows: int = 65536) -> tuple[int, int]:
    """Dtype-converting copy between big-ann binary files (reference
    ``get_dataset/fbin_to_f16bin.py``; ``hdf5_to_fbin.py``'s ``-n``
    L2-normalize option). Streams ``chunk_rows`` at a time — never
    materializes the matrix — so billion-row files convert in constant
    memory. Source/target dtypes come from the file extensions."""
    src_dt = np.dtype(BIN_DTYPES[os.path.splitext(src)[1]])
    dst_dt = np.dtype(BIN_DTYPES[os.path.splitext(dst)[1]])
    n, d, hdr = read_bin_header(src, src_dt.itemsize)
    with open(src, "rb") as fin, open(dst, "wb") as fout:
        fin.seek(hdr)
        _write_header(fout, n, d)
        left = n
        while left:
            rows = min(chunk_rows, left)
            M = np.frombuffer(fin.read(rows * d * src_dt.itemsize),
                              dtype=src_dt).reshape(rows, d)
            if normalize:
                M = M.astype(np.float64)
                nrm = np.linalg.norm(M, axis=1, keepdims=True)
                M = M / np.where(nrm == 0, 1.0, nrm)
            fout.write(M.astype(dst_dt).tobytes())
            left -= rows
    return n, d


def _copy_stream(src, dst, nbytes: int, chunk: int = 1 << 24) -> None:
    left = nbytes
    while left:
        buf = src.read(min(chunk, left))
        if not buf:
            raise ValueError("truncated groundtruth payload")
        dst.write(buf)
        left -= len(buf)
