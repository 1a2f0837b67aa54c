"""Groundtruth generation + big-ann binary writer roundtrips.

Mirrors reference ``cuvs_bench/generate_groundtruth`` (exact kNN +
neighbors/distances file emit) and ``split_groundtruth`` behavior on
deterministic fixtures.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from cuvs_spark.sources.groundtruth import (
    convert_bin,
    generate_groundtruth,
    neighbor_index_dtype,
    read_bin_header,
    split_groundtruth,
    write_bin_dataset,
)
from cuvs_spark.sources.index_store import read_bin_dataset


def _read_matrix(path, dtype):
    n, d, hdr = read_bin_header(path, np.dtype(dtype).itemsize)
    with open(path, "rb") as f:
        f.seek(hdr)
        return np.frombuffer(f.read(), dtype=dtype).reshape(n, d)


def test_write_bin_roundtrip(spark, vectors_df, tiny_vectors, tmp_path):
    path = str(tmp_path / "data.fbin")
    n, dim = write_bin_dataset(vectors_df, path)
    assert (n, dim) == tiny_vectors.shape
    M = _read_matrix(path, np.float32)
    np.testing.assert_array_equal(M, tiny_vectors)
    # and through the Spark reader
    back = read_bin_dataset(spark, path).orderBy("id").collect()
    assert len(back) == n
    np.testing.assert_allclose(np.array([r["vec"] for r in back]),
                               tiny_vectors)


def test_generate_groundtruth_files(spark, vectors_df, tiny_vectors,
                                    tmp_path):
    k = 5
    out = str(tmp_path / "gt")
    gt = generate_groundtruth(spark, vectors_df, k=k, n_queries=10,
                              queries_mode="choose", seed=7,
                              output_dir=out)
    rows = gt.collect()
    assert len(rows) == 10 * k

    Q = _read_matrix(os.path.join(out, "queries.fbin"), np.float32)
    N = _read_matrix(os.path.join(out, "groundtruth.neighbors.ibin"),
                     np.int32)
    D = _read_matrix(os.path.join(out, "groundtruth.distances.fbin"),
                     np.float32)
    assert Q.shape == (10, tiny_vectors.shape[1])
    assert N.shape == D.shape == (10, k)

    # files agree with a NumPy-exact recompute from the emitted queries
    d2 = ((Q[:, None, :].astype(np.float64)
           - tiny_vectors[None, :, :].astype(np.float64)) ** 2).sum(axis=2)
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(N, order)
    np.testing.assert_allclose(D, np.take_along_axis(d2, order, axis=1),
                               rtol=1e-6)
    # distances are rank-sorted rows
    assert (np.diff(D, axis=1) >= 0).all()


def test_generate_groundtruth_random_queries(spark, vectors_df):
    gt = generate_groundtruth(spark, vectors_df, k=3, n_queries=4,
                              queries_mode="random", seed=3)
    assert gt.count() == 12
    assert gt.select("qid").distinct().count() == 4


def test_split_groundtruth(tmp_path):
    n, k = 6, 4
    rng = np.random.default_rng(0)
    nbrs = rng.integers(0, 100, size=(n, k)).astype(np.int32)
    dists = rng.random((n, k)).astype(np.float32)
    combined = str(tmp_path / "gt.bin")
    with open(combined, "wb") as f:
        f.write(struct.pack("<II", n, k))
        f.write(nbrs.tobytes())
        f.write(dists.tobytes())
    npath, dpath = split_groundtruth(combined)
    np.testing.assert_array_equal(_read_matrix(npath, np.int32), nbrs)
    np.testing.assert_array_equal(_read_matrix(dpath, np.float32), dists)


def test_convert_bin(tmp_path):
    rng = np.random.default_rng(1)
    M = rng.random((7, 3)).astype(np.float32)
    src = str(tmp_path / "a.fbin")
    with open(src, "wb") as f:
        f.write(struct.pack("<II", 7, 3))
        f.write(M.tobytes())
    # fbin -> hbin (f16) downcast, chunked
    convert_bin(src, str(tmp_path / "a.hbin"), chunk_rows=2)
    H = _read_matrix(str(tmp_path / "a.hbin"), np.float16)
    np.testing.assert_array_equal(H, M.astype(np.float16))
    # normalized copy: unit rows
    convert_bin(src, str(tmp_path / "n.fbin"), normalize=True)
    N = _read_matrix(str(tmp_path / "n.fbin"), np.float32)
    np.testing.assert_allclose(np.linalg.norm(N, axis=1), 1.0, rtol=1e-6)


def test_neighbor_index_dtype():
    assert neighbor_index_dtype(1000) == np.int32
    assert neighbor_index_dtype(np.iinfo(np.int32).max + 1) == np.uint64


def test_extended_header(tmp_path):
    # files with >uint32 rows get the 16-byte uint64 header; detection is
    # size-balanced, so a tiny synthetic extended file must parse too
    path = str(tmp_path / "ext.fbin")
    M = np.arange(12, dtype=np.float32).reshape(3, 4)
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", 3, 4))
        f.write(M.tobytes())
    n, d, hdr = read_bin_header(path, 4)
    assert (n, d, hdr) == (3, 4, 16)
    np.testing.assert_array_equal(_read_matrix(path, np.float32), M)


def test_bin_header_property():
    """Header detection must balance for every dtype/shape combo."""
    import itertools
    import tempfile

    from cuvs_spark.sources.groundtruth import BIN_DTYPES
    for ext, dt in BIN_DTYPES.items():
        if ext == ".f16bin":
            continue
        for n, d in itertools.product([0, 1, 7, 64], [1, 3, 16]):
            M = np.zeros((n, d), dtype=dt)
            with tempfile.NamedTemporaryFile(suffix=ext, delete=False) as f:
                f.write(struct.pack("<II", n, d))
                f.write(M.tobytes())
                path = f.name
            nn, dd, hdr = read_bin_header(path, np.dtype(dt).itemsize)
            assert (nn, dd, hdr) == (n, d, 8), (ext, n, d)
            os.unlink(path)
