"""Cross-format graph index export (SURVEY.md §2.1).

Reference: ``hnsw.from_cagra`` (``hnsw.pyx:410``,
``cpp/include/cuvs/neighbors/hnsw.hpp:474`` — build on GPU, serve on
CPU) and ``vamana.save`` DiskANN format (``vamana.pyx:228``).

Conversion semantics: a CAGRA graph re-keyed into an HNSW-style
layer-0 adjacency (``from_cagra`` is exactly a re-keying — the
reference reuses the CAGRA graph as HNSW's base layer) plus a JSON/
Parquet layout any exporter can serialize from. The DiskANN binary
formats (mem-index + sector-aligned disk index) are emitted for real
by :func:`vamana_save_diskann`, byte-layout per the reference's
``vamana_serialize.cuh``, with round-trip readers. The hnswlib file
format (``HierarchicalNSW::saveIndex`` layout, what ``hnsw.pyx:317``
loads) is emitted by :func:`hnsw_save_hnswlib` and parsed back by
:func:`read_hnswlib_index` / :func:`hnsw_load_hnswlib` — validated by
exact self-round-trip only (hnswlib itself is not in this container,
so a byte-layout divergence from the real library would not be caught
here; field order/widths follow hnswlib's public source).
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


def _hnsw_level_expr(id_col: str, m: int, max_level: int) -> str:
    """Deterministic HNSW level: ``level = max L: h mod m^L == 0`` for
    a uniform 64-bit hash — exactly geometric(p=1/m) (the classic
    ``floor(-ln(U)·mL)`` draw, integer-exact and reproducible across
    any partitioning), capped at ``max_level``."""
    h = f"abs(xxhash64({id_col}))"
    lvl = "0"
    for level in range(max_level, 0, -1):
        lvl = f"CASE WHEN {h} % {m ** level} = 0 THEN {level} ELSE {lvl} END"
    return lvl


def hnsw_build(dataset: DataFrame, *, graph_degree: int = 16,
               ef_construction: int = 200, metric: str = "sqeuclidean",
               hierarchy: str = "none", M: int | None = None,
               id_col: str = "id", vec_col: str = "vec",
               **builder_kw) -> DataFrame:
    """``hnsw.build`` (``hnsw.pyx:472``): the reference builds the base
    layer via CAGRA; ``hierarchy='none'`` re-keys it as a single-layer
    index, ``hierarchy='cpu'``/``'gpu'``/``'multi'`` adds the standard
    HNSW upper layers on top (``hnsw.pyx:126-139``).

    Upper layers: each node's level is an integer-exact geometric(1/M)
    draw from its id hash (no RNG state, partition-independent), so
    layer ℓ holds ~n/Mℓ nodes and the layer subsets are nested by
    construction. Layer ℓ≥1 adjacency is the exact M-NN graph within
    the subset — those subsets shrink geometrically, so the exact
    builds cost a vanishing fraction of the base CAGRA build.
    Returns the layered adjacency ``(layer, src, neighbors)`` plus one
    ``layer = -1`` metadata row carrying the build-time ``M``
    (``src = M``), so ``extend`` never has to re-infer the level-hash
    modulus from adjacency widths (which undershoots on sparse upper
    layers and would re-level existing nodes)."""
    from cuvs_spark.operators.graph import cagra_build
    g = cagra_build(dataset, graph_degree, metric=metric, id_col=id_col,
                    vec_col=vec_col, **builder_kw)
    layers = hnsw_from_cagra(g)
    if hierarchy in ("none", None):
        return layers
    m = M or max(2, graph_degree // 2)
    d = dataset.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
    return (layers.unionByName(_build_upper_layers(d, m, metric))
            .unionByName(_m_meta_row(d.sparkSession, m)))


def _m_meta_row(spark: SparkSession, m: int) -> DataFrame:
    """One ``(layer=-1, src=M, neighbors=[])`` row — the index's M
    parameter carried in-band so it survives Parquet save/load."""
    return spark.range(1).select(
        F.lit(-1).alias("layer"), F.lit(int(m)).cast("long").alias("src"),
        F.expr("array()").cast("array<bigint>").alias("neighbors"))


def _build_upper_layers(d: DataFrame, m: int,
                        metric: str) -> DataFrame:
    """Exact M-NN graphs for every level ≥ 1 (subsets shrink
    geometrically via the integer-exact level hash). ``d`` must be
    ``(id, vec)``."""
    import math

    from cuvs_spark.operators.brute_force import knn
    spark = d.sparkSession
    n = d.count()
    max_level = max(1, int(math.log(max(n, 2)) / math.log(m)))
    lv = d.withColumn("_lvl", F.expr(_hnsw_level_expr("id", m, max_level)))
    layers = spark.createDataFrame(
        [], "layer int, src long, neighbors array<bigint>")
    for level in range(1, max_level + 1):
        sub = lv.filter(F.col("_lvl") >= level).select("id", "vec")
        cnt = sub.count()
        if cnt < 2:
            break
        q = sub.select(F.col("id").alias("qid"), F.col("vec").alias("qv"))
        nn = (knn(sub, q, min(m + 1, cnt), metric, qvec_col="qv")
              .filter(F.col("qid") != F.col("nid")))
        lay = (nn.groupBy("qid")
               .agg(F.expr("transform(array_sort(collect_list("
                           "struct(rank, nid))), x -> x.nid)")
                    .alias("neighbors"))
               .select(F.lit(level).alias("layer"),
                       F.col("qid").alias("src"),
                       F.expr(f"slice(neighbors, 1, {m})")
                       .alias("neighbors")))
        layers = layers.unionByName(lay)
    return layers


def hnsw_search(layers: DataFrame, dataset: DataFrame, queries: DataFrame,
                k: int = 10, *, ef: int = 40, metric: str = "sqeuclidean",
                id_col: str = "id", vec_col: str = "vec",
                qid_col: str = "qid", qvec_col: str = "vec") -> DataFrame:
    """``hnsw.search`` (``hnsw.pyx:648``). Flat view: the base-layer
    beam with pool size ``ef``. With upper layers present, the
    standard HNSW descent: per layer from the top, a 1-NN greedy walk
    (a width-1 beam over that layer's edges, seeded by the layer
    above's winner) hands its entry point down; the base layer runs
    the ``ef`` beam from the descended entries instead of random
    seeds."""
    from cuvs_spark.operators.graph import cagra_search
    levels = [r["layer"] for r in
              layers.select("layer").distinct().collect()]
    top = max(levels)
    q = queries.select(F.col(qid_col).cast("long").alias("qid"),
                       F.col(qvec_col).alias("qv"))
    seeds = None
    if top > 0:
        # deterministic global entry: smallest id in the top layer
        entry = (layers.filter(F.col("layer") == top)
                 .agg(F.min("src").alias("nid")).head()["nid"])
        seeds = q.select("qid").withColumn("nid", F.lit(int(entry)))
        for level in range(top, 0, -1):
            edges = (layers.filter(F.col("layer") == level)
                     .select("src", F.explode("neighbors").alias("dst")))
            won = cagra_search(edges, dataset, q, 1, itopk=2,
                               search_width=1, max_iterations=3,
                               metric=metric, id_col=id_col,
                               vec_col=vec_col, qvec_col="qv",
                               seeds=seeds)
            seeds = won.filter(F.col("rank") == 1).select("qid", "nid") \
                .localCheckpoint()
        # the descended entry improves the start, the shared random
        # seed set keeps the basin coverage a single entry can't give
        # (greedy descent can stall in a local basin on hard data)
        rand = (dataset.select(F.col(id_col).cast("long").alias("nid"))
                .orderBy(F.xxhash64("nid"), "nid").limit(8))
        seeds = (seeds.unionByName(q.select("qid")
                                   .join(F.broadcast(rand)))
                 .distinct())
    edges = (layers.filter(F.col("layer") == 0)
             .select("src", F.explode("neighbors").alias("dst")))
    return cagra_search(edges, dataset, q, k, itopk=max(ef, k),
                        metric=metric, id_col=id_col, vec_col=vec_col,
                        qvec_col="qv", seeds=seeds)


def hnsw_extend(layers: DataFrame, dataset: DataFrame,
                new_rows: DataFrame, graph_degree: int = 16, *,
                metric: str = "sqeuclidean", id_col: str = "id",
                vec_col: str = "vec") -> tuple[DataFrame, DataFrame]:
    """``hnsw.extend`` (``hnsw.pyx:561``): splice the batch into the
    base layer via :func:`cagra_extend`, re-key back to the layered
    view. If the input index carries upper layers, they are rebuilt
    over the extended dataset (the level hash is a pure function of
    (id, M): M comes from the index's ``layer=-1`` metadata row, so
    existing nodes keep their levels and only the new ids draw fresh
    ones; the upper subsets are geometrically small, so the rebuild is
    a vanishing cost). Indexes saved before the metadata row existed
    fall back to inferring M from the widest upper adjacency. Returns
    (layers, dataset)."""
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
    out = hnsw_from_cagra(g2)
    # hierarchical iff the index carries the M metadata row OR any
    # upper-layer rows: a multi-layer build whose (small) seed set drew
    # no level>=1 nodes still has the meta row, and extend must rebuild
    # upper layers over the now-larger dataset instead of silently
    # degrading the index to flat (and dropping the meta row with it).
    # One aggregation job reads meta-M, upper presence, and the legacy
    # width fallback together (a flat index pays a single scan, not
    # isEmpty + meta head).
    probe = layers.select(
        F.max(F.when(F.col("layer") == -1, F.col("src"))).alias("m"),
        F.max(F.when(F.col("layer") > 0, F.lit(1))).alias("has_upper"),
        F.max(F.when(F.col("layer") > 0, F.size("neighbors")))
        .alias("maxw")).head()
    if probe["m"] is not None or probe["has_upper"] is not None:
        m = int(probe["m"] if probe["m"] is not None
                else (probe["maxw"] or 2))  # legacy: widest adjacency
        dd = d2.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).alias("vec"))
        out = (out.unionByName(_build_upper_layers(dd, m, metric))
               .unionByName(_m_meta_row(layers.sparkSession, m)))
    return out, d2


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


# ---------------------------------------------------------------------------
# DiskANN binary emit (vamana.save — MSFT DiskANN OSS file formats)
# ---------------------------------------------------------------------------

def _adjacency_arrays(graph: DataFrame, dataset: DataFrame, *,
                      id_col: str = "id", vec_col: str = "vec"):
    """Collect (ids→0..n-1 remap, row-major float32 data, per-node
    uint32 neighbor lists) — the driver-side staging every DiskANN
    emitter needs. Export is a driver-side emit by design (the file
    targets a CPU serving host); a 100 TB corpus would shard into one
    file per partition upstream."""
    import numpy as np

    rows = (dataset.select(F.col(id_col).cast("long").alias("id"), vec_col)
            .orderBy("id").collect())
    ids = [r["id"] for r in rows]
    pos = {v: i for i, v in enumerate(ids)}
    data = np.array([r[vec_col] for r in rows], dtype=np.float32)
    adj = (graph.groupBy("src")
           .agg(F.array_sort(F.collect_list(F.struct("distance", "dst")))
                .alias("_n"))
           .select("src", F.expr("transform(_n, x -> x.dst)").alias("nbrs"))
           .collect())
    nbrs = [np.array([], dtype=np.uint32)] * len(ids)
    for r in adj:
        if r["src"] not in pos:
            raise ValueError(
                f"graph src id {r['src']} not present in the dataset")
        missing = [d for d in r["nbrs"] if d not in pos]
        if missing:
            raise ValueError(
                f"graph node {r['src']} references dst ids absent from "
                f"the dataset: {missing[:5]}")
        nbrs[pos[r["src"]]] = np.array([pos[d] for d in r["nbrs"]],
                                       dtype=np.uint32)
    return ids, data, nbrs


def _medoid_pos(data) -> int:
    import numpy as np
    mu = data.mean(axis=0)
    return int(np.argmin(((data - mu) ** 2).sum(axis=1)))


def vamana_save_diskann(graph: DataFrame, dataset: DataFrame, path: str, *,
                        include_dataset: bool = True,
                        sector_aligned: bool = False,
                        id_col: str = "id", vec_col: str = "vec") -> dict:
    """``vamana.save`` binary emit (``vamana.pyx:228``;
    ``vamana_serialize.cuh:313`` mem-index / ``:124`` sector-aligned):

    * mem-index (MSFT DiskANN OSS): ``uint64 index_size, uint32
      max_degree, uint32 start, uint64 num_frozen`` then per node
      ``uint32 nnbrs + nnbrs×uint32 ids``; dataset sidecar ``.data`` =
      ``int32 n, int32 dim`` + row-major float32 (``to_file``,
      ``vamana_serialize.cuh:32``).
    * ``sector_aligned=True`` → ``<path>_disk.index``: 4096-byte
      sectors; sector 0 = ``int32 9, int32 1`` + 9×uint64 metadata
      (npts, ndims, medoid, max_node_len, nnodes_per_sector, 0, 0, 0,
      file_size); nodes packed ``coords + uint32 nnbrs + ids`` at
      ``max_node_len`` strides (``serialize_sector_aligned``).

    ``start`` is the medoid (closest point to the centroid). Returns
    the metadata dict for inspection."""
    import struct

    import numpy as np

    ids, data, nbrs = _adjacency_arrays(graph, dataset, id_col=id_col,
                                        vec_col=vec_col)
    isolated = [ids[i] for i, x in enumerate(nbrs) if len(x) == 0]
    if isolated:
        # the reference format asserts nnbrs > 0 per node
        # (vamana_serialize.cuh); DiskANN readers may reject such files
        raise ValueError(
            f"{len(isolated)} dataset node(s) have no out-edges in the "
            f"graph (first few ids: {isolated[:5]}); DiskANN requires "
            "every node to have at least one neighbor")
    npts, ndims = data.shape
    medoid = _medoid_pos(data)
    max_degree = max((len(x) for x in nbrs), default=0)
    meta = {"npts": npts, "ndims": ndims, "medoid": medoid,
            "max_degree": int(max_degree)}

    if sector_aligned:
        sector_len = 4096
        max_node_len = (max_degree + 1) * 4 + ndims * 4
        nnodes_per_sector = sector_len // max_node_len
        if nnodes_per_sector > 0:
            n_sectors = -(-npts // nnodes_per_sector)
        else:
            n_sectors = npts * (-(-max_node_len // sector_len))
        file_size = (n_sectors + 1) * sector_len
        out = path + "_disk.index"
        with open(out, "wb") as f:
            head = struct.pack("<ii", 9, 1) + struct.pack(
                "<9Q", npts, ndims, medoid, max_node_len,
                nnodes_per_sector, 0, 0, 0, file_size)
            f.write(head.ljust(sector_len, b"\0"))
            if nnodes_per_sector > 0:
                cur = 0
                for _s in range(n_sectors):
                    buf = bytearray(sector_len)
                    for slot in range(nnodes_per_sector):
                        if cur >= npts:
                            break
                        node = (data[cur].tobytes()
                                + struct.pack("<I", len(nbrs[cur]))
                                + nbrs[cur].tobytes())
                        off = slot * max_node_len
                        buf[off:off + len(node)] = node
                        cur += 1
                    f.write(bytes(buf))
            else:
                per = -(-max_node_len // sector_len)
                for cur in range(npts):
                    buf = bytearray(per * sector_len)
                    node = (data[cur].tobytes()
                            + struct.pack("<I", len(nbrs[cur]))
                            + nbrs[cur].tobytes())
                    buf[:len(node)] = node
                    f.write(bytes(buf))
        meta["max_node_len"] = max_node_len
        meta["nnodes_per_sector"] = nnodes_per_sector
        meta["file_size"] = file_size
    else:
        index_size = 24 + sum(4 * (len(x) + 1) for x in nbrs)
        with open(path, "wb") as f:
            f.write(struct.pack("<QIIQ", index_size, max_degree,
                                medoid, 0))
            for x in nbrs:
                f.write(struct.pack("<I", len(x)))
                f.write(x.tobytes())
        meta["index_size"] = index_size

    if include_dataset:
        import struct as _s
        with open(path + ".data", "wb") as f:
            f.write(_s.pack("<ii", npts, ndims))
            f.write(data.tobytes())
    return meta


# ---------------------------------------------------------------------------
# hnswlib binary emit (hnsw.save — the file format hnsw.pyx:317 loads)
# ---------------------------------------------------------------------------

def hnsw_save_hnswlib(layers: DataFrame, dataset: DataFrame, path: str, *,
                      ef_construction: int = 200, id_col: str = "id",
                      vec_col: str = "vec") -> dict:
    """Emit our layered HNSW adjacency in hnswlib's own serialization
    (the format ``hnsw.pyx:317`` / ``cpp/src/neighbors/detail/hnsw.hpp``
    load for CPU serving; layout per hnswlib's public
    ``HierarchicalNSW::saveIndex``):

    * header (little-endian): ``size_t offsetLevel0(=0), max_elements,
      cur_element_count, size_data_per_element, label_offset,
      offsetData; int32 maxlevel; uint32 enterpoint; size_t maxM,
      maxM0, M; double mult(=1/ln M); size_t ef_construction``.
    * level-0 blob: per element ``uint32 nlinks + maxM0×uint32 link
      slots`` then ``dim×float32`` data then ``size_t label``
      (label = our original row id).
    * per element: ``uint32 linkListSize`` (bytes; 0 when level 0),
      then for levels 1..level one ``(uint32 nlinks + maxM×uint32)``
      block each.

    Node levels and the entry point follow our index exactly (level =
    highest layer the node appears in; entry = smallest id in the top
    layer, matching :func:`hnsw_search`). Driver-side emit by design —
    the file targets a single CPU serving host. Returns the header
    metadata for inspection."""
    import struct

    import numpy as np

    drows = (dataset.select(F.col(id_col).cast("long").alias("id"),
                            vec_col)
             .orderBy("id").collect())
    if not drows:
        raise ValueError(
            "hnsw_save_hnswlib: empty dataset — hnswlib has no "
            "zero-element serialization; nothing to write")
    ids = [r["id"] for r in drows]
    neg = [v for v in ids if v < 0]
    if neg:
        # labels serialize as unsigned size_t ("<Q"); fail loudly
        # instead of struct.error after a partially-written file
        raise ValueError(
            f"hnswlib labels are unsigned; {len(neg)} negative id(s) "
            f"in the dataset (first few: {neg[:5]})")
    pos = {v: i for i, v in enumerate(ids)}
    data = np.array([r[vec_col] for r in drows], dtype=np.float32)
    npts, ndims = data.shape

    rows = (layers.filter(F.col("layer") >= 0)
            .select("layer", "src", "neighbors").collect())
    per_level: dict[int, dict[int, list[int]]] = {}
    for r in rows:
        missing = [d for d in r["neighbors"] if d not in pos]
        if missing or r["src"] not in pos:
            bad = missing[:5] if missing else [r["src"]]
            raise ValueError(
                f"layer {r['layer']} references ids absent from the "
                f"dataset: {bad}")
        per_level.setdefault(r["layer"], {})[pos[r["src"]]] = \
            [pos[d] for d in r["neighbors"]]
    level0 = per_level.get(0, {})
    node_level = np.zeros(npts, dtype=np.int64)
    for lvl, adj in per_level.items():
        if lvl > 0:
            for p in adj:
                node_level[p] = max(node_level[p], lvl)
    maxlevel = int(node_level.max()) if npts else 0

    meta_m = (layers.filter(F.col("layer") == -1)
              .agg(F.max("src")).head()[0])
    max_m0 = max((len(v) for v in level0.values()), default=1)
    upper_deg = max((len(v) for lvl, adj in per_level.items() if lvl > 0
                     for v in adj.values()), default=0)
    m = int(meta_m) if meta_m is not None else \
        max(upper_deg, max(2, max_m0 // 2))
    max_m = max(m, upper_deg, 1)

    if maxlevel > 0:
        tops = [p for p in range(npts) if node_level[p] == maxlevel]
        enterpoint = min(tops, key=lambda p: ids[p])
    else:
        enterpoint = 0

    size_links0 = 4 + max_m0 * 4
    size_links_per = 4 + max_m * 4
    size_data_per = size_links0 + ndims * 4 + 8
    header = struct.pack(
        "<6QiI3Qd1Q", 0, npts, npts, size_data_per,
        size_links0 + ndims * 4, size_links0, maxlevel, enterpoint,
        max_m, max_m0, m, 1.0 / np.log(max(m, 2)), ef_construction)
    with open(path, "wb") as f:
        f.write(header)
        for p in range(npts):
            links = level0.get(p, [])
            # hnswlib reads the level-0 count as an unsigned SHORT and
            # keeps per-element flags in the word's upper bytes — a
            # count >= 2^16 would silently corrupt on their side even
            # though our uint32 emit can represent it
            if len(links) >= 65536:
                raise ValueError(
                    f"hnsw_save_hnswlib: node {ids[p]} has {len(links)} "
                    f"level-0 links; hnswlib stores the link count in an "
                    f"unsigned short (< 65536)")
            buf = struct.pack("<I", len(links)) + np.array(
                links, dtype=np.uint32).tobytes()
            f.write(buf.ljust(size_links0, b"\0"))
            f.write(data[p].tobytes())
            f.write(struct.pack("<Q", ids[p]))
        for p in range(npts):
            lvl = int(node_level[p])
            f.write(struct.pack("<I", size_links_per * lvl))
            for level in range(1, lvl + 1):
                links = per_level.get(level, {}).get(p, [])
                buf = struct.pack("<I", len(links)) + np.array(
                    links, dtype=np.uint32).tobytes()
                f.write(buf.ljust(size_links_per, b"\0"))
    return {"npts": npts, "ndims": ndims, "maxlevel": maxlevel,
            "enterpoint": enterpoint, "M": m, "maxM": max_m,
            "maxM0": max_m0, "ef_construction": ef_construction}


def read_hnswlib_index(path: str):
    """Round-trip reader for :func:`hnsw_save_hnswlib`'s format →
    ``(meta dict, level0 links list, {level: {pos: links}}, data,
    labels)``."""
    import struct

    import numpy as np

    with open(path, "rb") as f:
        (off0, max_el, n, size_data_per, label_off, off_data, maxlevel,
         enterpoint, max_m, max_m0, m, mult, efc) = struct.unpack(
            "<6QiI3Qd1Q", f.read(6 * 8 + 4 + 4 + 3 * 8 + 8 + 8))
        ndims = (label_off - off_data) // 4
        level0, rows, labels = [], [], []
        for _ in range(n):
            blob = f.read(size_data_per)
            (cnt,) = struct.unpack("<I", blob[:4])
            level0.append(np.frombuffer(
                blob[4:4 + 4 * cnt], dtype=np.uint32))
            rows.append(np.frombuffer(
                blob[off_data:off_data + 4 * ndims], dtype=np.float32))
            labels.append(struct.unpack("<Q", blob[label_off:])[0])
        size_links_per = 4 + max_m * 4
        upper: dict[int, dict[int, list[int]]] = {}
        for p in range(n):
            (nbytes,) = struct.unpack("<I", f.read(4))
            blob = f.read(nbytes)
            for li in range(nbytes // size_links_per):
                block = blob[li * size_links_per:(li + 1) * size_links_per]
                (cnt,) = struct.unpack("<I", block[:4])
                upper.setdefault(li + 1, {})[p] = list(np.frombuffer(
                    block[4:4 + 4 * cnt], dtype=np.uint32))
    return ({"npts": n, "ndims": ndims, "maxlevel": maxlevel,
             "enterpoint": enterpoint, "M": m, "maxM": max_m,
             "maxM0": max_m0, "mult": mult, "ef_construction": efc},
            level0, upper, np.vstack(rows) if rows else None, labels)


def hnsw_load_hnswlib(spark: SparkSession, path: str):
    """``hnsw.load`` (``hnsw.pyx:317``): read an hnswlib-serialized
    index into the engine's layered view → ``(layers, dataset)`` with
    original labels as ids, ready for :func:`hnsw_search` /
    :func:`hnsw_extend`. The file's ``M`` is carried into the
    ``layer = -1`` metadata row. Driver-side parse (the file targets a
    single serving host); the returned DataFrames distribute."""
    meta, level0, upper, data, labels = read_hnswlib_index(path)
    rows = [(0, int(labels[p]),
             [int(labels[int(d)]) for d in level0[p]])
            for p in range(meta["npts"])]
    for lvl, adj in upper.items():
        rows += [(int(lvl), int(labels[p]),
                  [int(labels[int(d)]) for d in nbrs])
                 for p, nbrs in adj.items()]
    layers = spark.createDataFrame(
        rows, "layer int, src long, neighbors array<bigint>") \
        .unionByName(_m_meta_row(spark, meta["M"]))
    dataset = spark.createDataFrame(
        [(int(labels[p]), [float(x) for x in data[p]])
         for p in range(meta["npts"])], "id long, vec array<float>")
    return layers, dataset


def read_diskann_index(path: str):
    """Round-trip reader for the mem-index format (+ ``.data``
    sidecar when present) → (meta dict, list[np.uint32 array],
    data|None)."""
    import os
    import struct

    import numpy as np

    with open(path, "rb") as f:
        index_size, max_degree, start, frozen = struct.unpack(
            "<QIIQ", f.read(24))
        nbrs = []
        while f.tell() < index_size:
            (n,) = struct.unpack("<I", f.read(4))
            nbrs.append(np.frombuffer(f.read(4 * n), dtype=np.uint32))
    data = None
    if os.path.exists(path + ".data"):
        with open(path + ".data", "rb") as f:
            n, dim = struct.unpack("<ii", f.read(8))
            data = np.frombuffer(f.read(4 * n * dim),
                                 dtype=np.float32).reshape(n, dim)
    return ({"index_size": index_size, "max_degree": max_degree,
             "start": start, "num_frozen": frozen}, nbrs, data)


def read_diskann_disk_index(path: str):
    """Round-trip reader for the sector-aligned ``_disk.index``
    format → (meta dict, list[np.uint32 array], np.float32 data)."""
    import struct

    import numpy as np

    sector_len = 4096
    with open(path, "rb") as f:
        msize, mndims = struct.unpack("<ii", f.read(8))
        meta_vals = struct.unpack(f"<{msize}Q", f.read(8 * msize))
        (npts, ndims, medoid, max_node_len, nnodes_per_sector,
         _fn, _fl, _ar, file_size) = meta_vals
        nbrs, rows = [], []
        f.seek(sector_len)
        if nnodes_per_sector > 0:
            cur = 0
            while cur < npts:
                sector = f.read(sector_len)
                for slot in range(nnodes_per_sector):
                    if cur >= npts:
                        break
                    node = sector[slot * max_node_len:
                                  (slot + 1) * max_node_len]
                    rows.append(np.frombuffer(
                        node[:ndims * 4], dtype=np.float32))
                    (n,) = struct.unpack(
                        "<I", node[ndims * 4:ndims * 4 + 4])
                    nbrs.append(np.frombuffer(
                        node[ndims * 4 + 4:ndims * 4 + 4 + 4 * n],
                        dtype=np.uint32))
                    cur += 1
        else:
            per = -(-max_node_len // sector_len)
            for _ in range(npts):
                node = f.read(per * sector_len)
                rows.append(np.frombuffer(node[:ndims * 4],
                                          dtype=np.float32))
                (n,) = struct.unpack("<I", node[ndims * 4:ndims * 4 + 4])
                nbrs.append(np.frombuffer(
                    node[ndims * 4 + 4:ndims * 4 + 4 + 4 * n],
                    dtype=np.uint32))
    return ({"npts": npts, "ndims": ndims, "medoid": medoid,
             "max_node_len": max_node_len,
             "nnodes_per_sector": nnodes_per_sector,
             "file_size": file_size}, nbrs, np.vstack(rows))
