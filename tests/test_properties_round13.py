"""Property-based invariant for the round-13 surface: the cross-part
merge (``knn_merge_parts``) must equal a single global top-k over the
union of its parts — for ANY partitioning of the candidate rows, in
BOTH sort directions, under heavy score ties. This is the merge core
every directional composition shares (tiered / composite / mg /
blas-cogroup local-topk paths), pinned by example in
tests/test_round13.py and by gate tiered_search_ip; the property
version sweeps random inputs over the same invariant."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 2),         # qid
                               st.integers(0, 4),          # score (ties)
                               st.integers(0, 10 ** 6)),   # nid
                     min_size=1, max_size=80,
                     unique_by=lambda t: (t[0], t[2])),
       k=st.integers(min_value=1, max_value=5),
       select_min=st.booleans(),
       n_parts=st.integers(min_value=1, max_value=4))
def test_knn_merge_parts_equals_global_topk(spark, rows, k, select_min,
                                            n_parts):
    """Invariant: union-of-parts → knn_merge_parts == select_k over the
    whole candidate set, same rows AND ranks, for either direction."""
    from cuvs_spark.operators.select_k import knn_merge_parts, select_k

    def df(part_rows):
        return spark.createDataFrame(
            [(int(q), int(n), float(s)) for q, s, n in part_rows],
            "qid long, nid long, distance double")

    parts = [df(rows[i::n_parts]) for i in range(n_parts)
             if rows[i::n_parts]]
    got = sorted(tuple(r) for r in
                 knn_merge_parts(parts, k, select_min=select_min)
                 .select("qid", "nid", "distance", "rank").collect())
    want = sorted(tuple(r) for r in
                  select_k(df(rows), "qid", "distance", k,
                           select_min=select_min, tie_cols=["nid"])
                  .select("qid", "nid", "distance",
                          "rank").collect())
    assert got == want
