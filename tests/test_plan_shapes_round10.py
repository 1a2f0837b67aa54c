"""Plan-shape pins for the round-10 surfaces: the fixed-iteration beam
search and NN-Descent rounds must stay free of cartesian products —
every candidate stage is an equi-join on node/frontier ids, and the
only nested-loop join allowed is the intentional bounded broadcast of
the shared seed set (n_seeds rows)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.operators import graph as G
from cuvs_spark.plans.layout import plan_string


@pytest.fixture(scope="module")
def vec_frames(spark):
    rng = np.random.default_rng(12)
    d = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=6)])
         for i in range(60)], "id long, vec array<float>")
    q = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=6)])
         for i in range(5)], "qid long, vec array<float>")
    g = spark.createDataFrame(
        [(int(s), int(dd)) for s in range(60)
         for dd in rng.choice([x for x in range(60) if x != s], size=4,
                              replace=False)], "src long, dst long")
    return d, q, g


def test_cagra_search_plan_has_no_cartesian_product(spark, vec_frames):
    """Candidate expansion is frontier ⋈ edges on src (equi-join) and
    scoring joins on nid/qid; the seed cross join broadcasts n_seeds
    rows — CartesianProduct must never appear."""
    d, q, g = vec_frames
    out = G.cagra_search(g, d, q, 4, itopk=8, search_width=3,
                         max_iterations=2, n_seeds=6)
    p = plan_string(out)
    assert "CartesianProduct" not in p


def test_nn_descent_plan_has_no_cartesian_product(spark, vec_frames):
    """Every NN-Descent round is an equi-self-join on the shared edge
    endpoint (x.dst = y.src) over the bounded n·k edge table — never
    the full pair space. The default bucketed init is likewise an
    equi-join on the hash bucket."""
    d, _, _ = vec_frames
    out = G.nn_descent_build(d, 4, max_iterations=2)
    p = plan_string(out)
    assert "CartesianProduct" not in p
