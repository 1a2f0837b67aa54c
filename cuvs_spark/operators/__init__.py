from cuvs_spark.operators.brute_force import knn, knn_self  # noqa: F401
from cuvs_spark.operators.pairwise import (  # noqa: F401
    eps_degrees,
    epsilon_neighborhood,
    epsilon_neighborhood_blas,
    kde,
    pairwise_distance,
    refine,
)
from cuvs_spark.operators.select_k import knn_merge_parts, select_k  # noqa: F401
