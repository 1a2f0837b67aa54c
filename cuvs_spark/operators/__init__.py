from cuvs_spark.operators.brute_force import (  # noqa: F401
    BruteForceIndex,
    bf_build,
    knn,
    knn_precomputed,
    knn_self,
    knn_udf_metric,
    masked_nn,
)
from cuvs_spark.operators.graph import (  # noqa: F401
    all_neighbors_build,
    degree_histogram,
    reciprocal_rate,
    triangle_stats,
    cagra_build,
    cagra_from_graph,
    cagra_build_ace,
    cagra_compress,
    cagra_extend,
    cagra_merge,
    cagra_optimize,
    cagra_search,
    cagra_search_compressed,
    nn_descent_build,
)
from cuvs_spark.operators.ivf_flat import (  # noqa: F401
    ivf_flat_build,
    ivf_flat_extend,
    ivf_flat_search,
    ivf_list_sizes,
)
from cuvs_spark.operators.ivf_pq import (  # noqa: F401
    ivf_bq_build,
    ivf_bq_search,
    ivf_pq_build,
    ivf_pq_extend,
    ivf_pq_search,
    ivf_sq_build,
    ivf_sq_extend,
    ivf_sq_search,
)
from cuvs_spark.operators.ivf_rabitq import (  # noqa: F401
    ivf_rabitq_build,
    ivf_rabitq_extend,
    ivf_rabitq_search,
)
from cuvs_spark.operators.kernels import gram_matrix  # noqa: F401
from cuvs_spark.operators.mg import (  # noqa: F401
    distribute,
    replicated_knn,
    sharded_knn,
)
from cuvs_spark.operators.pairwise import (  # noqa: F401
    eps_degrees,
    epsilon_neighborhood,
    epsilon_neighborhood_blas,
    kde,
    pairwise_distance,
    refine,
    score_pairs,
)
from cuvs_spark.operators.scann import (  # noqa: F401
    scann_build,
    scann_search,
    soar_labels,
)
from cuvs_spark.operators.lsh import (  # noqa: F401
    lsh_buckets,
    lsh_knn,
    lsh_planes,
)
from cuvs_spark.operators.select_k import knn_merge_parts, select_k  # noqa: F401
from cuvs_spark.operators.vamana import (  # noqa: F401
    robust_prune,
    vamana_build,
)
from cuvs_spark.operators.sparse import (  # noqa: F401
    sparse_knn,
    sparse_pairwise_distance,
    sparsify,
)
from cuvs_spark.operators.tiered import (  # noqa: F401
    composite_search,
    tiered_build,
    tiered_extend,
    tiered_search,
)
from cuvs_spark.operators.temporal import (  # noqa: F401
    asof_join,
    range_self_join,
)
