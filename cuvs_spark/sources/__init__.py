from cuvs_spark.sources.index_store import (  # noqa: F401
    load_cagra,
    load_index,
    load_ivf_flat,
    load_ivf_pq,
    load_ivf_rabitq,
    load_ivf_sq,
    load_scann,
    load_tiered,
    read_bin_dataset,
    save_cagra,
    save_index,
    save_ivf_flat,
    save_ivf_pq,
    save_ivf_rabitq,
    save_ivf_sq,
    save_scann,
    save_tiered,
)
from cuvs_spark.sources.index_store import (  # noqa: F401
    load_brute_force,
    save_brute_force,
)
from cuvs_spark.sources.groundtruth import (  # noqa: F401
    generate_groundtruth,
    read_bin_header,
    split_groundtruth,
    write_bin_dataset,
)
from cuvs_spark.sources.graph_export import (  # noqa: F401
    hnsw_build,
    hnsw_extend,
    hnsw_from_cagra,
    hnsw_load_hnswlib,
    hnsw_save_hnswlib,
    hnsw_search,
    load_graph_index,
    read_hnswlib_index,
    save_graph_index,
)
