from cuvs_spark.sources.index_store import (  # noqa: F401
    load_ivf_flat,
    read_bin_dataset,
    save_ivf_flat,
)
