from cuvs_spark.sources.index_store import (  # noqa: F401
    load_ivf_flat,
    load_ivf_rabitq,
    load_scann,
    read_bin_dataset,
    save_ivf_flat,
    save_ivf_rabitq,
    save_scann,
)
