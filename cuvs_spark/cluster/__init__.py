from cuvs_spark.cluster.kmeans import (  # noqa: F401
    KMeansModel,
    cluster_cost,
    kmeans_fit,
    kmeans_predict,
    lloyd_step,
)
from cuvs_spark.cluster.spectral import (  # noqa: F401
    spectral_embedding,
    spectral_embedding_from_edges,
    spectral_fit_predict,
    spectral_power_embed,
    spectral_power_sql,
)
