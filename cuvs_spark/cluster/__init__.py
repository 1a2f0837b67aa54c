from cuvs_spark.cluster.kmeans import (  # noqa: F401
    KMeansModel,
    cluster_cost,
    kmeans_fit,
    kmeans_predict,
    lloyd_step,
)
