from cuvs_spark.stats.metrics import (  # noqa: F401
    recall_score,
    silhouette_samples,
    silhouette_score,
    trustworthiness_score,
)
