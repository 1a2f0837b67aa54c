from cuvs_spark.stats.metrics import (  # noqa: F401
    cosine_pair_histogram,
    embedding_norm_quantiles,
    group_mmd,
    hubness_moments,
    kendall_rank_agreement,
    map_score,
    mrr_score,
    rank_auc,
    recall_score,
    silhouette_samples,
    silhouette_score,
    trustworthiness_score,
)
