from cuvs_spark.functions.distance import (  # noqa: F401
    METRICS,
    distance_col,
    distance_sql_duckdb,
    distance_sql_spark,
    is_min_close,
)
from cuvs_spark.functions.vector import l2_normalize, vector_norm  # noqa: F401
