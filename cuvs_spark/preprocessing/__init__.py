from cuvs_spark.preprocessing.quantize import (  # noqa: F401
    binary_quantize,
    scalar_inverse_transform,
    scalar_train,
    scalar_transform,
)
from cuvs_spark.preprocessing.pq import (  # noqa: F401
    pq_build,
    pq_inverse_transform,
    pq_transform,
    vpq_build,
    vpq_inverse_transform,
    vpq_residuals,
    vpq_transform,
)
from cuvs_spark.preprocessing.pca import (  # noqa: F401
    pca_fit,
    pca_power_fit,
    pca_power_sql,
    pca_transform,
)
