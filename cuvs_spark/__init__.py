"""cuvs_spark — a PySpark-native vector search & clustering engine.

Re-implements the query/data-processing capabilities of rapidsai/cuvs
(see SURVEY.md) Spark-first: DataFrames + Catalyst + Parquet index
tables, with Arrow-batched pandas UDFs only on dense-linear-algebra hot
paths. Batch index building and batch search at 100 TB scale; no online
serving (BASELINE.json design stance).
"""

__version__ = "0.1.0"

from cuvs_spark.session import get_spark  # noqa: F401
