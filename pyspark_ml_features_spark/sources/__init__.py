from pyspark_ml_features_spark.sources.io import (  # noqa: F401
    csv_scan,
    memory_source,
    parquet_scan,
    table,
)
