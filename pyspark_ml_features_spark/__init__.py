"""spark-graft: a PySpark-native feature-engineering & analytics engine.

Re-expresses the capability surface of the reference library
(edisedis777/PySpark-ML-Features — see SURVEY.md) as idiomatic Spark
DataFrame / SQL / MLlib-Pipeline operators, extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis),
each designed for 100 TB scale.

Public surface:
    from pyspark_ml_features_spark import api
    api.entry(spark)        # flagship query
    api.queries()           # name -> (spark, sf_dir) -> DataFrame
    api.oracle_sql()        # name -> DuckDB-equivalent SQL (when exact)
"""

__version__ = "0.1.0"
