"""Driver-facing API: entry / queries / oracle_sql (the __spark_entry__ contract)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark_ml_features_spark import registry
from pyspark_ml_features_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (robust scaling of lineitem) on the smoke tables."""
    tune_session(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", SMOKE_SF_DIR)
    return registry.all_queries()["b6_robust_scaling"].fn(spark, sf_dir)


def queries():
    return registry.spark_queries()


def oracle_sql():
    return registry.oracles()
