"""Driver-facing API: entry / queries / oracle_sql (the __spark_entry__ contract)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark_ml_features_spark import registry
from pyspark_ml_features_spark.session import tune_session
from pyspark_ml_features_spark.sources import table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: robust scaling of lineitem on the smoke tables, via
    the SCALE path — single-pass Greenwald-Khanna ``approxQuantile`` with
    bounded memory (the 100 TB default; DESIGN_SCALE.md §B6). The exact
    percentile twin stays declared as ``b6_robust_scaling`` where the DuckDB
    oracle hash-verifies the shared scaling semantics."""
    from pyspark_ml_features_spark.operators.scaling import (
        _SCALE_COLS, robust_scale)

    tune_session(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", SMOKE_SF_DIR)
    li = table(spark, sf_dir, "lineitem")
    scaled = robust_scale(li, _SCALE_COLS, method="approx",
                          quantile_error=1e-3)
    return scaled.select(
        "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount",
        *[f"{c}_scaled" for c in _SCALE_COLS])


def queries():
    return registry.spark_queries()


def oracle_sql():
    return registry.oracles()
