"""Sources: parquet / CSV / in-memory (SURVEY §2-A A1-A3).

Parquet is the primary path (self-describing schema, vectorized scan, row-group
predicate pushdown, column pruning — all free from Catalyst as long as the
plan stays declarative). CSV-with-inference is kept for parity with the
reference's loader (spark_ml_features.py:27); on real deployments prefer an
explicit schema so a 100 TB scan doesn't pay an inference pre-pass.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    """A3: parquet source. Filters/projections applied by callers reach the
    scan via Catalyst (verify with .explain: PushedFilters / ReadSchema)."""
    return spark.read.parquet(path)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (TESTDATA.md) from a scale-factor directory.

    ``events.ts`` has shipped in two physical layouts across driver
    rounds: TIMESTAMP(NANOS) (rounds 1-2), which Spark's vectorized reader
    rejects outright — read nanos as long and truncate to microsecond
    timestamps, the same truncation DuckDB applies when narrowing
    TIMESTAMP_NS — and plain timestamp[us] (round 3+), which both engines
    read natively. Detect from the loaded dtype and convert only the
    legacy layout, and normalize TIMESTAMP_NTZ to session-local TIMESTAMP
    so downstream window/watermark code sees one type either way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = parquet_scan(spark, path)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # legacy nanos layout
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return parquet_scan(spark, path)


def csv_scan(spark: SparkSession, path: str,
             schema: StructType | None = None, header: bool = True) -> DataFrame:
    """A1: CSV source; explicit schema avoids the inference pre-pass
    (reference infers: spark_ml_features.py:27)."""
    reader = spark.read.format("csv").option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def memory_source(spark: SparkSession, rows: Iterable, schema=None) -> DataFrame:
    """A2: in-memory rows / pandas DataFrame -> DataFrame (Arrow path when
    pandas; reference equivalent: spark_ml_features_local.py:36-55)."""
    return spark.createDataFrame(rows, schema=schema)
