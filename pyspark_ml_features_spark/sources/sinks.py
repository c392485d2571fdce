"""Sinks: parquet/CSV writers with the partitioning knobs that matter at
100 TB. The reference's only sinks are .show() and matplotlib
(spark_ml_features.py:278-307); a real pipeline needs durable columnar
output.

Scale rules encoded here:
 - always write parquet (columnar, splittable, statistics for pushdown);
 - ``partition_by`` low-cardinality columns only (date, lang) — each value
   becomes a directory; high-cardinality partitioning creates a small-files
   storm;
 - ``coalesce_to`` caps output file count after AQE (a 100 TB job with 10k
   reducers should not emit 10k files per partition);
 - CSV exists for interchange only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str,
                  partition_by: Sequence[str] | None = None,
                  coalesce_to: int | None = None,
                  mode: str = "overwrite") -> None:
    if coalesce_to:
        df = df.coalesce(coalesce_to)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
