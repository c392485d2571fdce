"""Data-layout optimization for write-time scan pruning: z-order clustering.

Parquet (and every table format over it) prunes scans with per-file/row-group
min-max statistics. Sorting by one column gives perfect pruning on that
column and none on the rest; interleaving the bits of several columns
(a Z-/Morton curve) gives useful pruning on ALL of them — the standard
layout trick for multi-dimensional filters over 100 TB fact tables.

``write_zordered`` = quantize each cluster column to ``bits`` buckets via
global min/max → interleave bits into one key → range-partition and sort by
that key → write. Reads that filter any clustered column then skip most
files on min/max alone.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

ZKEY = "__zkey"


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map values in [lo, hi] to integer buckets [0, 2^bits)."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("bigint")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(F.greatest(F.floor(scaled * n), F.lit(0)),
                   F.lit(n)).cast("bigint")


def interleave_bits(cols: Sequence[Column], bits: int) -> Column:
    """Morton key: bit b of column k lands at position b*len(cols)+k."""
    k = len(cols)
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + idx)
        for b in range(bits) for idx, c in enumerate(cols)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms).alias(ZKEY)


def zorder_key(df: DataFrame, columns: Sequence[str],
               bits: int = 16) -> Column:
    """Z-key over ``columns`` using one global min/max stats job."""
    aggs = []
    for c in columns:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    row = df.agg(*aggs).first()
    # An all-NULL (or empty) cluster column has lo = hi = None; quantize's
    # `hi <= lo` would raise TypeError. Degenerate bucket 0 keeps the key
    # total-ordered and the write valid.
    quantized = [
        (F.lit(0).cast("bigint")
         if row[f"lo_{c}"] is None or row[f"hi_{c}"] is None
         else quantize(F.col(c), row[f"lo_{c}"], row[f"hi_{c}"], bits))
        for c in columns
    ]
    return interleave_bits(quantized, bits)


def write_zordered(df: DataFrame, path: str, columns: Sequence[str],
                   n_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Z-curve of
    ``columns``: range-partition by the key (files own disjoint key ranges)
    and sort within each file (row groups inherit tight min-max stats). One
    stats job + one range-exchange — the exact cost profile of a table
    OPTIMIZE ZORDER run, expressed in plain DataFrame ops."""
    key = zorder_key(df, columns, bits)
    (df.withColumn(ZKEY, key)
       .repartitionByRange(n_files, ZKEY)
       .sortWithinPartitions(ZKEY)
       .drop(ZKEY)
       .write.mode("overwrite").parquet(path))


def compact_parquet(spark, src: str, dst: str,
                    target_file_mb: int = 512) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files and return that file count.

    Streaming sinks and over-parallel writers leave thousands of KB-sized
    files; at 100 TB that multiplies scan task-scheduling overhead and
    NameNode/listing pressure. Target ~512 MB files ≈ a few row groups, the
    sweet spot for parquet scans. Sizes come from Spark's own Hadoop
    FileSystem so the helper works on any supported storage, not just
    local disks. Coalesce (not repartition) avoids a shuffle — input
    splits are just grouped into larger write tasks."""
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    (spark.read.parquet(src).coalesce(n_files)
     .write.mode("overwrite").parquet(dst))
    return n_files


def write_partitioned(df, path: str, partition_cols, dynamic: bool = True):
    """Partitioned parquet write with DYNAMIC partition overwrite: only the
    partitions present in ``df`` are replaced; all others are untouched.
    This is the idempotent daily-backfill primitive — re-running one day's
    pipeline rewrites that day's directories only, instead of static
    overwrite's truncate-everything. (Writer-level option, so the session
    conf is left alone.)"""
    cols = [partition_cols] if isinstance(partition_cols, str) \
        else list(partition_cols)
    (df.write
     .option("partitionOverwriteMode", "dynamic" if dynamic else "static")
     .mode("overwrite").partitionBy(*cols).parquet(path))
