"""Focused tests for functions/skew.py::fan_out (OPTIMIZATION r13).

The helper's contract has three load-bearing properties:
1. it is a NO-OP when the input already has >= defaultParallelism
   partitions (the 100 TB posture: a multi-split scan never pays it);
2. it spreads an unsplittable (single-partition) input across the
   scheduler's default parallelism — derived from the runtime, never a
   constant;
3. it never changes WHAT is computed — only where rows sit.
"""

from __future__ import annotations

from pyspark_ml_features_spark.functions.skew import fan_out


def test_fan_out_spreads_single_partition_scan(spark):
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    assert d.rdd.getNumPartitions() == 1, (
        "fixture premise: single-row-group file scans as one partition")
    spread = fan_out(d, "doc_id")
    assert (spread.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)


def test_fan_out_noop_when_already_parallel(spark):
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n + 4)
    assert fan_out(df, "id") is df, (
        "an input with >= defaultParallelism partitions must pass "
        "through untouched (the cluster-scan no-op posture)")


def test_fan_out_preserves_rows_exactly(spark):
    from collections import Counter

    from tests.conftest import SF_DIR

    # Counter, not set: an exchange that dropped or duplicated a row whose
    # exact duplicate survives would pass a set comparison (ADVICE r13).
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = Counter(tuple(r) for r in d.collect())
    spread = Counter(tuple(r) for r in fan_out(d, "doc_id").collect())
    assert base == spread
