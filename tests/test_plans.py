"""Physical-plan assertions (SURVEY §4): the scale properties we claim must
be visible in the optimized plan — broadcast joins for dimensions, pushed
filters and pruned scans, no Python row-UDFs in JVM-only queries.
"""

from __future__ import annotations

from pyspark_ml_features_spark import registry
from tests.conftest import SF_DIR

ALL = registry.all_queries()


def _plan(spark, name: str) -> str:
    df = ALL[name].fn(spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_dimension_joins_broadcast(spark):
    for name in ("d1_broadcast_join_revenue", "d2_join_chain_region_sales"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name}: dimension join must broadcast"
        assert "SortMergeJoin" not in plan, f"{name}: unexpected shuffle join"


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "d3_semi_join_parts_ordered")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan.replace("\n", " "), \
        "quantity predicate must reach the parquet scan"


def test_column_pruning(spark):
    plan = _plan(spark, "d11_global_topn")
    # top-n scan must read only the 3 output columns
    assert "l_comment" not in plan
    scan_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_schema and "l_extendedprice" in scan_schema[0]
    assert "l_tax" not in scan_schema[0]


def test_global_topn_avoids_full_sort(spark):
    plan = _plan(spark, "d11_global_topn")
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER BY must use top-k, not global sort"


def test_no_python_udf_in_jvm_queries(spark):
    for name in ("d4_pricing_summary", "e4_knn_cosine", "t4_fingerprint",
                 "e8_tfidf_topterms"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, f"{name}: row-UDF crept in"
        assert "ArrowEvalPython" not in plan, f"{name}: pandas UDF crept in"


def test_pandas_udf_is_arrow_not_row(spark):
    plan = _plan(spark, "d20_pandas_udf_revenue")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_whole_stage_codegen_on_aggregate(spark):
    """After execution (AQE final plan), the pricing-summary aggregate must
    run inside whole-stage codegen spans."""
    df = ALL["d4_pricing_summary"].fn(spark, SF_DIR)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string
    assert "*(" in executed and "HashAggregate" in executed
