"""observe()-based quality metrics: counters ride the running action."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyspark_ml_features_spark.functions.metrics import (
    assert_quality, observed_quality)
from pyspark_ml_features_spark.sources import table
from tests.conftest import SF_DIR


def test_observed_quality_matches_direct_aggregates(spark):
    o = table(spark, SF_DIR, "orders")
    df, obs = observed_quality(
        o, "o_custkey", "o_orderstatus",
        extra={"total_price": F.round(F.sum("o_totalprice"), 2)})
    n = df.count()  # the action the metrics piggyback on
    m = obs.get
    assert m["n_rows"] == n
    assert m["n_null_o_custkey"] == 0
    assert m["n_null_o_orderstatus"] == 0
    direct = o.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert m["total_price"] == direct


def test_observed_metrics_survive_downstream_transforms(spark):
    """Metrics observe the point in the plan where they're attached, even
    when the action runs on a transformed descendant."""
    li = table(spark, SF_DIR, "lineitem")
    df, obs = observed_quality(li, "l_partkey")
    out = (df.filter(F.col("l_quantity") > 25)
           .groupBy("l_returnflag").count())
    out.collect()
    assert obs.get["n_rows"] == li.count()  # pre-filter count


def test_assert_quality_gates(spark):
    good = {"n_rows": 100, "n_null_a": 0}
    assert_quality(good)  # no raise
    with pytest.raises(ValueError, match="n_rows"):
        assert_quality({"n_rows": 0})
    with pytest.raises(ValueError, match="n_null_a"):
        assert_quality({"n_rows": 100, "n_null_a": 7})
    assert_quality({"n_rows": 100, "n_null_a": 7}, max_null_fraction=0.1)


# --- runtime plan metrics (plans.metrics) -------------------------------

def test_runtime_metrics_aggregate_query(spark):
    """A shuffling aggregate reports real shuffle bytes, the scan row
    count, and the result cardinality from the executed plan."""
    from pyspark_ml_features_spark.plans.metrics import runtime_metrics

    li = table(spark, SF_DIR, "lineitem")
    n_in = li.count()
    out = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    n_out = len(out.collect())
    m = runtime_metrics(out)
    assert m.shuffle_bytes_written > 0
    assert m.shuffle_records_written > 0
    assert m.scan_output_rows == n_in
    assert m.output_rows == n_out
    assert m.spill_bytes == 0  # sf0.01 fits in memory with room to spare
    r = m.row()
    assert r["shuffle_MiB"] >= 0 and r["out_rows"] == n_out


def test_runtime_metrics_broadcast_join(spark):
    """A broadcast join reports broadcast relation bytes separately from
    shuffle bytes (a broadcast is NOT a shuffle)."""
    from pyspark_ml_features_spark.plans.metrics import runtime_metrics

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    j = (li.join(F.broadcast(od), li.l_orderkey == od.o_orderkey)
         .groupBy("o_orderpriority").count())
    j.collect()
    m = runtime_metrics(j)
    assert m.broadcast_bytes > 0


def test_runtime_metrics_shared_exchange_counted_once(spark):
    """Window + aggregate on the SAME key reuse one Exchange; the walk
    must report exactly one Exchange node (reuse-dedup by node id)."""
    from pyspark_ml_features_spark.plans.metrics import runtime_metrics

    ev = table(spark, SF_DIR, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = (ev.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= 3)
           .groupBy("user_id").count())
    out.collect()
    m = runtime_metrics(out)
    exchanges = [n for n in m.nodes if n.name == "Exchange"]
    assert len(exchanges) == 1
    assert m.shuffle_bytes_written > 0
