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
