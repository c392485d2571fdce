"""B11 demo runner must exercise all six features end to end."""

from __future__ import annotations


def test_demo_all_features(spark):
    from pyspark_ml_features_spark.demo import demo_all_features

    s = demo_all_features(spark, show=False)
    assert len(s["cv_metrics"]) == 2
    assert all(0.0 <= m <= 1.0 for m in s["cv_metrics"].values())
    assert s["n_train"] == 5 and s["n_test"] == 4  # non-setosa train
    assert s["n_clusters"] == 3
    assert s["pca_dim"] == 2
    assert len(s["scaled_cols"]) == 4
    assert s["union_dim"] == 4  # scaled features replace raw in the pipeline
