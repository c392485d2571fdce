"""B11: end-to-end demo of the six reference features
(reference demo_all_features: spark_ml_features.py:268-315, __main__ runner
spark_ml_features_local.py:357-368) on the iris-shaped in-memory fixture.

Run: ``python -m pyspark_ml_features_spark.demo``
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pyspark_ml_features_spark.operators.basic import _IRIS_COLS, _IRIS_ROWS
from pyspark_ml_features_spark.operators.features import add_split_column
from pyspark_ml_features_spark.operators.ml import (
    build_feature_pipeline,
    dimensionality_reduction,
    predefined_split,
    probability_prediction,
    validation_curves,
)
from pyspark_ml_features_spark.operators.scaling import robust_scale
from pyspark_ml_features_spark.session import get_spark
from pyspark_ml_features_spark.sources import memory_source

FEATURES = list(_IRIS_COLS[:4])


def demo_all_features(spark: SparkSession, show: bool = True):
    """Exercise features 1-6 on the iris sample; returns a summary dict
    (the reference printed .show() samples and counts; we do both)."""
    df = memory_source(spark, _IRIS_ROWS, schema=list(_IRIS_COLS))
    featured = build_feature_pipeline(FEATURES, "species").fit(df).transform(df)
    featured = featured.cache()

    # 1. validation curves (tiny grid/folds for the 9-row sample)
    params, metrics = validation_curves(
        featured, param_range=[1e-2, 1e-1], num_folds=2, parallelism=2)

    # 2. probability prediction
    probs = probability_prediction(featured)

    # 3. robust scaling (approx path, reference default)
    scaled = robust_scale(df, FEATURES, method="exact")

    # 4. feature union via pipeline with scaling
    unioned = build_feature_pipeline(
        FEATURES, "species", with_scaling=True).fit(df).transform(df)

    # 5. dimensionality reduction
    km = dimensionality_reduction(featured, "kmeans", k=3)
    pca = dimensionality_reduction(featured, "pca", k=2)

    # 6. predefined split
    split = add_split_column(
        featured, mode="custom", condition=F.col("species") != "setosa")
    model, train_df, test_df = predefined_split(split)

    if show:
        scaled.show(5)
        probs.select("label", "prediction").show(5)
        km.select("species", "prediction").show(5)
    summary = {
        "cv_metrics": dict(zip(map(str, params), metrics)),
        "n_train": train_df.count(),
        "n_test": test_df.count(),
        "n_clusters": km.select("prediction").distinct().count(),
        "pca_dim": pca.select("pca_features").first()["pca_features"].size,
        "scaled_cols": [c for c in scaled.columns if c.endswith("_scaled")],
        "union_dim": unioned.select("features").first()["features"].size,
    }
    featured.unpersist()
    return summary


if __name__ == "__main__":
    session = get_spark(app_name="pmfs-demo")
    print(demo_all_features(session))
    session.stop()
