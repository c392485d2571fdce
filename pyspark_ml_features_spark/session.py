"""SparkSession factory with scale-oriented defaults.

Replaces the reference's ``init_spark`` (spark_ml_features_local.py:13-24),
which set only master + driver memory. We additionally enable AQE (runtime
partition coalescing + skew-join splitting), Arrow for any pandas boundary,
and a shuffle-partition count sized for the local harness; on a real cluster
these are overridden by spark-submit conf, so every knob here is a default,
not a hard-coded assumption.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SEED = 42


def get_spark(app_name: str = "pyspark-ml-features-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    Defaults target the test harness (``local[$SPARK_GRAFT_CPUS]``); on a
    cluster, pass ``master=None`` with an external conf and these become
    no-ops for anything already set.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "32")))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally provided session.

    The driver hands us its own SparkSession; make sure the confs our
    operators rely on (AQE, Arrow) are set without rebuilding it.
    """
    for key, value in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # Driver tables store naive timestamps; align Spark's session-local
        # interpretation with DuckDB's naive reading for oracle parity.
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # immutable conf on some builds — fine, it's a default
            pass
    return spark
