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
        # keep catalog artifacts (bucketed-table tests) out of the repo
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pmfs-warehouse"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers regardless of
    how the driver process was launched (closures that reference module
    helpers pickle by reference, so workers must import us)."""
    if getattr(spark, "_pmfs_package_shipped", False):
        return
    import shutil
    import tempfile

    import pyspark_ml_features_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    # pid suffix: make_archive writes in place (not atomic), so a second
    # engine process archiving to the same path would hand addPyFile a
    # truncated zip
    zip_base = os.path.join(tempfile.gettempdir(),
                            f"pyspark_ml_features_spark_pkg_{os.getpid()}")
    try:
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir))
        # remove this pid's zip at exit — addPyFile copied it into Spark's
        # own temp dirs, so the staged archive would otherwise leak per run
        from pyspark_ml_features_spark.tmp_artifacts import register
        register(zip_path)
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # e.g. file already registered from a prior session
        pass
    spark._pmfs_package_shipped = True


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally provided session.

    The driver hands us its own SparkSession; make sure the confs our
    operators rely on (AQE, Arrow) are set without rebuilding it.
    """
    _ship_package(spark)
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
