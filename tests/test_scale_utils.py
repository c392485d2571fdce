"""Skew salting and bucketed co-located joins — the manual scale levers."""

from __future__ import annotations

import pyspark.sql.functions as F

from pyspark_ml_features_spark.functions.skew import salted_join
from pyspark_ml_features_spark.sources import table
from tests.conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    li = table(spark, SF_DIR, "lineitem").select("l_partkey", "l_quantity")
    part = table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    p = part.withColumnRenamed("p_partkey", "l_partkey")
    plain = (li.join(p, "l_partkey")
             .groupBy("p_brand").agg(F.sum("l_quantity").alias("q"),
                                     F.count(F.lit(1)).alias("n")))
    salted = (salted_join(li, p, "l_partkey", n_salts=8)
              .groupBy("p_brand").agg(F.sum("l_quantity").alias("q"),
                                      F.count(F.lit(1)).alias("n")))
    a = {r["p_brand"]: (r["n"], round(r["q"], 6)) for r in plain.collect()}
    b = {r["p_brand"]: (r["n"], round(r["q"], 6)) for r in salted.collect()}
    assert a == b


def test_salted_join_rejects_unsafe_how(spark):
    """Right/full/semi/anti are NOT equivalent under small-side replication
    (unmatched small rows would multiply n_salts×) — must raise up front."""
    import pytest

    li = table(spark, SF_DIR, "lineitem").select("l_partkey")
    p = (table(spark, SF_DIR, "part").select("p_partkey")
         .withColumnRenamed("p_partkey", "l_partkey"))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(li, p, "l_partkey", how=how)


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketed+sorted tables on the join key co-locate: the join plan must
    contain no Exchange on either side — the bucketing contract that makes
    repeated 100 TB fact-fact joins affordable."""
    import shutil

    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("b_orders"))
    (customer.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("b_customer"))
    joined = (spark.table("b_orders")
              .join(spark.table("b_customer"),
                    F.col("o_custkey") == F.col("c_custkey")))
    # disable broadcast so the co-located sort-merge path is what's planned
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert joined.count() == orders.join(
        customer, orders.o_custkey == customer.c_custkey).count()


def test_interleave_bits_matches_reference(spark):
    """Morton key must equal the bit-twiddling reference on known values."""
    from pyspark_ml_features_spark.functions.layout import interleave_bits

    def ref(x, y, bits):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y",
        interleave_bits([F.col("x"), F.col("y")], 8)).collect()
    for r in got:
        assert r["__zkey"] == ref(r["x"], r["y"], 8), (r["x"], r["y"])


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """Files written by write_zordered must carry narrow min/max ranges on
    BOTH clustered columns — the property parquet scan pruning feeds on.
    A single-column sort would leave the second column's per-file range at
    ~100% of global; z-order keeps both well below."""
    import glob

    from pyspark_ml_features_spark.functions.layout import write_zordered

    li = table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    out = str(tmp_path / "zordered")
    write_zordered(li, out, ["l_partkey", "l_suppkey"], n_files=16)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) >= 8

    import pyarrow.parquet as pq

    glo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey")).first()
    g_part = glo[1] - glo[0]
    g_supp = glo[3] - glo[2]
    ratios_part, ratios_supp = [], []
    for f in files:
        t = pq.read_table(f, columns=["l_partkey", "l_suppkey"])
        pk = t.column("l_partkey").to_pylist()
        sk = t.column("l_suppkey").to_pylist()
        if not pk:
            continue
        ratios_part.append((max(pk) - min(pk)) / g_part)
        ratios_supp.append((max(sk) - min(sk)) / g_supp)
    mean_part = sum(ratios_part) / len(ratios_part)
    mean_supp = sum(ratios_supp) / len(ratios_supp)
    assert mean_part < 0.7, f"l_partkey per-file range {mean_part:.2f} too wide"
    assert mean_supp < 0.7, f"l_suppkey per-file range {mean_supp:.2f} too wide"


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Compaction must collapse a fragmented directory to the computed file
    count without losing or duplicating rows."""
    import glob

    from pyspark_ml_features_spark.functions.layout import compact_parquet

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    frag = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, dst)
    assert len(glob.glob(dst + "/part-*.parquet")) == n < 64
    assert spark.read.parquet(dst).count() == li.count()


def test_dynamic_partition_overwrite_touches_only_written_partitions(
        spark, tmp_path):
    """Rewriting one partition's data must leave sibling partitions intact
    (dynamic mode) — the property static overwrite destroys."""
    import pyspark.sql.functions as F

    from pyspark_ml_features_spark.functions.layout import write_partitioned

    ev = table(spark, SF_DIR, "events").select("event_id", "event_type",
                                               "value")
    out = str(tmp_path / "by_type")
    write_partitioned(ev, out, "event_type")
    before = spark.read.parquet(out)
    n_click = before.filter(F.col("event_type") == "click").count()
    n_view = before.filter(F.col("event_type") == "view").count()

    patch = (ev.filter(F.col("event_type") == "click")
             .withColumn("value", F.lit(0.0)).limit(10))
    write_partitioned(patch, out, "event_type")
    after = spark.read.parquet(out)
    assert after.filter(F.col("event_type") == "view").count() == n_view
    assert after.filter(F.col("event_type") == "click").count() == 10 < n_click
