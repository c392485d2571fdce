"""Extended relational surface: cube, pivot, map functions, typed JSON
parsing, and SQL-text subqueries — rounding out §2-D beyond the core set.

d25 runs through ``spark.sql`` over registered temp views — the engine's
SQL-text entry point (the DataFrame API and SQL compile to the same Catalyst
plans; declaring one query through each proves it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table


@register(
    "d7b_cube_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("engine", "D7"),
)
def d7b_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations in one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"))


@register(
    "d23_pivot",
    oracle="""
SELECT l_linestatus,
       sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS "A",
       sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS "N",
       sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS "R"
FROM lineitem
GROUP BY l_linestatus
""",
    tags=("engine", "pivot"),
)
def d23_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — at scale always pass
    the values: inferring them costs an extra distinct scan."""
    li = table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_linestatus")
            .pivot("l_returnflag", ["A", "N", "R"])
            .agg(F.sum("l_quantity")))


@register(
    "d24_map_functions",
    oracle="""
SELECT o_orderkey,
       map(['status', 'priority'], [o_orderstatus, o_orderpriority])['status'][1] AS status_val,
       cardinality(map(['status', 'priority'],
                       [o_orderstatus, o_orderpriority]))::INT AS map_size
FROM orders
""",
    tags=("engine", "map"),
)
def d24_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup (output kept to scalar columns — map
    column *values* are engine-comparable but map ordering is not)."""
    o = table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        m.getItem("status").alias("status_val"),
        F.size(m).alias("map_size"))


@register(
    "d17b_from_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
FROM events
""",
    tags=("engine", "D17"),
)
def d17b_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via from_json with an explicit schema — parse once
    into a struct instead of re-walking the JSON per path (the 100 TB rule
    for JSON-heavy events)."""
    e = table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"))


_D25_SQL = """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
"""


@register(
    "d25_sql_subqueries",
    oracle=_D25_SQL,
    tags=("engine", "sql", "subquery"),
)
def d25_sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries through the spark.sql text entry point
    (identical text runs on both engines). Catalyst rewrites the IN to a
    semi join and the scalar to a broadcast single-row aggregate."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_D25_SQL)


@register(
    "e14_asof_attribution",
    oracle="""
WITH tagged AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN event_type = 'click' THEN ts END AS click_ts
    FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
    SELECT user_id, event_id, ts, event_type,
           last_value(click_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING) AS last_click_ts
    FROM tagged
)
SELECT user_id, event_id, ts AS purchase_ts, last_click_ts,
       epoch_us(ts) - epoch_us(last_click_ts) AS us_since_click
FROM carried
WHERE event_type = 'purchase'
""",
    tags=("north-star", "asof-join"),
)
def e14_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed shuffle-once: attribute each purchase to the
    user's most recent prior click. Instead of an inequality join (which
    explodes at scale), both event streams union into one per-user ordered
    pass and the click timestamp is carried forward with
    last(ignorenulls) — O(n log n) per user partition, no pair blow-up."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase"))
    tagged = e.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts")))
    w = (Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = tagged.withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return (carried.filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id",
                    F.col("ts").alias("purchase_ts"),
                    "last_click_ts",
                    (F.unix_micros("ts") - F.unix_micros("last_click_ts"))
                    .alias("us_since_click")))


@register(
    "d26_range_join_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
    VALUES ('small', 0.0, 50000.0),
           ('medium', 50000.0, 150000.0),
           ('large', 150000.0, 1000000000.0)
)
SELECT b.band, count(*) AS n_orders,
       sum(o.o_totalprice) AS total
FROM orders o JOIN bands b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    tags=("engine", "range-join"),
)
def d26_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: orders against price bands. The band table is
    tiny → broadcast nested-loop with an interval predicate; for
    fact-to-fact range joins the scale pattern is binning both sides to a
    shared grid key first (as e10 does for time)."""
    o = table(spark, sf_dir, "orders")
    bands = o.sparkSession.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 150000.0),
         ("large", 150000.0, 1e9)],
        schema="band string, lo double, hi double")
    return (o.join(F.broadcast(bands),
                   (F.col("o_totalprice") >= F.col("lo"))
                   & (F.col("o_totalprice") < F.col("hi")))
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("o_totalprice").alias("total")))


@register(
    "d28_null_handling",
    oracle="""
WITH with_nulls AS (
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0.0 THEN NULL ELSE l_discount END AS disc_or_null,
           CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS flag_or_null
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       coalesce(disc_or_null, -1.0) AS disc_filled,
       coalesce(flag_or_null, 'unknown') AS flag_filled,
       (disc_or_null IS NULL)::INT + (flag_or_null IS NULL)::INT AS n_nulls
FROM with_nulls
WHERE NOT (disc_or_null IS NULL AND flag_or_null IS NULL)
""",
    tags=("engine", "null-handling"),
)
def d28_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fillna/dropna data-cleaning surface: nulls synthesized from sentinel
    values, filled per-column with na.fill, rows with all-interesting-null
    dropped with na.drop(thresh) — the standard pre-training cleaning pass."""
    li = table(spark, sf_dir, "lineitem")
    with_nulls = li.select(
        "l_orderkey", "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"))
    n_nulls = (F.col("disc_or_null").isNull().cast("int")
               + F.col("flag_or_null").isNull().cast("int"))
    cleaned = (with_nulls
               .withColumn("n_nulls", n_nulls)
               .na.drop(thresh=1, subset=["disc_or_null", "flag_or_null"]))
    filled = cleaned.na.fill({"disc_or_null": -1.0, "flag_or_null": "unknown"})
    return filled.select(
        "l_orderkey", "l_linenumber",
        F.col("disc_or_null").alias("disc_filled"),
        F.col("flag_or_null").alias("flag_filled"),
        "n_nulls")
