"""Engine relational surface (SURVEY §2-D): joins, aggregates, windows,
set ops, scalar-function families — declared as oracle-checked queries over
the driver star schema.

The reference library contains none of these (SURVEY §2-C) — Catalyst
provides them; the engine's job is to declare them with plans that survive
100 TB: dimension joins broadcast (region/nation/customer/supplier/part are
small or bucketable); fact-side aggregates are partial (map-side combine)
before the shuffle; window queries partition by a key (never a global
unpartitioned window over the fact table); filters and projections fold into
the parquet scan (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DoubleType

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table


@register(
    "d1_broadcast_join_revenue",
    oracle="""
SELECT p.p_brand,
       count(*) AS n_items,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
    tags=("engine", "D1", "headline"),
)
def d1_broadcast_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash equi-join lineitem ⋈ part + hash aggregate. part is a
    dimension (200 rows/SF-invariant) — broadcast keeps the fact table
    shuffle-free up to any scale; only the per-brand partials shuffle."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "d2_join_chain_region_sales",
    oracle="""
SELECT r.r_name, n.n_name,
       count(*) AS n_orders,
       sum(o.o_totalprice) AS total_sales
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    tags=("engine", "D2", "headline"),
)
def d2_join_chain_region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop star join orders→customer→nation→region. All three dims
    broadcast — the orders scan never shuffles; Catalyst/AQE collapses the
    chain into successive broadcast hash joins."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("o_totalprice").alias("total_sales"))
    )


@register(
    "d3_anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("engine", "D3"),
)
def d3_anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders. At scale the orders side is
    reduced to distinct keys before the join (semi-join pushdown by Catalyst);
    null-safe by construction since o_custkey is non-null."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment")


@register(
    "d3_semi_join_parts_ordered",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
""",
    tags=("engine", "D3"),
)
def d3_semi_join_parts_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join with a pushed fact-side filter: parts with any
    high-quantity lineitem. The quantity predicate reaches the parquet scan
    (row-group skipping) before the join."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name")


@register(
    "d4_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                       AS sum_qty,
       sum(l_extendedprice)                                  AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity)                                       AS avg_qty,
       avg(l_extendedprice)                                  AS avg_price,
       avg(l_discount)                                       AS avg_disc,
       count(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("engine", "D4", "headline"),
)
def d4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-measure hash aggregate with a
    scan-pushed date filter. Partial aggregation reduces the shuffle to
    (#flags × #statuses) rows per task regardless of input size."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "d5_distinct_counts",
    oracle="""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
    tags=("engine", "D5"),
)
def d5_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (expand + two-phase aggregate)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"))


@register("d6_approx_count_distinct", tags=("engine", "D6", "approx"))
def d6_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct of l_partkey — the 100 TB path where
    exact distinct would shuffle every key. Paired with exact D5; rows-only
    check (sketch estimates are engine-specific); bounds asserted in
    tests/test_invariants.py."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))


@register(
    "d7_rollup_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("engine", "D7"),
)
def d7_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag, flag+status, grand total) in one
    aggregate — Spark expands grouping sets without rescanning the input."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"))


@register(
    "d8_window_rank_customers",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    tags=("engine", "D8"),
)
def d8_window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows partitioned by nation — scales as one shuffle on the
    partition key; the c_custkey tiebreak makes row_number deterministic."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"))


@register(
    "d9_window_frame_events",
    oracle="""
SELECT event_id, user_id, ts, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       sum(value)  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_sum3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    tags=("engine", "D9"),
)
def d9_window_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + a 3-row rolling-sum frame per user. Frame sums accumulate
    left-to-right in both engines — deterministic float order."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "event_id", "user_id", "ts", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum("value").over(w.rowsBetween(-2, 0)).alias("rolling_sum3"))


@register(
    "d10_topk_orders_per_priority",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
) WHERE rn <= 3
""",
    tags=("engine", "D10"),
)
def d10_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority via ranking window; at scale AQE
    plus the rank-limit pushdown (WindowGroupLimit) avoids materializing full
    partitions."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_orderpriority", "o_orderkey", "o_totalprice"))


@register(
    "d11_global_topn",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
""",
    tags=("engine", "D11"),
)
def d11_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100: Spark's TakeOrderedAndProject computes per-partition
    top-100 then merges — no global sort materialization at any scale."""
    li = table(spark, sf_dir, "lineitem")
    return (li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"),
                       F.asc("l_linenumber"))
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .limit(100))


@register(
    "d12_set_ops_nations",
    oracle="""
SELECT 'both' AS op, nk FROM (
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier)
UNION ALL
SELECT 'customer_only' AS op, nk FROM (
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier)
""",
    tags=("engine", "D12"),
)
def d12_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation-key sets."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).select(F.lit("both").alias("op"), "nk")
    only = c.subtract(s).select(F.lit("customer_only").alias("op"), "nk")
    return both.unionAll(only)


@register(
    "d13_string_functions",
    oracle="""
SELECT p_partkey,
       lower(p_name)                          AS name_lower,
       upper(p_type)                          AS type_upper,
       substring(p_name, 1, 4)                AS name_prefix,
       length(p_name)                         AS name_len,
       split_part(p_name, ' ', 1)             AS first_word,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       concat(p_brand, ':', p_type)           AS brand_type,
       replace(p_name, ' ', '_')              AS name_snake,
       trim(p_name)                           AS name_trim
FROM part
""",
    tags=("engine", "D13"),
)
def d13_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function family — all JVM codegen, no UDFs."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.col("p_name")).alias("name_trim"))


@register(
    "d14_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)  AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(dayofmonth(o_orderdate) AS BIGINT) AS order_day,
       date_trunc('month', o_orderdate) AS month_start,
       datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
FROM orders
""",
    tags=("engine", "D14"),
)
def d14_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family over order timestamps (UTC session)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # BIGINT on both sides: Spark's year/month/day are INT, DuckDB's
        # BIGINT — align dtype kinds rather than rely on repr coincidence
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"))


@register(
    "d15_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * l_discount, 4) AS disc_amount,
       abs(l_extendedprice - 50000.0)         AS abs_dev,
       l_quantity * l_quantity                AS qty_sq,
       sqrt(l_extendedprice)                  AS price_sqrt,
       floor(l_extendedprice / 1000)::BIGINT  AS price_bucket,
       ceil(l_quantity / 7)::BIGINT           AS qty_ceil7,
       sign(l_extendedprice - 50000.0)::DOUBLE AS dev_sign,
       greatest(l_quantity, l_tax * 100)      AS g,
       least(l_discount, l_tax)               AS l
FROM lineitem
""",
    tags=("engine", "D15"),
)
def d15_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family, restricted to operations with bit-identical
    IEEE semantics across engines (sqrt is correctly rounded; no libm
    transcendentals behind an exact oracle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_amount"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.signum(F.col("l_extendedprice") - 50000.0).alias("dev_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_tax") * 100).alias("g"),
        F.least(F.col("l_discount"), F.col("l_tax")).alias("l"))


@register(
    "d16_array_functions",
    oracle="""
SELECT doc_id,
       len(str_split(text, ' '))                       AS n_tokens,
       len(list_distinct(str_split(text, ' ')))        AS n_distinct_tokens,
       list_contains(str_split(text, ' '), 'spark')    AS has_spark,
       list_sort(list_distinct(str_split(text, ' ')))[1] AS first_token_sorted,
       list_sum(list_transform(str_split(text, ' '), t -> length(t)))::BIGINT AS total_chars
FROM documents
""",
    tags=("engine", "D16"),
)
def d16_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order family over tokenized documents — all integer
    outputs, all Tungsten codegen (no Python boundary)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_sort(F.array_distinct(toks)).getItem(0).alias("first_token_sorted"),
        F.aggregate(toks, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)).alias("total_chars"))


@register(
    "d17_json_functions",
    oracle="""
SELECT event_type,
       count(*) AS n,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("engine", "D17"),
)
def d17_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload + aggregate. At scale,
    prefer from_json with an explicit schema once per pipeline over repeated
    path extraction."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"))


@register(
    "d18_conditional_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid'
            ELSE 'high' END AS qty_band,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
       CASE WHEN l_discount > 0.05 THEN l_extendedprice * l_discount END AS big_disc_amount
FROM lineitem
""",
    tags=("engine", "D18"),
)
def d18_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif family."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
         .when(F.col("l_quantity") < 30, "mid")
         .otherwise("high").alias("qty_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")),
                   F.lit("none")).alias("flag_or_none"),
        F.when(F.col("l_discount") > 0.05,
               F.col("l_extendedprice") * F.col("l_discount"))
         .alias("big_disc_amount"))


@register("d19_sampling", tags=("engine", "D19", "rng"))
def d19_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — engine-specific RNG, rows-only check
    (fraction bounds asserted in tests/test_invariants.py)."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber")


@register(
    "d20_pandas_udf_revenue",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_revenue
FROM lineitem
""",
    tags=("engine", "D20", "udf"),
)
def d20_pandas_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF computing net revenue — demonstrates the
    sanctioned Python escape hatch (batched columnar transfer, ~10-100×
    faster than row-at-a-time udf). The arithmetic is pure IEEE so the SQL
    oracle matches bit-for-bit. In production this slot is for logic Spark
    genuinely can't express — anything expressible stays JVM-side."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def net_revenue(price, discount):
        return price * (1.0 - discount)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        net_revenue("l_extendedprice", "l_discount").alias("net_revenue"))
