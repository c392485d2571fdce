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
    "d7c_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
    tags=("engine", "D7"),
)
def d7c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE lower to:
    only the (flag) and (status) marginals, no cross or grand total. One
    Expand over a single scan, like d7/d7b."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]],
        "l_returnflag", "l_linestatus").agg(
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


@register(
    "d17c_variant_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
""",
    tags=("engine", "D17", "variant"),
)
def d17c_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via the VARIANT type (Spark 4): parse_json once
    into Variant's binary encoding, then typed variant_get path extraction —
    at 100 TB this is the open-schema path (no fixed from_json schema
    needed, fields stay typed, and the binary encoding avoids re-parsing
    text per path the way get_json_object does). try_variant_get returns
    NULL for absent paths instead of failing — mirrored by DuckDB's NULL
    extraction semantics."""
    e = table(spark, sf_dir, "events")
    v = e.withColumn("v", F.parse_json("props"))
    return (v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.missing", "bigint").alias("missing"))
        .filter(F.col("k") >= 50))


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


@register(
    "d8b_window_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume,
       first_value(c_custkey) OVER w AS richest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    tags=("engine", "D8"),
)
def d8b_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles, percent_rank, cume_dist,
    first_value — percent_rank/cume_dist are exact rationals of row counts,
    so they compare bit-exactly."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_custkey"))


@register(
    "d13b_fuzzy_match",
    oracle="""
SELECT a.p_partkey AS p1, b.p_partkey AS p2,
       levenshtein(a.p_name, b.p_name)::INT AS edit_distance
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
WHERE a.p_partkey % 10 = 0 AND b.p_partkey % 10 = 0
  AND levenshtein(a.p_name, b.p_name) <= 4
""",
    tags=("engine", "dedup", "fuzzy"),
)
def d13b_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: edit-distance pairs (levenshtein ≤ 4) on a
    deterministic 10% sample — the string-similarity leg of the dedup
    ladder. At scale, candidates come from a cheap blocking key (first
    token / fingerprint band) before any pairwise distance."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    a = p.select(F.col("p_partkey").alias("p1"), F.col("p_name").alias("n1"))
    b = p.select(F.col("p_partkey").alias("p2"), F.col("p_name").alias("n2"))
    return (a.join(F.broadcast(b), F.col("p1") < F.col("p2"))
            .select("p1", "p2",
                    F.levenshtein("n1", "n2").alias("edit_distance"))
            .filter(F.col("edit_distance") <= 4))


@register(
    "d29_date_spine",
    oracle="""
WITH bounds AS (
    SELECT date_trunc('day', min(o_orderdate)) AS lo,
           date_trunc('day', max(o_orderdate)) AS hi
    FROM orders
), spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day FROM bounds
), daily AS (
    SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT s.day, coalesce(d.n_orders, 0)::BIGINT AS n_orders
FROM spine s LEFT JOIN daily d USING (day)
""",
    tags=("engine", "timeseries"),
)
def d29_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily time series: a generated date spine left-joined to
    the daily aggregate — the standard densification pattern (a training
    pipeline's per-day example counts must include empty days). sequence()
    generates the spine engine-side; no driver round-trip."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"))
    daily = (o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
             .agg(F.count(F.lit(1)).alias("n_orders")))
    return (spine.join(daily, "day", "left")
            .select("day", F.coalesce("n_orders", F.lit(0)).alias("n_orders")))


@register("d30_moment_stats", tags=("engine", "stats"))
def d30_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics per group: stddev, variance, correlation,
    covariance, skewness, kurtosis. Rows-only: moment formulas differ in
    summation strategy across engines (Welford vs two-pass), so exact
    hashes are not portable; range invariants asserted in
    tests/test_invariants.py."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.stddev_samp("l_extendedprice").alias("price_stddev"),
        F.var_samp("l_extendedprice").alias("price_var"),
        F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("qty_price_covar"),
        F.skewness("l_extendedprice").alias("price_skew"),
        F.kurtosis("l_extendedprice").alias("price_kurt"))


@register(
    "d30b_moment_stats_decimal",
    oracle="""
WITH c AS (
    SELECT l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS xp,
           CAST(round(l_quantity * 100) AS BIGINT) AS xq
    FROM lineitem
), s AS (
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(xp AS DECIMAL(18,0))) AS sp,
           sum(CAST(xq AS DECIMAL(18,0))) AS sq,
           sum(CAST(xp AS DECIMAL(18,0)) * xp) AS spp,
           sum(CAST(xq AS DECIMAL(18,0)) * xq) AS sqq,
           sum(CAST(xp AS DECIMAL(18,0)) * xq) AS spq
    FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round(CAST(sp AS DOUBLE) / n / 100, 6) AS mean_price,
       round((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1)) / 10000, 6) AS var_price,
       round(sqrt((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1)) / 10000), 6) AS std_price,
       round((n * CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1)) / 10000, 6) AS qty_price_covar,
       round((n * CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
             / (sqrt(n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                * sqrt(n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))),
             6) AS qty_price_corr
FROM s
""",
    tags=("engine", "stats"),
)
def d30b_moment_stats_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d30's hash-exact twin (VERDICT r2 #8): variance/stddev/covariance/
    correlation from EXACT decimal power sums instead of the engines'
    (divergent) streaming moment kernels. Prices/quantities become integer
    cents (exact — the doubles are 2-dp decimals, so *100 is never a .5
    rounding case); Σx, Σx², Σxy accumulate in DECIMAL, which is
    order-independent and engine-exact, unlike double sums; the closed-form
    moments then evaluate in IEEE double from identical inputs, so results
    are bit-identical (sqrt/division are correctly-rounded by IEEE-754 —
    no libm transcendentals). 6-dp rounding is belt-and-braces.

    100 TB note: one map-side-combinable groupBy — the same single-shuffle
    shape as any hash aggregate; decimal sums cost ~2× bigint but never
    overflow (DECIMAL(38) holds Σx² to ~10^38, i.e. 10^10 rows of 10^14)."""
    li = table(spark, sf_dir, "lineitem")
    xp = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    xq = F.round(F.col("l_quantity") * 100).cast("bigint")
    c = li.select("l_returnflag", xp.alias("xp"), xq.alias("xq"))
    dec = lambda col: F.col(col).cast("decimal(18,0)")  # noqa: E731
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("xp")).alias("sp"),
        F.sum(dec("xq")).alias("sq"),
        F.sum(dec("xp") * F.col("xp")).alias("spp"),
        F.sum(dec("xq") * F.col("xq")).alias("sqq"),
        F.sum(dec("xp") * F.col("xq")).alias("spq"))
    n, sp, sq = F.col("n"), F.col("sp").cast("double"), F.col("sq").cast("double")
    spp = F.col("spp").cast("double")
    sqq = F.col("sqq").cast("double")
    spq = F.col("spq").cast("double")
    nd = n.cast("double")
    var_cents = (n * spp - sp * sp) / (nd * (n - 1))
    covar_cents = (n * spq - sp * sq) / (nd * (n - 1))
    corr = (n * spq - sp * sq) / (
        F.sqrt(n * spp - sp * sp) * F.sqrt(n * sqq - sq * sq))
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(sp / n / 100, 6).alias("mean_price"),
        F.round(var_cents / 10000, 6).alias("var_price"),
        F.round(F.sqrt(var_cents / 10000), 6).alias("std_price"),
        F.round(covar_cents / 10000, 6).alias("qty_price_covar"),
        F.round(corr, 6).alias("qty_price_corr"))


@register(
    "e20_upsert_merge",
    oracle="""
WITH updates AS (
    SELECT c_custkey, c_acctbal * 2 AS new_acctbal
    FROM customer WHERE c_custkey % 7 = 0
), inserts AS (
    SELECT 1000000 + r_regionkey AS c_custkey, 0.0 AS new_acctbal FROM region
), changes AS (
    SELECT * FROM updates UNION ALL SELECT * FROM inserts
)
SELECT coalesce(c.c_custkey, ch.c_custkey) AS c_custkey,
       coalesce(ch.new_acctbal, c.c_acctbal) AS c_acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'inserted'
            WHEN ch.c_custkey IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM customer c FULL OUTER JOIN changes ch USING (c_custkey)
""",
    tags=("engine", "merge", "upsert"),
)
def e20_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (SCD-1) without a table format: target FULL OUTER JOIN
    changes, coalesce per column, action tag. At 100 TB both sides
    hash-partition on the key and only changed partitions rewrite
    (partition-overwrite mode); a lakehouse format (Delta/Iceberg) replaces
    this plan with its native MERGE INTO but the join shape is identical."""
    c = table(spark, sf_dir, "customer")
    updates = (c.filter(F.col("c_custkey") % 7 == 0)
               .select("c_custkey", (F.col("c_acctbal") * 2).alias("new_acctbal")))
    inserts = table(spark, sf_dir, "region").select(
        (F.lit(1000000) + F.col("r_regionkey").cast("bigint")).alias("c_custkey"),
        F.lit(0.0).alias("new_acctbal"))
    changes = updates.unionByName(inserts)
    target = c.select("c_custkey", "c_acctbal")
    merged = target.join(changes, "c_custkey", "full_outer")
    return merged.select(
        "c_custkey",
        F.coalesce("new_acctbal", "c_acctbal").alias("c_acctbal"),
        F.when(F.col("c_acctbal").isNull(), "inserted")
         .when(F.col("new_acctbal").isNull(), "unchanged")
         .otherwise("updated").alias("merge_action"))


@register(
    "d9b_range_frame",
    oracle="""
SELECT event_id, user_id, ts, value,
       count(*) OVER w AS n_last_hour,
       round(sum(value) OVER w, 6) AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("engine", "D9"),
)
def d9b_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: per-user trailing-hour count/sum keyed on the
    event-time VALUE (not row offsets — simultaneous and unevenly spaced
    events are handled correctly, unlike a ROWS frame). Ordering key is
    integer microseconds so the frame bounds are engine-exact; the trailing
    sum is rounded 6 dp (accumulation order within a frame differs across
    engines)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (Window.partitionBy("user_id").orderBy(us.cast("long"))
         .rangeBetween(-3_600_000_000, 0))
    return e.select(
        "event_id", "user_id", "ts", "value",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 6).alias("value_last_hour"))


@register(
    "d40_salted_skew_join",
    oracle="""
SELECT p.p_brand,
       count(*) AS n_lines,
       sum(l.l_quantity)::DOUBLE AS total_qty
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
    tags=("north-star", "D1", "skew"),
)
def d40_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand totals through a SALTED fact⋈dim join (functions/skew.py): the
    fact side gets a seeded salt in [0,8), the dim side is replicated once
    per salt, and the join runs on (key, salt) so a pathologically hot key
    spreads over 8 tasks. Salting is semantics-preserving for inner joins —
    which is exactly what the plain-SQL oracle proves, hash-exact.

    100 TB: this is the manual fallback when AQE skew split can't help
    (one key > one executor's memory). The dim replication multiplies a
    small broadcastable table, never the fact; the fact is scanned and
    shuffled once, same as the unsalted plan."""
    from pyspark_ml_features_spark.functions.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = (table(spark, sf_dir, "part")
         .select(F.col("p_partkey").alias("l_partkey"), "p_brand"))
    joined = salted_join(li, p, "l_partkey", n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").cast("double").alias("total_qty"))


@register(
    "d41_corr_single_pass",
    oracle="""
WITH s AS (
    SELECT count(*)::DOUBLE AS n,
           sum(l_quantity)::DOUBLE AS sq,   sum(l_quantity * l_quantity)::DOUBLE AS sqq,
           sum(l_extendedprice)::DOUBLE AS sp, sum(l_extendedprice * l_extendedprice)::DOUBLE AS spp,
           sum(l_discount)::DOUBLE AS sd,   sum(l_discount * l_discount)::DOUBLE AS sdd,
           sum(l_quantity * l_extendedprice)::DOUBLE AS sqp,
           sum(l_quantity * l_discount)::DOUBLE AS sqd,
           sum(l_extendedprice * l_discount)::DOUBLE AS spd
    FROM lineitem
)
SELECT 'quantity_extendedprice' AS pair,
       (n * sqp - sq * sp) / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)) AS corr
FROM s
UNION ALL
SELECT 'quantity_discount',
       (n * sqd - sq * sd) / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd))
FROM s
UNION ALL
SELECT 'extendedprice_discount',
       (n * spd - sp * sd) / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd))
FROM s
""",
    tags=("north-star", "D15", "stats"),
)
def d41_corr_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairwise Pearson correlations of three lineitem measures from a
    SINGLE scan: one aggregate computes every raw moment (sums, squares,
    cross-products), then the closed form assembles the matrix — versus the
    naive one-scan-per-pair (6 scans here, O(k²) scans for k columns).
    Identical raw sums + IEEE-exact multiply/divide/sqrt on both engines
    keep the oracle bit-exact (no built-in corr(), whose accumulation
    differs per engine).

    100 TB: the moment aggregate is a full map-side-combinable reduction to
    ONE row — network cost is k² doubles, independent of table size."""
    li = table(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).alias("sq"), F.sum(q * q).alias("sqq"),
        F.sum(p).alias("sp"), F.sum(p * p).alias("spp"),
        F.sum(d).alias("sd"), F.sum(d * d).alias("sdd"),
        F.sum(q * p).alias("sqp"), F.sum(q * d).alias("sqd"),
        F.sum(p * d).alias("spd"))

    def corr(sxy, sx, sxx, sy, syy):
        n = F.col("n")
        return ((n * F.col(sxy) - F.col(sx) * F.col(sy))
                / F.sqrt((n * F.col(sxx) - F.col(sx) * F.col(sx))
                         * (n * F.col(syy) - F.col(sy) * F.col(sy))))

    pairs = F.array(
        F.struct(F.lit("quantity_extendedprice").alias("pair"),
                 corr("sqp", "sq", "sqq", "sp", "spp").alias("corr")),
        F.struct(F.lit("quantity_discount").alias("pair"),
                 corr("sqd", "sq", "sqq", "sd", "sdd").alias("corr")),
        F.struct(F.lit("extendedprice_discount").alias("pair"),
                 corr("spd", "sp", "spp", "sd", "sdd").alias("corr")))
    return s.select(F.explode(pairs).alias("x")).select("x.pair", "x.corr")


@register(
    "d49_interpolate_gaps",
    oracle="""
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS day, count(*) AS v
    FROM events GROUP BY user_id, date_trunc('day', ts)
), seg AS (
    SELECT user_id, day, v,
           lead(day) OVER w AS nday, lead(v) OVER w AS nv
    FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)
), filled AS (
    SELECT user_id, day, v, nday, nv, u.d AS d
    FROM seg, unnest(CASE WHEN nday IS NULL THEN [day]
                     ELSE generate_series(day, nday - INTERVAL 1 DAY,
                                          INTERVAL 1 DAY) END) AS u(d)
)
SELECT user_id, d AS day,
       CASE WHEN nday IS NULL THEN v::DOUBLE
            ELSE v + (nv - v) * (date_diff('day', day, d)::DOUBLE
                                 / date_diff('day', day, nday)::DOUBLE)
       END AS interp_events
FROM filled
""",
    tags=("engine", "timeseries", "D14"),
)
def d49_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-series gap fill with LINEAR INTERPOLATION: daily event
    counts densified so every day between a user's first and last active
    day gets a value — observed days keep their count, gap days get the
    linear blend between the surrounding observations (the standard
    feature-store densification before sequence models). Counts are exact
    integers, so the single blend division is the only float op and is
    IEEE-identical across engines — exact oracle.

    100 TB shape: one shuffle to the (user, day) aggregate, one window
    (lead) reusing the user partitioning, then a shuffle-free generator
    whose fan-out is bounded by the gap length — history is never
    re-scanned and no driver-side spine materializes."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = (e.groupBy("user_id", F.date_trunc("day", F.col("ts"))
                       .alias("day"))
             .agg(F.count(F.lit(1)).alias("v")))
    w = Window.partitionBy("user_id").orderBy("day")
    seg = daily.select(
        "user_id", "day", "v",
        F.lead("day").over(w).alias("nday"),
        F.lead("v").over(w).alias("nv"))
    days = F.when(
        F.col("nday").isNotNull(),
        F.sequence(F.col("day"),
                   F.col("nday") - F.expr("INTERVAL 1 DAY"),
                   F.expr("INTERVAL 1 DAY"))
    ).otherwise(F.array(F.col("day")))
    filled = seg.select("user_id", "day", "v", "nday", "nv",
                        F.explode(days).alias("d"))
    k = F.datediff(F.col("d"), F.col("day")).cast("double")
    n = F.datediff(F.col("nday"), F.col("day")).cast("double")
    interp = (F.when(F.col("nday").isNull(), F.col("v").cast("double"))
              .otherwise(F.col("v") + (F.col("nv") - F.col("v")) * (k / n)))
    return filled.select("user_id", F.col("d").alias("day"),
                         interp.alias("interp_events"))


@register(
    "d50_bucketed_join",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("engine", "join", "bucketing"),
)
def d50_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) fact⋈dim join — the 100 TB answer to repeated
    large joins on the same key: both sides are written ``bucketBy(8, key)``
    + ``sortBy`` once, and every subsequent join on that key runs WITHOUT
    exchanging either side (tests/test_plans.py asserts the only Exchange
    in the plan is the final groupBy's, and the scans carry
    SelectedBucketsCount). At warehouse scale the write cost amortizes over
    every downstream join/aggregation on the key; prices sum as exact
    integer cents for the oracle hash."""
    import os
    import shutil
    from urllib.parse import urlparse

    from pyspark_ml_features_spark.tmp_artifacts import register as keep_tmp

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    # pid suffix: two engine processes sharing a cwd share the warehouse
    # dir, and a concurrent CREATE/DROP on the same location corrupts both.
    # The pid-unique locations are registered for exit-time removal — the
    # bucketed copies must outlive this call (the returned DataFrame is
    # lazy) but must not accumulate across runs (ADVICE r3).
    cust_tbl = f"pmfs_cust_bucketed_{os.getpid()}"
    ord_tbl = f"pmfs_orders_bucketed_{os.getpid()}"
    for name, df, key in ((cust_tbl, c, "c_custkey"),
                          (ord_tbl, o, "o_custkey")):
        # the catalog is in-memory per session but the warehouse dir is not:
        # a location left by a previous session collides with CREATE, so
        # drop both the (possibly unknown) table and the stale directory
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        keep_tmp(f"{warehouse}/{name}")
        (df.write.format("parquet")
         .bucketBy(8, key).sortBy(key).saveAsTable(name))
    cb = spark.table(cust_tbl)
    ob = spark.table(ord_tbl)
    # merge hint: at test SF the dim fits the broadcast threshold and the
    # planner would pick BroadcastHashJoin, hiding the co-located path this
    # operator exists to prove; at 100 TB neither side broadcasts and SMJ
    # over aligned buckets (no Exchange, no Sort) is the plan
    j = ob.join(cb.hint("merge"), ob["o_custkey"] == cb["c_custkey"])
    return (j.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                  .alias("sum_price_cents")))


@register(
    "d60_try_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / NULLIF(l_discount, 0.0) AS price_per_discount,
       TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
       CASE WHEN l_linenumber - 1 >= 1
            THEN l_linenumber - 1 ELSE NULL END AS prev_line
FROM lineitem
""",
    tags=("engine", "null-safety"),
)
def d60_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: the try_* family returns NULL instead of
    raising — division by zero (try_divide ≡ x / NULLIF(y, 0)), bad casts
    (try_cast on a non-numeric string), and guarded index math. At 100 TB
    this is the difference between one malformed row killing a 6-hour job
    and a NULL the quality gates count (observe() totals in
    functions/quality.py); the oracle pins the NULL semantics against
    DuckDB's equivalents so the failure contract itself is verified."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.try_divide("l_extendedprice", F.nullif("l_discount", F.lit(0.0)))
         .alias("price_per_discount"),
        F.try_to_number("l_returnflag", F.lit("999"))
         .cast("bigint").alias("flag_as_int"),
        F.when(F.col("l_linenumber") - 1 >= 1, F.col("l_linenumber") - 1)
         .alias("prev_line"))


@register(
    "e61_qgram_fuzzy_join",
    oracle="""
SELECT a.p_partkey AS p1, b.p_partkey AS p2,
       levenshtein(a.p_name, b.p_name)::INT AS edit_distance
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
WHERE a.p_partkey % 10 = 5 AND b.p_partkey % 10 = 5
  AND levenshtein(a.p_name, b.p_name) <= 2
""",
    tags=("engine", "dedup", "fuzzy", "qgram"),
)
def e61_qgram_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy join at SCALE: the q-gram COUNT FILTER (Gravano et al.,
    VLDB'01) replaces d13b's all-pairs edit-distance join. Two strings
    within edit distance k share at least ``max(|a|,|b|) - q + 1 - k*q``
    q-grams as a MULTISET — so candidates come from a bigram inverted
    index (shared = sum of min per-string gram counts, computed on the
    gram equi-join), and only candidates pay the exact levenshtein
    verify. The bound must use the MULTISET intersection: a
    distinct-gram count can undershoot it and silently drop true pairs.
    The oracle is the naive all-pairs join — so a hash match PROVES the
    filter dropped no true pair (filter soundness is the correctness
    claim, and it is checked, not assumed). Measured at sf0.1 on the 20%
    sample: 854k candidates vs 8.0M all-pairs (9.4x pruned; short 7-12
    char names are the filter's worst case — pruning grows with string
    length).

    100 TB: the gram join shuffles on the gram key (hot grams salt like
    any hot key; length-bucketing the index is the published upgrade);
    never an all-pairs product. k=2, q=2 keeps the bound positive for
    every length pair here (min length 7 => bound >= 2)."""
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_partkey") % 10 == 5)
         .select(F.col("p_partkey").alias("id"), F.col("p_name").alias("s")))
    p = p.withColumn("len", F.length("s"))
    grams = (p.select("id", "len", F.explode(F.expr(
        "transform(sequence(1, length(s)-1), i -> substring(s, i, 2))"))
        .alias("g"))
        .groupBy("id", "len", "g").agg(F.count(F.lit(1)).alias("c")))
    a = grams.select(F.col("id").alias("p1"), F.col("len").alias("l1"),
                     "g", F.col("c").alias("c1"))
    b = grams.select(F.col("id").alias("p2"), F.col("len").alias("l2"),
                     "g", F.col("c").alias("c2"))
    cand = (a.join(b, "g").filter(F.col("p1") < F.col("p2"))
            .groupBy("p1", "p2", "l1", "l2")
            .agg(F.sum(F.least("c1", "c2")).alias("shared"))
            .filter(F.col("shared")
                    >= F.greatest("l1", "l2") - F.lit(1) - F.lit(2 * 2)))
    names = p.select("id", "s")
    na = names.select(F.col("id").alias("p1"), F.col("s").alias("s1"))
    nb = names.select(F.col("id").alias("p2"), F.col("s").alias("s2"))
    return (cand.join(F.broadcast(na), "p1").join(F.broadcast(nb), "p2")
            .select("p1", "p2",
                    F.levenshtein("s1", "s2").alias("edit_distance"))
            .filter(F.col("edit_distance") <= 2))


@register(
    "d122_blocked_linkage",
    oracle="""
SELECT a.p_partkey AS p1, b.p_partkey AS p2,
       a.p_brand AS brand, CAST(a.p_size AS BIGINT) AS size,
       levenshtein(a.p_name, b.p_name)::INT AS edit_distance
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
    tags=("engine", "dedup", "fuzzy", "scale"),
)
def d122_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED record linkage — the scale path d13b's docstring promises:
    candidate pairs come from an EQUI-JOIN on a cheap blocking key
    (brand, size), and only within-block pairs pay the edit-distance
    comparison. d13b compares a sampled table all-pairs (teaching
    geometry, broadcast BNLJ); this is the production shape — the block
    key turns O(n²) into Σ_b O(|b|²) with |b| bounded by the key's
    selectivity (measured: max block 7 parts at sf0.01, 28 at sf0.1 —
    candidates grow linearly in n at fixed key cardinality growth).

    levenshtein() is exact integer and engine-portable (probed: Spark ≡
    DuckDB on boundary cases including empty strings). At 100 TB the
    blocking key shuffles both sides once (hash equi-join, AQE-sized);
    skewed blocks are the e63 sorted-neighborhood territory — that
    operator family bounds the window when no good key exists."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size")
    a = p.select(F.col("p_partkey").alias("p1"),
                 F.col("p_name").alias("n1"),
                 F.col("p_brand").alias("brand"),
                 F.col("p_size").cast("bigint").alias("size"))
    b = p.select(F.col("p_partkey").alias("p2"),
                 F.col("p_name").alias("n2"),
                 F.col("p_brand").alias("brand"),
                 F.col("p_size").cast("bigint").alias("size"))
    return (a.join(b, ["brand", "size"])
            .filter(F.col("p1") < F.col("p2"))
            .withColumn("edit_distance",
                        F.levenshtein("n1", "n2").cast("int"))
            .filter(F.col("edit_distance") <= 4)
            .select("p1", "p2", "brand", "size", "edit_distance"))
