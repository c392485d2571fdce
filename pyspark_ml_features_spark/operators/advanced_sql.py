"""Advanced SQL surface: UNPIVOT (long-form reshaping), recursive CTEs
(engine-scheduled iteration, new in Spark 4), and one-pass data profiling.

These close out the relational surface a warehouse user expects beyond the
D1–D20 operator families: d33 is the inverse of d23_pivot, d34 exercises
``WITH RECURSIVE`` (bounded-depth, acyclic — Spark 4 recursive CTEs support
UNION ALL only, so cyclic reachability stays on the iterative e21 path),
and d35 is the schema-profiling pass run before ingesting a new source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "d33_unpivot_measures",
    oracle=" UNION ALL ".join(
        f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, "
        f"{m} AS value FROM lineitem" for m in _MEASURES),
    tags=("engine", "unpivot"),
)
def d33_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long), the inverse of d23_pivot: the four lineitem
    measures become (measure, value) rows. Spark compiles unpivot to a
    single Expand over one scan — row count grows 4× but the input is read
    once, no shuffle, no join; the standard reshaping step in front of
    generic per-metric aggregation."""
    li = table(spark, sf_dir, "lineitem")
    return (li.select("l_orderkey", "l_linenumber", *_MEASURES)
            .unpivot(["l_orderkey", "l_linenumber"], list(_MEASURES),
                     "measure", "value"))


INSTALLMENT = 25000.0
_RECURSIVE_SQL = """
WITH RECURSIVE pay AS (
    SELECT o_orderkey, 0 AS period, o_totalprice AS remaining
    FROM {orders} WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, period + 1, remaining - 25000.0
    FROM pay WHERE remaining > 25000.0
)
SELECT o_orderkey, CAST(period AS BIGINT) AS period, remaining FROM pay
"""


@register(
    "d34_recursive_installments",
    oracle=_RECURSIVE_SQL.format(orders="orders"),
    tags=("engine", "recursive-cte"),
)
def d34_recursive_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): amortize each large order into fixed
    25 000-per-period installments — (order, period, remaining balance)
    until the balance is paid down. The recursion is acyclic with depth
    ≤ ceil(max_price/25 000) ≈ 20, far under the engine's recursion limit;
    each level is one self-join-free projection of the previous level, so
    the work per level is a map over the still-open orders. Subtraction of
    an exactly-representable installment is IEEE-exact, giving a bit-exact
    DuckDB oracle on the same SQL text."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("d34_orders")
    return spark.sql(_RECURSIVE_SQL.format(orders="d34_orders"))


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority")


@register(
    "d35_profile_orders",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
        f"count(*) - count({c}) AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct FROM orders"
        for c in _PROFILE_COLS),
    tags=("engine", "profiling"),
)
def d35_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profiling: per-column row/null/distinct counts — the
    first query run against any new source. All columns profile in a single
    aggregate (Spark plans one Expand + two-phase aggregate; the table is
    scanned once, unlike the naive per-column loop). Exact distincts
    multiply shuffle volume by the column count, so at 100 TB swap
    count_distinct for approx_count_distinct (d6) — same plan shape."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col("n_rows"),
                 (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                 F.col(f"nd_{c}").alias("n_distinct"))
        for c in _PROFILE_COLS])
    return wide.select(F.explode(rows).alias("s")).select("s.*")


@register(
    "d36_tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
    tags=("engine", "tpch", "headline"),
)
def d36_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    orders ⋈ lineitem, revenue per urgent order, top 10. Both date
    predicates push to the parquet scans (each side shrinks before any
    join); at 100 TB customer⋈orders and orders⋈lineitem are key-key
    shuffle joins AQE can re-plan, and the final top-10 is
    TakeOrderedAndProject (per-partition heads, no global sort). Ties are
    total-ordered by (revenue DESC, orderkey ASC) so the LIMIT row-set is
    deterministic."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 6).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10))


@register(
    "d37_tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
    tags=("engine", "tpch", "headline"),
)
def d37_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter-windowed orders ⋈
    returned lineitems ⋈ customer ⋈ nation, top-20 customers by lost
    revenue. The quarter predicate prunes orders at the scan (partition
    pruning when orders is date-partitioned at 100 TB); nation broadcasts
    (25 rows); the return-flag filter pushes into the lineitem scan.
    Deterministic LIMIT via (revenue DESC, custkey ASC)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 6).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20))


@register(
    "d43_tpch_q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    tags=("engine", "tpch", "headline"),
)
def d43_tpch_q5_local_supplier_volume(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-table join where the
    customer's and supplier's nations must MATCH — the classic cyclic join
    graph that stresses join ordering. Region (5 rows) and nation (25) are
    FIXED-cardinality → broadcast hints; customer/supplier scale with the
    data, so their strategy is AQE's runtime-size decision (broadcast at
    test SF, shuffle join at warehouse scale). The year predicate pushes
    to the orders scan. The c_nationkey = s_nationkey equi-term rides the
    lineitem join as a post-condition instead of forcing a second fact
    shuffle."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate")
                  >= F.lit("1997-01-01").cast("timestamp"))
                 & (F.col("o_orderdate")
                    < F.lit("1998-01-01").cast("timestamp")))
         .select("o_orderkey", "o_custkey"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name")
    r = (table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    # broadcast HINTS only on fixed-cardinality dims (region 5, nation
    # 25); customer/supplier scale WITH the data, so their join strategy is
    # AQE's runtime-size call (the e8-vocab lesson: a hint pins driver
    # memory at any scale)
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(s,
                  (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 6)
                 .alias("revenue")))


@register(
    "d45_tpch_q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name IN ('NATION_7', 'NATION_17')
  AND n2.n_name IN ('NATION_7', 'NATION_17')
  AND n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS BIGINT)
""",
    tags=("engine", "tpch", "headline"),
)
def d45_tpch_q7_volume_shipping(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations, grouped by direction and ship year. The classic disjunctive
    pair predicate ((A,B) or (B,A)) is rewritten to the pushdown-friendly
    equivalent ``n1 IN {A,B} AND n2 IN {A,B} AND n1 <> n2`` so each
    nation dimension filters BEFORE its join: supplier and customer
    shrink to two nations' worth before touching the fact. The ship-date
    range pushes to the lineitem scan. Only lineitem⋈orders genuinely
    shuffles; supplier/customer/nation are broadcast."""
    two = ("NATION_7", "NATION_17")
    n1 = (table(spark, sf_dir, "nation")
          .filter(F.col("n_name").isin(*two))
          .select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (table(spark, sf_dir, "nation")
          .filter(F.col("n_name").isin(*two))
          .select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("cust_nation")))
    s = (table(spark, sf_dir, "supplier")
         .select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")))
    c = (table(spark, sf_dir, "customer")
         .select("c_custkey", "c_nationkey")
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")))
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1995-01-01").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1997-01-01").cast("timestamp")))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # supplier/customer scale with SF — no broadcast hints (see d43)
    return (li.join(s, li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("bigint").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 6)
                 .alias("revenue")))


@register(
    "d47_tpch_q18_large_orders",
    oracle="""
WITH big AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       sum(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
LIMIT 100
""",
    tags=("engine", "tpch", "headline"),
)
def d47_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customer): orders whose total line
    quantity exceeds 300, joined back to their customer and re-aggregated.

    100 TB shape: the HAVING subquery is one hash aggregate over lineitem
    (map-side partial combine shrinks it to order-cardinality); the
    qualifying set (~0.1% of orders) broadcasts into a semi filter on
    orders AND — via the join-key transitivity lineitem.l_orderkey =
    o_orderkey — Spark's InferFiltersFromConstraints + runtime filters
    prune the second lineitem scan too, so the re-aggregation touches
    only qualifying rows. The final global top-100 is
    TakeOrderedAndProject (per-partition heaps, no global sort). Ties are
    impossible: o_orderkey is unique, making the LIMIT deterministic."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__s"))
           .filter(F.col("__s") > 300)
           .select("l_orderkey"))
    o = (table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
         .join(F.broadcast(big),
               F.col("o_orderkey") == big.l_orderkey, "left_semi"))
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # qualifying-order and customer sides scale with SF — strategy is
    # AQE's call (only `big`, the ~0.1% qualifying-key set, keeps a hint)
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, F.col("o_custkey") == c.c_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum("l_quantity").alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
                     F.col("o_orderkey").asc())
            .limit(100))


@register(
    "d48_tpch_q21_waiting_supplier",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
""",
    tags=("engine", "tpch", "headline"),
)
def d48_tpch_q21_waiting_supplier(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): late line on a
    finished multi-supplier order where NO other supplier was also late.
    Lateness is adapted to this schema (no l_receiptdate/l_commitdate) as
    l_shipdate > o_orderdate + 90 days; the EXISTS / NOT EXISTS structure
    is the classic one, and the oracle states it in exactly that
    correlated-subquery form.

    100 TB shape: instead of the textbook pair of lineitem self-joins
    (three orderkey shuffles of the biggest table), the two correlated
    subqueries collapse into ONE per-order aggregate — count(distinct
    supplier) and count(distinct late supplier) — reusing the orderkey
    partitioning of the main join: EXISTS other-supplier == n_supp > 1,
    NOT EXISTS other-late == n_late_supp = 1 (the probe row itself is
    late). Supplier and nation broadcast; the final top-100 is
    TakeOrderedAndProject with s_name as a total tie-break."""
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    l = (li.join(o, li.l_orderkey == o.o_orderkey)
         .withColumn("late", F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")))
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey")))
         .alias("n_late_supp"))
    s = (table(spark, sf_dir, "supplier")
         .select("s_suppkey", "s_name", "s_nationkey"))
    n = (table(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_7").select("n_nationkey"))
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    return (l.filter(F.col("late"))
            .join(per_order, "l_orderkey")
            .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
            .join(F.broadcast(sn), F.col("l_suppkey") == sn.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
            .limit(100))


@register(
    "d51_percentiles_exact",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.50) AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       median(l_extendedprice) AS med
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("engine", "stats", "percentile"),
)
def d51_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark's percentile() and
    DuckDB's quantile_cont use the same linear-interpolation convention and
    bit-match on doubles (probed before trusting this oracle; memory:
    parity rules). Exact percentiles buffer each group's values — fine per
    bounded group; for whole-table quantiles at 100 TB use the banded
    selection in operators/scaling.py (b6) or approx_percentile (b6b)."""
    li = table(spark, sf_dir, "lineitem")
    p = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99))")
    return (li.groupBy("l_returnflag")
            .agg(p.alias("p"),
                 F.median("l_extendedprice").alias("med"))
            .select("l_returnflag",
                    F.element_at("p", 1).alias("p25"),
                    F.element_at("p", 2).alias("p50"),
                    F.element_at("p", 3).alias("p75"),
                    F.element_at("p", 4).alias("p99"),
                    "med"))


@register(
    "d52_width_bucket_histogram",
    oracle="""
SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
            WHEN l_extendedprice >= 105000.0 THEN 21
            ELSE CAST(floor((l_extendedprice - 900.0)
                            / (105000.0 - 900.0) * 20) AS BIGINT) + 1
       END AS bucket,
       count(*) AS n,
       min(l_extendedprice) AS lo,
       max(l_extendedprice) AS hi
FROM lineitem
GROUP BY 1
""",
    tags=("engine", "stats", "histogram"),
)
def d52_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram — the one-pass distributed histogram (groupBy
    on the bucket id, map-side combine), SQL-standard width_bucket
    semantics (bucket 0 below lo, n+1 above hi). The bucket id is an
    EXPLICIT shared formula rather than each engine's width_bucket builtin:
    DuckDB lacks the function and Spark's builtin associates the division
    differently ((x-lo)/((hi-lo)/n)), which can flip a boundary value's
    bucket by one ulp — the mirrored expression is ulp-identical by
    construction. min/max per bucket double-check boundary handling."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    b = (F.when(x < 900.0, 0)
         .when(x >= 105000.0, 21)
         .otherwise(F.floor((x - 900.0) / (105000.0 - 900.0) * 20)
                    .cast("bigint") + 1))
    return (li.groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(x).alias("lo"),
                 F.max(x).alias("hi")))


@register(
    "d53_tpch_q4",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
  AND o_orderdate < DATE '1995-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("engine", "tpch", "subquery"),
)
def d53_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS — Catalyst
    rewrites it to a LEFT SEMI join on l_orderkey with the correlated
    l_shipdate > o_orderdate predicate as the join condition, so lineitem
    is never aggregated, only probed. The date filter prunes orders before
    the join (PushedFilters); at 100 TB the semi join shuffles only the
    3-month order slice."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    o2 = o.filter((F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
                  & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date")))
    joined = o2.join(
        li, (o2["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o2["o_orderdate"]), "left_semi")
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@register(
    "d54_tpch_q6",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("engine", "tpch"),
)
def d54_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure filter+aggregate — every
    predicate reaches the parquet scan (PushedFilters) and the single
    partial-aggregated sum is the whole query. Revenue accumulates as exact
    integer 1e-4 units (price×discount has 4 decimal places), keeping the
    oracle order-independent."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    rev = F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000)
    return f.agg(F.sum(rev.cast("bigint")).alias("revenue_e4"))


@register(
    "d31b_regression_exact",
    oracle="""
WITH c AS (
    SELECT l_returnflag,
           CAST(round(l_quantity * 100) AS BIGINT) AS xq,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS xp
    FROM lineitem
), s AS (
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(xq AS DECIMAL(18,0))) AS sx,
           sum(CAST(xp AS DECIMAL(18,0))) AS sy,
           sum(CAST(xq AS DECIMAL(18,0)) * xq) AS sxx,
           sum(CAST(xq AS DECIMAL(18,0)) * xp) AS sxy
    FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS slope,
       round((CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / n / 100, 6) AS intercept
FROM s
""",
    tags=("engine", "stats", "regression"),
)
def d31b_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d31's hash-exact twin: per-group closed-form OLS
    (extendedprice ~ quantity) from EXACT decimal power sums — the same
    distributed-regression math as the applyInPandas version, but as one
    map-side-combinable hash aggregate (no Python workers, no per-group
    pandas materialization) and engine-exact like d30b: integer-cent
    inputs, DECIMAL Σx/Σy/Σxx/Σxy (order-independent), closed form in IEEE
    double from identical inputs. Slope is scale-invariant in cents;
    intercept converts back to dollars. At 100 TB this fits millions of
    segment models in one shuffle — the applyInPandas path (d31) exists
    for models WITHOUT closed forms."""
    li = table(spark, sf_dir, "lineitem")
    xq = F.round(F.col("l_quantity") * 100).cast("bigint")
    xp = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    c = li.select("l_returnflag", xq.alias("xq"), xp.alias("xp"))
    dec = lambda col: F.col(col).cast("decimal(18,0)")  # noqa: E731
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("xq")).alias("sx"),
        F.sum(dec("xp")).alias("sy"),
        F.sum(dec("xq") * F.col("xq")).alias("sxx"),
        F.sum(dec("xq") * F.col("xp")).alias("sxy"))
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n / 100, 6).alias("intercept"))


@register(
    "d55_tpch_q19",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    tags=("engine", "tpch"),
)
def d55_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR-of-ANDs condition spanning BOTH join sides. The per-side conjuncts
    Catalyst can derive (p_brand IN (...), l_quantity ranges) push below
    the join as scan filters; the cross-side residual evaluates post-join.
    At 100 TB this is the canonical test that disjunctions don't force a
    full-table join — the brand/size filter shrinks part to a broadcastable
    side. Revenue sums as exact integer cents."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, p["p_partkey"] == li["l_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30)))
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
    return j.filter(cond).agg(
        F.sum(rev.cast("bigint")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"))


@register(
    "d56_tpch_q22",
    oracle="""
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS ab FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 5, 9, 13, 17)
)
SELECT c_nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS totacctbal_cents
FROM customer, avg_bal
WHERE c_nationkey IN (1, 5, 9, 13, 17)
  AND c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
    tags=("engine", "tpch", "anti-join"),
)
def d56_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar-average subquery
    (broadcast single row) + NOT EXISTS anti join against orders — wealthy
    customers in target nations who never ordered. The anti join probes on
    o_custkey only (column-pruned scan); the average broadcasts; balances
    aggregate as exact integer cents. Nation-key membership stands in for
    the spec's phone-prefix predicate (fixture has no phone column)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    nations = [1, 5, 9, 13, 17]
    sel = c.filter(F.col("c_nationkey").isin(nations))
    avg_bal = (sel.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("ab")))
    return (sel.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .join(o, sel["c_custkey"] == o["o_custkey"], "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
                  .alias("totacctbal_cents")))


@register(
    "d57_tpch_q14",
    oracle="""
SELECT round(
    100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT) ELSE 0 END) AS DOUBLE)
    / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate < TIMESTAMP '1995-10-01'
""",
    tags=("engine", "tpch"),
)
def d57_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): month-sliced lineitem ⋈ part,
    conditional revenue share. Both revenue sums accumulate as exact
    integer cents (order-independent), the final ratio is one double
    division from identical inputs — bit-exact across engines. The month
    predicate pushes to the lineitem scan; part broadcasts."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp")))
    p = table(spark, sf_dir, "part")
    j = li.join(p, p["p_partkey"] == li["l_partkey"])
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100) \
        .cast("bigint")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    total = F.sum(rev)
    return j.agg(F.round(
        100.0 * promo.cast("double") / total.cast("double"), 6)
        .alias("promo_revenue_pct"))


@register(
    "d58_market_share",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(
           CAST(sum(CASE WHEN n_name = 'NATION_3'
                    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT) ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
""",
    tags=("engine", "tpch", "share"),
)
def d58_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of
    yearly revenue — conditional-sum / total-sum per year over the
    customer⋈orders⋈lineitem⋈nation chain. Both sums accumulate as exact
    integer cents in ONE aggregate pass (no second join or self-union for
    the denominator); nation broadcasts. The final per-year division is
    one double op from identical inputs — bit-exact."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(c, o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]))
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100) \
        .cast("bigint")
    nat = F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(F.lit(0)))
    tot = F.sum(rev)
    return (j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.round(nat.cast("double") / tot.cast("double"), 6)
                 .alias("mkt_share")))


@register(
    "d61_tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
""",
    tags=("engine", "tpch", "outer-join"),
)
def d61_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with a predicate INSIDE the join condition — customers whose only
    orders are urgent must still appear with c_count = 0, so the filter
    cannot be pushed below the join as a WHERE (that would drop them).
    count(o_orderkey) counts only matched rows (COUNT ignores the NULLs an
    outer join manufactures), then a second aggregation folds customers
    into a distribution. Both aggregates are exact integers.

    100 TB shape: one shuffle for the outer join (both sides scale — no
    broadcast; AQE picks the strategy), one map-side-combinable count per
    customer, then a tiny distribution aggregate (|distinct counts| rows).
    The reference filter is o_comment NOT LIKE in spec Q13; the priority
    predicate keeps the identical plan shape on this schema."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_custkey", "o_orderpriority"))
    j = c.join(o, (c["c_custkey"] == o["o_custkey"])
               & (o["o_orderpriority"] != "1-URGENT"), "left_outer")
    per_cust = (j.groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "d62_tpch_q15",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS total_revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
""",
    tags=("engine", "tpch", "scalar-subquery"),
)
def d62_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the supplier(s) hitting the global maximum. The scalar subquery
    decorrelates to a 1-row max aggregate broadcast back onto the revenue
    relation — NOT a global-sort or single-partition window, which would
    funnel every supplier through one task at scale. Revenue accumulates
    as exact integer cents so the max comparison (and the hash) is exact.

    100 TB shape: the quarter predicate pushes to the lineitem scan, the
    per-supplier aggregate is map-side combinable, the revenue relation is
    |suppliers| rows, and the only extra exchange for the max is a 1-row
    broadcast. Ties surface every argmax supplier (same as spec Q15)."""
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1996-04-01").cast("timestamp")))
          .select("l_suppkey", "l_extendedprice", "l_discount"))
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("bigint")
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(cents).alias("total_revenue_cents")))
    mx = rev.agg(F.max("total_revenue_cents").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.join(F.broadcast(mx),
                     rev["total_revenue_cents"] == mx["mx"])
            .join(s, rev["supplier_no"] == s["s_suppkey"])
            .select("s_suppkey", "s_name", "total_revenue_cents"))


@register(
    "d63_tpch_q17",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS small_qty_revenue_cents,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 10
  AND l_quantity < (SELECT 0.2 * (sum(l2.l_quantity) / count(*))
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    tags=("engine", "tpch", "correlated-subquery"),
)
def d63_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from line
    items whose quantity is below 20% of the PER-PART average — a
    correlated scalar subquery over the same fact table. Decorrelated the
    way Catalyst (and every warehouse) does: pre-aggregate avg quantity
    per partkey once, join it back, filter. l_quantity is integer-valued,
    so sum/count (and hence the average and the 0.2× threshold) are exact
    and order-independent in both engines; revenue hashes as exact cents.

    100 TB shape: the per-part aggregate is one map-side-combinable pass
    over lineitem (partkey cardinality ≪ fact rows), the back-join is on
    the same key as the part join so one shuffle serves both, and the
    p_size predicate prunes the part side before the join. The spec's
    avg(l_quantity) is written as sum/count in BOTH engines: DuckDB's
    avg() uses a different summation path, and the explicit quotient of
    two exact values is the bit-reproducible form."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    per_part = (li.groupBy("l_partkey")
                .agg((F.sum("l_quantity") / F.count(F.lit(1)))
                     .alias("avg_qty"))
                .withColumnRenamed("l_partkey", "pp_partkey"))
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_size") <= 10).select("p_partkey"))
    j = (li.join(p, li["l_partkey"] == p["p_partkey"])
         .join(per_part, li["l_partkey"] == F.col("pp_partkey")))
    small = j.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return small.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
         .alias("small_qty_revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"))


@register(
    "d64_tpch_q9",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS sum_profit_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%r%'
GROUP BY 1, 2
""",
    tags=("engine", "tpch", "star-join"),
)
def d64_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): the widest
    star join in the suite — lineitem at the center, part / supplier /
    orders / nation radiating off three different fact keys, grouped by
    supplier nation × order year. The spec's profit subtracts
    ps_supplycost; this schema has no partsupp table, so profit is the
    discounted revenue term — the join graph and aggregation shape (what
    Q9 exists to stress) are identical. Exact integer cents.

    100 TB shape: the p_name LIKE predicate prunes the part side BEFORE
    its join (Catalyst pushes it to the scan), nation (25 rows, fixed)
    broadcasts, and part/supplier/orders scale with the data so their
    strategies are AQE's runtime-size decisions. Grouping output is
    |nations| × |years| — tiny; all three fact-side joins shuffle on
    different keys, which is inherent to Q9 and why it is the classic
    join-ordering benchmark."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%r%")).select("p_partkey"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (li.join(p, li["l_partkey"] == p["p_partkey"])
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"),
                     # BIGINT on both sides (d36/d44 precedent): Spark's
                     # year() is INT while DuckDB's is BIGINT, and relying
                     # on repr-level scalar formatting to hash equal is
                     # fragile (ADVICE r3) — align the dtype kinds instead
                     F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.sum(cents).alias("sum_profit_cents")))


@register(
    "d65_lateral_topk",
    oracle="""
SELECT c_custkey, t.o_orderkey, t.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
""",
    tags=("engine", "lateral", "topk"),
)
def d65_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT (Spark 4 SQL): each
    customer's top-2 orders by price, written the way an analyst writes
    it. Catalyst DECORRELATES the lateral into a per-key window/limit —
    the same physical shape as d10's explicit rank-filter — so the
    declarative form costs nothing over the hand-written one (inner
    customers, i.e. those with no orders, are dropped by both engines;
    the (price, orderkey) tie-break makes the top-2 deterministic).

    100 TB shape: after decorrelation this is one shuffle on the
    correlation key with a bounded per-group sort — never a per-customer
    re-scan of orders, which is what the naive reading of LATERAL
    implies and why engines must rewrite it."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("pmfs_lat_customer")
    o.createOrReplaceTempView("pmfs_lat_orders")
    return spark.sql("""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM pmfs_lat_customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM pmfs_lat_orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
    """)


@register(
    "d66_scd2_history",
    oracle="""
WITH seg AS (
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS version
    FROM events)
SELECT user_id, event_type, valid_from, valid_to, version,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM seg
""",
    tags=("engine", "scd2", "D9"),
)
def d66_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history build: a change log
    (events as attribute changes per user) becomes versioned rows with
    [valid_from, valid_to) intervals — valid_to is the NEXT change's
    timestamp, NULL marks the current row. One window (lead +
    row_number share the same partition/order spec, so Spark plans a
    single Window node and one shuffle+sort) — the standard warehouse
    pattern for point-in-time joins and the batch twin of streaming
    upserts. All columns are exact (timestamps, integers).

    100 TB shape: one shuffle on user_id; with the events table bucketed
    and sorted by (user_id, ts) the sort collapses into a merge of
    pre-sorted runs. No self-join against history — the lead() form is
    O(n) where the naive "next change per row" subquery is O(n²)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version")).withColumn(
        "is_current", F.col("valid_to").isNull().cast("int"))


@register(
    "d121_sql_pipe_syntax",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS max_cents
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
HAVING count(*) > 10
""",
    tags=("engine", "sql", "spark4"),
)
def d121_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX (Spark 4.0's `|>` operator chaining, from the
    SQL:202x pipe-syntax proposal / Google's FROM-first dialect): the
    same revenue rollup as a linear FROM → WHERE → EXTEND → AGGREGATE →
    WHERE pipeline instead of the inside-out SELECT nesting. The parser
    lowers pipes to exactly the classic plan — parity against the plain
    ANSI oracle proves the lowering, and `.explain` shows the identical
    pushed-filter aggregate as the SELECT form.

    Money is floor-round cents per the parity conventions (round() then
    BIGINT on both engines). Post-aggregation filtering uses a piped
    WHERE (pipe syntax has no separate HAVING — a WHERE after AGGREGATE
    IS having).

    100 TB: surface syntax only — same scan, same pushed filter, same
    partial-then-final hash aggregate as the classic form."""
    import os

    view = f"orders_pipe_{os.getpid()}"
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(f"""
        FROM {view}
        |> WHERE o_orderstatus <> 'F'
        |> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE count(*) AS n_orders,
                     sum(cents) AS sum_cents,
                     max(cents) AS max_cents
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> SELECT o_orderpriority, n_orders,
                  CAST(sum_cents AS BIGINT) AS sum_cents, max_cents
        """)
