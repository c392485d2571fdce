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
    graph that stresses join ordering. Region/nation/supplier/customer are
    dimension-sized → broadcast; the year predicate pushes to the orders
    scan; only orders⋈lineitem is a genuine shuffle join, which AQE can
    re-plan from runtime stats. The c_nationkey = s_nationkey equi-term
    rides the lineitem join as a post-condition instead of forcing a
    second fact shuffle."""
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
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(s),
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
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
    return (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
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
