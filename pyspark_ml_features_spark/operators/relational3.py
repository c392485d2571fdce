"""Round-4 relational surface growth (VERDICT r3 task 3): the window/
aggregate/array/datetime families the first three rounds had not yet
declared as oracle queries — batch session windows, grouped top-k via
LATERAL, ordered string aggregation, bitwise/filtered/arg-min-max
aggregates, positional explode, higher-order array folds, interval
arithmetic, deterministic mode, median-absolute-deviation robust stats, an
inline VALUES dimension join, a nearest as-of join, and a zstd parquet
sink round-trip.

Every query carries an exact DuckDB oracle (CLAUDE.md conventions: aliases
identical on both sides, integer exact math or single-op double division,
BIGINT dtype alignment). Scale rationale lives in each docstring; the
registry-wide plan audit (tests/test_plans.py) covers them all.

Reference: the reference repo (682 LoC, six ML utilities —
spark_ml_features.py:1) has no relational surface; these operators are the
SURVEY §2-D engine families this repo adds on top, per SURVEY §0's
"same capabilities + north-star extensions" mandate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.functions.text import STOPWORDS
from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table
from pyspark_ml_features_spark.tmp_artifacts import pid_scoped

SESSION_GAP_45M_US = 45 * 60 * 1_000_000
# stopword list as a DuckDB array literal (d84's oracle)
_STOP_SQL = str(list(STOPWORDS))


@register(
    "d67_session_window_batch",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     >= {SESSION_GAP_45M_US}
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
    SELECT user_id, ts, value,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 45 MINUTES AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM s
GROUP BY user_id, sid
""",
    tags=("north-star", "E9", "session-window"),
)
def d67_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH mode (45 min gap — deliberately a
    second gap parameter next to e9's 30 min lag+cumsum form): Spark merges
    per-user [ts, ts+gap) intervals into sessions inside one aggregate,
    with session_end = last event + gap. The oracle is the gap-and-islands
    rewrite — new session when the gap is >= 45 min, matching
    session_window's half-open interval semantics (an event exactly gap
    after its predecessor starts a NEW session on both engines).

    100 TB: one shuffle on user_id; session state never exceeds one open
    session per user — the same operator Structured Streaming uses (s2), so
    batch backfill and the live stream share a plan."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "45 minutes").alias("w"),
                      "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "total_value"))


@register(
    "d68_grouped_topk_lateral",
    oracle="""
SELECT s.c_mktsegment, t.c_custkey, t.c_acctbal
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (SELECT c_custkey, c_acctbal FROM customer
         WHERE c_mktsegment = s.c_mktsegment
         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) t
""",
    tags=("engine", "lateral", "topk"),
)
def d68_grouped_topk_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via correlated LATERAL over the GROUP DOMAIN (VERDICT
    r3 task 3's 'grouped top-k over the d65 lateral shape'): distinct
    segments on the outer side, each segment's top-3 customers by balance
    in the lateral — the declarative twin of d10's window rank-filter.
    (acctbal, custkey) ordering makes the top-3 deterministic under ties.

    100 TB: Catalyst decorrelates to one shuffle on the correlation key
    with a bounded per-group sort (WindowGroupLimit), exactly d65 —
    never a per-segment rescan."""
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("pmfs_d68_customer")
    return spark.sql("""
        SELECT s.c_mktsegment, t.c_custkey, t.c_acctbal
        FROM (SELECT DISTINCT c_mktsegment FROM pmfs_d68_customer) s,
        LATERAL (SELECT c_custkey, c_acctbal FROM pmfs_d68_customer
                 WHERE c_mktsegment = s.c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) t
    """)


@register(
    "d69_string_agg",
    oracle="""
SELECT o_orderpriority,
       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(count(*) AS BIGINT) AS n_statuses
FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
GROUP BY o_orderpriority
""",
    tags=("engine", "D4", "string-agg"),
)
def d69_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG family): the distinct order
    statuses seen per priority as a sorted CSV. ``collect_set`` gathers in
    partition-arrival order (non-deterministic), so ``array_sort`` before
    ``array_join`` is what makes the result exact — the same trick any
    engine needs for a deterministic LISTAGG.

    100 TB: group payload is bounded by the status domain (3 values), so
    the collected set is O(domain), not O(rows); map-side partial
    aggregation keeps the shuffle tiny."""
    o = table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.array_join(
                     F.array_sort(F.collect_set("o_orderstatus")), ",")
                 .alias("statuses"),
                 F.size(F.collect_set("o_orderstatus")).cast("bigint")
                 .alias("n_statuses")))


@register(
    "d70_bitwise_agg",
    oracle="""
SELECT o_orderpriority,
       bit_and(o_orderkey) AS key_and,
       bit_or(o_orderkey)  AS key_or,
       bit_xor(o_orderkey) AS key_xor
FROM orders
GROUP BY o_orderpriority
""",
    tags=("engine", "D15", "bitwise"),
)
def d70_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and / bit_or / bit_xor) over 64-bit keys —
    commutative+associative, so they combine map-side and merge in any
    partition order with exact results (xor-folding keys is also the
    classic cheap set-digest for reconciliation checks)."""
    o = table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.bit_and("o_orderkey").alias("key_and"),
                 F.bit_or("o_orderkey").alias("key_or"),
                 F.bit_xor("o_orderkey").alias("key_xor")))


@register(
    "d71_filtered_agg",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
       CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_discount >= 0.05), 0) AS BIGINT)
           AS disc_price_cents,
       bool_and(l_tax >= 0)     AS all_tax_nonneg,
       bool_or(l_discount = 0)  AS any_zero_discount
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("engine", "D4", "conditional-agg"),
)
def d71_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered / boolean aggregates in ONE pass: count_if, a conditional
    sum (the FILTER clause), bool_and / bool_or — the quality-gate shape
    (how many rows violate X) without a second scan per predicate. Exact:
    counts, integer cents, booleans."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (li.groupBy("l_returnflag")
            .agg(F.count_if(F.col("l_quantity") > 25).alias("n_heavy"),
                 F.coalesce(
                     F.sum(F.when(F.col("l_discount") >= 0.05, cents)),
                     F.lit(0)).cast("bigint").alias("disc_price_cents"),
                 F.bool_and(F.col("l_tax") >= 0).alias("all_tax_nonneg"),
                 F.bool_or(F.col("l_discount") == 0)
                  .alias("any_zero_discount")))


@register(
    "d72_posexplode_tokens",
    oracle="""
SELECT doc_id, pos, token
FROM (
    SELECT doc_id,
           CAST(unnest(range(len(t))) AS BIGINT) AS pos,
           unnest(t) AS token
    FROM (SELECT doc_id, str_split(text, ' ') AS t
          FROM documents WHERE doc_id % 5 = 0)
)
WHERE token <> ''
""",
    tags=("engine", "D16", "explode"),
)
def d72_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode / UNNEST WITH ORDINALITY): tokens
    with their 0-based position, positions assigned BEFORE the empty-token
    filter so offsets stay stable on both engines. The deterministic 20%
    sample bounds output like e3's.

    100 TB: pure map-side Generate — no shuffle; position arithmetic rides
    whole-stage codegen."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return (d.select("doc_id",
                     F.posexplode(F.split("text", " "))
                      .alias("pos", "token"))
            .withColumn("pos", F.col("pos").cast("bigint"))
            .filter(F.col("token") != ""))


@register(
    "d73_sequence_fold",
    oracle="""
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS linenumber,
       CAST(list_sum(list_transform(range(1, l_linenumber + 1),
                                    x -> x * x)) AS BIGINT) AS sum_sq,
       CAST(len(list_filter(range(1, l_linenumber + 1),
                            x -> x % 2 = 0)) AS BIGINT) AS n_even
FROM lineitem
""",
    tags=("engine", "D16", "higher-order"),
)
def d73_sequence_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array pipeline: sequence → aggregate-fold (sum of
    squares, explicit left fold per the vector-math convention) →
    filter+size — all integer arithmetic, all inside codegen, zero Python.
    This is the primitive family the array/embedding operators (e5, e15)
    build on; declared standalone so the fold semantics carry their own
    oracle row."""
    li = table(spark, sf_dir, "lineitem")
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("linenumber"),
        F.aggregate(seq, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x.cast("bigint") * x.cast("bigint"))
         .alias("sum_sq"),
        F.size(F.filter(seq, lambda x: x % 2 == 0)).cast("bigint")
         .alias("n_even"))


@register(
    "d74_interval_arithmetic",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)
           AS due_3mo,
       CAST(CAST(o_orderdate AS DATE) + 7 AS TIMESTAMP) AS ship_week,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
           AS quarter_start
FROM orders
""",
    tags=("engine", "D14", "interval"),
)
def d74_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic family: add_months (end-of-month clamped
    identically on both engines), day offsets, last_day, quarter
    truncation. Everything is cast to TIMESTAMP on both sides — the
    engines' native DATE values reach pandas as different kinds
    (datetime64 vs date object), and the d64 lesson is to align kinds,
    not to rely on repr coincidence."""
    o = table(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(odate, 3).cast("timestamp").alias("due_3mo"),
        F.date_add(odate, 7).cast("timestamp").alias("ship_week"),
        F.last_day(odate).cast("timestamp").alias("month_end"),
        F.date_trunc("quarter", odate).cast("timestamp")
         .alias("quarter_start"))


@register(
    "d75_mode_per_group",
    oracle="""
WITH counts AS (
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY 1, 2
), ranked AS (
    SELECT o_orderstatus, o_orderpriority, n,
           row_number() OVER (PARTITION BY o_orderstatus
                              ORDER BY n DESC, o_orderpriority ASC) AS rn
    FROM counts
)
SELECT o_orderstatus, o_orderpriority AS top_priority,
       CAST(n AS BIGINT) AS n
FROM ranked WHERE rn = 1
""",
    tags=("engine", "D4", "mode"),
)
def d75_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: most frequent priority per status,
    ties broken by the smaller priority string — built as count + window
    rank rather than the engines' mode() builtins, whose tie-break is
    engine-defined (the exact-oracle rule: determinism is part of the
    operator contract).

    100 TB: the count aggregate combines map-side down to |status| ×
    |priority| rows; the window then runs on that tiny grouped relation,
    not the fact table."""
    o = table(spark, sf_dir, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("o_orderstatus")
         .orderBy(F.desc("n"), F.asc("o_orderpriority")))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("top_priority"), "n"))


@register(
    "d76_arg_min_max",
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderpriority, o_orderkey) AS latest_priority,
       arg_min(o_orderpriority, o_orderkey) AS first_priority,
       max(o_orderkey) AS max_key,
       min(o_orderkey) AS min_key
FROM orders
GROUP BY o_orderstatus
""",
    tags=("engine", "D4", "arg-minmax"),
)
def d76_arg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates (max_by / min_by): the associated value
    at the extremum in ONE pass — no self-join back to the group row. The
    ordering key (o_orderkey) is unique, which is what makes the picked
    value deterministic; max_by on a tied key is engine-defined and would
    not be oracle-able."""
    o = table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.max_by("o_orderpriority", "o_orderkey")
                 .alias("latest_priority"),
                 F.min_by("o_orderpriority", "o_orderkey")
                 .alias("first_priority"),
                 F.max("o_orderkey").alias("max_key"),
                 F.min("o_orderkey").alias("min_key")))


@register(
    "d77_robust_mad",
    oracle="""
WITH med AS (
    SELECT l_returnflag, median(l_quantity) AS med_qty
    FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       min(m.med_qty) AS med_qty,
       median(abs(l.l_quantity - m.med_qty)) AS mad_qty
FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag
""",
    tags=("engine", "stats", "robust"),
)
def d77_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust-scaling primitive
    (B6's family) as a two-pass aggregate: per-group median, broadcast
    back, median of absolute deviations. The oracle mirrors the explicit
    two-pass formula rather than DuckDB's mad() so both engines interpolate
    the same construction (median bit-match probed, d51).

    100 TB: pass 1 output is |groups| rows (broadcast); pass 2 is one
    shuffle on the group key — same shape as b6's exact path."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = (li.groupBy("l_returnflag")
           .agg(F.median("l_quantity").alias("med_qty")))
    j = li.join(F.broadcast(med), "l_returnflag")
    return (j.groupBy("l_returnflag")
            .agg(F.min("med_qty").alias("med_qty"),
                 F.median(F.abs(F.col("l_quantity") - F.col("med_qty")))
                  .alias("mad_qty")))


@register(
    "d78_inline_lookup_join",
    oracle="""
SELECT t.tier,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders o
JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('3-MEDIUM', 'warm'),
             ('4-NOT SPECIFIED', 'cold'), ('5-LOW', 'cold'))
     AS t(o_orderpriority, tier)
  ON o.o_orderpriority = t.o_orderpriority
GROUP BY t.tier
""",
    tags=("engine", "D1", "inline-dim"),
)
def d78_inline_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension (priority → tier) broadcast-joined to the
    fact table — the literal-lookup-table pattern analysts reach for
    instead of chained CASE. The 5-row dim broadcasts by construction;
    cents are exact integers.

    100 TB: identical plan — a local relation always broadcasts, the fact
    side never shuffles for the join, and the tier aggregate combines
    map-side to |tiers| rows."""
    tiers = spark.createDataFrame(
        [("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
         ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")],
        "o_orderpriority string, tier string")
    o = table(spark, sf_dir, "orders")
    return (o.join(F.broadcast(tiers), "o_orderpriority")
            .groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                  .alias("sum_price_cents")))


ASOF_NEAREST_BAND_US = 30 * 60 * 1_000_000


@register(
    "d79_asof_nearest",
    oracle=f"""
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT event_id AS click_id, user_id, ts AS c_ts
    FROM events WHERE event_type = 'click'
), cand AS (
    SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id,
           abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) AS diff_us,
           row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) ASC,
                        c.c_ts ASC, c.click_id ASC) AS rn
    FROM p JOIN c ON p.user_id = c.user_id
     AND abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) <= {ASOF_NEAREST_BAND_US}
)
SELECT purchase_id, user_id, p_ts, click_id, diff_us
FROM cand WHERE rn = 1
""",
    tags=("north-star", "asof-join", "nearest"),
)
def d79_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join (e14 is the backward variant): each
    purchase attributed to the temporally closest click by the same user
    within ±30 min, ties preferring the earlier click. SQL ASOF JOIN only
    looks backward; nearest needs the banded candidate join + rank shape
    declared here.

    100 TB: the candidate join is an equi-join on user_id with the band
    predicate evaluated post-join (one shuffle, bounded candidates per
    purchase because the band is finite); the rank window re-shuffles only
    the candidate set, which is ∝ matches, not ∝ events."""
    e = table(spark, sf_dir, "events")
    p = (e.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id",
                 F.col("ts").alias("p_ts")))
    c = (e.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts")))
    diff = F.abs(F.unix_micros("p_ts") - F.unix_micros("c_ts"))
    cand = (p.join(c, (p["user_id"] == c["c_user"])
                   & (diff <= ASOF_NEAREST_BAND_US))
            .withColumn("diff_us", diff))
    w = (Window.partitionBy("purchase_id")
         .orderBy(F.asc("diff_us"), F.asc("c_ts"), F.asc("click_id")))
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("purchase_id", "user_id", "p_ts", "click_id", "diff_us"))


@register(
    "a18_zstd_roundtrip",
    oracle="""
SELECT l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS sum_disc_cents
FROM lineitem
GROUP BY l_linestatus
""",
    tags=("engine", "source", "parquet", "codec", "sink"),
)
def a18_zstd_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink with an explicit zstd codec + read-back, proven
    LOSSLESS: the aggregate over the round-tripped copy must hash-match
    the oracle computed from the ORIGINAL table (a15's proof shape for the
    columnar path). zstd is the 100 TB default — snappy-class decode speed
    at a meaningfully higher ratio, so scans move fewer bytes for the same
    data; correctness of the codec swap is exactly what this row pins."""
    out = pid_scoped("pmfs_lineitem_zstd")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_extendedprice", "l_discount")
    li.write.mode("overwrite").option("compression", "zstd").parquet(out)
    back = spark.read.parquet(out)
    return (back.groupBy("l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                  .alias("sum_price_cents"),
                 F.sum(F.round(F.col("l_discount") * 100).cast("bigint"))
                  .alias("sum_disc_cents")))


@register(
    "d80_group_by_all",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders
GROUP BY ALL
""",
    tags=("engine", "sql", "group-by-all"),
)
def d80_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 / modern-SQL sugar): every non-aggregate
    SELECT item becomes a grouping key — the analyst shorthand both
    engines resolve identically at bind time, so the plan is exactly the
    explicit three-key hash aggregate (zero runtime cost; this row pins
    the RESOLUTION semantics)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("pmfs_d80_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_price_cents
        FROM pmfs_d80_orders
        GROUP BY ALL
    """)


@register(
    "d81_forward_fill",
    oracle="""
SELECT event_id, user_id, ts,
       last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                  IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS UNBOUNDED PRECEDING) AS last_purchase_id
FROM events
""",
    tags=("engine", "D9", "ignore-nulls"),
)
def d81_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / last-observation-carried-forward via IGNORE NULLS:
    each event carries the most recent purchase id of the same user — the
    point-in-time enrichment shape (sparse attribute → dense timeline)
    that otherwise needs a self-join against the purchase subset. NULL
    until the user's first purchase, on both engines.

    100 TB: one shuffle on user_id, running state is one value per
    partition row — same cost envelope as any cumulative window; with the
    events table bucketed/sorted by (user_id, ts) the sort collapses."""
    e = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    purchase_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    return e.select(
        "event_id", "user_id", "ts",
        F.last(purchase_id, ignorenulls=True).over(w)
         .alias("last_purchase_id"))


@register(
    "d82_regexp_extract_all",
    oracle="""
SELECT event_id,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums,
       CAST(coalesce(list_sum(list_transform(
                regexp_extract_all(props, '[0-9]+'), x -> x::BIGINT)), 0)
            AS BIGINT) AS sum_nums,
       regexp_extract_all(props, '[0-9]+')[1]::BIGINT AS first_num
FROM events
""",
    tags=("engine", "D13", "regex"),
)
def d82_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all → typed array pipeline: every digit run in the
    JSON payload extracted, counted, summed and probed — the
    scrape-numbers-out-of-messy-text shape. Group index 0 (whole match)
    explicitly: Spark defaults to capture group 1 where DuckDB defaults
    to 0. Empty-match guards align the engines (fold-with-0 vs
    coalesce(list_sum, 0); element 1 of an empty list is NULL in both)."""
    e = table(spark, sf_dir, "events")
    nums = F.regexp_extract_all("props", F.lit("[0-9]+"), 0)
    return e.select(
        "event_id",
        F.size(nums).cast("bigint").alias("n_nums"),
        F.aggregate(F.transform(nums, lambda x: x.cast("bigint")),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("sum_nums"),
        F.element_at(nums, 1).cast("bigint").alias("first_num"))


@register(
    "d84_array_set_algebra",
    oracle=f"""
SELECT doc_id,
       CAST(len(list_intersect(list_distinct(str_split(text, ' ')),
                               {_STOP_SQL})) AS BIGINT)
           AS n_stop,
       CAST(len(list_distinct(list_distinct(str_split(text, ' '))
                || {_STOP_SQL})) AS BIGINT)
           AS n_union,
       CAST(len(list_filter(list_distinct(str_split(text, ' ')),
                x -> NOT list_contains({_STOP_SQL}, x))) AS BIGINT)
           AS n_content
FROM documents
""",
    tags=("engine", "D16", "set-algebra"),
)
def d84_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / union / except) of each document's
    distinct-token set against the fixed stopword list — the set-theoretic
    primitives under t1/t2's marker scoring, declared with their own
    oracle row. Distinct-first on both sides: Spark's array_intersect
    dedups its result, DuckDB's list_intersect over a deduped input
    matches. All integer sizes.

    100 TB: pure map-side array work against a literal array — no
    shuffle, no UDF."""
    d = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.array_distinct(F.split("text", " "))
    return d.select(
        "doc_id",
        F.size(F.array_intersect(toks, stop)).cast("bigint").alias("n_stop"),
        F.size(F.array_union(toks, stop)).cast("bigint").alias("n_union"),
        F.size(F.array_except(toks, stop)).cast("bigint").alias("n_content"))


@register(
    "a19_dynamic_partition_overwrite",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN year(o_orderdate) = 1995
                     THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
                     ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS sum_price_cents
FROM orders
GROUP BY 1
""",
    tags=("engine", "source", "sink", "partition-overwrite"),
)
def a19_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite — the incremental-reprocessing sink
    semantics 100 TB pipelines rely on: a year-partitioned table is fully
    written once, then ONE year's corrected batch (1995, prices doubled)
    is written with mode=overwrite + partitionOverwriteMode=dynamic — only
    the partitions present in the batch are replaced, every other year
    survives untouched (static overwrite would truncate the whole table).
    The read-back aggregate hash-matches the oracle's reconstruction, so
    the 'replaced exactly one partition' semantics are what is verified.
    The option rides the writer (no session-conf mutation to restore)."""
    out = pid_scoped("pmfs_orders_dynpart")
    o = (table(spark, sf_dir, "orders")
         .withColumn("o_year", F.year("o_orderdate")))
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    fixed = (o.filter(F.col("o_year") == 1995)
             .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    (fixed.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("o_year").parquet(out))
    back = spark.read.parquet(out)
    return (back.groupBy(F.col("o_year").cast("bigint").alias("o_year"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                  .alias("sum_price_cents")))


@register(
    "d85_explode_outer",
    oracle="""
SELECT doc_id, token
FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(l) = 0 THEN [CAST(NULL AS VARCHAR)]
                       ELSE l END) AS token
    FROM (SELECT doc_id,
                 list_filter(str_split(text, ' '), x -> length(x) >= 8) AS l
          FROM documents)
)
""",
    tags=("engine", "D16", "explode-outer"),
)
def d85_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: documents whose filtered token array (length >= 8)
    is EMPTY still emit one NULL row — the LEFT-JOIN-like explode that
    keeps parent rows alive (plain explode silently drops them, the
    classic lost-rows bug in token pipelines). DuckDB has no outer
    unnest; the oracle models it as unnest([NULL]) on empty.

    100 TB: map-side Generate either way; the outer variant costs
    nothing extra."""
    d = table(spark, sf_dir, "documents")
    arr = F.filter(F.split("text", " "), lambda x: F.length(x) >= 8)
    return d.select("doc_id", F.explode_outer(arr).alias("token"))
