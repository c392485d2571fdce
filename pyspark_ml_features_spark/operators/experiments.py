"""Experimentation & behavioral statistics: Welch A/B test, exact EWMA
time-decay features, and event transition matrices.

The reference's ML-utility surface (validation curves, probability
predictions — /root/reference/spark_ml_features_local.py:96-200) treats
model EVALUATION as a first-class engine concern; this module extends that
stance to the statistics a production experimentation/feature platform
computes on the warehouse directly, with the repo's exactness discipline:
integer-cent power sums in DECIMAL (order-independent, shuffle-safe), the
closed-form statistic evaluated on IEEE doubles from identical inputs on
both engines (division and sqrt are correctly rounded per IEEE 754 — no
libm transcendentals, per the d31b/d30b precedent), cross-row doubles
rounded 6 dp.

Scale notes per query are inline; none of the three shuffles anything
bigger than (group key, fixed-width aggregation state).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources.io import table


@register(
    "d114_ab_welch_ttest",
    oracle="""
WITH m AS (
    SELECT o_custkey % 2 AS arm,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), s AS (
    SELECT count(*) FILTER (WHERE arm = 0) AS n0,
           count(*) FILTER (WHERE arm = 1) AS n1,
           sum(CAST(cents AS DECIMAL(28,0))) FILTER (WHERE arm = 0) AS sx0,
           sum(CAST(cents AS DECIMAL(28,0))) FILTER (WHERE arm = 1) AS sx1,
           sum(CAST(cents AS DECIMAL(28,0)) * cents)
               FILTER (WHERE arm = 0) AS sxx0,
           sum(CAST(cents AS DECIMAL(28,0)) * cents)
               FILTER (WHERE arm = 1) AS sxx1
    FROM m
), d AS (
    SELECT n0, n1,
           CAST(sx0 AS DOUBLE) / n0 AS m0,
           CAST(sx1 AS DOUBLE) / n1 AS m1,
           (CAST(sxx0 AS DOUBLE)
            - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE) / n0)
               / (n0 - 1) AS v0,
           (CAST(sxx1 AS DOUBLE)
            - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / n1)
               / (n1 - 1) AS v1
    FROM s
)
SELECT n0, n1,
       round(m0 / 100, 6) AS mean0_dollars,
       round(m1 / 100, 6) AS mean1_dollars,
       round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
       round((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
             / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6) AS welch_df
FROM d
""",
    tags=("engine", "stats", "experimentation"),
)
def d114_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two deterministic
    experiment arms (``o_custkey % 2``) on order value — the A/B-test
    readout as ONE conditional hash aggregate: a single scan emits
    FILTER-style conditional power sums (n, Σx, Σx² per arm, the d71
    construct) that combine map-side into a one-row state; the t statistic
    and Welch–Satterthwaite degrees of freedom evaluate on the driver-side
    row in closed form. Engine-exact: cents are integers, sums are
    DECIMAL (order-independent), the statistic's division/sqrt tree is
    mirrored node-for-node in the oracle and both engines' IEEE ops are
    correctly rounded.

    100 TB: this is the scan-shaped query AQE cannot make cheaper and a
    cluster cannot make wrong — zero joins, zero windows, a six-number
    aggregation state, output exactly one row. Per-experiment variants
    just add the experiment id to the groupBy."""
    od = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    m = od.select((F.col("o_custkey") % 2).alias("arm"),
                  cents.alias("cents"))
    dec = F.col("cents").cast("decimal(28,0)")
    in_arm = lambda a, expr: F.sum(  # noqa: E731
        F.when(F.col("arm") == a, expr))
    s = m.agg(
        F.count(F.when(F.col("arm") == 0, F.lit(1))).alias("n0"),
        F.count(F.when(F.col("arm") == 1, F.lit(1))).alias("n1"),
        in_arm(0, dec).alias("sx0"),
        in_arm(1, dec).alias("sx1"),
        in_arm(0, dec * F.col("cents")).alias("sxx0"),
        in_arm(1, dec * F.col("cents")).alias("sxx1"))
    n0, n1 = F.col("n0"), F.col("n1")
    m0 = F.col("sx0").cast("double") / n0
    m1 = F.col("sx1").cast("double") / n1
    v0 = ((F.col("sxx0").cast("double")
           - F.col("sx0").cast("double") * F.col("sx0").cast("double") / n0)
          / (n0 - 1))
    v1 = ((F.col("sxx1").cast("double")
           - F.col("sx1").cast("double") * F.col("sx1").cast("double") / n1)
          / (n1 - 1))
    se2 = v0 / n0 + v1 / n1
    return s.select(
        n0, n1,
        F.round(m0 / 100, 6).alias("mean0_dollars"),
        F.round(m1 / 100, 6).alias("mean1_dollars"),
        F.round((m1 - m0) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(se2 * se2
                / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                   + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6)
        .alias("welch_df"))


@register(
    "d115_ewma_decay",
    oracle="""
WITH ranked AS (
    SELECT o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
    FROM orders
), recent AS (
    SELECT o_custkey, cents,
           CAST(1 << (16 - rk) AS BIGINT) AS w
    FROM ranked WHERE rk <= 16
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_recent,
       CAST(sum(cents * w) AS BIGINT) * 10000 // CAST(sum(w) AS BIGINT)
           AS ewma_microdollars
FROM recent
GROUP BY o_custkey
""",
    tags=("engine", "ml-prep", "time-decay"),
)
def d115_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed order-value feature per customer — the
    recency-weighted mean every churn/LTV model wants — with EXACT
    arithmetic: each customer's 16 most recent orders get weight
    2^(16-rank), a BIGINT (halving decay, most recent heaviest), so the
    weighted sum stays an exact integer end to end: the output is
    FIXED-POINT micro-dollars via truncating integer division (the d112
    rule — round(int/int, 6) is not engine-portable; Spark's DIV ≡
    DuckDB's // for positive operands). The naive formulation is a
    sequential recursion (ewma_t = a·x_t + (1-a)·ewma_{t-1}); the closed
    form turns it into a rank window plus one hash aggregate — no
    recursion, no iteration.

    Rank ties break on the unique o_orderkey, so weights are
    deterministic. 100 TB: one shuffle on o_custkey serves both the
    window and the aggregate (same key), per-task state is the partition's
    rows, and WindowGroupLimit-style early pruning applies since rank>16
    rows are dropped immediately."""
    od = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    ranked = od.select(
        "o_custkey", cents.alias("cents"),
        F.row_number().over(w).alias("rk")).filter(F.col("rk") <= 16)
    recent = ranked.withColumn(
        "w", F.expr("CAST(shiftleft(1, 16 - rk) AS BIGINT)"))
    agg = recent.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_recent"),
        F.sum(F.col("cents") * F.col("w")).alias("wsum"),
        F.sum("w").alias("wtot"))
    return agg.select(
        "o_custkey", "n_recent",
        F.expr("wsum * 10000L DIV wtot").alias("ewma_microdollars"))


@register(
    "e74_transition_matrix",
    oracle="""
WITH nxt AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
    FROM events
), cnt AS (
    SELECT from_type, to_type, count(*) AS n_trans
    FROM nxt WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_trans,
       n_trans * 1000000
           // CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
           AS prob_ppm
FROM cnt
""",
    tags=("engine", "behavioral", "markov"),
)
def e74_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams
    (view→click→purchase...): per user, pair each event with its
    successor via lead() ordered by (ts, event_id); count each
    (from, to) pair; row-normalize into transition probabilities with a
    window sum over the TINY aggregated matrix (|event_types|² rows), not
    the raw events. The behavioral-modeling counterpart of e26's text
    bigram LM, computed on the events table.

    100 TB: one shuffle on user_id for the lead() window (each user's
    stream sorts within its partition), then the (from, to) count
    combines map-side into at most |types|² cells — the normalization
    window touches only those cells. Counts are integers and the
    probability is emitted as fixed-point parts-per-million via
    truncating integer division (the d112 rule)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"))
    cnt = (nxt.filter(F.col("to_type").isNotNull())
           .groupBy("from_type", "to_type").count()
           .withColumnRenamed("count", "n_trans"))
    tot = Window.partitionBy("from_type")
    return (cnt.withColumn("tot", F.sum("n_trans").over(tot))
            .select("from_type", "to_type", "n_trans",
                    F.expr("n_trans * 1000000L DIV tot").alias("prob_ppm")))


@register(
    "d116_chi_square_independence",
    oracle="""
WITH cells AS (
    SELECT o_orderpriority AS priority, o_orderstatus AS status,
           count(*) AS obs
    FROM orders GROUP BY o_orderpriority, o_orderstatus
), tot AS (
    SELECT priority, status, obs,
           CAST(sum(obs) OVER (PARTITION BY priority) AS BIGINT) AS row_tot,
           CAST(sum(obs) OVER (PARTITION BY status) AS BIGINT) AS col_tot,
           CAST(sum(obs) OVER () AS BIGINT) AS grand
    FROM cells
)
SELECT priority, status, obs,
       CAST(row_tot::HUGEINT * col_tot * 1000000 // grand AS BIGINT)
           AS expected_micro,
       CAST(((obs::HUGEINT * grand - row_tot::HUGEINT * col_tot)
             * (obs::HUGEINT * grand - row_tot::HUGEINT * col_tot)
             * 1000000000)
            // (row_tot::HUGEINT * col_tot * grand) AS BIGINT)
           AS contrib_nano
FROM tot
""",
    tags=("engine", "stats", "experimentation"),
)
def d116_chi_square_independence(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Chi-square test of independence (order priority × order status)
    with a FULLY exact fixed-point statistic — zero float operations:
    observed counts aggregate once (map-side combinable), the marginals
    come from window sums over the |priorities|×|statuses| CELL table
    (~15 rows — the windows never touch raw data), and each cell's
    expected count and chi-square contribution are integer arithmetic:
    expected_micro = row·col·10^6 DIV grand, contrib_nano =
    (obs·grand − row·col)² ·10^9 DIV (row·col·grand), computed in
    DECIMAL(38,0) on the Spark side and HUGEINT in DuckDB (truncating
    DIV ≡ // on the always-non-negative square — the d112 rule).
    Σ contrib_nano / 10^9 is the chi-square statistic, summable EXACTLY
    downstream because every term is an integer.

    Exactness bounds (ADVICE r4 + r5): every multi-term product is cast
    to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) BEFORE multiplying —
    BIGINT-first products like row_tot·col_tot·grand would wrap int64 at
    only ~2-5e6 base rows, far inside the claimed bound. What remains is
    the DECIMAL(38,0) ceiling itself: num²·10^9 needs |num| =
    |obs·grand − row·col| ≤ floor(sqrt((10^38−1)/10^9)) ≈ 3.16e14
    (roughly 1.7e7 base rows in the anti-independence worst case), and
    the denominator row·col·grand ≤ grand³ needs grand ≤ ~4.64e12 —
    past either, Spark decimal multiply returns NULL *silently* while
    DuckDB's HUGEINT keeps going. BOTH guards below turn that silent
    divergence into a loud error (the grand guard matters because near
    independence keeps num tiny while grand³ can still blow the
    denominator); beyond the bound, pre-scale the counts (divide every
    obs by a common factor before the statistic — chi-square
    contributions scale linearly in a uniform count rescale) or accept
    a float64 contrib with a rounding contract.

    Scale: one scan + one tiny-key shuffle; the arithmetic runs on the
    ~15-row cell table so the guard is free. The test statistic family
    (d114 Welch t, this) covers the two standard experimentation
    readouts with engine-exact reproducibility inside the documented
    bound."""
    od = table(spark, sf_dir, "orders")
    cells = (od.groupBy(F.col("o_orderpriority").alias("priority"),
                        F.col("o_orderstatus").alias("status"))
             .agg(F.count(F.lit(1)).alias("obs")))
    tot = (cells
           .withColumn("row_tot", F.sum("obs").over(
               Window.partitionBy("priority")).cast("bigint"))
           .withColumn("col_tot", F.sum("obs").over(
               Window.partitionBy("status")).cast("bigint"))
           .withColumn("grand", F.sum("obs").over(
               Window.partitionBy()).cast("bigint")))
    return tot.withColumn(
        # num computed decimal-first: obs·grand ≤ grand² wraps BIGINT at
        # grand ~3e9 while staying small near independence — the guard
        # below would then inspect wrapped garbage.
        "num", F.expr("CAST(obs AS DECIMAL(38,0)) * grand"
                      " - CAST(row_tot AS DECIMAL(38,0)) * col_tot")).select(
        "priority", "status", "obs",
        # Decimal-first for the same reason: row·col·10^6 wraps BIGINT at
        # ~2-5e6 base rows with realistic marginals (ADVICE r5).
        F.expr("CAST(CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000000"
               " DIV grand AS BIGINT)").alias("expected_micro"),
        # Past either DECIMAL(38,0) ceiling the multiply would NULL
        # silently — raise instead (runs on the ~15-row cell table, so
        # the guards cost nothing). 4641588833612 = floor(cbrt(10^38-1)).
        F.expr("CASE WHEN abs(num) > 316227766016837L THEN"
               " raise_error('d116: |obs*grand - row_tot*col_tot| exceeds"
               " the DECIMAL(38,0) exact bound (~3.16e14, ~1.7e7 base"
               " rows); pre-scale counts — see docstring')"
               " WHEN grand > 4641588833612L THEN"
               " raise_error('d116: grand exceeds the DECIMAL(38,0)"
               " denominator bound (~4.64e12 rows, grand^3 ceiling);"
               " pre-scale counts — see docstring')"
               " ELSE CAST((num * num *"
               " 1000000000L) DIV (CAST(row_tot AS DECIMAL(38,0)) *"
               " col_tot * grand) AS BIGINT) END").alias("contrib_nano"))


@register(
    "d120_rfm_features",
    oracle="""
SELECT o_custkey,
       CAST(date_diff('day', max(o_orderdate), TIMESTAMP '1998-08-01')
            AS BIGINT) AS recency_days,
       count(*) AS frequency,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
FROM orders
GROUP BY o_custkey
""",
    tags=("engine", "ml-prep", "features"),
)
def d120_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) — the classic customer
    feature triple every churn, LTV, and segmentation model starts from —
    as ONE map-side-combinable aggregate: days since the customer's last
    order (against a fixed snapshot anchor, the way a feature store pins
    a training cutoff), order count, and exact integer-cent spend. Pairs
    with d115 (EWMA time-decay) as the feature-store family: d115 weights
    recent behavior, RFM summarizes the lifetime.

    100 TB: one scan, one shuffle on o_custkey carrying three
    fixed-width states; the anchor is a literal so no global-max pass or
    single-row join exists in the plan."""
    od = table(spark, sf_dir, "orders")
    anchor = F.lit("1998-08-01").cast("timestamp")
    return (od.groupBy("o_custkey")
            .agg(F.datediff(anchor, F.max("o_orderdate")).cast("bigint")
                 .alias("recency_days"),
                 F.count(F.lit(1)).alias("frequency"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .alias("monetary_cents")))


@register(
    "d123_rolling_anomaly",
    oracle="""
WITH c AS (
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), w AS (
    SELECT o_orderkey, o_custkey, cents,
           CAST(count(*) OVER win AS BIGINT) AS n_prev,
           CAST(coalesce(sum(cents) OVER win, 0) AS BIGINT) AS s,
           CAST(coalesce(sum(cents * cents) OVER win, 0) AS BIGINT) AS ss
    FROM c
    WINDOW win AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
)
SELECT o_orderkey, o_custkey, cents, n_prev,
       CAST(CASE WHEN n_prev >= 3
                  AND (n_prev * cents - s) * (n_prev * cents - s)
                      > 9 * (n_prev * ss - s * s)
                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM w
""",
    tags=("engine", "stats", "window", "exact"),
)
def d123_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING Z-SCORE anomaly flags without a single float: each order
    is compared against its customer's previous ≤5 orders; it is
    anomalous when |x − μ| > 3σ over that frame. The float-free trick is
    cross-multiplication — |z| > 3 ⟺ (n·x − s)² > 9·(n·ss − s²) where
    s, ss are the frame's sum and sum-of-squares in integer cents — so
    the flag is engine-exact (d30b's integer-moments idea applied to a
    WINDOW FRAME instead of a group). Frames under 3 observations emit
    0 (no baseline, no flag).

    Overflow bound: cents ≤ ~6e7 here, so (n·x−s)² ≤ ~9e16 and
    9·(n·ss−s²) ≤ ~6e17 — inside int64 by >10×; past ~9e8-cent values
    the comparison needs the d116 DECIMAL(38,0) treatment. DuckDB's
    HUGEINT window sums are cast back to BIGINT before the arithmetic
    so both engines compare the same ints.

    100 TB: one hash shuffle on o_custkey; the frame is 5 rows, state
    is O(1) per row, and the same shape runs streaming as e10's sliding
    window. This is the drift/fraud monitor every event pipeline runs."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    win = (Window.partitionBy("o_custkey")
           .orderBy("o_orderdate", "o_orderkey")
           .rowsBetween(-5, -1))
    w = (o.select("o_orderkey", "o_custkey", "o_orderdate",
                  cents.alias("cents"))
         .select("o_orderkey", "o_custkey", "cents",
                 F.count(F.lit(1)).over(win).cast("bigint")
                 .alias("n_prev"),
                 F.coalesce(F.sum("cents").over(win), F.lit(0))
                 .cast("bigint").alias("s"),
                 F.coalesce(F.sum(F.col("cents") * F.col("cents"))
                            .over(win), F.lit(0))
                 .cast("bigint").alias("ss")))
    flag = ((F.col("n_prev") >= 3)
            & ((F.col("n_prev") * F.col("cents") - F.col("s"))
               * (F.col("n_prev") * F.col("cents") - F.col("s"))
               > 9 * (F.col("n_prev") * F.col("ss")
                      - F.col("s") * F.col("s"))))
    return w.select("o_orderkey", "o_custkey", "cents", "n_prev",
                    F.when(flag, 1).otherwise(0).cast("int")
                    .alias("is_anomaly"))
