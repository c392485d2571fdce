"""Event-time operators over the events table (SURVEY §2-E E9/E10):
sessionization and tumbling/sliding windows — batch twins with exact
oracles; the Structured Streaming twins live in
pyspark_ml_features_spark/streaming/events.py.

Gap logic uses integer microseconds (unix_micros / epoch_us) — never
seconds-truncated unix_timestamp or float epochs — so both engines compare
identical integers. Session aggregation shuffles once on user_id; the
session-id assignment is a per-user running sum (window, no extra shuffle).
At 100 TB the events table is partitioned by date and bucketed/sorted by
(user_id, ts), which turns the window sort into a mergeable sorted scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionized(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap since the
    previous event of the same user exceeds ``gap_us``. Returns the input
    plus ``session_id`` (1-based per user)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        us - F.lag(us).over(w) > gap_us, 1).otherwise(0)
    # first event per user: lag is NULL -> otherwise(0); cumulative sum + 1
    return events.withColumn(
        "session_id",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) + 1).cast("bigint"))


@register(
    "e9_sessionize",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
    SELECT user_id, event_id, ts, value,
           (sum(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) + 1)::BIGINT AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       round(sum(value), 6) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("north-star", "E9", "headline"),
)
def e9_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: lag + running-sum session ids, then one
    aggregate per (user, session). total_value rounded to 6 dp (sum order
    across a session is engine-dependent in the last ulp)."""
    e = table(spark, sf_dir, "events")
    s = sessionized(e)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 6).alias("total_value"))


@register(
    "e10_tumbling_windows",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2, 3
""",
    tags=("north-star", "E10"),
)
def e10_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — F.window is the
    same construct Structured Streaming uses, so the streaming twin
    (streaming/events.py) shares this exact plan plus a watermark."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "n_users", "total_value"))


@register(
    "e10b_sliding_windows",
    oracle="""
WITH expanded AS (
    SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes')
               AS window_start,
           user_id, value
    FROM events, unnest([0, 1, 2, 3]) AS t(k)
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM expanded
GROUP BY 1, 2
""",
    tags=("north-star", "E10"),
)
def e10b_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 15 min slide): every event lands in 4
    overlapping windows. Spark's window() expands exactly like the oracle's
    unnest-of-offsets — epoch-aligned starts (time_bucket's 2000-01-01
    origin differs from the epoch by a whole number of slides)."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_events", "total_value"))


@register(
    "e19_incremental_rollup",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("north-star", "E10", "incremental"),
)
def e19_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized rollup (continuous-aggregate pattern): the
    hourly rollup of an existing corpus (event_id < N/2) is MERGED with the
    rollup of a new batch (event_id >= N/2) by summing partial aggregates
    per (window, type) — never rescanning history. The oracle is the full
    recompute: merged partials must equal it. total_value rounded to 6 dp
    (partial-sum association differs from the direct sum in the last ulp).

    At 100 TB the stored rollup is partitioned by window date; a new batch
    touches only the partitions its watermark spans — the batch analogue of
    the streaming twin's state store."""
    e = table(spark, sf_dir, "events")
    half = e.agg((F.max("event_id") / 2).cast("bigint").alias("m")).first()["m"]

    def rollup(df):
        return (df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum("value").alias("sum_value")))

    existing = rollup(e.filter(F.col("event_id") < half))
    delta = rollup(e.filter(F.col("event_id") >= half))
    merged = (existing.unionByName(delta)
              .groupBy("w", "event_type")
              .agg(F.sum("n_events").alias("n_events"),
                   F.sum("sum_value").alias("sum_value")))
    return merged.select(
        F.col("w.start").alias("window_start"),
        "event_type", "n_events",
        F.round("sum_value", 6).alias("total_value"))


@register(
    "d42_funnel_stages",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT '1_view' AS stage, (SELECT count(*) FROM v) AS n_users
UNION ALL
SELECT '2_view_click', (SELECT count(*) FROM c)
UNION ALL
SELECT '3_view_click_purchase', (SELECT count(*) FROM p)
""",
    tags=("north-star", "E9", "funnel"),
)
def d42_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel: users whose first view precedes a later click
    that precedes a later purchase — the min-timestamp cascade (each stage's
    anchor is the EARLIEST qualifying event, the standard product-analytics
    definition, immune to repeated events).

    100 TB shape: each stage scans the fact with its event_type pushed to
    parquet (selective → most row groups skip), and joins the previous
    stage's per-user anchors — user-cardinality, broadcastable after the
    first stage filter. Nothing user-unbounded shuffles. The alternative
    single-shuffle design (collect_list per user + fold) moves every event
    through one shuffle; at 100 TB three pruned scans beat one full
    shuffle."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(prev, etype, tcol_prev, tcol):
        s = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            s = (s.join(F.broadcast(prev), "user_id")
                 .filter(F.col("ts") > F.col(tcol_prev)))
        return s.groupBy("user_id").agg(F.min("ts").alias(tcol))

    v = stage(None, "view", None, "t1")
    c = stage(v, "click", "t1", "t2")
    p = stage(c, "purchase", "t2", "t3")
    counts = [v.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("1_view").alias("stage"), "n_users"),
              c.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("2_view_click").alias("stage"), "n_users"),
              p.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("3_view_click_purchase").alias("stage"),
                      "n_users")]
    out = counts[0]
    for c_ in counts[1:]:
        out = out.unionAll(c_)
    return out


@register(
    "d44_sequence_pattern",
    oracle="""
WITH j AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
    FROM events GROUP BY user_id
)
SELECT user_id,
       len(journey)::BIGINT AS journey_len,
       len(regexp_extract_all(journey, 'vcp'))::BIGINT AS n_conversions
FROM j
""",
    tags=("north-star", "E9", "pattern"),
)
def d44_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining (the MATCH_RECOGNIZE family, composed
    from primitives): each user's events collapse — in (ts, event_id)
    order — into a journey string of event-type initials, and conversions
    are counted as non-overlapping ``view→click→purchase`` runs via
    ``regexp_count``. Event-type initials are unique in this schema, so
    the encoding is lossless.

    100 TB shape: one shuffle keyed on user_id; per-user state is the
    journey string (events-per-user bounded), and the regex runs once per
    user in codegen — no joins, no reshuffling, trivially
    watermark-windowable for the streaming twin."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts",
                                               "event_type")
    step = F.struct(F.col("ts"), F.col("event_id"),
                    F.substring("event_type", 1, 1).alias("c"))
    journey = F.concat_ws(
        "", F.transform(F.array_sort(F.collect_list(step)),
                        lambda x: x["c"]))
    return (ev.groupBy("user_id")
            .agg(journey.alias("journey"))
            .select("user_id",
                    F.length("journey").cast("bigint").alias("journey_len"),
                    F.regexp_count("journey", F.lit("vcp")).cast("bigint")
                    .alias("n_conversions")))


@register(
    "e28_session_funnel",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
    SELECT user_id, event_id, ts, event_type,
           (sum(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) + 1)::BIGINT
               AS session_id
    FROM flagged
), per_session AS (
    SELECT user_id, session_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
    FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       sum(CASE WHEN journey LIKE '%v%c%p%' THEN 1 ELSE 0 END)::BIGINT
           AS n_converted
FROM per_session
GROUP BY user_id
""",
    tags=("north-star", "E9", "funnel"),
)
def e28_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel WITHIN session bounds: a session converts when it contains a
    view, then a click, then a purchase in order (subsequence match on the
    per-session journey string — the sessionized refinement of d42's
    lifetime funnel).

    100 TB shape: sessionization shuffles once on user_id; the
    per-(user, session) aggregate and the final per-user rollup both
    reuse that partitioning (hash(user_id) co-locates every finer key),
    so the whole funnel is ONE shuffle + codegen string work."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts",
                                              "event_type")
    s = sessionized(e)
    step = F.struct(F.col("ts"), F.col("event_id"),
                    F.substring("event_type", 1, 1).alias("c"))
    journey = F.concat_ws(
        "", F.transform(F.array_sort(F.collect_list(step)),
                        lambda x: x["c"]))
    per_session = (s.groupBy("user_id", "session_id")
                   .agg(journey.alias("journey")))
    return (per_session.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum(F.when(F.col("journey").like("%v%c%p%"), 1)
                       .otherwise(0)).cast("bigint").alias("n_converted")))


@register(
    "e37_retention_cohorts",
    oracle="""
WITH weekly AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
    FROM events
), first_wk AS (
    SELECT user_id, min(wk) AS cohort_week FROM weekly GROUP BY user_id
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM weekly JOIN first_wk USING (user_id)
GROUP BY 1, 2
""",
    tags=("north-star", "E10", "retention"),
)
def e37_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by their FIRST active week
    (the cohort), counted in every subsequent week they return — the
    triangle chart behind every growth dashboard. All values are exact
    (timestamp truncation + integer week arithmetic; the offset divides
    whole days by 7, which is boundary-crossing-agnostic across engines
    because both dates are already week-truncated).

    100 TB shape: the distinct (user, week) activity set and the
    per-user min both shuffle on user_id — hash(user_id) co-locates the
    finer (user, week) key, so the self-join back is exchange-free on the
    activity side, and the final cohort × offset aggregate is tiny
    (|weeks|² cells). The events scan prunes to (user_id, ts). No window
    over a global ordering, no per-cohort recomputation of history."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    weekly = e.distinct()
    first = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    j = weekly.join(first, "user_id")
    offset = (F.datediff(F.col("wk"), F.col("cohort_week")) / 7) \
        .cast("bigint")
    return (j.groupBy("cohort_week", offset.alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


@register(
    "e38_rollup_merge_upsert",
    oracle="""
WITH cutoff AS (
    SELECT date_trunc('day', max(ts)) AS c FROM events
), old AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n, sum(value) AS sv
    FROM events, cutoff WHERE ts < c GROUP BY 1, 2
), delta AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n, sum(value) AS sv
    FROM events, cutoff WHERE ts >= c GROUP BY 1, 2
)
SELECT coalesce(o.window_start, d.window_start) AS window_start,
       coalesce(o.event_type, d.event_type) AS event_type,
       CAST(coalesce(o.n, 0) + coalesce(d.n, 0) AS BIGINT) AS n_events,
       round(coalesce(o.sv, 0) + coalesce(d.sv, 0), 6) AS total_value,
       CASE WHEN o.window_start IS NULL THEN 'inserted'
            WHEN d.window_start IS NULL THEN 'carried'
            ELSE 'updated' END AS merge_action
FROM old o
FULL OUTER JOIN delta d
  ON o.window_start = d.window_start AND o.event_type = d.event_type
""",
    tags=("north-star", "E10", "incremental", "merge"),
)
def e38_rollup_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-shaped maintenance of e19's hourly rollup (VERDICT r3 task 3):
    the stored rollup (events before the last ingest day) FULL OUTER JOINs
    the new day's partial rollup on the rollup key, coalescing counts/sums
    and tagging each row carried / updated / inserted — e20's upsert plan
    applied to a continuous aggregate, which is exactly what a lakehouse
    MERGE INTO compiles to. The oracle recomputes both sides and merges
    identically; partial sums round 6 dp post-merge (association differs
    across engines — e19's rule).

    100 TB: the join keys are (hour, type) — the delta side only contains
    the ingest day's hours, so with the target partitioned by window date
    only those partitions rewrite; history is never rescanned (the n_events
    sum-merge is associative, which is what makes incremental == full
    recompute)."""
    e = table(spark, sf_dir, "events")
    # driver-side scalar (one tiny action): the ingest-day cutoff
    cutoff = e.agg(F.date_trunc("day", F.max("ts")).alias("c")).first()["c"]

    def rollup(df: DataFrame) -> DataFrame:
        return (df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("sv"))
                .select(F.col("w.start").alias("window_start"),
                        "event_type", "n", "sv"))

    old = rollup(e.filter(F.col("ts") < F.lit(cutoff)))
    delta = rollup(e.filter(F.col("ts") >= F.lit(cutoff)))
    o, d = old.alias("o"), delta.alias("d")
    merged = o.join(
        d, (F.col("o.window_start") == F.col("d.window_start"))
        & (F.col("o.event_type") == F.col("d.event_type")), "full_outer")
    return merged.select(
        F.coalesce("o.window_start", "d.window_start").alias("window_start"),
        F.coalesce("o.event_type", "d.event_type").alias("event_type"),
        (F.coalesce("o.n", F.lit(0)) + F.coalesce("d.n", F.lit(0)))
        .cast("bigint").alias("n_events"),
        F.round(F.coalesce("o.sv", F.lit(0.0))
                + F.coalesce("d.sv", F.lit(0.0)), 6).alias("total_value"),
        F.when(F.col("o.window_start").isNull(), "inserted")
         .when(F.col("d.window_start").isNull(), "carried")
         .otherwise("updated").alias("merge_action"))
