"""Python-boundary operators (SURVEY §2-D D20 family): row UDF, grouped
applyInPandas (UDAF-shaped), plus the approx robust-scaling scale path.

The engine's rule: anything SQL-expressible stays JVM-side; these queries
exist to prove the escape hatches work AND produce oracle-exact results when
the Python logic is pure. Grouped min-max scaling is chosen for the
applyInPandas demo because min/max are exact (no float summation-order
hazard that pandas' pairwise mean would introduce).
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table


@register(
    "d21_apply_in_pandas_minmax",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber,
       (l_extendedprice - min(l_extendedprice) OVER (PARTITION BY l_returnflag))
       / (max(l_extendedprice) OVER (PARTITION BY l_returnflag)
          - min(l_extendedprice) OVER (PARTITION BY l_returnflag)) AS price_minmax
FROM lineitem
""",
    tags=("engine", "D20", "udf"),
)
def d21_apply_in_pandas_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization via applyInPandas — the grouped-UDAF
    escape hatch (one shuffle on the group key, Arrow batches per group).
    min/max are order-independent, so the pandas arithmetic is bit-equal to
    the SQL window formula."""

    def _minmax(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf["l_extendedprice"].min()
        hi = pdf["l_extendedprice"].max()
        return pd.DataFrame({
            "l_returnflag": pdf["l_returnflag"],
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "price_minmax": (pdf["l_extendedprice"] - lo) / (hi - lo),
        })

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        _minmax,
        schema="l_returnflag string, l_orderkey bigint, "
               "l_linenumber int, price_minmax double")


@register(
    "d22_row_udf",
    oracle="""
SELECT p_partkey,
       upper(p_brand) || '/' || CAST(length(p_name) AS VARCHAR) AS brand_code
FROM part
""",
    tags=("engine", "D20", "udf"),
)
def d22_row_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the slowest escape hatch, declared once to
    cover the surface (and to give BENCH a measured contrast against the
    pandas UDF and JVM paths). Never use this in a hot path."""

    @F.udf(StringType())
    def brand_code(brand: str, name: str) -> str:
        return f"{brand.upper()}/{len(name)}"

    p = table(spark, sf_dir, "part")
    return p.select("p_partkey",
                    brand_code("p_brand", "p_name").alias("brand_code"))


@register("b6b_robust_scaling_approx", tags=("reference", "B6", "approx"))
def b6b_robust_scaling_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 scale path: Greenwald-Khanna approxQuantile (single job for ALL
    columns, bounded memory — the 100 TB default). Approx quantiles are
    engine-specific → rows-only; agreement with the exact path is asserted
    in tests/test_invariants.py."""
    from pyspark_ml_features_spark.operators.scaling import robust_scale

    li = table(spark, sf_dir, "lineitem")
    scaled = robust_scale(li, ["l_quantity", "l_extendedprice", "l_discount"],
                          method="approx", quantile_error=1e-3)
    return scaled.select(
        "l_orderkey", "l_linenumber",
        "l_quantity_scaled", "l_extendedprice_scaled", "l_discount_scaled")


@register(
    "d27_python_udtf",
    oracle="""
SELECT doc_id, unnest(str_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 20
""",
    tags=("engine", "D20", "udf", "udtf"),
)
def d27_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): tokenize one document into rows —
    completes the UDF/UDAF/UDTF trio. Deterministic pure-Python logic, so
    the SQL unnest oracle matches exactly. Like row UDFs, UDTFs are a
    last-resort surface: this exact op is explode(split(...)) in the JVM."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in text.split(" "):
                yield doc_id, tok

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.token "
        "FROM udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) t")


@register("d31_per_group_regression", tags=("engine", "udf", "ml", "grouped"))
def d31_per_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment model fitting via applyInPandas: closed-form OLS
    (slope/intercept of extendedprice ~ quantity) per returnflag — the
    grouped-map pattern for training one model per segment (each group fits
    on one executor; thousands of segment models fit in parallel, no driver
    loop). Rows-only: float summation order differs across engines;
    agreement with DuckDB regr_slope/regr_intercept is asserted with
    tolerance in tests/test_invariants.py."""

    def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_quantity"].to_numpy(dtype=float)
        y = pdf["l_extendedprice"].to_numpy(dtype=float)
        n = len(x)
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "slope": [slope],
            "intercept": [(sy - slope * sx) / n],
            "n": [n],
        })

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        _ols, schema="l_returnflag string, slope double, "
                     "intercept double, n bigint")


@register("d32_stratified_sample", tags=("engine", "D19", "rng", "stratified"))
def d32_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-class) sampling via sampleBy — the class-balancing
    primitive for training sets (downsample majority classes). Seeded;
    rows-only (engine RNG), per-stratum fraction bounds asserted in
    tests/test_invariants.py."""
    li = table(spark, sf_dir, "lineitem")
    sampled = li.sampleBy(
        "l_returnflag", fractions={"A": 0.1, "N": 0.5, "R": 0.1}, seed=42)
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"))


@register(
    "d59_map_in_arrow",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS rev_cents,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("engine", "udf", "arrow"),
)
def d59_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the LOWEST-overhead Python boundary (raw Arrow
    RecordBatches, no pandas materialization), completing the UDF spectrum
    alongside d22 (row UDF anti-baseline), d20 (scalar pandas UDF), d21/d31
    (applyInPandas), d27 (UDTF), and the mapInPandas multimodal family.
    Per-row revenue cents compute in pyarrow.compute with the EXACT same
    op order as the oracle's ``round(price * (1 - disc) * 100)`` (identical
    IEEE doubles → identical ties; round_mode half-towards-infinity ==
    engines' half-away-from-zero on positive values); the aggregation stays
    JVM-side AFTER the Python boundary, so the shuffle is Spark's own.

    100 TB: Arrow batches stream through Python with zero-copy columnar
    access — the right boundary when vectorized pyarrow kernels (or any
    Arrow-native library) can express the transform."""
    import pyarrow as pa

    def rev_batches(batches):
        import pyarrow.compute as pc

        for batch in batches:
            rev = pc.round(
                pc.multiply(
                    pc.multiply(batch.column("l_extendedprice"),
                                pc.subtract(pa.scalar(1.0),
                                            batch.column("l_discount"))),
                    pa.scalar(100.0)),
                0, round_mode="half_towards_infinity")
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_returnflag"),
                 pc.cast(rev, pa.int64())],
                ["l_returnflag", "rev_cents"])

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount")
    mapped = li.mapInArrow(rev_batches, "l_returnflag string, rev_cents long")
    return (mapped.groupBy("l_returnflag")
            .agg(F.sum("rev_cents").alias("rev_cents"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "d83_pandas_udaf",
    oracle="""
SELECT o_orderstatus,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    tags=("engine", "D20", "udf", "udaf"),
)
def d83_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED-AGGREGATE pandas UDF (the UDAF slot in the D20 Python
    spectrum: scalar pandas UDF d20, grouped-map d21, row UDF d22, UDTF
    d27, mapInPandas sketch, mapInArrow d59 — this is the remaining
    shape): each group's column arrives as ONE pandas Series and the UDF
    returns a scalar. Exact because the payload is integer cents (numpy
    int64 sum — associative, no float order sensitivity).

    100 TB: partial aggregation does NOT apply to pandas UDAFs — every
    row of a group ships to one executor (fine on bounded groups like the
    3 statuses here; a built-in sum map-combines first and is the default
    for unbounded groups — this row documents the trade)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    @F.pandas_udf("bigint")
    def sum_cents(s: pd.Series) -> int:
        return int(s.sum())

    # Spark cannot mix pandas and built-in aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too
    @F.pandas_udf("bigint")
    def n_rows(s: pd.Series) -> int:
        return len(s)

    o = table(spark, sf_dir, "orders")
    return (o.withColumn("cents", cents)
            .groupBy("o_orderstatus")
            .agg(sum_cents("cents").alias("sum_price_cents"),
                 n_rows("cents").alias("n_orders")))


@register(
    "d109_udtf_table_arg",
    oracle="""
WITH g AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(max(epoch_us(ts) - epoch_us(prev)), 0) AS BIGINT)
           AS max_gap_us
FROM g GROUP BY user_id
""",
    tags=("engine", "D20", "udf", "udtf", "table-arg"),
)
def d109_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF with a TABLE argument (Spark 4):
    ``gap_stats(TABLE(events) PARTITION BY user_id ORDER BY (ts,
    event_id))`` — the engine hands each user's rows to ONE UDTF instance
    in order and ``terminate()`` emits that user's summary, i.e. a custom
    per-group sequential operator expressed as a table function instead
    of applyInPandas (d21's shape). Gaps are computed as exact integer
    MICROSECONDS via timedelta floor-division (never float
    total_seconds(), and never date_diff('second'), which counts
    boundary crossings, not elapsed time); the oracle mirrors with
    epoch_us arithmetic over a lag window. Single-event users report gap
    0 on both sides.

    100 TB: PARTITION BY shuffles once on user_id; each partition
    streams through its UDTF instance row-at-a-time — use this shape
    when the per-group logic is genuinely sequential/stateful and
    small-output (summaries), and applyInPandas when vectorizable.
    Reference: no UDF surface in the reference repo
    (spark_ml_features.py:1); SURVEY section 2-D20 family."""
    from datetime import timedelta

    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class GapStats:
        def __init__(self):
            self.user = None
            self.prev = None
            self.n = 0
            self.max_gap = 0

        def eval(self, row):
            self.user = row["user_id"]
            ts = row["ts"]
            if self.prev is not None:
                gap = (ts - self.prev) // timedelta(microseconds=1)
                if gap > self.max_gap:
                    self.max_gap = gap
            self.prev = ts
            self.n += 1

        def terminate(self):
            if self.user is not None:
                yield self.user, self.n, self.max_gap

    ev = table(spark, sf_dir, "events")
    view = f"udtf_events_{os.getpid()}"
    ev.createOrReplaceTempView(view)
    spark.udtf.register("gap_stats", GapStats)
    return spark.sql(
        f"SELECT * FROM gap_stats(TABLE({view}) "
        "PARTITION BY user_id ORDER BY (ts, event_id))")
