"""Robust scaling (SURVEY §2-B B6): ``(x - median) / IQR`` per column.

Reference behavior (/root/reference/spark_ml_features.py:130-159): loop over
columns, one eager ``approxQuantile`` job per column, append ``{col}_scaled``,
skipping any column whose IQR <= 1e-10.

Scale fixes versus the reference:
 - ONE stats job for all columns (the reference's per-column loop costs k full
   scans at 100 TB; ml:148-150).
 - a fully declarative variant (:func:`robust_scale_expr`) that computes the
   quantiles as a 1-row aggregate and broadcast-cross-joins it — no eager
   driver action at plan-build time, and Catalyst keeps scan pruning intact.
 - an exact path (``percentile`` = linear interpolation, bit-identical to
   DuckDB ``quantile_cont``) for oracle checking, and an approx path
   (Greenwald-Khanna ``approxQuantile``) as the 100 TB default, since exact
   percentile materializes per-partition value buffers.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

IQR_EPS = 1e-10


def robust_scale(df: DataFrame, columns: Sequence[str],
                 method: str = "approx", quantile_error: float = 1e-4) -> DataFrame:
    """Reference-faithful eager API: stats collected to the driver, scaled
    columns appended as literal-constant projections (lazy until an action).

    ``method="approx"`` is the scale path (single pass, bounded memory);
    ``method="exact"`` matches DuckDB ``quantile_cont`` bit-for-bit.
    """
    columns = list(columns)
    if method == "approx":
        # Single JVM call for ALL columns — one job, one scan.
        quantiles = df.approxQuantile(columns, [0.25, 0.5, 0.75], quantile_error)
        stats = dict(zip(columns, quantiles))
    elif method == "exact":
        row = df.agg(*[
            F.percentile(c, F.lit([0.25, 0.5, 0.75])).alias(c) for c in columns
        ]).first()
        stats = {c: row[c] for c in columns}
    else:
        raise ValueError(f"method must be 'approx' or 'exact', got {method!r}")

    out = df
    for c in columns:
        q1, med, q3 = stats[c]
        iqr = q3 - q1
        if iqr > IQR_EPS:  # reference guard, ml:155
            out = out.withColumn(f"{c}_scaled", (F.col(c) - F.lit(med)) / F.lit(iqr))
    return out


def robust_scale_expr(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Declarative twin: exact percentiles as a one-row aggregate, broadcast
    cross join, scaled projection. No driver-side action; the whole thing is
    one Catalyst plan (aggregate feeds a BroadcastNestedLoopJoin of 1 row).

    Emits ``{col}_scaled`` unconditionally (NULL when IQR <= eps) — the
    declared-query form; use :func:`robust_scale` for reference-exact
    column-skipping semantics.
    """
    columns = list(columns)
    stats = df.agg(*[
        F.percentile(c, F.lit([0.25, 0.5, 0.75])).alias(f"__q_{c}") for c in columns
    ])
    out = df.crossJoin(F.broadcast(stats))
    for c in columns:
        q = F.col(f"__q_{c}")
        med, iqr = q[1], q[2] - q[0]
        out = out.withColumn(
            f"{c}_scaled",
            F.when(iqr > F.lit(IQR_EPS), (F.col(c) - med) / iqr),
        )
    return out.drop(*[f"__q_{c}" for c in columns])


_SCALE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


@register(
    "b6_robust_scaling",
    oracle="""
WITH q AS (
    SELECT
        quantile_cont(l_quantity, 0.25)      AS q1_qty,
        quantile_cont(l_quantity, 0.5)       AS med_qty,
        quantile_cont(l_quantity, 0.75)      AS q3_qty,
        quantile_cont(l_extendedprice, 0.25) AS q1_ep,
        quantile_cont(l_extendedprice, 0.5)  AS med_ep,
        quantile_cont(l_extendedprice, 0.75) AS q3_ep,
        quantile_cont(l_discount, 0.25)      AS q1_d,
        quantile_cont(l_discount, 0.5)       AS med_d,
        quantile_cont(l_discount, 0.75)      AS q3_d
    FROM lineitem
)
SELECT
    l.l_orderkey,
    l.l_linenumber,
    l.l_quantity,
    l.l_extendedprice,
    l.l_discount,
    CASE WHEN q.q3_qty - q.q1_qty > 1e-10
         THEN (l.l_quantity - q.med_qty) / (q.q3_qty - q.q1_qty) END AS l_quantity_scaled,
    CASE WHEN q.q3_ep - q.q1_ep > 1e-10
         THEN (l.l_extendedprice - q.med_ep) / (q.q3_ep - q.q1_ep) END AS l_extendedprice_scaled,
    CASE WHEN q.q3_d - q.q1_d > 1e-10
         THEN (l.l_discount - q.med_d) / (q.q3_d - q.q1_d) END AS l_discount_scaled
FROM lineitem l, q
""",
    tags=("reference", "B6", "flagship"),
)
def b6_robust_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: exact robust scaling of lineitem quantity/price/discount
    (reference B6, spark_ml_features.py:130-159, rebuilt single-pass)."""
    li = table(spark, sf_dir, "lineitem")
    scaled = robust_scale_expr(li, _SCALE_COLS)
    return scaled.select(
        "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount",
        *[f"{c}_scaled" for c in _SCALE_COLS],
    )
