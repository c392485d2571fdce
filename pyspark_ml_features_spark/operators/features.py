"""Feature-preparation operators (SURVEY §2-B B1, B2, B7, B9, B10).

Reference: ``prepare_features`` (/root/reference/spark_ml_features.py:30-47,
spark_ml_features_local.py:60-82), ``feature_union`` (ml:161-184),
``add_split_column`` (ml:248-265), ``predefined_split`` filters (ml:227-228).

Two twins per operator:
 - an **array twin** (``ArrayType(Double)`` + built-in SQL functions) that is
   exactly SQL-expressible, oracle-checked, and keeps whole-stage codegen;
 - a **vector twin** at the MLlib boundary (``VectorAssembler`` /
   ``StringIndexer`` / ``StandardScaler``) for `pyspark.ml` interop — see
   :mod:`pyspark_ml_features_spark.operators.ml`.

Scale notes (100 TB): label indexing is a groupBy on the label column
(cardinality = #classes, tiny shuffle) + broadcast join back — no global sort
of the fact table. Standard-scaling stats are ONE aggregate over explicit
sums (count/sum/sum-of-squares), not per-column jobs; the per-dimension scale
is a codegen'd projection.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

FEATURE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def label_index(df: DataFrame, label_col: str, output_col: str = "label") -> DataFrame:
    """B2: string label -> double ordinal, most-frequent class = 0.0, ties
    broken lexically — the exact public contract of MLlib ``StringIndexer``
    (stringOrderType="frequencyDesc"; reference local:76-77), re-expressed
    relationally so it is deterministic and oracle-checkable.

    The mapping table has #distinct-labels rows: the global window sort is
    over class cardinality (tiny), and the join back is a broadcast.
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy(F.desc("__cnt"), F.asc(label_col))
    mapping = counts.select(
        label_col,
        (F.dense_rank().over(w) - F.lit(1)).cast("double").alias(output_col),
    )
    return df.join(F.broadcast(mapping), on=label_col, how="inner")


def prepare_features_array(df: DataFrame, feature_cols: Sequence[str],
                           label_col: str) -> DataFrame:
    """B1 array twin: pack feature columns into ``array<double>`` + indexed
    label (reference assembles a VectorUDT: ml:30-47; the array form is
    byte-comparable to DuckDB lists and converts at the MLlib boundary via
    ``pyspark.ml.functions.array_to_vector``)."""
    packed = df.withColumn(
        "features", F.array(*[F.col(c).cast("double") for c in feature_cols]))
    return label_index(packed, label_col)


def standard_scale_array(df: DataFrame, array_col: str, dim: int,
                         out_col: str = "scaled_features") -> DataFrame:
    """B7 helper: per-dimension ``(x - mean) / stddev_samp`` over an
    array column, one aggregate job, stats via explicit count/sum/sum-of-
    squares so Spark and any oracle compute identical doubles.

    Replaces ``StandardScaler(withMean=True)`` (reference ml:174-176), which
    densifies sparse vectors; here stats are 3 doubles per dimension.
    """
    stats = df.select(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(array_col)[i]).alias(f"__s{i}") for i in range(dim)],
        *[F.sum(F.col(array_col)[i] * F.col(array_col)[i]).alias(f"__q{i}")
          for i in range(dim)],
    )
    out = df.crossJoin(F.broadcast(stats))
    n = F.col("__n")
    scaled = F.array(*[
        (F.col(array_col)[i] - F.col(f"__s{i}") / n)
        / F.sqrt((F.col(f"__q{i}") - F.col(f"__s{i}") * F.col(f"__s{i}") / n)
                 / (n - F.lit(1)))
        for i in range(dim)
    ])
    return out.withColumn(out_col, scaled).drop(
        "__n", *[f"__s{i}" for i in range(dim)], *[f"__q{i}" for i in range(dim)])


def feature_union_array(df: DataFrame, array_col: str, dim: int) -> DataFrame:
    """B7 array twin: concat raw ‖ standard-scaled features
    (reference ml:161-184)."""
    scaled = standard_scale_array(df, array_col, dim)
    return scaled.withColumn(
        "combined_features", F.concat(F.col(array_col), F.col("scaled_features")))


def add_split_column(df: DataFrame, mode: str = "random",
                     key_col: str | None = None, seed: int = 42,
                     train_fraction: float = 0.7,
                     condition=None) -> DataFrame:
    """B9: append ``is_train`` 0/1 (reference ml:248-265).

    modes: ``random`` — seeded ``rand()`` (reference used unseeded RAND(),
    ml:262 — irreproducible; we always seed); ``modulo`` — deterministic
    ``pmod(key, 10) < 7`` twin (oracle-checkable, stable under re-runs and
    repartitioning, which even seeded rand() is not); ``custom`` — any
    boolean Column (reference's ``label != 'setosa'`` form, ml:256-259).
    """
    if mode == "random":
        flag = F.rand(seed) < F.lit(train_fraction)
    elif mode == "modulo":
        buckets = int(round(train_fraction * 10))
        flag = F.pmod(F.col(key_col), F.lit(10)) < F.lit(buckets)
    elif mode == "custom":
        flag = condition
    else:
        raise ValueError(f"unknown split mode {mode!r}")
    return df.withColumn("is_train", flag.cast("int"))


def predefined_split_filters(df: DataFrame, split_col: str = "is_train"):
    """B10 split filters (reference ml:227-228): (train, test) DataFrames."""
    return (df.filter(F.col(split_col) == 1), df.filter(F.col(split_col) == 0))


# --------------------------------------------------------------------------
# Declared queries
# --------------------------------------------------------------------------

@register(
    "b2_label_index",
    oracle="""
WITH counts AS (
    SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag
), mapping AS (
    SELECT l_returnflag,
           CAST(dense_rank() OVER (ORDER BY cnt DESC, l_returnflag ASC) - 1 AS DOUBLE) AS label
    FROM counts
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, m.label
FROM lineitem l JOIN mapping m USING (l_returnflag)
""",
    tags=("reference", "B2"),
)
def b2_label_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringIndexer semantics (frequencyDesc, lexical ties) as a relational
    plan: tiny groupBy + broadcast join (reference local:76-77)."""
    li = table(spark, sf_dir, "lineitem")
    return label_index(li, "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "label")


@register(
    "b1_prepare_features",
    oracle="""
WITH counts AS (
    SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag
), mapping AS (
    SELECT l_returnflag,
           CAST(dense_rank() OVER (ORDER BY cnt DESC, l_returnflag ASC) - 1 AS DOUBLE) AS label
    FROM counts
)
SELECT l.l_orderkey, l.l_linenumber,
       l.l_quantity::DOUBLE AS f0, l.l_extendedprice::DOUBLE AS f1,
       l.l_discount::DOUBLE AS f2, l.l_tax::DOUBLE AS f3,
       m.label
FROM lineitem l JOIN mapping m USING (l_returnflag)
""",
    tags=("reference", "B1"),
)
def b1_prepare_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prepare_features array twin on the lineitem iris-alike fixture
    (reference ml:30-47): features array<double> + frequency-indexed label.
    The declared output projects the array elements as scalar columns
    f0..f3 — the verification harness canonicalizes with pandas and cannot
    sort array cells (round-1 driver FAIL; VERDICT.md item 1)."""
    li = table(spark, sf_dir, "lineitem")
    packed = prepare_features_array(li, FEATURE_COLS, "l_returnflag")
    return packed.select(
        "l_orderkey", "l_linenumber",
        *[F.col("features")[i].alias(f"f{i}") for i in range(len(FEATURE_COLS))],
        "label")


@register(
    "b7_feature_union",
    oracle="""
WITH s AS (
    SELECT count(*)::DOUBLE AS n,
           sum(l_quantity) AS s0, sum(l_extendedprice) AS s1,
           sum(l_discount) AS s2, sum(l_tax) AS s3,
           sum(l_quantity*l_quantity) AS q0, sum(l_extendedprice*l_extendedprice) AS q1,
           sum(l_discount*l_discount) AS q2, sum(l_tax*l_tax) AS q3
    FROM lineitem
)
SELECT l.l_orderkey, l.l_linenumber,
       l.l_quantity::DOUBLE AS raw0, l.l_extendedprice::DOUBLE AS raw1,
       l.l_discount::DOUBLE AS raw2, l.l_tax::DOUBLE AS raw3,
       (l.l_quantity      - s.s0/s.n) / sqrt((s.q0 - s.s0*s.s0/s.n)/(s.n-1)) AS scaled0,
       (l.l_extendedprice - s.s1/s.n) / sqrt((s.q1 - s.s1*s.s1/s.n)/(s.n-1)) AS scaled1,
       (l.l_discount      - s.s2/s.n) / sqrt((s.q2 - s.s2*s.s2/s.n)/(s.n-1)) AS scaled2,
       (l.l_tax           - s.s3/s.n) / sqrt((s.q3 - s.s3*s.s3/s.n)/(s.n-1)) AS scaled3
FROM lineitem l, s
""",
    tags=("reference", "B7"),
)
def b7_feature_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """feature_union array twin (reference ml:161-184): standard-scale via
    one explicit-sums aggregate, concat raw ‖ scaled. The declared output
    projects the combined array's elements as scalars raw0..3/scaled0..3
    (driver canonicalizer cannot sort array cells; VERDICT.md item 1)."""
    li = table(spark, sf_dir, "lineitem")
    packed = li.withColumn(
        "features", F.array(*[F.col(c).cast("double") for c in FEATURE_COLS]))
    out = feature_union_array(packed, "features", len(FEATURE_COLS))
    n = len(FEATURE_COLS)
    return out.select(
        "l_orderkey", "l_linenumber",
        *[F.col("combined_features")[i].alias(f"raw{i}") for i in range(n)],
        *[F.col("combined_features")[n + i].alias(f"scaled{i}") for i in range(n)])


@register(
    "b9_split_modulo",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_orderkey % 10 < 7 AS INT) AS is_train
FROM lineitem
""",
    tags=("reference", "B9"),
)
def b9_split_modulo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic modulo split twin of add_split_column (reference
    ml:262 used unseeded RAND() — irreproducible; this twin is stable)."""
    li = table(spark, sf_dir, "lineitem")
    return add_split_column(li, mode="modulo", key_col="l_orderkey").select(
        "l_orderkey", "l_linenumber", "is_train")


@register(
    "b9_split_custom",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_returnflag <> 'A' AS INT) AS is_train
FROM lineitem
""",
    tags=("reference", "B9"),
)
def b9_split_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-condition split (reference's `label != 'setosa'` form,
    ml:256-259) on the lineitem fixture."""
    li = table(spark, sf_dir, "lineitem")
    return add_split_column(
        li, mode="custom", condition=F.col("l_returnflag") != "A",
    ).select("l_orderkey", "l_linenumber", "is_train")


@register("b9_split_random_seeded", tags=("reference", "B9", "rng"))
def b9_split_random_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded random split — no cross-engine oracle (Spark's rand() stream
    is engine-specific); invariants tested in tests/test_invariants.py."""
    li = table(spark, sf_dir, "lineitem")
    return add_split_column(li, mode="random", seed=42).select(
        "l_orderkey", "l_linenumber", "is_train")


@register(
    "b10_predefined_split_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE CAST(l_orderkey % 10 < 7 AS INT) = 1
""",
    tags=("reference", "B10"),
)
def b10_predefined_split_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predefined_split train-side filter (reference ml:227-228) over the
    modulo split; the filter folds into the scan predicate."""
    li = table(spark, sf_dir, "lineitem")
    split = add_split_column(li, mode="modulo", key_col="l_orderkey")
    train, _test = predefined_split_filters(split)
    return train.select("l_orderkey", "l_linenumber", "l_quantity")
