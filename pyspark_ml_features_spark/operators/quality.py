"""Pipeline quality measurement: precision/recall of the approximate dedup
path against exact ground truth — the audit every production near-dedup
deployment runs before trusting its banded-LSH geometry (C4/GPT-3-style
pipelines tune bands/rows against exactly this confusion table).

The whole report is exactly SQL-expressible because e33's MinHash is
engine-exact integer arithmetic: candidates AND ground truth AND the
confusion counts all hash-check against DuckDB — the recall number itself
is driver-verified, not a pytest-only invariant (e2's MLlib twin can't do
this; its signatures are engine-specific).

Scale design (100 TB): exact pairwise truth is O(candidates) via the
shingle inverted-index join, affordable on an AUDIT SLICE, not the corpus
— production runs this report on a sampled partition and extrapolates,
while the banded path (e33/e2d) runs the full corpus. The fixture corpus
is small enough to audit whole, which is what makes the oracle exact
end-to-end.

Reference: the reference repo (six ML utilities, spark_ml_features.py:1)
has no dedup surface; SURVEY §2-E north-star scope.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pyspark_ml_features_spark.operators.dedup import (
    _duckdb_minhash_ctes,
    jaccard_pairs,
    minhash_candidate_pairs,
    numeric_shingles,
    token_hash_arrays,
)
from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table


def _e46_oracle() -> str:
    return f"""
WITH {_duckdb_minhash_ctes()},
sizes AS (
    SELECT doc_id, len(sh) AS n_sh FROM shingled
), inv AS (
    SELECT doc_id, unnest(sh) AS shingle FROM shingled
), shared AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
    FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
), truth AS (
    SELECT d1, d2 FROM shared
    JOIN sizes sa ON d1 = sa.doc_id
    JOIN sizes sb ON d2 = sb.doc_id
    WHERE shared::DOUBLE / (sa.n_sh + sb.n_sh - shared) >= 0.5
), conf AS (
    SELECT t.d1 AS td1, e.d1 AS ed1
    FROM truth t FULL JOIN est e ON t.d1 = e.d1 AND t.d2 = e.d2
)
SELECT CAST(count(td1) AS BIGINT) AS n_true,
       CAST(count(ed1) AS BIGINT) AS n_est,
       CAST(sum(CASE WHEN td1 IS NOT NULL AND ed1 IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
       sum(CASE WHEN td1 IS NOT NULL AND ed1 IS NOT NULL
                THEN 1 ELSE 0 END)::DOUBLE / count(ed1) AS precision_est,
       sum(CASE WHEN td1 IS NOT NULL AND ed1 IS NOT NULL
                THEN 1 ELSE 0 END)::DOUBLE / count(td1) AS recall_est
FROM conf
"""


@register(
    "e46_lsh_quality_report",
    oracle=_e46_oracle(),
    tags=("north-star", "E2", "E3", "dedup", "quality", "audit"),
)
def e46_lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH audit: e33's banded candidates (Ĵ ≥ 0.5, 16 sigs /
    8 bands) scored against EXACT 3-gram-shingle Jaccard ≥ 0.5 over the
    same corpus — one row: true pair count, estimated pair count, true
    positives, precision, recall. FULL OUTER join of the two pair sets so
    both miss directions (LSH false negatives, estimator false positives)
    are counted; ratios are one double division each, mirrored verbatim in
    the oracle."""
    d = table(spark, sf_dir, "documents")
    est = minhash_candidate_pairs(d).select("d1", "d2")
    th_df = token_hash_arrays(d)
    truth = jaccard_pairs(
        th_df.withColumn("__sh", numeric_shingles(F.col("th"))),
        F.col("__sh"), threshold=0.5).select("d1", "d2")
    t, e = truth.alias("t"), est.alias("e")
    conf = t.join(e, (F.col("t.d1") == F.col("e.d1"))
                  & (F.col("t.d2") == F.col("e.d2")), "full")
    tp = F.when(F.col("t.d1").isNotNull() & F.col("e.d1").isNotNull(), 1) \
          .otherwise(0)
    return conf.agg(
        F.count(F.col("t.d1")).alias("n_true"),
        F.count(F.col("e.d1")).alias("n_est"),
        F.sum(tp).alias("n_tp"),
        (F.sum(tp).cast("double") / F.count(F.col("e.d1")))
        .alias("precision_est"),
        (F.sum(tp).cast("double") / F.count(F.col("t.d1")))
        .alias("recall_est"))


def _e50_oracle() -> str:
    return f"""
WITH {_duckdb_minhash_ctes()},
thr AS (SELECT unnest([8, 10, 12, 14, 16]) AS min_match)
SELECT thr.min_match,
       CAST(count(CASE WHEN est.n_sig_match >= thr.min_match
                       THEN 1 END) AS BIGINT) AS n_pairs,
       thr.min_match / 16.0 AS est_jaccard_threshold
FROM thr LEFT JOIN est ON est.n_sig_match >= thr.min_match
GROUP BY thr.min_match
"""


@register(
    "e50_threshold_sweep",
    oracle=_e50_oracle(),
    tags=("north-star", "E2", "dedup", "quality", "tuning"),
)
def e50_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold SWEEP from one candidate pass: pair counts at
    five agreement cutoffs (Ĵ ≥ 0.5 .. 1.0) computed from a single banded
    join — the tuning table an operator reads to pick the dedup threshold
    (too low → over-merging, too high → missed dups), without re-running
    candidate generation per candidate threshold. With e49's signature
    store this sweep re-runs nightly at ~0.1% of corpus cost.

    100 TB: one banded join (the e33 plan), then a 5-row broadcast of
    thresholds over the pair relation — count aggregates map-side."""
    d = table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(d).select("n_sig_match")
    th = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in (8, 10, 12, 14, 16)]))
        .alias("min_match"))
    return (th.crossJoin(F.broadcast(pairs))
            .groupBy("min_match")
            .agg(F.count(F.when(F.col("n_sig_match") >= F.col("min_match"),
                                1)).alias("n_pairs"),
                 F.first(F.col("min_match") / 16.0)
                 .alias("est_jaccard_threshold")))
