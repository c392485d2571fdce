"""Round-13 surface: multi-probe LSH recall buy-back (e115) — the one
genuinely-new class the r12 verdict named (VERDICT r12 task 5).

DESIGN_SCALE's r12 section names multi-probe/OR-banding as the recall
mitigation for e112's bucket-boundary loss, but nothing graded it; this
query makes the recall-vs-candidates trade an exactness pin instead of
prose. The probe sequence is DECLARED and deterministic — probe 0 is the
vector's own bucket; probe j (1..4) flips sign bit j-1 (plane j-1 of
similarity._lsh_planes, in plane order) — so the candidate set at every
probe depth is exactly replayable in DuckDB: a pair's FIRST depth is 0
if the buckets are equal, j if they differ in exactly bit j-1, NULL if
they differ in ≥2 bits (unreachable by Hamming-1 probing).

Registered LAST (queries.py imports this module after surface12) per the
CLAUDE.md rotation contract: post-r12 the backlog is empty, so e115
registers at the r13 window's backlog head and grades next round.

Reference: the reference repo (six MLlib utilities) has none of this
surface; SURVEY §2-E north-star scope (similarity search at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.functions.arrays import (
    duckdb_dot,
    duckdb_norm,
    to_double_array,
)
from pyspark_ml_features_spark.operators.similarity import (
    DIM,
    _bucketize,
    _duckdb_bucket,
    _pair_cos,
)
from pyspark_ml_features_spark.operators.surface12 import SEMANTIC_DUP_COSINE
from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

# own bucket + one probe per hyperplane, in plane order
N_PROBE_DEPTHS = 5


def multiprobe_candidates(eb: DataFrame) -> DataFrame:
    """Candidate pairs of a _bucketize()d (vec_id, emb, nrm, bucket)
    frame under Hamming-1 multi-probe, tagged with the FIRST probe depth
    that discovers each pair. One bucket-key equi-join per probe depth —
    the scale shape: candidates per probe are Σ_b |bucket ∩ probed|, not
    all-pairs, and each unordered pair lands in exactly one depth's join
    (XOR of two buckets is unique), so no dedup shuffle is needed.
    Shared by the graded query and the recall invariant test."""
    a = eb.select(F.col("vec_id").alias("v1"), F.col("emb").alias("e1"),
                  F.col("nrm").alias("n1"), F.col("bucket").alias("b1"))
    b = eb.select(F.col("vec_id").alias("v2"), F.col("emb").alias("e2"),
                  F.col("nrm").alias("n2"), F.col("bucket").alias("b2"))
    sets = []
    for depth in range(N_PROBE_DEPTHS):
        key = (F.col("b1") if depth == 0
               else F.col("b1").bitwiseXOR(F.lit(1 << (depth - 1))))
        sets.append(
            a.withColumn("pb", key.cast("bigint"))
            .join(b, F.col("pb") == F.col("b2"))
            .filter(F.col("v1") < F.col("v2"))
            .select("v1", "v2", "e1", "e2", "n1", "n2",
                    F.lit(depth).cast("bigint").alias("first_depth")))
    cand = sets[0]
    for s in sets[1:]:
        cand = cand.unionByName(s)
    return cand


_E115_ORACLE = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           {duckdb_norm('(embedding::DOUBLE[])', DIM)} AS nrm,
           ({_duckdb_bucket('(embedding::DOUBLE[])')}) AS bucket
    FROM embeddings WHERE vec_id % 5 = 0
), pr AS (
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           CASE WHEN a.bucket = b.bucket THEN 0
                WHEN xor(a.bucket, b.bucket) = 1 THEN 1
                WHEN xor(a.bucket, b.bucket) = 2 THEN 2
                WHEN xor(a.bucket, b.bucket) = 4 THEN 3
                WHEN xor(a.bucket, b.bucket) = 8 THEN 4
                ELSE NULL END AS first_depth,
           (round({duckdb_dot('a.emb', 'b.emb', DIM)} / (a.nrm * b.nrm), 6)
            >= {SEMANTIC_DUP_COSINE}) AS is_dup
    FROM e a JOIN e b ON a.vec_id < b.vec_id
), d AS (
    SELECT unnest(range(0, {N_PROBE_DEPTHS})) AS probe_depth
)
SELECT d.probe_depth AS probe_depth,
       CAST(sum(CASE WHEN pr.first_depth IS NOT NULL
                      AND pr.first_depth <= d.probe_depth
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN pr.first_depth IS NOT NULL
                      AND pr.first_depth <= d.probe_depth
                      AND pr.is_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_pairs,
       CAST(sum(CASE WHEN pr.is_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_pairs
FROM d CROSS JOIN pr
GROUP BY d.probe_depth
"""


@register("e115_multiprobe_lsh_recall", oracle=_E115_ORACLE,
          tags=("north-star", "similarity", "dedup", "lsh"))
def e115_multiprobe_lsh_recall(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Multi-probe LSH recall buy-back, pinned exactly: one row per probe
    depth q ∈ [0, 5) with the CUMULATIVE candidate-pair count, the
    cumulative semantic-dup pairs found (rounded cosine ≥ 0.3, e112's
    threshold), and the all-pairs ground-truth dup count on the same
    deterministic 20% sample (e4c's vec_id % 5 = 0) — so
    n_dup_pairs/n_true_pairs is the measured recall and n_candidates the
    price paid for it, both monotone in q by construction (counts are
    cumulative over each pair's unique first-discovery depth; the SET
    containment pairs(q) ⊇ pairs(q-1) is pinned in
    tests/test_invariants.py).

    100 TB: each probe depth is one more bucket-key equi-join — cost
    grows linearly in probes while recall buys back the bucket-boundary
    loss that fixed single-probe LSH (e4b/e112) pays; the deployment
    knob is (p planes, q probes) with candidates ~ q·n²/2^p, all
    shuffle-on-bucket, never all-pairs. The all-pairs truth join exists
    only on the bounded sample as the recall denominator (e4c
    precedent, BNLJ_ALLOWED).

    Cites: similarity.py:_bucketize/_lsh_planes (the shared bucketing),
    surface12.py:e112 (the single-probe consumer this de-risks),
    DESIGN_SCALE.md "Round-12 additions" (the mitigation this grades)."""
    eb = _bucketize(table(spark, sf_dir, "embeddings")
                    .filter(F.col("vec_id") % 5 == 0)
                    .select("vec_id",
                            to_double_array("embedding").alias("emb")))
    cand = multiprobe_candidates(eb)
    per_depth = (cand.select(
        "first_depth",
        (_pair_cos() >= SEMANTIC_DUP_COSINE).cast("bigint").alias("is_dup"))
        .groupBy("first_depth")
        .agg(F.count(F.lit(1)).alias("n_cand_d"),
             F.sum("is_dup").alias("n_dup_d")))
    spine = (spark.range(N_PROBE_DEPTHS)
             .select(F.col("id").cast("bigint").alias("probe_depth")))
    w = (Window.orderBy("probe_depth")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (spine.join(per_depth,
                      spine.probe_depth == per_depth.first_depth, "left")
           .select("probe_depth",
                   F.coalesce("n_cand_d", F.lit(0)).alias("c"),
                   F.coalesce("n_dup_d", F.lit(0)).alias("p"))
           .select("probe_depth",
                   F.sum("c").over(w).cast("bigint").alias("n_candidates"),
                   F.sum("p").over(w).cast("bigint").alias("n_dup_pairs")))
    # all-pairs ground truth on the bounded sample — the recall
    # denominator (e4c's shape; the only non-bucketed join here)
    a = eb.select(F.col("vec_id").alias("v1"), F.col("emb").alias("e1"),
                  F.col("nrm").alias("n1"))
    b = eb.select(F.col("vec_id").alias("v2"), F.col("emb").alias("e2"),
                  F.col("nrm").alias("n2"))
    truth = (a.join(F.broadcast(b), F.col("v1") < F.col("v2"))
             .filter(_pair_cos() >= SEMANTIC_DUP_COSINE)
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_true_pairs")))
    return cum.crossJoin(F.broadcast(truth))
