"""Similarity search over the embeddings table (SURVEY §2-E E4/E5):
brute-force cosine top-k (exact baseline), deterministic random-hyperplane
LSH (scale path with an exact oracle), embedding near-duplicate pairs, and
unit normalization.

Floating-point discipline: every dot product / norm is an explicit LEFT fold
(functions/arrays.py) so Spark and DuckDB produce bit-identical doubles; the
float32 parquet embeddings are widened to double identically on both sides
(FIXTURES.md §3). Ranking keys are rounded to 6 dp before ordering so a
last-ulp difference can never flip top-k membership between engines.

Scale design (100 TB): brute-force is the correctness baseline and stays
viable only as (small query set) × (big corpus) with the query side
broadcast — the corpus is never shuffled. The LSH path buckets the corpus by
hyperplane sign bits (16 buckets here; ~2^20 on a real deployment), turning
top-k into a bucket-local join; IVF with learned centroids slots into the
same plan with KMeans (operators/ml.py) supplying the centroids.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.functions.arrays import (
    adot,
    duckdb_dot,
    duckdb_norm,
    l2_norm,
    to_double_array,
)
from pyspark_ml_features_spark.functions.skew import fan_out
from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

DIM = 64
LSH_SEED = 42
N_PLANES = 4  # 16 buckets — sized for the 500-row test corpus


def _lsh_planes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = LSH_SEED):
    """Fixed random hyperplanes (driver-side constants, seeded). They are
    embedded as literals in both the Spark plan and the oracle SQL, which is
    what makes this LSH deterministic and cross-engine exact."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucketize(e: DataFrame, planes=None,
               bucket_col: str = "bucket") -> DataFrame:
    """Add (nrm, bucket) to a (vec_id, emb) frame — THE engine-side
    definition of the hyperplane bucketing and norm, shared by e4b, e112,
    e114, e115, e116, and the replication ladder so the graded batch and
    incremental twins cannot drift (the oracle side is likewise shared via
    the _duckdb_bucket literal builder / surface12._semantic_cc_ctes).
    Moved here from surface12.py (ADVICE r12): one definition next to
    _lsh_planes instead of per-query copies of the bucket loop.

    `planes`/`bucket_col` default to the single-band form every pre-r13
    caller uses (identical expressions — the graded plans are unchanged);
    e116's OR-banding passes per-band plane sets so multiple bucket
    columns come from this one loop."""
    if "nrm" not in e.columns:
        e = e.withColumn("nrm", l2_norm(F.col("emb")))
    bucket = None
    for p, plane in enumerate(_lsh_planes() if planes is None else planes):
        plane_col = F.array(*[F.lit(v) for v in plane])
        bit = (F.when(adot(plane_col, F.col("emb")) >= 0, F.lit(1 << p))
               .otherwise(F.lit(0)))
        bucket = bit if bucket is None else bucket + bit
    return e.withColumn(bucket_col, bucket.cast("bigint"))


def _pair_cos(e1: str = "e1", e2: str = "e2",
              n1: str = "n1", n2: str = "n2"):
    """The rounded-cosine pair predicate column — ONE definition of the
    left-fold dot arithmetic and the 6-dp rounding for every
    similarity/semantic-dedup query (e4b/e4c/e58/e112/e114). Column names
    are parameters so the query-vs-corpus shape (qemb/qnrm) shares the
    same expression as the symmetric pair shape (e1/e2)."""
    return F.round(adot(F.col(e1), F.col(e2))
                   / (F.col(n1) * F.col(n2)), 6)


@register(
    "e5_embedding_normalize",
    oracle=f"""
WITH e AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS emb,
           {duckdb_norm('(embedding::DOUBLE[])', DIM)} AS l2_norm
    FROM embeddings
)
SELECT vec_id, label, l2_norm, i - 1 AS dim, emb[i] / l2_norm AS unit_value
FROM e, unnest(range(1, len(emb) + 1)) AS t(i)
""",
    tags=("north-star", "E5", "similarity"),
)
def e5_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + unit normalization of the embedding column — pure map work
    via higher-order functions, bit-exact across engines (deterministic fold,
    IEEE sqrt/div). Output is the exploded (vec_id, label, l2_norm, dim,
    unit_value) form — array cells break the harness canonicalizer."""
    e = table(spark, sf_dir, "embeddings")
    emb = to_double_array("embedding")
    # Two-step select: materialize the norm in the Generate's CHILD
    # projection. A single select(norm, posexplode(...)) plans the fold in
    # the Project ABOVE the Generate — i.e. re-evaluated per exploded row
    # (64x per vector); measured 5x slower at sf0.1.
    pre = e.select("vec_id", "label", l2_norm(emb).alias("l2_norm"),
                   emb.alias("emb"))
    exploded = pre.select(
        "vec_id", "label", "l2_norm",
        F.posexplode("emb").alias("dim", "value"))
    return exploded.select(
        "vec_id", "label", "l2_norm", "dim",
        (F.col("value") / F.col("l2_norm")).alias("unit_value"))


_KNN_ORACLE = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           {duckdb_norm('(embedding::DOUBLE[])', DIM)} AS nrm
    FROM embeddings
), q AS (
    SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM e
    WHERE vec_id % 50 = 0
), pairs AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round({duckdb_dot('q.qemb', 'e.emb', DIM)} / (q.qnrm * e.nrm), 6) AS cosine
    FROM q, e
    WHERE q.query_id <> e.vec_id
), ranked AS (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM pairs
)
SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= 5
"""


@register("e4_knn_cosine", oracle=_KNN_ORACLE,
          tags=("north-star", "E4", "similarity", "headline"))
def e4_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for a deterministic query subset
    (vec_id % 50 = 0). The query side is broadcast; norms are precomputed
    per side so the corpus scan computes one fold per (query, row)."""
    # fan_out: one 64-element fold per (query, corpus-row) pair is the
    # CPU wall; the single-row-group scan otherwise runs every fold on
    # one task (no-op on a multi-split cluster scan). The query subset is
    # derived from the PRE-fan_out frame (ADVICE r13): the tiny broadcast
    # lineage must not pay the repartition exchange, only the corpus does.
    base = (table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb"))
        .withColumn("nrm", l2_norm(F.col("emb"))))
    q = (base.filter(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm")))
    e = fan_out(base, "vec_id")
    pairs = (e.crossJoin(F.broadcast(q))
             .filter(F.col("query_id") != F.col("vec_id"))
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(adot(F.col("qemb"), F.col("emb"))
                             / (F.col("qnrm") * F.col("nrm")), 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5).select("query_id", "neighbor_id", "cosine"))


def _duckdb_bucket(emb: str, planes=None) -> str:
    """Oracle-side twin of _bucketize: the same plane literals, the same
    sign-bit sum. `planes` defaults to the single-band set (pre-r13
    callers unchanged); e116 passes per-band sets."""
    if planes is None:
        planes = _lsh_planes()
    bits = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(v) for v in plane) + "]"
        bits.append(f"(CASE WHEN {duckdb_dot(arr, emb, DIM)} >= 0 "
                    f"THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


@register(
    "e4b_lsh_bucket_knn",
    oracle=f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           {duckdb_norm('(embedding::DOUBLE[])', DIM)} AS nrm,
           ({_duckdb_bucket('(embedding::DOUBLE[])')}) AS bucket
    FROM embeddings
), q AS (
    SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm, bucket FROM e
    WHERE vec_id % 50 = 0
), pairs AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round({duckdb_dot('q.qemb', 'e.emb', DIM)} / (q.qnrm * e.nrm), 6) AS cosine
    FROM q JOIN e USING (bucket)
    WHERE q.query_id <> e.vec_id
), ranked AS (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM pairs
)
SELECT query_id, neighbor_id, cosine FROM ranked WHERE rn <= 5
""",
    tags=("north-star", "E4", "similarity"),
)
def e4b_lsh_bucket_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH: bucket = sign bits of
    4 fixed seeded hyperplanes, candidates = same-bucket rows only, exact
    cosine within bucket. Deterministic (planes are literals) → exact
    oracle. At scale the bucket join replaces the O(|Q|·n) cross join with
    O(|Q|·n/2^p) and shuffles on the bucket key."""
    e = _bucketize(table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")))
    q = (e.filter(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
                 F.col("nrm").alias("qnrm"), "bucket"))
    pairs = (e.join(F.broadcast(q), "bucket")
             .filter(F.col("query_id") != F.col("vec_id"))
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     _pair_cos("qemb", "emb", "qnrm", "nrm").alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5).select("query_id", "neighbor_id", "cosine"))


@register(
    "e4c_embedding_near_dup",
    oracle=f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           {duckdb_norm('(embedding::DOUBLE[])', DIM)} AS nrm
    FROM embeddings WHERE vec_id % 5 = 0
)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       round({duckdb_dot('a.emb', 'b.emb', DIM)} / (a.nrm * b.nrm), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round({duckdb_dot('a.emb', 'b.emb', DIM)} / (a.nrm * b.nrm), 6) >= 0.3
""",
    tags=("north-star", "dedup", "similarity"),
)
def e4c_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.3) on a
    deterministic 20% sample — the semantic-dedup ground truth; the LSH
    bucketing of e4b is its scale path."""
    e = (table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") % 5 == 0)
         .select("vec_id", to_double_array("embedding").alias("emb")))
    e = e.withColumn("nrm", l2_norm(F.col("emb")))
    a = e.select(F.col("vec_id").alias("v1"), F.col("emb").alias("e1"),
                 F.col("nrm").alias("n1"))
    b = e.select(F.col("vec_id").alias("v2"), F.col("emb").alias("e2"),
                 F.col("nrm").alias("n2"))
    return (a.join(F.broadcast(b), F.col("v1") < F.col("v2"))
            .select("v1", "v2", _pair_cos().alias("cosine"))
            .filter(F.col("cosine") >= 0.3))


@register("e4d_ivf_knn", tags=("north-star", "E4", "similarity", "approx"))
def e4d_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: seeded KMeans (k=8) partitions the corpus into
    cells; each query probes its nprobe=3 nearest cells (by centroid
    distance), exact cosine within. Rows-only (centroids are iterative-fit
    artifacts); recall vs the exact e4 baseline is asserted in
    tests/test_invariants.py. At 100 TB the cell id is a partition key: each
    query touches nprobe/k of the corpus, and the centroid table (k rows)
    lives as broadcast literals in the plan."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nprobe = 3
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb"))
    vecs = e.withColumn("features", array_to_vector("emb"))
    model = KMeans(k=8, seed=LSH_SEED, featuresCol="features").fit(vecs)
    cells = model.transform(vecs).select(
        "vec_id", "emb", F.col("prediction").alias("cell"))
    cells = cells.withColumn("nrm", l2_norm(F.col("emb"))).cache()
    centroids = [c.tolist() for c in model.clusterCenters()]

    def _sqdist(center: list[float]):
        diff = F.zip_with(F.array(*[F.lit(v) for v in center]), F.col("qemb"),
                          lambda c, x: (c - x) * (c - x))
        return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)

    cell_rank = F.array(*[
        F.struct(_sqdist(c).alias("d"), F.lit(i).alias("cell"))
        for i, c in enumerate(centroids)])
    q = (cells.filter(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"),
                 F.col("nrm").alias("qnrm"))
         .withColumn("probe",
                     F.explode(F.slice(F.array_sort(cell_rank), 1, nprobe)))
         .select("query_id", "qemb", "qnrm",
                 F.col("probe.cell").alias("cell")))
    pairs = (cells.join(F.broadcast(q), "cell")
             .filter(F.col("query_id") != F.col("vec_id"))
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(adot(F.col("qemb"), F.col("emb"))
                             / (F.col("qnrm") * F.col("nrm")), 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5).select("query_id", "neighbor_id", "cosine"))


_MAX_ABS_DUCK = ("list_reduce(list_prepend(0.0::DOUBLE, "
                 "list_transform(embedding::DOUBLE[], x -> abs(x))), "
                 "(acc, x) -> greatest(acc, x))")

_Q8_KNN_ORACLE = f"""
WITH m AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb, {_MAX_ABS_DUCK} AS ma
    FROM embeddings
), z AS (
    SELECT vec_id,
           list_transform(emb, x -> round(x * 127.0 / ma)) AS q8
    FROM m
), n AS (
    SELECT vec_id, q8, {duckdb_norm('q8', DIM)} AS nrm FROM z
), q AS (
    SELECT vec_id AS query_id, q8 AS qq8, nrm AS qnrm FROM n
    WHERE vec_id % 50 = 0
), pairs AS (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           round({duckdb_dot('q.qq8', 'n.q8', DIM)} / (q.qnrm * n.nrm), 6)
               AS cosine_q8
    FROM q, n
    WHERE q.query_id <> n.vec_id
), ranked AS (
    SELECT query_id, neighbor_id, cosine_q8,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_q8 DESC, neighbor_id ASC) AS rn
    FROM pairs
)
SELECT query_id, neighbor_id, cosine_q8 FROM ranked WHERE rn <= 5
"""


@register("e4e_int8_knn", oracle=_Q8_KNN_ORACLE,
          tags=("north-star", "E4", "similarity", "quantization"))
def e4e_int8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors over int8-QUANTIZED embeddings (e15's
    symmetric per-vector quantization feeding e4's broadcast top-k): the
    memory-bound retrieval configuration — 8× smaller vectors, integer
    dot products (|q| ≤ 127, 64 dims → Σ ≤ 2^20, exact in double), cosine
    from the quantized vectors themselves. Deterministic end to end, so
    the whole quantized pipeline carries an exact oracle; recall@5 vs the
    float path (e4) is pinned in tests/test_invariants.py — the accuracy
    cost of the 8× compression is a measured, regression-guarded number.

    100 TB: same plan as e4 (query side broadcast, corpus never shuffles)
    but the corpus scan reads 64 B/vector instead of 512 B — at this scan-
    bound regime the compression IS the speedup; at billion-vector scale
    compose with e4b's bucketing (quantize within buckets)."""
    # fan_out: quantization + norm folds + one 64-element integer dot
    # per (query, corpus-row) pair all serialize on the unsplittable
    # single-row-group scan otherwise. The query subset quantizes off the
    # PRE-fan_out frame (ADVICE r13): identical expressions, so values
    # match bit-for-bit, but the tiny broadcast lineage skips the exchange.
    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb"))
    ma = F.aggregate(F.transform(F.col("emb"), lambda x: F.abs(x)),
                     F.lit(0.0), lambda acc, x: F.greatest(acc, x))

    def _quantized(e: DataFrame) -> DataFrame:
        # two-step selects: materialize ma, then q8, then its norm, so no
        # fold re-evaluates downstream (the e5 Generate lesson applies to
        # joins too)
        z = (e.withColumn("ma", ma)
             .select("vec_id", F.transform(
                 F.col("emb"),
                 lambda x: F.round(x * 127.0 / F.col("ma"))).alias("q8")))
        return z.select("vec_id", "q8", l2_norm(F.col("q8")).alias("nrm"))

    n = _quantized(fan_out(base, "vec_id"))
    q = (_quantized(base).filter(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("q8").alias("qq8"), F.col("nrm").alias("qnrm")))
    pairs = (n.crossJoin(F.broadcast(q))
             .filter(F.col("query_id") != F.col("vec_id"))
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(adot(F.col("qq8"), F.col("q8"))
                             / (F.col("qnrm") * F.col("nrm")), 6)
                      .alias("cosine_q8")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_q8"), F.asc("neighbor_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("query_id", "neighbor_id", "cosine_q8"))


@register(
    "e48_centroid_outliers",
    oracle="""
WITH ex AS (
    SELECT vec_id, label, unnest(range(0, len(embedding))) AS pos,
           unnest(embedding) AS val
    FROM embeddings
), cent AS (
    SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos
)
SELECT ex.vec_id, ex.label,
       round(sum((ex.val - cent.c) * (ex.val - cent.c)), 6) AS dist2
FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
GROUP BY ex.vec_id, ex.label
""",
    tags=("north-star", "E4", "similarity", "quality", "outlier"),
)
def e48_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding OUTLIER scoring: per-label centroid (per-dimension mean
    over the exploded (label, pos) space) and each vector's squared L2
    distance to its own centroid — the embedding-space quality gate that
    flags mislabeled/degenerate vectors before they poison training
    (downstream keeps dist2 below a percentile cut, e.g. b6's machinery).
    Distances are summed per vector and rounded to 6 dp on both engines —
    the repo's cross-row double-sum convention (the per-dim mean is a
    cross-row aggregate, so unlike e4's per-row folds it is not bit-stable
    unrounded; round(6) absorbs the last-ulp divergence).

    100 TB: the exploded aggregate is (|labels| × 64) rows — map-side
    combinable and broadcast back for the distance join (same join-back
    shape as d77/e11); the corpus shuffles once on (label, pos) partials
    and once per-vector, both uniformly keyed."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", "label",
                    F.posexplode("embedding").alias("pos", "val"))
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    diff = F.col("val") - F.col("c")
    return (ex.join(F.broadcast(cent), ["label", "pos"])
            .groupBy("vec_id", "label")
            .agg(F.round(F.sum(diff * diff), 6).alias("dist2")))
