#!/usr/bin/env python
"""Semantic-dedup chain blow-up ladder — the SCALE TIER r12 row for
e112_semantic_dedup_chain (LSH bucket → within-bucket cosine pairs →
min-label CC → per-vector disposition; operators/surface12.py).

Replication is a GRAPH BLOW-UP, not a disjoint copy: replica k shifts
vec_id by k·10^7 but keeps the embedding IDENTICAL, so every vector's K
copies share a bucket and pair at cosine 1.0. The tier-K pair graph is
therefore the base graph's K-blow-up (each node → a K-clique, base
adjacency inherited across all copy pairs), which makes the right
answers exactly predictable:

 - cluster COUNT is CONSTANT across tiers (components of a blow-up are
   the base components);
 - the cluster-size multiset at tier K equals the base multiset scaled
   elementwise by K — an end-to-end exactness pin through bucketing,
   the rounded-cosine pair predicate, and the CC fixpoint;
 - 'kept' rows = cluster count, constant;
 - within-bucket CANDIDATES grow ~K² (bucket sizes grow ×K) — the
   measured demonstration of WHY the bucket count p is the scale knob:
   at fixed p, doubling the corpus quadruples the pair work, so real
   deployments grow p with n (2^20 buckets at 100 TB), which this
   ladder's fixed p=4 deliberately does not, to expose the K² shape.

Usage: cd /tmp && python /root/repo/scripts/stress_semantic_dedup.py
Pinned row in BASELINE.md ("SCALE TIER r12: semantic-dedup blow-up").
"""

from __future__ import annotations

import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SHIFT = 10_000_000


def vecs(spark: SparkSession, replicas: int):
    from pyspark_ml_features_spark.functions.arrays import to_double_array

    e = (spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
         .select("vec_id", to_double_array("embedding").alias("emb")))
    if replicas == 1:
        return e
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    return (e.crossJoin(reps)
            .select((F.col("vec_id") + F.col("rep") * SHIFT)
                    .alias("vec_id"), "emb"))


def run_tier(spark: SparkSession, k: int):
    from pyspark_ml_features_spark.operators.surface12 import (
        semantic_dedup_disposition,
    )

    e = vecs(spark, k)
    t0 = time.time()
    out = semantic_dedup_disposition(e).cache()
    n_rows = out.count()
    wall = round(time.time() - t0, 2)
    # bucket histogram -> candidate count (arithmetic, no pair join)
    cand = sum(b * (b - 1) // 2 for (b,) in
               out.groupBy("bucket").count()
                  .select("count").collect())
    kept = out.filter(F.col("stage") == "kept").count()
    sizes = Counter(
        r["cluster_size"]
        for r in out.filter(F.col("stage") == "kept")
        .select("cluster_size").collect())
    out.unpersist()
    return n_rows, cand, kept, sizes, wall


def main() -> None:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base_sizes: Counter | None = None
    print(f"{'tier':>5} {'vecs':>7} {'candidates':>11} {'clusters':>9} "
          f"{'wall_s':>7}  multiset-xK")
    for k in (1, 5, 10):
        n_rows, cand, kept, sizes, wall = run_tier(spark, k)
        if k == 1:
            base_sizes = sizes
            ok = "base"
        else:
            expected = Counter({s * k: c for s, c in base_sizes.items()})
            ok = str(expected == sizes)
        print(f"{'x' + str(k):>5} {n_rows:>7} {cand:>11} {kept:>9} "
              f"{wall:>7}  {ok}")
    spark.stop()


if __name__ == "__main__":
    main()
