#!/usr/bin/env python
"""Graph-family stress tier: measure the near-dup similarity graph's
geometry (edges, wedges, triangles) and the iterative operators' wall time
(3-hop BFS = e56's shape, 5-round PageRank = e60's shape) across corpus
tiers and Jaccard thresholds.

Motivation (recorded in DESIGN_SCALE.md): the synthetic corpus is so
mutually similar that low thresholds produce a NEAR-COMPLETE graph — at
sf0.1, threshold 0.35 yields 438k of 500k possible pairs and 133M wedges,
and BFS/triangle shapes degenerate quadratically. Threshold choice is a
GEOMETRY decision that must be measured, not guessed; the registry's graph
queries pin 0.9.

Usage: cd /tmp && python /root/repo/scripts/stress_graph.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from pyspark_ml_features_spark.functions.text import tokens  # noqa: E402
from pyspark_ml_features_spark.operators.dedup import jaccard_pairs  # noqa: E402
from pyspark_ml_features_spark.operators.graph import (  # noqa: E402
    connected_components,
)


def bfs3(nodes, edges):
    frontier = edges.select("src", F.col("dst").alias("other"))
    dist = frontier.withColumn("d", F.lit(1))
    for k in (2, 3):
        hop = edges.select(F.col("src").alias("hop_src"),
                           F.col("dst").alias("hop_dst"))
        nxt = (frontier.join(hop, frontier["other"] == hop["hop_src"])
               .select(frontier["src"].alias("src"),
                       hop["hop_dst"].alias("other"))
               .filter(F.col("src") != F.col("other"))
               .distinct()
               .join(dist.select("src", "other"), ["src", "other"],
                     "left_anti"))
        dist = dist.unionByName(nxt.withColumn("d", F.lit(k)))
        frontier = nxt
    return dist.groupBy("src").agg(F.count(F.lit(1)).alias("n"))


def pagerank5(nodes, edges):
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    rank = nodes.withColumn("r", F.lit(1.0))
    for _ in range(5):
        contrib = (edges.join(rank, edges["src"] == rank["node"])
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("r") / F.col("deg")).alias("c"))
                   .groupBy("node").agg(F.sum("c").alias("s")))
        rank = (nodes.join(contrib, "node", "left")
                .select("node", F.round(
                    F.lit(0.15) + F.lit(0.85) * F.coalesce("s", F.lit(0.0)),
                    6).alias("r")))
        rank = rank.localCheckpoint(eager=True)
    return rank


def run(spark: SparkSession, sf_dir: str, tier: str, threshold: float,
        heavy: bool) -> None:
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("doc_id") % 5 == 0).select("doc_id", "text"))
    n = d.count()
    prs = (jaccard_pairs(d, tokens("text"), threshold=threshold)
           .select("d1", "d2").localCheckpoint(eager=True))
    m = prs.count()
    p1 = prs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    p2 = prs.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    p3 = prs.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    wedges = p1.join(p2, "b").count()
    tris = p1.join(p2, "b").join(p3, ["a", "c"]).count()
    line = (f"{tier:7s} th={threshold:4.2f} n={n:5d} pairs={m:8,d} "
            f"wedges={wedges:12,d} triangles={tris:10,d}")
    if heavy:
        edges = (prs.select(F.col("d1").alias("src"),
                            F.col("d2").alias("dst"))
                 .unionByName(prs.select(F.col("d2").alias("src"),
                                         F.col("d1").alias("dst"))))
        edges = edges.localCheckpoint(eager=True)
        nodes = d.select(F.col("doc_id").alias("node"))
        t0 = time.time()
        bfs3(nodes.withColumnRenamed("node", "src"), edges).count()
        bfs_s = time.time() - t0
        t0 = time.time()
        pagerank5(nodes, edges).count()
        pr_s = time.time() - t0
        stats: dict = {}
        t0 = time.time()
        connected_components(nodes, edges, stats=stats).count()
        cc_s = time.time() - t0
        line += (f" bfs3={bfs_s:5.1f}s pagerank5={pr_s:5.1f}s "
                 f"cc={cc_s:5.1f}s/{stats['rounds']}r")
    print(line)


def main() -> None:
    from pyspark_ml_features_spark.session import get_spark
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for tier, sf_dir in (("sf0.01", "/root/testdata/sf0.01"),
                         ("sf0.1", "/root/testdata/sf0.1")):
        for th in (0.35, 0.5, 0.9):
            # the near-complete geometries: report volume only (the
            # point is that iterative ops on them are the wrong plan)
            heavy = th == 0.9 or tier == "sf0.01"
            run(spark, sf_dir, tier, th, heavy)


if __name__ == "__main__":
    main()
