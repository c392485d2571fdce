"""Round-10 surface: the depth-composition slot (VERDICT r9 item 4) —
an end-to-end curate-shaped pipeline graded by an INVERSE-OP oracle.
The Spark 4 primitive surface is exhausted (SURVEY §8j-next item 4);
the remaining high-value oracle class is COMPOSITIONS: chain several
E-family operators, invert the chain, and let the original corpus be
the oracle — any slip in ANY stage's arithmetic breaks the hash.

Registered LAST (queries.py imports this module after surface9) per the
CLAUDE.md rotation contract: post-r09 the backlog is empty, so these
register as the r10 window's backlog head and grade same-round.

Reference: the reference repo (six MLlib utilities,
spark_ml_features.py:1-315) has none of this surface; SURVEY §2-E
north-star scope (E1 dedup + chunking + packing families composed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.functions.text import tokens
from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

#: bin capacity (tokens) for the packing stage — > CHUNK_SIZE so every
#: chunk fits a bin, small enough that bins mix chunks of many docs
PACK_CAPACITY = 512
#: packing shards: bins are built per shard so the running-total window
#: never globally orders the corpus (the d106 lesson)
PACK_SHARDS = 4


@register(
    "e104_dedup_pack_stitch_roundtrip",
    oracle="""
SELECT doc_id, text AS reconstructed_text
FROM documents
WHERE trim(text) <> ''
""",
    tags=("north-star", "llm-pipeline", "dedup", "chunking", "packing",
          "integration"),
)
def e104_dedup_pack_stitch_roundtrip(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """CURATE-AND-RECONSTRUCT round-trip — four chained E-family stages
    run FORWARD (exact dedup → overlapping chunking → capacity-bounded
    packing) then INVERTED (unpack → stitch → survivorship re-expansion),
    graded against the strongest oracle shape in the repo: the original
    corpus itself (`SELECT doc_id, text FROM documents`). Every
    document's text must come back VERBATIM after riding the whole
    pipeline, so the hash pins, at once:

    - E1 dedup survivorship: canonical doc = min doc_id per EXACT text
      (byte key, not the normalized key — normalization would collapse
      case-variant docs and reconstruct the wrong bytes for members);
      the member list is carried so the inverse can re-expand every
      duplicate, not just the survivor.
    - E23 chunk geometry: 128-token windows at stride 64 (e95's exact
      machinery) — an off-by-one in either direction breaks the hash.
    - E51-family packing losslessness: chunks are assigned to
      capacity-bounded bins by a per-shard running-token-total window
      (the WINDOW-expressible budget partitioning of the packing
      family — e51's true greedy reset fold is the Arrow path; this
      composition stays JVM-pure end to end) and materialized as bin
      rows. A chunk dropped, duplicated, or torn by the pack/unpack
      breaks the hash.
    - e95 stitch arithmetic: every chunk contributes its first `stride`
      tokens, the last chunk all of them.

    100 TB: the dedup exchange carries each DISTINCT text once (e1's
    economics; key by the 64-bit fingerprint in production — e36);
    the pack window orders within shards, never globally (d106's rule);
    per-bin state is capacity-bounded, per-doc stitch state is bounded
    by doc length (e95's bound); the re-expansion is a hash equi-join
    on canon_id. No Python boundary anywhere — born clean under the
    registry-wide scale audit."""
    from pyspark_ml_features_spark.operators.packing import (
        CHUNK_SIZE, CHUNK_STRIDE)

    from pyspark_ml_features_spark.plans.audit import probe_checkpoint

    d = (table(spark, sf_dir, "documents")
         .filter(F.trim(F.col("text")) != "")
         .select("doc_id", "text"))

    # 1. EXACT dedup, one shuffle: survivor + member list per distinct
    # text (collect_list bounded by duplicate multiplicity). The dedup
    # result feeds BOTH the chunk pipeline and the member re-expansion —
    # materialize it ONCE (AQE does not reuse identical exchange
    # subtrees across plan branches, the round-6 e81 finding; without
    # the checkpoint the corpus scans and the dedup shuffle run twice).
    canon = probe_checkpoint(
        d.groupBy("text")
        .agg(F.min("doc_id").alias("canon_id"),
             F.collect_list("doc_id").alias("member_ids")),
        "e104.canon")

    # 2. CHUNK the survivors (e23/e95 geometry).
    surv = canon.select("canon_id", tokens("text").alias("__toks"))
    t = F.col("__toks")
    n_chunks = (F.floor((F.size(t) - 1) / CHUNK_STRIDE) + 1).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(t, i * CHUNK_STRIDE + 1, CHUNK_SIZE))
    chunked = surv.select(
        "canon_id", F.posexplode(chunks).alias("chunk_id", "chunk"))

    # 3. PACK chunks into bins: per-shard running token total → bin id.
    # Bin rows are real materialized containers (collect_list), so the
    # inverse genuinely has to unpack them.
    w = (Window.partitionBy("shard")
         .orderBy("canon_id", "chunk_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (chunked
              .withColumn("shard", F.pmod(F.col("canon_id"),
                                          F.lit(PACK_SHARDS)))
              .withColumn("__n", F.size("chunk").cast("bigint"))
              .withColumn("bin_id",
                          F.floor((F.sum("__n").over(w) - F.col("__n"))
                                  / PACK_CAPACITY))
              .groupBy("shard", "bin_id")
              .agg(F.collect_list(
                  F.struct("canon_id", "chunk_id", "chunk"))
                  .alias("items")))

    # 4. INVERSE — unpack bins, stitch per survivor (e95's arithmetic).
    unpacked = packed.select(F.explode("items").alias("it")).select(
        F.col("it.canon_id").alias("canon_id"),
        F.col("it.chunk_id").alias("chunk_id"),
        F.col("it.chunk").alias("chunk"))
    per_doc = (unpacked.groupBy("canon_id")
               .agg(F.sort_array(F.collect_list(
                   F.struct("chunk_id", "chunk"))).alias("cs"))
               .withColumn("n_cs", F.size("cs")))
    pieces = F.transform(
        F.col("cs"),
        lambda c, i: F.when(i < F.col("n_cs") - 1,
                            F.slice(c["chunk"], 1, CHUNK_STRIDE))
        .otherwise(c["chunk"]))
    stitched = per_doc.select(
        "canon_id", F.concat_ws(" ", F.flatten(pieces)).alias("stitched"))

    # 5. Survivorship re-expansion: every member doc gets its text back.
    members = canon.select("canon_id",
                           F.explode("member_ids").alias("doc_id"))
    return (members.join(stitched, "canon_id")
            .select("doc_id", F.col("stitched").alias("reconstructed_text")))
