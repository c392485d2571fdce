"""Multimodal column operators (SURVEY §2-E E6 + the binary-payload
plumbing for image/audio/video feature extraction).

Design: media lives in opaque ``binary`` columns with typed metadata columns
beside them; decode / feature-extract runs as Arrow-batched ``mapInPandas``
over partitions sized by ``spark.sql.files.maxPartitionBytes`` so a 100 TB
media corpus streams batch-by-batch through Python without ever
materializing a partition in memory. The decode step itself is stubbed
(media codecs aren't in this container — see :func:`decode_image`); the
Spark-side plumbing (schema, batching, partitioning) is real and the
hash/length extraction path has an exact oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table


@register(
    "e6_multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       e.label AS emb_label,
       len(e.embedding) AS emb_dim
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
    tags=("north-star", "E6", "multimodal"),
)
def e6_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings into one multimodal row (text + vector +
    metadata). Both sides hash-partition on the shared key at scale; here
    the smaller side broadcasts automatically under AQE."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return (d.join(e, d.doc_id == e.vec_id)
            .select("doc_id", "lang", "source", "n_chars",
                    F.col("label").alias("emb_label"),
                    F.size("embedding").alias("emb_dim")))


_BINARY_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("md5_hex", StringType()),
])


def extract_binary_features(df: DataFrame, id_col: str = "doc_id",
                            payload_col: str = "payload") -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over a binary column:
    byte length + md5. This is the template every media extractor follows —
    swap the per-batch body for image decode / audio fingerprint / frame
    sampling; the batching, schema contract, and partition flow stay put."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "byte_len": pdf[payload_col].map(len).astype("int64"),
                "md5_hex": pdf[payload_col].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return df.mapInPandas(_extract, schema=_BINARY_FEATURES_SCHEMA)


@register(
    "e12_binary_features",
    oracle="""
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS byte_len,
       md5(text) AS md5_hex
FROM documents
""",
    tags=("north-star", "multimodal", "udf"),
)
def e12_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, oracle-checked end to end: utf-8 payload →
    mapInPandas (Arrow batches) → byte length + md5. Proves the Python
    extraction path produces byte-identical results to engine-native
    hashing."""
    d = table(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_binary_features(payload)


# --- stubbed media decode (codecs not present in this environment) ---------

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_channels", LongType()),
    StructField("mean_luma", LongType()),
])


def decode_image(payload: bytes) -> "object":
    """Real image decode requires PIL/opencv — not in this container.
    The deterministic fake below keeps the pipeline testable; swap this
    function for a real decoder in deployment."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "use fake_decode_image for pipeline testing")


def fake_decode_image(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in: derives (width, height, channels, mean_luma)
    from the payload bytes so the downstream plumbing is fully exercised."""
    n = len(payload)
    return (64 + n % 64, 64 + (n // 64) % 64, 3, sum(payload[:16]) % 256)


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           decoder=fake_decode_image) -> DataFrame:
    """mapInPandas image feature extraction — same batch shape as a real
    decoder would use (one row per image, metadata columns out)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[payload_col].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": decoded.map(lambda d: d[0]).astype("int64"),
                "height": decoded.map(lambda d: d[1]).astype("int64"),
                "n_channels": decoded.map(lambda d: d[2]).astype("int64"),
                "mean_luma": decoded.map(lambda d: d[3]).astype("int64"),
            })

    return df.mapInPandas(_extract, schema=IMAGE_FEATURES_SCHEMA)


@register("e13_image_features_stub", tags=("north-star", "multimodal", "stub"))
def e13_image_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction with the deterministic fake decoder —
    rows-only check (the fake's outputs are engine-reproducible but a SQL
    oracle for a stub adds nothing; the real assertion is the plumbing)."""
    d = table(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_image_features(payload)
