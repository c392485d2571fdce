"""Round-9 surface: the real PNG pixel-decode oracle (e98 — the query
that retires the repo's last honest stub; the codec itself lives in
operators/multimodal.py) and polymorphic table-valued functions (d145 —
a UDTF whose OUTPUT SCHEMA is computed from the input table's schema in
``analyze()``, the Spark 4 surface beyond d109's fixed-returnType
table-arg shape).

Registered LAST (queries.py imports this module after surface8) per the
CLAUDE.md rotation contract: post-r08 the backlog is empty, so these
register as the r9 window's backlog head and grade same-round.

Reference: the reference repo (six MLlib utilities,
spark_ml_features.py:1-315) has none of this surface; SURVEY §2-D/E
north-star scope.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (kept for parity with peers)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table

PNG_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_channels", LongType()),
    StructField("mean_luma", LongType()),
    StructField("checksum", LongType()),
])


@register(
    "e98_png_decode",
    oracle="""
WITH dims AS (
  SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, xx, yy, (xx * 7 + yy * 13 + doc_id) % 256 AS v
  FROM dims,
       UNNEST(range(0, 8)) AS tx(xx),
       UNNEST(range(0, 6)) AS ty(yy)
  WHERE xx < w AND yy < h
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(sum(v) // (w * h) AS BIGINT) AS mean_luma,
       CAST(sum(v * (yy * w + xx + 1)) AS BIGINT) AS checksum
FROM px GROUP BY doc_id, w, h
""",
    tags=("north-star", "multimodal", "udf", "png"),
)
def e98_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL full-pixel PNG decode, oracle-checked end to end — the query
    that retires the repo's last stub: build a byte-exact greyscale-8
    PNG per document (pixel (x,y) = (x·7 + y·13 + doc_id) mod 256;
    scanline y encoded with filter type y mod 5, so None/Sub/Up/Average/
    Paeth ALL cycle), push it through the binary-column → Arrow
    ``mapInPandas`` path, and decode it with the pure-stdlib decoder
    (zlib inflate + per-filter reconstruction + chunk-CRC verification —
    multimodal.decode_png). The DuckDB oracle recomputes width, height,
    floor-mean luma, and a position-weighted checksum Σ v·(y·w + x + 1)
    purely arithmetically, so a slip in ANY filter's defilter math, the
    row order, or the deflate framing breaks the hash, not just the row
    count. decode_image (the dispatch the pipeline-facing extractors
    use) produces the 4-tuple half of the output, so the public entry
    point is graded too, not just the inner decoder.

    100 TB shape: identical to e71/e72 — binary payloads stream
    batch-by-batch through Arrow, output is narrow typed metadata,
    embarrassingly parallel, no shuffle; this is the 'image corpus
    feature extraction' slot with the codec now real."""
    import numpy as np

    from pyspark_ml_features_spark.operators.multimodal import (
        decode_image, decode_png, synth_png)

    d = table(spark, sf_dir, "documents").select("doc_id")

    def _synth_and_decode(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            dispatch_checked = False
            for i in pdf["doc_id"]:
                i = int(i)
                payload = synth_png(i, 5 + i % 4, 4 + i % 3)
                # ONE decode per payload (the per-pixel defilter is the
                # dominant cost — r9 review); geometry/luma derive from
                # the pixel array.
                px = decode_png(payload).astype("int64")
                height, width = px.shape
                mean_luma = int(px.sum()) // (width * height)
                if not dispatch_checked:
                    # grade the public dispatch once per batch: it must
                    # agree with the derived values exactly
                    assert decode_image(payload) == (
                        width, height, 1, mean_luma)
                    dispatch_checked = True
                weights = (np.arange(width * height, dtype="int64") + 1
                           ).reshape(height, width)
                out.append((i, width, height, 1, mean_luma,
                            int((px * weights).sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "n_channels",
                              "mean_luma", "checksum"]).astype("int64")

    return d.mapInPandas(_synth_and_decode, schema=PNG_DECODE_SCHEMA)


@register(
    "d145_polymorphic_udtf",
    oracle="""
WITH proj AS (
    SELECT o_orderpriority, o_orderkey,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
SELECT o_orderpriority, o_orderkey, cents,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderkey) AS BIGINT) AS rn
FROM proj
""",
    tags=("engine", "D20", "udf", "udtf", "table-arg", "spark4"),
)
def d145_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC table-valued function (Spark 4): a UDTF with no fixed
    returnType whose ``analyze()`` receives the TABLE argument's schema
    at plan time and computes the output schema from it — here the input
    row plus a ``rn`` partition-sequence column, so ONE registration
    numbers rows of ANY table (`FROM numbered(TABLE(v) PARTITION BY k
    ORDER BY ...)`), where d109's gap_stats was pinned to one shape.
    Eval streams each partition's rows in ORDER BY order through one
    instance; the expanded-form oracle is the row_number window over the
    same unique ordering.

    100 TB: same economics as d109 — PARTITION BY shuffles once on the
    key; the Python boundary is row-at-a-time by API design, so this
    slot is for genuinely sequential per-group logic whose schema must
    follow the input's (generic numbering/diffing/auditing TVFs); a
    fixed-schema vectorizable transform belongs in applyInPandas (d21).
    Reference: no UDF surface in the reference repo
    (spark_ml_features.py:1); SURVEY §2-D20 family."""

    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class Numbered:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(schema=StructType(
                list(t.dataType.fields) + [StructField("rn", LongType())]))

        def __init__(self) -> None:
            self.rn = 0

        def eval(self, row):
            self.rn += 1
            yield (*row, self.rn)

    o = (table(spark, sf_dir, "orders")
         .select("o_orderpriority", "o_orderkey",
                 F.floor(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents")))
    view = f"poly_orders_{os.getpid()}"
    o.createOrReplaceTempView(view)
    spark.udtf.register("numbered", udtf(Numbered))
    return spark.sql(
        f"SELECT * FROM numbered(TABLE({view}) "
        "PARTITION BY o_orderpriority ORDER BY o_orderkey)")


@register(
    "d146_recursive_month_spine",
    oracle="""
WITH RECURSIVE months(m) AS (
    SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
    UNION ALL
    SELECT m + INTERVAL 1 MONTH FROM months
    WHERE m < date_trunc('month', (SELECT max(o_orderdate) FROM orders))
)
SELECT CAST(m AS TIMESTAMP) AS month_start,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
""",
    tags=("engine", "D14", "sql", "recursive-cte", "spark4"),
)
def d146_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4.1 `WITH RECURSIVE`): a gap-free month
    spine whose BOUNDS are data-driven (scalar subqueries over the same
    table anchor and terminate the recursion), left-joined back so
    months with zero orders appear as explicit 0 rows — the calendar-
    densification pattern every time-series rollup needs, previously
    only expressible via sequence()+explode (d49's shape). DuckDB runs
    the IDENTICAL recursive SQL as the oracle. Both engines' DATE +
    INTERVAL yield TIMESTAMP-kind months; the output casts to TIMESTAMP
    explicitly (the d74 date-kind parity rule).

    100 TB: the recursion materializes ~84 month rows (bounded by the
    data's time span, not its volume) — the spine side is trivially
    broadcast; the orders side partial-aggregates per month before the
    exchange. Recursion depth is checked by the engine
    (spark.sql.cteRecursionLevelLimit, default 100) — a spine over a
    century of data would raise, not spin."""
    o = table(spark, sf_dir, "orders")
    view = f"rec_orders_{os.getpid()}"
    o.createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE months(m) AS (
            SELECT date_trunc('month',
                              (SELECT min(o_orderdate) FROM {view}))
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM months
            WHERE m < date_trunc('month',
                                 (SELECT max(o_orderdate) FROM {view}))
        )
        SELECT CAST(m AS TIMESTAMP) AS month_start,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM months LEFT JOIN {view}
             ON date_trunc('month', o_orderdate) = m
        GROUP BY m
    """)


@register(
    "d147_xml_roundtrip",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
""",
    tags=("engine", "D17", "xml", "spark4"),
)
def d147_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML codec (Spark 4 `to_xml`/`from_xml` — the D17 family's third
    semi-structured format after JSON d17 and CSV d141): serialize each
    order row to an XML string, parse it back with an explicit schema,
    and return the parsed fields. Inverse-op oracle (the e95 pattern):
    the oracle is the PLAIN projection of the source columns, so any
    asymmetry between the two codecs — escaping, whitespace handling,
    type coercion — breaks the hash; the XML text itself (whose
    formatting is engine-specific) never crosses the comparison.

    100 TB: both codecs are JVM expression codegen (no Python boundary);
    one narrow projection in, one out — scan-bound, no shuffle."""
    o = (table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_orderpriority",
                 F.floor(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents")))
    xml = o.select(
        "o_orderkey",
        F.to_xml(F.struct("o_orderpriority", "cents")).alias("x"))
    return (xml.select(
        "o_orderkey",
        F.from_xml("x", "o_orderpriority STRING, cents BIGINT").alias("p"))
        .select("o_orderkey", "p.o_orderpriority", "p.cents"))


@register(
    "e99_image_content_dedup",
    oracle="""
WITH d AS (
    SELECT doc_id, doc_id % 64 AS ck, doc_id % 5 AS variant FROM documents
), px AS (
    SELECT ck, w, h, xx, yy, (xx * 7 + yy * 13 + ck) % 256 AS v
    FROM (SELECT DISTINCT ck, 5 + ck % 4 AS w, 4 + ck % 3 AS h FROM d)
         AS dims,
         UNNEST(range(0, 8)) AS tx(xx),
         UNNEST(range(0, 6)) AS ty(yy)
    WHERE xx < w AND yy < h
), ch AS (
    SELECT ck, CAST(sum(v * (yy * w + xx + 1)) AS BIGINT) AS checksum
    FROM px GROUP BY ck, w, h
)
SELECT ch.checksum,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT d.variant) AS BIGINT) AS n_byte_variants
FROM d JOIN ch USING (ck)
GROUP BY ch.checksum
""",
    tags=("north-star", "llm-pipeline", "multimodal", "dedup"),
)
def e99_image_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE exact-dedup by DECODED CONTENT — the media slot of the
    dedup family (E1 hashes text bytes; a byte-hash on media misses
    re-encoded duplicates): every document gets a real PNG whose pixel
    content is keyed on ``doc_id % 64`` but whose ENCODING varies per
    doc (scanline filter schedule rotated by ``doc_id % 5`` — byte-
    different, pixel-identical files, the 'same image, different
    compressor' situation every crawl corpus has). The pipeline decodes
    each payload (full zlib+defilter) and groups on the decoded-pixel
    checksum; ``n_byte_variants`` (distinct md5 count per content
    group, >1 everywhere) is the in-result proof that a byte-level
    dedup would have split these groups. The DuckDB oracle recomputes
    content groups and checksums purely arithmetically.

    100 TB: decode is the embarrassingly-parallel Arrow scan (e98's
    shape); the dedup is one groupBy on a 8-byte checksum — partial
    aggregation bounds the exchange by distinct content, not corpus
    size (e1's economics). For near-dup (not exact) content, the
    checksum slot generalizes to a perceptual hash over the same
    plumbing."""
    import hashlib

    import numpy as np

    from pyspark_ml_features_spark.operators.multimodal import (
        decode_png, synth_png)

    d = table(spark, sf_dir, "documents").select("doc_id")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                ck = i % 64
                payload = synth_png(ck, 5 + ck % 4, 4 + ck % 3,
                                    filter_offset=i % 5)
                px = decode_png(payload).astype("int64")
                h, w = px.shape
                weights = (np.arange(w * h, dtype="int64") + 1
                           ).reshape(h, w)
                out.append((int((px * weights).sum()),
                            hashlib.md5(payload).hexdigest()))
            yield pd.DataFrame(out, columns=["checksum", "byte_md5"])

    decoded = d.mapInPandas(_decode, schema="checksum long, byte_md5 string")
    return (decoded.groupBy("checksum")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.countDistinct("byte_md5").cast("bigint")
                 .alias("n_byte_variants")))


@register(
    "e101_image_ahash_neardup",
    oracle="""
WITH d AS (
    SELECT doc_id, doc_id % 64 AS ck, doc_id % 5 AS bright FROM documents
), px AS (
    -- the 8x8 nearest-neighbor sample of the BASE pattern (brightness
    -- cancels out of the threshold test exactly, so it never appears)
    SELECT ck, yy * 8 + xx AS i,
           ((xx * (16 + ck % 16)) // 8 * 7
            + (yy * (12 + ck % 8)) // 8 * 13 + ck) % 128 AS v
    FROM (SELECT DISTINCT ck FROM d) AS cks,
         UNNEST(range(0, 8)) AS tx(xx),
         UNNEST(range(0, 8)) AS ty(yy)
), tot AS (
    SELECT ck, sum(v) AS s FROM px GROUP BY ck
), bits AS (
    SELECT px.ck, px.i,
           CASE WHEN 64 * px.v > tot.s THEN 1 ELSE 0 END AS b
    FROM px JOIN tot USING (ck)
), hash AS (
    SELECT ck,
           CAST(sum(CASE WHEN i >= 32
                         THEN b * (1::BIGINT << (i - 32)) ELSE 0 END)
                AS BIGINT) AS hash_hi,
           CAST(sum(CASE WHEN i < 32
                         THEN b * (1::BIGINT << i) ELSE 0 END)
                AS BIGINT) AS hash_lo
    FROM bits GROUP BY ck
)
SELECT h.hash_hi, h.hash_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT d.bright) AS BIGINT) AS n_brightness_variants
FROM d JOIN hash h USING (ck)
GROUP BY h.hash_hi, h.hash_lo
""",
    tags=("north-star", "llm-pipeline", "multimodal", "dedup", "neardup"),
)
def e101_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL image hashing (8×8 average-hash) for NEAR-dup grouping
    — where e99's exact content dedup splits on ANY pixel change, aHash
    groups re-renders that differ by a global brightness shift (the
    'same image, different exposure/levels' duplicate class): every doc
    renders its content pattern (keyed on doc_id % 64, values 0..127)
    plus a per-doc brightness offset (16·(doc_id % 5), no wraparound by
    construction), decodes the real PNG, resizes to 8×8 nearest-
    neighbor, and sets bit i = (64·vᵢ > Σv) — an EXACT integer
    threshold: adding c to every pixel adds 64c to both sides, so the
    comparison (and therefore the hash) is brightness-invariant by
    arithmetic, not approximation, which is what makes an exact oracle
    possible for a 'perceptual' operator. The hash packs into
    (hash_hi, hash_lo) 32-bit halves (no BIGINT sign-bit games — the
    simhash64 two's-complement trick not needed). n_brightness_variants
    per group (5 everywhere at sf ≥ 0.01) is the in-result witness
    that exact pixel dedup would have split these groups.

    100 TB: decode+hash is the embarrassingly-parallel Arrow scan; the
    grouping exchange carries 16 bytes per doc and is partial-
    aggregated to distinct-hash cardinality — the banded-LSH economics
    of e2d applied to images. Hamming-radius near-dup (not just
    radius-0) buckets these same halves the e2c band way."""
    import numpy as np

    from pyspark_ml_features_spark.operators.multimodal import (
        decode_png, synth_png_brightness)

    d = table(spark, sf_dir, "documents").select("doc_id")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                ck, bright = i % 64, i % 5
                w, h = 16 + ck % 16, 12 + ck % 8
                # bounded-brightness render: base pattern 0..127 plus
                # 16*bright <= 64 — never wraps mod 256
                payload = synth_png_brightness(ck, w, h, bright * 16)
                px = decode_png(payload).astype("int64")
                sx = (np.arange(8, dtype="int64") * w) // 8
                sy = (np.arange(8, dtype="int64") * h) // 8
                small = px[np.ix_(sy, sx)]
                bits = (64 * small > small.sum()).flatten()
                weights = 1 << np.arange(64, dtype="uint64")
                hash_lo = int((bits[:32] * weights[:32]).sum())
                hash_hi = int((bits[32:] * weights[:32]).sum())
                out.append((i, hash_hi, hash_lo, bright))
            yield pd.DataFrame(
                out, columns=["doc_id", "hash_hi", "hash_lo", "bright"]
            ).astype("int64")

    hashed = d.mapInPandas(
        _hash, schema="doc_id long, hash_hi long, hash_lo long, bright long")
    return (hashed.groupBy("hash_hi", "hash_lo")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.countDistinct("bright").cast("bigint")
                 .alias("n_brightness_variants")))
