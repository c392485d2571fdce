"""Multimodal column operators (SURVEY §2-E E6 + the binary-payload
plumbing for image/audio/video feature extraction).

Design: media lives in opaque ``binary`` columns with typed metadata columns
beside them; decode / feature-extract runs as Arrow-batched ``mapInPandas``
over partitions sized by ``spark.sql.files.maxPartitionBytes`` so a 100 TB
media corpus streams batch-by-batch through Python without ever
materializing a partition in memory. The codec-free formats decode for
REAL, full pixels/samples, pure stdlib: PNG (zlib inflate + all-five-
filter defilter, :func:`decode_png`), BMP (:func:`decode_bmp_pixels`),
WAV/PCM (:func:`parse_wav_features`) — each with an exact arithmetic
oracle. Formats that genuinely need a codec library (JPEG, MP3, H.264)
raise ValueError from :func:`decode_image`; :func:`decode_image_auto`
degrades to header-only parse + a deterministic fake so the plumbing
stays testable on any payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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


# --- real codec-free header parsing ----------------------------------------
# PNG/BMP/GIF geometry lives in fixed-offset header fields — plain struct
# reads, no codec library needed. This is the honest slice of image decode
# that CAN run in this container; pixel decode stays stubbed below.

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → channel count (spec: greyscale, RGB, palette, grey+alpha,
# RGBA).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> tuple[str, int, int, int, int]:
    """Parse (format, width, height, bit_depth, n_channels) from the raw
    header bytes of a PNG / BMP / GIF payload — pure struct reads at the
    offsets the specs fix, no image library.

    PNG: 8-byte signature, then the IHDR chunk (length+type at 8..16, width
    and height big-endian at 16..24, bit depth and color type at 24..26).
    BMP: 'BM' signature, BITMAPINFOHEADER width/height little-endian at
    18..26 (height may be negative for top-down rows), bits-per-pixel at
    28..30. GIF: 'GIF87a'/'GIF89a', logical screen w/h little-endian at
    6..10.
    """
    import struct

    if payload[:8] == PNG_MAGIC:
        width, height = struct.unpack(">II", payload[16:24])
        bit_depth, color_type = payload[24], payload[25]
        return ("png", width, height, bit_depth,
                _PNG_CHANNELS.get(color_type, 0))
    if payload[:2] == b"BM":
        width, height = struct.unpack("<ii", payload[18:26])
        bpp, = struct.unpack("<H", payload[28:30])
        # Plausibility gate (r9 review): text that merely starts with
        # 'BM' would otherwise unpack garbage geometry from its bytes —
        # require a spec-legal bit depth and sane dimensions before
        # trusting the parse.
        if bpp not in (1, 4, 8, 16, 24, 32) or not (
                0 < width <= 1 << 20 and 0 < abs(height) <= 1 << 20):
            raise ValueError("implausible BMP header fields")
        return ("bmp", width, abs(height), bpp, max(1, bpp // 8))
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack("<HH", payload[6:10])
        if width == 0 or height == 0:
            raise ValueError("implausible GIF header fields")
        return ("gif", width, height, 8, 1)
    raise ValueError("unrecognized image format (not PNG/BMP/GIF)")


def synth_png_header(width: int, height: int, bit_depth: int = 8,
                     color_type: int = 2) -> bytes:
    """Byte-exact PNG signature + IHDR chunk (with real CRC32) and no pixel
    data — enough for any header parser, buildable without a codec. Used by
    the e13b fixture builder and the parser unit tests."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (PNG_MAGIC + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def synth_bmp_header(width: int, height: int, bpp: int = 24) -> bytes:
    """14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, no pixel data."""
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, 0,
                       2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40, 0, 0, 14 + 40)
    return file_hdr + info


IMAGE_HEADER_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("bit_depth", LongType()),
    StructField("n_channels", LongType()),
])


@register(
    "e13b_image_header_parse",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       (1 + n_chars % 1024)::BIGINT AS width,
       (1 + doc_id % 768)::BIGINT AS height,
       (CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 24 END)::BIGINT AS bit_depth,
       3::BIGINT AS n_channels
FROM documents
""",
    tags=("north-star", "multimodal", "udf"),
)
def e13b_image_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image header extraction, oracle-checked end to end: build a
    byte-exact PNG or BMP header per document (geometry derived from doc
    columns), push it through the binary column → Arrow mapInPandas path,
    and parse it back with :func:`parse_image_header` (actual struct reads
    of actual header bytes). The DuckDB oracle recomputes the geometry
    arithmetically, so any drift in the builder OR the parser breaks the
    hash. This is the codec-free slice of e13 made honest; pixel decode
    remains the documented stub."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def _build_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                synth_png_header(1 + n % 1024, 1 + int(i) % 768)
                if i % 2 == 0 else
                synth_bmp_header(1 + n % 1024,
                                 # negative height = top-down BMP; the parser
                                 # must abs() it
                                 -(1 + int(i) % 768))
                for i, n in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            parsed = [parse_image_header(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "format": [p[0] for p in parsed],
                "width": pd.Series([p[1] for p in parsed], dtype="int64"),
                "height": pd.Series([p[2] for p in parsed], dtype="int64"),
                "bit_depth": pd.Series([p[3] for p in parsed], dtype="int64"),
                "n_channels": pd.Series([p[4] for p in parsed], dtype="int64"),
            })

    return d.mapInPandas(_build_and_parse, schema=IMAGE_HEADER_SCHEMA)


# --- stubbed media decode (codecs not present in this environment) ---------

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_channels", LongType()),
    StructField("mean_luma", LongType()),
])


def decode_png(payload: bytes) -> "object":
    """REAL full-pixel PNG decode, pure stdlib (zlib inflate + scanline
    defilter — public knowledge, RFC 2083 §6): walk the chunk stream
    verifying every CRC32, require 8-bit greyscale non-interlaced (the
    shape :func:`synth_png` emits; anything else raises, never guesses),
    concatenate IDAT, inflate, then undo the per-scanline filter — all
    five types including Paeth (predictor = whichever of left/up/up-left
    is closest to left+up−up-left). Returns a top-down (h, w) uint8
    numpy array. Closes the historical 'pixel decode is stubbed' gap:
    no codec library is involved."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = None
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(payload):
        length, = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            # keep the documented ValueError contract — unpack_from past
            # the buffer would leak struct.error (r9 review)
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        crc, = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(payload[pos + 4:pos + 8 + length]):
            raise ValueError(f"bad CRC in PNG chunk {ctype!r}")
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, comp, filt,
             interlace) = struct.unpack(">IIBBBBB", data)
            if (bit_depth, color_type, comp, filt, interlace) != (
                    8, 0, 0, 0, 0):
                raise ValueError(
                    "only 8-bit greyscale non-interlaced PNG supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG payload has no IHDR chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # empty/truncated IDAT — keep the documented ValueError contract
        raise ValueError(f"bad PNG pixel stream: {exc}") from exc
    stride = width + 1  # one filter-type byte per scanline
    if len(raw) != height * stride:
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((height, width), dtype="uint8")
    scan = np.frombuffer(raw, dtype="uint8").reshape(height, stride)
    zero_row = np.zeros(width, dtype="uint8")
    # Per-filter reconstruction (left neighbor = already-RECONSTRUCTED
    # byte; bpp = 1 for greyscale-8). None/Sub/Up have NO nonlinear
    # left-dependency and vectorize exactly: Sub's recurrence
    # recon[x] = raw[x] + recon[x-1] (mod 256) IS the uint8 prefix sum,
    # Up is an elementwise wrap-add with the previous reconstructed row
    # (round-10 measured optimization — the former per-pixel loops were
    # the e98/e103 wall). Average/Paeth carry a genuine sequential
    # dependency through a nonlinear predictor, so they stay per-pixel
    # but walk plain bytes (numpy scalar indexing pays ~10× per access).
    for y in range(height):
        ftype = int(scan[y, 0])
        line = scan[y, 1:]
        prev = out[y - 1] if y > 0 else zero_row
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub: mod-256 prefix sum of the raw bytes
            out[y] = np.cumsum(line, dtype=np.uint8)
        elif ftype == 2:  # Up: elementwise wrap-add of the prior row
            out[y] = line + prev
        elif ftype == 3:  # Average
            rec = bytearray(width)
            left = 0
            x = 0
            # zip over plain bytes: one bounds-check pair per pixel
            # instead of two subscript lookups (measured ~10% off the
            # row wall; the recurrence itself — a floor-halved carry
            # chain — is genuinely sequential, see the r11 negative
            # result in DESIGN_SCALE.md "PNG decode floor")
            for r, p in zip(line.tobytes(), prev.tobytes()):
                left = (r + ((left + p) >> 1)) & 0xFF
                rec[x] = left
                x += 1
            out[y] = np.frombuffer(bytes(rec), dtype="uint8")
        elif ftype == 4:  # Paeth
            rec = bytearray(width)
            a = c = 0  # recon left / prev-row left (both 0 at x = 0)
            x = 0
            for r, b in zip(line.tobytes(), prev.tobytes()):
                # |p-a| = |b-c|, |p-b| = |a-c|, |p-c| = |a+b-2c| for
                # p = a+b-c; inlined sign tests beat 3 abs() calls
                pa = b - c
                if pa < 0:
                    pa = -pa
                pb = a - c
                if pb < 0:
                    pb = -pb
                pc = a + b - 2 * c
                if pc < 0:
                    pc = -pc
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                a = (r + pred) & 0xFF
                rec[x] = a
                x += 1
                c = b
            out[y] = np.frombuffer(bytes(rec), dtype="uint8")
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def synth_png(doc_id: int, w: int, h: int, filter_offset: int = 0) -> bytes:
    """Byte-exact full greyscale-8 PNG (signature, IHDR, one deflated
    IDAT, IEND — every chunk with a real CRC32). Pixel at (x, y) is
    ``(x*7 + y*13 + doc_id) % 256`` (the e71 formula family, so an
    arithmetic oracle can recompute any decoded feature), and scanline y
    is encoded with filter type ``(y + filter_offset) % 5`` —
    None/Sub/Up/Average/Paeth all cycle, so a decoder that mishandles
    ANY filter breaks the round-trip. Distinct ``filter_offset`` values
    produce byte-DIFFERENT files with pixel-IDENTICAL content — the
    re-encoded-duplicate fixture e99's content-dedup relies on."""
    import numpy as np

    x = np.arange(w, dtype="int64")
    y = np.arange(h, dtype="int64")
    grey = (x[None, :] * 7 + y[:, None] * 13 + doc_id) % 256
    return encode_png_grey(grey, filter_offset)


def synth_png_brightness(key: int, w: int, h: int, brightness: int) -> bytes:
    """Bounded-brightness render for the perceptual-hash fixture (e101):
    base pattern ``(x*7 + y*13 + key) % 128`` (values 0..127) plus a
    flat ``brightness`` offset (caller keeps it ≤ 128 so nothing wraps
    mod 256) — re-renders of the same content under different exposure,
    the duplicate class aHash groups and exact pixel dedup splits."""
    import numpy as np

    x = np.arange(w, dtype="int64")
    y = np.arange(h, dtype="int64")
    grey = (x[None, :] * 7 + y[:, None] * 13 + key) % 128 + brightness
    return encode_png_grey(grey)


def encode_png_grey(grey: "object", filter_offset: int = 0) -> bytes:
    """Encode a top-down int array (values 0..255) as a real greyscale-8
    PNG, cycling scanline filter type ``(y + filter_offset) % 5``."""
    import struct
    import zlib

    import numpy as np

    h, w = grey.shape
    # All five predictors as whole-image 2D arrays, then one gather by
    # each row's filter type — encode filters read ORIGINAL bytes (not
    # reconstructed), so unlike decode there is no sequential
    # dependency anywhere and the whole filter pass vectorizes
    # (round-10 measured optimization: the former per-row loop spent
    # its wall in ~10 tiny-array numpy calls per 50-byte scanline).
    # Byte-exact with the loop form: identical predictor arithmetic,
    # identical (ftype, filtered-bytes) stream into the same
    # zlib.compress level.
    g = np.asarray(grey, dtype="int64")
    left = np.zeros_like(g)
    left[:, 1:] = g[:, :-1]
    prev = np.zeros_like(g)
    prev[1:] = g[:-1]
    upleft = np.zeros_like(g)
    upleft[1:, 1:] = g[:-1, :-1]
    p = left + prev - upleft
    pa, pb, pc = (np.abs(p - left), np.abs(p - prev), np.abs(p - upleft))
    paeth = np.where((pa <= pb) & (pa <= pc), left,
                     np.where(pb <= pc, prev, upleft))
    preds = np.stack([np.zeros_like(g), left, prev,
                      (left + prev) // 2, paeth])
    ftypes = (np.arange(h) + filter_offset) % 5
    pred = preds[ftypes, np.arange(h)]
    scan = np.empty((h, w + 1), dtype="uint8")
    scan[:, 0] = ftypes
    scan[:, 1:] = (g - pred) % 256
    lines = scan.tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines), 9))
            + chunk(b"IEND", b""))


def decode_bmp_pixels(payload: bytes) -> "object":
    """REAL 24-bit uncompressed BMP pixel decode: un-pad the 4-byte-
    aligned rows, un-flip bottom-up storage, return a top-down
    (h, w, 3) uint8 array in BGR byte order (the format's channel
    order, preserved — callers decide luma weighting)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if (hdr_size, bpp, comp) != (40, 24, 0) or h <= 0:
        raise ValueError("only uncompressed bottom-up 24-bit BMP supported")
    row_bytes = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(payload, dtype="uint8",
                        count=row_bytes * h, offset=data_off)
    return raw.reshape(h, row_bytes)[::-1, :w * 3].reshape(h, w, 3)


def decode_image(payload: bytes) -> tuple[int, int, int, int]:
    """REAL image decode — full pixel reconstruction, no codec library
    and no fake: PNG via :func:`decode_png` (zlib inflate + all-five-
    filter defilter), BMP via :func:`decode_bmp_pixels`. Returns
    (width, height, n_channels, mean_luma) where mean_luma is the
    floor-mean over every pixel-channel byte (exact integer math, so
    arithmetic oracles can recompute it). Raises ValueError on formats
    that genuinely need a codec (JPEG etc.) — honest refusal, not a
    stub."""
    if payload[:8] == PNG_MAGIC:
        px = decode_png(payload)
        h, w = px.shape
        return (w, h, 1, int(px.sum(dtype="int64")) // (w * h))
    if payload[:2] == b"BM":
        px = decode_bmp_pixels(payload)
        h, w, _ = px.shape
        return (w, h, 3, int(px.sum(dtype="int64")) // (w * h * 3))
    raise ValueError("decode_image supports the codec-free formats "
                     "(PNG greyscale-8, BMP 24-bit); got neither")


def fake_decode_image(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in: derives (width, height, channels, mean_luma)
    from the payload bytes so the downstream plumbing is fully exercised."""
    n = len(payload)
    return (64 + n % 64, 64 + (n // 64) % 64, 3, sum(payload[:16]) % 256)


def decode_image_auto(payload: bytes) -> tuple[int, int, int, int]:
    """Real-first decode ladder: (1) full pixel decode via
    :func:`decode_image` when the payload is a decodable PNG/BMP —
    mean_luma is then REAL; (2) header-only parse (geometry is real,
    luma from the deterministic fake) for image payloads whose pixels
    need a codec (GIF, header-only fixtures); (3) the fake for
    non-image payloads (text-bytes fixtures), keeping the plumbing
    testable on any input."""
    import struct
    import zlib

    try:
        return decode_image(payload)
    except (ValueError, struct.error, zlib.error):
        pass
    try:
        _, width, height, _, n_channels = parse_image_header(payload)
        return (width, height, n_channels, fake_decode_image(payload)[3])
    except (ValueError, struct.error):
        return fake_decode_image(payload)


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           decoder=decode_image_auto) -> DataFrame:
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


@register("e13_image_features_stub", tags=("north-star", "multimodal"))
def e13_image_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction through the real-first decode ladder
    (re-pointed r9; the historical name is kept because it is the
    grading identity): MIXED payloads — real full-pixel PNGs for even
    doc_ids (decode_image's zlib+defilter path runs for real), raw text
    bytes for odd ones (the documented fake fallback) — so one query
    exercises every rung of decode_image_auto. Rows-only here; the
    exact-oracle twin for the real path is e98_png_decode."""
    d = table(spark, sf_dir, "documents")

    def _payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [
                    synth_png(int(i), 5 + int(i) % 4, 4 + int(i) % 3)
                    if i % 2 == 0 else t.encode("utf-8")
                    for i, t in zip(pdf["doc_id"], pdf["text"])
                ],
            })

    payload = d.select("doc_id", "text").mapInPandas(
        _payloads, schema="doc_id long, payload binary")
    return extract_image_features(payload)


# --- real audio feature extraction (WAV/PCM is codec-free) ------------------
# A canonical RIFF/WAVE file with 16-bit PCM is plain struct reads + raw
# int16 samples — no codec library involved. Unlike image pixel decode
# (stubbed above), the FULL audio path — header parse AND sample-domain
# features — runs for real in this container.

WAV_SAMPLE_RATE = 16000


def synth_wav(doc_id: int, n_samples: int, period: int,
              amplitude: int = 1000) -> bytes:
    """Byte-exact mono 16-bit PCM WAV: canonical 44-byte RIFF header plus a
    square wave of the given period (samples +A for even blocks, -A for odd).
    Deterministic in (doc_id, n_samples, period) so an arithmetic oracle can
    recompute every downstream feature."""
    import struct

    import numpy as np

    i = np.arange(n_samples)
    samples = np.where((i // period) % 2 == 0, amplitude,
                       -amplitude).astype("<i2")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ",
        16, 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE * 2, 2, 16, b"data",
        len(data))
    return hdr + data


def parse_wav_features(payload: bytes) -> tuple[int, int, int, int, float]:
    """Parse a canonical PCM WAV and compute sample-domain features:
    (sample_rate, n_samples, n_zero_crossings, max_abs, mean_abs). Header
    fields are struct reads at spec offsets; features are vectorized int16
    math over the raw data chunk — real audio analysis, no codec."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (_, _, _, _, fmt_size, audio_fmt, n_channels, sample_rate, _, _,
     bits, _, data_size) = struct.unpack("<4sI4s4sIHHIIHH4sI", payload[:44])
    if (fmt_size, audio_fmt, n_channels, bits) != (16, 1, 1, 16):
        raise ValueError("only canonical mono 16-bit PCM supported")
    samples = np.frombuffer(payload[44:44 + data_size], dtype="<i2")
    signs = np.sign(samples)
    crossings = int(np.count_nonzero(signs[1:] != signs[:-1]))
    abs_s = np.abs(samples.astype("int64"))
    return (sample_rate, len(samples), crossings, int(abs_s.max()),
            float(abs_s.mean()))


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("n_zero_crossings", LongType()),
    StructField("max_abs", LongType()),
    StructField("mean_abs", DoubleType()),
])


@register(
    "e29_audio_features",
    oracle=f"""
SELECT doc_id,
       {WAV_SAMPLE_RATE}::BIGINT AS sample_rate,
       (256 + n_chars % 256)::BIGINT AS n_samples,
       ((256 + n_chars % 256 - 1) // (1 + doc_id % 16))::BIGINT
           AS n_zero_crossings,
       1000::BIGINT AS max_abs,
       1000.0::DOUBLE AS mean_abs
FROM documents
""",
    tags=("north-star", "multimodal", "udf"),
)
def e29_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction, oracle-checked end to end: build a
    byte-exact mono 16-bit PCM WAV per document (square wave whose length
    and period derive from doc columns), push it through the binary-column
    → Arrow ``mapInPandas`` path, then parse the RIFF header AND compute
    sample-domain features (zero crossings, peak, mean |amplitude|) with
    vectorized int16 math over the raw PCM chunk — WAV needs no codec, so
    unlike image pixel decode (e13) nothing here is faked. The DuckDB
    oracle recomputes every feature arithmetically (a period-p square wave
    of n samples crosses zero exactly (n-1)//p times and has |s| = A
    everywhere), so drift in the builder OR the parser breaks the hash.

    100 TB shape: identical to every media extractor here — binary
    payloads stream batch-by-batch through Arrow; output is narrow typed
    metadata; embarrassingly parallel, no shuffle."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def _synth_and_extract(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                parse_wav_features(synth_wav(int(i), 256 + int(n) % 256,
                                             1 + int(i) % 16))
                for i, n in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "sample_rate": pd.Series([f[0] for f in feats],
                                         dtype="int64"),
                "n_samples": pd.Series([f[1] for f in feats], dtype="int64"),
                "n_zero_crossings": pd.Series([f[2] for f in feats],
                                              dtype="int64"),
                "max_abs": pd.Series([f[3] for f in feats], dtype="int64"),
                "mean_abs": pd.Series([f[4] for f in feats],
                                      dtype="float64"),
            })

    return d.mapInPandas(_synth_and_extract, schema=AUDIO_FEATURES_SCHEMA)


# --- video frame sampling (every k-th frame of a raw frame stack) -----------

FRAME_W, FRAME_H = 16, 9          # raw 8-bit greyscale frames
FRAME_SAMPLE_EVERY = 3            # keep frames 0, 3, 6, ...

VIDEO_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("byte_sum", LongType()),
])


def synth_video(doc_id: int, n_frames: int) -> bytes:
    """Raw 'video': n_frames stacked uncompressed 8-bit greyscale frames of
    FRAME_W x FRAME_H, frame f filled with byte value (doc_id + f) % 256 —
    deterministic so the sampler's per-frame reduction has an arithmetic
    oracle."""
    import numpy as np

    f = np.arange(n_frames, dtype="int64")
    frames = ((doc_id + f) % 256).astype("uint8")
    return np.repeat(frames, FRAME_W * FRAME_H).tobytes()


def sample_video_frames(payload: bytes, doc_id: int) -> list:
    """Slice every FRAME_SAMPLE_EVERY-th frame out of the raw stack and
    reduce it (byte sum) — the frame-sampling access pattern a real video
    featurizer uses (decode only the sampled frames), on codec-free raw
    frames."""
    import numpy as np

    stack = np.frombuffer(payload, dtype="uint8")
    n_frames = len(stack) // (FRAME_W * FRAME_H)
    out = []
    for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
        frame = stack[idx * FRAME_W * FRAME_H:(idx + 1) * FRAME_W * FRAME_H]
        out.append((doc_id, idx, int(frame.astype("int64").sum())))
    return out


@register(
    "e30_video_frame_sample",
    oracle=f"""
SELECT doc_id,
       u.f::BIGINT AS frame_idx,
       ({FRAME_W * FRAME_H} * ((doc_id + u.f) % 256))::BIGINT AS byte_sum
FROM documents,
     unnest(range(0, 8 + doc_id % 9, {FRAME_SAMPLE_EVERY})) AS u(f)
""",
    tags=("north-star", "multimodal", "udf"),
)
def e30_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, oracle-checked end to end: build a raw frame
    stack per document (8-16 uncompressed greyscale frames, contents
    derived from doc_id), push it through the binary-column Arrow path,
    slice out every 3rd frame, and reduce each sampled frame (byte sum).
    One input row fans out to one row PER SAMPLED FRAME — the schema shape
    a frame-level training pipeline needs. The DuckDB oracle recomputes
    the sampled indices and frame sums arithmetically, so the slicing
    offsets and the reduction are both hash-verified.

    100 TB shape: frame extraction is embarrassingly parallel mapInPandas
    over binary payloads; only sampled-frame metadata (3 narrow columns)
    leaves Python, never pixels. A real deployment swaps synth_video for
    the container's demuxer and keeps everything else."""
    d = table(spark, sf_dir, "documents").select("doc_id")

    def _synth_and_sample(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                rows.extend(sample_video_frames(
                    synth_video(i, 8 + i % 9), i))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "byte_sum"]).astype("int64")

    return d.mapInPandas(_synth_and_sample, schema=VIDEO_FRAME_SCHEMA)


# --- real image resize (BMP is codec-free: raw padded pixel rows) -----------

RESIZE_OUT = 4  # nearest-neighbor target: RESIZE_OUT x RESIZE_OUT

IMAGE_RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("src_w", LongType()),
    StructField("src_h", LongType()),
    StructField("out_w", LongType()),
    StructField("out_h", LongType()),
    StructField("checksum", LongType()),
])


def synth_bmp(doc_id: int, w: int, h: int) -> bytes:
    """Byte-exact 24-bit uncompressed BMP: real file+info headers, rows
    padded to 4 bytes and stored BOTTOM-UP (the format's quirks, kept so
    the parser has to handle them). Grey pixel value at TOP-DOWN (x, y) is
    ``(x*7 + y*13 + doc_id) % 256`` — deterministic, so every downstream
    resize feature has an arithmetic oracle."""
    import struct

    import numpy as np

    x = np.arange(w, dtype="int64")
    y = np.arange(h, dtype="int64")
    grey = ((x[None, :] * 7 + y[:, None] * 13 + doc_id) % 256).astype("uint8")
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up storage
        row = np.repeat(grey[r], 3).tobytes()  # B=G=R
        rows += row + b"\x00" * (row_bytes - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       row_bytes * h, 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + row_bytes * h, 0, 0, 54)
    return hdr + info + bytes(rows)


def parse_resize_bmp(payload: bytes) -> tuple[int, int, int]:
    """REAL decode + resize on a codec-free format: parse the BMP headers
    (struct reads at spec offsets), un-pad and un-flip the pixel array
    back to top-down, nearest-neighbor it to RESIZE_OUT² (src index =
    dst*src_dim // out — the standard integer mapping), and reduce to a
    position-weighted checksum ``Σ v·(yy·out + xx + 1)`` so any drift in
    padding, row order, or the sampling map breaks the value, not just
    the shape. Returns (src_w, src_h, checksum)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if (hdr_size, bpp, comp) != (40, 24, 0) or h <= 0:
        raise ValueError("only uncompressed bottom-up 24-bit BMP supported")
    row_bytes = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(payload, dtype="uint8",
                        count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, :w * 3:3]  # blue channel (==grey)
    grey = rows[::-1]                              # un-flip to top-down
    sx = (np.arange(RESIZE_OUT, dtype="int64") * w) // RESIZE_OUT
    sy = (np.arange(RESIZE_OUT, dtype="int64") * h) // RESIZE_OUT
    small = grey[np.ix_(sy, sx)].astype("int64")
    weights = (np.arange(RESIZE_OUT * RESIZE_OUT, dtype="int64") + 1
               ).reshape(RESIZE_OUT, RESIZE_OUT)
    return int(w), int(h), int((small * weights).sum())


@register(
    "e71_image_resize",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, xx, yy,
         ((xx * w) // {RESIZE_OUT} * 7 + (yy * h) // {RESIZE_OUT} * 13
          + doc_id) % 256 AS v
  FROM dims,
       UNNEST(range(0, {RESIZE_OUT})) AS tx(xx),
       UNNEST(range(0, {RESIZE_OUT})) AS ty(yy)
)
SELECT doc_id,
       CAST(w AS BIGINT) AS src_w,
       CAST(h AS BIGINT) AS src_h,
       CAST({RESIZE_OUT} AS BIGINT) AS out_w,
       CAST({RESIZE_OUT} AS BIGINT) AS out_h,
       CAST(sum(v * (yy * {RESIZE_OUT} + xx + 1)) AS BIGINT) AS checksum
FROM px GROUP BY doc_id, w, h
""",
    tags=("north-star", "multimodal", "udf", "resize"),
)
def e71_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + RESIZE, oracle-checked end to end — the resize
    slot of the multimodal ladder (e13b headers, e29 audio, e30 frames):
    build a byte-exact 24-bit uncompressed BMP per document (dimensions
    derived from doc_id; padded bottom-up rows — the real format quirks),
    push it through the binary-column → Arrow ``mapInPandas`` path, then
    decode the pixel array and nearest-neighbor it to 4×4 with vectorized
    numpy — BMP needs no codec, so unlike the e13 stub nothing here is
    faked. The DuckDB oracle recomputes the resized checksum purely
    arithmetically (nearest-neighbor of a formula image is the formula at
    the sampled indices), so drift in the builder OR the decoder — a
    padding slip, a forgotten row flip, an off-by-one in the sampling map
    — breaks the hash, not just the row count.

    100 TB shape: identical to every media extractor here — binary
    payloads stream batch-by-batch through Arrow, output is narrow typed
    metadata, embarrassingly parallel, no shuffle; a real JPEG/PNG
    pipeline swaps parse_resize_bmp's body for a codec call behind the
    same schema and batch shape."""
    d = table(spark, sf_dir, "documents").select("doc_id")

    def _synth_and_resize(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                payload = synth_bmp(i, 5 + i % 4, 4 + i % 3)
                w, h, checksum = parse_resize_bmp(payload)
                out.append((i, w, h, RESIZE_OUT, RESIZE_OUT, checksum))
            yield pd.DataFrame(
                out, columns=["doc_id", "src_w", "src_h", "out_w",
                              "out_h", "checksum"]).astype("int64")

    return d.mapInPandas(_synth_and_resize, schema=IMAGE_RESIZE_SCHEMA)


# --- real audio resample (integer decimation on the PCM path) ---------------

RESAMPLE_FACTOR = 2
RESAMPLE_OUT_RATE = WAV_SAMPLE_RATE // RESAMPLE_FACTOR

AUDIO_RESAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("rate_in", LongType()),
    StructField("rate_out", LongType()),
    StructField("n_in", LongType()),
    StructField("n_out", LongType()),
    StructField("crossings_out", LongType()),
    StructField("max_abs_out", LongType()),
])


def resample_wav(payload: bytes) -> bytes:
    """REAL resample on the codec-free path: decode the PCM chunk, take
    every RESAMPLE_FACTOR-th sample (integer decimation — the 16 kHz →
    8 kHz step speech pipelines run), and RE-ENCODE a canonical WAV at the
    reduced rate. Returns bytes so the output is itself a valid media
    payload, not just features."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (_, _, _, _, fmt_size, audio_fmt, n_channels, sample_rate, _, _,
     bits, _, data_size) = struct.unpack("<4sI4s4sIHHIIHH4sI", payload[:44])
    if (fmt_size, audio_fmt, n_channels, bits) != (16, 1, 1, 16):
        raise ValueError("only canonical mono 16-bit PCM supported")
    samples = np.frombuffer(payload[44:44 + data_size], dtype="<i2")
    out = samples[::RESAMPLE_FACTOR]
    rate = sample_rate // RESAMPLE_FACTOR
    data = out.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ",
        16, 1, 1, rate, rate * 2, 2, 16, b"data", len(data))
    return hdr + data


@register(
    "e72_audio_resample",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         256 + n_chars % 256 AS n_in,
         1 + doc_id % 8 AS q
  FROM documents
)
SELECT doc_id,
       {WAV_SAMPLE_RATE}::BIGINT AS rate_in,
       {RESAMPLE_OUT_RATE}::BIGINT AS rate_out,
       CAST(n_in AS BIGINT) AS n_in,
       CAST((n_in + 1) // 2 AS BIGINT) AS n_out,
       CAST(((n_in + 1) // 2 - 1) // q AS BIGINT) AS crossings_out,
       1000::BIGINT AS max_abs_out
FROM p
""",
    tags=("north-star", "multimodal", "udf", "resample"),
)
def e72_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio RESAMPLE, oracle-checked end to end — the audio sibling
    of e71's image resize, completing the media ladder's transform slots:
    per document, build the e29-style square-wave WAV (16 kHz, period
    2q samples with q = 1 + doc_id % 8 — even periods so decimation is
    exact), decode the PCM chunk, DECIMATE by 2 (the 16 kHz → 8 kHz step
    speech pipelines run), re-encode a canonical 8 kHz WAV, and re-parse
    THAT file for its features — so the checked numbers have passed
    through decode → transform → encode → decode, proving the re-encoded
    payload is itself valid. The oracle is pure arithmetic: decimating a
    period-2q square wave yields a period-q square wave of ceil(n/2)
    samples, which crosses zero exactly (ceil(n/2)-1) // q times and
    keeps |s| = 1000 everywhere.

    100 TB shape: identical to the other media extractors — Arrow
    batches, narrow typed output, no shuffle; a real codec pipeline
    swaps the decimator for a polyphase filter behind the same
    schema."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def _synth_resample_verify(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                i, n_in = int(i), 256 + int(n) % 256
                wav = synth_wav(i, n_in, 2 * (1 + i % 8))
                wav2 = resample_wav(wav)
                rate2, n_out, crossings, max_abs, _ = \
                    parse_wav_features(wav2)
                out.append((i, WAV_SAMPLE_RATE, rate2, n_in, n_out,
                            crossings, max_abs))
            yield pd.DataFrame(
                out, columns=["doc_id", "rate_in", "rate_out", "n_in",
                              "n_out", "crossings_out", "max_abs_out"]
            ).astype("int64")

    return d.mapInPandas(_synth_resample_verify,
                         schema=AUDIO_RESAMPLE_SCHEMA)
