"""Unit tests for the pure-stdlib full-pixel PNG codec (no Spark needed):
synth → decode must reproduce the generating formula exactly across sizes
that exercise every scanline filter type, chunk CRCs must be verified, and
the decode_image dispatch must be real on both codec-free formats."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_ml_features_spark.operators.multimodal import (
    decode_bmp_pixels,
    decode_image,
    decode_image_auto,
    decode_png,
    fake_decode_image,
    synth_bmp,
    synth_png,
    synth_png_header,
)


def _formula(doc_id: int, w: int, h: int) -> np.ndarray:
    x = np.arange(w)
    y = np.arange(h)
    return ((x[None, :] * 7 + y[:, None] * 13 + doc_id) % 256).astype("uint8")


@pytest.mark.parametrize("doc_id", [0, 1, 7, 123456789])
@pytest.mark.parametrize("w,h", [(1, 1), (5, 4), (8, 6), (64, 48), (3, 11)])
def test_png_roundtrip_exact(doc_id, w, h):
    px = decode_png(synth_png(doc_id, w, h))
    assert px.shape == (h, w)
    assert (px == _formula(doc_id, w, h)).all()


def test_png_all_five_filters_exercised():
    # h >= 5 guarantees scanlines with filter types 0..4 (y % 5 cycling);
    # a decoder mishandling any one of them breaks the round-trip above,
    # this pins that the fixture actually EMITS all five.
    import zlib

    payload = synth_png(3, 6, 10)
    # IDAT body: after signature(8) + IHDR chunk(8+13+4), chunk header(8)
    idat_len = int.from_bytes(payload[33:37], "big")
    raw = zlib.decompress(payload[41:41 + idat_len])
    ftypes = {raw[y * 7] for y in range(10)}  # stride = w+1 = 7
    assert ftypes == {0, 1, 2, 3, 4}


def test_png_crc_verified():
    corrupted = bytearray(synth_png(9, 6, 5))
    corrupted[45] ^= 0xFF  # inside the IDAT chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))


def test_png_rejects_unsupported_shape():
    # header-only fixture (no IDAT): geometry parses, pixels don't exist
    with pytest.raises(ValueError):
        decode_png(synth_png_header(4, 4, bit_depth=8, color_type=2))


def test_png_truncated_payload_is_value_error():
    # every truncation point must surface as the documented ValueError,
    # never a leaked struct.error or zlib.error
    payload = synth_png(3, 6, 5)
    # cuts inside the IEND trailer (last 12 bytes) leave a complete IDAT
    # and decode fine; every cut that loses pixel/header bytes must raise
    for cut in range(9, len(payload) - 12):
        with pytest.raises(ValueError):
            decode_png(payload[:cut])
    assert decode_png(payload).shape == (5, 6)


def test_bm_prefixed_text_is_not_a_bmp():
    # text that merely starts with 'BM' must not parse as garbage geometry
    from pyspark_ml_features_spark.operators.multimodal import (
        parse_image_header)

    with pytest.raises(ValueError):
        parse_image_header(b"BMW drivers wrote this forty-byte document")
    # and the auto ladder lands on the fake, not a misparse
    got = decode_image_auto(b"BMW drivers wrote this forty-byte document")
    assert got == fake_decode_image(
        b"BMW drivers wrote this forty-byte document")


def test_decode_image_png_real_luma():
    doc_id, w, h = 11, 5, 4
    width, height, n_ch, luma = decode_image(synth_png(doc_id, w, h))
    grey = _formula(doc_id, w, h).astype("int64")
    assert (width, height, n_ch) == (w, h, 1)
    assert luma == int(grey.sum()) // (w * h)


def test_decode_image_bmp_real_luma():
    payload = synth_bmp(5, 7, 4)
    px = decode_bmp_pixels(payload)
    assert px.shape == (4, 7, 3)
    width, height, n_ch, luma = decode_image(payload)
    assert (width, height, n_ch) == (7, 4, 3)
    assert luma == int(px.astype("int64").sum()) // (7 * 4 * 3)


def test_decode_image_refuses_non_codec_free():
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=60, deadline=None)
    @given(
        grey=arrays("int64", st.tuples(st.integers(1, 24),
                                       st.integers(1, 24)),
                    elements=st.integers(0, 255)),
        offset=st.integers(0, 4),
    )
    def test_encode_decode_roundtrip_random_images(grey, offset):
        """Property: encode→decode is the identity for ARBITRARY pixel
        content (not just the formula fixtures), at every filter-schedule
        rotation — catches filter math that happens to cancel on smooth
        gradients."""
        from pyspark_ml_features_spark.operators.multimodal import (
            encode_png_grey)

        px = decode_png(encode_png_grey(grey, offset))
        assert px.shape == grey.shape
        assert (px == grey.astype("uint8")).all()
except ImportError:  # pragma: no cover — hypothesis ships in this env
    pass


def test_auto_ladder_full_then_header_then_fake():
    # rung 1: decodable PNG → real pixels
    full = decode_image_auto(synth_png(2, 5, 4))
    assert full == decode_image(synth_png(2, 5, 4))
    # rung 2: header-only PNG → real geometry, fake luma
    hdr = decode_image_auto(synth_png_header(256, 128))
    assert hdr[:3] == (256, 128, 3)
    # rung 3: non-image → fake
    text = b"some document bytes"
    assert decode_image_auto(text) == fake_decode_image(text)
