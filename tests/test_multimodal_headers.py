"""Unit tests for the codec-free image header parser (no Spark needed):
hand-assembled PNG/BMP/GIF header bytes must round-trip through
``parse_image_header`` with the exact geometry the specs encode."""

from __future__ import annotations

import struct

import pytest

from pyspark_ml_features_spark.operators.multimodal import (
    decode_image_auto,
    fake_decode_image,
    parse_image_header,
    synth_bmp_header,
    synth_png_header,
)


def test_png_header_roundtrip():
    payload = synth_png_header(640, 480, bit_depth=8, color_type=2)
    assert parse_image_header(payload) == ("png", 640, 480, 8, 3)


def test_png_rgba_channels():
    payload = synth_png_header(1, 1, bit_depth=16, color_type=6)
    assert parse_image_header(payload) == ("png", 1, 1, 16, 4)


def test_png_crc_is_real():
    import zlib

    payload = synth_png_header(33, 7)
    length, = struct.unpack(">I", payload[8:12])
    chunk = payload[12:12 + 4 + length]
    crc, = struct.unpack(">I", payload[12 + 4 + length:12 + 4 + length + 4])
    assert crc == zlib.crc32(chunk)


def test_bmp_header_roundtrip():
    payload = synth_bmp_header(800, 600, bpp=24)
    assert parse_image_header(payload) == ("bmp", 800, 600, 24, 3)


def test_bmp_topdown_negative_height():
    payload = synth_bmp_header(320, -200, bpp=32)
    assert parse_image_header(payload) == ("bmp", 320, 200, 32, 4)


def test_gif_header():
    payload = b"GIF89a" + struct.pack("<HH", 101, 55) + b"\x00" * 3
    assert parse_image_header(payload) == ("gif", 101, 55, 8, 1)


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        parse_image_header(b"plain utf-8 text, not an image")


def test_auto_decode_prefers_real_header():
    real = decode_image_auto(synth_png_header(256, 128))
    assert real[:3] == (256, 128, 3)


def test_auto_decode_falls_back_to_fake():
    text = b"some document bytes"
    assert decode_image_auto(text) == fake_decode_image(text)
