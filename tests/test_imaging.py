"""Unit tests for the pure-Python BMP/PPM codec (functions/imaging.py).

Fixtures are hand-assembled byte-for-byte from the public format specs,
so the decoder is checked against the FORMAT, not against the encoder.
"""

from __future__ import annotations

import struct

import pytest

from mit_6_5840_mapreduce_spark.functions.imaging import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)

# a 2x2 image: red, green / blue, white (top-down RGB)
RGB_2X2 = bytes([255, 0, 0, 0, 255, 0,
                 0, 0, 255, 255, 255, 255])


def _hand_bmp_2x2() -> bytes:
    """2x2 24bpp BMP assembled by hand: bottom-up rows, BGR pixels,
    rows padded from 6 to 8 bytes."""
    row_bottom = bytes([255, 0, 0, 255, 255, 255, 0, 0])  # blue,white + pad
    row_top = bytes([0, 0, 255, 0, 255, 0, 0, 0])         # red,green + pad
    data = row_bottom + row_top
    offset = 54
    fh = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    ih = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data),
                     2835, 2835, 0, 0)
    return fh + ih + data


def test_decode_hand_assembled_bmp():
    w, h, rgb = decode_bmp(_hand_bmp_2x2())
    assert (w, h) == (2, 2)
    assert rgb == RGB_2X2


def test_bmp_round_trip_with_padding():
    # width 3 -> raw row 9 bytes, padded to 12: pad path exercised
    rgb = bytes(range(3 * 3 * 3))
    w, h, back = decode_bmp(encode_bmp(rgb, 3, 3))
    assert (w, h) == (3, 3) and back == rgb


def test_bmp_top_down_negative_height():
    payload = bytearray(encode_bmp(RGB_2X2, 2, 2))
    # flip to top-down: negate height, re-order rows accordingly
    struct.pack_into("<i", payload, 14 + 8, -2)
    data = payload[54:]
    payload[54:] = data[8:16] + data[0:8]
    w, h, rgb = decode_bmp(bytes(payload))
    assert (w, h) == (2, 2) and rgb == RGB_2X2


def test_bmp_rejects_unsupported():
    payload = bytearray(encode_bmp(RGB_2X2, 2, 2))
    struct.pack_into("<H", payload, 14 + 14, 32)          # 32 bpp
    with pytest.raises(ValueError, match="24bpp"):
        decode_bmp(bytes(payload))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(52))


def test_decode_ppm_with_comment_and_whitespace():
    payload = b"P6 # comment line\n# another\n 2\t2\n255\n" + RGB_2X2
    w, h, rgb = decode_ppm(payload)
    assert (w, h) == (2, 2) and rgb == RGB_2X2


def test_ppm_round_trip_and_truncation():
    w, h, rgb = decode_ppm(encode_ppm(RGB_2X2, 2, 2))
    assert (w, h) == (2, 2) and rgb == RGB_2X2
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(RGB_2X2, 2, 2)[:-1])


def test_decode_image_sniffs_magic():
    assert decode_image(encode_bmp(RGB_2X2, 2, 2))[2] == RGB_2X2
    assert decode_image(encode_ppm(RGB_2X2, 2, 2))[2] == RGB_2X2
    with pytest.raises(ValueError, match="unsupported image container"):
        decode_image(b"\x89PNG\r\n\x1a\n")
