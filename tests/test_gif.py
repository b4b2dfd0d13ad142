"""Unit + property tests for the GIF/LZW codec (functions/gif.py)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_spark.functions.gif import (
    GRAYSCALE_PALETTE,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _pack_codes(codes_with_sizes):
    """LSB-first bit packer for hand-assembling LZW streams."""
    acc = n = 0
    out = bytearray()
    for code, size in codes_with_sizes:
        acc |= code << n
        n += size
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_hand_assembled_dictionary_codes():
    """Hand-built 2-bit stream: CLEAR, A, B, 6, END. Code 6 was created
    by the A,B pair (entry 'AB'), so the output is A B A B — pins the
    dictionary-rebuild path against a by-the-spec manual trace."""
    codes = [(4, 3), (0, 3), (1, 3), (6, 3), (5, 3)]
    assert lzw_decode(_pack_codes(codes), 2) == bytes([0, 1, 0, 1])


def test_lzw_decode_kwkwk_corner_case():
    """CLEAR, A, 6 — code 6 arrives BEFORE it exists in the table (the
    KwKwK case): it must decode as prev + prev[0] = 'AA'."""
    codes = [(4, 3), (0, 3), (6, 3), (5, 3)]
    assert lzw_decode(_pack_codes(codes), 2) == bytes([0, 0, 0])


def test_lzw_rejects_corrupt_code():
    codes = [(4, 3), (0, 3), (7, 3), (5, 3)]   # 7 is beyond next_code
    with pytest.raises(ValueError, match="corrupt LZW"):
        lzw_decode(_pack_codes(codes), 2)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=2048))
def test_lzw_round_trip_property(data):
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_lzw_round_trip_forces_table_reset():
    """> 4096 distinct phrases forces the encoder's table reset and the
    decoder's mid-stream CLEAR handling."""
    data = bytes(range(256)) * 40                 # 10240 symbols
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_gif_round_trip():
    indices = bytes(range(256)) * 2               # 16 x 32 image
    w, h, rgb = decode_gif(encode_gif(indices, 16, 32, GRAYSCALE_PALETTE))
    assert (w, h) == (16, 32)
    assert rgb[::3] == indices                    # grayscale: r == index
    assert rgb[1::3] == indices and rgb[2::3] == indices


def test_gif_compression_is_real():
    """A repetitive image must compress below 1 byte/pixel — proof the
    encoder emits dictionary codes, so decode rebuilds the dictionary."""
    indices = bytes([7, 7, 7, 7, 8, 8, 8, 8] * 512)   # 4096 px, 16x256
    payload = encode_gif(indices, 16, 256, GRAYSCALE_PALETTE)
    assert len(payload) < 256 * 3 + len(indices) // 2
    assert decode_gif(payload)[2][::3] == indices


def test_gif_skips_extension_blocks():
    base = encode_gif(bytes([1, 2, 3, 4]), 2, 2, GRAYSCALE_PALETTE)
    # splice a graphic-control extension between the GCT and the image
    gct_end = 13 + 256 * 3
    ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    spliced = base[:gct_end] + ext + base[gct_end:]
    w, h, rgb = decode_gif(spliced)
    assert (w, h) == (2, 2) and rgb[::3] == bytes([1, 2, 3, 4])


def test_gif_rejects_unsupported():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG..... ")
    base = bytearray(encode_gif(bytes(4), 2, 2, GRAYSCALE_PALETTE))
    # set the interlace flag in the image descriptor packed byte
    idesc = 13 + 256 * 3
    assert base[idesc] == 0x2C
    base[idesc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(base))


def test_gif_header_fields():
    payload = encode_gif(bytes(range(32)), 16, 2, GRAYSCALE_PALETTE)
    assert payload[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", payload, 6)
    assert (w, h) == (16, 2)
    assert payload.endswith(b"\x00\x3B")
