"""Unit + property tests for the AVI video codec (functions/video.py)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_spark.functions.video import (
    decode_avi,
    encode_avi,
)

F0 = bytes(range(48))                  # one 4x4 RGB frame
F1 = bytes(reversed(range(48)))


def test_avi_round_trip_two_frames():
    w, h, frames = decode_avi(encode_avi([F0, F1], 4, 4))
    assert (w, h) == (4, 4)
    assert frames == [F0, F1]


def test_avi_round_trip_padded_width():
    """Width 3 -> DIB row 9 bytes padded to 12: pad path exercised."""
    frame = bytes(range(3 * 2 * 3))
    w, h, frames = decode_avi(encode_avi([frame], 3, 2))
    assert (w, h) == (3, 2) and frames == [frame]


def test_avi_rejects_unsupported():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    payload = bytearray(encode_avi([F0], 4, 4))
    # flip the movi frame chunk id to the compressed form '00dc'
    i = payload.find(b"00db")
    payload[i:i + 4] = b"00dc"
    with pytest.raises(ValueError, match="compressed AVI"):
        decode_avi(bytes(payload))
    payload = bytearray(encode_avi([F0], 4, 4))
    j = payload.find(b"strf") + 8 + 14          # biBitCount offset
    struct.pack_into("<H", payload, j, 8)
    with pytest.raises(ValueError, match="24bpp"):
        decode_avi(bytes(payload))


def test_avi_header_reports_frame_count():
    payload = encode_avi([F0, F1, F0], 4, 4)
    i = payload.find(b"avih") + 8
    total_frames = struct.unpack_from("<IIIII", payload, i)[4]
    assert total_frames == 3


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(1, 5), st.data())
def test_avi_round_trip_property(w, h, n, data):
    size = w * h * 3
    frames = [bytes(data.draw(st.binary(min_size=size, max_size=size)))
              for _ in range(n)]
    got_w, got_h, got = decode_avi(encode_avi(frames, w, h))
    assert (got_w, got_h) == (w, h) and got == frames
