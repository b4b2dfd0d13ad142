"""Unit + property tests for the pure-Python WAV/PCM codec
(functions/audio.py). Fixtures are hand-assembled from the RIFF spec so
the decoder is checked against the FORMAT, not the encoder; hypothesis
sweeps the round trip."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_spark.functions.audio import (
    decode_wav,
    encode_wav,
)

PCM = struct.pack("<4h", 100, -100, 32767, -32768)


def _hand_wav_with_extra_chunk() -> bytes:
    """RIFF file assembled by hand with a LIST chunk (odd-length body,
    so the decoder must apply even-offset padding) BEFORE fmt/data —
    exercises the chunk walk, not just the happy path."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(PCM)) + PCM)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_hand_assembled_wav_with_unknown_chunk():
    sr, nch, samples = decode_wav(_hand_wav_with_extra_chunk())
    assert (sr, nch) == (8000, 1)
    assert samples.tolist() == [100, -100, 32767, -32768]


def test_wav_round_trip():
    sr, nch, samples = decode_wav(encode_wav(PCM, 44100, 1))
    assert (sr, nch) == (44100, 1)
    assert samples.tobytes() == PCM


def test_wav_rejects_unsupported():
    payload = bytearray(encode_wav(PCM, 16000))
    # field offset: RIFF(12) + 'fmt '+size(8) -> audio_format at 20
    struct.pack_into("<H", payload, 20, 3)        # IEEE float format
    with pytest.raises(ValueError, match="16-bit integer PCM"):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=2, max_size=256).map(lambda b: b[:len(b) & ~1]),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_round_trip_property(pcm, sr):
    if not pcm:
        return
    got_sr, _nch, samples = decode_wav(encode_wav(pcm, sr))
    assert got_sr == sr and samples.tobytes() == pcm


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.data())
def test_bmp_round_trip_property(w, h, data):
    from mit_6_5840_mapreduce_spark.functions.imaging import (
        decode_bmp, encode_bmp)
    rgb = bytes(data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3)))
    got_w, got_h, back = decode_bmp(encode_bmp(rgb, w, h))
    assert (got_w, got_h) == (w, h) and back == rgb


def test_audio_stats_match_numpy_reference():
    """The operator's per-doc stats derive from the decoded samples;
    spot-check the arithmetic against a direct numpy computation."""
    payload = "hello world padding".encode()[: len(b"hello world padding") & ~1]
    _sr, _nch, samples = decode_wav(encode_wav(payload))
    ref = np.frombuffer(payload, dtype="<i2")
    assert (samples == ref).all()
