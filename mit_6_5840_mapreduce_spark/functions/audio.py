"""Pure-Python WAV/PCM codec for the multimodal pipeline — the audio
counterpart of functions/imaging.py.

Canonical RIFF/WAVE containers with 16-bit little-endian PCM are fully
specified public formats parseable with ``struct`` alone, so this decode
path is REAL: ``operators/multimodal.audio_decode_stats`` wraps payload
bytes in a WAV container, decodes it back through a proper chunk walk
(RIFF header, fmt chunk, unknown-chunk skipping, data chunk), and
computes signal statistics from the DECODED samples. Compressed codecs
(MP3/AAC/…) need libraries this container doesn't ship and are rejected
explicitly.

Decoded representation: ``(sample_rate, n_channels, samples)`` with
``samples`` an ``np.int16`` array (interleaved if multi-channel).
"""

from __future__ import annotations

import struct

import numpy as np

from mit_6_5840_mapreduce_spark.functions.safety import (
    malformed_raises_valueerror,
)

WAVE_FORMAT_PCM = 1


def encode_wav(pcm: bytes, sample_rate: int = 16000,
               n_channels: int = 1) -> bytes:
    """Build a canonical RIFF/WAVE file around raw 16-bit LE PCM bytes."""
    if len(pcm) % (2 * n_channels):
        raise ValueError("PCM byte length must be a multiple of the frame")
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", WAVE_FORMAT_PCM, n_channels, sample_rate,
                      byte_rate, block_align, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


@malformed_raises_valueerror
def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE container holding 16-bit PCM.

    Walks the chunk list (skipping unknown chunks and odd-length
    padding, per the RIFF spec) to find ``fmt `` and ``data``. Anything
    not 16-bit integer PCM raises ValueError rather than guessing.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_fields = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks pad to even offsets
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt_fields
    if audio_format != WAVE_FORMAT_PCM or bits != 16:
        raise ValueError(
            f"only 16-bit integer PCM supported (format={audio_format}, "
            f"bits={bits}); compressed codecs need external libraries")
    if len(data) % 2:
        raise ValueError("truncated 16-bit sample data")
    return sample_rate, n_channels, np.frombuffer(data, dtype="<i2")
