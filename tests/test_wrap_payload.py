"""Property tests for the mixed-container corpus construction
(operators/multimodal._wrap_payload): for ANY payload bytes and doc_id,
the wrapped blob must sniff to the doc_id-determined type (or fall back
to raw text when too small), and the matching codec must decode it back
to exactly the truncated raw bytes — the invariant every multimodal
oracle relies on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_spark.functions.audio import decode_wav
from mit_6_5840_mapreduce_spark.functions.imaging import decode_image
from mit_6_5840_mapreduce_spark.functions.sniff import sniff_media_type
from mit_6_5840_mapreduce_spark.functions.video import decode_avi
from mit_6_5840_mapreduce_spark.operators.multimodal import (
    _ROW_BYTES, VID_FRAME_BYTES, _wrap_payload,
)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10 ** 9), st.binary(min_size=0, max_size=300))
def test_wrap_sniff_decode_round_trip(doc_id, raw):
    blob = _wrap_payload(doc_id, raw)
    mod = doc_id % 4
    mt = sniff_media_type(blob)
    if mod == 0 and len(raw) >= _ROW_BYTES:
        assert mt == "image/bmp"
        k = (len(raw) // _ROW_BYTES) * _ROW_BYTES
        _w, _h, rgb = decode_image(blob)
        assert rgb == raw[:k]
    elif mod == 1 and len(raw) >= 2:
        assert mt == "audio/x-wav"
        k = len(raw) & ~1
        _sr, _nch, samples = decode_wav(blob)
        assert samples.tobytes() == raw[:k]
        assert samples.dtype == np.dtype("<i2")
    elif mod == 2 and len(raw) >= VID_FRAME_BYTES:
        assert mt == "video/avi"
        k = (len(raw) // VID_FRAME_BYTES) * VID_FRAME_BYTES
        _w, _h, frames = decode_avi(blob)
        assert b"".join(frames) == raw[:k]
    else:
        # too-small payloads and the text bucket stay raw; sniffing may
        # legitimately detect a container if raw ITSELF starts with a
        # magic sequence — exactly the behavior the oracles mirror
        assert blob == raw
        assert mt == sniff_media_type(raw)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_sniff_never_raises(raw):
    assert isinstance(sniff_media_type(raw), str)
