"""Magic-byte media sniffing (functions/sniff.py) over real encoder
output — every container this repo owns a codec for must be detected
from its leading bytes alone."""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.functions.audio import encode_wav
from mit_6_5840_mapreduce_spark.functions.gif import (
    GRAYSCALE_PALETTE, encode_gif,
)
from mit_6_5840_mapreduce_spark.functions.imaging import encode_bmp
from mit_6_5840_mapreduce_spark.functions.sniff import sniff_media_type
from mit_6_5840_mapreduce_spark.functions.video import encode_avi

RAW = bytes(range(48)) * 2


def test_sniffs_real_encoder_output():
    assert sniff_media_type(encode_bmp(RAW[:48], 4, 4)) == "image/bmp"
    assert sniff_media_type(encode_wav(RAW, 16000)) == "audio/x-wav"
    assert sniff_media_type(
        encode_avi([RAW[:48], RAW[48:]], 4, 4)) == "video/avi"
    assert sniff_media_type(
        encode_gif(RAW[:32], 16, 2, GRAYSCALE_PALETTE)) == "image/gif"


def test_text_and_lookalikes():
    assert sniff_media_type(b"hello world") == "text/plain"
    assert sniff_media_type(b"") == "text/plain"
    # RIFF magic with an unknown form type is NOT claimed as wav/avi
    assert sniff_media_type(b"RIFF\x00\x00\x00\x00WEBP") == "text/plain"
    # truncated RIFF header (no form type yet)
    assert sniff_media_type(b"RIFF") == "text/plain"


def test_wrap_payload_mix_is_sniffable():
    """The multimodal_meta corpus construction: each doc_id % 4 bucket
    lands on its intended container, small payloads fall back to text."""
    from mit_6_5840_mapreduce_spark.operators.multimodal import _wrap_payload
    raw = b"The quick brown fox jumps over the lazy dog, repeatedly." * 2
    assert sniff_media_type(_wrap_payload(0, raw)) == "image/bmp"
    assert sniff_media_type(_wrap_payload(1, raw)) == "audio/x-wav"
    assert sniff_media_type(_wrap_payload(2, raw)) == "video/avi"
    assert sniff_media_type(_wrap_payload(3, raw)) == "text/plain"
    assert sniff_media_type(_wrap_payload(2, b"x")) == "text/plain"
