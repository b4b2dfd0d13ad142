"""Magic-byte media-type detection for opaque binary payloads.

Covers exactly the containers this repo owns real codecs for
(functions/imaging.py, functions/audio.py, functions/gif.py,
functions/video.py) plus the text fallback. The checks follow the
published container layouts: BMP's "BM" BITMAPFILEHEADER magic, the
GIF87a/GIF89a signature, and RIFF's outer fourcc + form-type pair
(bytes 8-12 distinguish WAVE from AVI).
"""

from __future__ import annotations

MEDIA_BMP = "image/bmp"
MEDIA_GIF = "image/gif"
MEDIA_WAV = "audio/x-wav"
MEDIA_AVI = "video/avi"
MEDIA_TEXT = "text/plain"


def sniff_media_type(payload: bytes) -> str:
    """Detect a payload's media type from its leading magic bytes;
    ``text/plain`` when no known container signature matches."""
    if payload[:2] == b"BM":
        return MEDIA_BMP
    if payload[:4] == b"GIF8":          # GIF87a / GIF89a
        return MEDIA_GIF
    if payload[:4] == b"RIFF":
        form = payload[8:12]
        if form == b"WAVE":
            return MEDIA_WAV
        if form == b"AVI ":
            return MEDIA_AVI
    return MEDIA_TEXT
