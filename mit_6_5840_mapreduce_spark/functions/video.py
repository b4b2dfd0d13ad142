"""Pure-Python AVI (RIFF) video codec for uncompressed RGB frames.

Completes the modality set next to functions/imaging.py (BMP/PPM),
functions/audio.py (WAV/PCM), and functions/gif.py (LZW): a real
video CONTAINER — nested RIFF LIST chunks (hdrl/strl/movi), the avih
main header, and per-frame ``00db`` DIB chunks (bottom-up BGR rows
padded to 4 bytes, the same layout BMP uses). Compressed streams
(``00dc`` chunks / non-zero biCompression) are rejected explicitly —
real video codecs need libraries this container doesn't ship.

Decoded representation: ``(width, height, frames)`` with ``frames`` a
list of row-major top-down RGB byte strings.
"""

from __future__ import annotations

import struct

import numpy as np

from mit_6_5840_mapreduce_spark.functions.safety import (
    malformed_raises_valueerror,
)

BI_RGB = 0


def _rgb_to_dib(rgb: bytes, width: int, height: int) -> bytes:
    """Top-down RGB -> bottom-up BGR rows padded to 4 bytes."""
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]
    stride = (width * 3 + 3) & ~3
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, :width * 3] = bgr.reshape(height, width * 3)
    return padded.tobytes()


def _dib_to_rgb(data: bytes, width: int, height: int) -> bytes:
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(data[:stride * height],
                         dtype=np.uint8).reshape(height, stride)
    bgr = rows[:, :width * 3].reshape(height, width, 3)[::-1]
    return bgr[:, :, ::-1].tobytes()


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""        # RIFF even padding
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(frames: list[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """Minimal standards-shaped AVI: hdrl(avih + strl(strh, strf)) and
    movi with one uncompressed ``00db`` DIB chunk per frame."""
    frame_bytes = ((width * 3 + 3) & ~3) * height
    avih = struct.pack("<IIIIIIIIIIIIII",
                       1_000_000 // fps, frame_bytes * fps, 0, 0,
                       len(frames), 0, 1, frame_bytes, width, height,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            frame_bytes, 0, 0, 0)
            + struct.pack("<hhhh", 0, 0, width, height))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       BI_RGB, frame_bytes, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(
        _chunk(b"00db", _rgb_to_dib(f, width, height)) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(payload: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        yield cid, body_start, size
        pos = body_start + size + (size & 1)


@malformed_raises_valueerror
def decode_avi(payload: bytes) -> tuple[int, int, list[bytes]]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    frames: list[bytes] = []
    for cid, start, size in _walk(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        list_type = payload[start:start + 4]
        if list_type == b"hdrl":
            for c2, s2, z2 in _walk(payload, start + 4, start + size):
                if c2 == b"avih":
                    fields = struct.unpack_from("<IIIIIIIIII", payload, s2)
                    width, height = fields[8], fields[9]
                elif c2 == b"LIST" and payload[s2:s2 + 4] == b"strl":
                    for c3, s3, z3 in _walk(payload, s2 + 4, s2 + z2):
                        if c3 == b"strf":
                            (_hs, _w, _h, _pl, bits, comp,
                             *_r) = struct.unpack_from("<IiiHHI",
                                                       payload, s3)
                            if bits != 24 or comp != BI_RGB:
                                raise ValueError(
                                    "only 24bpp uncompressed AVI "
                                    f"supported (bits={bits}, "
                                    f"compression={comp})")
        elif list_type == b"movi":
            for c2, s2, z2 in _walk(payload, start + 4, start + size):
                if c2 == b"00dc":
                    raise ValueError(
                        "compressed AVI stream needs a codec library")
                if c2 == b"00db":
                    frames.append(payload[s2:s2 + z2])
    if width is None or height is None:
        raise ValueError("missing avih header")
    return width, height, [_dib_to_rgb(f, width, height) for f in frames]
