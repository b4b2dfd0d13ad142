"""Pure-Python image codec for the multimodal pipeline: BMP (24-bit
uncompressed, the classic BITMAPINFOHEADER layout) and binary PPM (P6).

Both formats are fully specified public formats decodable with nothing
but ``struct``/``numpy`` — so unlike JPEG/PNG (which genuinely need a
codec library this container doesn't ship) the decode path here is REAL:
``operators/multimodal.image_decode_stats`` builds a BMP container
around payload bytes, decodes it back through this module (header parse,
bottom-up row flip, per-row 4-byte padding, BGR->RGB swap), and computes
pixel statistics from the DECODED image.

Decoded representation: ``(width, height, rgb)`` with ``rgb`` the raw
row-major top-down RGB bytes (``width * height * 3``).
"""

from __future__ import annotations

import struct

import numpy as np

from mit_6_5840_mapreduce_spark.functions.safety import (
    malformed_raises_valueerror,
)

_BMP_FILE_HEADER = "<2sIHHI"          # magic, file size, res1, res2, offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"     # BITMAPINFOHEADER (40 bytes)
BI_RGB = 0


def _row_stride(width: int) -> int:
    """BMP rows are padded to 4-byte boundaries."""
    return (width * 3 + 3) & ~3


def encode_bmp(rgb: bytes, width: int, height: int) -> bytes:
    """Build a 24-bit uncompressed BMP from top-down row-major RGB bytes.

    Writes the canonical layout: BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, BGR pixel order, rows padded to 4 bytes.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]                      # bottom-up + BGR
    stride = _row_stride(width)
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, :width * 3] = bgr.reshape(height, width * 3)
    data = padded.tobytes()
    offset = struct.calcsize(_BMP_FILE_HEADER) + \
        struct.calcsize(_BMP_INFO_HEADER)
    file_header = struct.pack(_BMP_FILE_HEADER, b"BM",
                              offset + len(data), 0, 0, offset)
    info_header = struct.pack(_BMP_INFO_HEADER, 40, width, height, 1, 24,
                              BI_RGB, len(data), 2835, 2835, 0, 0)
    return file_header + info_header + data


@malformed_raises_valueerror
def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP to (width, height, top-down RGB).

    Handles both bottom-up (positive height, the common case) and
    top-down (negative height) row orders and per-row padding. Anything
    this parser doesn't support (compression, other bit depths) raises
    ValueError rather than guessing.
    """
    magic, _size, _r1, _r2, offset = struct.unpack_from(
        _BMP_FILE_HEADER, payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, width, height, _planes, bpp, compression,
     *_rest) = struct.unpack_from(
        _BMP_INFO_HEADER, payload, struct.calcsize(_BMP_FILE_HEADER))
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != BI_RGB:
        raise ValueError(
            f"only 24bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = height < 0
    height = abs(height)
    stride = _row_stride(width)
    data = payload[offset:offset + stride * height]
    if len(data) < stride * height:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(height, stride)
    bgr = rows[:, :width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]                           # back to top-down
    return width, height, bgr[:, :, ::-1].tobytes()


@malformed_raises_valueerror
def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode binary PPM (P6, maxval <= 255): header tokens separated by
    whitespace with ``#`` comments, then raw RGB triplets — already
    top-down RGB, so only header parsing is needed."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                      # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = width * height * 3
    data = payload[pos:pos + need]
    if len(data) < need:
        raise ValueError("truncated PPM pixel data")
    return width, height, bytes(data)


def encode_ppm(rgb: bytes, width: int, height: int) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Sniff the container by magic and decode. JPEG/PNG/etc. require a
    codec library this container doesn't ship — rejected explicitly."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise ValueError(
        f"unsupported image container (magic {payload[:2]!r}); this "
        "build decodes BMP and P6 PPM")
