"""Pure-Python GIF codec with a REAL LZW decompressor.

Completes the multimodal decode story: BMP/WAV (functions/imaging.py,
functions/audio.py) prove container parsing; GIF adds genuine entropy
decoding — variable-width LSB-first code stream, dictionary rebuild,
the KwKwK corner case — all from the public GIF87a/89a specification,
no codec library.

Supported: non-interlaced single-image GIFs with a global or local
color table. Anything else (interlace, animation control we can't
honor) raises ValueError rather than guessing.

Decoded representation: ``(width, height, rgb)`` — row-major top-down
RGB bytes after palette mapping.
"""

from __future__ import annotations

import struct

from mit_6_5840_mapreduce_spark.functions.safety import (
    malformed_raises_valueerror,
)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/END codes, code
    width growing at dictionary size 2^width up to 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    n_bits = 0
    pos = 0
    while True:
        while n_bits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream ended without END code")
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        n_bits -= code_size
        if code == clear:
            table = fresh_table()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]               # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression (dictionary building), the inverse of
    lzw_decode — used by encode_gif so decode actually exercises
    dictionary reconstruction, not just literal codes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += size
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:                                     # table full: reset
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(indices: bytes, width: int, height: int,
               palette: bytes) -> bytes:
    """Single-image GIF89a with a 256-entry global color table."""
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    if len(palette) != 256 * 3:
        raise ValueError("palette must be 256 RGB triplets")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | 0x07, 0, 0)          # GCT present, 256 entries
    out += palette
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code_size = 8
    out.append(min_code_size)
    compressed = lzw_encode(indices, min_code_size)
    for i in range(0, len(compressed), 255):
        chunk = compressed[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"                             # block terminator, trailer
    return bytes(out)


@malformed_raises_valueerror
def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:                          # extension: skip sub-blocks
            pos += 1                               # label
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:                        # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB",
                                                         payload, pos)
            pos += 9
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = payload[pos:pos + 3 * n]
                pos += 3 * n
            if not table:
                raise ValueError("GIF image has no color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                size = payload[pos]
                data += payload[pos + 1:pos + 1 + size]
                pos += 1 + size
            pos += 1
            indices = lzw_decode(bytes(data), min_code_size)
            if len(indices) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            rgb = bytearray()
            for idx in indices[:iw * ih]:
                rgb += table[3 * idx:3 * idx + 3]
            return iw, ih, bytes(rgb)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image block")


GRAYSCALE_PALETTE = bytes(v for i in range(256) for v in (i, i, i))
