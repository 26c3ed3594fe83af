"""Minimal pure-stdlib PNG codec (zlib + struct, no PIL).

Exists so the multimodal decode kernels can be exercised against REAL
image bytes in an environment without PIL/opencv: `encode_png` writes a
spec-conformant 8-bit grayscale or RGB PNG, `decode_png` reads any
non-interlaced 8-bit grayscale/RGB PNG, including all five standard
scanline filters (None/Sub/Up/Average/Paeth), so it also accepts files
produced by real encoders — not just its own output.

Format per the public PNG specification (RFC 2083 / ISO 15948):
signature, then chunks of (length, type, data, CRC32); IHDR carries
width/height/bit-depth/color-type, IDAT carries the zlib-compressed
filtered scanlines (one filter-type byte per row), IEND terminates.

This is deliberately the smallest honest subset: bit depth 8, color
types 0 (grayscale) and 2 (RGB), no interlace, no palette, no alpha —
anything else raises ValueError naming the unsupported field.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` = 1 grayscale
    or 3 RGB) as a PNG with filter type 0 on every scanline."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to (width, height, channels, raw row-major pixels).

    Accepts 8-bit non-interlaced grayscale/RGB with any standard
    scanline filter; rejects everything else loudly."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in (0, 2):
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNGs unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = 1 if color == 0 else 3
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"decompressed length {len(raw)} != {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[(y - 1) * stride : y * stride] if y else bytes(stride)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        out[y * stride : (y + 1) * stride] = row
    return width, height, channels, bytes(out)


def mean_luma(width: int, height: int, channels: int, pixels: bytes) -> float:
    """Mean luminance in [0, 255]: the pixel mean for grayscale, the
    ITU-R BT.601 weighting for RGB."""
    n = width * height
    if n == 0:
        return 0.0
    if channels == 1:
        return sum(pixels) / n
    total = 0.0
    for i in range(0, len(pixels), 3):
        total += (
            0.299 * pixels[i] + 0.587 * pixels[i + 1] + 0.114 * pixels[i + 2]
        )
    return total / n
