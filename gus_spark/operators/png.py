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
    scanline filter; rejects everything else loudly — ALWAYS as
    ValueError (struct/zlib errors from truncated or corrupt files are
    normalized so callers have one exception type to handle)."""
    try:
        return _decode_png(data)
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        # the parse-failure modes of malformed INPUT, normalized so
        # callers have one exception type; anything else (MemoryError
        # from a zlib bomb, a genuine codec bug) propagates untouched —
        # rebranding those as "corrupt input" would mask them
        raise ValueError(f"corrupt or truncated PNG: {e}") from e


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    import numpy as np

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
    # unfiltering: the hot cases vectorize — None is a copy, Up is one
    # uint8 add against the previous reconstructed row, Sub is a
    # per-channel prefix sum mod 256 (cumsum in uint8 wraps exactly).
    # Average/Paeth carry a left-neighbor dependency on RECONSTRUCTED
    # bytes, so they stay per-byte loops (our own encoder emits filter
    # 0 only; foreign encoders' Paeth rows take the slow path).
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    bad = ftypes[ftypes > 4]
    if bad.size:
        raise ValueError(f"unknown filter type {int(bad[0])}")
    rows = arr[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    zero_prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        row = rows[y].copy()
        prev = out[y - 1] if y else zero_prev
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub: prefix sum per channel, wraps in uint8
            row = np.cumsum(
                row.reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif ftype == 2:  # Up: one vector add
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        else:  # Paeth
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (
                    int(row[x]) + _paeth(left, int(prev[x]), ul)
                ) & 0xFF
        out[y] = row
    return width, height, channels, out.tobytes()


def mean_luma(width: int, height: int, channels: int, pixels: bytes) -> float:
    """Mean luminance in [0, 255]: the pixel mean for grayscale, the
    ITU-R BT.601 weighting for RGB. One vectorized numpy pass — this
    runs per image inside the corpus-scale decode kernel."""
    import numpy as np

    n = width * height
    if n == 0:
        return 0.0
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if channels == 1:
        return float(arr.mean())
    return float(
        (arr.reshape(-1, 3).astype(np.float64)
         @ np.array([0.299, 0.587, 0.114])).mean()
    )
