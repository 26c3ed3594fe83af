"""Minimal pure-stdlib GIF (87a/89a) codec — no PIL, no ffmpeg.

Exists so the video frame-sampling kernel (operators.multimodal.
sample_frames) has a REAL decode path in this environment: an animated
GIF is the one moving-picture container decodable with nothing but the
public format spec and integer math. `decode_gif` parses the logical
screen, global/local color tables, GIF89a graphic-control extensions
(per-frame delays, transparency, disposal) and the LZW-compressed
image data, compositing each frame onto the canvas the way an
animation renderer does; `encode_gif` writes a spec-conformant GIF89a
with a global palette, per-frame delays and real LZW compression, so
tests can round-trip through actual bytes.

Format per the public GIF89a specification (CompuServe, 1990):
header, logical screen descriptor, optional global color table, then
blocks — 0x21 extensions (0xF9 graphic control, others skipped),
0x2C image descriptors (optional local color table, LZW sub-blocks),
0x3B trailer. LZW per the spec's variable-width variant: initial code
width min+1, clear/end codes, width grows at 2^w (encoder bumps at
2^w+1 — the decoder builds its table one code behind), 12-bit cap,
clear-and-reset on a full table.

Deliberately the smallest honest subset: interlaced images and
disposal method 3 (restore-previous) raise ValueError naming the
field; everything else in the spec's animation core is handled.
"""

from __future__ import annotations

import struct

_HEADERS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _HEADERS


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width)
# ---------------------------------------------------------------------------
def _lzw_decode(min_size: int, data: bytes) -> bytes:
    clear = 1 << min_size
    end = clear + 1
    # incremental LSB-first bit reader: O(1) amortized per code. (A
    # whole-stream big-int with `num >> pos` costs O(remaining bits)
    # PER extraction — O(n²) total, minutes on a 1 MB stream.)
    acc = 0
    nbits = 0
    pos = 0  # byte position
    width = min_size + 1
    table: dict[int, bytes] = {}
    next_code = end + 1
    prev: bytes | None = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream (no end code)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            width = min_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code not in table:
                raise ValueError("LZW stream must start with a clear code")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError(f"invalid LZW code {code}")
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry


def _lzw_encode(min_size: int, indices: bytes) -> bytes:
    clear = 1 << min_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(clear)}, end + 1

    table, next_code = reset()
    emit(clear)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        # decoder builds its table one code behind: it widens before
        # reading code m+1 when ITS count hits 2^w, which is our
        # next_code == 2^w + 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:  # table full: clear and start over
                emit(clear)
                table, next_code = reset()
                width = min_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf])
        # the decoder adds a table entry for this final code too, and
        # may widen before its NEXT read — the end code must be
        # emitted at that widened width
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    chunks = [data[i : i + 255] for i in range(0, len(data), 255)]
    return b"".join(bytes([len(c)]) + c for c in chunks) + b"\x00"


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------
def encode_gif(
    width: int,
    height: int,
    palette: bytes,
    frames: list[bytes],
    delays_cs: list[int] | None = None,
) -> bytes:
    """GIF89a with a global color table: ``palette`` is RGB triples
    (padded to the next power of two ≥ 2 entries), each frame is
    width×height palette indices, ``delays_cs`` per-frame delays in
    centiseconds (omit for a static image)."""
    if len(palette) % 3:
        raise ValueError("palette must be RGB triples")
    n_colors = len(palette) // 3
    if not 1 <= n_colors <= 256:
        raise ValueError(f"palette must have 1..256 colors, got {n_colors}")
    bits = max(1, (n_colors - 1).bit_length())
    table = palette + b"\x00" * ((1 << bits) * 3 - len(palette))
    delays = delays_cs if delays_cs is not None else [0] * len(frames)
    if len(delays) != len(frames):
        raise ValueError("one delay per frame required")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])  # global table flag + size
    out += table
    min_code = max(2, bits)
    for frame, delay in zip(frames, delays):
        if len(frame) != width * height:
            raise ValueError("frame must be width*height indices")
        if max(frame, default=0) >= n_colors:
            raise ValueError("frame index out of palette range")
        # graphic control: disposal 1 (leave), no transparency
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0])  # no local table, not interlaced
        out += bytes([min_code]) + _sub_blocks(_lzw_encode(min_code, frame))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------
def decode_gif(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, list[bytes], list[int]]:
    """-> (width, height, [RGB frame bytes], [delay_ms]) with each
    frame composited onto the logical screen (disposal 0/1 leave the
    canvas, 2 restores the frame region to background; transparency
    skips pixels). Rejects interlaced images and disposal 3.

    Single-exception contract (same as operators.png/jpeg): any
    malformed or truncated buffer raises ValueError — callers like the
    sample_frames kernel catch exactly that to fall through to the
    gated stub without killing the stage. ``max_frames`` stops decoding
    after that many composited frames (an image-features caller needs
    only the first — no reason to decode a whole animation)."""
    try:
        return _decode_gif(data, max_frames)
    except (IndexError, struct.error) as e:  # truncated mid-structure
        raise ValueError(f"truncated or malformed GIF ({e})") from e


#: decode limits: a hostile 13-byte header can otherwise declare a
#: 65535×65535 screen and force a ~12.9 GB canvas allocation before any
#: pixel data is read. 2^24 pixels (= 4096×4096, a 50 MB RGB canvas)
#: comfortably covers real animations while keeping the worst case
#: bounded; larger screens raise the contracted ValueError. The BYTE
#: cap bounds the OTHER axis — a small buffer with thousands of tiny
#: frames each forcing a full-canvas copy (frames × canvas grows
#: unbounded otherwise); 1 GiB of decoded frames is far past any
#: legitimate sample_frames input.
_MAX_PIXELS = 1 << 24
_MAX_DECODE_BYTES = 1 << 30


def _decode_gif(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, list[bytes], list[int]]:
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    width, height = struct.unpack_from("<HH", data, 6)
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"logical screen {width}x{height} exceeds the "
            f"{_MAX_PIXELS}-pixel decode limit"
        )
    packed, bg_index, _aspect = data[10], data[11], data[12]
    pos = 13
    global_table = b""
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        global_table = data[pos : pos + n * 3]
        pos += n * 3
    bg_rgb = (
        global_table[bg_index * 3 : bg_index * 3 + 3]
        if len(global_table) >= (bg_index + 1) * 3
        else b"\x00\x00\x00"
    )
    canvas = bytearray(bg_rgb * (width * height))
    frames: list[bytes] = []
    delays_ms: list[int] = []
    # pending graphic-control state for the next image
    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9:  # graphic control
                flags = body[0]
                delay_cs = struct.unpack_from("<H", body, 1)[0]
                transparent = body[3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise ValueError(
                        "disposal method 3 (restore previous) unsupported"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        pos += 8
        if left + fw > width or top + fh > height:
            raise ValueError(
                f"frame rectangle {fw}x{fh}@({left},{top}) exceeds the "
                f"{width}x{height} logical screen"
            )
        ipacked = data[pos]
        pos += 1
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        table = global_table
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            table = data[pos : pos + n * 3]
            pos += n * 3
        if not table:
            raise ValueError("image has neither global nor local palette")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        indices = _lzw_decode(min_code, lzw)
        if len(indices) < fw * fh:
            raise ValueError("frame pixel data shorter than descriptor")
        drawn = set(indices[: fw * fh])
        drawn.discard(transparent)  # skipped by the compositor: any
        # value is legal there (real encoders do place the transparent
        # index outside the color table)
        if drawn and max(drawn) * 3 + 3 > len(table):
            # a silent out-of-range index would make the bytearray
            # slice-assign below SHRINK the canvas (empty RGB slice)
            # and corrupt every later frame
            raise ValueError("palette index out of color-table range")
        for row in range(fh):
            for col in range(fw):
                idx = indices[row * fw + col]
                if idx == transparent:
                    continue
                off = ((top + row) * width + (left + col)) * 3
                canvas[off : off + 3] = table[idx * 3 : idx * 3 + 3]
        # pre-append: reject only when THIS frame would push decoded
        # bytes past the cap (a post-append check would reject a valid
        # animation whose final frame lands exactly within the limit)
        if (len(frames) + 1) * len(canvas) > _MAX_DECODE_BYTES:
            raise ValueError(
                f"decoded frames exceed the {_MAX_DECODE_BYTES}-byte "
                "limit (frame-count bomb)"
            )
        frames.append(bytes(canvas))
        delays_ms.append(delay_cs * 10)
        if max_frames is not None and len(frames) >= max_frames:
            return width, height, frames, delays_ms
        if disposal == 2:  # restore frame region to background
            for row in range(fh):
                off = ((top + row) * width + left) * 3
                canvas[off : off + fw * 3] = bg_rgb * fw
        delay_cs, transparent, disposal = 0, None, 0
    return width, height, frames, delays_ms
