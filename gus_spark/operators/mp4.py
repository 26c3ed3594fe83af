"""Minimal pure-stdlib ISO BMFF (MP4/MOV) container parser.

Companion to ``operators.png`` / ``operators.jpeg`` for the video
column: frame DECODE genuinely needs ffmpeg and stays a gated stub,
but container METADATA — duration, timescale, track count, video
dimensions — lives in plain struct-packed boxes the stdlib can read.
That is exactly the triage a 100-TB video corpus needs before
spending decode cycles (drop zero-duration clips, bucket by
resolution, estimate frame-sample fan-out).

Format per the public ISO/IEC 14496-12 specification: a file is a
sequence of boxes ``(uint32 size, 4cc type, payload)``; ``size == 1``
switches to a uint64 largesize, ``size == 0`` means to-end-of-file.
Container boxes (``moov``, ``trak``, ``mdia``...) nest child boxes in
their payload. ``mvhd`` (movie header, version 0 or 1) carries
timescale + duration; ``tkhd`` (track header) carries the 16.16
fixed-point presentation width/height.

``encode_mp4`` writes the smallest conformant skeleton (ftyp + moov
with mvhd and per-track trak/tkhd) so the parser is testable against
real box layouts without shipping binary fixtures; ``parse_mp4`` reads
any BMFF file, including real camera/encoder output. Malformed input
always raises ValueError — the same single-exception contract as the
image codecs.
"""

from __future__ import annotations

import struct

_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"qt  ", b"M4V ")
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def is_mp4(data: bytes) -> bool:
    """Sniff the ftyp box: size + 'ftyp' + a known major brand."""
    return (
        len(data) >= 12
        and data[4:8] == b"ftyp"
        and data[8:12] in _BRANDS
    )


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in range."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at byte {pos}")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"box {btype!r} size {size} overruns its container"
            )
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """All payload ranges matching a nested box path (e.g. moov/trak)."""
    head, rest = path[0], path[1:]
    for btype, b0, b1 in _boxes(data, start, end):
        if btype != head:
            continue
        if not rest:
            yield b0, b1
        else:
            yield from _find(data, b0, b1, rest)


def parse_mp4(data: bytes) -> dict:
    """Parse container metadata: {duration_ms, timescale, n_tracks,
    width, height}. width/height come from the first track header with
    a nonzero presentation size (the video track); audio-only files
    report 0x0. Raises ValueError on anything malformed."""
    try:
        return _parse(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt or truncated MP4: {e}") from e


def _parse(data: bytes) -> dict:
    if not is_mp4(data):
        raise ValueError("not an MP4 (missing/unknown ftyp)")
    moovs = list(_find(data, 0, len(data), [b"moov"]))
    if not moovs:
        raise ValueError("no moov box")
    m0, m1 = moovs[0]
    mvhds = list(_find(data, m0, m1, [b"mvhd"]))
    if not mvhds:
        raise ValueError("no mvhd box in moov")
    h0, h1 = mvhds[0]
    version = data[h0]
    if version == 0:
        # v0: 32-bit creation/modification/timescale/duration
        timescale, duration = struct.unpack(">II", data[h0 + 12 : h0 + 20])
    elif version == 1:
        timescale, duration = struct.unpack(">IQ", data[h0 + 20 : h0 + 32])
    else:
        raise ValueError(f"unsupported mvhd version {version}")
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")

    width = height = 0
    traks = list(_find(data, m0, m1, [b"trak"]))
    for t0, t1 in traks:
        for k0, k1 in _find(data, t0, t1, [b"tkhd"]):
            v = data[k0]
            # spec payload sizes: 84 bytes (v0) / 96 (v1); width and
            # height are the LAST 8 payload bytes (16.16 fixed) in
            # both versions, so parse end-relative
            if k1 - k0 != (84 if v == 0 else 96):
                raise ValueError(
                    f"tkhd v{v} payload is {k1 - k0} bytes"
                )
            w16, h16 = struct.unpack(">II", data[k1 - 8 : k1])
            if w16 and h16 and not (width and height):
                width, height = w16 >> 16, h16 >> 16
    return {
        "duration_ms": int(duration * 1000 // timescale),
        "timescale": int(timescale),
        "n_tracks": len(traks),
        "width": width,
        "height": height,
    }


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4(
    duration_ms: int,
    timescale: int = 1000,
    tracks: list[tuple[int, int]] | None = None,
    version: int = 0,
) -> bytes:
    """Write a minimal metadata-only BMFF skeleton: ftyp + moov(mvhd +
    one trak/tkhd per (width, height) entry; (0, 0) = audio track).
    No media data — this exists to test the parser against genuine box
    layouts (v0 and v1 headers, nested containers, fixed-point
    dimensions)."""
    if duration_ms < 0 or timescale <= 0:
        raise ValueError("duration_ms must be >= 0 and timescale > 0")
    if version not in (0, 1):
        raise ValueError(f"mvhd version must be 0 or 1, got {version}")
    duration = duration_ms * timescale // 1000
    if version == 0:
        mvhd = struct.pack(
            ">B3xIIII", 0, 0, 0, timescale, duration
        ) + b"\x00" * 80
    else:
        mvhd = struct.pack(
            ">B3xQQIQ", 1, 0, 0, timescale, duration
        ) + b"\x00" * 80
    parts = [_box(b"mvhd", mvhd)]
    for w, h in tracks if tracks is not None else [(640, 360)]:
        # payload = ver+flags(4) + fields/matrix zeros + width+height(8)
        # -> 84 bytes total for v0, 96 for v1 (spec layout)
        zeros = 72 if version == 0 else 84
        tkhd = (
            struct.pack(">B3x", version)
            + b"\x00" * zeros
            + struct.pack(">II", w << 16, h << 16)
        )
        parts.append(_box(b"trak", _box(b"tkhd", tkhd)))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    return ftyp + _box(b"moov", b"".join(parts))
