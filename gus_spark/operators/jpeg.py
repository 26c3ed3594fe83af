"""Minimal pure-Python baseline JPEG codec (struct + numpy, no PIL).

Companion to ``operators.png``: exists so the multimodal decode kernels
can be exercised against REAL lossy-compressed image bytes in an
environment without PIL/opencv. ``encode_jpeg`` writes a baseline
sequential JFIF (grayscale or YCbCr, 4:4:4 or 4:2:0) using the standard
Annex K quantization/Huffman tables; ``decode_jpeg`` reads baseline
sequential JPEGs from ANY encoder — arbitrary quantization tables,
arbitrary Huffman tables, 1- or 3-component, sampling factors 1 or 2
per axis, restart markers — so it accepts real-world camera/library
output, not just its own round-trip.

Format per the public JPEG specification (ITU-T T.81 / ISO 10918-1)
and the JFIF container (ITU-T T.871): marker segments (SOI, APPn, DQT,
SOF0, DHT, DRI, SOS ... EOI), entropy-coded MCUs of Huffman-coded
quantized 8x8 DCT blocks, 0xFF00 byte stuffing, RSTn restart markers.

Deliberately the smallest honest subset: baseline sequential DCT
(SOF0) with 8-bit samples only. Progressive (SOF2), arithmetic coding,
hierarchical, 12-bit, and 4-component (CMYK) streams raise ValueError
naming the unsupported feature — loud, never silently wrong. The
decoder is built for correctness on corpus *samples* (the decode
kernel's per-batch work), not throughput: the Huffman stage is a
per-symbol Python loop, ~100 KB/s — a real pipeline swaps in libjpeg
behind the same kernel contract. That contract is ENFORCED, not
prose: multimodal.decode_image_features takes a ``decoders`` chain of
(name, sniff, decode) triples replacing the in-tree codecs, and
tests/test_multimodal.py::test_codec_swap_in_contract injects a
masquerading external decoder and asserts identical schema/values and
identical undecodable-variant gating.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Public constant tables from ITU-T T.81 Annex K
# ---------------------------------------------------------------------------

#: K.1 — luminance quantization, in natural (row-major) order
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

#: K.2 — chrominance quantization
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: zig-zag scan order: _ZIGZAG[k] = natural index of the k-th coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K Huffman table specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis: block_dct = D @ block @ D.T (and the inverse
    transform is D.T @ coefs @ D, since D is orthonormal)."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]):
    """T.81 C.2: generate canonical (length, code) pairs in spec order."""
    codes = []
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((length, code, values[idx]))
            code += 1
            idx += 1
        code <<= 1
    return codes


def _encode_table(bits, values) -> dict[int, tuple[int, int]]:
    return {v: (ln, c) for ln, c, v in _canonical_codes(bits, values)}


def _decode_table(bits, values) -> dict[tuple[int, int], int]:
    return {(ln, c): v for ln, c, v in _canonical_codes(bits, values)}


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex K as-is, 100 ~ lossless-ish."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a padded plane -> quantized zigzag coefficients
    with shape (n_blocks_y, n_blocks_x, 64). Vectorized: one einsum per
    plane, not a Python loop per block."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .astype(np.float64) - 128.0
    )
    coefs = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    q = np.round(coefs / quant.reshape(8, 8)).astype(np.int32)
    return q.reshape(q.shape[0], q.shape[1], 64)[..., _ZIGZAG]


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    zz: np.ndarray, pred: int, dc_tab, ac_tab, out: _BitWriter
) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    ln, code = dc_tab[size]
    out.write(code, ln)
    if size:
        out.write(bits, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            out.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        ln, code = ac_tab[(run << 4) | size]
        out.write(code, ln)
        out.write(bits, size)
        run = 0
    if last < 63:
        ln, code = ac_tab[0x00]  # EOB
        out.write(code, ln)
    return dc


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, 1 = grayscale or 3 = RGB) as
    a baseline sequential JFIF using the Annex K tables. ``subsample``
    selects 4:2:0 chroma (2x2 box mean) — the layout virtually all
    real-world encoders emit — vs 4:4:4. ``restart_interval`` > 0 emits
    a DRI segment and an RSTn marker every N MCUs (what camera firmware
    writes for error resilience; also exercises the decoder's restart
    path)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} pixel bytes, "
            f"got {len(pixels)}"
        )
    if width < 1 or height < 1:
        raise ValueError("empty image")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)

    qluma = _scale_quant(_QUANT_LUMA, quality)
    qchroma = _scale_quant(_QUANT_CHROMA, quality)

    if channels == 1:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        quants = [qluma]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # 2x2 box mean on an edge-padded plane
            def down(p):
                p = _pad_to(p, 2)
                return (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        quants = [qluma, qchroma, qchroma]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    coefs = []
    for plane, (sh, sv), quant in zip(planes, samp, quants):
        target_w = -(-width * sh // hmax)
        target_h = -(-height * sv // vmax)
        p = np.clip(np.round(plane[:target_h, :target_w]), 0, 255)
        # pad so every component tiles the SAME MCU grid in full blocks
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        full_w, full_h = mcus_x * 8 * sh, mcus_y * 8 * sv
        p = np.pad(
            p,
            ((0, full_h - p.shape[0]), (0, full_w - p.shape[1])),
            mode="edge",
        )
        coefs.append(_fdct_quant(p, quant))

    dc_luma = _encode_table(*_DC_LUMA_SPEC)
    ac_luma = _encode_table(*_AC_LUMA_SPEC)
    dc_chroma = _encode_table(*_DC_CHROMA_SPEC)
    ac_chroma = _encode_table(*_AC_CHROMA_SPEC)
    tabs = [(dc_luma, ac_luma)] + [(dc_chroma, ac_chroma)] * (channels - 1)

    out = _BitWriter()
    preds = [0] * channels
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    mcu_index = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                out.flush()
                out.buf += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                preds = [0] * channels
            for ci, ((sh, sv), (dct, act)) in enumerate(zip(samp, tabs)):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            zz, preds[ci], dct, act, out
                        )
            mcu_index += 1
    out.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]  # SOI
    parts.append(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    parts.append(seg(0xFFDB, b"\x00" + bytes(qluma[_ZIGZAG].tolist())))
    if channels == 3:
        parts.append(seg(0xFFDB, b"\x01" + bytes(qchroma[_ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci, (sh, sv) in enumerate(samp):
        sof += struct.pack("BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    parts.append(seg(0xFFC0, sof))
    for tclass, tid, spec in [
        (0, 0, _DC_LUMA_SPEC), (1, 0, _AC_LUMA_SPEC),
        (0, 1, _DC_CHROMA_SPEC), (1, 1, _AC_CHROMA_SPEC),
    ][: 2 * (2 if channels == 3 else 1)]:
        bits, values = spec
        parts.append(
            seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits)
                + bytes(values))
        )
    if restart_interval:
        parts.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos = bytes([channels])
    for ci in range(channels):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"
    parts.append(seg(0xFFDA, sos))
    parts.append(bytes(out.buf))
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Reads entropy-coded bits with 0xFF00 de-stuffing; stops at any
    real marker (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy stream truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise ValueError("entropy stream truncated at marker")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def bit(self) -> int:
        if not self._n:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Discard padding bits and consume the next RSTn marker. The
        1-bit padding before a marker can itself form a stuffed
        0xFF 0x00 pair that the bit consumer never read — skip it."""
        self._acc = 0
        self._n = 0
        d = self.data
        while (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and d[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or d[self.pos + 1] != 0xD0 + (expect & 7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int) -> None:
        self.n = n


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential JPEG to (width, height, channels,
    raw row-major 8-bit pixels). channels is 1 (grayscale) or 3 (RGB,
    converted from YCbCr). Anything non-baseline raises ValueError —
    ALWAYS ValueError for malformed input, matching decode_png's
    contract."""
    try:
        return _decode_jpeg(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError, KeyError) as e:
        raise ValueError(f"corrupt or truncated JPEG: {e}") from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data (EOI before SOS)")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated marker segment")
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quantization unsupported")
                tbl = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int32)
                if tbl.size != 64:
                    raise ValueError("short DQT")
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = tbl
                quants[tid] = nat
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                if len(values) != n:
                    raise ValueError("short DHT")
                huff[(tclass, tid)] = _decode_table(bits, values)
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, sfac, qid = body[6 + 3 * i : 9 + 3 * i]
                sh, sv = sfac >> 4, sfac & 0x0F
                if sh not in (1, 2) or sv not in (1, 2):
                    raise ValueError(f"sampling factor {sh}x{sv} unsupported")
                comps.append({"id": cid, "h": sh, "v": sv, "q": qid})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise ValueError("partial scans unsupported")
            scan_tabs = {}
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan_tabs[cid] = (tids >> 4, tids & 0x0F)
            break
        # APPn / COM / anything else: skipped
    return _decode_scan(
        data, pos, frame, quants, huff, scan_tabs, restart_interval
    )


def _decode_scan(
    data, pos, frame, quants, huff, scan_tabs, restart_interval
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        if c["q"] not in quants:
            raise ValueError(f"missing quantization table {c['q']}")
        c["quant"] = quants[c["q"]].astype(np.float64)
        dc_id, ac_id = scan_tabs[c["id"]]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("missing Huffman table")
        c["dc"] = huff[(0, dc_id)]
        c["ac"] = huff[(1, ac_id)]
        c["coefs"] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.float64
        )

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_n = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                reader.align_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.float64)
                            size = _huff_decode(reader, c["dc"])
                            diff = _extend(reader.bits(size), size)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                sym = _huff_decode(reader, c["ac"])
                                if sym == 0x00:  # EOB
                                    break
                                run, size = sym >> 4, sym & 0x0F
                                if size == 0:
                                    if run != 15:
                                        raise ValueError("bad AC symbol")
                                    k += 16  # ZRL
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                zz[k] = _extend(reader.bits(size), size)
                                k += 1
                            c["coefs"][
                                my * c["v"] + by, mx * c["h"] + bx
                            ] = zz
            except _RestartMarker as e:
                raise ValueError(
                    f"unexpected restart marker RST{e.n}"
                ) from e
            mcu_index += 1

    # dequantize + inverse zigzag + IDCT, one einsum per component
    planes = []
    for c in comps:
        by_, bx_ = c["coefs"].shape[:2]
        nat = np.zeros((by_, bx_, 64), dtype=np.float64)
        nat[..., _ZIGZAG] = c["coefs"] * c["quant"][_ZIGZAG]
        blocks = nat.reshape(by_, bx_, 8, 8)
        pix = np.einsum("ji,abjk,kl->abil", _DCT, blocks, _DCT) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8)
        # upsample to full MCU-grid resolution (nearest), then crop
        if c["h"] != hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()
