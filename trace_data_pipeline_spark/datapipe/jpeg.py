"""Baseline JPEG codec — stdlib/numpy only, no PIL/libjpeg.

Closes the r4 verdict's "media codecs beyond PNG" item at the scope it
called realistically closable: BASELINE (SOF0) GRAYSCALE decodes for
real — marker parse, canonical Huffman entropy decode (Annex C code
construction), DC prediction, run-length AC with EOB/ZRL, dequant,
inverse zigzag, float64 IDCT, level shift, clamp, edge-crop. The
matching encoder exists to synthesize test payloads and to round-trip
goldens. OUT OF SCOPE (documented boundary, raises NotImplementedError
in `decode_jpeg`): color (chroma subsampling conventions), progressive
(SOF2), arithmetic coding, 12-bit precision, restart markers.

Reference parity: the reference pipeline treats media via external
codecs (PIL) the container does not ship; this module makes the
grayscale path REAL while `multimodal.decode_image` keeps the fake
kernel for everything else.

Exactness contract used by the d12c oracle entry: an image whose 8x8
blocks are each CONSTANT survives the lossy pipeline bit-exactly with
an all-ones quant table — the analysis DCT of a constant block is
DC = 8*(v-128) (an exact small integer in float64) with all ACs
mathematically zero (|float residue| ~1e-13 << the 0.5 rounding
threshold), and the DC-only IDCT reconstructs the constant to within
~1e-15 relative error, far inside the final round-to-uint8. So decoded
pixels == source pixels, and a SQL oracle can recompute statistics
straight from the block formula while the engine exercises the whole
entropy-decode + dequant + IDCT path.
"""

from __future__ import annotations

import struct

import numpy as np

# decode allocates ~8 bytes/pixel of work space; the cap bounds one
# malicious row's footprint at ~128 MB inside an Arrow batch worker
MAX_PIXELS = 1 << 24

# ---------------------------------------------------------------- DCT

_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# JPEG zigzag order: _ZIGZAG[i] = (row, col) of the i-th coefficient.
# Direction per Annex K figure A.6: EVEN anti-diagonals run bottom-left
# -> top-right ((s,0)..(0,s)), ODD ones top-right -> bottom-left — a
# swapped direction yields the TRANSPOSED order, self-consistent for
# this encoder/decoder pair but silently block-transposing externally
# produced JPEGs (caught in round-5 review; pinned by
# tests/test_multimodal.py::test_jpeg_zigzag_matches_spec).
_ZIGZAG = []
for _s in range(15):
    _idx = [(_s - j, j) for j in range(_s + 1) if 0 <= _s - j < 8 and 0 <= j < 8]
    _ZIGZAG.extend(_idx[::-1] if _s % 2 else _idx)

# Annex K.3 typical luminance Huffman tables (public spec constants)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for MSB-first stream decoding."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


def is_jpeg(payload: bytes | None) -> bool:
    return bool(payload) and payload[:3] == b"\xff\xd8\xff"


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            # truncate consumed bits — an ever-growing bigint makes the
            # writer O(scan^2) (round-5 review finding)
            self.acc &= (1 << self.n) - 1
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)


def _category(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, quant: list[int] | None = None
) -> bytes:
    """Baseline SOF0 single-component encode. `pixels` is row-major
    8-bit luma of length width*height; `quant` is 64 zigzag-order
    divisors (default all-ones — lossless for constant 8x8 blocks,
    see module docstring)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match geometry")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not 1 <= v <= 255 for v in q):
        raise ValueError("quant table must be 64 entries in 1..255")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    # replicate-pad to the block grid (standard practice)
    padded = np.pad(
        img.astype(np.float64) - 128.0,
        ((0, bh * 8 - height), (0, bw * 8 - width)),
        mode="edge",
    )
    qmat = np.empty((8, 8))
    for i, (r, c) in enumerate(_ZIGZAG):
        qmat[r, c] = q[i]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    out = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = np.round(_dct2(block) / qmat).astype(np.int64)
            zz = [int(coef[r, c]) for r, c in _ZIGZAG]
            diff = zz[0] - pred
            pred = zz[0]
            size, bits = _category(diff)
            code, ln = dc_codes[size]
            out.write(code, ln)
            if size:
                out.write(bits, size)
            run = 0
            last_nz = 0
            for i in range(63, 0, -1):
                if zz[i]:
                    last_nz = i
                    break
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    out.write(code, ln)
                    run -= 16
                size, bits = _category(zz[i])
                code, ln = ac_codes[(run << 4) | size]
                out.write(code, ln)
                out.write(bits, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                out.write(code, ln)
    scan = out.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    payload = b"\xff\xd8"  # SOI
    payload += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    payload += seg(0xFFDB, b"\x00" + bytes(q))  # DQT, table 0, 8-bit
    payload += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )  # SOF0: 8-bit, 1 component, no subsampling, quant table 0
    payload += seg(0xFFC4, dht(0x00, _DC_BITS, _DC_VALS))
    payload += seg(0xFFC4, dht(0x10, _AC_BITS, _AC_VALS))
    payload += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    payload += scan + b"\xff\xd9"  # EOI
    return payload


# ------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} mid-scan")
        # _fill only runs when n == 0, so the stale accumulator holds
        # no unread bits — resetting keeps the reader O(scan), where
        # (acc << 8) | b would grow a bigint forever (O(scan^2))
        self.acc = b
        self.n = 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(bits: int, size: int) -> int:
    """F.2.2.1 EXTEND: raw magnitude bits -> signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a baseline grayscale JPEG -> (width, height, 1, pixels).
    Raises ValueError on malformed streams and NotImplementedError at
    the documented scope boundary (color, progressive, restart
    intervals, 12-bit, arithmetic coding)."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    width = height = None
    comp_qtab = 0
    scan_dc = scan_ac = 0
    data = payload
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # spec-legal 0xFF fill bytes may pad between segments
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("reached EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
            pos += 2  # standalone markers carry no length field
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG header segment")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("JPEG segment length runs past payload end")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (extended)")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                quant[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 9:
                raise ValueError("truncated SOF0 segment")
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if width * height > MAX_PIXELS:
                raise ValueError(
                    f"image {width}x{height} exceeds the decoder's "
                    f"{MAX_PIXELS}-pixel cap (a tiny payload can declare "
                    "arbitrary SOF dimensions — allocating first would be "
                    "a memory bomb)"
                )
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    "color JPEG (chroma subsampling) is out of scope — "
                    "grayscale baseline only"
                )
            if body[7] != 0x11:
                raise NotImplementedError("subsampled single component")
            comp_qtab = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline SOF0 (no progressive/extended/arithmetic)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                if i + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[i + 17 : i + 17 + n])
                tab = _decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tab
                i += 17 + n
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI) out of scope")
        elif marker == 0xDA:  # SOS
            if len(body) < 3:
                raise ValueError("truncated SOS segment")
            scan_dc = body[2] >> 4
            scan_ac = body[2] & 0xF
            pos = pos + 2 + seglen
            break
        pos = pos + 2 + seglen
    else:
        raise ValueError("no SOS marker found")
    if width is None:
        raise ValueError("no SOF0 frame header before SOS")
    if comp_qtab not in quant or scan_dc not in dc_tables or scan_ac not in ac_tables:
        raise ValueError("scan references missing quant/Huffman table")
    if len(quant[comp_qtab]) != 64:
        raise ValueError("quant table has fewer than 64 entries")

    qmat = np.empty((8, 8))
    for i, (r, c) in enumerate(_ZIGZAG):
        qmat[r, c] = quant[comp_qtab][i]

    # entropy data runs to the EOI marker
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(data[pos:end])
    dct_tab, act_tab = dc_tables[scan_dc], ac_tables[scan_ac]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            coef = np.zeros((8, 8))
            size = _huff_decode(br, dct_tab)
            if size > 11:
                raise ValueError("DC category out of range")
            pred += _extend(br.bits(size), size)
            coef[0, 0] = pred
            k = 1
            while k < 64:
                sym = _huff_decode(br, act_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63 or size == 0:
                    raise ValueError("AC run past end of block")
                r, c = _ZIGZAG[k]
                coef[r, c] = _extend(br.bits(size), size)
                k += 1
            block = _idct2(coef * qmat) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    pixels = np.clip(np.round(out[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, 1, bytearray(pixels.tobytes())
