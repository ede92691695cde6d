"""Pure-Python baseline JPEG codec (ITU-T T.81, public spec).

Round 10 lifts the repo's last multimodal refusal the same way the
XXH64 twin lifted the hash refusal: a dependency-free BASELINE
SEQUENTIAL JPEG decoder (DQT/SOF0/DHT/SOS/DRI marker parse, canonical
Huffman entropy decode with byte-unstuffing and restart markers,
dequantize + un-zigzag, separable float IDCT, general h/v sampling
factors with replication upsampling, BT.601 YCbCr->RGB) plus a minimal
ENCODER (4:4:4 or grayscale, Annex K quantization/Huffman tables, IJG
quality scaling) so tests can synthesize deterministic fixtures without
any imaging library — mirroring the repo's BMP/PNG codec pattern
(``multimodal.py``).

Scope contract (honest): baseline DCT sequential only.  Progressive
(SOF2), arithmetic coding, 12-bit precision, and hierarchical modes
raise ``ValueError`` naming the unsupported marker — those payloads
quarantine in the media-scan stages exactly like any undecodable bytes.

Reference analog: the reference treats media as opaque binary with
typed metadata (SURVEY §1); decode stages are the Spark-side plumbing
this engine adds for LLM training-data pipelines.

Everything here derives from the published T.81 spec (tables in Annex
K) and the JFIF 1.02 spec.  Performance note: this is a correctness
codec for fixture-scale media and metadata extraction; a production
deployment would swap in a native codec behind the same
``decode_image`` dispatch without touching the Spark plumbing.
"""

from __future__ import annotations

import math
import struct

# --------------------------------------------------------------------------
# Constants: zigzag order, Annex K quantization + Huffman tables
# --------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 / K.2 (natural order)
STD_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHROMA_QT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# T.81 Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


# --------------------------------------------------------------------------
# Huffman machinery (canonical codes per T.81 Annex C)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


def _quality_scale(table: list[int], quality: int) -> list[int]:
    """IJG quality scaling (public libjpeg convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [min(max((t * scale + 50) // 100, 1), 255) for t in table]


def _category(v: int) -> int:
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s


# --------------------------------------------------------------------------
# Bit I/O over the entropy-coded segment
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (pre-marker alignment)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, m: int) -> None:
        """Emit a standalone marker (e.g. RSTn) — aligned, unstuffed."""
        self.align()
        self.buf.append(0xFF)
        self.buf.append(m)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data with byte-unstuffing;
    restart markers (FFD0-FFD7) surface via ``at_marker``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("jpeg: bit read past a marker boundary")
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed FF
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("jpeg: bit read past a marker boundary")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_after_restart(self) -> None:
        """Consume a pending RST marker and realign to the next byte."""
        if self.marker is None:
            # scan forward: discard bits to byte boundary, expect FF Dx
            self.acc = 0
            self.nbits = 0
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    self.pos += 2
                    return
                self.pos += 1
            raise ValueError("jpeg: expected restart marker")
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"jpeg: unexpected marker 0x{self.marker:02x}")
        self.marker = None
        self.acc = 0
        self.nbits = 0


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


# --------------------------------------------------------------------------
# DCT / IDCT (separable, float — correctness codec)
# --------------------------------------------------------------------------

def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[x][u]
                row = x * 8
                for y in range(8):
                    s += block[row + y] * cu * _COS[y][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[x][u]
                row = u * 8
                for v in range(8):
                    s += _C[v] * coef[row + v] * cu * _COS[y][v]
            out[x * 8 + y] = 0.25 * s
    return out


# --------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 color or grayscale)
# --------------------------------------------------------------------------

def _encode_block(bw, block, qt, dct_tab, act_tab, pred):
    """FDCT + quantize + entropy-code one 8x8 block; returns new DC pred."""
    coef = _fdct(block)
    q = [int(round(coef[ZIGZAG[i]] / qt[ZIGZAG[i]])) for i in range(64)]
    diff = q[0] - pred
    s = _category(diff)
    code, length = dct_tab[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = q[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = act_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = act_tab[0x00]  # EOB
        bw.write(code, length)
    return q[0]


def _fetch_block(plane, x0, y0):
    """8x8 block from a plane with edge-clamp replication."""
    ph = len(plane)
    pw = len(plane[0])
    block = [0.0] * 64
    for yy in range(8):
        prow = plane[min(y0 + yy, ph - 1)]
        base = yy * 8
        for xx in range(8):
            block[base + xx] = prow[min(x0 + xx, pw - 1)]
    return block


def encode_jpeg(
    rows: list[list[tuple[int, int, int]]],
    quality: int = 90,
    grayscale: bool = False,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB pixel rows (top-down, ``rows[y][x] = (r, g, b)``) as a
    baseline JFIF JPEG — grayscale, 4:4:4, ``subsample=True``/"420"
    (2x2-averaged chroma), or ``subsample="422"`` (horizontal-only),
    exercising the decoder's general sampling-factor MCU paths.
    ``restart_interval=N`` emits a DRI segment and RSTn markers every N
    MCUs with DC-predictor resets — the error-resilience feature real
    encoders use, and the decoder's restart-realignment path.
    Deterministic: same pixels + options -> identical bytes, which is
    what lets tests pin fixture digests without an imaging library."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError("jpeg: bad dimensions")
    if subsample is True:
        subsample = "420"
    elif subsample is False:
        subsample = None
    if subsample not in (None, "420", "422"):
        raise ValueError("jpeg: subsample must be False/True/'420'/'422'")
    if grayscale and subsample:
        raise ValueError("jpeg: subsample applies to color only")
    lq = _quality_scale(STD_LUMA_QT, quality)
    cq = _quality_scale(STD_CHROMA_QT, quality)

    # color planes, level-shifted
    ncomp = 1 if grayscale else 3
    planes: list[list[list[float]]] = [
        [[0.0] * w for _ in range(h)] for _ in range(ncomp)
    ]
    for y in range(h):
        ry = rows[y]
        for x in range(w):
            r, g, b = ry[x]
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            planes[0][y][x] = yy - 128.0
            if not grayscale:
                planes[1][y][x] = -0.168736 * r - 0.331264 * g + 0.5 * b
                planes[2][y][x] = 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample == "420":  # 2x2 box-average chroma
        cw, chh = (w + 1) // 2, (h + 1) // 2
        for ci in (1, 2):
            src = planes[ci]
            ds = [[0.0] * cw for _ in range(chh)]
            for y in range(chh):
                for x in range(cw):
                    ys = [2 * y, min(2 * y + 1, h - 1)]
                    xs = [2 * x, min(2 * x + 1, w - 1)]
                    ds[y][x] = (
                        src[ys[0]][xs[0]] + src[ys[0]][xs[1]]
                        + src[ys[1]][xs[0]] + src[ys[1]][xs[1]]
                    ) / 4.0
            planes[ci] = ds
    elif subsample == "422":  # horizontal-only 2x1 average
        cw = (w + 1) // 2
        for ci in (1, 2):
            src = planes[ci]
            ds = [[0.0] * cw for _ in range(h)]
            for y in range(h):
                srow = src[y]
                for x in range(cw):
                    x1 = min(2 * x + 1, w - 1)
                    ds[y][x] = (srow[2 * x] + srow[x1]) / 2.0
            planes[ci] = ds

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    # component geometry: (plane_idx, hs, vs, qt, dc_tab, ac_tab)
    if grayscale:
        comps = [(0, 1, 1, lq, dc_l, ac_l)]
    elif subsample == "420":
        comps = [
            (0, 2, 2, lq, dc_l, ac_l),
            (1, 1, 1, cq, dc_c, ac_c),
            (2, 1, 1, cq, dc_c, ac_c),
        ]
    elif subsample == "422":
        comps = [
            (0, 2, 1, lq, dc_l, ac_l),
            (1, 1, 1, cq, dc_c, ac_c),
            (2, 1, 1, cq, dc_c, ac_c),
        ]
    else:
        comps = [
            (0, 1, 1, lq, dc_l, ac_l),
            (1, 1, 1, cq, dc_c, ac_c),
            (2, 1, 1, cq, dc_c, ac_c),
        ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    bw = _BitWriter()
    pred = [0] * ncomp
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ri = max(0, int(restart_interval))
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                bw.marker(0xD0 + ((n_mcu // ri - 1) % 8))
                pred = [0] * ncomp
            n_mcu += 1
            for pi, hs, vs, qt, dct_tab, act_tab in comps:
                for byi in range(vs):
                    for bxi in range(hs):
                        block = _fetch_block(
                            planes[pi],
                            (mx * hs + bxi) * 8,
                            (my * vs + byi) * 8,
                        )
                        pred[pi] = _encode_block(
                            bw, block, qt, dct_tab, act_tab, pred[pi]
                        )
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(  # APP0 JFIF
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 2, 0, 1, 1, 0, 0
    )

    def seg(marker: bytes, payload: bytes) -> None:
        out.extend(marker)
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(b"\xff\xdb", bytes([0]) + bytes(lq[ZIGZAG[i]] for i in range(64)))
    if ncomp == 3:
        seg(b"\xff\xdb", bytes([1]) + bytes(cq[ZIGZAG[i]] for i in range(64)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (_, hs, vs, *_rest) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    seg(b"\xff\xc0", bytes(sof))
    seg(b"\xff\xc4", bytes([0x00]) + bytes(DC_LUMA_BITS)
        + bytes(DC_LUMA_VALS))
    seg(b"\xff\xc4", bytes([0x10]) + bytes(AC_LUMA_BITS)
        + bytes(AC_LUMA_VALS))
    if ncomp == 3:
        seg(b"\xff\xc4", bytes([0x01]) + bytes(DC_CHROMA_BITS)
            + bytes(DC_CHROMA_VALS))
        seg(b"\xff\xc4", bytes([0x11]) + bytes(AC_CHROMA_BITS)
            + bytes(AC_CHROMA_VALS))
    if ri:
        seg(b"\xff\xdd", struct.pack(">H", ri))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", bytes(sos))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder (baseline sequential, general sampling factors)
# --------------------------------------------------------------------------

def decode_jpeg_pixels(data: bytes) -> tuple[int, int, int, list[list[tuple[int, int, int]]]]:
    """Full pixel decode: returns (width, height, channels, rows) with
    ``rows[y][x] = (r, g, b)`` (grayscale replicated across channels).

    Malformed-but-SOI-prefixed inputs (truncated segments, dangling
    component/table ids) raise ``ValueError`` — never IndexError/KeyError/
    struct.error — so the media stages' quarantine handlers (which catch
    ValueError, like the BMP/PNG decoders) turn one corrupt crawled image
    into a NULL row instead of failing the Spark stage.
    """
    try:
        return _decode_jpeg_pixels(data)
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"jpeg: malformed stream ({exc!r})") from exc


def _decode_jpeg_pixels(data: bytes) -> tuple[int, int, int, list[list[tuple[int, int, int]]]]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) with comps = [(id, hs, vs, tq)]
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (ln,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                zz = payload[p : p + 64]
                p += 64
                nat = [0] * 64
                for i in range(64):
                    nat[ZIGZAG[i]] = zz[i]
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if p + 16 > len(payload):
                    raise ValueError("jpeg: truncated DHT segment")
                bits = list(payload[p : p + 16])
                p += 16
                nv = sum(bits)
                if p + nv > len(payload):
                    raise ValueError("jpeg: truncated DHT segment")
                vals = list(payload[p : p + nv])
                p += nv
                table = _build_decode_map(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):  # SOF header is 6 bytes (B H H B)
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: non-baseline frame marker 0xFF{marker:02X} "
                "(progressive/arithmetic/hierarchical unsupported)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos += ln
            return _decode_scan(
                data, pos, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += ln
    raise ValueError("jpeg: no scan data found")


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # per-component plane buffers at sampled resolution
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = [
            [0.0] * (mcux * hs * 8) for _ in range(mcuy * vs * 8)
        ]
    scan_tabs = {cs: (td, ta) for cs, td, ta in scan}
    r = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.align_after_restart()
                pred = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid, hs, vs, tq in comps:
                td, ta = scan_tabs[cid]
                dct = huff_dc[td]
                act = huff_ac[ta]
                qt = qtables[tq]
                for byi in range(vs):
                    for bxi in range(hs):
                        zz = [0] * 64
                        s = _decode_symbol(r, dct)
                        diff = _receive_extend(r, s)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, act)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _receive_extend(r, ss)
                            k += 1
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[ZIGZAG[i]] = zz[i] * qt[ZIGZAG[i]]
                        px = _idct(coef)
                        plane = planes[cid]
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        for yy in range(8):
                            row = plane[y0 + yy]
                            base = yy * 8
                            for xx in range(8):
                                row[x0 + xx] = px[base + xx] + 128.0
    # upsample + color convert
    rows_out: list[list[tuple[int, int, int]]] = []
    if len(comps) == 1:
        plane = planes[comps[0][0]]
        for y in range(fh):
            prow = plane[y]
            rows_out.append([
                (lambda v: (v, v, v))(max(0, min(255, int(round(prow[x])))))
                for x in range(fw)
            ])
        return fw, fh, 1, rows_out
    (yid, yh, yv, _), (cbid, cbh, cbv, _), (crid, crh, crv, _) = comps
    yp, cbp, crp = planes[yid], planes[cbid], planes[crid]
    for y in range(fh):
        yrow = yp[y * yv // vmax] if yv != vmax else yp[y]
        cbrow = cbp[y * cbv // vmax]
        crrow = crp[y * crv // vmax]
        out_row = []
        for x in range(fw):
            yy = yrow[x * yh // hmax] if yh != hmax else yrow[x]
            cb = cbrow[x * cbh // hmax] - 128.0
            cr = crrow[x * crh // hmax] - 128.0
            rr = max(0, min(255, int(round(yy + 1.402 * cr))))
            gg = max(0, min(255, int(round(
                yy - 0.344136 * cb - 0.714136 * cr))))
            bb = max(0, min(255, int(round(yy + 1.772 * cb))))
            out_row.append((rr, gg, bb))
        rows_out.append(out_row)
    return fw, fh, 3, rows_out


def decode_jpeg(data: bytes) -> tuple[int, int, int, float, float, float]:
    """Stats contract matching ``decode_bmp``/``decode_png``: (width,
    height, channels, mean_r, mean_g, mean_b)."""
    w, h, ch, rows = decode_jpeg_pixels(data)
    n = w * h
    sr = sg = sb = 0
    for row in rows:
        for r, g, b in row:
            sr += r
            sg += g
            sb += b
    return w, h, ch, sr / n, sg / n, sb / n
