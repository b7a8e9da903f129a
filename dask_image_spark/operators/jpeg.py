"""Baseline JPEG (JFIF, SOF0) grayscale codec, written from scratch on
numpy + the published ITU T.81 spec — no image library exists in this
container (the reference reads JPEG via pims/PIL; upstream contract:
``dask_image/imread/__init__.py``).

Scope: single-component (grayscale) baseline sequential JPEG — 8-bit
samples, one DQT/DHT pair, no subsampling, no restart markers, no
progressive scans. That is the complete decode pipeline a real file
needs: marker walk, DQT/DHT table parsing, canonical-Huffman entropy
decode with 0xFF00 byte unstuffing, DC differential prediction, zigzag
de-scan, dequantization, 2-D IDCT, level shift + clamp. The encoder
emits spec-valid files with self-describing Huffman tables (all DC
symbols at 4 bits, all 162 AC symbols at 8 bits — canonical codes, the
all-ones code left unused as T.81 requires), so the decoder's table
PARSER is exercised rather than assuming the Annex K defaults.

JPEG is lossy: an arbitrary image round-trips within a small quant
error (unit-tested against an independent numpy IDCT), while a block-
constant image — only the DC coefficient nonzero — round-trips
EXACTLY, which is what makes an end-to-end value-hash oracle possible
(see ``queries/pipeline.py::imread_jpeg``).
"""

from __future__ import annotations

import struct

import numpy as np

# Orthonormal 8-point DCT-II basis: M[u, x] = C(u)/2 * cos((2x+1)u pi/16).
# coef = M @ block @ M.T ; block = M.T @ coef @ M  (exact inverse pair).
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Zigzag scan order (T.81 figure 5): index i of the scan -> (row, col).
# Odd anti-diagonals run down-left (row ascending), even ones up-right
# (row descending) — the canonical 0,1,8,16,9,2,... raster sequence.
_ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (
        rc[0] + rc[1],
        rc[0] if (rc[0] + rc[1]) % 2 else -rc[0],
    ),
)

# Flat quality-90-ish quantization table: small uniform steps keep the
# reconstruction error tiny while still exercising real quantization.
DEFAULT_QTABLE = np.full((8, 8), 2, dtype=np.int32)


def _category(v: int) -> int:
    """T.81 magnitude category: number of bits of |v| (0 for v == 0)."""
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    """T.81 variable-length integer: v >= 0 encodes as-is, v < 0 as
    v + 2^size - 1 (one's-complement of |v|)."""
    return v if v >= 0 else v + (1 << size) - 1


def _decode_amplitude(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):  # leading 1 -> positive
        return bits
    return bits - (1 << size) + 1


# Canonical Huffman specs (BITS counts per length 1..16, then the symbol
# list in code order). DC: 12 categories, all 4 bits. AC: all 162
# run/size symbols at 8 bits (EOB=0x00, ZRL=0xF0 included). Both leave
# the all-ones code unused, as the spec requires.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical table (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing inside the entropy-coded segment
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG stuffing")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker FF{marker:02X} in scan")
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid Huffman code in JPEG scan")


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(pixels, width: int, height: int, qtable=None) -> bytes:
    """Encode 8-bit grayscale pixels (row-major) as a baseline JFIF JPEG."""
    q = np.asarray(qtable if qtable is not None else DEFAULT_QTABLE)
    img = np.asarray(list(pixels), dtype=np.float64).reshape(height, width)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    img = np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge")

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = img[by : by + 8, bx : bx + 8] - 128.0
            coef = _M @ block @ _M.T
            qc = np.rint(coef / q).astype(np.int64)
            zz = [int(qc[r, c]) for r, c in _ZIGZAG]
            # DC: differential, category + amplitude
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size = _category(diff)
            code, ln = dc_codes[size]
            w.write(code, ln)
            if size:
                w.write(_amplitude_bits(diff, size), size)
            # AC: run-length coded
            run = 0
            last_nz = 0
            for i in range(63, 0, -1):
                if zz[i]:
                    last_nz = i
                    break
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = ac_codes[(run << 4) | size]
                w.write(code, ln)
                w.write(_amplitude_bits(v, size), size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)

    dqt = bytes([0]) + bytes(int(q[r, c]) for r, c in _ZIGZAG)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xFFDB, dqt)
        + _seg(0xFFC0, sof0)
        + _seg(0xFFC4, dht)
        + _seg(0xFFDA, sos)
        + w.flush()
        + b"\xff\xd9"  # EOI
    )


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a baseline grayscale JPEG: returns (width, height, pixels).

    A real marker-segment parser: DQT/DHT/SOF0/SOS are read from the
    file (any spec-valid canonical tables work, not just ours); raises
    on progressive (SOF2), multi-component, or 16-bit tables."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    dc_id = ac_id = 0
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = body[b + 1 + i]
                qtables[tq] = tbl
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (code, ln): sym for sym, (code, ln) in codes.items()
                }
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8 or ncomp != 1:
                raise NotImplementedError(
                    "only 8-bit single-component baseline JPEG supported"
                )
            if body[7] != 0x11:
                raise NotImplementedError("subsampling not supported")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError(f"SOF{marker - 0xC0} JPEG not supported")
        elif marker == 0xDA:  # SOS
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if 0 not in qtables:
        raise ValueError("JPEG missing quantization table")
    q = qtables[0]
    dct = htables[(0, dc_id)]
    act = htables[(1, ac_id)]

    end = payload.rfind(b"\xff\xd9")
    r = _BitReader(payload[scan_start : end if end > 0 else len(payload)])
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = [0] * 64
            size = r.read_symbol(dct)
            prev_dc += _decode_amplitude(r.read(size), size) if size else 0
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = r.read_symbol(act)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                i += run
                if i > 63:
                    raise ValueError("AC run overflows block")
                zz[i] = _decode_amplitude(r.read(size), size)
                i += 1
            coef = np.zeros((8, 8))
            for k, (rr, cc) in enumerate(_ZIGZAG):
                coef[rr, cc] = zz[k] * q[rr, cc]
            out[by : by + 8, bx : bx + 8] = _M.T @ coef @ _M + 128.0
    px = np.clip(np.rint(out[:height, :width]), 0, 255).astype(np.int64)
    return width, height, px.ravel().tolist()
