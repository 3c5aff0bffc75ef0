"""Minimal pure-Python JPEG codec (numpy DCT + stdlib).

Closes the multimodal codec gap the same way functions/png.py did
for lossless images: PIL/libjpeg are not in the container, but
Huffman-coded JPEG needs only an 8x8 DCT, the Annex-K tables, and a
bit reader — all expressible in numpy + pure Python. Scope
(documented subset, mirrors png.py):

- encode: 8-bit greyscale and RGB; 4:4:4 or 4:2:0 chroma
  subsampling (2x2 box-averaged chroma, MCU-interleaved); Annex-K
  quality-50 quantization tables, standard Huffman tables, JFIF
  header, byte stuffing; baseline sequential (SOF0) via
  ``encode_jpeg`` or PROGRESSIVE (SOF2) via
  ``encode_jpeg_progressive`` — DC-first with successive
  approximation (Al=1), DC refinement, per-component AC-first
  scans (Al=1) with EOB-run coding, and AC refinement scans with
  buffered correction bits (the full jcphuff scan script).
- decode: baseline sequential (SOF0/1) AND progressive (SOF2),
  8-bit, any number of DQT/DHT segments, restart intervals
  (DRI/RSTn), interleaved or single-component scans, integer
  sampling-factor ratios (4:4:4, 4:2:0, 4:2:2, 4:4:0);
  spectral-selection + successive-approximation scans accumulate
  into per-component coefficient planes and reconstruct once at
  EOI. Arithmetic coding, lossless and 12-bit modes raise
  NotImplementedError — the plug-in contract stays explicit about
  what a libjpeg-backed build would add.

JPEG is lossy: round-trips are validated by tolerance in tests,
EXCEPT uniform-color images, which survive exactly (a uniform block
is DC-only; with even sample values the DC quantizer divides
exactly, and for GREY RGB pixels Cb/Cr sit exactly on 128 so the
chroma path is exact too) — those closed forms are what the SQL
oracles recompute for the Spark decode queries. Progressive entropy
layering is lossless: progressive decode of a progressive encode
equals baseline decode of a baseline encode COEFFICIENT-EXACTLY
(pytest pins this on random images).

At 100 TB the per-image work runs inside Arrow-batched mapInPandas
workers (multimodal.decode_image_stats and friends); swapping this
module for libjpeg-turbo behind the same encode/decode signatures
changes nothing Spark-side.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
).reshape(8, 8)

# Standard Huffman tables (ITU T.81 Annex K): (bits[1..16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# Progressive AC scans need the EOBn run-length symbols (0x10..0xE0),
# which the baseline Annex-K AC tables do not define. This flat
# canonical table (every symbol at code length 8: 176 symbols, none
# hitting the forbidden all-ones code) covers EOB0..EOB14, ZRL and
# every run/size pair; the encoder redefines AC tables 0/1 with a
# mid-stream DHT before the AC scans, which is ordinary T.81
# table management any conformant decoder must honor.
_PROG_AC_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)}
    | {0xF0}
)
PROG_AC = ([0] * 7 + [len(_PROG_AC_SYMS)] + [0] * 8, _PROG_AC_SYMS)

# Orthonormal 8x8 DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M.
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


# ---------------------------------------------------------------- bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at any
    other marker (position left ON the 0xFF)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("marker reached")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, length: int) -> int:
        while self.n < length:
            self._fill()
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def align(self) -> None:
        self.acc = 0
        self.n = 0

    def skip_to_marker(self) -> None:
        """Advance to the next 0xFF marker byte (end of this scan's
        entropy data), un-stuffing as we go."""
        self.align()
        while True:
            b = self.data[self.pos]
            if b == 0xFF and self.data[self.pos + 1] != 0x00:
                return
            self.pos += 2 if (b == 0xFF) else 1


def _huff_encode_map(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment: symbol -> (code, length)."""
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


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _huff_encode_map(bits, vals)
    return {(l, c): s for s, (c, l) in enc.items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _next_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------------ shared geometry


def _sampling(n_comp: int, subsampling: str) -> list[tuple[int, int]]:
    if n_comp == 1:
        return [(1, 1)]
    if subsampling == "444":
        return [(1, 1), (1, 1), (1, 1)]
    if subsampling == "420":
        return [(2, 2), (1, 1), (1, 1)]
    raise ValueError(f"unsupported subsampling {subsampling!r} (444/420)")


def _rgb_to_planes(arr: np.ndarray) -> list[np.ndarray]:
    if arr.ndim == 2:
        return [arr]
    if arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        return [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    raise ValueError(f"unsupported image shape {arr.shape}")


def _pad_replicate(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _quantize_planes(
    img: np.ndarray, samp: list[tuple[int, int]]
) -> tuple[list[np.ndarray], int, int]:
    """Forward path shared by baseline and progressive encoders:
    color convert, subsample, pad, DCT, quantize. Returns (per-comp
    zigzag-order int coefficient arrays shaped (nbh, nbw, 64),
    h, w)."""
    arr = np.asarray(img, dtype=np.float64)
    planes = _rgb_to_planes(arr)
    h, w = arr.shape[:2]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_planes = []
    for ci, (hi, vi) in enumerate(samp):
        fy, fx = vmax // vi, hmax // hi
        p = _pad_replicate(planes[ci], mcuy * 8 * vmax, mcux * 8 * hmax)
        if fy > 1 or fx > 1:  # box-average subsample
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        comp_planes.append(p)
    qts = [QT_LUMA] + [QT_CHROMA] * (len(samp) - 1)
    out = []
    for p, qt in zip(comp_planes, qts):
        nbh, nbw = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3) - 128.0
        coefs = np.einsum("ux,abxy,vy->abuv", _M, blocks, _M)
        q = np.round(coefs / qt).astype(np.int64).reshape(nbh, nbw, 64)
        out.append(q[:, :, ZIGZAG])  # natural -> zigzag order
    return out, h, w


def _headers(
    h: int,
    w: int,
    samp: list[tuple[int, int]],
    sof_marker: bytes,
) -> bytes:
    n_comp = len(samp)
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, QT_LUMA)
    if n_comp == 3:
        out += _dqt_segment(1, QT_CHROMA)
    comps = b""
    for ci, (hi, vi) in enumerate(samp):
        comps += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += (
        sof_marker
        + struct.pack(">H", 8 + 3 * n_comp)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([n_comp])
        + comps
    )
    out += _dht_segment(0, 0, *DC_LUMA)
    out += _dht_segment(1, 0, *AC_LUMA)
    if n_comp == 3:
        out += _dht_segment(0, 1, *DC_CHROMA)
        out += _dht_segment(1, 1, *AC_CHROMA)
    return bytes(out)


def _sos_segment(
    comp_specs: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int
) -> bytes:
    """comp_specs: (component id, dc table id, ac table id)."""
    body = bytes([len(comp_specs)])
    for cid, dc_id, ac_id in comp_specs:
        body += bytes([cid, (dc_id << 4) | ac_id])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _dht_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, qt: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(x) for x in qt.flatten()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _mcu_block_order(
    samp: list[tuple[int, int]], mcuy: int, mcux: int
) -> list[tuple[int, int, int]]:
    """Interleaved block visit order: yields (comp idx, by, bx)."""
    order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(samp):
                for vy in range(vi):
                    for vx in range(hi):
                        order.append((ci, my * vi + vy, mx * hi + vx))
    return order


# ---------------------------------------------------------------- encode


def _write_block_baseline(
    writer: _BitWriter,
    zz: np.ndarray,
    dc_map: dict,
    ac_map: dict,
    prev_dc: int,
) -> int:
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, length = dc_map[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_map[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode a (h, w) greyscale or (h, w, 3) RGB uint8 array as
    baseline JFIF (SOF0). subsampling: '444' or '420' (2x2
    box-averaged chroma, MCU-interleaved)."""
    arr = np.asarray(img, dtype=np.float64)
    n_comp = 1 if arr.ndim == 2 else 3
    samp = _sampling(n_comp, subsampling)
    zz_arrs, h, w = _quantize_planes(arr, samp)
    out = bytearray(_headers(h, w, samp, b"\xff\xc0"))
    specs = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)
             for ci in range(n_comp)]
    out += _sos_segment(specs, 0, 63, 0, 0)
    dc_maps = [_huff_encode_map(*DC_LUMA)] + [_huff_encode_map(*DC_CHROMA)] * (
        n_comp - 1
    )
    ac_maps = [_huff_encode_map(*AC_LUMA)] + [_huff_encode_map(*AC_CHROMA)] * (
        n_comp - 1
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    writer = _BitWriter()
    prev = [0] * n_comp
    for ci, by, bx in _mcu_block_order(samp, mcuy, mcux):
        prev[ci] = _write_block_baseline(
            writer, zz_arrs[ci][by, bx], dc_maps[ci], ac_maps[ci], prev[ci]
        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _EobRun:
    """Progressive AC scan state: pending EOB run + the correction
    bits buffered behind it (jcphuff's EOBRUN/BE pair)."""

    def __init__(self, writer: _BitWriter, ac_map: dict) -> None:
        self.writer = writer
        self.ac_map = ac_map
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run > 0:
            nbits = self.run.bit_length() - 1
            code, length = self.ac_map[nbits << 4]
            self.writer.write(code, length)
            if nbits:
                self.writer.write(self.run & ((1 << nbits) - 1), nbits)
            for b in self.bits:
                self.writer.write(b, 1)
            self.run = 0
            self.bits = []

    def add(self, correction_bits: list[int]) -> None:
        self.run += 1
        self.bits.extend(correction_bits)
        if self.run == 0x7FFF:
            self.flush()


def _write_block_ac_first(
    er: _EobRun, zz: np.ndarray, ac_map: dict, ss: int, se: int, al: int
) -> None:
    writer = er.writer
    run = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = (v if v >= 0 else -v) >> al
        if mag == 0:
            run += 1
            continue
        er.flush()
        while run > 15:
            code, length = ac_map[0xF0]
            writer.write(code, length)
            run -= 16
        s = mag.bit_length()
        code, length = ac_map[(run << 4) | s]
        writer.write(code, length)
        writer.write(mag if v >= 0 else ~mag, s)
        run = 0
        wrote = True
    if run > 0 or not wrote:
        er.add([])


def _write_block_ac_refine(
    er: _EobRun, zz: np.ndarray, ac_map: dict, ss: int, se: int, al: int
) -> None:
    writer = er.writer
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob = ss + i
    run = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        a = absv[k - ss]
        if a == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            er.flush()
            code, length = ac_map[0xF0]
            writer.write(code, length)
            run -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if a > 1:  # already-nonzero history: buffer a correction bit
            br.append(a & 1)
            continue
        er.flush()
        code, length = ac_map[(run << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        er.add(br)


def encode_jpeg_progressive(img: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode as PROGRESSIVE JFIF (SOF2) with the classic scan
    script: interleaved DC-first at Al=1, DC refinement (raw bits),
    then per-component AC-first (Ss=1..63, Al=1) with EOB runs and
    AC-refinement (Ah=1, Al=0) with buffered correction bits.
    Identical quantized coefficients to encode_jpeg — progressive
    layering is entropy-only, so decode parity with baseline is
    exact (pytest-pinned)."""
    arr = np.asarray(img, dtype=np.float64)
    n_comp = 1 if arr.ndim == 2 else 3
    samp = _sampling(n_comp, subsampling)
    zz_arrs, h, w = _quantize_planes(arr, samp)
    out = bytearray(_headers(h, w, samp, b"\xff\xc2"))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    dc_maps = [_huff_encode_map(*DC_LUMA)] + [_huff_encode_map(*DC_CHROMA)] * (
        n_comp - 1
    )
    ac_maps = [_huff_encode_map(*AC_LUMA)] + [_huff_encode_map(*AC_CHROMA)] * (
        n_comp - 1
    )

    # Scan 1: DC first, interleaved, Al=1
    specs = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(n_comp)]
    out += _sos_segment(specs, 0, 0, 0, 1)
    writer = _BitWriter()
    prev = [0] * n_comp
    for ci, by, bx in _mcu_block_order(samp, mcuy, mcux):
        dc = int(zz_arrs[ci][by, bx][0]) >> 1  # point transform
        diff = dc - prev[ci]
        prev[ci] = dc
        s = _category(diff)
        code, length = dc_maps[ci][s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += writer.flush()

    # Scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    out += _sos_segment(specs, 0, 0, 1, 0)
    writer = _BitWriter()
    for ci, by, bx in _mcu_block_order(samp, mcuy, mcux):
        writer.write(int(zz_arrs[ci][by, bx][0]) & 1, 1)
    out += writer.flush()

    # Per component: AC first (Al=1) then AC refinement (Ah=1, Al=0).
    # AC scans are single-component over the comp's own block grid,
    # using the EOBn-capable flat table (redefined via mid-stream DHT).
    out += _dht_segment(1, 0, *PROG_AC)
    if n_comp == 3:
        out += _dht_segment(1, 1, *PROG_AC)
    prog_ac_map = _huff_encode_map(*PROG_AC)
    for ci, (hi, vi) in enumerate(samp):
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        ac_id = 0 if ci == 0 else 1
        out += _sos_segment([(ci + 1, 0, ac_id)], 1, 63, 0, 1)
        writer = _BitWriter()
        er = _EobRun(writer, prog_ac_map)
        for by in range(nbh):
            for bx in range(nbw):
                _write_block_ac_first(er, zz_arrs[ci][by, bx], prog_ac_map, 1, 63, 1)
        er.flush()
        out += writer.flush()
        out += _sos_segment([(ci + 1, 0, ac_id)], 1, 63, 1, 0)
        writer = _BitWriter()
        er = _EobRun(writer, prog_ac_map)
        for by in range(nbh):
            for bx in range(nbw):
                _write_block_ac_refine(er, zz_arrs[ci][by, bx], prog_ac_map, 1, 63, 0)
        er.flush()
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decode


def _decode_block_baseline(
    reader: _BitReader, dc_map: dict, ac_map: dict, zz: np.ndarray, prev_dc: int
) -> int:
    s = _next_symbol(reader, dc_map)
    diff = _extend(reader.read(s), s) if s else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _next_symbol(reader, ac_map)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol {sym:#x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read(size), size)
        k += 1
    return dc


def _decode_block_ac_first(
    reader: _BitReader,
    ac_map: dict,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _next_symbol(reader, ac_map)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past spectral band")
            zz[k] = _extend(reader.read(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += 16  # ZRL
    return eobrun


def _refine_nonzero(reader: _BitReader, zz: np.ndarray, k: int, p1: int) -> None:
    if reader.read(1) and (int(zz[k]) & p1) == 0:
        zz[k] += p1 if zz[k] >= 0 else -p1


def _decode_block_ac_refine(
    reader: _BitReader,
    ac_map: dict,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _next_symbol(reader, ac_map)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = p1 if reader.read(1) else -p1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(reader, zz, k, p1)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(reader, zz, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _maybe_restart(
    reader: _BitReader, restart_interval: int, unit: int
) -> bool:
    """At a restart boundary, consume the RSTn marker. Returns True
    when predictors/EOB runs must reset."""
    if restart_interval and unit and unit % restart_interval == 0:
        reader.align()
        if (
            reader.data[reader.pos] == 0xFF
            and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
        ):
            reader.pos += 2
        return True
    return False


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: dict,
    coefs: list[np.ndarray],
    htables: dict,
    restart_interval: int,
) -> int:
    """Decode one entropy-coded scan into the per-component zigzag
    coefficient arrays. Returns the stream position after the scan."""
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    h, w = frame["h"], frame["w"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    members = scan["members"]  # list of component indices
    progressive = frame["progressive"]
    reader = _BitReader(data, pos)
    dc_scan = ss == 0
    if progressive and dc_scan and se != 0:
        raise ValueError("progressive DC scan must have Se=0")

    if len(members) > 1:
        # interleaved scan: MCU order (baseline full scan or
        # progressive DC; progressive AC scans must be ns=1 per spec)
        if progressive and not dc_scan:
            raise ValueError("interleaved progressive AC scan is illegal")
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        order = _mcu_block_order(
            [ (comps[ci]["hs"], comps[ci]["vs"]) for ci in members], mcuy, mcux
        )
        prev = {ci: 0 for ci in members}
        per_mcu = sum(comps[ci]["hs"] * comps[ci]["vs"] for ci in members)
        for i, (mi, by, bx) in enumerate(order):
            ci = members[mi]
            if i % per_mcu == 0 and _maybe_restart(
                reader, restart_interval, i // per_mcu
            ):
                prev = {c: 0 for c in members}
            zz = coefs[ci][by, bx]
            if not progressive:
                dc_id, ac_id = scan["selectors"][ci]
                prev[ci] = _decode_block_baseline(
                    reader, htables[(0, dc_id)], htables[(1, ac_id)], zz, prev[ci]
                )
            elif ah == 0:  # DC first
                dc_id, _ = scan["selectors"][ci]
                s = _next_symbol(reader, htables[(0, dc_id)])
                diff = _extend(reader.read(s), s) if s else 0
                prev[ci] += diff
                zz[0] = prev[ci] << al
            else:  # DC refinement: one raw bit
                if reader.read(1):
                    zz[0] |= 1 << al
    else:
        # single-component scan over the comp's own block grid
        # (progressive DC/AC scans, or a one-component baseline frame)
        ci = members[0]
        comp = comps[ci]
        cw = -(-w * comp["hs"] // hmax)
        ch = -(-h * comp["vs"] // vmax)
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        dc_id, ac_id = scan["selectors"][ci]
        eobrun = 0
        prev_dc = 0
        unit = 0
        for by in range(nbh):
            for bx in range(nbw):
                if _maybe_restart(reader, restart_interval, unit):
                    eobrun = 0
                    prev_dc = 0
                unit += 1
                zz = coefs[ci][by, bx]
                if not progressive:
                    prev_dc = _decode_block_baseline(
                        reader, htables[(0, dc_id)], htables[(1, ac_id)],
                        zz, prev_dc,
                    )
                elif dc_scan:
                    if ah == 0:
                        s = _next_symbol(reader, htables[(0, dc_id)])
                        diff = _extend(reader.read(s), s) if s else 0
                        prev_dc += diff
                        zz[0] = prev_dc << al
                    else:
                        if reader.read(1):
                            zz[0] |= 1 << al
                else:
                    table = htables[(1, ac_id)]
                    if ah == 0:
                        eobrun = _decode_block_ac_first(
                            reader, table, zz, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _decode_block_ac_refine(
                            reader, table, zz, ss, se, al, eobrun
                        )
    reader.skip_to_marker()
    return reader.pos


def _reconstruct(frame: dict, coefs: list[np.ndarray], qtables: dict) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        qt_zz = qtables[comp["tq"]].flatten()[ZIGZAG].astype(np.float64)
        zz = coefs[ci].astype(np.float64) * qt_zz  # dequant, zigzag order
        nbh, nbw = zz.shape[:2]
        nat = np.zeros((nbh, nbw, 64))
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(nbh, nbw, 8, 8)
        spatial = np.einsum("ux,abuv,vy->abxy", _M, blocks, _M) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8)
        cw = -(-w * comp["hs"] // hmax)
        ch = -(-h * comp["vs"] // vmax)
        plane = plane[:ch, :cw]
        fy, fx = vmax // comp["vs"], hmax // comp["hs"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/1) or progressive (SOF2)
    JPEG -> uint8 array (h, w) for one component, (h, w, 3) RGB for
    three. Integer sampling ratios (4:4:4, 4:2:0, 4:2:2, 4:4:0)
    supported; see module docstring for the full subset. Outside it
    raises NotImplementedError (the libjpeg plug-in point) or
    ValueError (corrupt stream)."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    coefs: list[np.ndarray] = []
    restart_interval = 0
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may pad
        # before a marker; skip them (marker byte itself is never 0xFF).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                htables[(cls, tid)] = _huff_decode_map(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            n_comp = body[5]
            comps = []
            for ci in range(n_comp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "tq": tq, "hs": hv >> 4, "vs": hv & 0x0F}
                )
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            for c in comps:
                if c["hs"] < 1 or hmax % c["hs"] or vmax % c["vs"]:
                    raise NotImplementedError(
                        f"non-integer sampling ratio {c['hs']}x{c['vs']} "
                        f"vs max {hmax}x{vmax}"
                    )
            frame = {
                "h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
                "progressive": marker == 0xC2,
            }
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = [
                np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported frame type (SOF marker {marker:#x}): lossless/"
                "arithmetic/hierarchical need a full libjpeg"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            members = []
            selectors = {}
            id_to_idx = {c["id"]: i for i, c in enumerate(frame["comps"])}
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                idx = id_to_idx[cid]
                members.append(idx)
                selectors[idx] = (tabs >> 4, tabs & 0x0F)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            scan = {
                "members": members, "selectors": selectors,
                "ss": ss, "se": se, "ah": ahal >> 4, "al": ahal & 0x0F,
            }
            pos = _decode_scan(
                data, pos + seg_len, frame, scan, coefs, htables,
                restart_interval,
            )
            saw_scan = True
            continue
        pos += seg_len
    if frame is None or not saw_scan:
        raise ValueError("no scan data found")
    return _reconstruct(frame, coefs, qtables)
