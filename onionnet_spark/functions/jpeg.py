"""Minimal pure-Python baseline JPEG codec (numpy DCT + stdlib).

Closes the last multimodal codec gap the same way functions/png.py
did for lossless images: PIL/libjpeg are not in the container, but
baseline sequential JPEG needs only an 8x8 DCT, the Annex-K
quantization/Huffman tables, and a bit reader — all expressible in
numpy + pure Python. Scope (documented subset, mirrors png.py):

- encode: 8-bit greyscale and RGB, 4:4:4 (no chroma subsampling),
  Annex-K quality-50 quantization tables, standard Huffman tables,
  JFIF header, byte stuffing.
- decode: baseline sequential (SOF0), 8-bit, any number of DQT/DHT
  segments, restart intervals (DRI/RSTn), 1- or 3-component scans
  with sampling factors 1x1 (exactly what the encoder and most
  ML-pipeline thumbnails emit). Progressive (SOF2), arithmetic
  coding, and subsampled chroma raise NotImplementedError — the
  plug-in contract stays explicit about what a libjpeg-backed build
  would add.

JPEG is lossy: round-trips are validated by tolerance in tests,
EXCEPT uniform-color images, which survive exactly (a uniform block
is DC-only; with even sample values the DC quantizer divides
exactly) — that closed form is what the SQL oracle recomputes for
the Spark decode query.

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


# ---------------------------------------------------------------- encode


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    dc_map: dict,
    ac_map: dict,
    prev_dc: int,
) -> int:
    coefs = _M @ (block - 128.0) @ _M.T
    q = np.round(coefs / qt).astype(np.int64)
    zz = q.flatten()[ZIGZAG]
    # DC
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, length = dc_map[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # AC
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
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


def _dht_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, qt: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(x) for x in qt.flatten()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray) -> bytes:
    """Encode a (h, w) greyscale or (h, w, 3) RGB uint8 array as
    baseline 4:4:4 JFIF."""
    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # replicate edges
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    n_comp = len(planes)
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, QT_LUMA)
    if n_comp == 3:
        out += _dqt_segment(1, QT_CHROMA)
    # SOF0
    comps = b""
    for ci in range(n_comp):
        comps += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += (
        b"\xff\xc0"
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
    # SOS
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_maps = [_huff_encode_map(*DC_LUMA)] + [_huff_encode_map(*DC_CHROMA)] * (
        n_comp - 1
    )
    ac_maps = [_huff_encode_map(*AC_LUMA)] + [_huff_encode_map(*AC_CHROMA)] * (
        n_comp - 1
    )
    qts = [QT_LUMA] + [QT_CHROMA] * (n_comp - 1)
    writer = _BitWriter()
    prev = [0] * n_comp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(n_comp):
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                prev[ci] = _encode_block(
                    writer, blk, qts[ci], dc_maps[ci], ac_maps[ci], prev[ci]
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


def _decode_block(
    reader: _BitReader, dc_map: dict, ac_map: dict, prev_dc: int
) -> tuple[np.ndarray, int]:
    def next_symbol(table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    zz = np.zeros(64, dtype=np.int64)
    s = next_symbol(dc_map)
    diff = extend(reader.read(s), s) if s else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = next_symbol(ac_map)
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
        zz[k] = extend(reader.read(size), size)
        k += 1
    return zz, dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG -> uint8 array (h, w) for one
    component, (h, w, 3) RGB for three. See module docstring for the
    supported subset; outside it raises NotImplementedError (the
    libjpeg plug-in point) or ValueError (corrupt stream)."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            n_comp = body[5]
            comps = []
            for ci in range(n_comp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (only 4:4:4 / greyscale supported)"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame (SOF marker {marker:#x}): progressive/"
                "lossless/arithmetic need a full libjpeg"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            selectors = {}
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                selectors[cid] = (tabs >> 4, tabs & 0x0F)
            scan_pos = pos + seg_len
            return _decode_scan(
                data, scan_pos, frame, selectors, qtables, htables,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no scan data found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    selectors: dict,
    qtables: dict,
    htables: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    n_comp = len(comps)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.zeros((ph, pw)) for _ in range(n_comp)]
    reader = _BitReader(data, pos)
    prev = [0] * n_comp
    mcu = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.align()
                if (
                    data[reader.pos] == 0xFF
                    and 0xD0 <= data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                prev = [0] * n_comp
            for ci, comp in enumerate(comps):
                dc_id, ac_id = selectors[comp["id"]]
                zz, prev[ci] = _decode_block(
                    reader, htables[(0, dc_id)], htables[(1, ac_id)], prev[ci]
                )
                coefs = np.zeros(64, dtype=np.float64)
                coefs[ZIGZAG] = zz * qtables[comp["tq"]].flatten()[ZIGZAG]
                block = _M.T @ coefs.reshape(8, 8) @ _M + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1
    if n_comp == 1:
        out = planes[0][:h, :w]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    y, cb, cr = (p[:h, :w] for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
