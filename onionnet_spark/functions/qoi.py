"""Pure-Python QOI ("Quite OK Image") codec — stdlib + numpy.

Adds a real RUN/DELTA-CODING image format to the multimodal surface:
QOI (qoiformat.org, public spec v1.0) compresses RGB(A) pixels with
five byte-level ops — QOI_OP_RUN (run-length of the previous pixel,
bias -1, max 62), QOI_OP_INDEX (a 64-slot rolling hash cache,
hash = (3r + 5g + 7b + 11a) % 64), QOI_OP_DIFF (per-channel deltas
in [-2, 1], wrapping mod 256), QOI_OP_LUMA (green delta in
[-32, 31] with red/blue expressed relative to it, wrapping), and
verbatim QOI_OP_RGB / QOI_OP_RGBA — behind a 14-byte header and an
8-byte end marker. All ops are exercised by any image mixing flat
spans (RUN/INDEX), smooth gradients (DIFF/LUMA) and hard edges
(RGB).

QOI is lossless, so decode(encode(x)) == x for every uint8 image —
the closed form the oracle query pins. Both directions implement the
full spec for 3- and 4-channel input; the decoder is
signature-dispatched ("qoif" magic) beside the other image codecs.

Reference parity: no media surface in the reference; this extends
SURVEY §2's multimodal rows alongside PNG/GIF/BMP/TIFF/JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_qoi", "encode_qoi", "decode_qoi"]

_MAGIC = b"qoif"
_END = b"\x00\x00\x00\x00\x00\x00\x00\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def is_qoi(data: bytes) -> bool:
    return bytes(data[:4]) == _MAGIC


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3|4) uint8 array to QOI bytes.

    Per spec the encoder prefers, in order: RUN (previous pixel
    repeats), INDEX (cache hit), DIFF (small wrapped deltas), LUMA
    (green-relative wrapped deltas), then verbatim RGB/RGBA."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("QOI needs an (H, W, 3|4) uint8 image")
    h, w, ch = img.shape
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">IIBB", w, h, ch, 0)  # channels, sRGB colorspace

    cache = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = img.reshape(-1, ch)
    for row in flat:
        if ch == 3:
            px = (int(row[0]), int(row[1]), int(row[2]), prev[3])
        else:
            px = (int(row[0]), int(row[1]), int(row[2]), int(row[3]))
        if px == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run > 0:
            out.append(_OP_RUN | (run - 1))
            run = 0
        idx = _hash(*px)
        if cache[idx] == px:
            out.append(_OP_INDEX | idx)
        else:
            cache[idx] = px
            r, g, b, a = px
            pr, pg, pb, pa = prev
            if a == pa:
                # wrapped (mod-256) channel deltas, per spec
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg = dr - dg
                db_dg = db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out.append(_OP_RGB)
                    out += bytes((r, g, b))
            else:
                out.append(_OP_RGBA)
                out += bytes((r, g, b, a))
        prev = px
    if run > 0:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """Decode QOI bytes to an (H, W, 3|4) uint8 array."""
    data = bytes(data)
    if not is_qoi(data):
        raise ValueError("not a QOI stream")
    w, h, ch, _cs = struct.unpack(">IIBB", data[4:14])
    if ch not in (3, 4):
        raise ValueError(f"bad QOI channel count {ch}")
    n_px = w * h
    out = np.zeros((n_px, 4), dtype=np.uint8)
    cache = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    end = len(data) - 8
    while i < n_px and pos < end:
        byte = data[pos]
        pos += 1
        if byte == _OP_RGB:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            op = byte & 0xC0
            if op == _OP_INDEX:
                r, g, b, a = cache[byte & 0x3F]
            elif op == _OP_DIFF:
                r = (r + ((byte >> 4) & 0x03) - 2) % 256
                g = (g + ((byte >> 2) & 0x03) - 2) % 256
                b = (b + (byte & 0x03) - 2) % 256
            elif op == _OP_LUMA:
                b2 = data[pos]
                pos += 1
                dg = (byte & 0x3F) - 32
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (b2 & 0x0F) - 8) % 256
            else:  # _OP_RUN
                run = (byte & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                cache[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        cache[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if i != n_px:
        raise ValueError(f"QOI truncated: {i}/{n_px} pixels")
    arr = out.reshape(h, w, 4)
    return arr[:, :, :ch].copy()
