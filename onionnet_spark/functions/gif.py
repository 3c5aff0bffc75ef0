"""Pure-Python GIF (87a/89a) codec — stdlib struct + numpy.

Adds a real DICTIONARY-CODING image format to the multimodal
surface: GIF's variable-width LZW (LSB-first bit packing, clear /
end-of-information codes, code width growing 3..12 bits, dictionary
reset at 4096 entries) implemented in full for both directions, plus
the container: logical screen descriptor, global and local color
tables, graphic control extensions (frame delay / transparency),
comment and application extension skipping via sub-block walking,
and multi-frame animations (one image descriptor per frame).

GIF is lossless for paletted content, so decode(encode(x)) == x for
any frame set with <= 256 distinct colors — the closed form the
oracle query uses; interlaced images (the 4-pass row shuffle) are
supported in both directions.

Reference parity: no media surface in the reference; this extends
SURVEY §2's multimodal rows alongside PNG/JPEG/AVI.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_gif", "encode_gif", "decode_gif"]


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW

_MAX_CODE = 4096


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW: codes packed LSB-first, clear code emitted
    up front and before dictionary overflow.

    The code-width schedule is driven by a DECODER-MIRROR table
    counter, not the encoder's own dictionary size: a decoder adds
    one entry per received data code (except the first after a
    clear), including the encoder's final flushed prefix — so an
    encoder that widens off its own add count desyncs exactly at the
    last code before EOI (the classic GIF LZW off-by-one)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    mirror = eoi + 1  # decoder table size after reset
    width = mcs + 1
    first = True

    def emit_data(code: int) -> bool:
        """Emit a data code tracking the decoder's table/width;
        returns True when the dictionary must be reset."""
        nonlocal mirror, width, first
        emit(code, width)
        if first:
            first = False
            return False
        mirror += 1  # the decoder adds an entry for this code
        if mirror >= (1 << width) and width < 12:
            width += 1
        return mirror >= _MAX_CODE - 1

    def reset() -> None:
        nonlocal mirror, width, first
        emit(clear, width)
        table.clear()
        mirror = eoi + 1
        width = mcs + 1
        first = True

    emit(clear, width)
    prefix = -1
    for k in map(int, indices):
        if prefix < 0:
            prefix = k
            continue
        if (prefix, k) in table:
            prefix = table[(prefix, k)]
            continue
        full = emit_data(prefix)
        if full:
            reset()
        else:
            # the entry the decoder just created (its index is the
            # mirror size before that add)
            table[(prefix, k)] = mirror
        prefix = k
    if prefix >= 0:
        emit_data(prefix)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    clear = 1 << mcs
    eoi = clear + 1
    pos = 0  # bit position
    out = np.empty(n_pixels, dtype=np.uint16)
    filled = 0

    def read(width: int) -> int:
        nonlocal pos
        byte, bit = pos >> 3, pos & 7
        v = 0
        got = 0
        while got < width:
            if byte >= len(data):
                raise ValueError("LZW stream truncated")
            take = min(8 - bit, width - got)
            v |= ((data[byte] >> bit) & ((1 << take) - 1)) << got
            got += take
            bit += take
            if bit == 8:
                bit = 0
                byte += 1
        pos += width
        return v

    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return mcs + 1

    width = reset()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        if filled + len(entry) > n_pixels:
            raise ValueError("LZW output exceeds frame size")
        out[filled : filled + len(entry)] = np.frombuffer(entry, np.uint8)
        filled += len(entry)
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if filled != n_pixels:
        raise ValueError(f"LZW decoded {filled} of {n_pixels} pixels")
    return out


# ----------------------------------------------------------- container

def _sub_blocks(body: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_order(h: int) -> np.ndarray:
    """GIF's 4-pass interlace row order (spec appendix E): rows
    0,8,16.. then 4,12.. then 2,6,10.. then 1,3,5.."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def encode_gif(
    frames: list[np.ndarray], delay_cs: int = 10, interlace: bool = False
) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an animated GIF89a with
    one global color table (union of frame colors, <= 256) and a
    graphic control extension (delay in centiseconds) per frame.
    With interlace=True rows are stored in the spec's 4-pass order
    (and the image descriptor flag set accordingly)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    colors: dict[tuple[int, int, int], int] = {}
    index_frames = []
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must be (h, w, 3) with one size")
        flat = f.reshape(-1, 3)
        idx = np.empty(flat.shape[0], dtype=np.uint16)
        for i, px in enumerate(map(tuple, flat)):
            c = colors.get(px)
            if c is None:
                c = colors[px] = len(colors)
                if len(colors) > 256:
                    raise ValueError("GIF palette limited to 256 colors")
            idx[i] = c
        index_frames.append(idx)
    # palette size = power of two >= len(colors), minimum 2
    bits = max(1, (len(colors) - 1).bit_length())
    pal = np.zeros(((1 << bits), 3), dtype=np.uint8)
    for px, i in colors.items():
        pal[i] = px
    mcs = max(2, bits)  # LZW min code size (spec: >= 2)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += pal.tobytes()
    for idx in index_frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        out.append(mcs)
        if interlace:
            idx = idx.reshape(h, w)[_interlace_order(h)].reshape(-1)
        out += _sub_blocks(_lzw_encode(idx, mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[list[np.ndarray], int]:
    """Decode GIF bytes to ([frames as (h, w, 3) uint8 RGB],
    delay_cs). Supports global and local color tables, GCE frame
    delays, comment/application extension skipping, and multi-frame
    animations, and the 4-pass interlace row order."""
    data = bytes(data)
    if not is_gif(data):
        raise ValueError("not a GIF: bad signature")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    delay = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                if size != 4:
                    raise ValueError("bad GCE block size")
                (delay,) = struct.unpack("<H", data[pos + 2 : pos + 4])
                pos += 1 + size
            # walk sub-blocks (also the GCE terminator)
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, ip = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("image with no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs, fw * fh)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("pixel index outside color table")
            if ip & 0x40:  # undo the 4-pass interlace row order
                rows = idx.reshape(fh, fw)
                deinter = np.empty_like(rows)
                deinter[_interlace_order(fh)] = rows
                idx = deinter.reshape(-1)
            frame = pal[idx].reshape(fh, fw, 3)
            if (left, top, fw, fh) != (0, 0, w, h):
                full = np.zeros((h, w, 3), dtype=np.uint8)
                full[top : top + fh, left : left + fw] = frame
                frame = full
            frames.append(frame)
        else:
            raise ValueError(f"unknown GIF block {b:#04x}")
    if not frames:
        raise ValueError("GIF contains no image")
    return frames, delay
