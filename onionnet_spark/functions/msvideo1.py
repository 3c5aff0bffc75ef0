"""Pure-Python Microsoft Video 1 (CRAM/MSVC) codec — 16-bit mode.

Closes the "inter-frame video" half of the multimodal plug-in gate
with a real block-based temporally-predicted codec: MS Video 1 is
the classic Video-for-Windows format (biCompression 'CRAM'/'MSVC'/
'WHAM') whose bitstream is a sequence of 16-bit little-endian
opcodes over 4x4 blocks, traversed bottom-to-top, left-to-right
(the DIB legacy), with FOUR block modes:

- skip run   (high byte 0x84-0x87): copy the next N blocks from the
  PREVIOUS frame — the inter-frame prediction.
- 1-color    (high bit set, not a skip): the opcode word itself is
  the RGB555 color of the whole block.
- 2-color    (mask word with high bit clear, then color pair whose
  first word has bit 15 CLEAR): per-pixel 1-bit selection, LSB =
  the block's bottom-left pixel.
- 8-color    (color pair's first word has bit 15 SET): the block's
  four 2x2 quadrants each get their own color pair.

Because the mask word shares the opcode space, a conforming encoder
must keep mask bit 15 clear — i.e. the top-right pixel of a 2/8-color
block always selects the SECOND color of its pair; this encoder
swaps pair order (and inverts the affected mask bits) to satisfy
that, exactly as real CRAM encoders do.

The decoder's native pixel depth is RGB555; frames are returned as
RGB888 with each 5-bit component expanded as c << 3, so pixel values
that are multiples of 8 round-trip bit-exactly — the closed form the
oracle query uses. Frames whose 2x2 quadrants exceed 2 colors are
encoded lossily via a per-quadrant luminance split (the standard
MSV1 encoder strategy); the lossless cases are what the oracle pins,
the lossy path is pytest-bounded.

8-bit palettized mode and truly motion-compensated codecs (H.264's
motion vectors + residual transform) remain out of scope — the
latter is the genuine ffmpeg plug-in point.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_msvc_frames", "decode_msvc_frame"]

_SKIP_MAX = 0x3FF


def _pack555(frame: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w) uint16 RGB555 (r<<10|g<<5|b)."""
    f = frame.astype(np.uint16) >> 3
    return (f[:, :, 0] << 10) | (f[:, :, 1] << 5) | f[:, :, 2]


def _unpack555(packed: np.ndarray) -> np.ndarray:
    """(h, w) uint16 RGB555 -> (h, w, 3) uint8 RGB with c5 << 3."""
    p = packed.astype(np.uint16) & 0x7FFF
    out = np.empty((*p.shape, 3), dtype=np.uint8)
    out[:, :, 0] = ((p >> 10) & 0x1F) << 3
    out[:, :, 1] = ((p >> 5) & 0x1F) << 3
    out[:, :, 2] = (p & 0x1F) << 3
    return out


def _block_pixels_decode_order(block555: np.ndarray) -> np.ndarray:
    """4x4 (top-down y) -> the 16 pixels in bitstream order: bottom
    row first, left to right within each row."""
    return block555[::-1, :].reshape(16)


def _two_color_words(pix: np.ndarray, c0: int, c1: int) -> tuple[int, int, int]:
    """Mask + ordered pair for a 2-color block (pix in decode order).
    bit=1 -> first color; bit 15 must end up clear."""
    mask = 0
    for i in range(16):
        if pix[i] == c0:
            mask |= 1 << i
    if mask & 0x8000:  # top-right pixel must select the SECOND color
        mask ^= 0xFFFF
        c0, c1 = c1, c0
    return mask, c0, c1


_QUAD_BITS = {0: (0, 1, 4, 5), 2: (2, 3, 6, 7), 4: (8, 9, 12, 13), 6: (10, 11, 14, 15)}
# decode-order bit indices per quadrant q = ((y&2)<<1)+(x&2), where
# y counts bottom-up rows: q0 = bottom-left, q2 = bottom-right,
# q4 = top-left, q6 = top-right.


def _quad_of(i: int) -> int:
    y, x = i // 4, i % 4
    return ((y & 2) << 1) + (x & 2)


def _encode_block(pix: np.ndarray) -> list[int]:
    """Encode one 4x4 block (16 RGB555 values in decode order) to a
    list of 16-bit words."""
    colors = np.unique(pix)
    if len(colors) == 1:
        c = int(colors[0])
        # Opcode-space quirk of the real format: 0x8000|c for c in
        # 0x0400-0x07FF collides with the skip-run range 0x84xx-0x87xx
        # (the skip check wins in every decoder), so those colors
        # can't use the 1-color mode — emit a degenerate 2-color
        # block (mask 0, both colors equal) instead.
        if 0x0400 <= c <= 0x07FF:
            return [0x0000, c, c]
        return [0x8000 | c]
    if len(colors) == 2:
        mask, c0, c1 = _two_color_words(pix, int(colors[0]), int(colors[1]))
        return [mask, c0, c1]
    # 8-color: each quadrant independently reduced to <= 2 colors
    mask = 0
    pairs: dict[int, tuple[int, int]] = {}
    qpix = pix.copy()
    for q in _QUAD_BITS:
        idx = list(_QUAD_BITS[q])
        vals = pix[idx]
        uniq = np.unique(vals)
        if len(uniq) <= 2:
            c0 = int(uniq[0])
            c1 = int(uniq[-1])
        else:  # lossy: split by luminance around the quadrant mean
            lum = (
                ((vals >> 10) & 0x1F) * 2
                + ((vals >> 5) & 0x1F) * 5
                + (vals & 0x1F)
            )
            hi = lum >= lum.mean()
            c0 = int(np.round(vals[hi].astype(np.int64).mean())) if hi.any() else 0
            c1 = (
                int(np.round(vals[~hi].astype(np.int64).mean()))
                if (~hi).any()
                else c0
            )
            qpix[idx] = np.where(hi, c0, c1)
        pairs[q] = (c0, c1)
    for i in range(16):
        q = _quad_of(i)
        if qpix[i] == pairs[q][0]:
            mask |= 1 << i
    if mask & 0x8000:  # top-right pixel: swap quadrant 6's pair
        for b in _QUAD_BITS[6]:
            mask ^= 1 << b
        pairs[6] = (pairs[6][1], pairs[6][0])
    words = [mask]
    for q in (0, 2, 4, 6):
        words.extend(pairs[q])
    words[1] |= 0x8000  # 8-color marker on the first color word
    return words


def encode_msvc_frames(frames: list[np.ndarray]) -> list[bytes]:
    """Encode (h, w, 3) uint8 RGB frames (h, w multiples of 4) as MS
    Video 1 16-bit chunks — one bitstream per frame, with skip-run
    opcodes wherever a block is unchanged (at RGB555 precision) from
    the previous frame."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if h % 4 or w % 4:
        raise ValueError("MS Video 1 needs width/height multiples of 4")
    prev = None
    out = []
    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share one (height, width)")
        cur = _pack555(frame)
        words: list[int] = []
        pending_skip = 0

        def flush_skip():
            nonlocal pending_skip
            while pending_skip > 0:
                n = min(pending_skip, _SKIP_MAX)
                words.append(0x8400 + n)
                pending_skip -= n

        for by in range(h // 4 - 1, -1, -1):  # bottom-up block rows
            for bx in range(w // 4):
                blk = cur[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
                if prev is not None and np.array_equal(
                    blk, prev[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
                ):
                    pending_skip += 1
                    continue
                flush_skip()
                words.extend(_encode_block(_block_pixels_decode_order(blk)))
        flush_skip()
        out.append(struct.pack(f"<{len(words)}H", *words))
        # reference for the next frame is the DECODED current frame
        prev = _pack555(decode_msvc_frame(out[-1], w, h, prev))
    return out


def decode_msvc_frame(
    chunk: bytes, width: int, height: int, prev555: np.ndarray | None = None
) -> np.ndarray:
    """Decode one MS Video 1 16-bit chunk to (h, w, 3) uint8 RGB
    (5-bit components expanded as c << 3). `prev555` is the previous
    frame's packed RGB555 buffer ((h, w) uint16) — required whenever
    the stream uses skip opcodes (inter-frame blocks)."""
    if width % 4 or height % 4:
        raise ValueError("MS Video 1 needs width/height multiples of 4")
    cur = np.zeros((height, width), dtype=np.uint16)
    if prev555 is not None:
        cur[:] = prev555 & 0x7FFF
    blocks = [
        (by, bx)
        for by in range(height // 4 - 1, -1, -1)
        for bx in range(width // 4)
    ]
    bi = 0
    pos = 0
    data = bytes(chunk)

    def read_word() -> int:
        nonlocal pos
        if pos + 2 > len(data):
            raise ValueError("MS Video 1 bitstream truncated")
        (v,) = struct.unpack_from("<H", data, pos)
        pos += 2
        return v

    while bi < len(blocks):
        a = read_word()
        hi = a >> 8
        if (hi & 0xFC) == 0x84:  # skip run
            n = a - 0x8400
            if prev555 is None:
                raise ValueError("skip opcode in a stream with no prior frame")
            if bi + n > len(blocks):
                raise ValueError("skip run past end of frame")
            bi += n
            continue
        by, bx = blocks[bi]
        ys, xs = by * 4, bx * 4
        if hi >= 0x80:  # 1-color block
            cur[ys : ys + 4, xs : xs + 4] = a & 0x7FFF
            bi += 1
            continue
        mask = a
        c0 = read_word()
        pix = np.empty(16, dtype=np.uint16)
        if c0 & 0x8000:  # 8-color: 4 quadrant pairs
            cols = [c0 & 0x7FFF, read_word()] + [read_word() for _ in range(6)]
            for i in range(16):
                q = _quad_of(i)
                pix[i] = cols[q + (((mask >> i) & 1) ^ 1)] & 0x7FFF
        else:  # 2-color
            c1 = read_word()
            sel = [c0 & 0x7FFF, c1 & 0x7FFF]
            for i in range(16):
                pix[i] = sel[((mask >> i) & 1) ^ 1]
        # decode order is bottom row first -> flip back to top-down
        cur[ys : ys + 4, xs : xs + 4] = pix.reshape(4, 4)[::-1, :]
        bi += 1
    return _unpack555(cur)
