"""Pure-Python FLAC codec — the frame-based lossless audio format.

Closes the "frame-based audio" half of the multimodal plug-in gate
(SURVEY §2 row 33a16) with a real bit-level implementation of the
public FLAC format (https://xiph.org/flac/format.html): fLaC stream
marker + STREAMINFO (including the spec's MD5 of the unencoded
samples), frames with 14-bit sync codes, UTF-8-coded frame numbers
and CRC-8 header / CRC-16 frame checksums, subframes (CONSTANT,
VERBATIM, FIXED orders 0-4, LPC with quantized coefficients), and
partitioned Rice-coded residuals with escape codes — all verified
on decode, not just parsed.

Encoder emits CONSTANT / VERBATIM / FIXED(0-2) subframes with
single-partition Rice residuals (a legal subset every conforming
decoder accepts); the decoder handles the full subframe set incl.
LPC, RICE2, higher partition orders and wasted bits. Because FLAC
is lossless, decode(encode(x)) == x bit-exactly for ARBITRARY
samples, so the DuckDB oracle for the query key recomputes clip
statistics on the closed-form input directly — full-strength
coverage with no codec in the oracle loop (same reasoning as the
G.711 gate, but without even a quantization step).

Frame-based truly-lossy codecs (MP3/AAC: MDCT + psychoacoustics)
remain the external-decoder plug-in point.

Reference parity: onionnet has no media path; this extends the
multimodal brief (decode real formats inside mapInPandas).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["is_flac", "encode_flac", "decode_flac"]


def is_flac(data: bytes) -> bool:
    return bytes(data[:4]) == b"fLaC"


# ---------------------------------------------------------------- CRCs
# FLAC frame-header CRC-8: poly x^8+x^2+x+1 (0x07), init 0.
# Whole-frame CRC-16: poly x^16+x^15+x^2+1 (0x8005), init 0.

def _make_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8_TABLE = _make_table(0x07, 8)
_CRC16_TABLE = _make_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TABLE[(r >> 8) ^ b]
    return r


# ------------------------------------------------------------ bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self._buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, value: int) -> None:
        # FLAC unary: `value` zero bits, then a one bit.
        while value >= 32:
            self.write(0, 32)
            value -= 32
        self.write(1, value + 1)

    def write_bit_array(self, bits: "np.ndarray") -> None:
        """Append a uint8 0/1 array via np.packbits (the vectorized
        fast path for residual/verbatim runs)."""
        if self._n:
            pend = np.array(
                [(self._acc >> (self._n - 1 - i)) & 1 for i in range(self._n)],
                dtype=np.uint8,
            )
            bits = np.concatenate([pend, bits])
            self._acc = 0
            self._n = 0
        n_full = (len(bits) // 8) * 8
        if n_full:
            self._buf += np.packbits(bits[:n_full]).tobytes()
        for b in bits[n_full:]:
            self.write(int(b), 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0, "unaligned"
        return bytes(self._buf)


def _fixed_width_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """MSB-first fixed-width two's-complement bit matrix, flattened."""
    v = np.asarray(vals, dtype=np.int64) & ((1 << width) - 1)
    return (
        ((v[:, None] >> np.arange(width - 1, -1, -1)[None, :]) & 1)
        .astype(np.uint8)
        .reshape(-1)
    )


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._byte = pos
        self._bit = 0  # bits consumed of current byte, MSB first

    def read(self, bits: int) -> int:
        out = 0
        while bits > 0:
            if self._byte >= len(self._data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self._bit
            take = min(avail, bits)
            cur = self._data[self._byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self._bit += take
            bits -= take
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v & (1 << (bits - 1)):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def read_rice_block(self, cnt: int, k: int) -> np.ndarray:
        """Vectorized Rice run: decode `cnt` zigzag residuals with
        parameter k. Terminator positions are found by walking a
        flatnonzero(set-bit) index with a monotone pointer (total
        work O(#set bits), not O(#bits)); quotients and low bits then
        reconstruct as array arithmetic. ~5x the per-bit loop."""
        if cnt == 0:
            return np.empty(0, dtype=np.int64)
        data = np.frombuffer(self._data, dtype=np.uint8)
        bitpos = self._byte * 8 + self._bit
        total_bits = len(self._data) * 8
        off = bitpos % 8
        base = bitpos - off  # byte-aligned absolute bit of bits[0]

        def window(end_bit: int) -> tuple[np.ndarray, np.ndarray]:
            w = np.unpackbits(data[base // 8 : (end_bit + 7) // 8])
            return w, np.flatnonzero(w[off:]) + off

        bits, ones = window(min(total_bits, bitpos + cnt * (k + 8) + 64))
        T = np.empty(cnt, dtype=np.int64)
        j = 0
        s = off
        for i in range(cnt):
            while True:
                n_ones = len(ones)
                while j < n_ones and ones[j] < s:
                    j += 1
                if j < n_ones:
                    break
                covered = base + len(bits)
                if covered >= total_bits:
                    raise ValueError("FLAC bitstream truncated")
                bits, ones = window(
                    min(total_bits, covered + (cnt - i) * (k + 16) + 64)
                )
            T[i] = ones[j]
            s = int(ones[j]) + 1 + k
            j += 1
        # low bits may overrun the unpacked window for the last sample
        if s > len(bits):
            bits, ones = window(min(total_bits, base + s + 8))
        if base + s > total_bits:
            raise ValueError("FLAC bitstream truncated")
        starts = np.concatenate(([off], T[:-1] + 1 + k))
        q = T - starts
        if k:
            low = bits[T[:, None] + 1 + np.arange(k)[None, :]]
            lowv = low.astype(np.int64) @ (1 << np.arange(k - 1, -1, -1))
        else:
            lowv = np.zeros(cnt, dtype=np.int64)
        u = (q << k) | lowv
        out = np.where(u & 1 == 0, u >> 1, -((u + 1) >> 1))
        newpos = base + s
        self._byte, self._bit = newpos >> 3, newpos & 7
        return out

    def read_fixed_block(self, cnt: int, width: int) -> np.ndarray:
        """Vectorized fixed-width signed reads (verbatim subframes,
        escape residuals)."""
        if cnt == 0 or width == 0:
            return np.zeros(cnt, dtype=np.int64)
        data = np.frombuffer(self._data, dtype=np.uint8)
        bitpos = self._byte * 8 + self._bit
        end = bitpos + cnt * width
        if end > len(self._data) * 8:
            raise ValueError("FLAC bitstream truncated")
        off = bitpos % 8
        bits = np.unpackbits(data[bitpos // 8 : (end + 7) // 8])
        idx = off + np.arange(cnt)[:, None] * width + np.arange(width)[None, :]
        vals = bits[idx].astype(np.int64) @ (1 << np.arange(width - 1, -1, -1))
        vals = np.where(vals >= (1 << (width - 1)), vals - (1 << width), vals)
        self._byte, self._bit = end >> 3, end & 7
        return vals

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def tell_bytes(self) -> int:
        assert self._bit == 0
        return self._byte


# ----------------------------------------------------- UTF-8 numbers
# FLAC frame numbers use the UTF-8 variable-length scheme extended
# to 36 bits (spec §9.1.5).

def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        lead, k = 0xC0, 1
    elif n < 0x10000:
        lead, k = 0xE0, 2
    elif n < 0x200000:
        lead, k = 0xF0, 3
    elif n < 0x4000000:
        lead, k = 0xF8, 4
    else:
        lead, k = 0xFC, 5
    for i in range(k):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    out.append(lead | (n >> (6 * k)))
    return bytes(reversed(out))


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    if b0 >= 0xFE or b0 < 0xC0:
        raise ValueError("bad UTF-8 coded frame number")
    k, mask = 0, 0x40
    while b0 & mask:
        k += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(k):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


# ------------------------------------------------------------- encode

_BLOCK = 4096  # samples per frame (max legal for <=48kHz streams)

_FIXED_COEFS = {  # order -> prediction of x[i] from priors
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = int(np.abs(res).sum()) // max(len(res), 1)
    k = 0
    while (mean >> k) > 0 and k < 14:
        k += 1
    return k


def _rice_cost(res: np.ndarray, k: int) -> int:
    u = np.where(res >= 0, res.astype(np.int64) << 1, ((-res) << 1) - 1)
    return int((u >> k).sum()) + len(res) * (k + 1)


def _write_residual(bw: _BitWriter, res: np.ndarray, order: int) -> None:
    """Single-partition Rice residual (method 0, partition order 0)."""
    k = _rice_param(res)
    bw.write(0, 2)  # method: RICE (4-bit params)
    bw.write(0, 4)  # partition order 0
    if k >= 15 or _rice_cost(res, k) > 17 * len(res):
        # escape: raw 17-bit residuals (order-2 diff of 16-bit fits)
        bw.write(0xF, 4)
        bw.write(17, 5)
        bw.write_bit_array(_fixed_width_bits(res, 17))
        return
    bw.write(k, 4)
    u = np.where(res >= 0, res.astype(np.int64) << 1, ((-res) << 1) - 1)
    q = u >> k
    widths = q + 1 + k
    starts = np.cumsum(widths) - widths
    bits = np.zeros(int(widths.sum()), dtype=np.uint8)
    term = starts + q
    bits[term] = 1  # unary terminators
    for j in range(k):
        bits[term + 1 + (k - 1 - j)] = ((u >> j) & 1).astype(np.uint8)
    bw.write_bit_array(bits)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    x64 = x.astype(np.int64)
    if np.all(x64 == x64[0]):
        bw.write(0, 1)          # zero pad bit
        bw.write(0b000000, 6)   # CONSTANT
        bw.write(0, 1)          # no wasted bits
        bw.write_signed(int(x64[0]), bps)
        return
    best_order, best_cost, best_res = 0, None, None
    for order in (0, 1, 2):
        if len(x64) <= order:
            continue
        res = _fixed_residual(x64, order)
        cost = _rice_cost(res, _rice_param(res)) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    if best_cost is None or best_cost >= len(x64) * bps:
        bw.write(0, 1)
        bw.write(0b000001, 6)   # VERBATIM
        bw.write(0, 1)
        bw.write_bit_array(_fixed_width_bits(x64, bps))
        return
    bw.write(0, 1)
    bw.write(0b001000 | best_order, 6)  # FIXED, order
    bw.write(0, 1)
    for v in x64[:best_order]:          # warm-up samples
        bw.write_signed(int(v), bps)
    _write_residual(bw, best_res, best_order)


def encode_flac(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as a FLAC
    stream (independent channels, <=4096-sample frames)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"unsupported sample shape {arr.shape}")
    n, ch = arr.shape
    if not 1 <= ch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    bps = 16
    md5 = hashlib.md5(
        arr.reshape(-1).astype("<i2").tobytes()
    ).digest()  # spec: MD5 of interleaved little-endian samples

    frames = bytearray()
    frame_no = 0
    for start in range(0, max(n, 1), _BLOCK):
        block = arr[start : start + _BLOCK]
        bs = block.shape[0]
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)                   # reserved
        bw.write(0, 1)                   # blocking strategy: fixed
        bw.write(0b0111, 4)              # blocksize: 16-bit at end - 1
        bw.write(0b0000, 4)              # sample rate: from STREAMINFO
        bw.write(ch - 1, 4)              # independent channels
        bw.write(0b100, 3)               # 16 bits per sample
        bw.write(0, 1)                   # reserved
        header = bw.getvalue() + _utf8_encode(frame_no)
        header += struct.pack(">H", bs - 1)
        header += bytes([_crc8(header)])
        body = _BitWriter()
        for c in range(ch):
            _encode_subframe(body, block[:, c], bps)
        body.align()
        frame = header + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        frame_no += 1

    si = _BitWriter()
    si.write(_BLOCK, 16)  # min block size
    si.write(_BLOCK, 16)  # max block size
    si.write(0, 24)       # min frame size unknown
    si.write(0, 24)       # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + md5
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    return header + streaminfo + bytes(frames)


# ------------------------------------------------------------- decode

def _read_residual(
    br: _BitReader, bs: int, order: int
) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    if bs % (1 << porder):
        raise ValueError("block size not divisible by partition count")
    out = np.empty(bs - order, dtype=np.int64)
    pos = 0
    for p in range(1 << porder):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            out[pos : pos + cnt] = br.read_fixed_block(cnt, raw)
        else:
            out[pos : pos + cnt] = br.read_rice_block(cnt, k)
        pos += cnt
    return out


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0b000000:  # CONSTANT
        x = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        x = br.read_fixed_block(bs, bps)
    elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        # fixed prediction inverts order-o differencing: integrate o
        # times, each pass seeded with the matching difference of the
        # warm-up samples (d^j[order-1] = diff^j(warm)[-1])
        warm_arr = np.asarray(warm, dtype=np.int64)
        cur = res
        for j in range(order - 1, -1, -1):
            seed = np.diff(warm_arr, n=j)[-1] if order else 0
            cur = seed + np.cumsum(cur)
        x = np.concatenate([warm_arr, cur])
    elif stype & 0b100000:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is reserved")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        for i in range(order, bs):
            acc = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    if wasted:
        x <<= wasted
    return x


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to (samples int16 (n, ch), sample_rate).

    Verifies the frame-header CRC-8, whole-frame CRC-16 and the
    STREAMINFO MD5 — a corrupted stream raises instead of returning
    silently wrong audio."""
    data = bytes(data)
    if not is_flac(data):
        raise ValueError("not FLAC: missing fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    sr_ch_bps = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = sr_ch_bps >> 44
    ch = ((sr_ch_bps >> 41) & 0x7) + 1
    bps = ((sr_ch_bps >> 36) & 0x1F) + 1
    total = sr_ch_bps & ((1 << 36) - 1)
    if bps != 16:
        raise ValueError(f"only 16-bit streams supported (bps={bps})")
    md5_expect = streaminfo[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        br.read(1)  # reserved
        _utf8_decode(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        # header bits so far (32 + whole UTF-8/size/rate bytes) are
        # byte-aligned by construction
        header_end = br.tell_bytes()
        crc8 = br.read(8)
        if _crc8(data[frame_start:header_end]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code <= 7:
            n_sub, stereo = ch_code + 1, None
        elif ch_code in (8, 9, 10):
            n_sub, stereo = 2, ch_code
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if sz_code == 0b100:
            fbps = 16
        else:
            fbps = {1: 8, 2: 12, 5: 20, 6: 24, 7: 32}.get(sz_code)
            if fbps is None:
                raise ValueError(f"bad sample size code {sz_code}")
        subs = []
        for s in range(n_sub):
            sbps = fbps
            # side channel carries one extra bit (spec §9.2.2)
            if stereo == 8 and s == 1:
                sbps += 1
            elif stereo == 9 and s == 0:
                sbps += 1
            elif stereo == 10 and s == 1:
                sbps += 1
            subs.append(_decode_subframe(br, bs, sbps))
        br.align()
        crc16_pos = br.tell_bytes()
        crc16 = br.read(16)
        if _crc16(data[frame_start:crc16_pos]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.tell_bytes()
        if stereo is None:
            if n_sub != ch:
                raise ValueError("frame channel count != STREAMINFO")
            for c in range(ch):
                chans[c].append(subs[c])
        else:
            if ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if stereo == 8:  # left-side
                left, side = subs
                right = left - side
            elif stereo == 9:  # right-side
                side, right = subs
                left = right + side
            else:  # mid-side: left = (2*mid + (side&1) + side) >> 1
                mid, side = subs
                mid2 = (mid.astype(np.int64) << 1) | (side & 1)
                left = (mid2 + side) >> 1
                right = (mid2 - side) >> 1
            chans[0].append(left)
            chans[1].append(right)
        got += bs
    if got != total:
        raise ValueError("frame samples exceed STREAMINFO total")
    out = np.stack(
        [np.concatenate(c) if c else np.empty(0, np.int64) for c in chans],
        axis=1,
    )
    if out.shape[0] != total:
        raise ValueError("decoded sample count mismatch")
    clipped = out.astype(np.int16)
    if md5_expect != b"\x00" * 16:
        md5 = hashlib.md5(clipped.reshape(-1).astype("<i2").tobytes()).digest()
        if md5 != md5_expect:
            raise ValueError("STREAMINFO MD5 mismatch (corrupt stream)")
    return clipped, sample_rate
