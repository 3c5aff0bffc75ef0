"""Pure-Python IMA ADPCM codec (WAV format tag 0x11) — stdlib + numpy.

Fourth real codec (after png/jpeg/wav/g711): a *history-dependent*
compressed-audio bitstream — each 4-bit nibble's meaning depends on
the adaptive step index evolved by every prior nibble, i.e. the
stream genuinely cannot be decoded without running the state
machine.  4:1 compression vs 16-bit PCM.

Oracle strategy (mirrors the baseline-JPEG trick in
functions/jpeg.py): a CONSTANT signal round-trips BIT-EXACTLY when
the initial step index is 0 — the block header stores the first
sample verbatim, every subsequent diff is 0 -> nibble 0 ->
delta = step >> 3 = 7 >> 3 = 0, and the index stays clamped at 0.
So the SQL oracle recomputes stats of a constant clip in closed
form while the Spark side runs the real nibble-packing state
machine; any unpack/state bug yields nonzero deltas and a
hash-mismatch.  Arbitrary-signal correctness is pytest-gated
(encode->decode error bounded by the local step size).

Mono only — multi-channel IMA interleaves 4-byte nibble groups per
channel; that variant is the documented plug-in point.
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _encode_sample(sample: int, predictor: int, index: int) -> tuple[int, int, int]:
    """One IMA step: returns (nibble, new_predictor, new_index)."""
    step = STEP_TABLE[index]
    diff = sample - predictor
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble, *_decode_step(nibble, predictor, index)


def _decode_step(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """Shared reconstruction: returns (new_predictor, new_index)."""
    step = STEP_TABLE[index]
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    predictor = _clamp16(predictor - delta if nibble & 8 else predictor + delta)
    index = min(max(index + INDEX_TABLE[nibble], 0), 88)
    return predictor, index


def adpcm_encode_blocks(
    samples: np.ndarray, block_align: int = 256
) -> tuple[bytes, int]:
    """Encode mono int16 samples into IMA ADPCM blocks.

    Returns (payload, samples_per_block).  Each block: 4-byte header
    (predictor int16 LE, step index uint8, reserved 0) holding the
    first sample verbatim, then (block_align - 4) * 2 nibbles, low
    nibble first.  The final block is padded by re-encoding the last
    sample (a no-op for the decoder state; the 'fact' chunk's frame
    count truncates it away on decode).
    """
    x = [int(v) for v in np.asarray(samples, dtype=np.int16).reshape(-1)]
    if not x:
        raise ValueError("empty signal")
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    index = 0
    for start in range(0, len(x), spb):
        block = x[start : start + spb]
        predictor = block[0]
        out += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        pad = block[-1]
        for sample in block[1:] + [pad] * (spb - len(block)):
            nib, predictor, index = _encode_sample(sample, predictor, index)
            nibbles.append(nib)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out), spb


def adpcm_decode_blocks(
    payload: bytes, block_align: int, n_samples: int
) -> np.ndarray:
    """Decode IMA ADPCM blocks back to mono int16 samples (truncated
    to n_samples, the 'fact' chunk count)."""
    payload = bytes(payload)
    out: list[int] = []
    for start in range(0, len(payload), block_align):
        block = payload[start : start + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        predictor, index, _reserved = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError(f"corrupt ADPCM step index {index}")
        out.append(predictor)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                predictor, index = _decode_step(nib, predictor, index)
                out.append(predictor)
    if len(out) < n_samples:
        raise ValueError(f"ADPCM payload holds {len(out)} < {n_samples} samples")
    return np.asarray(out[:n_samples], dtype=np.int16)
