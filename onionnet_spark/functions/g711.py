"""Pure-Python G.711 companding codecs (mu-law / A-law) — numpy only.

Third leg of the real-codec family (functions/png.py, jpeg.py,
wav.py): COMPRESSED telephony audio. Both codecs here are the common
16-bit software variants (the exact tables ffmpeg/libsndfile use for
``pcm_mulaw`` / ``pcm_alaw``): 2:1 compression, 8 log-spaced
segments, 4-bit mantissa.

Why these are oracle-able even though they are lossy: for any input
sample ``x`` the decode(encode(x)) round-trip is a *pure closed-form
quantization* of ``x`` — segment = floor-log of the biased
magnitude, mantissa = 4 bits below it — which a SQL oracle can
recompute with an 8-branch CASE and integer bit-shifts, no codec in
the loop.  So unlike ADPCM (history-dependent) the gate covers
ARBITRARY signals, not just fixed points.

Reference parity note: the reference engine has no audio surface at
all; this module serves SURVEY §2's multimodal-pipeline rows
(compressed-audio decode), mirroring what an ffmpeg-backed build
would do behind the same WAV format-tag dispatch (wav.py).
"""

from __future__ import annotations

import numpy as np

ULAW_BIAS = 0x84  # 132
ULAW_CLIP = 32635

# Segment upper bounds on the biased magnitude (mu-law) and on the
# 13-bit magnitude (A-law); segment index = count of thresholds <= m.
_ULAW_SEG = np.array([0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000])
_ALAW_SEG = np.array([0x20, 0x40, 0x80, 0x100, 0x200, 0x400, 0x800])


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 mu-law codes (G.711, 16-bit variant)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), ULAW_CLIP) + ULAW_BIAS
    exp = (mag[..., None] >= _ULAW_SEG).sum(axis=-1)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 linear PCM."""
    c = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + ULAW_BIAS) << exp) - ULAW_BIAS
    return np.where((c & 0x80) != 0, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear PCM -> uint8 A-law codes (G.711, 13-bit variant)."""
    x = np.asarray(samples, dtype=np.int64)
    p = x >> 3  # arithmetic shift == floor(x / 8)
    neg = p < 0
    mask = np.where(neg, 0x55, 0xD5)
    p = np.where(neg, -p - 1, p)
    seg = (p[..., None] >= _ALAW_SEG).sum(axis=-1)
    mant = np.where(seg < 2, (p >> 1) & 0x0F, (p >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codes -> int16 linear PCM."""
    c = np.asarray(codes, dtype=np.int64) ^ 0x55
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    t = mant << 4
    mag = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where((c & 0x80) != 0, mag, -mag).astype(np.int16)


def ulaw_roundtrip_reference(x: int) -> int:
    """Scalar closed form of ulaw_decode(ulaw_encode(x)) — the exact
    formula the SQL oracles recompute (kept here so pytest can pin
    the vectorized codec to it sample-by-sample)."""
    mag = min(abs(int(x)), ULAW_CLIP) + ULAW_BIAS
    exp = int((mag >= _ULAW_SEG).sum())
    mant = (mag >> (exp + 3)) & 0x0F
    dec = (((mant << 3) + ULAW_BIAS) << exp) - ULAW_BIAS
    return -dec if x < 0 else dec


def alaw_roundtrip_reference(x: int) -> int:
    """Scalar closed form of alaw_decode(alaw_encode(x))."""
    x = int(x)
    p = x >> 3 if x >= 0 else (-x - 1) >> 3
    seg = int((p >= _ALAW_SEG).sum())
    mant = ((p >> 1) if seg < 2 else (p >> seg)) & 0x0F
    t = mant << 4
    mag = t + 8 if seg == 0 else (t + 0x108) << (seg - 1)
    return mag if x >= 0 else -mag
