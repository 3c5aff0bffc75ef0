"""Lossy MDCT transform audio codec — the frame-based
transform-coding family (AAC / Vorbis / MP3 layer-3 hybrid) distilled
to its load-bearing DSP: windowed MDCT analysis, per-frame scalar
quantization with a transmitted scale, Rice-coded coefficients, and
overlap-add TDAC synthesis. This closes the 'truly-lossy MDCT audio'
gate WITHOUT external libs (no libmp3lame/ffmpeg in this container):
every stage is the real algorithm, only the bitstream container is
ours ('OMA1', documented below).

Reference parity note: the reference engine has no audio path at all
(saezlab/onionnet is a graph wrapper); this module belongs to the
multimodal-pipeline brief (SURVEY §2 #33) alongside wav/g711/adpcm/
flac — binary payloads decoded batch-wise inside mapInPandas.

Why MDCT: the modified DCT with a Princen-Bradley window gives
perfect reconstruction from 50%-overlapped frames (time-domain alias
cancellation) while being critically sampled — M new coefficients
per M new samples — which is why every mainstream lossy audio codec
is built on it. Quantization in the transform domain shapes error
into low-amplitude wideband noise instead of waveform distortion.

Bitstream 'OMA1' (all big-endian):
  magic 'OMA1' | u32 n_samples | u16 M (coeffs/frame) | u8 qbits |
  u32 sample_rate
  per frame (ceil(n/M) + 1 frames, hop M, signal zero-padded M front):
    u32 IEEE-754 float32 bits of the quantization step (0 => silent
    frame, no payload) | u5 rice parameter k | M Rice(k)-coded
    zigzag-mapped quantized coefficients, bit-packed, frame-aligned
    to a byte boundary.

Determinism: the window/cosine tables are closed-form float64, the
step is transmitted as the exact float32 the encoder used, and Rice
coding is bit-exact — encode and decode are reproducible across
machines; decode(encode(x)) error is bounded by step/2 per
coefficient (pytest pins SNR and the no-quantization TDAC identity).
"""

from __future__ import annotations

import struct

import numpy as np

from onionnet_spark.functions.flac import _BitReader, _BitWriter

MAGIC = b"OMA1"


def _tables(m: int) -> tuple[np.ndarray, np.ndarray]:
    """Sine window (Princen-Bradley compliant) and the MDCT cosine
    matrix C[k, n] = cos(pi/M * (n + 0.5 + M/2) * (k + 0.5))."""
    n = np.arange(2 * m)
    window = np.sin(np.pi * (n + 0.5) / (2 * m))
    k = np.arange(m)[:, None]
    cos = np.cos(np.pi / m * (n[None, :] + 0.5 + m / 2) * (k + 0.5))
    return window, cos


def _frames(x: np.ndarray, m: int) -> np.ndarray:
    """Zero-pad m front / enough back, return (n_frames, 2m) hops."""
    n_frames = -(-len(x) // m) + 1
    padded = np.zeros(m + n_frames * m + m, dtype=np.float64)
    padded[m : m + len(x)] = x
    idx = np.arange(2 * m)[None, :] + (np.arange(n_frames) * m)[:, None]
    return padded[idx]


def encode_mdct(
    samples: np.ndarray, m: int = 256, qbits: int = 10, sample_rate: int = 16000
) -> bytes:
    """Encode int16 (or float in [-1, 1]) mono PCM to OMA1 bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if np.issubdtype(np.asarray(samples).dtype, np.integer):
        x = x / 32768.0
    if not 2 <= qbits <= 15:
        raise ValueError("qbits must be in [2, 15]")
    window, cos = _tables(m)
    frames = _frames(x, m) * window[None, :]
    coeffs = frames @ cos.T  # (n_frames, m)
    qmax = (1 << (qbits - 1)) - 1
    bw = _BitWriter()
    for byte in MAGIC + struct.pack(">IHBI", len(x), m, qbits, sample_rate):
        bw.write(byte, 8)
    for row in coeffs:
        amax = float(np.max(np.abs(row)))
        step32 = np.float32(amax / qmax) if amax > 0 else np.float32(0.0)
        bw.write(int(np.frombuffer(step32.tobytes(), "<u4")[0]), 32)
        if float(step32) == 0.0:
            bw.align()
            continue
        q = np.round(row / float(step32)).astype(np.int64)
        q = np.clip(q, -qmax, qmax)
        u = (np.abs(q) * 2 - (q < 0)).astype(np.int64)  # zigzag
        mean = max(1.0, float(u.mean()))
        k = max(0, min(30, int(np.floor(np.log2(mean)))))
        bw.write(k, 5)
        for val in u:
            bw.write_unary(int(val) >> k)
            if k:
                bw.write(int(val) & ((1 << k) - 1), k)
        bw.align()
    return bw.getvalue()


def is_oma(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == MAGIC


def decode_mdct(data: bytes) -> tuple[np.ndarray, int]:
    """Decode OMA1 bytes to (int16 mono PCM of the original length,
    sample_rate)."""
    if not is_oma(data):
        raise ValueError("not an OMA1 stream")
    n_samples, m, qbits, sample_rate = struct.unpack(">IHBI", data[4:15])
    qmax = (1 << (qbits - 1)) - 1
    window, cos = _tables(m)
    n_frames = -(-n_samples // m) + 1 if n_samples else 1
    br = _BitReader(data, pos=15)
    out = np.zeros(m + n_frames * m + m, dtype=np.float64)
    for f in range(n_frames):
        step_bits = br.read(32)
        step = float(np.frombuffer(struct.pack("<I", step_bits), "<f4")[0])
        if step == 0.0:
            br.align()
            continue
        k = br.read(5)
        u = np.empty(m, dtype=np.int64)
        for i in range(m):
            hi = br.read_unary()
            lo = br.read(k) if k else 0
            u[i] = (hi << k) | lo
        br.align()
        q = np.where(u & 1, -((u + 1) >> 1), u >> 1)
        np.clip(q, -qmax, qmax, out=q)  # belt and braces vs corrupt streams
        row = q.astype(np.float64) * step
        # IMDCT + window + overlap-add (the 2/M synthesis scaling)
        y = (row @ cos) * (2.0 / m) * window
        out[f * m : f * m + 2 * m] += y
    pcm = out[m : m + n_samples]
    pcm16 = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16)
    return pcm16, sample_rate


def mdct_roundtrip_snr(samples: np.ndarray, m: int = 256, qbits: int = 10) -> float:
    """decode(encode(x)) SNR in dB — the codec's quality readout."""
    x = np.asarray(samples, dtype=np.float64)
    if np.issubdtype(np.asarray(samples).dtype, np.integer):
        x = x / 32768.0
    y = decode_mdct(encode_mdct(samples, m=m, qbits=qbits))[0].astype(np.float64) / 32768.0
    err = x - y
    ps, pe = float(np.sum(x * x)), float(np.sum(err * err))
    if pe == 0:
        return float("inf")
    return 10.0 * np.log10(ps / pe) if ps > 0 else float("-inf")
