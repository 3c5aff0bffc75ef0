"""Minimal pure-Python WAV (RIFF/PCM) codec — stdlib struct only.

Companion to functions/png.py: the audio half of the multimodal
decode surface gets a REAL in-container path (16-bit PCM, mono or
multi-channel, any sample rate). Compressed formats (MP3/AAC/OGG)
still need external codecs and remain plug-in stubs.

Decode runs inside Arrow-batched mapInPandas workers
(multimodal.decode_audio_stats); a production build would swap in a
C codec behind the same signature.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) == 12 and d[:4] == b"RIFF" and d[8:12] == b"WAVE"


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000
) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as PCM WAV."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"unsupported sample shape {arr.shape}")
    n, ch = arr.shape
    payload = arr.reshape(-1).tobytes()  # interleaved frames
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes to (samples int16 (n, ch), sample_rate).

    Supports format tag 1 (PCM) at 16 bits; raises ValueError on
    compressed/float formats — callers surface that as the
    plug-in-needed path.
    """
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            payload = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: format={audio_format} bits={bits} "
            "(only 16-bit PCM; compressed audio needs an external codec)"
        )
    if block_align != ch * 2:
        raise ValueError("block_align inconsistent with channels/bits")
    samples = np.frombuffer(payload, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch)
    else:
        samples = samples.reshape(-1, 1)
    return samples, sample_rate
