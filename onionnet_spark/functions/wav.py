"""Minimal pure-Python WAV (RIFF/PCM) codec — stdlib struct only.

Companion to functions/png.py: the audio half of the multimodal
decode surface gets a REAL in-container path — 16-bit PCM (mono or
multi-channel, any sample rate) plus COMPRESSED formats G.711
mu-law/A-law (format tags 7/6, functions/g711.py) and IMA ADPCM
(tag 0x11, functions/adpcm.py), all dispatched by the fmt chunk's
format tag exactly as a libsndfile-backed build would. Frame-based
codecs (MP3/AAC/OGG) still need external decoders and remain
plug-in stubs.

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


FORMAT_PCM = 1
FORMAT_ALAW = 6
FORMAT_ULAW = 7
FORMAT_IMA_ADPCM = 0x11


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, codec: str = "pcm"
) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as WAV.

    codec: 'pcm' (format tag 1, 16-bit linear), 'ulaw' / 'alaw'
    (tags 7 / 6, G.711 companding via functions/g711.py, 8-bit), or
    'adpcm' (tag 0x11, IMA ADPCM via functions/adpcm.py, 4-bit,
    mono only, with the spec's extended fmt + 'fact' chunks).
    """
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"unsupported sample shape {arr.shape}")
    n, ch = arr.shape
    extra = b""
    if codec == "pcm":
        tag, bits, block_align = FORMAT_PCM, 16, ch * 2
        payload = arr.reshape(-1).tobytes()  # interleaved frames
    elif codec in ("ulaw", "alaw"):
        from onionnet_spark.functions import g711 as _g711

        enc = _g711.ulaw_encode if codec == "ulaw" else _g711.alaw_encode
        tag = FORMAT_ULAW if codec == "ulaw" else FORMAT_ALAW
        bits, block_align = 8, ch
        payload = enc(arr.reshape(-1)).tobytes()
    elif codec == "adpcm":
        from onionnet_spark.functions import adpcm as _adpcm

        if ch != 1:
            raise ValueError(
                "IMA ADPCM writer is mono-only (interleaved multi-channel "
                "nibble groups are the documented plug-in point)"
            )
        tag, bits, block_align = FORMAT_IMA_ADPCM, 4, 256
        payload, spb = _adpcm.adpcm_encode_blocks(arr[:, 0], block_align)
        extra = struct.pack("<HH", 2, spb)  # cbSize=2, wSamplesPerBlock
    else:
        raise ValueError(f"unknown codec {codec!r}")
    byte_rate = (
        sample_rate * block_align
        if codec != "adpcm"
        else (sample_rate * block_align + spb - 1) // spb
    )
    fmt = struct.pack(
        "<HHIIHH", tag, ch, sample_rate, byte_rate, block_align, bits
    ) + extra
    fact = (
        b"fact" + struct.pack("<II", 4, n) if codec != "pcm" else b""
    )  # non-PCM WAVs carry the true frame count
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes to (samples int16 (n, ch), sample_rate).

    Real decode paths: format tag 1 (16-bit linear PCM), tags 7 / 6
    (G.711 mu-law / A-law via functions/g711.py) and tag 0x11 (IMA
    ADPCM via functions/adpcm.py, mono).  Compressed payloads come
    back as the DECODED linear int16 samples, so downstream stats /
    resample / fingerprint operators are codec-agnostic.  Float PCM
    and frame-based codecs (MP3/AAC) still raise — the external-codec
    plug-in point.
    """
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    fmt_body = b""
    payload = None
    n_frames_fact = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif tag == b"data":
            payload = body
        elif tag == b"fact" and length >= 4:
            (n_frames_fact,) = struct.unpack("<I", body[:4])
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format == FORMAT_PCM and bits == 16:
        if block_align != ch * 2:
            raise ValueError("block_align inconsistent with channels/bits")
        samples = np.frombuffer(payload, dtype="<i2")
    elif audio_format in (FORMAT_ULAW, FORMAT_ALAW) and bits == 8:
        from onionnet_spark.functions import g711 as _g711

        dec = (
            _g711.ulaw_decode
            if audio_format == FORMAT_ULAW
            else _g711.alaw_decode
        )
        samples = dec(np.frombuffer(payload, dtype=np.uint8))
    elif audio_format == FORMAT_IMA_ADPCM:
        from onionnet_spark.functions import adpcm as _adpcm

        if ch != 1:
            raise ValueError("IMA ADPCM reader is mono-only")
        if len(fmt_body) < 20:
            raise ValueError("IMA ADPCM fmt chunk missing wSamplesPerBlock")
        (spb,) = struct.unpack("<H", fmt_body[18:20])
        if spb != (block_align - 4) * 2 + 1:
            raise ValueError("wSamplesPerBlock inconsistent with block_align")
        n_blocks = (len(payload) + block_align - 1) // block_align
        n = n_frames_fact if n_frames_fact is not None else n_blocks * spb
        samples = _adpcm.adpcm_decode_blocks(payload, block_align, n)
    else:
        raise ValueError(
            f"unsupported WAV: format={audio_format} bits={bits} "
            "(PCM/G.711/IMA-ADPCM are built in; float PCM and MP3/AAC "
            "need an external codec)"
        )
    if ch > 1:
        samples = samples.reshape(-1, ch)
    else:
        samples = samples.reshape(-1, 1)
    return samples, sample_rate
