"""Motion-compensated video codec — the inter-frame prediction that
defines the H.26x/MPEG family, real end to end: exhaustive
block-matching motion search over the previous RECONSTRUCTED frame,
per-block motion vectors, quantized residual coding (Rice/zigzag),
and skip blocks where prediction is exact. This closes the
'motion-compensated video' gate WITHOUT external libs (no
libx264/ffmpeg in this container): only the bitstream container is
ours ('OMV1'); MS Video 1 (msvideo1.py) covered inter-frame SKIP
prediction, this adds the actual motion vectors + residuals.

Reference parity note: the reference engine has no video path
(saezlab/onionnet is a graph wrapper); this belongs to the
multimodal-pipeline brief (SURVEY §2 #33) next to avi/msvideo1.

Bitstream 'OMV1' (big-endian):
  magic 'OMV1' | u16 w | u16 h | u16 n_frames | u8 block | u8 range
  | u8 qstep
  frame 0 (intra): w*h raw grayscale bytes
  frames 1..n-1 (predicted), per block in raster order:
    u4 dx+range | u4 dy+range | u1 has_residual
    if has_residual: u5 rice k, then block*block Rice(k)-coded
    zigzag residuals; frame payload byte-aligned at frame end.

Motion search: exhaustive SAD over [-range, +range]^2 clamped to the
frame, scanned dy-major with STRICT improvement — deterministic
first-minimum tie-break, so encode is bit-reproducible. qstep=1 is
the LOSSLESS-residual mode: reconstruction is bit-exact, which is
what lets a lossy-family codec carry a full integer hash oracle
(pixel sums and position-weighted checksums of every decoded frame
are closed-form for a torus-shifted synthetic pattern — and the
skip-block count proves the motion search found the true vector
everywhere an in-bounds match exists). qstep>1 is the lossy mode,
pytest-bounded by PSNR.
"""

from __future__ import annotations

import struct

import numpy as np

from onionnet_spark.functions.flac import _BitReader, _BitWriter

MAGIC = b"OMV1"


def is_omv(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == MAGIC


def _search(prev: np.ndarray, cur_blk: np.ndarray, y0: int, x0: int, rng: int):
    """Exhaustive SAD motion search, clamped to the frame; returns
    (dy, dx, sad). Deterministic: dy-major scan, strict improvement."""
    h, w = prev.shape
    b = cur_blk.shape[0]
    best = (0, 0, int(1 << 62))
    for dy in range(-rng, rng + 1):
        sy = y0 + dy
        if sy < 0 or sy + b > h:
            continue
        for dx in range(-rng, rng + 1):
            sx = x0 + dx
            if sx < 0 or sx + b > w:
                continue
            sad = int(
                np.abs(
                    prev[sy : sy + b, sx : sx + b].astype(np.int32)
                    - cur_blk.astype(np.int32)
                ).sum()
            )
            if sad < best[2]:
                best = (dy, dx, sad)
                if sad == 0:
                    return best
    return best


def encode_mc_video(
    frames: np.ndarray, block: int = 8, rng: int = 4, qstep: int = 1
) -> bytes:
    """Encode (n_frames, h, w) uint8 grayscale video to OMV1 bytes.
    h and w must be multiples of `block`; rng <= 7 (4-bit vectors)."""
    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w = fr.shape
    if h % block or w % block:
        raise ValueError("frame dims must be multiples of the block size")
    if not 1 <= rng <= 7:
        raise ValueError("search range must be in [1, 7]")
    if qstep < 1:
        raise ValueError("qstep must be >= 1")
    bw = _BitWriter()
    for byte in MAGIC + struct.pack(">HHHBBB", w, h, n, block, rng, qstep):
        bw.write(byte, 8)
    for byte in fr[0].tobytes():
        bw.write(byte, 8)
    recon = fr[0].astype(np.int32)
    for f in range(1, n):
        cur = fr[f].astype(np.int32)
        new_recon = np.empty_like(recon)
        for y0 in range(0, h, block):
            for x0 in range(0, w, block):
                blk = cur[y0 : y0 + block, x0 : x0 + block]
                dy, dx, sad = _search(recon, blk, y0, x0, rng)
                pred = recon[y0 + dy : y0 + dy + block, x0 + dx : x0 + dx + block]
                res = blk - pred
                q = (
                    np.round(res / qstep).astype(np.int64)
                    if qstep > 1
                    else res.astype(np.int64)
                )
                bw.write(dx + rng, 4)
                bw.write(dy + rng, 4)
                if not q.any():
                    bw.write(0, 1)
                    new_recon[y0 : y0 + block, x0 : x0 + block] = np.clip(
                        pred, 0, 255
                    )
                    continue
                bw.write(1, 1)
                u = (np.abs(q) * 2 - (q < 0)).astype(np.int64).ravel()
                mean = max(1.0, float(u.mean()))
                k = max(0, min(30, int(np.floor(np.log2(mean)))))
                bw.write(k, 5)
                for val in u:
                    bw.write_unary(int(val) >> k)
                    if k:
                        bw.write(int(val) & ((1 << k) - 1), k)
                new_recon[y0 : y0 + block, x0 : x0 + block] = np.clip(
                    pred + q.reshape(block, block) * qstep, 0, 255
                )
        bw.align()
        recon = new_recon
    return bw.getvalue()


def decode_mc_video(data: bytes) -> tuple[np.ndarray, int]:
    """Decode OMV1 bytes to ((n_frames, h, w) uint8, n_skip_blocks)."""
    if not is_omv(data):
        raise ValueError("not an OMV1 stream")
    w, h, n, block, rng, qstep = struct.unpack(">HHHBBB", data[4:13])
    br = _BitReader(data, pos=13)
    first = np.empty(h * w, dtype=np.uint8)
    for i in range(h * w):
        first[i] = br.read(8)
    frames = np.empty((n, h, w), dtype=np.uint8)
    frames[0] = first.reshape(h, w)
    recon = frames[0].astype(np.int32)
    n_skip = 0
    for f in range(1, n):
        new_recon = np.empty_like(recon)
        for y0 in range(0, h, block):
            for x0 in range(0, w, block):
                dx = br.read(4) - rng
                dy = br.read(4) - rng
                # corrupt/truncated streams can carry vectors pointing
                # outside the frame; numpy would silently wrap negative
                # offsets into garbage prediction blocks — fail loudly
                # instead (the decode_mdct clamp convention)
                if not (0 <= y0 + dy <= h - block and 0 <= x0 + dx <= w - block):
                    raise ValueError(
                        f"OMV1 motion vector out of bounds: block ({y0},{x0}) "
                        f"dv=({dy},{dx}) frame {h}x{w}"
                    )
                pred = recon[y0 + dy : y0 + dy + block, x0 + dx : x0 + dx + block]
                if br.read(1) == 0:
                    n_skip += 1
                    new_recon[y0 : y0 + block, x0 : x0 + block] = np.clip(
                        pred, 0, 255
                    )
                    continue
                k = br.read(5)
                if k > 30:  # encoder caps k at 30; 31 means corruption
                    raise ValueError(f"OMV1 invalid Rice parameter k={k}")
                u = np.empty(block * block, dtype=np.int64)
                for i in range(block * block):
                    hi = br.read_unary()
                    lo = br.read(k) if k else 0
                    u[i] = (hi << k) | lo
                q = np.where(u & 1, -((u + 1) >> 1), u >> 1).reshape(block, block)
                new_recon[y0 : y0 + block, x0 : x0 + block] = np.clip(
                    pred + q * qstep, 0, 255
                )
        br.align()
        recon = new_recon
        frames[f] = recon.astype(np.uint8)
    return frames, n_skip


def mc_roundtrip_psnr(frames: np.ndarray, qstep: int = 4) -> float:
    """decode(encode(x)) PSNR in dB over all predicted frames."""
    fr = np.asarray(frames, dtype=np.uint8)
    dec, _ = decode_mc_video(encode_mc_video(fr, qstep=qstep))
    err = fr.astype(np.float64) - dec.astype(np.float64)
    mse = float(np.mean(err * err))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
