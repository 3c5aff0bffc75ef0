"""Pure-Python RIFF/AVI video container codec — stdlib struct + numpy.

Gives the multimodal surface a REAL video path: frames are carried
in a spec-shaped AVI (hdrl with avih/strh/strf, movi chunk stream,
idx1 index) with two in-container codecs:

- ``rgb``  — uncompressed BI_RGB DIB frames ('00db' chunks):
  bottom-up rows, BGR byte order, rows padded to 4 bytes — the three
  classic DIB gotchas, each of which the closed-form oracles catch
  via a position-weighted checksum.
- ``mjpeg`` — Motion-JPEG ('00dc' chunks, biCompression 'MJPG'):
  every frame is an independent baseline JPEG decoded by the
  existing pure-Python codec in functions/jpeg.py.

Inter-frame codecs (H.264 etc.) need ffmpeg and remain the
documented plug-in point (multimodal.decode_video_stats raises on
unknown biCompression).

Reference parity: the reference engine has no video surface; this
serves SURVEY §2's multimodal rows (video frame-sampling) with a
real container parse instead of the previous fake-only path.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) == 12 and d[:4] == b"RIFF" and d[8:12] == b"AVI "


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def _dib_encode(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up, BGR
    row = bgr.reshape(h, w * 3)
    pad = (-w * 3) % 4
    if pad:
        row = np.concatenate(
            [row, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    return row.tobytes()


def _dib_decode(body: bytes, width: int, height: int) -> np.ndarray:
    pad = (-width * 3) % 4
    stride = width * 3 + pad
    if len(body) < stride * height:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(body[: stride * height], dtype=np.uint8).reshape(
        height, stride
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()  # top-down, RGB


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, codec: str = "rgb"
) -> bytes:
    """Encode frames as an AVI. codec 'rgb': (h, w, 3) uint8 RGB
    DIB frames; codec 'mjpeg': (h, w) greyscale uint8 frames each
    encoded as an independent baseline JPEG (functions/jpeg.py).
    All frames must share one (h, w)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if codec == "rgb":
        handler, compression, bitcount = b"DIB ", 0, 24
        bodies = [_dib_encode(f) for f in frames]
        ckid = b"00db"
    elif codec == "mjpeg":
        from onionnet_spark.functions import jpeg as _jpeg

        handler, compression, bitcount = b"MJPG", struct.unpack("<I", b"MJPG")[0], 8
        bodies = [_jpeg.encode_jpeg(f) for f in frames]
        ckid = b"00dc"
    elif codec == "msvc":
        from onionnet_spark.functions import msvideo1 as _msvc

        handler, compression, bitcount = b"CRAM", struct.unpack("<I", b"CRAM")[0], 16
        bodies = _msvc.encode_msvc_frames(frames)
        ckid = b"00dc"
    else:
        raise ValueError(f"unknown codec {codec!r}")
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (height, width)")
    bufsize = max(len(b) for b in bodies)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        bufsize * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, bufsize, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0,
        1, fps,  # scale / rate -> fps
        0, len(frames), bufsize, 0xFFFFFFFF, 0,
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bitcount, compression,
        bufsize, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(ckid, b) for b in bodies)
    movi = _list(b"movi", movi_body)
    # idx1: offsets are to the ckid, relative to the 'movi' fourcc
    idx = bytearray()
    off = 4
    for b in bodies:
        idx += struct.pack("<4sII I", ckid, 0x10, off, len(b))
        off += 8 + len(b) + (len(b) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (tag, list_type_or_None, body_start, body_len)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > end:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"LIST":
            yield tag, data[pos + 8 : pos + 12], pos + 12, length - 4
        else:
            yield tag, None, pos + 8, length
        pos += 8 + length + (length & 1)


def decode_avi(data: bytes) -> tuple[list[np.ndarray], int]:
    """Decode AVI bytes to ([frames], fps). RGB frames come back
    (h, w, 3) uint8 top-down RGB; MJPEG frames as whatever the JPEG
    decodes to ((h, w) greyscale for the frames this writer emits)."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI: bad RIFF/'AVI ' header")
    width = height = None
    compression = None
    fps = None
    n_frames = None
    frames: list[np.ndarray] = []
    for tag, ltype, start, length in _walk_chunks(data, 12, len(data)):
        if tag == b"LIST" and ltype == b"hdrl":
            for t2, l2, s2, n2 in _walk_chunks(data, start, start + length):
                if t2 == b"avih":
                    hdr = struct.unpack("<IIIIIIIIII", data[s2 : s2 + 40])
                    n_frames = hdr[4]
                elif t2 == b"LIST" and l2 == b"strl":
                    for t3, _l3, s3, n3 in _walk_chunks(data, s2, s2 + n2):
                        if t3 == b"strh":
                            st = struct.unpack("<4s4sIHHIIIIIIII", data[s3 : s3 + 48])
                            if st[0] == b"vids" and st[6]:
                                fps = st[7] // st[6]  # rate / scale
                        elif t3 == b"strf":
                            bmi = struct.unpack("<IiiHHI", data[s3 : s3 + 20])
                            width, height, compression = bmi[1], bmi[2], bmi[5]
        elif tag == b"LIST" and ltype == b"movi":
            if width is None or compression is None:
                raise ValueError("movi before hdrl")
            msvc_fourccs = {
                struct.unpack("<I", cc)[0]
                for cc in (b"CRAM", b"cram", b"MSVC", b"msvc", b"WHAM", b"wham")
            }
            prev555 = None
            for t2, _l2, s2, n2 in _walk_chunks(data, start, start + length):
                if t2[2:4] not in (b"db", b"dc"):
                    continue  # audio / other streams: not ours
                body = data[s2 : s2 + n2]
                if compression == 0:
                    frames.append(_dib_decode(body, width, abs(height)))
                elif compression == struct.unpack("<I", b"MJPG")[0]:
                    from onionnet_spark.functions import jpeg as _jpeg

                    frames.append(_jpeg.decode_jpeg(body))
                elif compression in msvc_fourccs:
                    from onionnet_spark.functions import msvideo1 as _msvc

                    rgb = _msvc.decode_msvc_frame(
                        body, width, abs(height), prev555
                    )
                    prev555 = _msvc._pack555(rgb)
                    frames.append(rgb)
                else:
                    fourcc = struct.pack("<I", compression)
                    raise ValueError(
                        f"unsupported AVI codec {fourcc!r}: only BI_RGB, "
                        "MJPG and MS Video 1 (CRAM) are built in; "
                        "motion-compensated codecs (H.264...) need ffmpeg — "
                        "the documented plug-in point"
                    )
    if fps is None or not frames:
        raise ValueError("missing video stream or frames")
    if n_frames is not None and n_frames != len(frames):
        raise ValueError(f"avih promises {n_frames} frames, movi has {len(frames)}")
    return frames, fps

# ------------------------------------------------------- standalone BMP
# The DIB pixel machinery above IS the BMP payload format; the
# standalone file just adds a 14-byte BITMAPFILEHEADER + the
# BITMAPINFOHEADER the AVI strf already uses.


def is_bmp(data: bytes) -> bool:
    return bytes(data[:2]) == b"BM"


def encode_bmp(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> 24-bit uncompressed BMP (bottom-up BGR
    rows padded to 4 bytes — the classic DIB layout)."""
    h, w, _ = frame.shape
    pixels = _dib_encode(frame)
    header_size = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0
    )
    file_header = struct.pack(
        "<2sIHHI", b"BM", header_size + len(pixels), 0, 0, header_size
    )
    return file_header + info + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w, 3) RGB uint8.
    Top-down DIBs (negative height) are handled; palettized/
    compressed BMPs raise (documented)."""
    data = bytes(data)
    if not is_bmp(data):
        raise ValueError("not a BMP: missing 'BM' magic")
    (_sig, _size, _r1, _r2, offset) = struct.unpack_from("<2sIHHI", data, 0)
    (hsz, w, h, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    body = data[offset:]
    if h >= 0:
        return _dib_decode(body, w, h)
    # top-down DIB: rows already in display order -> undo the flip
    return _dib_decode(body, w, -h)[::-1, :, :].copy()
