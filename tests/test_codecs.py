"""Unit gates for the compressed-audio (G.711, IMA ADPCM) and video
(RIFF/AVI) codecs, complementing the closed-form oracle queries
(multimodal_ulaw_decode ... multimodal_mjpeg_frames): the oracles pin
container-to-stats round-trips; these pin the codec internals on
arbitrary signals the oracles' closed forms can't reach."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from onionnet_spark.functions import adpcm, avi, g711, wav


def _rand16(n, seed=7):
    return np.random.RandomState(seed).randint(-32768, 32768, size=n).astype(np.int16)


# ---------------------------------------------------------------- G.711


def test_g711_roundtrip_matches_scalar_reference():
    x = _rand16(5000)
    assert (
        g711.ulaw_decode(g711.ulaw_encode(x))
        == np.array([g711.ulaw_roundtrip_reference(v) for v in x], dtype=np.int16)
    ).all()
    assert (
        g711.alaw_decode(g711.alaw_encode(x))
        == np.array([g711.alaw_roundtrip_reference(v) for v in x], dtype=np.int16)
    ).all()


def test_g711_quantizer_fixed_points_and_error_bound():
    x = _rand16(5000)
    rt = g711.ulaw_decode(g711.ulaw_encode(x))
    # decoded values are fixed points of the quantizer
    assert (g711.ulaw_decode(g711.ulaw_encode(rt)) == rt).all()
    # error bounded by the top segment's step (2^10), after clipping
    clipped = np.clip(x.astype(np.int64), -g711.ULAW_CLIP, g711.ULAW_CLIP)
    assert np.abs(rt.astype(np.int64) - clipped).max() <= 1024
    rt_a = g711.alaw_decode(g711.alaw_encode(x))
    assert (g711.alaw_decode(g711.alaw_encode(rt_a)) == rt_a).all()
    assert np.abs(rt_a.astype(np.int64) - x.astype(np.int64)).max() <= 1024


def test_g711_decoders_match_itu_tables():
    """Pin both decoders to the ITU G.711 expansion tables via the
    stdlib audioop implementation (skipped once audioop is removed,
    Python >= 3.13 — the scalar-reference test above still pins the
    round-trip)."""
    audioop = pytest.importorskip("audioop")
    codes = np.arange(256, dtype=np.uint8)
    assert (
        g711.ulaw_decode(codes)
        == np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype=np.int16)
    ).all()
    assert (
        g711.alaw_decode(codes)
        == np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype=np.int16)
    ).all()


def test_g711_wav_container_roundtrip_stereo():
    x = _rand16(200).reshape(100, 2)
    for codec, dec_fn, enc_fn in (
        ("ulaw", g711.ulaw_decode, g711.ulaw_encode),
        ("alaw", g711.alaw_decode, g711.alaw_encode),
    ):
        payload = wav.encode_wav(x, 11000, codec=codec)
        dec, sr = wav.decode_wav(payload)
        assert sr == 11000 and dec.shape == (100, 2)
        assert (dec == dec_fn(enc_fn(x.reshape(-1))).reshape(-1, 2)).all()


def test_g711_wav_odd_payload_is_word_aligned():
    # 8-bit mono with an odd sample count -> odd data chunk; the
    # writer must pad and the reader must keep chunk-walking past it.
    x = _rand16(101)
    payload = wav.encode_wav(x, 8000, codec="ulaw")
    dec, _ = wav.decode_wav(payload)
    assert dec.shape == (101, 1)


# ------------------------------------------------------------ IMA ADPCM


def test_adpcm_constant_signal_roundtrips_bit_exactly():
    for v in (-32768, -1001, 0, 5, 1234, 32767):
        sig = np.full(700, v, dtype=np.int16)  # spans two blocks
        dec, sr = wav.decode_wav(wav.encode_wav(sig, 9000, codec="adpcm"))
        assert sr == 9000 and dec.shape == (700, 1)
        assert (dec[:, 0] == v).all()


def test_adpcm_tracks_smooth_signals():
    t = np.arange(4000)
    sig = (2000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    dec, _ = wav.decode_wav(wav.encode_wav(sig, 8000, codec="adpcm"))
    err = np.abs(dec[:, 0].astype(np.int64) - sig.astype(np.int64))
    assert err.mean() < 10 and err.max() < 200
    # a ramp whose slope sits on the initial step's half-bit encodes exactly
    ramp = np.arange(-2000, 2000, 3).astype(np.int16)
    dec, _ = wav.decode_wav(wav.encode_wav(ramp, 8000, codec="adpcm"))
    assert (dec[:, 0] == ramp).all()


def test_adpcm_compression_ratio_and_guards():
    sig = _rand16(2000)
    payload = wav.encode_wav(sig, 8000, codec="adpcm")
    # ~4:1 vs 16-bit PCM (block headers cost a little)
    assert len(payload) < 2000 * 2 // 3
    with pytest.raises(ValueError, match="mono"):
        wav.encode_wav(sig.reshape(-1, 2), 8000, codec="adpcm")
    with pytest.raises(ValueError, match="step index"):
        adpcm.adpcm_decode_blocks(struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4, 8, 3)


def test_adpcm_fact_chunk_truncates_block_padding():
    # 505 samples/block at block_align 256; 510 samples -> the second
    # block is mostly pad, and fact must truncate to exactly 510.
    sig = np.full(510, 77, dtype=np.int16)
    dec, _ = wav.decode_wav(wav.encode_wav(sig, 8000, codec="adpcm"))
    assert dec.shape == (510, 1)


# -------------------------------------------------------------- RIFF/AVI


def test_avi_rgb_roundtrip_exact_with_row_padding():
    rng = np.random.RandomState(3)
    # width 7 -> 21-byte rows padded to 24: exercises the DIB stride
    frames = [rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8) for _ in range(4)]
    dec, fps = avi.decode_avi(avi.encode_avi(frames, fps=12, codec="rgb"))
    assert fps == 12 and len(dec) == 4
    for f, g in zip(frames, dec):
        assert (f == g).all()


def test_avi_mjpeg_roundtrip_on_jpeg_fixed_points():
    frames = [np.full((6, 9), 10 + 2 * i, dtype=np.uint8) for i in range(5)]
    dec, fps = avi.decode_avi(avi.encode_avi(frames, fps=5, codec="mjpeg"))
    assert fps == 5 and len(dec) == 5
    for f, g in zip(frames, dec):
        assert f.shape == g.shape and (f == g).all()


def test_avi_unknown_codec_raises_plugin_point():
    payload = bytearray(
        avi.encode_avi([np.zeros((2, 2, 3), dtype=np.uint8)], codec="rgb")
    )
    pos = payload.find(struct.pack("<I", 0) + struct.pack("<I", 4), 0)
    # overwrite biCompression (offset 16 inside strf) with 'H264'
    strf = payload.find(b"strf")
    payload[strf + 8 + 16 : strf + 8 + 20] = b"H264"
    with pytest.raises(ValueError, match="ffmpeg"):
        avi.decode_avi(bytes(payload))


def test_avi_frame_count_mismatch_raises():
    payload = bytearray(
        avi.encode_avi([np.zeros((2, 2, 3), dtype=np.uint8)] * 3, codec="rgb")
    )
    avih = payload.find(b"avih")
    # dwTotalFrames is the 5th dword of the avih body
    payload[avih + 8 + 16 : avih + 8 + 20] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="promises 99"):
        avi.decode_avi(bytes(payload))


def test_avi_ignores_non_video_stream_chunks():
    base = avi.encode_avi(
        [np.full((2, 2, 3), 9, dtype=np.uint8)] * 2, codec="rgb"
    )
    # splice an audio chunk ('01wb') into movi, fixing both sizes
    payload = bytearray(base)
    movi = payload.find(b"LIST" + struct.pack("<I", 0), 0)
    movi = payload.find(b"movi")
    audio = b"01wb" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    (movi_len,) = struct.unpack("<I", payload[movi - 4 : movi])
    payload[movi - 4 : movi] = struct.pack("<I", movi_len + len(audio))
    payload[movi + 4 : movi + 4] = audio
    (riff_len,) = struct.unpack("<I", payload[4:8])
    payload[4:8] = struct.pack("<I", riff_len + len(audio))
    dec, _ = avi.decode_avi(bytes(payload))
    assert len(dec) == 2 and all((f == 9).all() for f in dec)


# ------------------------------------------------------- Spark plumbing


def test_decode_video_stats_samples_frames(spark):
    from onionnet_spark.functions import multimodal

    df = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    stats = multimodal.decode_video_stats(
        multimodal.synth_avi_payload(df, codec="rgb"), every_n=2
    ).toPandas()
    # doc d has 3 + d%4 frames; sampled = ceil(nf / 2)
    expected_rows = sum((3 + d % 4 + 1) // 2 for d in range(6))
    assert len(stats) == expected_rows
    assert set(stats["frame_idx"]) <= {0, 2, 4}
    # spot-check one frame against direct numpy synthesis
    row = stats[(stats.doc_id == 5) & (stats.frame_idx == 2)].iloc[0]
    d, f = 5, 2
    h, w = 2 + d % 3, 4 + d % 3
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    k = np.arange(3)[None, None, :]
    px = (d * 7 + f * 19 + r * 13 + c * 31 + k * 17) % 256
    assert row.pixel_sum == px.sum()
    assert row.pos_checksum == (px * (1 + r * 3 + c * 5 + k * 7)).sum()


def test_decode_audio_stats_dispatches_compressed_formats(spark):
    from onionnet_spark.functions import multimodal

    df = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    for maker in (
        lambda d: multimodal.synth_g711_wav_payload(d, "ulaw"),
        lambda d: multimodal.synth_g711_wav_payload(d, "alaw"),
        multimodal.synth_adpcm_wav_payload,
    ):
        out = multimodal.decode_audio_stats(maker(df)).toPandas()
        assert len(out) == 4 and (out["n_samples"] > 0).all()


# ------------------------------------------- JPEG: 4:2:0 + progressive


def test_jpeg_420_roundtrip_tolerance_and_uniform_exact():
    from onionnet_spark.functions import jpeg

    img = np.zeros((20, 30, 3), dtype=np.uint8)
    for c in range(3):
        img[:, :, c] = (
            np.add.outer(np.arange(20) * 3, np.arange(30) * 2) + c * 10
        ) % 200
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsampling="420"))
    assert dec.shape == img.shape
    # chroma is quarter-resolution: looser bound than 4:4:4
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16
    # grey RGB uniform: Cb/Cr sit exactly on 128 -> bit-exact
    for v in (0, 44, 128, 254):
        g = np.full((11, 13, 3), v, dtype=np.uint8)
        assert (jpeg.decode_jpeg(jpeg.encode_jpeg(g, subsampling="420")) == g).all()


def test_jpeg_progressive_equals_baseline_decode_exactly():
    """Progressive layering is entropy-only: same quantized
    coefficients, so decode parity with baseline must be EXACT —
    this pins the whole SOF2 scan script (DC successive
    approximation, raw-bit refinement, AC-first EOB runs, AC
    refinement correction bits) on arbitrary images."""
    from onionnet_spark.functions import jpeg

    rng = np.random.RandomState(11)
    for shape in [(6, 9), (16, 16), (17, 23, 3), (8, 8), (25, 14, 3), (1, 1)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        b = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
        p = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img))
        assert b.shape == p.shape and (b == p).all(), shape
    for shape in [(17, 23, 3), (32, 32, 3), (9, 9, 3)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, subsampling="420"))
        p = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, subsampling="420"))
        assert (b == p).all(), shape


def test_jpeg_progressive_eob_runs_span_blocks():
    from onionnet_spark.functions import jpeg

    # near-uniform 64x64: most blocks are AC-empty, so the AC-first
    # scan must code multi-block EOBn runs (the EOBRUN > 1 paths)
    img = np.full((64, 64), 100, dtype=np.uint8)
    img[5, 7] = 180
    img[40, 40] = 20
    data = jpeg.encode_jpeg_progressive(img)
    assert data.count(b"\xff\xda") == 4  # DC first/refine + AC first/refine
    assert (jpeg.decode_jpeg(data) == jpeg.decode_jpeg(jpeg.encode_jpeg(img))).all()


def test_jpeg_progressive_is_smaller_scan_structure():
    from onionnet_spark.functions import jpeg

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(24, 24, 3)).astype(np.uint8)
    data = jpeg.encode_jpeg_progressive(img, subsampling="420")
    # SOF2 frame marker present, 8 scans (2 DC + 3x2 AC)
    assert b"\xff\xc2" in data
    assert data.count(b"\xff\xda") == 8


def test_audio_window_rms_partial_window_and_flags(spark):
    from onionnet_spark.functions import multimodal

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = multimodal.audio_window_rms(
        multimodal.synth_wav_payload(df), window=16, silence_rms=600
    ).toPandas()
    # doc d has 40 + d%13 samples -> last window is partial
    for d in range(5):
        n = 40 + d % 13
        rows = out[out.doc_id == d].sort_values("win_idx")
        assert list(rows.n_samples)[:-1] == [16] * (len(rows) - 1)
        assert rows.n_samples.sum() == n
    assert set(out.is_silence) == {0, 1}


def test_video_scene_cuts_still_frames_are_not_cuts(spark):
    from onionnet_spark.functions import multimodal

    df = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    out = multimodal.video_scene_cuts(
        multimodal.synth_scene_avi_payload(df), cut_mean_diff=10
    ).toPandas()
    # even ids repeat frames: odd frame_idx pairs are identical -> sad 0
    even = out[(out.doc_id % 2 == 0) & (out.frame_idx % 2 == 1)]
    assert len(even) > 0 and (even.sad == 0).all() and (even.is_cut == 0).all()
    moving = out[out.doc_id % 2 == 1]
    assert len(moving) > 0 and (moving.is_cut == 1).all()


# ----------------------------------------------------------------- FLAC


def _flac():
    from onionnet_spark.functions import flac

    return flac


def test_flac_roundtrip_arbitrary_samples_bit_exact():
    flac = _flac()
    for shape, seed in [((40,), 1), ((4097, 2), 2), ((9000, 3), 3), ((1,), 4)]:
        x = np.random.RandomState(seed).randint(
            -32768, 32768, size=shape
        ).astype(np.int16)
        dec, sr = flac.decode_flac(flac.encode_flac(x, 44100))
        want = x[:, None] if x.ndim == 1 else x
        assert sr == 44100
        assert np.array_equal(dec, want)


def test_flac_fixed_predictors_compress_smooth_signals():
    flac = _flac()
    t = np.arange(12000)
    x = (2000 * np.sin(t / 80)).astype(np.int16)
    enc = flac.encode_flac(x, 8000)
    dec, _ = flac.decode_flac(enc)
    assert np.array_equal(dec[:, 0], x)
    assert len(enc) < 0.25 * x.size * 2  # Rice-coded residuals, not verbatim

    const = flac.encode_flac(np.full(4096, 77, np.int16))
    assert len(const) < 80  # CONSTANT subframe


def test_flac_crc_and_md5_catch_corruption():
    flac = _flac()
    enc = bytearray(flac.encode_flac(_rand16(500, seed=11)))
    enc[60] ^= 0x01
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc))


def _flac_stream(subframe_bits, bs, ch=1, stereo_code=None, total=None):
    """Hand-build a single-frame FLAC stream around raw subframe bits
    (list of (writer_fn) callbacks) to reach decoder-only paths."""
    flac = _flac()
    bw = flac._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4)
    bw.write(0, 4)
    bw.write(stereo_code if stereo_code is not None else ch - 1, 4)
    bw.write(0b100, 3)
    bw.write(0, 1)
    header = bw.getvalue() + flac._utf8_encode(0) + struct.pack(">H", bs - 1)
    header += bytes([flac._crc8(header)])
    body = flac._BitWriter()
    for fn in subframe_bits:
        fn(body)
    body.align()
    frame = header + body.getvalue()
    frame += struct.pack(">H", flac._crc16(frame))
    si = flac._BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 48)
    si.write(8000, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)
    si.write(total if total is not None else bs, 36)
    streaminfo = si.getvalue() + b"\x00" * 16  # MD5 unset -> skip check
    return (
        b"fLaC"
        + bytes([0x80])
        + struct.pack(">I", len(streaminfo))[1:]
        + streaminfo
        + frame
    )


def test_flac_decodes_lpc_subframes():
    flac = _flac()
    # LPC order 2, coefs [2, -1] at shift 0 == FIXED order 2: x[i]
    # follows a line, all residuals 0.
    bs = 16
    want = np.arange(100, 100 + 3 * bs, 3, dtype=np.int64)

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b100001, 6)  # LPC, order (1)+1 = 2
        bw.write(0, 1)
        bw.write_signed(int(want[0]), 16)
        bw.write_signed(int(want[1]), 16)
        bw.write(3, 4)  # precision 4 bits
        bw.write_signed(0, 5)  # shift 0
        bw.write_signed(2, 4)
        bw.write_signed(-1, 4)
        bw.write(0, 2)  # RICE
        bw.write(0, 4)  # partition order 0
        bw.write(0, 4)  # k = 0
        for _ in range(bs - 2):
            bw.write_unary(0)  # residual 0

    dec, _ = flac.decode_flac(_flac_stream([sub], bs))
    assert np.array_equal(dec[:, 0], want.astype(np.int16))


def test_flac_decodes_rice2_and_partitions():
    flac = _flac()
    bs = 16
    vals = np.array([5, -3, 7, 0, 2, 9, -8, 1] * 2, dtype=np.int64)

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b001000, 6)  # FIXED order 0 -> residual == sample
        bw.write(0, 1)
        bw.write(1, 2)  # RICE2 (5-bit params)
        bw.write(1, 4)  # partition order 1 -> two partitions of 8
        for part in (vals[:8], vals[8:]):
            bw.write(2, 5)  # k = 2
            for v in part:
                u = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
                bw.write_unary(u >> 2)
                bw.write(u & 3, 2)

    dec, _ = flac.decode_flac(_flac_stream([sub], bs))
    assert np.array_equal(dec[:, 0], vals.astype(np.int16))


def test_flac_decodes_stereo_decorrelation():
    flac = _flac()
    bs = 8
    left = np.array([100, -5, 38, 0, 7, 7, -100, 55], dtype=np.int64)
    right = np.array([90, -5, 40, 1, -7, 6, -100, 54], dtype=np.int64)

    def verbatim(vals, bits):
        def sub(bw):
            bw.write(0, 1)
            bw.write(0b000001, 6)
            bw.write(0, 1)
            for v in vals:
                bw.write_signed(int(v), bits)

        return sub

    # left-side (code 8): side = left - right, side gets 17 bits
    data = _flac_stream(
        [verbatim(left, 16), verbatim(left - right, 17)],
        bs, ch=2, stereo_code=8,
    )
    dec, _ = flac.decode_flac(data)
    assert np.array_equal(dec[:, 0], left) and np.array_equal(dec[:, 1], right)

    # mid-side (code 10): mid = (l+r)>>1, side = l-r, side 17 bits
    mid, side = (left + right) >> 1, left - right
    data = _flac_stream(
        [verbatim(mid, 16), verbatim(side, 17)], bs, ch=2, stereo_code=10
    )
    dec, _ = flac.decode_flac(data)
    assert np.array_equal(dec[:, 0], left) and np.array_equal(dec[:, 1], right)


def test_flac_decodes_wasted_bits_and_escape_residuals():
    flac = _flac()
    bs = 8
    vals = np.array([-1024, 512, 2048, 0, 256, -512, 768, 1280], dtype=np.int64)
    assert np.all(vals % 256 == 0)

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b000001, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(7)  # 8 wasted bits
        for v in vals >> 8:
            bw.write_signed(int(v), 8)  # bps 16 - 8

    dec, _ = flac.decode_flac(_flac_stream([sub], bs))
    assert np.array_equal(dec[:, 0], vals.astype(np.int16))

    def sub_escape(bw):
        bw.write(0, 1)
        bw.write(0b001000, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)  # RICE
        bw.write(0, 4)  # partition order 0
        bw.write(0xF, 4)  # escape
        bw.write(16, 5)  # raw 16-bit residuals
        for v in vals:
            bw.write_signed(int(v), 16)

    dec, _ = flac.decode_flac(_flac_stream([sub_escape], bs))
    assert np.array_equal(dec[:, 0], vals.astype(np.int16))


def test_flac_audio_stats_dispatch(spark):
    from onionnet_spark.functions import multimodal

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    payload = multimodal.synth_flac_payload(df)
    rows = {
        r["doc_id"]: r
        for r in multimodal.decode_audio_stats(payload).collect()
    }
    for d in range(3):
        n, ch = 4090 + d % 20, 1 + d % 2
        t = np.arange(n)[:, None]
        c = np.arange(ch)[None, :]
        s = ((d * 37 + t + c * 5) % 997) - 498
        assert rows[d]["n_samples"] == n
        assert rows[d]["n_channels"] == ch
        assert rows[d]["sample_sum"] == int(s.sum())
        assert rows[d]["peak_abs"] == int(np.abs(s).max())


# ----------------------------------------------------- MS Video 1 (CRAM)


def _msvc():
    from onionnet_spark.functions import msvideo1

    return msvideo1


def _solid_block_frames(nf, h, w, seed):
    """Frames of solid 4x4 blocks, colors multiples of 8 (RGB555-
    exact); ~1/4 of blocks change per frame."""
    r = np.random.RandomState(seed)
    base = (r.randint(0, 32, size=(h // 4, w // 4, 3)) * 8).astype(np.uint8)
    cur = np.kron(base, np.ones((4, 4, 1), dtype=np.uint8))
    frames = [cur.copy()]
    for _ in range(1, nf):
        nxt = cur.copy()
        nb = (h // 4) * (w // 4)
        for b in r.randint(0, nb, size=max(1, nb // 4)):
            by, bx = divmod(int(b), w // 4)
            nxt[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = (
                r.randint(0, 32, size=3) * 8
            ).astype(np.uint8)
        frames.append(nxt)
        cur = nxt
    return frames


def test_msvc_interframe_roundtrip_exact_with_skip_runs():
    mv = _msvc()
    frames = _solid_block_frames(5, 16, 24, seed=11)
    enc = avi.encode_avi(frames, fps=12, codec="msvc")
    dec, fps = avi.decode_avi(enc)
    assert fps == 12 and len(dec) == 5
    for got, want in zip(dec, frames):
        assert np.array_equal(got, want)
    # temporal prediction is real: later chunks are smaller (skip runs)
    chunks = mv.encode_msvc_frames(frames)
    assert all(len(c) < len(chunks[0]) for c in chunks[1:])
    # an unchanged frame is ONE skip-run opcode (2 bytes)
    still = mv.encode_msvc_frames([frames[0], frames[0]])
    assert len(still[1]) == 2


def test_msvc_two_and_eight_color_blocks_exact():
    mv = _msvc()
    f = np.zeros((8, 8, 3), np.uint8)
    f[:4, :4] = [8, 16, 24]
    f[0, 1] = f[2, 3] = [240, 8, 64]   # 2-color block
    f[:4, 4:] = [32, 64, 96]           # solid
    f[4:, :4] = [8, 8, 8]
    f[4, :4] = f[6, :4] = [128, 136, 8]  # 2-color, row-striped
    dec = mv.decode_msvc_frame(mv.encode_msvc_frames([f])[0], 8, 8)
    assert np.array_equal(dec, f)

    f = np.zeros((4, 4, 3), np.uint8)  # 8-color: 2 colors per quadrant
    for qi, (qy, qx) in enumerate([(0, 0), (0, 2), (2, 0), (2, 2)]):
        f[qy : qy + 2, qx : qx + 2] = (8 * qi + 8, 8 * qi + 16, 8 * qi + 24)
        f[qy, qx] = (200, 8 * qi + 8, 48)
    dec = mv.decode_msvc_frame(mv.encode_msvc_frames([f])[0], 4, 4)
    assert np.array_equal(dec, f)


def test_msvc_mask_bit15_constraint_forces_color_swap():
    mv = _msvc()
    # top-right pixel (decode-order bit 15) holds the LOWER-sorting
    # color: without the encoder's pair swap the mask word would set
    # bit 15 and be misparsed as a 1-color opcode.
    f = np.full((4, 4, 3), 240, np.uint8)
    f[0, 3] = [8, 8, 8]
    chunk = mv.encode_msvc_frames([f])[0]
    words = struct.unpack(f"<{len(chunk) // 2}H", chunk)
    assert words[0] < 0x8000  # mask parses as 2/8-color, not 1-color
    dec = mv.decode_msvc_frame(chunk, 4, 4)
    assert np.array_equal(dec, f)


def test_msvc_skip_opcode_space_collision_colors():
    mv = _msvc()
    # RGB555 colors 0x0400-0x07FF collide with skip opcodes when
    # emitted as 1-color blocks; the encoder must use a degenerate
    # 2-color block instead.
    f = np.full((4, 4, 3), [8, 200, 100], np.uint8)
    c555 = (1 << 10) | ((200 >> 3) << 5) | (100 >> 3)
    assert 0x0400 <= c555 <= 0x07FF
    chunk = mv.encode_msvc_frames([f])[0]
    words = struct.unpack(f"<{len(chunk) // 2}H", chunk)
    assert (words[0] >> 8) & 0xFC != 0x84  # not parseable as a skip
    dec = mv.decode_msvc_frame(chunk, 4, 4)
    assert np.array_equal(dec, (f >> 3) << 3)


def test_msvc_lossy_fallback_is_bounded():
    mv = _msvc()
    rs = np.random.RandomState(5)
    noise = rs.randint(0, 256, size=(8, 12, 3)).astype(np.uint8)
    dec = mv.decode_msvc_frame(mv.encode_msvc_frames([noise])[0], 12, 8)
    assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 72

    h = w = 16
    r, c = np.arange(h)[:, None], np.arange(w)[None, :]
    grad = np.stack(
        [(r * 8 + c) % 256, (r * 4 + c * 2) % 256,
         np.broadcast_to((c * 8) % 256, (h, w))],
        axis=2,
    ).astype(np.uint8)
    dec = mv.decode_msvc_frame(mv.encode_msvc_frames([grad])[0], w, h)
    # structured content sits at the RGB555 quantization floor
    assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 6


def test_msvc_guards():
    mv = _msvc()
    with pytest.raises(ValueError):
        mv.encode_msvc_frames([np.zeros((6, 8, 3), np.uint8)])  # h % 4
    with pytest.raises(ValueError):
        mv.decode_msvc_frame(b"\x01\x84", 4, 4)  # skip with no prior frame
    with pytest.raises(ValueError):
        mv.decode_msvc_frame(b"\x00", 4, 4)  # truncated word


# ------------------------------------------------------------------ WARC


def _warc():
    from onionnet_spark.functions import warc

    return warc


def _warc_records():
    return [
        {"warc_type": "warcinfo", "payload": b"software: test"},
        {
            "warc_type": "response",
            "url": "https://example.org/a",
            "payload": b"hello world \x00\xff binary ok",
        },
        {"warc_type": "response", "url": "https://example.org/b", "payload": b""},
    ]


def test_warc_roundtrip_plain_and_member_gzipped():
    warc = _warc()
    recs = _warc_records()
    for gz in (False, True):
        data = warc.encode_warc(recs, gzip_members=gz)
        out = warc.decode_warc(data)
        assert [r["warc_type"] for r in out] == [
            "warcinfo", "response", "response",
        ]
        assert out[0]["url"] is None
        assert out[1]["url"] == "https://example.org/a"
        assert [r["payload"] for r in out] == [r["payload"] for r in recs]


def test_warc_gzip_members_are_independent():
    # the Common Crawl property: each record is its own gzip member,
    # so a reader can start at any member boundary
    warc = _warc()
    recs = _warc_records()
    data = warc.encode_warc(recs, gzip_members=True)
    # find the second member by its gzip magic and decode the tail
    second = data.find(b"\x1f\x8b", 2)
    assert second > 0
    tail = warc.decode_warc(data[second:])
    assert [r["warc_type"] for r in tail] == ["response", "response"]
    assert tail[0]["payload"] == recs[1]["payload"]


def test_warc_strict_parse_raises():
    warc = _warc()
    recs = _warc_records()
    plain = bytearray(warc.encode_warc(recs, gzip_members=False))
    with pytest.raises(ValueError, match="version line"):
        warc.decode_warc(b"HTTP/1.0 200 OK\r\n\r\n")
    # truncate the final terminator
    with pytest.raises(ValueError, match="terminator"):
        warc.decode_warc(bytes(plain[:-2]))
    # corrupt a gzip member
    gz = bytearray(warc.encode_warc(recs, gzip_members=True))
    gz[12] ^= 0xFF
    with pytest.raises((ValueError, Exception)):
        warc.decode_warc(bytes(gz))


# ------------------------------------------------------------------- GIF


def _gif():
    from onionnet_spark.functions import gif

    return gif


def test_gif_lzw_stress_roundtrip():
    gif = _gif()
    rng = np.random.RandomState(9)
    cases = [
        (np.zeros(64, np.uint8), 2),        # KwKwK chain + final-code
        (np.zeros(100000, np.uint8), 2),    # width schedule to 12 bits
        (rng.randint(0, 4, 50000).astype(np.uint8), 2),
        (rng.randint(0, 256, 120000).astype(np.uint8), 8),  # dict reset
        (np.tile(np.arange(256, dtype=np.uint8), 500), 8),
    ]
    for idx, mcs in cases:
        enc = gif._lzw_encode(idx, mcs)
        assert np.array_equal(gif._lzw_decode(enc, mcs, len(idx)), idx)


def test_gif_animated_roundtrip_exact():
    gif = _gif()
    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, size=(7, 3)).astype(np.uint8)
    frames = [pal[rng.randint(0, 7, size=(13, 17))] for _ in range(4)]
    dec, delay = gif.decode_gif(gif.encode_gif(frames, delay_cs=12))
    assert delay == 12 and len(dec) == 4
    for got, want in zip(dec, frames):
        assert np.array_equal(got, want)


def test_gif_full_palette_and_compression():
    gif = _gif()
    rng = np.random.RandomState(2)
    pal = np.array(
        [[i, (i * 3) % 256, (i * 7) % 256] for i in range(256)], np.uint8
    )
    img = pal[rng.randint(0, 256, size=(64, 64))]
    assert np.array_equal(gif.decode_gif(gif.encode_gif([img]))[0][0], img)
    rep = pal[np.tile(np.arange(256).reshape(16, 16), (16, 16))]
    enc = gif.encode_gif([rep])
    assert np.array_equal(gif.decode_gif(enc)[0][0], rep)
    assert len(enc) < rep.size // 4  # LZW actually compresses


def test_gif_guards():
    gif = _gif()
    with pytest.raises(ValueError, match="palette"):
        img = np.random.RandomState(1).randint(0, 256, size=(20, 20, 3))
        gif.encode_gif([img.astype(np.uint8)])  # ~400 distinct colors
    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"PNG whatever")


def test_gif_interlace_roundtrip_and_row_order():
    gif = _gif()
    # row-identifiable frame: pixel value encodes its row
    h, w = 11, 5
    pal = np.array([[r * 16, r * 8, r] for r in range(h)], np.uint8)
    img = pal[np.repeat(np.arange(h), w).reshape(h, w)]
    enc = gif.encode_gif([img], interlace=True)
    dec, _ = gif.decode_gif(enc)
    assert np.array_equal(dec[0], img)
    # the stored row order really is the spec's 4-pass sequence
    order = list(gif._interlace_order(h))
    assert order == [0, 8, 4, 2, 6, 10, 1, 3, 5, 7, 9]
    # the flag genuinely changes the stored pixel stream (rows are
    # physically permuted, not just flagged)
    plain = gif.encode_gif([img], interlace=False)
    assert plain != enc


# ------------------------------------------------------------------ TIFF


def _tiff():
    from onionnet_spark.functions import tiff

    return tiff


def test_tiff_roundtrip_all_compressions_multipage():
    tiff = _tiff()
    rng = np.random.RandomState(4)
    for comp in (tiff.COMP_NONE, tiff.COMP_PACKBITS, tiff.COMP_LZW):
        for pred in (False, True):
            pages = [
                rng.randint(0, 256, size=(9, 13)).astype(np.uint8),
                rng.randint(0, 256, size=(9, 13)).astype(np.uint8),
            ]
            dec = tiff.decode_tiff(
                tiff.encode_tiff(pages, compression=comp, predictor=pred)
            )
            assert len(dec) == 2
            for got, want in zip(dec, pages):
                assert np.array_equal(got, want)
            rgb = [rng.randint(0, 256, size=(7, 5, 3)).astype(np.uint8)]
            dec = tiff.decode_tiff(
                tiff.encode_tiff(rgb, compression=comp, predictor=pred)
            )
            assert np.array_equal(dec[0], rgb[0])


def test_tiff_lzw_early_change_schedule():
    tiff = _tiff()
    # TIFF LZW bumps the code width when the next code would reach
    # 2^width - 1 — ONE entry earlier than GIF. A stream crossing the
    # 9->10 bit boundary decodes correctly only if both sides agree.
    data = bytes(range(256)) * 4  # 258+ distinct-entry growth fast
    assert tiff._tlzw_decode(tiff._tlzw_encode(data), len(data)) == data
    runs = b"\x00" * 100000  # KwKwK chains deep into 12-bit + reset
    assert tiff._tlzw_decode(tiff._tlzw_encode(runs), len(runs)) == runs
    # and it genuinely differs from GIF's schedule: same payload,
    # different bitstreams
    from onionnet_spark.functions import gif

    idx = np.frombuffer(bytes(range(256)) * 2, np.uint8)
    assert tiff._tlzw_encode(bytes(idx)) != gif._lzw_encode(idx, 8)


def test_tiff_predictor_improves_smooth_content():
    tiff = _tiff()
    smooth = (
        (np.arange(200)[:, None] + np.arange(300)[None, :]) % 256
    ).astype(np.uint8)
    with_pred = tiff.encode_tiff([smooth], predictor=True)
    without = tiff.encode_tiff([smooth], predictor=False)
    assert len(with_pred) < len(without) / 3
    assert np.array_equal(tiff.decode_tiff(with_pred)[0], smooth)


def test_tiff_guards():
    tiff = _tiff()
    # big-endian is SUPPORTED as of r9 (byte-order-parametrized IFD
    # walker); a bare MM header with a null IFD pointer now parses to
    # "no pages" instead of the old unsupported-byte-order raise
    with pytest.raises(ValueError, match="no pages"):
        tiff.decode_tiff(b"MM\x00*" + b"\x00" * 8)
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff.decode_tiff(b"PNG....")
    enc = bytearray(tiff.encode_tiff([np.zeros((4, 4), np.uint8)]))
    # flip compression tag value to JPEG-in-TIFF (7): find tag 259
    i = enc.find(struct.pack("<HHI", 259, 3, 1))
    enc[i + 8] = 7
    with pytest.raises(ValueError, match="compression 7"):
        tiff.decode_tiff(bytes(enc))


def test_tiff_bigendian_roundtrip_and_cross_endian_equality():
    """'MM\\x00*' files must decode bit-identically to their 'II*\\x00'
    twins across all three compressions, gray and RGB; the containers
    themselves must genuinely differ (r9, SURVEY row 33a19)."""
    from onionnet_spark.functions import tiff

    rng = np.random.RandomState(9)
    for comp in (tiff.COMP_NONE, tiff.COMP_PACKBITS, tiff.COMP_LZW):
        for shape in [(5, 7), (4, 6, 3)]:
            pages = [
                rng.randint(0, 256, shape).astype(np.uint8) for _ in range(3)
            ]
            le = tiff.encode_tiff(pages, compression=comp, byteorder="<")
            be = tiff.encode_tiff(pages, compression=comp, byteorder=">")
            assert le[:4] == b"II*\x00" and be[:4] == b"MM\x00*"
            assert le != be
            for a, b, want in zip(tiff.decode_tiff(le), tiff.decode_tiff(be), pages):
                got_a = a if a.ndim == len(shape) else a
                assert (got_a == b).all() and (b.reshape(shape) == want).all()


def test_tiff_bigendian_inline_short_placement():
    """The classic endianness bug: an inline SHORT lives in the FIRST
    two bytes of the value field in EITHER byte order (spec 4.6.2).
    Decode a big-endian file whose width/height only parse correctly
    under that rule (a full big-endian 'I' read would yield w<<16)."""
    from onionnet_spark.functions import tiff

    page = np.arange(20, dtype=np.uint8).reshape(4, 5)
    be = tiff.encode_tiff([page], compression=tiff.COMP_NONE, byteorder=">")
    (dec,) = tiff.decode_tiff(be)
    assert dec.shape == (4, 5) and (dec == page).all()


def test_tiff_bad_byteorder_param_raises():
    from onionnet_spark.functions import tiff

    with pytest.raises(ValueError, match="byteorder"):
        tiff.encode_tiff([np.zeros((2, 2), np.uint8)], byteorder="x")


def test_png_adam7_interlace_roundtrip_and_stream_difference():
    """Adam7 files must decode bit-identically to their sequential
    twins on every shape class (sub-8x8 images skip passes; the 9x13
    class exercises all seven), and the containers must genuinely
    differ (r9, SURVEY row 33a2)."""
    from onionnet_spark.functions import png

    rng = np.random.RandomState(11)
    for shape in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 13), (13, 11, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        plain = png.encode_png(img, interlace=False)
        inter = png.encode_png(img, interlace=True)
        assert plain != inter
        assert (png.decode_png(plain) == img).all()
        assert (png.decode_png(inter) == img).all()
    # IHDR interlace flag is genuinely set (sig 8 + len 4 + tag 4 +
    # 12 body bytes before the interlace byte)
    assert inter[28] == 1 and plain[28] == 0
