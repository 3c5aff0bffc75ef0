"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an
opaque `binary` column (or a pointer to object storage); metadata
(mime, byte length, content hash) is typed columns computed
JVM-side; decode / feature-extraction runs in Arrow-batched
`mapInPandas` so Python touches data only in vectorized batches.

PNG, JPEG (baseline + progressive), PCM-WAV, COMPRESSED audio (G.711 mu-law/A-law,
IMA ADPCM — functions/g711.py, functions/adpcm.py, dispatched by the
WAV format tag) and VIDEO (RIFF/AVI container with BI_RGB and
Motion-JPEG streams — functions/avi.py) all have REAL pure-Python
codecs: encode, decode, nearest-neighbor resize, nearest-sample
resample, frame sampling and perceptual dHash run for real through
mapInPandas; JPEG covers baseline AND progressive (SOF2) with 4:2:0
subsampling. Formats that need PIL/ffmpeg/librosa (inter-frame
video codecs, MP3/AAC, lossless/arithmetic JPEG) keep stubbed
plug-in gates: those paths raise NotImplementedError unless
`fake=True`, whose deterministic fake exercises the full Spark
plumbing — schema, batching, partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Make a multimodal-shaped frame from the documents table:
    payload = utf-8 bytes of the text (stand-in for image bytes),
    plus typed metadata computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _decode_any_image(payload) -> "np.ndarray":
    """Signature-dispatched real decode: PNG via functions/png.py,
    JPEG (baseline or progressive) via functions/jpeg.py; anything
    else raises
    NotImplementedError (the plug-in point a PIL/ffmpeg-backed build
    fills for video frames and exotic formats)."""
    from onionnet_spark.functions import avi as _avi
    from onionnet_spark.functions import gif as _gif
    from onionnet_spark.functions import jpeg as _jpeg
    from onionnet_spark.functions import png as _png
    from onionnet_spark.functions import qoi as _qoi
    from onionnet_spark.functions import tiff as _tiff

    if _png.is_png(payload):
        return _png.decode_png(payload)
    if _jpeg.is_jpeg(payload):
        return _jpeg.decode_jpeg(payload)
    if _avi.is_bmp(payload):
        return _avi.decode_bmp(payload)
    if _gif.is_gif(payload):
        return _gif.decode_gif(payload)[0][0]  # first frame
    if _tiff.is_tiff(payload):
        return _tiff.decode_tiff(payload)[0]  # first page
    if _qoi.is_qoi(payload):
        return _qoi.decode_qoi(payload)
    raise NotImplementedError(
        "real decode implemented for PNG, JPEG (baseline/progressive/"
        "4:2:0), BMP, GIF, TIFF and QOI; WebP/HEIC-class formats need "
        "PIL/ffmpeg — not in this container. Use fake=True for those."
    )


def decode_image_meta(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to image metadata via mapInPandas.

    With fake=False, PNG and JPEG payloads are REALLY
    decoded by the pure-Python codecs in functions/png.py and
    functions/jpeg.py (no PIL needed); any other payload raises
    NotImplementedError, marking where PIL/ffmpeg would plug in for
    the remaining formats. With fake=True, width/height/channels are
    deterministic functions of the payload length — exercising the
    identical Arrow-batch plumbing with no codec at all.
    """

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import png as _png

        for pdf in batches:
            if not fake:
                ws, hs, cs = [], [], []
                for payload in pdf["payload"]:
                    arr = _decode_any_image(payload)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    cs.append(1 if arr.ndim == 2 else arr.shape[2])
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": pd.Series(ws, dtype="int32"),
                        "height": pd.Series(hs, dtype="int32"),
                        "n_channels": pd.Series(cs, dtype="int32"),
                    }
                )
                continue
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n % 1920).astype("int32"),
                    "height": (n % 1080).astype("int32"),
                    "n_channels": ((n % 3) + 1).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode_batches, DECODE_SCHEMA)


PNG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pixel_sum", LongType()),
    ]
)


def synth_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG payload per id: width 4 + id%5, height
    3 + id%4, greyscale for even ids / RGB for odd, pixel value
    (id*7 + row*13 + col*31 + channel*17) % 256 — a closed form a
    SQL oracle can recompute independently of the codec. Encoding
    runs distributed in mapInPandas (the write half of the codec
    round-trip)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import png as _png

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                i = np.arange(h)[:, None]
                j = np.arange(w)[None, :]
                base = d * 7 + i * 13 + j * 31
                if d % 2 == 0:
                    img = (base % 256).astype(np.uint8)
                else:
                    c = np.arange(3)[None, None, :]
                    img = ((base[:, :, None] + c * 17) % 256).astype(np.uint8)
                payloads.append(_png.encode_png(img))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def synth_jpeg_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    progressive: bool = False,
    rgb: bool = False,
    subsampling: str = "444",
) -> DataFrame:
    """Deterministic JPEG payload per id: a UNIFORM greyscale image
    (or grey RGB when rgb=True), width 9 + id%9, height 6 + id%7
    (straddles the 8x8 block grid, so edge-replicate padding is
    exercised), pixel value (id*6 + 4) % 256 — always EVEN, so the
    DC quantizer (luma Q00 = 16) divides 8*(v-128) exactly and the
    lossy codec round-trips the image BIT-EXACTLY; for GREY RGB
    pixels Cb/Cr sit exactly on 128, so the 4:2:0 chroma path
    (subsampling='420') is exact too. progressive=True emits the
    SOF2 multi-scan layering (encode_jpeg_progressive), which is
    entropy-only and preserves the same closed form. Encoding runs
    distributed in mapInPandas."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import jpeg as _jpeg

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                w, h, v = 9 + d % 9, 6 + d % 7, (d * 6 + 4) % 256
                shape = (h, w, 3) if rgb else (h, w)
                img = np.full(shape, v, dtype=np.uint8)
                enc = (
                    _jpeg.encode_jpeg_progressive
                    if progressive
                    else _jpeg.encode_jpeg
                )
                payloads.append(enc(img, subsampling=subsampling))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def decode_image_stats(df: DataFrame) -> DataFrame:
    """REAL image decode (PNG or JPEG, dispatched by
    signature) to per-image pixel statistics via mapInPandas (the
    read half of the round-trip; no fake path — raises on other
    payloads). Returns (doc_id, width, height, n_channels,
    pixel_sum)."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F811

        for pdf in batches:
            ws, hs, cs, sums = [], [], [], []
            for payload in pdf["payload"]:
                arr = _decode_any_image(payload)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                cs.append(1 if arr.ndim == 2 else arr.shape[2])
                sums.append(int(arr.astype("int64").sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_channels": pd.Series(cs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(stats_batches, PNG_STATS_SCHEMA)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_sum", LongType()),
        StructField("peak_abs", IntegerType()),
    ]
)


def synth_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM WAV payload per id: 40 + id%13 frames,
    1 + id%2 channels, sample rate 8000 + 1000*(id%3), sample value
    ((id*31 + t*7 + c*11) % 2003) - 1001 — closed-form for an
    independent SQL oracle. Encoding runs distributed in
    mapInPandas."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n, ch = 40 + d % 13, 1 + d % 2
                t = np.arange(n)[:, None]
                c = np.arange(ch)[None, :]
                s = (((d * 31 + t * 7 + c * 11) % 2003) - 1001).astype(np.int16)
                payloads.append(_wav.encode_wav(s, 8000 + 1000 * (d % 3)))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def _optional_av():
    """Feature-detect PyAV (ffmpeg bindings): the documented plug-in
    for exact MP3/AAC/Vorbis audio and H.264/VP9-class video
    bitstreams. The pure-Python codecs in this package stay the
    default and the oracle-gated ground truth; this arm only handles
    formats they raise on."""
    try:
        import av  # noqa: F401

        return av
    except ImportError:
        return None


def _optional_ffmpeg_bin():
    """Feature-detect an ffmpeg binary on PATH (the subprocess
    fallback when PyAV isn't importable)."""
    import shutil

    return shutil.which("ffmpeg")


def _ffprobe_fps(payload) -> int:
    """Probe a video bitstream's average frame rate with ffprobe
    (ships alongside ffmpeg), so the subprocess decode arm reports
    the same fps the PyAV arm does (ADVICE r7: the arms disagreed —
    PyAV real fps, ffmpeg 0). Returns 0 when ffprobe is absent or
    the stream carries no rate."""
    import shutil
    import subprocess

    ffprobe = shutil.which("ffprobe")
    if ffprobe is None:
        return 0
    try:
        out = subprocess.run(
            [ffprobe, "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=avg_frame_rate",
             "-of", "default=nw=1:nk=1", "pipe:0"],
            input=bytes(payload), capture_output=True, check=True,
        ).stdout.decode("ascii", "ignore").strip()
        num, _, den = out.partition("/")
        n, d = int(num), int(den or "1")
        return int(round(n / d)) if d and n else 0
    except (subprocess.SubprocessError, ValueError, OSError):
        return 0


def _decode_audio_external(payload) -> "tuple[np.ndarray, int]":
    """Decode an MP3/AAC/OGG-class audio bitstream through the
    feature-detected external arms: PyAV in-process first, then an
    ffmpeg subprocess (s16le PCM over a pipe). BOTH arms share one
    output contract — mono @ 44100 Hz s16 — so decode_audio_stats
    emits the same columns whichever optional decoder is installed
    (ADVICE r7: the old PyAV arm kept native layout via a packed
    's16' resample, whose to_ndarray() is interleaved (1, n*ch) and
    mis-reported n_channels). Raises NotImplementedError when
    neither is present — the same contract as every other plug-in
    gate in this module."""
    import numpy as np

    av = _optional_av()
    if av is not None:
        import io

        frames = []
        sr = 44100
        with av.open(io.BytesIO(bytes(payload))) as container:
            stream = container.streams.audio[0]
            # planar mono at a pinned rate: to_ndarray() is
            # (channels=1, samples), matching the ffmpeg arm exactly
            resampler = av.AudioResampler(
                format="s16p", layout="mono", rate=sr
            )
            for frame in container.decode(stream):
                for rf in resampler.resample(frame):
                    frames.append(rf.to_ndarray())  # (1, samples) s16
        if frames:
            pcm = np.concatenate(frames, axis=1).T.astype(np.int16)
            return pcm.reshape(-1, 1), sr
        return np.zeros((0, 1), dtype=np.int16), sr
    ffmpeg = _optional_ffmpeg_bin()
    if ffmpeg is not None:
        import subprocess

        sr = 44100
        proc = subprocess.run(
            [ffmpeg, "-v", "error", "-i", "pipe:0",
             "-f", "s16le", "-acodec", "pcm_s16le",
             "-ar", str(sr), "-ac", "1", "pipe:1"],
            input=bytes(payload), capture_output=True, check=True,
        )
        pcm = np.frombuffer(proc.stdout, dtype="<i2").reshape(-1, 1)
        return pcm.astype(np.int16), sr
    raise NotImplementedError(
        "exact MP3/AAC-class bitstream decode needs PyAV or an ffmpeg "
        "binary (neither in this container); WAV/G.711/ADPCM/FLAC/OMA1 "
        "decode natively via the pure-Python codecs"
    )


def _decode_video_external(payload) -> "tuple[list, int]":
    """Decode an MP4/H.264/WebM-class video bitstream through the
    feature-detected external arms: PyAV in-process first, then an
    ffmpeg subprocess. The subprocess arm emits image2pipe PNG
    (rawvideo would need the frame dims up front) and decodes each
    frame with the in-repo PNG codec, chunk-walking the stream for
    frame boundaries. Returns (frames: list[np.ndarray HxWx3
    uint8], fps). Raises NotImplementedError when neither decoder
    is present."""
    import numpy as np

    av = _optional_av()
    if av is not None:
        import io

        frames = []
        fps = 0
        with av.open(io.BytesIO(bytes(payload))) as container:
            stream = container.streams.video[0]
            if stream.average_rate:
                fps = int(round(float(stream.average_rate)))
            for frame in container.decode(stream):
                frames.append(
                    frame.to_ndarray(format="rgb24").astype(np.uint8)
                )
        return frames, fps
    ffmpeg = _optional_ffmpeg_bin()
    if ffmpeg is not None:
        import subprocess

        from onionnet_spark.functions import png as _png

        proc = subprocess.run(
            [ffmpeg, "-v", "error", "-i", "pipe:0",
             "-f", "image2pipe", "-vcodec", "png", "pipe:1"],
            input=bytes(payload), capture_output=True, check=True,
        )
        frames = [
            _png.decode_png(f) for f in _split_png_stream(proc.stdout)
        ]
        return frames, _ffprobe_fps(payload)
    raise NotImplementedError(
        "exact MP4/H.264-class bitstream decode needs PyAV or an "
        "ffmpeg binary (neither in this container); RIFF/AVI with "
        "BI_RGB/MJPG/MSV1 decodes natively via the pure-Python codecs"
    )


def _decode_any_audio(payload) -> "tuple[np.ndarray, int]":
    """Signature-dispatched real audio decode: RIFF/WAVE containers
    (PCM, G.711, IMA ADPCM — functions/wav.py), FLAC streams
    (functions/flac.py) and OMA1 lossy MDCT streams
    (functions/mdct.py — the transform-codec family). Anything else
    (MP3/AAC/OGG bitstreams) routes to the feature-detected
    PyAV/ffmpeg arm, which raises NotImplementedError only when
    neither external decoder exists."""
    from onionnet_spark.functions import flac as _flac
    from onionnet_spark.functions import mdct as _mdct
    from onionnet_spark.functions import wav as _wav

    if _flac.is_flac(payload):
        return _flac.decode_flac(payload)
    if _mdct.is_oma(payload):
        pcm, sr = _mdct.decode_mdct(payload)
        return pcm.reshape(-1, 1), sr
    if _wav.is_wav(payload):
        return _wav.decode_wav(payload)
    return _decode_audio_external(payload)


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode to per-clip statistics via mapInPandas:
    WAV containers (PCM/G.711/ADPCM, functions/wav.py), FLAC
    (functions/flac.py) and OMA1 lossy MDCT (functions/mdct.py)
    dispatched by signature; only exact MP3/AAC bitstreams raise,
    marking where an external codec would plug in. Returns (doc_id,
    sample_rate, n_samples, n_channels, sample_sum, peak_abs)."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            srs, ns, chs, sums, peaks = [], [], [], [], []
            for payload in pdf["payload"]:
                samples, sr = _decode_any_audio(payload)
                srs.append(sr)
                ns.append(samples.shape[0])
                chs.append(samples.shape[1])
                sums.append(int(samples.astype("int64").sum()))
                peaks.append(int(np.abs(samples.astype("int64")).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(srs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "sample_sum": pd.Series(sums, dtype="int64"),
                    "peak_abs": pd.Series(peaks, dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(stats_batches, WAV_STATS_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload_out_bytes", LongType()),
    ]
)


def _optional_pil():
    """Feature-detect Pillow: the documented plug-in for the
    arbitrary-codec paths (the pure-Python decoders in this module
    stay the default and the oracle-gated ground truth)."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize payloads to (width, height) via mapInPandas.

    fake=True models the output contract — fixed target dims and a
    deterministic output byte count proportional to the target area
    — so the Spark-side schema/batching is tested everywhere.
    fake=False is the PLUG-IN path: when Pillow is importable on the
    executors it decodes/resizes/re-encodes for real (any format PIL
    knows); without it the stage raises NotImplementedError. The
    container this repo is built in has no PIL, so the real arm is
    covered by an import-guarded pytest that runs wherever the lib
    exists and skips here.
    """

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import pandas as pd  # noqa: F811

        pil = None if fake else _optional_pil()
        for pdf in batches:
            if fake:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": width,
                        "height": height,
                        "payload_out_bytes": [width * height * 3] * len(pdf),
                    }
                )
                continue
            if pil is None:
                raise NotImplementedError(
                    "real image resize requires PIL (not in this container); "
                    "use fake=True to exercise the pipeline"
                )
            out_bytes = []
            for payload in pdf["payload"]:
                img = pil.open(io.BytesIO(bytes(payload)))
                buf = io.BytesIO()
                img.resize((width, height)).save(buf, format="PNG")
                out_bytes.append(len(buf.getvalue()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload_out_bytes": out_bytes,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(resize_batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha_prefix", IntegerType()),
    ]
)


def _split_png_stream(data: bytes) -> list[bytes]:
    """Split a concatenated image2pipe PNG stream into whole PNGs by
    honest chunk-structure parsing (len[4] type[4] data crc[4] per
    chunk, signature to IEND per image) — never by searching for the
    8-byte signature, which legitimately occurs inside compressed
    IDAT payloads. A malformed tail (truncated pipe) is dropped
    rather than mis-attributed to the previous frame."""
    sig = b"\x89PNG\r\n\x1a\n"
    frames: list[bytes] = []
    pos = 0
    n = len(data)
    while pos + 8 <= n and data[pos : pos + 8] == sig:
        cur = pos + 8
        while True:
            if cur + 8 > n:
                return frames  # truncated chunk header: drop tail
            clen = int.from_bytes(data[cur : cur + 4], "big")
            ctype = data[cur + 4 : cur + 8]
            cur += 8 + clen + 4  # header + data + crc
            if cur > n:
                return frames  # truncated chunk body: drop tail
            if ctype == b"IEND":
                break
        frames.append(data[pos:cur])
        pos = cur
    return frames


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Sample every `every_n`-th 'frame' from video-shaped payloads,
    one output row per sampled frame (row-fanout decode: the batch
    shape every video pipeline needs).

    fake=True treats each 4 KiB slice of the payload as one frame
    and emits a deterministic fingerprint per sampled slice —
    tested everywhere. fake=False is the PLUG-IN path: when an
    `ffmpeg` binary is on PATH on the executors it extracts real
    frames (rawvideo pipe, one subprocess per payload inside the
    Arrow batch); without it the stage raises NotImplementedError.
    This container has no ffmpeg, so the real arm is covered by a
    which('ffmpeg')-guarded pytest that skips here. (For AVI/MJPEG
    payloads the in-repo pure-Python decoders in `video_frame_stats`
    remain the oracle-gated default.)
    """

    def frame_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib
        import shutil
        import subprocess

        import pandas as pd  # noqa: F811

        ffmpeg = None if fake else shutil.which("ffmpeg")
        for pdf in batches:
            if not fake:
                if ffmpeg is None:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg (not in this "
                        "container); use fake=True to exercise the pipeline"
                    )
                ids, idxs, fps = [], [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    proc = subprocess.run(
                        [
                            ffmpeg, "-v", "error", "-i", "pipe:0",
                            "-vf", f"select=not(mod(n\\,{every_n}))",
                            "-vsync", "vfr",
                            "-f", "image2pipe", "-vcodec", "png", "pipe:1",
                        ],
                        input=bytes(payload),
                        capture_output=True,
                        check=True,
                    )
                    # walk the PNG chunk structure to find frame
                    # boundaries — the 8-byte signature can occur
                    # inside compressed IDAT payloads, so splitting
                    # on it would miscount frames. Each PNG is
                    # signature + chunks of (len[4] type[4] data
                    # crc[4]) through IEND; chunk lengths give the
                    # exact end offset of every frame.
                    for i, frame in enumerate(_split_png_stream(proc.stdout)):
                        h = hashlib.sha256(frame).digest()
                        ids.append(doc_id)
                        idxs.append(i * every_n)
                        fps.append(int.from_bytes(h[:4], "big") // 2)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "frame_idx": pd.Series(idxs, dtype="int32"),
                        "frame_sha_prefix": pd.Series(fps, dtype="int32"),
                    }
                )
                continue
            ids, idxs, fps = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, (len(payload) + 4095) // 4096)
                for i in range(0, n_frames, every_n):
                    chunk = bytes(payload[i * 4096 : (i + 1) * 4096])
                    h = hashlib.sha256(chunk).digest()
                    ids.append(doc_id)
                    idxs.append(i)
                    fps.append(int.from_bytes(h[:4], "big", signed=True))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha_prefix": pd.Series(fps, dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(frame_batches, FRAME_SCHEMA)


PNG_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_png_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize for PNG payloads: decode (functions/png.py),
    nearest-neighbor resample with integer source indices
    src = (dst * src_dim) // dst_dim, re-encode to PNG — all inside
    one Arrow-batched mapInPandas stage. Nearest-neighbor (not
    bilinear) keeps every output pixel an exact source pixel, so an
    independent SQL oracle can recompute pixel_sum from a closed-form
    source pattern with integer arithmetic only. `resize_images`
    remains the plug-in gate for formats that need PIL.

    Returns (doc_id, width, height, n_channels, pixel_sum, payload)
    where payload is the re-encoded resized PNG.
    """

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import png as _png

        for pdf in batches:
            chs, sums, outs = [], [], []
            for payload in pdf["payload"]:
                img = _png.decode_png(bytes(payload))
                h_src, w_src = img.shape[0], img.shape[1]
                ri = (np.arange(height) * h_src) // height
                ci = (np.arange(width) * w_src) // width
                resized = img[ri][:, ci]
                chs.append(1 if resized.ndim == 2 else resized.shape[2])
                sums.append(int(resized.astype("int64").sum()))
                outs.append(_png.encode_png(resized))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "payload": outs,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        resize_batches, PNG_RESIZE_SCHEMA
    )


WAV_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_sum", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resample_wav_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """REAL sample-rate conversion for PCM WAV payloads: decode
    (functions/wav.py), nearest-sample resample with integer source
    indices src = (t * sr_src) // target_rate over
    n_out = (n_src * target_rate) // sr_src output frames, re-encode
    at the target rate — one mapInPandas stage. Nearest-sample (not
    windowed-sinc) keeps every output sample an exact source sample,
    integer-replayable by a SQL oracle; a band-limited resampler
    would plug in behind the same contract.

    Returns (doc_id, sample_rate, n_samples, n_channels, sample_sum,
    payload) with payload the re-encoded WAV at `target_rate`.
    """

    def resample_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        for pdf in batches:
            ns, chs, sums, outs = [], [], [], []
            for payload in pdf["payload"]:
                samples, sr = _wav.decode_wav(bytes(payload))
                n_src = samples.shape[0]
                n_out = (n_src * target_rate) // sr
                ti = (np.arange(n_out) * sr) // target_rate
                res = samples[ti]
                ns.append(n_out)
                chs.append(res.shape[1])
                sums.append(int(res.astype("int64").sum()))
                outs.append(_wav.encode_wav(res, target_rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(
                        [target_rate] * len(pdf), dtype="int32"
                    ),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "sample_sum": pd.Series(sums, dtype="int64"),
                    "payload": outs,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        resample_batches, WAV_RESAMPLE_SCHEMA
    )


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    near-duplicate IMAGE fingerprint: decode (PNG or baseline JPEG,
    real codecs), integer-mean grayscale ((r+g+b)//3), nearest-
    neighbor resize to 9x8 (src = (dst*src_dim)//dst_dim, the same
    convention as resize_png_images), then bit(r,c) = 1 iff
    pixel[r][c+1] > pixel[r][c]. Returns (doc_id, dhash) with the
    64 bits as a '0'/'1' string in (row, col) order — a plain
    equality/grouping key in any engine (and hamming-distance
    bucketing composes exactly like SimHash's bands).

    All integer arithmetic end to end, so a SQL oracle recomputes
    the hash from a closed-form pixel pattern while THIS path runs
    through the real byte-level decode — a codec bug flips bits.
    """

    def dhash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                arr = _decode_any_image(payload)
                if arr.ndim == 3:
                    arr = (
                        arr[:, :, 0].astype(np.int64)
                        + arr[:, :, 1]
                        + arr[:, :, 2]
                    ) // 3
                arr = arr.astype(np.int64)
                h, w = arr.shape
                rows = (np.arange(8) * h) // 8
                cols = (np.arange(9) * w) // 9
                small = arr[np.ix_(rows, cols)]
                bits = (small[:, 1:] > small[:, :-1]).astype(np.uint8)
                hashes.append("".join(str(b) for b in bits.flatten()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "dhash": hashes})

    return df.select("doc_id", "payload").mapInPandas(
        dhash_batches, "doc_id long, dhash string"
    )


def audio_fingerprint(df: DataFrame, frame_len: int = 8) -> DataFrame:
    """Energy-delta audio fingerprint — the Shazam-family idea in
    its simplest robust form: decode (real PCM codec), mix to mono
    by SUMMING channels (integer-exact, no division), cut into
    `frame_len`-sample frames (trailing partial frame kept), take
    per-frame energy = sum of squared samples, and emit one bit per
    adjacent frame pair: 1 iff energy rose. Identical clips collide;
    a re-gained copy (scaled samples) keeps most bits because only
    the SIGN of the energy delta matters.

    Returns (doc_id, n_frames, fingerprint) with the bits as a
    '0'/'1' string in time order — a grouping key like image_dhash,
    all integer arithmetic, SQL-oracle-replayable.
    """

    def fp_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        for pdf in batches:
            nfs, fps = [], []
            for payload in pdf["payload"]:
                samples, _sr = _wav.decode_wav(payload)
                mono = samples.astype(np.int64).sum(axis=1)
                n_frames = -(-len(mono) // frame_len)
                pad = n_frames * frame_len - len(mono)
                if pad:
                    mono = np.concatenate([mono, np.zeros(pad, dtype=np.int64)])
                energy = (mono.reshape(n_frames, frame_len) ** 2).sum(axis=1)
                bits = (energy[1:] > energy[:-1]).astype(np.uint8)
                nfs.append(n_frames)
                fps.append("".join(str(b) for b in bits))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "fingerprint": fps,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        fp_batches, "doc_id long, n_frames int, fingerprint string"
    )


CHANNEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channel", IntegerType()),
        StructField("n_px", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)


def decode_channel_stats(df: DataFrame) -> DataFrame:
    """REAL image decode to PER-CHANNEL pixel statistics — the
    feature-extraction step of an image-curation pipeline (channel
    means feed normalization constants; a channel whose min == max
    flags synthetic/blank frames for exclusion). One row per
    (image, channel) from the same mapInPandas decode path as
    decode_image_stats; greyscale images emit channel 0. Integer
    sums only — engine-exact for the closed-form oracle. Returns
    (doc_id, channel, n_px, px_sum, px_min, px_max).
    """

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            ids, chans, ns, sums, mins, maxs = [], [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_any_image(payload)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                a64 = arr.astype(np.int64)
                for c in range(arr.shape[2]):
                    ids.append(int(did))
                    chans.append(c)
                    ns.append(int(arr.shape[0] * arr.shape[1]))
                    sums.append(int(a64[:, :, c].sum()))
                    mins.append(int(arr[:, :, c].min()))
                    maxs.append(int(arr[:, :, c].max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "channel": pd.Series(chans, dtype="int32"),
                    "n_px": pd.Series(ns, dtype="int64"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                    "px_min": pd.Series(mins, dtype="int32"),
                    "px_max": pd.Series(maxs, dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        stats_batches, CHANNEL_STATS_SCHEMA
    )


def image_dhash_near_pairs(
    payload_df: DataFrame,
    bands: int = 8,
    max_hamming: int = 7,
    dhash_df: "DataFrame | None" = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by dHash Hamming distance — the
    multimodal twin of dedup.simhash_near_pairs: the 64-bit
    fingerprint (computed by the REAL decode path in image_dhash)
    splits into ``bands`` slices; any pair within Hamming distance
    ``bands - 1`` agrees exactly on >= 1 slice (pigeonhole), so
    candidates come from band equi-joins, then a 64-term
    character-compare verifies the exact distance — all inside
    codegen, no Python beyond the decode itself.

    Returns (id_a, id_b, hamming), id_a < id_b, hamming <=
    max_hamming (which must stay <= bands - 1 for full recall).
    """
    assert 64 % bands == 0 and max_hamming <= bands - 1
    width = 64 // bands
    # dhash_df: reuse a caller-computed (doc_id, dhash) frame — the
    # r10 `shingles=` pattern — so a caller that also inspects the
    # fingerprints does not pay the Python decode twice (r11).
    dh = (
        dhash_df
        if dhash_df is not None
        else image_dhash(payload_df).localCheckpoint()
    )
    bnd = dh.select(
        F.col("doc_id").alias("id"),
        F.posexplode(
            F.array(
                *[
                    F.substring(F.col("dhash"), b * width + 1, width)
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    cand = (
        bnd.alias("a")
        .join(bnd.alias("b"), on=["band", "band_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ham = sum(
        (
            F.substring(F.col("ha"), i, 1) != F.substring(F.col("hb"), i, 1)
        ).cast("int")
        for i in range(1, 65)
    )
    return (
        cand.join(
            dh.select(F.col("doc_id").alias("id_a"), F.col("dhash").alias("ha")),
            on="id_a",
        )
        .join(
            dh.select(F.col("doc_id").alias("id_b"), F.col("dhash").alias("hb")),
            on="id_b",
        )
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Compressed audio (G.711 / IMA ADPCM) and real video (RIFF/AVI)
# ---------------------------------------------------------------------------

def synth_g711_wav_payload(
    df: DataFrame, codec: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic COMPRESSED WAV payload per id (G.711 mu-law or
    A-law, functions/g711.py): same closed-form PCM source as
    synth_wav_payload — 40 + id%13 frames, 1 + id%2 channels, rate
    8000 + 1000*(id%3), sample ((id*31 + t*7 + c*11) % 2003) - 1001 —
    companded to 8-bit codes inside the container. The SQL oracle
    recomputes decode(encode(x)) as a pure 8-segment quantization
    CASE, so the gate covers arbitrary samples (unlike the
    constant-signal ADPCM gate)."""
    if codec not in ("ulaw", "alaw"):
        raise ValueError("codec must be 'ulaw' or 'alaw'")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n, ch = 40 + d % 13, 1 + d % 2
                t = np.arange(n)[:, None]
                c = np.arange(ch)[None, :]
                s = (((d * 31 + t * 7 + c * 11) % 2003) - 1001).astype(np.int16)
                payloads.append(
                    _wav.encode_wav(s, 8000 + 1000 * (d % 3), codec=codec)
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def synth_flac_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FLAC payload per id (functions/flac.py): a
    smooth closed-form clip of 4090 + id%20 samples (so every 10th
    id spans TWO frames — the multi-frame path runs inside the
    gate), 1 + id%2 channels, rate 8000 + 1000*(id%3), sample
    ((id*37 + t + c*5) % 997) - 498. FLAC is lossless, so the SQL
    oracle recomputes the statistics on the raw closed form — the
    gate covers arbitrary samples with no codec math in the oracle."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import flac as _flac

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n, ch = 4090 + d % 20, 1 + d % 2
                t = np.arange(n)[:, None]
                c = np.arange(ch)[None, :]
                s = (((d * 37 + t + c * 5) % 997) - 498).astype(np.int16)
                payloads.append(_flac.encode_flac(s, 8000 + 1000 * (d % 3)))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    # the filtered id list lands in 1-2 scan partitions; fan out so
    # the (CPU-bound) codec work uses every core — at corpus scale
    # the input is already many partitions and this is a no-op cost
    return df.select(id_col).repartition(id_col).mapInPandas(
        gen, "doc_id long, payload binary"
    )


def synth_adpcm_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic IMA-ADPCM WAV payload per id: a CONSTANT mono
    clip of 600 + id%101 samples (spans two 256-byte blocks) at
    value ((id*37) % 2003) - 1001, rate 8000 + 500*(id%4). Constant
    signals round-trip the adaptive codec bit-exactly (see
    functions/adpcm.py), giving the history-dependent bitstream a
    closed-form oracle; arbitrary-signal decode is pytest-gated."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n, v = 600 + d % 101, ((d * 37) % 2003) - 1001
                sig = np.full(n, v, dtype=np.int16)
                payloads.append(
                    _wav.encode_wav(sig, 8000 + 500 * (d % 4), codec="adpcm")
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("pos_checksum", LongType()),
    ]
)


def synth_avi_payload(
    df: DataFrame, codec: str = "rgb", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic AVI payload per id (functions/avi.py).

    codec 'rgb': 3 + id%4 uncompressed DIB frames, width 4 + id%3,
    height 2 + id%3, RGB pixel (id*7 + f*19 + r*13 + c*31 + k*17)
    % 256 — arbitrary per-position values, so the oracle's
    position-weighted checksum catches bottom-up row order, BGR
    channel order and row-padding bugs.

    codec 'mjpeg': 3 + id%4 UNIFORM greyscale frames (value
    (id*6 + f*10 + 4) % 256, always even -> the baseline JPEG codec
    round-trips bit-exactly, same trick as synth_jpeg_payload),
    width 9 + id%5, height 6 + id%4 (straddles the 8x8 block grid).
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import avi as _avi

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                nf = 3 + d % 4
                if codec == "rgb":
                    w, h = 4 + d % 3, 2 + d % 3
                    r = np.arange(h)[:, None, None]
                    c = np.arange(w)[None, :, None]
                    k = np.arange(3)[None, None, :]
                    frames = [
                        ((d * 7 + f * 19 + r * 13 + c * 31 + k * 17) % 256).astype(
                            np.uint8
                        )
                        for f in range(nf)
                    ]
                else:
                    w, h = 9 + d % 5, 6 + d % 4
                    frames = [
                        np.full((h, w), (d * 6 + f * 10 + 4) % 256, dtype=np.uint8)
                        for f in range(nf)
                    ]
                payloads.append(_avi.encode_avi(frames, fps=10 + d % 5, codec=codec))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def synth_msvc_avi_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MS Video 1 (CRAM) AVI payload per id
    (functions/msvideo1.py): 3 + id%3 frames of 8 x (8 + 4*(id%2))
    pixels built from solid 4x4 blocks whose colors are multiples of
    8 (exact under RGB555), where blocks with (by + bx + id) % 2 == 0
    are STATIC across frames — the encoder emits inter-frame skip
    runs for them — and the rest change color every frame. Pixel
    value: 8 * ((id + 3*by + 5*bx + 7*k + (0 if static else 9*f))
    % 32). Closed-form per (id, f, y, x, k), so the oracle recomputes
    every frame's statistics with no codec in the loop; a skip-run /
    block-order / opcode bug corrupts later frames and mismatches."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import avi as _avi

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                nf, w, h = 3 + d % 3, 8 + 4 * (d % 2), 8
                y = np.arange(h)[:, None, None]
                x = np.arange(w)[None, :, None]
                k = np.arange(3)[None, None, :]
                static = ((y // 4) + (x // 4) + d) % 2 == 0
                frames = [
                    (
                        8
                        * (
                            (
                                d + 3 * (y // 4) + 5 * (x // 4) + 7 * k
                                + np.where(static, 0, 9 * f)
                            )
                            % 32
                        )
                    ).astype(np.uint8)
                    for f in range(nf)
                ]
                payloads.append(
                    _avi.encode_avi(frames, fps=10 + d % 5, codec="msvc")
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def synth_gif_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic animated-GIF payload per id (functions/gif.py):
    2 + id%3 frames of (4 + id%3) x (5 + id%4) pixels drawn from a
    6-entry palette — palette index idx = (id + f*7 + r*3 + c*5) % 6,
    channel k value = (id*(k+1) + idx*(11 + 18*k)) % 256. GIF is
    lossless on paletted content, so every pixel is closed-form for
    the SQL oracle."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import gif as _gif

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                nf, h, w = 2 + d % 3, 4 + d % 3, 5 + d % 4
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                k = np.arange(3)[None, None, :]
                frames = []
                for f in range(nf):
                    idx = (d + f * 7 + r * 3 + c * 5) % 6
                    frames.append(
                        ((d * (k + 1) + idx * (11 + 18 * k)) % 256).astype(
                            np.uint8
                        )
                    )
                payloads.append(_gif.encode_gif(frames, delay_cs=5 + d % 7))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def decode_gif_stats(df: DataFrame) -> DataFrame:
    """REAL animated-GIF decode via mapInPandas (functions/gif.py:
    LZW + color tables + GCE): one row per frame with the same
    position-weighted checksum as decode_video_stats, plus the GCE
    frame delay. Returns (doc_id, frame_idx, delay_cs, width,
    height, pixel_sum, pos_checksum)."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import gif as _gif

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_idx", "delay_cs", "width", "height",
                "pixel_sum", "pos_checksum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, delay = _gif.decode_gif(payload)
                for f_idx, arr in enumerate(frames):
                    arr = arr.astype(np.int64)
                    h, w, ch = arr.shape
                    r = np.arange(h)[:, None, None]
                    c = np.arange(w)[None, :, None]
                    k = np.arange(ch)[None, None, :]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f_idx)
                    rows["delay_cs"].append(delay)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["pixel_sum"].append(int(arr.sum()))
                    rows["pos_checksum"].append(
                        int((arr * (1 + r * 3 + c * 5 + k * 7)).sum())
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "delay_cs": pd.Series(rows["delay_cs"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
                    "pos_checksum": pd.Series(
                        rows["pos_checksum"], dtype="int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        stats_batches,
        "doc_id long, frame_idx int, delay_cs int, width int, height int, "
        "pixel_sum long, pos_checksum long",
    )


def synth_compressed_text_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic compressed-text payload per id, cycling the
    three stdlib codecs by id % 3 (0 = gzip, 1 = bzip2, 2 = xz/lzma)
    — the shapes real corpora ship in (WET files are gzip; dumps are
    commonly .bz2/.xz). Text: 20 + id%30 single-char tokens with
    char k = chr(97 + (id + 2k) % 26), space-joined — closed-form
    for the oracle since all three codecs are lossless."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import bz2
        import gzip
        import lzma

        import pandas as pd  # noqa: F811

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n = 20 + d % 30
                text = " ".join(
                    chr(97 + (d + 2 * k) % 26) for k in range(n)
                ).encode()
                codec = d % 3
                if codec == 0:
                    payloads.append(gzip.compress(text, mtime=0))
                elif codec == 1:
                    payloads.append(bz2.compress(text))
                else:
                    payloads.append(lzma.compress(text))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def read_compressed_text(df: DataFrame) -> DataFrame:
    """Magic-byte-dispatched decompression of text payloads (gzip
    1f 8b, bzip2 'BZh', xz fd '7zXZ') inside mapInPandas, with token
    and byte stats — the first step of ingesting compressed corpus
    dumps. Unknown magics raise (zstd is the plug-in point: no
    stdlib codec). Returns (doc_id, codec, n_bytes, n_tokens,
    ascii_sum)."""

    def dec_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import bz2
        import gzip
        import lzma

        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "codec", "n_bytes", "n_tokens", "ascii_sum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if data[:2] == b"\x1f\x8b":
                    codec, text = "gzip", gzip.decompress(data)
                elif data[:3] == b"BZh":
                    codec, text = "bzip2", bz2.decompress(data)
                elif data[:6] == b"\xfd7zXZ\x00":
                    codec, text = "xz", lzma.decompress(data)
                else:
                    raise ValueError(
                        f"unknown compression magic {data[:6]!r} "
                        "(zstd needs an external codec — plug-in point)"
                    )
                rows["doc_id"].append(doc_id)
                rows["codec"].append(codec)
                rows["n_bytes"].append(len(text))
                rows["n_tokens"].append(len(text.split()))
                rows["ascii_sum"].append(int(sum(text)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "codec": pd.Series(rows["codec"], dtype="object"),
                    "n_bytes": pd.Series(rows["n_bytes"], dtype="int32"),
                    "n_tokens": pd.Series(rows["n_tokens"], dtype="int32"),
                    "ascii_sum": pd.Series(rows["ascii_sum"], dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        dec_batches,
        "doc_id long, codec string, n_bytes int, n_tokens int, ascii_sum long",
    )


def synth_tiff_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic multi-page TIFF payload per id
    (functions/tiff.py): 2 + id%2 grayscale pages of
    (5 + id%4) x (6 + id%5), pixel (id*3 + p*7 + r*5 + c*11) % 256,
    compression cycled by id % 3 (none / PackBits / LZW+predictor).
    All three are lossless, so every page is closed-form for the
    oracle."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import tiff as _tiff

        comps = [_tiff.COMP_NONE, _tiff.COMP_PACKBITS, _tiff.COMP_LZW]
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                npg, h, w = 2 + d % 2, 5 + d % 4, 6 + d % 5
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                pages = [
                    ((d * 3 + p * 7 + r * 5 + c * 11) % 256).astype(np.uint8)
                    for p in range(npg)
                ]
                payloads.append(
                    _tiff.encode_tiff(
                        pages, compression=comps[d % 3], predictor=(d % 3 == 2)
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def decode_tiff_stats(df: DataFrame) -> DataFrame:
    """REAL multi-page TIFF decode via mapInPandas (functions/tiff.py:
    chained IFDs, PackBits, early-change MSB LZW, predictor 2): one
    row per page with the position-weighted checksum. Returns
    (doc_id, page_idx, width, height, pixel_sum, pos_checksum)."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import tiff as _tiff

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "page_idx", "width", "height",
                "pixel_sum", "pos_checksum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for p_idx, page in enumerate(_tiff.decode_tiff(payload)):
                    arr = page.astype(np.int64)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    h, w, ch = arr.shape
                    r = np.arange(h)[:, None, None]
                    c = np.arange(w)[None, :, None]
                    k = np.arange(ch)[None, None, :]
                    rows["doc_id"].append(doc_id)
                    rows["page_idx"].append(p_idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["pixel_sum"].append(int(arr.sum()))
                    rows["pos_checksum"].append(
                        int((arr * (1 + r * 3 + c * 5 + k * 7)).sum())
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "page_idx": pd.Series(rows["page_idx"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
                    "pos_checksum": pd.Series(
                        rows["pos_checksum"], dtype="int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        stats_batches,
        "doc_id long, page_idx int, width int, height int, "
        "pixel_sum long, pos_checksum long",
    )


def synth_warc_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic .warc.gz payload per id (functions/warc.py,
    per-record gzip members — the Common Crawl layout): one warcinfo
    record ('software: onionnet-spark') plus 2 + id%3 response
    records at https://example.com/{id}/{r}, each holding
    n = 5 + (id + 2r) % 9 single-char space-joined tokens with
    char k = chr(97 + (id + r + k) % 26) — fully closed-form for
    the SQL oracle (content_length = 2n - 1, ascii sum has an exact
    integer formula)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import warc as _warc

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                recs = [
                    {"warc_type": "warcinfo", "payload": b"software: onionnet-spark"}
                ]
                for r in range(2 + d % 3):
                    n = 5 + (d + 2 * r) % 9
                    body = " ".join(
                        chr(97 + (d + r + k) % 26) for k in range(n)
                    ).encode()
                    recs.append(
                        {
                            "warc_type": "response",
                            "url": f"https://example.com/{d}/{r}",
                            "payload": body,
                        }
                    )
                payloads.append(_warc.encode_warc(recs))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def read_warc_records(df: DataFrame) -> DataFrame:
    """REAL WARC ingest via mapInPandas: member-gzip inflate + strict
    record parse (functions/warc.py), one output row per record —
    the first step of every web-scale corpus pipeline. ascii_sum is
    the exact byte sum of the payload, so any inflate/framing bug
    hash-mismatches. Returns (doc_id, record_idx, warc_type, url,
    content_length, ascii_sum)."""

    def rec_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import warc as _warc

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "record_idx", "warc_type", "url",
                "content_length", "ascii_sum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, rec in enumerate(_warc.decode_warc(payload)):
                    rows["doc_id"].append(doc_id)
                    rows["record_idx"].append(i)
                    rows["warc_type"].append(rec["warc_type"])
                    rows["url"].append(rec["url"])
                    rows["content_length"].append(len(rec["payload"]))
                    rows["ascii_sum"].append(int(sum(rec["payload"])))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "record_idx": pd.Series(rows["record_idx"], dtype="int32"),
                    "warc_type": pd.Series(rows["warc_type"], dtype="object"),
                    "url": pd.Series(rows["url"], dtype="object"),
                    "content_length": pd.Series(
                        rows["content_length"], dtype="int32"
                    ),
                    "ascii_sum": pd.Series(rows["ascii_sum"], dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        rec_batches,
        "doc_id long, record_idx int, warc_type string, url string, "
        "content_length int, ascii_sum long",
    )


def decode_video_stats(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video decode: parse the RIFF/AVI container
    (functions/avi.py), decode each frame (BI_RGB or MJPG via the
    baseline-JPEG codec), keep every `every_n`-th frame, and emit one
    row per sampled frame — the frame-sampling batch shape every
    video-training pipeline needs, with row fanout inside
    mapInPandas so no executor ever holds a whole corpus of frames.

    pos_checksum = sum(p * (1 + r*3 + c*5 + k*7)) detects row/
    column/channel permutation bugs that a plain pixel_sum is blind
    to. Non-AVI containers (MP4/H.264, WebM/VP9) route to the
    feature-detected PyAV/ffmpeg arm; it raises NotImplementedError
    only when neither external decoder exists."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import avi as _avi

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_idx", "fps", "width", "height",
                "n_channels", "pixel_sum", "pos_checksum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if _avi.is_avi(bytes(payload)):
                    frames, fps = _avi.decode_avi(payload)
                else:
                    frames, fps = _decode_video_external(payload)
                for f_idx in range(0, len(frames), every_n):
                    arr = frames[f_idx].astype(np.int64)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    h, w, ch = arr.shape
                    r = np.arange(h)[:, None, None]
                    c = np.arange(w)[None, :, None]
                    k = np.arange(ch)[None, None, :]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f_idx)
                    rows["fps"].append(fps)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_channels"].append(ch)
                    rows["pixel_sum"].append(int(arr.sum()))
                    rows["pos_checksum"].append(
                        int((arr * (1 + r * 3 + c * 5 + k * 7)).sum())
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "fps": pd.Series(rows["fps"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_channels": pd.Series(rows["n_channels"], dtype="int32"),
                    "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
                    "pos_checksum": pd.Series(rows["pos_checksum"], dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        stats_batches, VIDEO_STATS_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_sq", LongType()),
        StructField("is_silence", IntegerType()),
    ]
)


def audio_window_rms(
    df: DataFrame, window: int = 16, silence_rms: int = 300
) -> DataFrame:
    """Windowed loudness over REAL audio decode: per fixed-length
    window of the channel-summed mono signal, the integer
    sum-of-squares and a silence flag — the "drop silent/clipped
    clips" filter every audio-training pipeline runs first.

    is_silence tests rms <= silence_rms as the exact integer
    comparison sum_sq <= silence_rms^2 * n (no sqrt, no float). The
    final partial window keeps its true n. Row fanout happens inside
    mapInPandas — one row per (clip, window), never a whole corpus
    of samples on one executor.
    """

    def win_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        thr = silence_rms * silence_rms
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "win_idx", "n_samples", "sum_sq", "is_silence",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _sr = _wav.decode_wav(payload)
                mono = samples.astype(np.int64).sum(axis=1)
                for w_idx in range(0, (len(mono) + window - 1) // window):
                    seg = mono[w_idx * window : (w_idx + 1) * window]
                    ss = int((seg * seg).sum())
                    rows["doc_id"].append(doc_id)
                    rows["win_idx"].append(w_idx)
                    rows["n_samples"].append(len(seg))
                    rows["sum_sq"].append(ss)
                    rows["is_silence"].append(int(ss <= thr * len(seg)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "win_idx": pd.Series(rows["win_idx"], dtype="int32"),
                    "n_samples": pd.Series(rows["n_samples"], dtype="int32"),
                    "sum_sq": pd.Series(rows["sum_sq"], dtype="int64"),
                    "is_silence": pd.Series(rows["is_silence"], dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        win_batches, AUDIO_WINDOW_SCHEMA
    )


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("sad", LongType()),
        StructField("n_px", LongType()),
        StructField("is_cut", IntegerType()),
    ]
)


def synth_scene_avi_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Scene-cut fixture: same RGB closed form as synth_avi_payload
    but EVEN ids repeat each frame once (effective frame index
    f // 2), so half their inter-frame diffs are exactly zero —
    the non-vacuous half of the scene-cut gate. 4 + id%3 frames,
    width 3 + id%3, height 2 + id%2."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import avi as _avi

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                nf, w, h = 4 + d % 3, 3 + d % 3, 2 + d % 2
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                k = np.arange(3)[None, None, :]
                frames = []
                for f in range(nf):
                    ef = f // 2 if d % 2 == 0 else f
                    frames.append(
                        ((d * 7 + ef * 19 + r * 13 + c * 31 + k * 17) % 256)
                        .astype(np.uint8)
                    )
                payloads.append(_avi.encode_avi(frames, fps=10, codec="rgb"))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def video_scene_cuts(df: DataFrame, cut_mean_diff: int = 10) -> DataFrame:
    """Scene-change detection over REAL video decode: per consecutive
    frame pair, the sum of absolute pixel differences (SAD) and a cut
    flag — the shot-boundary sampler that picks one keyframe per
    scene instead of every k-th frame.

    is_cut tests mean|diff| >= cut_mean_diff as the exact integer
    comparison sad >= cut_mean_diff * n_px. frame_idx is the LATER
    frame of the pair (so frame 0 never appears). All decode and
    differencing happens inside mapInPandas with row fanout.
    """

    def cut_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import avi as _avi

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "sad", "n_px", "is_cut")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _fps = _avi.decode_avi(payload)
                for f_idx in range(1, len(frames)):
                    a = frames[f_idx - 1].astype(np.int64)
                    b = frames[f_idx].astype(np.int64)
                    sad = int(np.abs(b - a).sum())
                    n_px = int(a.size)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f_idx)
                    rows["sad"].append(sad)
                    rows["n_px"].append(n_px)
                    rows["is_cut"].append(int(sad >= cut_mean_diff * n_px))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "sad": pd.Series(rows["sad"], dtype="int64"),
                    "n_px": pd.Series(rows["n_px"], dtype="int64"),
                    "is_cut": pd.Series(rows["is_cut"], dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(cut_batches, SCENE_CUT_SCHEMA)


MDCT_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("snr_ok", BooleanType()),
        StructField("compressed_smaller", BooleanType()),
    ]
)


def _mdct_synth_signal(d: int) -> "np.ndarray":
    """Deterministic per-id test tone for the MDCT path: two sines
    whose frequencies/amplitudes derive from the id. Only the DIMS
    (n_samples, sample_rate) are SQL-closed-form; the waveform itself
    never needs to be — the oracle checks structure plus the codec's
    quality/compression contracts."""
    import numpy as np

    n = 2000 + (d % 10) * 100
    t = np.arange(n)
    f1, f2 = 200 + (d % 7) * 60, 900 + (d % 5) * 110
    sig = 0.45 * np.sin(2 * np.pi * f1 * t / 16000.0) + 0.25 * np.sin(
        2 * np.pi * f2 * t / 16000.0 + 0.3
    )
    return np.round(sig * 32767.0).astype(np.int16)


def synth_mdct_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic OMA1 (lossy MDCT, functions/mdct.py) payload per
    id: n = 2000 + (id%10)*100 samples at 16 kHz, encoded at the
    default m=256 / qbits=10 operating point. Encoding runs
    distributed in mapInPandas."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import mdct as _mdct

        for pdf in batches:
            payloads = [
                _mdct.encode_mdct(_mdct_synth_signal(int(d)), sample_rate=16000)
                for d in pdf[id_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def mdct_quality_stats(df: DataFrame, min_snr_db: float = 25.0) -> DataFrame:
    """Decode OMA1 payloads and audit the lossy codec's CONTRACTS
    end to end: structural dims, reconstruction SNR >= `min_snr_db`
    against the re-synthesized original (the decoder has the same
    closed-form generator the encoder used), and that the bitstream
    actually compressed below raw 16-bit PCM. Returns (doc_id,
    sample_rate, n_samples, n_channels, snr_ok, compressed_smaller)
    — every column oracle-predictable, so a full hash gate covers a
    LOSSY codec (the quality/compression booleans only hold if the
    transform, quantizer and Rice coder all work)."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import mdct as _mdct

        for pdf in batches:
            srs, ns, chs, oks, smalls = [], [], [], [], []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                pcm, sr = _mdct.decode_mdct(bytes(payload))
                orig = _mdct_synth_signal(int(d))
                x = orig.astype(np.float64) / 32768.0
                y = pcm.astype(np.float64) / 32768.0
                err = x - y
                pe = float(np.sum(err * err))
                snr = float("inf") if pe == 0 else 10.0 * np.log10(
                    float(np.sum(x * x)) / pe
                )
                srs.append(sr)
                ns.append(len(pcm))
                chs.append(1)
                oks.append(bool(snr >= min_snr_db))
                smalls.append(bool(len(payload) < 2 * len(orig)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(srs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "snr_ok": pd.Series(oks, dtype="bool"),
                    "compressed_smaller": pd.Series(smalls, dtype="bool"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        stats_batches, MDCT_STATS_SCHEMA
    )


MC_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_skip_blocks", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("pos_checksum", LongType()),
    ]
)

_MC_H, _MC_W = 24, 32


def _mc_synth_frames(d: int) -> "np.ndarray":
    """Torus-shifted linear pattern per id: frame f shifts the base
    (31y + 17x + 7d) % 251 by (f*sx, f*sy) with wraparound. Every
    field is SQL-closed-form: dims, per-pixel values, AND the
    skip-block count (interior blocks have an exact in-bounds match
    for the true motion vector; seam blocks provably never match a
    pure translation because 31*sy + 17*sx and the wrap offsets are
    nonzero mod 251 for |s| <= 4)."""
    import numpy as np

    h, w = _MC_H, _MC_W
    n = 4 + d % 3
    sx, sy = 1 + d % 3, d % 3
    base = (
        31 * np.arange(h)[:, None] + 17 * np.arange(w)[None, :] + 7 * d
    ) % 251
    return np.stack(
        [
            base[
                (np.arange(h)[:, None] - f * sy) % h,
                (np.arange(w)[None, :] - f * sx) % w,
            ]
            for f in range(n)
        ]
    ).astype(np.uint8)


def synth_mc_video_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic OMV1 (motion-compensated video, mcvideo.py)
    payload per id, encoded at qstep=1 (lossless-residual mode) so
    reconstruction is bit-exact. Encoding runs distributed in
    mapInPandas."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import mcvideo as _mc

        for pdf in batches:
            payloads = [
                _mc.encode_mc_video(_mc_synth_frames(int(d)), qstep=1)
                for d in pdf[id_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def mc_video_stats(df: DataFrame) -> DataFrame:
    """Decode OMV1 payloads and emit integer-exact per-video facts:
    dims, the decoder's skip-block count (proves the motion SEARCH
    found the true vector wherever an in-bounds exact match exists),
    total pixel sum and a (frame, position)-weighted checksum of
    every decoded pixel — all closed-form for the torus synth, so a
    LOSSY-family codec gets a full hash gate in its lossless-residual
    mode. A decoder that mis-applies a motion vector, flips residual
    signs or desyncs the Rice stream breaks pos_checksum."""

    def stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import mcvideo as _mc

        for pdf in batches:
            ns, ws, hs, skips, sums, chks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                frames, n_skip = _mc.decode_mc_video(bytes(payload))
                n, h, w = frames.shape
                pix = frames.astype(np.int64)
                fw = (np.arange(n, dtype=np.int64) + 1)[:, None, None]
                pw = (
                    np.arange(h, dtype=np.int64)[:, None] * w
                    + np.arange(w, dtype=np.int64)[None, :]
                    + 1
                )[None, :, :]
                ns.append(n)
                ws.append(w)
                hs.append(h)
                skips.append(int(n_skip))
                sums.append(int(pix.sum()))
                chks.append(int((pix * fw * pw).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.Series(ns, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_skip_blocks": pd.Series(skips, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "pos_checksum": pd.Series(chks, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        stats_batches, MC_STATS_SCHEMA
    )


AUGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("pos_checksum", LongType()),
        StructField("reencode_ok", BooleanType()),
    ]
)


def augment_images(df: DataFrame) -> DataFrame:
    """Training-data image augmentation through the REAL codecs:
    decode (signature dispatch) -> horizontal flip -> center-ish
    crop (drop a 1px border: rows 1..h-2, cols 1..w-2) -> PNG
    re-encode -> decode again. Emits integer facts of the AUGMENTED
    image — dims, pixel sum, a position-weighted checksum (flip and
    crop are pure index permutations, so both are SQL-closed-form
    for a synthetic pattern) — plus `reencode_ok`, which pins the
    encode half of the round trip inside the same plan. The whole
    augmentation is one Arrow-batched mapInPandas stage: payloads
    never leave the executor, metadata rows are all that shuffles.
    Requires inputs of at least 3x3."""

    def aug_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import png as _png

        for pdf in batches:
            ws, hs, chs, sums, chks, oks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                img = _decode_any_image(bytes(payload))
                if img.ndim == 2:
                    img = img[:, :, None]
                flipped = img[:, ::-1, :]
                aug = flipped[1:-1, 1:-1, :]
                h, w, ch = aug.shape
                pix = aug.astype(np.int64)
                pw = (
                    np.arange(h, dtype=np.int64)[:, None] * w
                    + np.arange(w, dtype=np.int64)[None, :]
                    + 1
                )[:, :, None]
                cw = np.arange(ch, dtype=np.int64)[None, None, :] + 1
                enc = _png.encode_png(
                    np.ascontiguousarray(aug[:, :, 0] if ch == 1 else aug)
                )
                dec = _png.decode_png(enc)
                if dec.ndim == 2:
                    dec = dec[:, :, None]
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                sums.append(int(pix.sum()))
                chks.append(int((pix * pw * cw).sum()))
                oks.append(bool(np.array_equal(dec, aug)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "pos_checksum": pd.Series(chks, dtype="int64"),
                    "reencode_ok": pd.Series(oks, dtype="bool"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(aug_batches, AUGMENT_SCHEMA)


def augment_audio_gain(
    df: DataFrame, gain_num: int = 3, gain_den: int = 2
) -> DataFrame:
    """Training-data audio augmentation through the real codecs:
    decode (signature dispatch) -> integer-exact gain
    (sample * gain_num) div gain_den, saturating at int16 — the
    volume-perturbation augment, kept on integers so every output
    sample is SQL-closed-form — -> WAV re-encode -> decode again.
    One Arrow mapInPandas stage; payloads never leave the executor.
    Emits (doc_id, sample_rate, n_samples, n_channels, sample_sum,
    n_clipped, reencode_ok)."""

    def aug_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        from onionnet_spark.functions import wav as _wav

        for pdf in batches:
            srs, ns, chs, sums, clips, oks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                samples, sr = _decode_any_audio(bytes(payload))
                s = samples.astype(np.int64)
                # floor-div like SQL's integral div (C-style trunc
                # differs on negatives; use Python floor semantics on
                # the SCALED value both sides via // on positives and
                # explicit handling: Spark/DuckDB `div` TRUNCATES, so
                # mirror trunc here: sign * (|x|*num // den)
                mag = (np.abs(s) * gain_num) // gain_den
                boosted = np.sign(s) * mag
                clipped = np.clip(boosted, -32768, 32767)
                n_clip = int((boosted != clipped).sum())
                aug = clipped.astype(np.int16)
                enc = _wav.encode_wav(aug, sr)
                dec, _sr2 = _wav.decode_wav(enc)
                srs.append(sr)
                ns.append(aug.shape[0])
                chs.append(aug.shape[1])
                sums.append(int(aug.astype(np.int64).sum()))
                clips.append(n_clip)
                oks.append(bool(np.array_equal(dec, aug)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(srs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "sample_sum": pd.Series(sums, dtype="int64"),
                    "n_clipped": pd.Series(clips, dtype="int64"),
                    "reencode_ok": pd.Series(oks, dtype="bool"),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("sample_sum", LongType()),
            StructField("n_clipped", LongType()),
            StructField("reencode_ok", BooleanType()),
        ]
    )
    return df.select("doc_id", "payload").mapInPandas(aug_batches, schema)


PATCH_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("patch_row", IntegerType()),
        StructField("patch_col", IntegerType()),
        StructField("n_values", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)


def image_patch_stats(df: DataFrame, patch: int = 2) -> DataFrame:
    """ViT-style patch extraction over REAL image decode: tile each
    decoded image into `patch` x `patch` pixel patches (edge patches
    keep their true, smaller size — nothing is padded or dropped) and
    emit one row per patch with integer sum/min/max over all its
    values (pixels x channels). This is the patchify step every
    vision-transformer data pipeline runs before embedding; the
    integer stats make a closed-form SQL oracle possible and catch
    row/column tiling bugs a whole-image pixel_sum is blind to.

    Row fanout happens inside mapInPandas — one row per (image,
    patch), never a whole corpus of pixels on one executor."""

    def patch_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "patch_row", "patch_col", "n_values",
                "px_sum", "px_min", "px_max",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_any_image(bytes(payload))
                arr = np.asarray(img, dtype=np.int64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w, _ch = arr.shape
                for pr in range((h + patch - 1) // patch):
                    for pc in range((w + patch - 1) // patch):
                        tile = arr[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                            :,
                        ]
                        rows["doc_id"].append(doc_id)
                        rows["patch_row"].append(pr)
                        rows["patch_col"].append(pc)
                        rows["n_values"].append(int(tile.size))
                        rows["px_sum"].append(int(tile.sum()))
                        rows["px_min"].append(int(tile.min()))
                        rows["px_max"].append(int(tile.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "patch_row": pd.Series(rows["patch_row"], dtype="int32"),
                    "patch_col": pd.Series(rows["patch_col"], dtype="int32"),
                    "n_values": pd.Series(rows["n_values"], dtype="int64"),
                    "px_sum": pd.Series(rows["px_sum"], dtype="int64"),
                    "px_min": pd.Series(rows["px_min"], dtype="int32"),
                    "px_max": pd.Series(rows["px_max"], dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        patch_batches, PATCH_STATS_SCHEMA
    )


IMAGE_HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bin", IntegerType()),
        StructField("n_px", LongType()),
    ]
)


def image_intensity_histogram(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-image intensity histogram over REAL decode: every pixel
    value (all channels) dealt into ``n_bins`` equal-width bins of
    the 0-255 range (bin = value * n_bins // 256, exact integer
    arithmetic so a SQL oracle reproduces it bit-for-bit). The
    exposure/contrast QA every image-training intake runs before
    choosing normalization constants; empty bins are NOT emitted
    (sparse layout — the oracle agrees)."""

    def hist_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            ids, bins, counts = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_any_image(bytes(payload))
                arr = np.asarray(img, dtype=np.int64).ravel()
                b = arr * n_bins // 256
                uniq, cnt = np.unique(b, return_counts=True)
                ids.extend([doc_id] * len(uniq))
                bins.extend(int(x) for x in uniq)
                counts.extend(int(x) for x in cnt)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "bin": pd.Series(bins, dtype="int32"),
                    "n_px": pd.Series(counts, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        hist_batches, IMAGE_HIST_SCHEMA
    )
