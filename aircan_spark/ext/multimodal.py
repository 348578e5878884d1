"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas over mapInPandas.

Decode status:
- REAL, stdlib+numpy only: WAV PCM audio (``wave`` + numpy —
  duration/rate/RMS), image dimensions (PNG IHDR / JPEG SOFn / GIF / BMP
  header parse), full pixel decode for uncompressed containers
  (24/32-bit BMP and type-2 TGA) AND for 8-bit non-interlaced PNG (all
  color types, all five scanline filters — zlib inflate + numpy
  unfilter, :func:`decode_png`/:func:`encode_png`), nearest-neighbor
  resize, and BMP re-encode — the resize path runs end-to-end on both
  uncompressed and zlib-compressed inputs with no external libs.
- Seamed (NULL passthrough): JPEG entropy decode and exotic PNG (16-bit,
  Adam7) via PIL/opencv, compressed audio (soundfile/librosa), video
  keyframes (ffmpeg) — those libs aren't in this container; the
  BMP/TGA/PNG kernels are the working reference implementation at the
  same seam, and the surrounding Spark plumbing (schema, Arrow batching,
  partition-local execution) is identical either way.

Scale design: media bytes never leave the executor they were read on —
all kernels are mapInPandas (per-partition Arrow batches, no shuffle);
the only shuffles are user-requested groupBys downstream. Batch sizes are
bounded by spark.sql.execution.arrow.maxRecordsPerBatch, so a partition of
large blobs streams through fixed memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attach_binary(
    df: DataFrame, id_col: str, payload_col: str, mime_type: str = "application/octet-stream"
) -> DataFrame:
    """Wrap an existing column as a multimodal (binary + metadata) record.
    For text payloads the bytes are the UTF-8 encoding — in production the
    binary column comes straight from parquet/webdataset."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit(mime_type).alias("mime_type"),
        F.create_map(
            F.lit("n_bytes"), F.length(content).cast("string")
        ).alias("meta"),
    )


BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
    ]
)


def byte_features(df: DataFrame) -> DataFrame:
    """Deterministic per-blob features through the REAL Arrow/pandas batch
    path (the same plumbing a real image featurizer uses — swap the body
    for model inference and nothing else changes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else None),
                    "first_byte": content.map(
                        lambda b: int(b[0]) if b else None
                    ),
                    "byte_mean": content.map(
                        lambda b: round(sum(b) / len(b), 6) if b else None
                    ),
                }
            )

    return df.mapInPandas(kernel, BYTE_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


_JPEG_SOF_MARKERS = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color-type -> samples/pixel


def image_dims(blob: bytes) -> tuple[int, int, int] | None:
    """REAL (width, height, channels) from container headers — stdlib-only
    ``struct`` parsing of PNG IHDR, JPEG SOFn, GIF logical screen and BMP
    info header. Returns None for unrecognized/truncated containers (full
    pixel decode is the PIL seam, not needed for dimensions)."""
    import struct

    if blob is None or len(blob) < 10:
        return None
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 26:
        w, h = struct.unpack(">II", blob[16:24])
        return w, h, _PNG_CHANNELS.get(blob[25], 3)
    if blob[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(blob) and blob[i] == 0xFF:
            marker = blob[i + 1]
            if marker in _JPEG_SOF_MARKERS:
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return w, h, blob[i + 9]
            i += 2 + struct.unpack(">H", blob[i + 2 : i + 4])[0]
        return None
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return w, h, 3
    if blob[:2] == b"BM" and len(blob) >= 26:
        w, h = struct.unpack("<ii", blob[18:26])
        return w, abs(h), 3  # negative height = top-down rows
    return None


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image blobs to (width, height, channels).

    Default: REAL stdlib header parse (PNG/JPEG/GIF/BMP via
    :func:`image_dims`); unrecognized containers yield NULL dims — at
    corpus scale undecodable blobs are data, not errors. Full pixel decode
    (needed for resize/model input, not for dimensions) remains the PIL
    seam in :func:`resize_images`. ``fake=True`` keeps the legacy
    byte-derived pseudo-dims for plumbing tests."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            if fake:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": content.map(lambda b: 1 + int(b[0]) % 64 if b else None),
                        "height": content.map(lambda b: 1 + int(b[-1]) % 64 if b else None),
                        "channels": content.map(lambda b: 3 if b else None),
                    }
                )
                continue
            dims = content.map(image_dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": dims.map(lambda d: d[0] if d else None),
                    "height": dims.map(lambda d: d[1] if d else None),
                    "channels": dims.map(lambda d: d[2] if d else None),
                }
            )

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing for video blobs: one output row per sampled
    frame. The fake 'frame' is a byte slice; a real implementation replaces
    the slicing with ffmpeg keyframe extraction — the explode/batch shape
    (1 blob -> N rows, executed partition-local) is the part that matters
    at scale and is real here."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                n = min(max_frames, max(1, len(blob) // every_n_bytes))
                for i in range(n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(bytes(blob[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(kernel, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def decode_pixels(blob: bytes):
    """REAL pixel decode, stdlib+numpy only: 24/32-bit BI_RGB BMP
    (bottom-up or top-down), type-2 (uncompressed true-color) TGA, and
    8-bit non-interlaced PNG of any color type (:func:`decode_png` —
    zlib inflate + per-spec unfilter). Returns an (h, w, 3) uint8 RGB
    array, or None for unrecognized/compressed/truncated blobs — the
    remaining PIL/opencv seam is JPEG entropy coding and exotic PNG
    variants (16-bit, Adam7)."""
    import struct

    import numpy as np

    if blob is None or len(blob) < 18:
        return None
    b = bytes(blob)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(b)
    if b[:2] == b"BM" and len(b) >= 54:
        data_off = struct.unpack("<I", b[10:14])[0]
        hdr_size = struct.unpack("<I", b[14:18])[0]
        if hdr_size < 40:
            return None  # BITMAPCOREHEADER not supported
        w, h_raw = struct.unpack("<ii", b[18:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
        if compression != 0 or bpp not in (24, 32) or w <= 0 or planes != 1:
            return None
        h = abs(h_raw)
        nch = bpp // 8
        row_stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
        need = data_off + row_stride * h
        if len(b) < need:
            return None
        rows = np.frombuffer(b, dtype="u1", count=row_stride * h, offset=data_off)
        rows = rows.reshape(h, row_stride)[:, : w * nch].reshape(h, w, nch)
        if h_raw > 0:
            rows = rows[::-1]  # bottom-up storage -> top-down array
        bgr = rows[:, :, :3]
        return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR -> RGB
    # TGA has no magic; identify by the type-2 header shape
    if b[1] == 0 and b[2] == 2 and b[16] in (24, 32):
        id_len = b[0]
        w, h = struct.unpack("<HH", b[12:16])
        nch = b[16] // 8
        top_down = bool(b[17] & 0x20)
        off = 18 + id_len
        if w <= 0 or h <= 0 or len(b) < off + w * h * nch:
            return None
        px = np.frombuffer(b, dtype="u1", count=w * h * nch, offset=off)
        px = px.reshape(h, w, nch)
        if not top_down:
            px = px[::-1]
        return np.ascontiguousarray(px[:, :, :3][:, :, ::-1])  # BGRA/BGR -> RGB
    return None


def encode_bmp(rgb) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up, rows padded to 4 bytes) — the inverse of
    :func:`decode_pixels`' BMP branch, so resized output remains a
    decodable image and round-trips losslessly."""
    import struct

    import numpy as np

    h, w = rgb.shape[:2]
    row_stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype="u1")
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


def decode_png(blob: bytes):
    """REAL PNG pixel decode, stdlib ``zlib`` + numpy only — fills the
    former PIL seam for the most common compressed image container.

    Supported: 8-bit-depth, non-interlaced PNGs of every color type —
    0 grayscale, 2 truecolor, 3 palette (PLTE), 4 gray+alpha, 6 RGBA —
    with all five scanline filters (None/Sub/Up/Average/Paeth) per the
    PNG spec §9. Returns an (h, w, 3) uint8 RGB array (alpha dropped,
    gray broadcast, palette mapped), or None for anything else (16-bit,
    Adam7 interlace, truncated/corrupt) — at corpus scale undecodable
    blobs are data, not errors.

    Unfiltering: Up/None rows are fully numpy-vectorized; Sub/Average/
    Paeth carry a left-neighbor recurrence, so those rows walk the
    scanline in Python — exact but slow on megapixel images. This is the
    deliberate pure-python trade: the kernel is partition-local (no
    shuffle either way) and a production image fleet drops PIL/opencv
    into the same seam for the hot path; this implementation makes the
    path *correct and testable* with no native deps.
    """
    import struct
    import zlib

    import numpy as np

    if blob is None or len(blob) < 45 or bytes(blob[:8]) != b"\x89PNG\r\n\x1a\n":
        return None
    b = bytes(blob)
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            return None  # truncated chunk
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + CRC
    if ihdr is None or not idat or len(ihdr) < 13:
        return None
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if depth != 8 or interlace != 0 or color not in (0, 2, 3, 4, 6) or not w or not h:
        return None
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * nch
    if len(raw) < h * (1 + stride):
        return None
    rows = np.frombuffer(raw, dtype="u1", count=h * (1 + stride)).reshape(h, 1 + stride)
    filters, scan = rows[:, 0], rows[:, 1:].astype("int64")
    out = np.zeros((h, stride), dtype="int64")
    prev = np.zeros(stride, dtype="int64")
    for y in range(h):
        f, cur = int(filters[y]), scan[y]
        if f == 0:
            line = cur
        elif f == 2:  # Up — vectorized over the whole scanline
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — left-neighbor recurrence
            line = cur.copy()
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                if f == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
                else:  # Paeth predictor, spec §9.4
                    bb = prev[x]
                    c = prev[x - nch] if x >= nch else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                    line[x] = (line[x] + pr) & 0xFF
        else:
            return None  # invalid filter byte
        out[y] = line
        prev = line
    px = out.astype("u1").reshape(h, w, nch)
    if color == 2:
        return np.ascontiguousarray(px)
    if color == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if color == 0 or color == 4:
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    # color == 3: palette lookup
    if plte is None or len(plte) % 3:
        return None
    pal = np.frombuffer(plte, dtype="u1").reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max()) >= pal.shape[0]:
        return None
    return np.ascontiguousarray(pal[idx])


def encode_png(rgb, filters=None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (stdlib ``zlib``) — the inverse of :func:`decode_png`'s color-type-2
    branch. ``filters`` optionally gives the per-row filter type
    (defaults to 0/None for all rows); passing ``[0,1,2,3,4,...]`` makes
    fixtures that exercise every unfilter branch of the decoder."""
    import struct
    import zlib

    import numpy as np

    rgb = np.ascontiguousarray(rgb, dtype="u1")
    h, w = rgb.shape[:2]
    flat = rgb.reshape(h, w * 3).astype("int64")
    stride = w * 3
    lines = bytearray()
    prev = np.zeros(stride, dtype="int64")
    for y in range(h):
        f = int(filters[y % len(filters)]) if filters else 0
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(3, dtype="int64"), cur[:-3]])
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(3, dtype="int64"), cur[:-3]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            left = np.concatenate([np.zeros(3, dtype="int64"), cur[:-3]])
            ul = np.concatenate([np.zeros(3, dtype="int64"), prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        lines.append(f)
        lines.extend(enc.astype("u1").tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def nn_resize(rgb, width: int, height: int):
    """Nearest-neighbor resample to (height, width, 3) via numpy index
    arrays — sample centers at floor((i+0.5)*src/dst), the classic NN
    mapping (deterministic and replicable in closed form, which is what
    makes the resize path oracle-checkable)."""
    import numpy as np

    h, w = rgb.shape[:2]
    ys = ((np.arange(height) + 0.5) * h / height).astype("int64")
    xs = ((np.arange(width) + 0.5) * w / width).astype("int64")
    return rgb[ys[:, None], xs[None, :]]


def resize_images(df: DataFrame, width: int = 32, height: int = 32, fake: bool = False) -> DataFrame:
    """Resize image blobs to (width, height).

    REAL for BMP/TGA and 8-bit PNG: :func:`decode_pixels` →
    :func:`nn_resize` (numpy nearest-neighbor) → :func:`encode_bmp`, all
    partition-local in one Arrow batch kernel. Blobs the decoder cannot
    reach (JPEG entropy coding — the PIL seam) yield NULL content; at
    corpus scale undecodable blobs are data, not errors. ``fake=True``
    keeps the legacy byte-downsample for plumbing tests."""
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                def real_resize(blob):
                    px = decode_pixels(blob)
                    if px is None:
                        return None
                    return encode_bmp(nn_resize(px, width, height))

                content = pdf["content"].map(real_resize)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": content.map(lambda c: width if c is not None else None),
                        "height": content.map(lambda c: height if c is not None else None),
                        "content": content,
                    }
                )
                continue

            def shrink(blob):
                if blob is None:
                    return None
                if not len(blob):
                    return bytes(target)
                step = max(1, len(blob) // target)
                out = bytes(blob[::step][:target])
                return out + bytes(target - len(out))

            content = pdf["content"].map(shrink)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": content,
                }
            )

    return df.mapInPandas(kernel, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


_PCM_NORM = {1: ("u1", 128.0, 128.0), 2: ("<i2", 0.0, 32768.0), 4: ("<i4", 0.0, 2147483648.0)}


def wav_features(blob: bytes) -> tuple[float, int, float] | None:
    """REAL WAV PCM decode, stdlib-only: RIFF/fmt parsing via ``wave``,
    sample normalization to [-1, 1) per bit depth, RMS over all channels.
    Returns (duration_s, sample_rate, rms) or None if not a decodable
    PCM WAV (compressed codecs are the soundfile/librosa seam)."""
    import io
    import wave

    import numpy as np

    if blob is None or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(bytes(blob))) as w:
            n_frames, rate, width = w.getnframes(), w.getframerate(), w.getsampwidth()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError):
        return None
    if width not in _PCM_NORM or rate <= 0:
        return None  # 24-bit / compressed: plug a real codec at the seam
    dtype, offset, scale = _PCM_NORM[width]
    x = (np.frombuffer(raw, dtype=dtype).astype("float64") - offset) / scale
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    return (round(n_frames / rate, 6), rate, round(rms, 6))


def audio_features(df: DataFrame, fake: bool = False, assumed_rate: int = 16_000) -> DataFrame:
    """Audio blob features (duration / sample rate / RMS energy).

    Default: REAL stdlib WAV PCM decode (:func:`wav_features` — 8/16/32-bit
    PCM; header-declared rate, normalized RMS). Non-WAV codecs yield NULLs
    — mp3/ogg/flac decode is the soundfile/librosa seam. ``fake=True``
    keeps the legacy raw-8-bit-PCM interpretation for plumbing tests."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:

            def feats(blob):
                if blob is None or not len(blob):
                    return (None, None, None)
                if not fake:
                    return wav_features(blob) or (None, None, None)
                x = np.frombuffer(blob, dtype="uint8").astype("float64") - 128.0
                return (
                    round(len(x) / assumed_rate, 6),
                    assumed_rate,
                    round(float(np.sqrt((x * x).mean())), 6),
                )

            trip = pdf["content"].map(feats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": trip.map(lambda t: t[0]),
                    "sample_rate": trip.map(lambda t: t[1]),
                    "rms": trip.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


AUDIO_WINDOWS_SCHEMA = (
    "media_id long, window_idx long, t_start_s double, rms double, is_silence boolean"
)


def audio_rms_windows(
    df: DataFrame,
    window_s: float = 0.05,
    silence_rms: float = 0.01,
) -> DataFrame:
    """Windowed audio energy profile: split each decodable PCM WAV into
    fixed ``window_s`` windows and emit per-window RMS plus a silence
    flag — the voice-activity/segmentation primitive an audio curation
    pipeline runs before transcription (drop silent spans, locate
    speech). The trailing partial window is kept (RMS over its actual
    samples).

    Engine shape: Arrow-batched ``mapInPandas`` over the REAL stdlib
    WAV decode (:func:`wav_features`'s parser); per-file work,
    embarrassingly parallel, zero shuffle — the output fans out one row
    per window, so the operator is its own Generate. Non-WAV codecs
    produce no rows (the soundfile/librosa seam)."""
    import io
    import wave

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "window_idx": [], "t_start_s": [],
                "rms": [], "is_silence": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None or bytes(blob[:4]) != b"RIFF":
                    continue
                try:
                    with wave.open(io.BytesIO(bytes(blob))) as w:
                        rate, width = w.getframerate(), w.getsampwidth()
                        raw = w.readframes(w.getnframes())
                except (wave.Error, EOFError):
                    continue
                if width not in _PCM_NORM or rate <= 0:
                    continue
                dtype, offset, scale = _PCM_NORM[width]
                x = (np.frombuffer(raw, dtype=dtype).astype("float64") - offset) / scale
                step = max(int(round(window_s * rate)), 1)
                for wi in range(0, max((len(x) + step - 1) // step, 0)):
                    seg = x[wi * step : (wi + 1) * step]
                    rms = float(np.sqrt((seg * seg).mean())) if len(seg) else 0.0
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi)
                    out["t_start_s"].append(round(wi * step / rate, 6))
                    out["rms"].append(round(rms, 6))
                    out["is_silence"].append(rms < silence_rms)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, AUDIO_WINDOWS_SCHEMA)
