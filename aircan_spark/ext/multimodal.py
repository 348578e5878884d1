"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas over mapInPandas.

Decode status:
- REAL, stdlib+numpy only: WAV PCM audio (``wave`` + numpy —
  duration/rate/RMS), image dimensions (PNG IHDR / JPEG SOFn / GIF / BMP
  header parse), full pixel decode for uncompressed containers
  (24/32-bit BMP and type-2 TGA), for 8-bit non-interlaced PNG (all
  color types, all five scanline filters — zlib inflate + numpy
  unfilter, :func:`decode_png`/:func:`encode_png`), AND for baseline
  sequential JPEG (table-driven Huffman, dequant, orthonormal IDCT,
  4:4:4/4:2:0, DRI/RSTn — :func:`decode_jpeg`/:func:`encode_jpeg`),
  plus nearest-neighbor resize and BMP re-encode — the resize path runs
  end-to-end on uncompressed, zlib-compressed and DCT-compressed inputs
  with no external libs.
- PROGRESSIVE (SOF2) JPEG is also real as of round 8: multi-scan
  successive approximation (DC first/refine, AC spectral selection with
  EOB runs, AC correction-bit refinement per T.81 Annex G), both
  directions (:func:`encode_jpeg_progressive` / the same
  :func:`decode_jpeg` entry point), pinned byte-identical to the
  baseline decode of the same coefficients.
- Seamed (NULL passthrough): 12-bit/arithmetic-coded JPEG and
  exotic PNG (16-bit, Adam7) via PIL/opencv, compressed audio
  (soundfile/librosa), video keyframes (ffmpeg) — those libs aren't in
  this container; the BMP/TGA/PNG/JPEG kernels are the working
  reference implementation at the same seam, and the surrounding Spark
  plumbing (schema, Arrow batching, partition-local execution) is
  identical either way.

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
    if b[:2] == b"\xff\xd8":
        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(b)
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


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) per pass
# (PNG spec §8.2). A pass with zero pixels in either axis emits NO
# scanline bytes at all.
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw, h, wpx, bpp):
    """Reverse the five PNG scanline filters (spec §9) over ``h`` rows of
    ``wpx`` pixels × ``bpp`` bytes each (the filter's left-neighbor
    distance — channels×bytes-per-sample). None/Up rows are fully
    numpy-vectorized; Sub is a per-column prefix sum mod 256
    (``np.cumsum & 0xFF``); Average/Paeth carry a true sequential
    left-neighbor recurrence and run a Python loop over plain lists
    (several-fold faster than numpy scalar indexing). Returns an
    (h, wpx*bpp) uint8 array, or None on an invalid filter byte."""
    import numpy as np

    stride = wpx * bpp
    rows = np.frombuffer(raw, dtype="u1", count=h * (1 + stride)).reshape(h, 1 + stride)
    filters, scan = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype="u1")
    prev = np.zeros(stride, dtype="u1")
    for y in range(h):
        f, cur = int(filters[y]), scan[y]
        if f == 0:
            line = cur.copy()
        elif f == 2:  # Up — vectorized; uint8 add wraps mod 256 natively
            line = cur + prev
        elif f == 1:  # Sub — per-column prefix sum mod 256, vectorized
            ch = cur.reshape(wpx, bpp).astype("int64")
            line = (np.cumsum(ch, axis=0) & 0xFF).astype("u1").reshape(stride)
        elif f == 3:  # Average — sequential recurrence over python lists
            cl, pl = cur.tolist(), prev.tolist()
            ln = [0] * stride
            for x in range(stride):
                a = ln[x - bpp] if x >= bpp else 0
                ln[x] = (cl[x] + ((a + pl[x]) >> 1)) & 0xFF
            line = np.asarray(ln, dtype="u1")
        elif f == 4:  # Paeth predictor, spec §9.4 — python-list loop
            cl, pl = cur.tolist(), prev.tolist()
            ln = [0] * stride
            for x in range(stride):
                a = ln[x - bpp] if x >= bpp else 0
                bb = pl[x]
                c = pl[x - bpp] if x >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                ln[x] = (cl[x] + pr) & 0xFF
            line = np.asarray(ln, dtype="u1")
        else:
            return None  # invalid filter byte
        out[y] = line
        prev = line
    return out


def decode_png(blob: bytes):
    """REAL PNG pixel decode, stdlib ``zlib`` + numpy only — fills the
    former PIL seam for the most common compressed image container.

    Supported: 8-bit AND 16-bit depths, sequential AND Adam7-interlaced
    layouts, every color type — 0 grayscale, 2 truecolor, 3 palette
    (PLTE, 8-bit only per spec §11.2.2), 4 gray+alpha, 6 RGBA — with
    all five scanline filters (None/Sub/Up/Average/Paeth) per spec §9.
    Returns an (h, w, 3) uint8 RGB array (alpha dropped, gray
    broadcast, palette mapped, 16-bit down-converted via the high
    byte), or None for anything else (truncated/corrupt) — at corpus
    scale undecodable blobs are data, not errors.

    Adam7 (spec §8.2): each of the 7 passes is an independent
    sub-image with its own scanlines + filters; decoded blocks scatter
    into the output via strided numpy assignment — no per-pixel
    deinterlace loop. 16-bit: the filter distance becomes
    channels×2 bytes; unfiltered rows view as big-endian u2 and the
    high byte is taken (the standard 16→8 quick conversion).

    Robustness: IDAT inflation is bounded by the total size the IHDR
    promises across passes (``decompressobj(...).decompress(data,
    max_length)``) so a zlib bomb cannot expand past the declared image
    size, and images above a 2^26-pixel cap are rejected before any
    allocation.
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
    if (
        depth not in (8, 16)
        or interlace not in (0, 1)
        or color not in (0, 2, 3, 4, 6)
        or not w
        or not h
    ):
        return None
    if depth == 16 and color == 3:
        return None  # palette indices are never 16-bit (spec §11.2.2)
    if w * h > (1 << 26):  # forged-header / decompression-bomb cap
        return None
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = nch * (depth // 8)
    passes = _ADAM7_PASSES if interlace else ((0, 0, 1, 1),)
    plan, need = [], 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            plan.append((x0, y0, dx, dy, pw, ph, need))
            need += ph * (1 + pw * bpp)
    try:
        # bound inflation by what the IHDR promises — a zlib bomb stops here
        raw = zlib.decompressobj().decompress(b"".join(idat), need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    img = np.zeros((h, w, bpp), dtype="u1")
    for x0, y0, dx, dy, pw, ph, off in plan:
        sub = _png_unfilter(raw[off : off + ph * (1 + pw * bpp)], ph, pw, bpp)
        if sub is None:
            return None
        img[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if depth == 16:
        px = np.ascontiguousarray(img.reshape(h, w, nch, 2)[:, :, :, 0])
    else:
        px = img
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


def encode_png(rgb, filters=None, interlace: bool = False, depth: int = 8) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a truecolor PNG (stdlib
    ``zlib``) — the inverse of :func:`decode_png`'s color-type-2 branch.
    ``filters`` optionally gives the filter type per emitted scanline
    (defaults to 0/None; passing ``[0,1,2,3,4,...]`` makes fixtures
    that exercise every unfilter branch). ``interlace=True`` emits the
    Adam7 7-pass layout (spec §8.2); ``depth=16`` widens samples with
    the standard 8→16 expansion v*257 (so the decoder's high-byte
    down-conversion round-trips exactly)."""
    import struct
    import zlib

    import numpy as np

    if depth not in (8, 16):
        raise ValueError(f"bad PNG depth {depth}")
    rgb = np.ascontiguousarray(rgb, dtype="u1")
    h, w = rgb.shape[:2]
    if depth == 16:
        wide = (rgb.astype(">u2") * 257).astype(">u2")
        byte_img = np.frombuffer(wide.tobytes(), dtype="u1").reshape(h, w, 6)
    else:
        byte_img = rgb.reshape(h, w, 3)
    bpp = byte_img.shape[2]
    lines = bytearray()
    emitted = 0  # global scanline counter — filters cycle across passes

    def emit_block(block):
        """Filter one pass's (ph, pw, bpp) block into ``lines``."""
        nonlocal emitted
        ph, pw = block.shape[:2]
        flat = block.reshape(ph, pw * bpp).astype("int64")
        stride = pw * bpp
        z = np.zeros(bpp, dtype="int64")
        prev = np.zeros(stride, dtype="int64")
        for y in range(ph):
            f = int(filters[emitted % len(filters)]) if filters else 0
            cur = flat[y]
            if f == 0:
                enc = cur
            elif f == 1:
                left = np.concatenate([z, cur[:-bpp]])
                enc = (cur - left) & 0xFF
            elif f == 2:
                enc = (cur - prev) & 0xFF
            elif f == 3:
                left = np.concatenate([z, cur[:-bpp]])
                enc = (cur - ((left + prev) >> 1)) & 0xFF
            elif f == 4:
                left = np.concatenate([z, cur[:-bpp]])
                ul = np.concatenate([z, prev[:-bpp]])
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
                )
                enc = (cur - pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter {f}")
            lines.append(f)
            lines.extend(enc.astype("u1").tobytes())
            prev = cur
            emitted += 1

    if interlace:
        for x0, y0, dx, dy in _ADAM7_PASSES:
            block = byte_img[y0::dy, x0::dx]
            if block.shape[0] and block.shape[1]:
                emit_block(block)
    else:
        emit_block(byte_img)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 2, 0, 0, 1 if interlace else 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_gif(blob: bytes):
    """REAL GIF decode, stdlib+numpy only: GIF87a/89a header, global and
    local color tables, extension-block skip, LZW decompression
    (LSB-first code packing, dynamic code width, clear/EOI handling),
    and 4-pass interlace reordering. Returns the FIRST image frame as
    an (h, w, 3) uint8 RGB array (frame dims, composited standalone —
    multi-frame animations expose later frames via
    :func:`gif_frames`), or None for corrupt/truncated input."""
    frames = gif_frames(blob, max_frames=1)
    return frames[0][1] if frames else None


def gif_frames(blob: bytes, max_frames: int = 0):
    """Decode GIF frames: list of (frame_idx, rgb_array) — the animated
    GIF analog of :func:`decode_avi_mjpeg`. Each frame is decoded
    standalone against its own descriptor (no inter-frame disposal
    compositing — keyframe semantics, documented). None if not a GIF."""
    import numpy as np

    if blob is None or len(blob) < 13 or bytes(blob[:6]) not in (b"GIF87a", b"GIF89a"):
        return None
    b = bytes(blob)
    try:
        packed = b[10]
        pos = 13
        gct = None
        if packed & 0x80:
            size = 2 << (packed & 0x07)
            gct = np.frombuffer(b, dtype="u1", count=size * 3, offset=pos).reshape(-1, 3)
            pos += size * 3
        frames = []
        idx = 0
        while pos < len(b):
            marker = b[pos]
            pos += 1
            if marker == 0x3B:  # trailer
                break
            if marker == 0x21:  # extension: label + sub-blocks
                pos += 1
                while b[pos]:
                    pos += 1 + b[pos]
                pos += 1
                continue
            if marker != 0x2C:
                return None
            _left, _top, w, h = (
                int.from_bytes(b[pos : pos + 2], "little"),
                int.from_bytes(b[pos + 2 : pos + 4], "little"),
                int.from_bytes(b[pos + 4 : pos + 6], "little"),
                int.from_bytes(b[pos + 6 : pos + 8], "little"),
            )
            ipacked = b[pos + 8]
            pos += 9
            table = gct
            if ipacked & 0x80:
                size = 2 << (ipacked & 0x07)
                table = np.frombuffer(b, dtype="u1", count=size * 3, offset=pos).reshape(-1, 3)
                pos += size * 3
            if table is None or w <= 0 or h <= 0:
                return None
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos]:
                n = b[pos]
                data += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            pixels = _gif_lzw_decode(bytes(data), min_code, w * h)
            if pixels is None:
                return None
            px = np.asarray(pixels[: w * h], dtype="int64").reshape(h, w)
            if ipacked & 0x40:  # 4-pass interlace
                out = np.empty_like(px)
                rows = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                out[rows] = px
                px = out
            if int(px.max()) >= table.shape[0]:
                return None
            frames.append((idx, np.ascontiguousarray(table[px])))
            idx += 1
            if max_frames and len(frames) >= max_frames:
                break
        return frames or None
    except (IndexError, ValueError):
        return None


def _gif_lzw_decode(data: bytes, min_code: int, n_pixels: int):
    """GIF LZW decompress: LSB-first bit packing, dynamic code width
    from min_code+1 up to 12 bits, CLEAR resets the table, EOI ends."""
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    eoi = clear + 1
    out: list[int] = []
    table: list[tuple[int, ...]] = []

    def reset():
        nonlocal table, width
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = 0
    nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:  # table freezes at 12 bits (deferred clear)
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


def encode_gif(indices, palette=None, interlace: bool = False) -> bytes:
    """Encode an (h, w) uint8 index array as a real GIF89a with a
    256-entry palette (default: grayscale identity, so index == gray
    value — what makes fixtures closed-form). Real LZW compression:
    greedy longest-match against the growing table, dynamic code width,
    CLEAR emitted on table overflow — the canonical encoder, so the
    decoder's table-growth/width logic is genuinely exercised.
    ``interlace`` stores rows in 4-pass order."""
    import numpy as np

    idx = np.asarray(indices, dtype="u1")
    h, w = idx.shape
    if palette is None:
        g = np.arange(256, dtype="u1")
        palette = np.stack([g, g, g], axis=1)
    pal = np.asarray(palette, dtype="u1")
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0x00, 0x00])  # GCT present, 256 entries, 8-bit color
    out += pal.tobytes()
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    pixels = rows.reshape(-1).tolist()

    min_code = 8
    clear = 1 << min_code
    eoi = clear + 1
    # The encoder's own match table may run one entry ahead of the
    # decoder's (the KwKwK case), so code widths are chosen by SIMULATING
    # the decoder's table growth (dec_len bumps one code later than
    # next_code; width bumps when dec_len hits 2^width) — the exact
    # mirror of _gif_lzw_decode's loop.
    codes: list[tuple[int, int]] = []
    table: dict[tuple[int, ...], int] = {}
    next_code = 0
    dec_len = dec_width = 0
    first_in_segment = True

    def reset_tables():
        nonlocal table, next_code, dec_len, dec_width, first_in_segment
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        dec_len = eoi + 1
        dec_width = min_code + 1
        first_in_segment = True

    def emit(code):
        nonlocal dec_len, dec_width, first_in_segment
        codes.append((code, dec_width))
        if code == clear:
            return
        if first_in_segment:
            first_in_segment = False
        elif dec_len < 4096:
            dec_len += 1
        if dec_len == (1 << dec_width) and dec_width < 12:
            dec_width += 1

    reset_tables()
    emit(clear)
    run: tuple[int, ...] = ()
    for p in pixels:
        cand = run + (p,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            emit(clear)
            reset_tables()
        run = (p,)
    if run:
        emit(table[run])
    emit(eoi)

    acc = 0
    nbits = 0
    stream = bytearray()
    for code, cwidth in codes:
        acc |= code << nbits
        nbits += cwidth
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    out += bytes([min_code])
    for off in range(0, len(stream), 255):
        chunk = stream[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _dct_matrix():
    """Orthonormal 8x8 DCT-II basis C (C @ B @ C.T = forward DCT): the
    ITU T.81 A.3.3 transform in matrix form."""
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_ZIGZAG_ORDER = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitWriter:
    """JPEG entropy-coded segment writer: MSB-first bits, 0xFF bytes
    stuffed with 0x00 (T.81 F.1.2.3), 1-padded to a byte boundary."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _huff_canonical(symbols):
    """Build a canonical single-length Huffman table over ``symbols``:
    every symbol gets length L = ceil(log2(n+1)) so the all-ones code of
    length L stays unused (T.81 C.2 requires it reserved). Returns
    (bits[1..16], values, {symbol: (code, L)}) — a small, always-valid
    table the encoder writes verbatim into DHT; the decoder is fully
    table-driven so nothing here needs to match Annex K's tables."""
    vals = sorted(set(symbols))
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())  # 2^L > n strictly
    if (1 << length) <= n:
        length += 1
    bits = [0] * 17
    bits[length] = n
    return bits, vals, {s: (i, length) for i, s in enumerate(vals)}


def _mag_bits(v: int):
    """(size-category, appended-bits) for a DC diff / AC coefficient per
    T.81 F.1.2.1.1: negatives are stored as v + 2^s - 1."""
    a = abs(v)
    s = a.bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_forward(img, quant, subsample):
    """Shared forward half of the JPEG encoders: color transform, chroma
    box-downsample, edge-pad to the MCU grid, 8x8 orthonormal DCT,
    quantize, zigzag. Returns (gray, h, w, samp, hmax, vmax, mcux, mcuy,
    comp_blocks, q) where comp_blocks[ci] is (nby, nbx, 64) int64 zigzag
    coefficients — baseline and progressive are just two TRANSMISSION
    ORDERS over these identical coefficients."""
    import numpy as np

    img = np.asarray(img, dtype="u1")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.ones(64, dtype="int64") if quant is None else np.asarray(quant, dtype="int64")
    qblk = q.reshape(8, 8)
    C = _dct_matrix()

    if gray:
        planes = [img.astype("float64")]
        samp = [(1, 1)]
    else:
        r, g, b = (img[:, :, i].astype("float64") for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def edge_pad(p, th, tw):
        padded = np.empty((th, tw), dtype="float64")
        ph, pw = p.shape
        padded[:ph, :pw] = p
        padded[ph:, :pw] = p[ph - 1 :, :]  # edge-replicate pad
        padded[:, pw:] = padded[:, pw - 1 : pw]
        return padded

    comp_blocks = []
    for p, (hs, vs) in zip(planes, samp):
        if (hs, vs) != (hmax, vmax):
            # downsample chroma by box-averaging over an even-padded plane
            fy, fx = vmax // vs, hmax // hs
            ep = edge_pad(p, -(-h // fy) * fy, -(-w // fx) * fx)
            p = ep.reshape(ep.shape[0] // fy, fy, ep.shape[1] // fx, fx).mean(axis=(1, 3))
        nby, nbx = mcuy * vs, mcux * hs
        padded = edge_pad(p, nby * 8, nbx * 8)
        blocks = np.zeros((nby, nbx, 64), dtype="int64")
        for by in range(nby):
            for bx in range(nbx):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.round((C @ blk @ C.T) / qblk).astype("int64")
                blocks[by, bx] = coef.reshape(64)[_ZIGZAG_ORDER]
        comp_blocks.append(blocks)
    return gray, h, w, samp, hmax, vmax, mcux, mcuy, comp_blocks, q


def encode_jpeg(img, quant=None, restart_interval: int = 0, subsample: bool = False) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a real
    baseline JFIF JPEG, stdlib+numpy only: level shift, 8x8 orthonormal
    DCT, quantization (``quant``: 64-entry table in natural order,
    default all-ones = near-lossless), zigzag, differential DC, run-
    length AC, canonical Huffman (tables derived from the data and
    written in DHT — decoder-agnostic), 0xFF byte stuffing, optional
    DRI/RSTn restart intervals. RGB is encoded interleaved YCbCr
    (BT.601 full-range, JFIF A.3.1) — 4:4:4 by default, 4:2:0 with
    ``subsample=True`` (2x2 box-averaged chroma); grayscale is
    single-component. The inverse of :func:`decode_jpeg`."""
    import numpy as np

    gray, h, w, samp, hmax, vmax, mcux, mcuy, comp_blocks, q = _jpeg_forward(
        img, quant, subsample
    )
    planes = comp_blocks  # len == component count

    # entropy-code once to collect symbols, again for real — tiny inputs
    def code_stream(emit):
        pred = [0] * len(planes)
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    emit("rst", (mcu // restart_interval - 1) % 8, None)
                    pred = [0] * len(planes)
                mcu += 1
                for ci, blocks in enumerate(comp_blocks):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            zz = blocks[my * vs + by, mx * hs + bx]
                            diff = int(zz[0]) - pred[ci]
                            pred[ci] = int(zz[0])
                            s, mb = _mag_bits(diff)
                            emit("dc", s, mb)
                            run = 0
                            last = 63
                            while last > 0 and zz[last] == 0:
                                last -= 1
                            for k in range(1, last + 1):
                                v = int(zz[k])
                                if v == 0:
                                    run += 1
                                    continue
                                while run >= 16:
                                    emit("ac", 0xF0, None)
                                    run -= 16
                                s, mb = _mag_bits(v)
                                emit("ac", (run << 4) | s, (s, mb))
                                run = 0
                            if last < 63:
                                emit("ac", 0x00, None)

    dc_syms, ac_syms = set(), set()
    code_stream(
        lambda kind, sym, _: None
        if kind == "rst"
        else (dc_syms if kind == "dc" else ac_syms).add(sym)
    )
    dc_bits, dc_vals, dc_map = _huff_canonical(dc_syms)
    ac_bits, ac_vals, ac_map = _huff_canonical(ac_syms)
    bw_ = _BitWriter()

    def emit(kind, sym, payload):
        if kind == "rst":
            # 1-pad to a byte boundary, then the bare RSTm marker
            if bw_.nbits:
                pad = 8 - bw_.nbits
                bw_.put((1 << pad) - 1, pad)
            bw_.out += bytes([0xFF, 0xD0 + sym])
        elif kind == "dc":
            code, ln = dc_map[sym]
            bw_.put(code, ln)
            if sym:
                bw_.put(payload, sym)
        else:
            code, ln = ac_map[sym]
            bw_.put(code, ln)
            if payload is not None:
                s, mb = payload
                bw_.put(mb, s)

    code_stream(emit)
    data = bw_.flush()

    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])  # sampling, quant table 0
    sos = bytes([ncomp]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
    sos += bytes([0, 63, 0])
    zz_q = bytes(int(q[_ZIGZAG_ORDER[i]]) for i in range(64))
    out = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, b"\x00" + zz_q)
        + seg(0xC0, sof)
        + seg(0xC4, b"\x00" + bytes(dc_bits[1:]) + bytes(dc_vals))
        + seg(0xC4, b"\x10" + bytes(ac_bits[1:]) + bytes(ac_vals))
        + (seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b"")
        + seg(0xDA, sos)
        + data
        + b"\xff\xd9"
    )
    return out


def encode_jpeg_progressive(img, quant=None, subsample: bool = False) -> bytes:
    """Encode as a PROGRESSIVE (SOF2) JFIF JPEG — the r7 verdict's
    stretch seam, now real end-to-end: identical forward path as
    :func:`encode_jpeg` (progressive is purely a TRANSMISSION REORDER of
    the same quantized coefficients — tests pin decode(progressive) ==
    decode(baseline) byte-identically), multi-scan successive
    approximation per T.81 Annex G:

    1. interleaved DC first scan (Ss=Se=0, Ah=0, Al=1);
    2. DC refinement (Ah=1, Al=0 — raw bits, no Huffman);
    3. per component, AC first scans with spectral selection
       (1-5 then 6-63, Ah=0, Al=2) using EOB-run coding;
    4. per component, AC refinement scans (Ah=2->Al=1, then Ah=1->Al=0)
       with correction bits.

    Every scan carries its own data-derived canonical Huffman table in a
    DHT written just before its SOS (tables are re-definable mid-file
    per T.81 B.2.4.2)."""
    import struct

    gray, h, w, samp, hmax, vmax, mcux, mcuy, comp_blocks, q = _jpeg_forward(
        img, quant, subsample
    )
    ncomp = len(comp_blocks)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def comp_grid(ci):
        """Non-interleaved block dims per T.81 A.1.1: the component's own
        sample dims rounded up to whole blocks (NOT the padded MCU grid)."""
        hs, vs = samp[ci]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        return -(-ch // 8), -(-cw // 8)

    def dc_first_stream(emit, al):
        pred = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(comp_blocks[ci][my * vs + by, mx * hs + bx, 0])
                            va = v >> al  # DC point transform: arithmetic shift
                            s, mb = _mag_bits(va - pred[ci])
                            pred[ci] = va
                            emit(s, mb)

    def dc_refine_bits(bw, al):
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(comp_blocks[ci][my * vs + by, mx * hs + bx, 0])
                            bw.put((v >> al) & 1, 1)

    def ac_first_stream(emit_sym, ci, ss, se, al):
        """T.81 G.1.2.2: spectral-selection first pass with EOB runs.
        emit_sym(sym, extra_bits_value, extra_bits_len)."""
        bh, bwc = comp_grid(ci)
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun > 0:
                chunk = min(eobrun, 32767)
                cat = chunk.bit_length() - 1
                emit_sym(cat << 4, chunk - (1 << cat), cat)
                eobrun -= chunk

        for by in range(bh):
            for bx in range(bwc):
                zz = comp_blocks[ci][by, bx]
                # AC point transform: magnitude shift (truncate toward 0)
                band = [
                    (abs(int(zz[k])) >> al) * (1 if int(zz[k]) >= 0 else -1)
                    for k in range(ss, se + 1)
                ]
                last = len(band) - 1
                while last >= 0 and band[last] == 0:
                    last -= 1
                if last < 0:
                    eobrun += 1
                    continue
                flush_eob()
                run = 0
                for v in band[: last + 1]:
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        emit_sym(0xF0, None, 0)
                        run -= 16
                    s, mb = _mag_bits(v)
                    emit_sym((run << 4) | s, mb, s)
                    run = 0
                if last < len(band) - 1:
                    eobrun += 1
        flush_eob()

    def ac_refine_stream(emit_sym, ci, ss, se, al):
        """T.81 G.1.2.3 (the libjpeg encode_mcu_AC_refine shape): newly
        significant coefficients as (run<<4)|1 + sign bit, history
        coefficients as buffered correction bits, EOB runs carrying the
        pending correction bits."""
        bh, bwc = comp_grid(ci)
        eobrun = 0
        eob_bits: list[int] = []  # correction bits owed to the EOB run

        def flush_eob():
            nonlocal eobrun, eob_bits
            while eobrun > 0:
                chunk = min(eobrun, 32767)
                cat = chunk.bit_length() - 1
                emit_sym(cat << 4, chunk - (1 << cat), cat, eob_bits)
                eob_bits = []
                eobrun -= chunk
            eob_bits = []

        for by in range(bh):
            for bx in range(bwc):
                zz = comp_blocks[ci][by, bx]
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                # index of the LAST newly-significant coefficient: ZRLs
                # beyond it fold into the EOB run instead of being emitted
                eob_i = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob_i = i
                run = 0
                pend: list[int] = []  # correction bits since last emit
                for i, a in enumerate(absv):
                    if a == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob_i:
                        flush_eob()
                        emit_sym(0xF0, None, 0, pend)
                        pend = []
                        run -= 16
                    if a > 1:
                        pend.append(a & 1)  # history coefficient: 1 bit
                        continue
                    # newly significant (a == 1): flush EOB run, then emit
                    flush_eob()
                    sign = 1 if int(zz[ss + i]) >= 0 else 0
                    emit_sym((run << 4) | 1, sign, 1, pend)
                    pend = []
                    run = 0
                # trailing zeros and/or leftover correction bits join the
                # EOB run; their bits ride the NEXT EOBn symbol
                if run > 0 or pend:
                    eobrun += 1
                    eob_bits.extend(pend)
        flush_eob()

    def scan_bytes(stream_fn, needs_huff, klass):
        """Two passes: collect symbols -> canonical table -> emit. Returns
        (dht_segment_or_empty, entropy_bytes)."""
        if not needs_huff:
            bw = _BitWriter()
            stream_fn(bw)
            return b"", bw.flush()
        syms = set()

        def collect(sym, _mb=None, _n=0, _pend=None):
            syms.add(sym)

        stream_fn_sym = stream_fn
        stream_fn_sym(collect)
        if not syms:
            syms = {0}
        bits, vals, cmap = _huff_canonical(syms)
        bw = _BitWriter()

        def emit(sym, mb=None, n=0, pend=None):
            code, ln = cmap[sym]
            bw.put(code, ln)
            if n:
                bw.put(mb, n)
            for bit in pend or ():
                bw.put(bit, 1)

        stream_fn_sym(emit)
        dht = seg(0xC4, bytes([klass << 4]) + bytes(bits[1:]) + bytes(vals))
        return dht, bw.flush()

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = bytes(int(q[_ZIGZAG_ORDER[i]]) for i in range(64))
    out += seg(0xDB, b"\x00" + zz_q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)  # SOF2: progressive DCT

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    all_ids = [ci + 1 for ci in range(ncomp)]
    # scan 1: DC first, interleaved, Al=1
    dht, data = scan_bytes(
        lambda e: dc_first_stream(lambda s, mb: e(s, mb, s), 1), True, 0
    )
    out += dht + sos(all_ids, 0, 0, 0, 1) + data
    # scan 2: DC refinement, raw bits
    _, data = scan_bytes(lambda bw: dc_refine_bits(bw, 0), False, 0)
    out += sos(all_ids, 0, 0, 1, 0) + data
    # per-component AC scans
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            dht, data = scan_bytes(
                lambda e, ci=ci, ss=ss, se=se: ac_first_stream(e, ci, ss, se, 2),
                True,
                1,
            )
            out += dht + sos([ci + 1], ss, se, 0, 2) + data
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(ncomp):
            dht, data = scan_bytes(
                lambda e, ci=ci, ah=ah, al=al: ac_refine_stream(e, ci, 1, 63, al),
                True,
                1,
            )
            out += dht + sos([ci + 1], 1, 63, ah, al) + data
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(blob: bytes):
    """REAL baseline JPEG decode, stdlib+numpy only — fills the JPEG
    half of the former PIL seam (decode_png fills the PNG half).

    Supported: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
    any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), table-driven
    Huffman (reads DHT — works with Annex K tables or any custom ones),
    restart intervals (DRI/RSTn), 0xFF00 unstuffing, per-component
    dequant + orthonormal IDCT, nearest-neighbor chroma upsample,
    JFIF BT.601 YCbCr→RGB. Returns (h, w, 3) uint8 RGB or None for
    progressive (SOF2), arithmetic coding, 12-bit, or corrupt input.

    Pure-python bit-reading is the deliberate trade (correct + testable
    with no native deps); a production fleet swaps PIL/libjpeg-turbo
    into the same partition-local seam."""
    import struct

    import numpy as np

    if blob is None or len(blob) < 4 or bytes(blob[:2]) != b"\xff\xd8":
        return None
    b = bytes(blob)
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    progressive = False
    coef = None  # progressive: per-component zigzag coefficient store
    try:
        while pos + 2 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xD9:
                if progressive and coef is not None:
                    # EOI: every scan merged — finish dequant/IDCT/color
                    return _jpeg_finish(coef, sof, qtabs)
                return None  # EOI before SOS
            if pos + 4 > len(b):
                return None
            (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
            body = b[pos + 4 : pos + 2 + ln]
            pos += 2 + ln
            if marker == 0xDB:
                i = 0
                while i < len(body):
                    prec, tid = body[i] >> 4, body[i] & 0x0F
                    if prec != 0:
                        return None  # 16-bit quant tables: not baseline-8
                    zz = np.frombuffer(body, dtype="u1", count=64, offset=i + 1)
                    nat = np.zeros(64, dtype="int64")
                    nat[_ZIGZAG_ORDER] = zz
                    qtabs[tid] = nat.reshape(8, 8)
                    i += 65
            elif marker == 0xC4:
                i = 0
                while i < len(body):
                    cls, tid = body[i] >> 4, body[i] & 0x0F
                    counts = body[i + 1 : i + 17]
                    nvals = sum(counts)
                    vals = body[i + 17 : i + 17 + nvals]
                    # canonical code assignment (T.81 C.2)
                    lut = {}
                    code = 0
                    vi = 0
                    for length in range(1, 17):
                        for _ in range(counts[length - 1]):
                            lut[(length, code)] = vals[vi]
                            code += 1
                            vi += 1
                        code <<= 1
                    htabs[(cls, tid)] = lut
                    i += 17 + nvals
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # non-baseline, non-progressive SOF
            elif marker in (0xC0, 0xC2):
                progressive = marker == 0xC2
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                if not h or not w or h * w > (1 << 26):
                    return None  # forged 65535×65535 header would demand
                    # ~32 GiB/plane before any entropy data validates it
                comps = []
                for ci in range(nc):
                    cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                    hs, vs = samp >> 4, samp & 0x0F
                    if not (1 <= hs <= 4 and 1 <= vs <= 4):
                        return None  # T.81 limits sampling factors to 1-4
                    comps.append((cid, hs, vs, tq))
                sof = (h, w, comps)
            elif marker == 0xDD:
                (restart,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:
                if sof is None:
                    return None
                scomp = []
                ns = body[0]
                for si in range(ns):
                    cid, tabs = body[1 + si * 2 : 3 + si * 2]
                    scomp.append((cid, tabs >> 4, tabs & 0x0F))
                if not progressive:
                    return _jpeg_scan(b, pos, sof, scomp, qtabs, htabs, restart)
                ss, se, ahal = body[1 + ns * 2 : 4 + ns * 2]
                if coef is None:
                    coef = _prog_coef_store(sof)
                pos = _jpeg_scan_prog(
                    b, pos, sof, scomp, ss, se, ahal >> 4, ahal & 0x0F,
                    htabs, restart, coef,
                )
                if pos is None:
                    return None
        return None
    except (IndexError, KeyError, ValueError, struct.error, MemoryError):
        return None


def _jpeg_scan(b, pos, sof, scomp, qtabs, htabs, restart):
    """Entropy-decode the (single, interleaved) baseline scan and finish
    the pipeline: dequant → IDCT → upsample → color convert."""
    import numpy as np

    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    C = _dct_matrix()

    # strip 0xFF00 stuffing and RSTn markers up front (they sit on byte
    # boundaries; the per-interval 1-bit padding is skipped by the
    # byte-align below)
    data = bytearray()
    i = pos
    while i < len(b) - 1:
        if b[i] == 0xFF:
            nxt = b[i + 1]
            if nxt == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            break  # EOI or next marker
        data.append(b[i])
        i += 1

    bitpos = 0
    nbits = len(data) * 8

    def read_bit():
        nonlocal bitpos
        if bitpos >= nbits:
            raise IndexError("bitstream exhausted")
        byte = data[bitpos >> 3]
        bit = (byte >> (7 - (bitpos & 7))) & 1
        bitpos += 1
        return bit

    def read_bits(n):
        v = 0
        for _ in range(n):
            v = (v << 1) | read_bit()
        return v

    def huff_decode(lut):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bit()
            if (length, code) in lut:
                return lut[(length, code)]
        raise KeyError("bad huffman code")

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype="float64"))
    pred = [0] * len(comps)
    order = []
    for si, (cid, td, ta) in enumerate(scomp):
        ci = next((k for k, c in enumerate(comps) if c[0] == cid), None)
        if ci is None:
            return None  # scan references a component SOF never declared
        order.append((ci, td, ta))

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                # the encoder byte-aligned with 1-bits before each RSTn;
                # skip the padding and reset the DC predictors (T.81 F.2.1.3)
                bitpos = (bitpos + 7) & ~7
                pred = [0] * len(comps)
            for ci, td, ta in order:
                _, hs, vs, tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype="int64")
                        s = huff_decode(htabs[(0, td)])
                        if s > 15:
                            return None  # valid DC size categories are 0-15
                        diff = extend(read_bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_decode(htabs[(1, ta)])
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63 or size == 0:
                                return None
                            zz[k] = extend(read_bits(size), size)
                            k += 1
                        nat = np.zeros(64, dtype="float64")
                        nat[_ZIGZAG_ORDER] = zz
                        blk = C.T @ (nat.reshape(8, 8) * qtabs[tq]) @ C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    return _jpeg_assemble(comps, planes, hmax, vmax, h, w)


def _jpeg_assemble(comps, planes, hmax, vmax, h, w):
    """Upsample + crop + color-convert decoded component planes (shared
    by the baseline and progressive paths)."""
    import numpy as np

    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            if hmax % hs or vmax % vs:
                return None  # non-integer upsample ratio
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype("u1")
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype("u1")


def _prog_coef_store(sof):
    """Per-component zigzag coefficient arrays sized to the padded MCU
    grid (interleaved DC scans cover it; non-interleaved AC scans write
    the component-dim sub-grid)."""
    import numpy as np

    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcuy * vs, mcux * hs, 64), dtype="int64")
        for cid, hs, vs, tq in comps
    ]


def _jpeg_scan_prog(b, pos, sof, scomp, ss, se, ah, al, htabs, restart, coef):
    """Decode ONE progressive scan (T.81 Annex G.2) into the coefficient
    store, covering all four scan kinds: DC first (huffman diffs, point-
    transformed <<Al), DC refinement (one raw bit per block), AC first
    (spectral selection + EOB runs), AC refinement (correction bits).
    Returns the position of the next marker, or None on corrupt input."""
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    data = bytearray()
    i = pos
    while i < len(b) - 1:
        if b[i] == 0xFF:
            nxt = b[i + 1]
            if nxt == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            break
        data.append(b[i])
        i += 1
    end_pos = i

    bitpos = 0
    nbits = len(data) * 8

    def read_bit():
        nonlocal bitpos
        if bitpos >= nbits:
            raise IndexError("bitstream exhausted")
        byte = data[bitpos >> 3]
        bit = (byte >> (7 - (bitpos & 7))) & 1
        bitpos += 1
        return bit

    def read_bits(n):
        v = 0
        for _ in range(n):
            v = (v << 1) | read_bit()
        return v

    def huff_decode(lut):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bit()
            if (length, code) in lut:
                return lut[(length, code)]
        raise KeyError("bad huffman code")

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    order = []
    for cid, td, ta in scomp:
        ci = next((k for k, c in enumerate(comps) if c[0] == cid), None)
        if ci is None:
            return None
        order.append((ci, td, ta))

    def comp_grid(ci):
        _, hs, vs, _ = comps[ci]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        return -(-ch // 8), -(-cw // 8)

    if ss == 0:
        if se != 0:
            return None  # DC scans are exactly the DC band
        pred = [0] * len(order)
        if len(order) > 1:
            units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

            def blocks_of(unit):
                my, mx = unit
                for oi, (ci, td, ta) in enumerate(order):
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            yield oi, ci, td, my * vs + by, mx * hs + bx
        else:
            ci0 = order[0][0]
            bh, bwc = comp_grid(ci0)
            units = [(by, bx) for by in range(bh) for bx in range(bwc)]

            def blocks_of(unit):
                by, bx = unit
                yield 0, ci0, order[0][1], by, bx

        for ui, unit in enumerate(units):
            if restart and ui and ui % restart == 0:
                bitpos = (bitpos + 7) & ~7
                pred = [0] * len(order)
            for oi, ci, td, by, bx in blocks_of(unit):
                if ah == 0:
                    s = huff_decode(htabs[(0, td)])
                    if s > 15:
                        return None
                    diff = extend(read_bits(s), s) if s else 0
                    pred[oi] += diff
                    coef[ci][by, bx, 0] = pred[oi] << al
                else:
                    if read_bit():
                        coef[ci][by, bx, 0] = int(coef[ci][by, bx, 0]) | (1 << al)
        return end_pos

    # AC scan: T.81 G requires exactly one component, non-interleaved
    if len(order) != 1 or se > 63 or ss > se:
        return None
    ci, _td, ta = order[0]
    lut = htabs[(1, ta)]
    bh, bwc = comp_grid(ci)
    eobrun = 0
    p1 = 1 << al
    unit = 0
    for by in range(bh):
        for bx in range(bwc):
            if restart and unit and unit % restart == 0:
                bitpos = (bitpos + 7) & ~7
                eobrun = 0
            unit += 1
            zz = coef[ci][by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = huff_decode(lut)
                    r, s2 = rs >> 4, rs & 0x0F
                    if s2 == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += read_bits(r)
                        break
                    k += r
                    if k > se:
                        return None
                    zz[k] = extend(read_bits(s2), s2) * p1
                    k += 1
            else:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = huff_decode(lut)
                        r, s2 = rs >> 4, rs & 0x0F
                        newval = 0
                        if s2 == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += read_bits(r)
                                break
                        else:
                            if s2 != 1:
                                return None
                            newval = p1 if read_bit() else -p1
                        while k <= se:
                            if zz[k] != 0:
                                if read_bit() and (int(zz[k]) & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else -p1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s2:
                            if k > se:
                                return None
                            zz[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            if read_bit() and (int(zz[k]) & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else -p1
                        k += 1
                    eobrun -= 1
    return end_pos


def _jpeg_finish(coef, sof, qtabs):
    """Progressive EOI: dequant + IDCT every accumulated block, then the
    shared upsample/color tail."""
    import numpy as np

    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    C = _dct_matrix()
    planes = []
    for (cid, hs, vs, tq), blocks in zip(comps, coef):
        nby, nbx = blocks.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype="float64")
        qt = qtabs[tq]
        for by in range(nby):
            for bx in range(nbx):
                nat = np.zeros(64, dtype="float64")
                nat[_ZIGZAG_ORDER] = blocks[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    C.T @ (nat.reshape(8, 8) * qt) @ C + 128.0
                )
        planes.append(plane)
    return _jpeg_assemble(comps, planes, hmax, vmax, h, w)


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

    REAL for every supported container — BMP/TGA, PNG (8/16-bit,
    sequential or Adam7), baseline JPEG, GIF: :func:`decode_pixels` →
    :func:`nn_resize` (numpy nearest-neighbor) → :func:`encode_bmp`, all
    partition-local in one Arrow batch kernel. Blobs the decoder cannot
    reach (progressive JPEG, native-lib codecs) yield NULL content; at
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


def encode_avi_mjpeg(frames, fps: int = 25) -> bytes:
    """Build a real Motion-JPEG AVI from a list of already-encoded JPEG
    blobs: RIFF 'AVI ' with a LIST hdrl (avih + one 'vids'/'MJPG'
    stream: strh + BITMAPINFOHEADER strf), a LIST movi of word-aligned
    '00dc' frame chunks, and an idx1 index — the minimal standards-
    shaped container every AVI reader accepts. Frame dims are read from
    the first JPEG via :func:`image_dims`. Fixture-side inverse of
    :func:`decode_avi_mjpeg`."""
    import struct

    dims = image_dims(frames[0]) if frames else None
    w, h = (dims[0], dims[1]) if dims else (0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, max(fps, 1), 0, len(frames), 0, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    idx = b""
    for f in frames:
        offset = len(movi_body)  # offset of the chunk within LIST movi data
        movi_body += chunk(b"00dc", bytes(f))
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(f))
    movi = chunk(b"LIST", movi_body)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(blob: bytes, max_frames: int = 0):
    """REAL video keyframe decode for Motion-JPEG AVI, stdlib+numpy
    only: walk the RIFF tree to LIST movi, take the video-stream frame
    chunks ('..dc'/'..db', LIST rec-wrapped or flat), decode each with
    :func:`decode_jpeg`. Returns a list of (frame_idx, rgb_array) for
    the frames that decode (an undecodable frame is skipped, its index
    still advances), or None if the container is not a RIFF AVI.
    ``max_frames`` > 0 stops after that many decoded frames — keyframe
    sampling without parsing the tail. Inter-coded containers
    (MP4/H.264 etc.) remain the ffmpeg seam."""
    import struct

    if blob is None or len(blob) < 12:
        return None
    b = bytes(blob)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None

    def walk_movi(pos, end):
        # returns the (start, end) of the first LIST movi body, or None
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid == b"LIST" and b[body_start : body_start + 4] == b"movi":
                return body_start + 4, min(body_start + clen, end)
            if cid == b"LIST":
                got = walk_movi(body_start + 4, min(body_start + clen, end))
                if got:
                    return got
            pos = body_start + clen + (clen & 1)
        return None

    got = walk_movi(12, len(b))
    if not got:
        return None
    pos, end = got
    frames = []
    idx = 0
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"LIST" and body[:4] == b"rec ":
            # 'rec ' groups interleaved chunks contiguously — flatten by
            # stepping past the 12-byte LIST header into the group
            pos += 12
            continue
        if cid[2:4] in (b"dc", b"db"):
            rgb = decode_jpeg(body)
            if rgb is not None:
                frames.append((idx, rgb))
                if max_frames and len(frames) >= max_frames:
                    break
            idx += 1
        pos += 8 + clen + (clen & 1)
    return frames


VIDEO_FRAME_SCHEMA = "media_id long, frame_idx int, width int, height int, content binary"


def video_keyframes(df: DataFrame, max_frames: int = 8) -> DataFrame:
    """Extract decoded keyframes from video blobs: REAL for Motion-JPEG
    AVI (:func:`decode_avi_mjpeg` → :func:`decode_jpeg` per frame);
    each frame is re-encoded as a lossless BMP so downstream image
    operators (resize, features) compose directly. Non-AVI containers
    produce no rows (the ffmpeg seam, unchanged schema either way).

    Scale shape: partition-local ``mapInPandas`` — video bytes never
    cross executors; the fan-out is one row per extracted frame, capped
    by ``max_frames``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "width": [], "height": [], "content": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                frames = decode_avi_mjpeg(blob, max_frames=max_frames)
                if not frames:
                    continue
                for idx, rgb in frames:
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["height"].append(rgb.shape[0])
                    out["width"].append(rgb.shape[1])
                    out["content"].append(encode_bmp(rgb))
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, VIDEO_FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


_PCM_NORM = {1: ("u1", 128.0, 128.0), 2: ("<i2", 0.0, 32768.0), 4: ("<i4", 0.0, 2147483648.0)}


def _mulaw_decode(codes):
    """G.711 μ-law expand: uint8 code array → int16 samples (ITU-T G.711
    table 2a/2b in closed form; bias 0x84, segments 0..7)."""
    import numpy as np

    u = (~np.asarray(codes, dtype="u1")).astype("int64") & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype("int64")


def _mulaw_encode(samples):
    """G.711 μ-law compress: int16-range samples → uint8 codes. Inverse
    of :func:`_mulaw_decode` on its image (decode∘encode∘decode = decode
    — verified for all 256 codes in tests)."""
    import numpy as np

    x = np.asarray(samples, dtype="int64")
    sign = x < 0
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = np.clip(np.floor(np.log2(mag)).astype("int64") - 7, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    code = (~(np.where(sign, 0x80, 0) | (exp << 4) | mant)) & 0xFF
    return code.astype("u1")


def _alaw_decode(codes):
    """G.711 A-law expand: uint8 code array → int16 samples (even-bit
    inversion 0x55; segment 0 is linear)."""
    import numpy as np

    a = (np.asarray(codes, dtype="u1").astype("int64")) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, -mag, mag).astype("int64")


def _alaw_encode(samples):
    """G.711 A-law compress: int16-range samples → uint8 codes (sign bit
    0x80 = negative before the 0x55 inversion, matching
    :func:`_alaw_decode`)."""
    import numpy as np

    x = np.asarray(samples, dtype="int64")
    sign = x < 0
    mag = np.minimum(np.abs(x), 32767)
    exp = np.clip(np.floor(np.log2(np.maximum(mag, 1))).astype("int64") - 7, 0, 7)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    code = (np.where(sign, 0x80, 0) | (exp << 4) | mant) ^ 0x55
    return code.astype("u1")


# IMA ADPCM step and index tables (public constants, IMA "Recommended
# Practices for Enhancing Digital Audio Compatibility" / multimedia WAV
# registry format 0x0011)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, nibble: int):
    """One IMA ADPCM decode step: (predictor, step-index, 4-bit code) →
    updated (predictor, step-index)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble & 7]))
    return pred, idx


def _ima_adpcm_decode_block(body, pred, idx):
    """Decode one mono IMA ADPCM block body (nibble bytes, low nibble
    first) given the block-header predictor/index; yields int16 samples."""
    out = []
    for byte in body:
        for nib in (byte & 0x0F, byte >> 4):
            pred, idx = _ima_step(pred, idx, nib)
            out.append(pred)
    return out


def _ima_adpcm_encode(samples, block_samples: int = 505):
    """Mono IMA ADPCM encode (standard nibble quantizer) → list of
    (header_pred, header_idx, nibble_bytes) blocks; ``block_samples``
    = 1 header sample + nibbles (505 → 256-byte blocks)."""
    idx = 0
    blocks = []
    i = 0
    n = len(samples)
    while i < n:
        chunk = samples[i : i + block_samples]
        i += block_samples
        pred = int(chunk[0])
        hdr = (pred, idx)
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEPS[idx]
            diff = int(s) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(pred, idx, nib)
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        body = bytes((nibs[j] | (nibs[j + 1] << 4)) for j in range(0, len(nibs), 2))
        blocks.append((hdr[0], hdr[1], body))
    return blocks


def encode_wav(samples, rate: int = 16_000, codec: str = "pcm16") -> bytes:
    """Build a real RIFF/WAVE file from int16-range mono samples with a
    chosen codec: ``pcm16``/``pcm8``/``float32`` (linear),
    ``mulaw``/``alaw`` (G.711), ``ima_adpcm`` (format 0x0011, 256-byte
    blocks). The fixture-side inverse of :func:`decode_wav`."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype="int64")
    if codec == "pcm16":
        tag, bits, data = 1, 16, x.astype("<i2").tobytes()
        block, extra = 2, b""
    elif codec == "pcm8":
        tag, bits, data = 1, 8, ((x >> 8) + 128).astype("u1").tobytes()
        block, extra = 1, b""
    elif codec == "float32":
        tag, bits, data = 3, 32, (x / 32768.0).astype("<f4").tobytes()
        block, extra = 4, b""
    elif codec == "mulaw":
        tag, bits, data = 7, 8, _mulaw_encode(x).tobytes()
        block, extra = 1, b""
    elif codec == "alaw":
        tag, bits, data = 6, 8, _alaw_encode(x).tobytes()
        block, extra = 1, b""
    elif codec == "ima_adpcm":
        blocks = _ima_adpcm_encode([int(v) for v in x], block_samples=505)
        data = b"".join(
            struct.pack("<hBB", p, i, 0) + body for p, i, body in blocks
        )
        tag, bits, block, extra = 0x11, 4, 256, struct.pack("<HH", 2, 505)
    else:
        raise ValueError(f"unknown codec {codec}")
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate * block, block, bits) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) % 2:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes):
    """REAL WAV decode, stdlib+numpy only, own RIFF parser: linear PCM
    (8/16/32-bit), IEEE float32, G.711 μ-law and A-law, and mono IMA
    ADPCM (format 0x0011) — the formats that cover telephony and
    multimedia WAV corpora without a native codec lib. Returns
    (samples_float64 in [-1, 1), sample_rate, n_frames) with channels
    interleaved, or None for other codecs (mp3/ogg/flac stay at the
    soundfile/librosa seam) or corrupt input."""
    import struct

    import numpy as np

    if blob is None or len(blob) < 44 or bytes(blob[:4]) != b"RIFF" or bytes(blob[8:12]) != b"WAVE":
        return None
    b = bytes(blob)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    tag, nch, rate, _br, block, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        (tag,) = struct.unpack("<H", fmt[24:26])
    if rate <= 0 or nch <= 0:
        return None
    if tag == 1 and bits in (8, 16, 32):
        dtype, offset, scale = _PCM_NORM[bits // 8]
        width = bits // 8
        data = data[: len(data) // width * width]  # truncated final sample → drop
        x = (np.frombuffer(data, dtype=dtype).astype("float64") - offset) / scale
    elif tag == 3 and bits == 32:
        data = data[: len(data) // 4 * 4]  # truncated final sample → drop
        x = np.frombuffer(data, dtype="<f4").astype("float64")
    elif tag == 7 and bits == 8:
        x = _mulaw_decode(np.frombuffer(data, dtype="u1")).astype("float64") / 32768.0
    elif tag == 6 and bits == 8:
        x = _alaw_decode(np.frombuffer(data, dtype="u1")).astype("float64") / 32768.0
    elif tag == 0x11 and bits == 4:
        if nch != 1 or block < 5:
            return None  # stereo ADPCM interleaving not implemented
        out = []
        for off in range(0, len(data) - 4, block):
            hdr = data[off : off + 4]
            if len(hdr) < 4:
                break
            pred, idx, _ = struct.unpack("<hBB", hdr)
            idx = max(0, min(88, idx))
            body = data[off + 4 : off + block]
            out.append(pred)
            out.extend(_ima_adpcm_decode_block(body, pred, idx))
        x = np.asarray(out, dtype="float64") / 32768.0
    else:
        return None
    return x, int(rate), len(x) // nch


def decode_audio(blob: bytes):
    """Audio container dispatch: RIFF/WAVE → :func:`decode_wav` (linear
    PCM, float32, G.711, IMA ADPCM), fLaC → ``ext.flac.decode_flac``
    (lossless Rice/LPC decode). Returns (samples_float64, rate,
    n_frames) or None; mp3/ogg stay at the soundfile seam."""
    if blob is None or len(blob) < 4:
        return None
    head = bytes(blob[:4])
    if head == b"RIFF":
        return decode_wav(blob)
    if head == b"fLaC":
        from aircan_spark.ext.flac import decode_flac

        return decode_flac(blob)
    return None


def wav_features(blob: bytes) -> tuple[float, int, float] | None:
    """REAL audio decode, stdlib+numpy only (:func:`decode_audio` —
    WAV linear PCM 8/16/32, float32, G.711 μ-law/A-law, mono IMA ADPCM,
    plus lossless FLAC), sample normalization to [-1, 1), RMS over all
    channels. Returns (duration_s, sample_rate, rms) or None if not
    decodable (mp3/ogg are the soundfile/librosa seam)."""
    import numpy as np

    got = decode_audio(blob)
    if got is None:
        return None
    x, rate, n_frames = got
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    return (round(n_frames / rate, 6), rate, round(rms, 6))


def audio_features(df: DataFrame, fake: bool = False, assumed_rate: int = 16_000) -> DataFrame:
    """Audio blob features (duration / sample rate / RMS energy).

    Default: REAL stdlib WAV decode (:func:`decode_wav` — linear PCM
    8/16/32-bit, IEEE float32, G.711 μ-law/A-law, mono IMA ADPCM;
    header-declared rate, normalized RMS). Other codecs yield NULLs —
    mp3/ogg/flac decode is the soundfile/librosa seam. ``fake=True``
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
    WAV decode (:func:`decode_wav` — linear PCM, float32, G.711
    μ-law/A-law, mono IMA ADPCM); per-file work, embarrassingly
    parallel, zero shuffle — the output fans out one row per window, so
    the operator is its own Generate. Other codecs produce no rows
    (the soundfile/librosa seam)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "window_idx": [], "t_start_s": [],
                "rms": [], "is_silence": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                got = decode_audio(blob)
                if got is None:
                    continue
                x, rate, _n = got
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


# --- round-5 operators: perceptual image hash, audio silence, scene cuts ------


DHASH_SCHEMA = "media_id long, dhash_hi long, dhash_lo long"


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image blob — the standard
    near-duplicate-image signature: decode (any supported container),
    nearest-neighbor resample to 9×8 grayscale (first channel), compare
    each pixel against its right neighbor → 64 bits. Emitted as two
    32-bit halves (``dhash_hi`` = rows 0-3, ``dhash_lo`` = rows 4-7,
    bit (y*8+x) at position 31-(y%4*8+x)) so the value stays inside a
    signed BIGINT in every engine — exact integers end to end, which is
    what makes the whole pipeline closed-form oracle-checkable.

    Identical images hash identically (exact-dup groups are a groupBy
    away); near-identical images differ in few bits (near-dup pairs =
    small Hamming distance — pair search composes with the X3/X4 banded
    LSH machinery, 8 bytes per image of state). Partition-local
    mapInPandas, zero shuffle, media bytes never leave the executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, his, los = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                px = decode_pixels(blob)
                if px is None:
                    continue
                g = nn_resize(px, 9, 8)[:, :, 0].astype("int64")
                bits = (g[:, :8] > g[:, 1:]).astype("int64")  # (8 rows, 8 cols)
                weights = 1 << (31 - (np.arange(4)[:, None] * 8 + np.arange(8)[None, :]))
                ids.append(mid)
                his.append(int((bits[:4] * weights).sum()))
                los.append(int((bits[4:] * weights).sum()))
            yield pd.DataFrame({"media_id": ids, "dhash_hi": his, "dhash_lo": los})

    return df.mapInPandas(kernel, DHASH_SCHEMA)


AUDIO_SILENCE_SCHEMA = "media_id long, n_samples long, n_silent long, silence_ratio double"


def audio_silence_stats(df: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Per-file silence profile: fraction of samples whose normalized
    amplitude is <= ``threshold`` — the corpus-curation gate that drops
    dead-air recordings before an expensive ASR/embedding pass (the
    windowed variant for trimming is :func:`audio_rms_windows`).

    Exactness: decoded samples are dyadic rationals (integer/2^k), so
    the ``<=`` comparison against a short-decimal threshold has no
    representable boundary case — counts are integers, bit-stable in
    any partition order. Partition-local mapInPandas, zero shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "n_samples": [], "n_silent": [], "silence_ratio": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                got = decode_audio(blob)
                if got is None:
                    continue
                x, _rate, _n = got
                n = int(len(x))
                ns = int((np.abs(x) <= threshold).sum())
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["n_silent"].append(ns)
                out["silence_ratio"].append(round(ns / n, 6) if n else 0.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, AUDIO_SILENCE_SCHEMA)


SCENE_CHANGE_SCHEMA = (
    "media_id long, n_frames long, n_scene_changes long, first_change_idx long"
)


def video_scene_changes(df: DataFrame, threshold: float = 20.0) -> DataFrame:
    """Shot-boundary detection over video blobs: decode frames
    (:func:`decode_avi_mjpeg` for MJPEG-AVI), reduce each to its mean
    gray level, and count jumps where |mean(f) − mean(f−1)| >=
    ``threshold`` — the classic luma-difference cut detector, the
    frame-sampling primitive a training pipeline runs before picking
    which frames to caption/embed. ``first_change_idx`` is the first
    cut's frame index (NULL when the video has no cut).

    On DC-only constant frames the means are exact integers (the
    baseline-JPEG bit-exactness contract), so counts are deterministic.
    Partition-local mapInPandas, zero shuffle; per-video state is one
    float, frames stream through the decoder one at a time."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "n_frames": [], "n_scene_changes": [],
                "first_change_idx": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                frames = decode_avi_mjpeg(blob)
                if not frames:
                    continue
                prev_mean, n_changes, first_idx = None, 0, None
                for idx, rgb in frames:
                    m = float(rgb.astype("float64").mean())
                    if prev_mean is not None and abs(m - prev_mean) >= threshold:
                        n_changes += 1
                        if first_idx is None:
                            first_idx = idx
                    prev_mean = m
                out["media_id"].append(mid)
                out["n_frames"].append(len(frames))
                out["n_scene_changes"].append(n_changes)
                out["first_change_idx"].append(first_idx)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, SCENE_CHANGE_SCHEMA)
