"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas over mapInPandas.

The actual decoders (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed two ways:
- ``decode_stub=...`` raising NotImplementedError — the marked seam where
  a real decoder plugs in;
- a deterministic fake (byte-derived pseudo-features) that keeps every
  piece of Spark plumbing REAL and testable: schema, partitioning, UDF
  signatures, Arrow batch shapes.

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


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image blobs to (width, height, channels).

    STUB: real decoding needs PIL/opencv (absent here). ``fake=True``
    derives deterministic pseudo-dimensions from the first bytes so the
    distributed plumbing is exercised end-to-end; ``fake=False`` raises at
    the marked seam."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # >>> real decoder goes here (PIL.Image.open over io.BytesIO) <<<
                raise NotImplementedError(
                    "image decode requires PIL/opencv — not available in this "
                    "environment; run with fake=True for plumbing tests"
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": content.map(lambda b: 1 + int(b[0]) % 64 if b else None),
                    "height": content.map(lambda b: 1 + int(b[-1]) % 64 if b else None),
                    "channels": content.map(lambda b: 3 if b else None),
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


def resize_images(df: DataFrame, width: int = 32, height: int = 32, fake: bool = False) -> DataFrame:
    """Resize image blobs to (width, height).

    STUB at the decode seam (PIL absent); ``fake=True`` emits a
    deterministic byte-downsample of the blob (every k-th byte, padded) so
    the batch shape — N bytes in, width*height out, partition-local, no
    shuffle — is exercised for real. A real implementation swaps the body
    for PIL ``Image.resize`` and nothing around it changes."""
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # >>> real resize goes here (PIL.Image.open(...).resize(...)) <<<
                raise NotImplementedError(
                    "image resize requires PIL — not available in this "
                    "environment; run with fake=True for plumbing tests"
                )

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


def audio_features(df: DataFrame, fake: bool = False, assumed_rate: int = 16_000) -> DataFrame:
    """Audio blob features (duration / sample rate / RMS energy).

    STUB at the decode seam (librosa/soundfile absent). ``fake=True``
    treats the blob as raw unsigned 8-bit PCM at ``assumed_rate`` — a real
    deterministic computation through the real batch path; swapping the
    body for an actual codec changes nothing around it."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                # >>> real decoder goes here (soundfile.read / librosa.load) <<<
                raise NotImplementedError(
                    "audio decode requires librosa/soundfile — not available "
                    "in this environment; run with fake=True for plumbing tests"
                )

            def feats(blob):
                if blob is None or not len(blob):
                    return (None, None, None)
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
