"""Document chunking — split documents into fixed-size token windows with
configurable overlap (the pre-tokenization step of an LLM training
pipeline).

Row-local: the chunk starts and slices are built with array higher-order
functions (sequence/transform/slice) and fanned out with ONE posexplode —
no shuffle, no Python, whole-stage codegen end to end. Output size is
~len/stride chunks per document regardless of cluster size, so the
operator scales linearly with corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    overlap: int = 4,
) -> DataFrame:
    """(id, chunk_id, n_chunk_tokens, chunk_text) rows: whitespace tokens
    windowed into ``chunk_size``-token chunks every ``chunk_size -
    overlap`` tokens. The final chunk may be short; chunk_id counts from 0
    in stride units so (id, chunk_id) is a stable key across engines."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(words, s + 1, chunk_size), " ")
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(F.split(F.col("chunk_text"), r"\s+")).alias("n_chunk_tokens"),
        "chunk_text",
    )


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 256,
    n_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic sequence packing: assign every document to a
    training pack of ~``seq_len`` tokens — (id, bucket, n_tokens,
    pack_id). Documents are spread over ``n_buckets`` hash buckets
    (portable md5 bucketing, so the assignment is engine- and
    cluster-size-independent), then packed greedily in id order within
    each bucket: a document starts in the pack where the bucket's
    running token count (exclusive of itself) lands. Oversized documents
    own their pack start and overflow into the next — pair with
    ``chunk_documents`` when hard sequence caps are needed.

    Scale shape: one shuffle partitioned by bucket; the running sum is a
    streaming window within each sorted bucket partition. n_buckets
    bounds parallelism, not correctness — packs are bucket-local, so
    growing the bucket count for a bigger cluster never changes any
    pack's contents, only how many build concurrently."""
    from aircan_spark.ext.sampling import hash_bucket
    from aircan_spark.ext.text import token_count

    w = Window.partitionBy("bucket").orderBy(id_col)
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            hash_bucket(F.col(id_col), seed, n_buckets).alias("bucket"),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "pack_id",
            F.floor((cum - F.col("n_tokens")) / F.lit(seq_len)).cast("long"),
        )
    )
