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

from pyspark.sql import DataFrame
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
