"""Similarity search over embedding columns — brute-force and LSH-bucketed
approximate nearest neighbor.

Shapes:
- ``brute_topk``: query set broadcast against the corpus, cosine per pair,
  per-query top-k via a window PARTITIONED BY query id (parallel across
  queries — never a global sort). The exact baseline.
- ``lsh_topk``: random-hyperplane buckets with multi-probe (query probes
  its own bucket plus all 1-bit-flip neighbors), rerank candidates
  exactly. The 100 TB path: candidate generation is a bucket equi-join,
  so cost scales with bucket occupancy, not corpus size x queries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aircan_spark.ext.dedup import _cosine


def _as_double(df: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(out)
    )


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine.

    The query side is expected small (it is broadcast); the corpus streams.
    Ties broken by neighbor id for determinism.
    """
    query_id_col = query_id_col or id_col
    c = _as_double(corpus, id_col, vec_col, "cv").withColumnRenamed(id_col, "neighbor_id")
    q = _as_double(queries, query_id_col, vec_col, "qv").withColumnRenamed(
        query_id_col, "query_id"
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    bits: int = 8,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane-LSH bucket join with 1-bit
    multi-probe on the query side, exact rerank of candidates.

    Recall dials: more ``num_tables`` (OR-amplification, 1-(1-p)^L) or
    fewer ``bits`` (bigger buckets). Candidate generation stays an
    equi-join on (table, bucket) — cost follows bucket occupancy, not
    corpus x queries.
    """
    from aircan_spark.ext.dedup import hyperplane_bucket_udf

    query_id_col = query_id_col or id_col
    dim = len(corpus.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).standard_normal((num_tables, bits, dim))
    buckets = hyperplane_bucket_udf(planes)

    c = (
        _as_double(corpus, id_col, vec_col, "cv")
        .withColumnRenamed(id_col, "neighbor_id")
        .select(
            "neighbor_id", "cv",
            F.posexplode(buckets(F.col("cv"))).alias("table", "bucket"),
        )
    )
    q = (
        _as_double(queries, query_id_col, vec_col, "qv")
        .withColumnRenamed(query_id_col, "query_id")
        .select(
            "query_id", "qv",
            F.posexplode(buckets(F.col("qv"))).alias("table", "bucket0"),
        )
    )
    # multi-probe: own bucket + every 1-bit flip, per table
    probes = F.array(
        F.col("bucket0"),
        *[F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)],
    )
    q = q.withColumn("bucket", F.explode(probes)).drop("bucket0")

    cand = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cand.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )
