"""Vector-column statistics — per-label centroids and norms over an
embedding column (`array<float>`), the bookkeeping ops around similarity
search (ext/similarity.py) and embedding dedup (ext/dedup.py).

Shapes chosen for 100 TB:
- ``label_centroids`` — posexplode to (label, pos, value) then ONE hash
  aggregate: partial averages combine map-side, the shuffle carries
  (label x dim) partial sums, never raw vectors. Centroids are emitted in
  long form (label, pos, value) — scalar cells survive cross-engine
  comparison and downstream joins without array-equality semantics.
- ``vector_norms`` — row-local `F.aggregate` fold (JVM expression, no
  Python), zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vector_norms(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, dim, l2_norm) per vector — the sanity/filter pass before
    cosine math (zero-norm vectors break normalization)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x
    )
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("dim"),
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector in long form: (label, pos, centroid_val,
    n_vectors). pos is 1-based (matches SQL subscripts).

    The mean is computed as an exact DECIMAL sum divided once in double —
    float summation is non-associative, so a plain avg() would depend on
    partial-aggregation order and could differ between engines (and
    between runs at different parallelism)."""
    exploded = df.select(
        F.col(label_col),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("decimal(20,10)"))
        ).alias("pos", "v"),
    ).withColumn("pos", (F.col("pos") + 1).cast("long"))
    # every vector contributes exactly one value per pos, so COUNT(*) inside
    # the (label, pos) group IS the per-label vector count — no second scan
    # or join needed
    return (
        exploded.groupBy(label_col, "pos")
        .agg(
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(label_col, "pos", "centroid_val", "n_vectors")
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4x storage/bandwidth
    cut applied to embedding corpora before ANN indexing: scale =
    max|x| / 127, q_i = round(x_i / scale) in [-127, 127]. Returns
    (id, scale rounded to 9, qvec as a comma-joined string — portable
    across engines where array cells are not). All-zero vectors get
    scale 0 and all-zero codes.

    Entirely row-local higher-order functions (JVM, whole-stage codegen,
    zero shuffle): at 100 TB this is a scan-speed map, and the output
    parquet is ~1/4 the bytes, which is the actual win — downstream
    shuffles and ANN scans move int8, not float32."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = max_abs / F.lit(127.0)
    q = F.when(
        max_abs > 0.0,
        F.transform(v, lambda x: F.round(x / scale).cast("long")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        F.array_join(q, ",").alias("qvec"),
    )


GRAM_SCHEMA = "i int, j int, partial double"


def embedding_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """Gram matrix G[i,j] = Σ v[i]·v[j] over all vectors, upper triangle
    (i <= j) in long form — the one-pass covariance/PCA/whitening input.

    Default (scale path): per-Arrow-batch numpy ``Mᵀ M`` partials inside
    mapInPandas — each batch emits d(d+1)/2 rows, the only exchange is
    the O(d²)-key final sum. Double accumulation: fast, order-dependent
    in the last ulp (fine for numerics, not for hash equality).

    ``exact=True`` (oracle path): row-local explode of component pairs
    with decimal(18,9)-cast products summed exactly — bit-identical
    across engines (binary floats have no exact decimal-scale-9 halfway
    cases, so rounding cannot diverge). O(n·d²) exploded rows — use for
    verification or small d/dims slices.

    ``dims``: restrict to the first ``dims`` components (slice before any
    fan-out)."""
    v = F.col(vec_col)
    if dims is not None:
        v = F.slice(v, 1, dims)
    vecs = df.select(F.transform(v, lambda x: x.cast("double")).alias("v"))

    if exact:
        a = vecs.select(F.posexplode("v").alias("i", "vi"), F.col("v"))
        pairs = a.select(
            "i", "vi", F.posexplode("v").alias("j", "vj")
        ).filter(F.col("i") <= F.col("j"))
        prod = (
            F.col("vi").cast("decimal(18,9)") * F.col("vj").cast("decimal(18,9)")
        )
        # round(12): the decimal SUM is exact and identical everywhere,
        # but decimal->double conversion may double-round (int128 * 1e-18
        # in some engines) — one ulp at ~1e-17; rounding to 12 decimals
        # absorbs it without losing numeric meaning
        return (
            pairs.groupBy("i", "j")
            .agg(
                F.round(
                    F.sum(prod).cast("decimal(38,18)").cast("double"), 12
                ).alias("gram")
            )
            .orderBy("i", "j")
        )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf["v"].tolist(), dtype="float64")
            g = mat.T @ mat
            iu, ju = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"), "partial": g[iu, ju]}
            )

    partials = vecs.mapInPandas(kernel, GRAM_SCHEMA)
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
        .orderBy("i", "j")
    )
