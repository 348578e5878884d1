"""Declared-query waves: round-5 wave: hard-negative mining for
contrastive training; round-5 wave: nearest-class-mean classifier
evaluation with exact decimal scoring; round-5 wave: int8 vector
quantization distortion audit.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: cosines round to 6 decimals BEFORE ranking with vec_id
tie-breaks (the X6 ext_sim_topk_brute convention); the centroid
classifier is EXACT end-to-end (decimal centroid sums, decimal
dot-products, integer accuracy counts); per-vector folds are sequential
on both engines per the ext_vector_norms precedent.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w17 import *  # noqa: F401,F403


# --- round-5 wave: hard-negative mining ---------------------------------------


def ext_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor (every 50th vector) find the OTHER-label vector with the
    highest cosine — the confusable examples a triplet/InfoNCE sampler
    should upweight. The anchor side broadcasts (bounded) while the
    corpus streams; cosine is a JVM-side zip_with/aggregate fold
    (whole-stage codegen, no Python), rounded to 6 decimals before the
    (cosine desc, vec_id asc) top-1 so ranking is engine-stable.

    Scale shape: broadcast-anchors x corpus scan — linear in the corpus
    because the anchor panel is CAP-ADAPTIVE (~40 anchors at any corpus
    size via capped_panel_modulus; a fixed %50 fraction would grow
    anchors with the corpus and make the scan quadratic; modulus 50 at
    every committed fixture SF, outputs bit-identical there); for
    unbounded anchor sets swap in the X7/X8 LSH/IVF machinery."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    p = capped_panel_modulus(corpus_count(spark, sf_dir, "embeddings"), base=50, cap=40)
    anchors = emb.filter(F.expr(f"vec_id % {p} = 0")).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("av"),
    )
    scored = (
        emb.join(F.broadcast(anchors), F.expr("label <> anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            "label",
            F.expr(
                "ROUND(aggregate(zip_with(av, v, (a, b) -> a*b), 0e0, (acc, x) -> acc + x)"
                "/(SQRT(aggregate(av, 0e0, (acc, x) -> acc + x*x))"
                "*SQRT(aggregate(v, 0e0, (acc, x) -> acc + x*x))), 6)"
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("hard_negative_id"),
            F.col("label").alias("negative_label"),
            "cosine",
        )
        .orderBy("anchor_id")
    )


EXT_HARD_NEGATIVES_SQL = r"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
  SELECT 50 * GREATEST(1, CAST(CEIL(COUNT(*) / 2000.0) AS BIGINT)) AS p
  FROM embeddings
),
a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, v AS av
  FROM e WHERE vec_id % (SELECT p FROM p) = 0
),
scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
         ROUND(list_cosine_similarity(a.av, e.v), 6) AS cosine
  FROM a JOIN e ON e.label <> a.anchor_label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY anchor_id ORDER BY cosine DESC, vec_id ASC
  ) AS rk
  FROM scored
)
SELECT anchor_id, anchor_label, vec_id AS hard_negative_id,
       label AS negative_label, cosine
FROM ranked WHERE rk = 1 ORDER BY anchor_id
"""


EXT_QUERIES.update({"ext_hard_negatives": ext_hard_negatives})
EXT_ORACLES.update({"ext_hard_negatives": EXT_HARD_NEGATIVES_SQL})


# --- round-5 wave: nearest-class-mean classifier eval -------------------------


def ext_nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean classifier evaluated on a held-out md5 split
    (80/20): per-label centroids from EXACT decimal sums over the train
    vectors (rounded to 6 decimals — identical doubles both engines),
    test vectors scored by squared distance via the exact-decimal
    identity argmin_c (|c|^2 - 2 x.c) — every dot product is a DECIMAL
    sum over the exploded (pos) join, so the argmin (ties to the
    smaller label) and the per-label recall counts are EXACT, no float
    aggregation anywhere. The linear-probe-style eval that benchmarks
    embedding quality without training a model.

    Scale shape: explode join on pos (64-row fan-out) + two hash aggs;
    centroids broadcast."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 10"
        ).alias("bucket"),
        "embedding",
    )
    exploded = emb.select(
        "vec_id",
        "label",
        "bucket",
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(x AS DECIMAL(20,10)))")
        ).alias("pos", "x"),
    )
    cent = (
        exploded.filter(F.col("bucket") < 8)
        .groupBy(F.col("label").alias("clabel"), "pos")
        .agg(
            F.expr(
                "CAST(ROUND(CAST(SUM(x) AS DOUBLE)/COUNT(*), 6) AS DECIMAL(16,6))"
            ).alias("c")
        )
    )
    cc = cent.groupBy("clabel").agg(F.sum(F.expr("c*c")).alias("cc"))
    scores = (
        exploded.filter(F.col("bucket") >= 8)
        .join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(F.expr("x*c")).alias("dot"))
        .join(F.broadcast(cc), "clabel")
        .select(
            "vec_id", "label", "clabel", F.expr("cc - 2*dot").alias("score")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("score").asc(), F.col("clabel").asc())
    pred = (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", F.col("clabel").alias("pred"))
    )
    return (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.expr("CAST(pred = label AS LONG)")).alias("n_correct"),
        )
        .select(
            "label",
            "n_test",
            "n_correct",
            F.expr("ROUND(CAST(n_correct AS DOUBLE)/n_test, 6)").alias("recall"),
        )
        .orderBy("label")
    )


EXT_NEAREST_CENTROID_EVAL_SQL = r"""
WITH e AS (
  SELECT vec_id, label,
         CAST(('0x' || SUBSTR(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT % 10 AS BIGINT) AS bucket,
         embedding
  FROM embeddings
),
exploded AS (
  SELECT vec_id, label, bucket, g.pos,
         CAST(embedding[g.pos + 1] AS DECIMAL(20,10)) AS x
  FROM e, generate_series(0, 63) g(pos)
  WHERE g.pos < len(embedding)
),
cent AS (
  SELECT label AS clabel, pos,
         CAST(ROUND(CAST(SUM(x) AS DOUBLE)/COUNT(*), 6) AS DECIMAL(16,6)) AS c
  FROM exploded WHERE bucket < 8 GROUP BY 1, 2
),
cc AS (SELECT clabel, SUM(c*c) AS cc FROM cent GROUP BY clabel),
scores AS (
  SELECT t.vec_id, t.label, s.clabel, cc.cc - 2*SUM(t.x*s.c) AS score
  FROM exploded t JOIN cent s USING (pos) JOIN cc ON cc.clabel = s.clabel
  WHERE t.bucket >= 8
  GROUP BY t.vec_id, t.label, s.clabel, cc.cc
),
pred AS (
  SELECT vec_id, label, clabel AS pred
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY score ASC, clabel ASC
    ) AS rk
    FROM scores
  ) WHERE rk = 1
)
SELECT label, COUNT(*) AS n_test,
       CAST(SUM(CAST(pred = label AS BIGINT)) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CAST(pred = label AS BIGINT)) AS DOUBLE)/COUNT(*), 6) AS recall
FROM pred GROUP BY label ORDER BY label
"""


EXT_QUERIES.update({"ext_nearest_centroid_eval": ext_nearest_centroid_eval})
EXT_ORACLES.update({"ext_nearest_centroid_eval": EXT_NEAREST_CENTROID_EVAL_SQL})


# --- round-5 wave: int8 quantization distortion audit -------------------------


def ext_vq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label distortion audit of symmetric int8 vector quantization
    (q = round(127*x/maxabs), dequant = q*maxabs/127 — the compression
    X66 ships): per-vector reconstruction MSE as a row-local sequential
    fold (identical on both engines per the ext_vector_norms
    precedent), aggregated per label with the decimal-rounded term-sum
    contract, plus the worst per-vector MSE — the accuracy-loss
    evidence that licenses (or blocks) serving quantized vectors.

    Scale shape: row-local list arithmetic + one hash agg."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    per = emb.select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(v, 0e0, (m, x) -> GREATEST(m, ABS(x)))"
        ).alias("maxabs"),
    ).join(emb.select("vec_id", F.col("v").alias("v2")), "vec_id").select(
        "vec_id",
        "label",
        F.expr(
            "CASE WHEN maxabs > 0e0 THEN"
            " ROUND(aggregate(transform(v2, x -> (x - ROUND(127e0*x/maxabs)*maxabs/127e0)"
            "*(x - ROUND(127e0*x/maxabs)*maxabs/127e0)), 0e0, (acc, x) -> acc + x)"
            "/size(v2), 12)"
            " ELSE 0e0 END"
        ).alias("mse"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.expr(
                "ROUND(CAST(SUM(CAST(mse AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 10)"
            ).alias("mean_mse"),
            F.expr("ROUND(MAX(mse), 10)").alias("max_mse"),
        )
        .orderBy("label")
    )


EXT_VQ_DISTORTION_SQL = r"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
per AS (
  SELECT vec_id, label,
         CASE WHEN list_aggregate(list_transform(v, x -> ABS(x)), 'max') > 0e0 THEN
           ROUND(list_sum(list_transform(v,
             x -> (x - ROUND(127e0*x/m.maxabs)*m.maxabs/127e0)
                 *(x - ROUND(127e0*x/m.maxabs)*m.maxabs/127e0)))/len(v), 12)
         ELSE 0e0 END AS mse
  FROM e, LATERAL (SELECT list_aggregate(list_transform(v, x -> ABS(x)), 'max') AS maxabs) m
)
SELECT label, COUNT(*) AS n_vectors,
       ROUND(CAST(SUM(CAST(mse AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 10) AS mean_mse,
       ROUND(MAX(mse), 10) AS max_mse
FROM per GROUP BY label ORDER BY label
"""


EXT_QUERIES.update({"ext_vq_distortion": ext_vq_distortion})
EXT_ORACLES.update({"ext_vq_distortion": EXT_VQ_DISTORTION_SQL})
