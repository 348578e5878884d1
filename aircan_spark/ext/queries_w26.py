"""Declared-query waves: round-5 wave: day-axis periodogram; round-5
wave: embedding anisotropy audit; round-5 wave: supplier price
dispersion (law-of-one-price audit).

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: the periodogram runs entirely on exact integer daily
counts (trig enters only on the tiny day x period axis, through
identical expressions); embeddings are quantized to exact integer
micro-units before any cross-row sum, so no float addition order can
differ between engines; unit prices are exact integer cents.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w25 import *  # noqa: F401,F403


# --- round-5 wave: day-axis periodogram ----------------------------------------


def ext_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram of the daily event volume at candidate periods of
    2..14 days: fraction of the count variance concentrated at each
    period, from the mean-centered DFT power (A^2+B^2)/(n*SS) — the
    spectral view that finds the weekly cycle X225's seasonal-strength
    ratio assumes, instead of assuming it. The peak period is flagged
    by a window max.

    Scale shape: the fact table collapses to O(days) exact integer
    counts in one pass; the DFT is a broadcast cross join over the
    tiny days x periods grid."""
    days = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr("DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01')").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = days.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("c").alias("sc"),
    )
    grid = days.crossJoin(F.broadcast(stats)).select(
        "d",
        F.expr("CAST(c AS DOUBLE) - CAST(sc AS DOUBLE)/nd").alias("cc"),
        F.explode(F.expr("sequence(2, 14)")).alias("period"),
    )
    spec = grid.groupBy("period").agg(
        F.sum(F.expr("cc*COS(2*PI()*d/period)")).alias("a"),
        F.sum(F.expr("cc*SIN(2*PI()*d/period)")).alias("b"),
        F.sum(F.expr("cc*cc")).alias("ss"),
        F.count(F.lit(1)).alias("nd"),
    )
    wall = Window.partitionBy()
    return (
        spec.select(
            "period",
            F.expr("ROUND((a*a + b*b)/(nd*ss), 6)").alias("power_frac"),
        )
        .withColumn("max_pf", F.max("power_frac").over(wall))
        .select(
            "period",
            "power_frac",
            F.expr("CAST(power_frac = max_pf AS INT)").alias("is_peak"),
        )
        .orderBy("period")
    )


EXT_PERIODOGRAM_SQL = r"""
WITH days AS (
  SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS sc FROM days
),
grid AS (
  SELECT d.d, CAST(d.c AS DOUBLE) - CAST(s.sc AS DOUBLE)/s.nd AS cc, p.period
  FROM days d
  CROSS JOIN stats s
  CROSS JOIN (SELECT UNNEST(generate_series(2, 14)) AS period) p
),
spec AS (
  SELECT period,
         SUM(cc*COS(2*PI()*d/period)) AS a,
         SUM(cc*SIN(2*PI()*d/period)) AS b,
         SUM(cc*cc) AS ss,
         COUNT(*) AS nd
  FROM grid GROUP BY period
),
pf AS (
  SELECT period, ROUND((a*a + b*b)/(nd*ss), 6) AS power_frac FROM spec
)
SELECT period, power_frac,
       CAST(power_frac = MAX(power_frac) OVER () AS INTEGER) AS is_peak
FROM pf ORDER BY period
"""


EXT_QUERIES.update({"ext_periodogram": ext_periodogram})
EXT_ORACLES.update({"ext_periodogram": EXT_PERIODOGRAM_SQL})


# --- round-5 wave: embedding anisotropy audit ----------------------------------


def ext_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy audit: squared norm of the mean UNIT vector
    (which equals the expected pairwise cosine similarity of the
    collection, the classic anisotropy measure — a healthy isotropic
    space scores near 0, a collapsed cone near 1), plus the norm
    mean/CV that says whether magnitude carries signal. Every
    cross-row sum runs over exact integer micro-units (values and unit
    components quantized via ROUND to 1e-6, norms to 1e-4), so no
    float accumulation order exists to differ between engines; the
    deterministic quantization costs ~1e-4 relative accuracy, noted
    here by design.

    Scale shape: explode-once to O(n*d) rows, one per-vector agg, one
    per-dimension agg over the O(d) axis, one scalar combine."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "v"),
    )
    q = emb.select(
        "vec_id",
        "pos",
        F.expr("CAST(ROUND(CAST(v AS DOUBLE)*1e6) AS BIGINT)").alias("vq"),
    )
    norms = q.groupBy("vec_id").agg(
        F.expr("SQRT(CAST(SUM(vq*vq) AS DOUBLE))").alias("nrm")
    )
    unit = (
        q.join(norms, "vec_id")
        .select(
            "pos",
            F.expr("CAST(ROUND(vq/nrm*1e6) AS BIGINT)").alias("uq"),
        )
        .groupBy("pos")
        .agg(F.sum("uq").alias("su"), F.count(F.lit(1)).alias("n"))
    )
    aniso = unit.agg(
        F.max("n").alias("n_vectors"),
        F.expr(
            "ROUND(SUM(POW(CAST(su AS DOUBLE)/n/1e6, 2)), 6)"
        ).alias("anisotropy"),
    )
    nstats = norms.select(
        F.expr("CAST(ROUND(nrm/1e2) AS BIGINT)").alias("n4")
    ).agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("n4").alias("s1"),
        F.sum(F.expr("n4*n4")).alias("s2"),
    )
    return aniso.crossJoin(F.broadcast(nstats)).select(
        "n_vectors",
        "anisotropy",
        F.expr("ROUND(CAST(s1 AS DOUBLE)/nv/1e4, 6)").alias("mean_norm"),
        F.expr(
            "ROUND(SQRT(CAST(s2 AS DOUBLE)/nv - POW(CAST(s1 AS DOUBLE)/nv, 2))"
            "/(CAST(s1 AS DOUBLE)/nv), 6)"
        ).alias("norm_cv"),
    )


EXT_EMBEDDING_ANISOTROPY_SQL = r"""
WITH q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE)*1e6) AS BIGINT) AS vq
  FROM embeddings
),
norms AS (
  SELECT vec_id, SQRT(CAST(CAST(SUM(vq*vq) AS BIGINT) AS DOUBLE)) AS nrm
  FROM q GROUP BY vec_id
),
unit AS (
  SELECT q.pos,
         CAST(SUM(CAST(ROUND(q.vq/n.nrm*1e6) AS BIGINT)) AS BIGINT) AS su,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM q JOIN norms n ON n.vec_id = q.vec_id
  GROUP BY q.pos
),
aniso AS (
  SELECT MAX(n) AS n_vectors,
         ROUND(SUM(POW(CAST(su AS DOUBLE)/n/1e6, 2)), 6) AS anisotropy
  FROM unit
),
nstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nv,
         CAST(SUM(n4) AS BIGINT) AS s1,
         CAST(SUM(n4*n4) AS BIGINT) AS s2
  FROM (SELECT CAST(ROUND(nrm/1e2) AS BIGINT) AS n4 FROM norms)
)
SELECT n_vectors, anisotropy,
       ROUND(CAST(s1 AS DOUBLE)/nv/1e4, 6) AS mean_norm,
       ROUND(SQRT(CAST(s2 AS DOUBLE)/nv - POW(CAST(s1 AS DOUBLE)/nv, 2))
             /(CAST(s1 AS DOUBLE)/nv), 6) AS norm_cv
FROM aniso CROSS JOIN nstats
"""


EXT_QUERIES.update({"ext_embedding_anisotropy": ext_embedding_anisotropy})
EXT_ORACLES.update({"ext_embedding_anisotropy": EXT_EMBEDDING_ANISOTROPY_SQL})


# --- round-5 wave: supplier price dispersion -----------------------------------


def ext_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-one-price audit: for every part sold by 3+ suppliers,
    each supplier's best unit price (exact integer cents via one
    identical ROUND both engines), and the relative spread
    (max-min)/min across suppliers — the procurement signal that says
    which parts are paying a price for fragmented sourcing. Top 15 by
    relative spread.

    Scale shape: one grouped pass to (part, supplier) offers, one
    grouped pass to per-part spread, a tiny ranked head."""
    offers = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "CAST(ROUND(l_extendedprice/l_quantity*100) AS BIGINT)"
            ).alias("uc"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").alias("offer_c"))
    )
    parts = (
        offers.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("offer_c").alias("min_c"),
            F.max("offer_c").alias("max_c"),
        )
        .filter(F.col("n_suppliers") >= 3)
    )
    return (
        parts.select(
            F.col("l_partkey").alias("partkey"),
            "n_suppliers",
            F.expr("ROUND(min_c/1e2, 2)").alias("min_unit_price"),
            F.expr("ROUND(max_c/1e2, 2)").alias("max_unit_price"),
            F.expr(
                "ROUND(CAST(max_c - min_c AS DOUBLE)/min_c, 6)"
            ).alias("rel_spread"),
        )
        .orderBy(F.col("rel_spread").desc(), "partkey")
        .limit(15)
    )


EXT_PRICE_DISPERSION_SQL = r"""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         CAST(MIN(CAST(ROUND(l_extendedprice/l_quantity*100) AS BIGINT))
              AS BIGINT) AS offer_c
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
parts AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         MIN(offer_c) AS min_c,
         MAX(offer_c) AS max_c
  FROM offers GROUP BY l_partkey
  HAVING COUNT(*) >= 3
)
SELECT l_partkey AS partkey, n_suppliers,
       ROUND(min_c/1e2, 2) AS min_unit_price,
       ROUND(max_c/1e2, 2) AS max_unit_price,
       ROUND(CAST(max_c - min_c AS DOUBLE)/min_c, 6) AS rel_spread
FROM parts
ORDER BY rel_spread DESC, partkey LIMIT 15
"""


EXT_QUERIES.update({"ext_price_dispersion": ext_price_dispersion})
EXT_ORACLES.update({"ext_price_dispersion": EXT_PRICE_DISPERSION_SQL})
