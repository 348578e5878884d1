"""Declared-query waves: round-5 wave: effective-sample-size / design
effect audit for IPS weights; round-5 wave: Jensen-Shannon divergence
between source vocabularies; round-5 wave: Gumbel return level for
daily spend extremes.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: the ESS reduces to exact counts times per-stratum
constants; JS runs on exact integer token counts; the Gumbel fit uses
exact integer daily maxima through identical closed forms.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w30 import *  # noqa: F401,F403


# --- round-5 wave: ESS / design-effect audit --------------------------------------


def ext_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-sample-size audit of the X279 IPS weights: per brand
    stratum, ESS = (sum w)^2 / sum w^2 for the clipped inverse-
    propensity weights and the design effect n/ESS — the diagnostic
    that says how much variance the weighting itself costs (Kish).
    Weights are constant within (brand, arm), so every sum reduces to
    exact counts times a per-stratum constant; top-5 worst design
    effects.

    Scale shape: one grouped pass to O(brands) exact counts; all
    weight arithmetic on that tiny axis."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount") >= 0.05).cast("int").alias("t"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    bm = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.sum("t").alias("n1"),
            F.sum(F.expr("CAST(1 - t AS LONG)")).alias("n0"),
        )
    )
    scored = bm.select(
        "p_brand",
        F.expr("n1 + n0").alias("n"),
        F.expr(
            "LEAST(GREATEST(CAST(n1 AS DOUBLE)/(n1 + n0), 0.05), 0.95)"
        ).alias("e"),
    ).select(
        "p_brand",
        "n",
        F.expr("ROUND(e, 6)").alias("propensity"),
        F.expr(
            "ROUND(POW(n, 2)"
            "/( (n*e)*POW(1.0/e, 2) + (n*(1.0 - e))*POW(1.0/(1.0 - e), 2) ), 2)"
        ).alias("ess"),
        F.expr(
            "ROUND(n/(POW(n, 2)"
            "/( (n*e)*POW(1.0/e, 2) + (n*(1.0 - e))*POW(1.0/(1.0 - e), 2) )), 4)"
        ).alias("design_effect"),
    )
    return scored.orderBy(F.col("design_effect").desc(), "p_brand").limit(5)


EXT_WEIGHT_ESS_SQL = r"""
WITH li AS (
  SELECT p.p_brand,
         CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
bm AS (
  SELECT p_brand,
         CAST(SUM(t) AS BIGINT) AS n1,
         CAST(SUM(1 - t) AS BIGINT) AS n0
  FROM li GROUP BY p_brand
),
scored AS (
  SELECT p_brand, n1 + n0 AS n,
         LEAST(GREATEST(CAST(n1 AS DOUBLE)/(n1 + n0), 0.05), 0.95) AS e
  FROM bm
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n,
       ROUND(e, 6) AS propensity,
       ROUND(POW(n, 2)
         /( (n*e)*POW(1.0/e, 2) + (n*(1.0 - e))*POW(1.0/(1.0 - e), 2) ), 2)
         AS ess,
       ROUND(n/(POW(n, 2)
         /( (n*e)*POW(1.0/e, 2) + (n*(1.0 - e))*POW(1.0/(1.0 - e), 2) )), 4)
         AS design_effect
FROM scored
ORDER BY design_effect DESC, p_brand LIMIT 5
"""


EXT_QUERIES.update({"ext_weight_ess": ext_weight_ess})
EXT_ORACLES.update({"ext_weight_ess": EXT_WEIGHT_ESS_SQL})


# --- round-5 wave: Jensen-Shannon divergence ---------------------------------------


def ext_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    every source pair: the symmetric, bounded-by-ln2 counterpart of
    X190's KL novelty — the right metric when neither corpus is the
    reference. Exact integer token counts per (source, word); the
    word axis carries both sources' counts side by side (zero-filled),
    and each pairwise JS sums p*ln(2p/(p+q)) terms written identically
    in both engines.

    Scale shape: one tokenize-explode pass to (source, word) counts,
    a by-word pivot to the O(vocab) axis, one agg per source pair."""
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    srcs = tok.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .crossJoin(srcs.alias("b"))
        .filter(F.expr("a.source < b.source"))
        .select(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
    )
    # full-outer align per pair: the two sides keyed by (pair, word)
    a_side = pairs.join(
        tok.select(F.col("source").alias("src_a"), "w", F.col("c").alias("ca")),
        "src_a",
    ).select("src_a", "src_b", "w", "ca")
    b_side = pairs.join(
        tok.select(F.col("source").alias("src_b"), "w", F.col("c").alias("cb")),
        "src_b",
    ).select("src_a", "src_b", "w", "cb")
    grid = (
        a_side.join(b_side, ["src_a", "src_b", "w"], "full_outer")
        .select(
            "src_a",
            "src_b",
            F.expr("COALESCE(ca, 0L)").alias("ca"),
            F.expr("COALESCE(cb, 0L)").alias("cb"),
        )
    )
    wpair = Window.partitionBy("src_a", "src_b")
    scored = grid.withColumn("ta", F.sum("ca").over(wpair)).withColumn(
        "tb", F.sum("cb").over(wpair)
    )
    return (
        scored.groupBy("src_a", "src_b")
        .agg(
            F.max("ta").alias("tokens_a"),
            F.max("tb").alias("tokens_b"),
            F.expr(
                "ROUND(SUM("
                " CASE WHEN ca > 0 THEN 0.5*(CAST(ca AS DOUBLE)/ta)"
                "  *LN(2.0*(CAST(ca AS DOUBLE)/ta)"
                "      /(CAST(ca AS DOUBLE)/ta + CAST(cb AS DOUBLE)/tb)) ELSE 0 END"
                " + CASE WHEN cb > 0 THEN 0.5*(CAST(cb AS DOUBLE)/tb)"
                "  *LN(2.0*(CAST(cb AS DOUBLE)/tb)"
                "      /(CAST(ca AS DOUBLE)/ta + CAST(cb AS DOUBLE)/tb)) ELSE 0 END"
                "), 6)"
            ).alias("js_nats"),
        )
        .orderBy("src_a", "src_b")
    )


EXT_JS_DIVERGENCE_SQL = r"""
WITH tok AS (
  SELECT source, unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
  FROM documents
),
counts AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM counts) a
  JOIN (SELECT DISTINCT source FROM counts) b ON a.source < b.source
),
a_side AS (
  SELECT p.src_a, p.src_b, c.w, c.c AS ca
  FROM pairs p JOIN counts c ON c.source = p.src_a
),
b_side AS (
  SELECT p.src_a, p.src_b, c.w, c.c AS cb
  FROM pairs p JOIN counts c ON c.source = p.src_b
),
grid AS (
  SELECT COALESCE(a.src_a, b.src_a) AS src_a,
         COALESCE(a.src_b, b.src_b) AS src_b,
         COALESCE(a.ca, 0) AS ca, COALESCE(b.cb, 0) AS cb
  FROM a_side a FULL OUTER JOIN b_side b
    ON a.src_a = b.src_a AND a.src_b = b.src_b AND a.w = b.w
),
scored AS (
  SELECT src_a, src_b, ca, cb,
         SUM(ca) OVER (PARTITION BY src_a, src_b) AS ta,
         SUM(cb) OVER (PARTITION BY src_a, src_b) AS tb
  FROM grid
)
SELECT src_a, src_b,
       CAST(MAX(ta) AS BIGINT) AS tokens_a,
       CAST(MAX(tb) AS BIGINT) AS tokens_b,
       ROUND(SUM(
         CASE WHEN ca > 0 THEN 0.5*(CAST(ca AS DOUBLE)/ta)
           *LN(2.0*(CAST(ca AS DOUBLE)/ta)
               /(CAST(ca AS DOUBLE)/ta + CAST(cb AS DOUBLE)/tb)) ELSE 0 END
         + CASE WHEN cb > 0 THEN 0.5*(CAST(cb AS DOUBLE)/tb)
           *LN(2.0*(CAST(cb AS DOUBLE)/tb)
               /(CAST(ca AS DOUBLE)/ta + CAST(cb AS DOUBLE)/tb)) ELSE 0 END
       ), 6) AS js_nats
FROM scored GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


EXT_QUERIES.update({"ext_js_divergence": ext_js_divergence})
EXT_ORACLES.update({"ext_js_divergence": EXT_JS_DIVERGENCE_SQL})


# --- round-5 wave: Gumbel return level ---------------------------------------------


def ext_gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value return level: fit a Gumbel distribution to the
    daily MAXIMUM event value by the method of moments (beta =
    sqrt(6)*sd/pi, mu = mean - 0.5772156649*beta) and report the
    100-day and 1000-day return levels mu - beta*ln(-ln(1 - 1/T)) —
    the capacity question ('how big a spike should we engineer for?')
    that sample maxima alone cannot answer. Daily maxima are exact
    integer cents; the fit and levels are identical closed forms in
    both engines (Euler-Mascheroni as a shared literal).

    Scale shape: one pass to O(days) exact maxima, one scalar moment
    agg, O(1) arithmetic."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.max(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("mx"))
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(F.expr("mx*mx")).alias("s2"),
        F.max("mx").alias("observed_max_c"),
    )
    fit = m.select(
        "n",
        F.expr("CAST(s1 AS DOUBLE)/n").alias("mean"),
        F.expr(
            "SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)/(n - 1))"
        ).alias("sd"),
        F.expr("CAST(observed_max_c AS DOUBLE)/1e2").alias("observed_max"),
    ).select(
        "n",
        "observed_max",
        F.expr("SQRT(6.0)*sd/PI()").alias("beta"),
        F.expr("mean - 0.5772156649*(SQRT(6.0)*sd/PI())").alias("mu"),
    )
    return fit.select(
        F.col("n").alias("n_days"),
        "observed_max",
        F.expr("ROUND(mu/1e2, 4)").alias("gumbel_mu"),
        F.expr("ROUND(beta/1e2, 4)").alias("gumbel_beta"),
        F.expr(
            "ROUND((mu - beta*LN(-LN(1.0 - 1.0/100)))/1e2, 4)"
        ).alias("level_100d"),
        F.expr(
            "ROUND((mu - beta*LN(-LN(1.0 - 1.0/1000)))/1e2, 4)"
        ).alias("level_1000d"),
    )


EXT_GUMBEL_RETURN_LEVEL_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(MAX(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS mx
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS BIGINT) AS s1,
         CAST(SUM(mx*mx) AS BIGINT) AS s2,
         MAX(mx) AS observed_max_c
  FROM daily
),
fit AS (
  SELECT n,
         CAST(observed_max_c AS DOUBLE)/1e2 AS observed_max,
         SQRT(6.0)*SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)/(n - 1))/PI()
           AS beta,
         CAST(s1 AS DOUBLE)/n
           - 0.5772156649*(SQRT(6.0)
             *SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)/(n - 1))/PI())
           AS mu
  FROM m
)
SELECT n AS n_days, observed_max,
       ROUND(mu/1e2, 4) AS gumbel_mu,
       ROUND(beta/1e2, 4) AS gumbel_beta,
       ROUND((mu - beta*LN(-LN(1.0 - 1.0/100)))/1e2, 4) AS level_100d,
       ROUND((mu - beta*LN(-LN(1.0 - 1.0/1000)))/1e2, 4) AS level_1000d
FROM fit
"""


EXT_QUERIES.update({"ext_gumbel_return_level": ext_gumbel_return_level})
EXT_ORACLES.update({"ext_gumbel_return_level": EXT_GUMBEL_RETURN_LEVEL_SQL})
