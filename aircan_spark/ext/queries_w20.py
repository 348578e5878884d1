"""Declared-query waves: round-5 wave: deterministic RANSAC trend fit;
round-5 wave: upper-tail dependence of two activity series; round-5
wave: per-user sequence scoring under a fixed Markov reference model.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: md5-replayable candidate sampling, exact integer inlier
counts and nearest-rank thresholds, fixed e-notation model literals with
deterministic argmax/bottom-k tie-breaks.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w19 import *  # noqa: F401,F403


# --- round-5 wave: deterministic RANSAC trend ---------------------------------


def ext_ransac_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC-style robust trend of daily revenue with DETERMINISTIC
    (md5-replayable) candidate sampling: 12 candidate lines each drawn
    through a hash-chosen day pair, scored by inlier count within a 20%
    band of the mean daily revenue, best model by (inliers desc,
    candidate asc) — the outlier-immune alternative to OLS
    (ext_causal_impact's fit) and the sibling of ext_theil_sen with an
    explicit consensus-count objective. All scoring is exact: integer
    cents, cross-multiplied residual compare (no division), integer
    inlier counts.

    Scale shape: candidates are O(1) broadcast rows; scoring is one
    conditional agg over the day axis per candidate (12 x O(days))."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("c"))
    )
    nd = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    cand = (
        spark.range(1, 13)
        .select(F.col("id").alias("k"))
        .join(F.broadcast(nd))
        .select(
            "k",
            F.expr(
                "CAST(conv(substring(md5(concat('a', CAST(k AS STRING))), 1, 8),"
                " 16, 10) AS BIGINT) % n"
            ).alias("i"),
            F.expr(
                "CAST(conv(substring(md5(concat('b', CAST(k AS STRING))), 1, 8),"
                " 16, 10) AS BIGINT) % n"
            ).alias("j"),
            "n",
            "s",
        )
        .filter(F.expr("i <> j"))
    )
    lines = (
        cand.join(daily.select(F.col("t").alias("i"), F.col("c").alias("yi")), "i")
        .join(daily.select(F.col("t").alias("j"), F.col("c").alias("yj")), "j")
        .select("k", "i", "j", "yi", "yj", "n", "s")
    )
    # inlier: |(yj-yi)*(t-i) - (y-yi)*(j-i)| <= 0.2*(s/n)*|j-i|  (cross-multiplied,
    # exact integers on both sides of the compare scaled by 5n)
    scored = (
        daily.join(F.broadcast(lines))
        .select(
            "k",
            "i",
            "j",
            "yi",
            "yj",
            "n",
            F.expr(
                "CAST(ABS((yj - yi)*(t - i)*5*n - (c - yi)*(j - i)*5*n)"
                " <= ABS(j - i)*s AS LONG)"
            ).alias("inlier"),
        )
        .groupBy("k", "i", "j", "yi", "yj", "n")
        .agg(F.sum("inlier").alias("n_inliers"))
    )
    best = scored.orderBy(F.col("n_inliers").desc(), F.col("k").asc()).limit(1)
    return best.select(
        F.col("k").alias("candidate"),
        F.col("i").alias("t1"),
        F.col("j").alias("t2"),
        "n_inliers",
        F.col("n").alias("n_days"),
        F.expr("ROUND(CAST(yj - yi AS DOUBLE)/(j - i)/1e2, 4)").alias(
            "slope_per_day"
        ),
        F.expr("ROUND(CAST(yi AS DOUBLE)/1e2 - CAST(yj - yi AS DOUBLE)/(j - i)*i/1e2, 4)").alias(
            "intercept"
        ),
    )


EXT_RANSAC_TREND_SQL = r"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
nd AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s FROM daily),
cand AS (
  SELECT k.k,
         CAST(('0x' || SUBSTR(md5('a' || CAST(k.k AS VARCHAR)), 1, 8))::UBIGINT % n AS BIGINT) AS i,
         CAST(('0x' || SUBSTR(md5('b' || CAST(k.k AS VARCHAR)), 1, 8))::UBIGINT % n AS BIGINT) AS j,
         n, s
  FROM (SELECT UNNEST(generate_series(1, 12)) AS k) k CROSS JOIN nd
),
lines AS (
  SELECT c.k, c.i, c.j, di.c AS yi, dj.c AS yj, c.n, c.s
  FROM cand c
  JOIN daily di ON di.t = c.i
  JOIN daily dj ON dj.t = c.j
  WHERE c.i <> c.j
),
scored AS (
  SELECT l.k, l.i, l.j, l.yi, l.yj, l.n,
         CAST(SUM(CAST(ABS((l.yj - l.yi)*(d.t - l.i)*5*l.n - (d.c - l.yi)*(l.j - l.i)*5*l.n)
              <= ABS(l.j - l.i)*l.s AS BIGINT)) AS BIGINT) AS n_inliers
  FROM daily d CROSS JOIN lines l
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT k AS candidate, i AS t1, j AS t2, n_inliers, n AS n_days,
       ROUND(CAST(yj - yi AS DOUBLE)/(j - i)/1e2, 4) AS slope_per_day,
       ROUND(CAST(yi AS DOUBLE)/1e2 - CAST(yj - yi AS DOUBLE)/(j - i)*i/1e2, 4) AS intercept
FROM scored ORDER BY n_inliers DESC, k ASC LIMIT 1
"""


EXT_QUERIES.update({"ext_ransac_trend": ext_ransac_trend})
EXT_ORACLES.update({"ext_ransac_trend": EXT_RANSAC_TREND_SQL})


# --- round-5 wave: upper-tail dependence --------------------------------------


def ext_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-tail dependence of daily click and purchase volumes: do the
    two series spike TOGETHER? Both thresholds are exact nearest-rank
    80th percentiles of their own daily distributions; the dependence
    coefficient P(both extreme)/P(purchases extreme) and the
    independence baseline are exact integer ratios — correlation sees
    average co-movement, this sees only the joint extremes that size
    capacity planning.

    Scale shape: one day hash agg; thresholds via tiny sorted windows
    on the O(days) axis."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("x"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("y"),
        )
    )
    n = daily.agg(F.count(F.lit(1)).alias("n"))
    qx = (
        daily.select("x", F.row_number().over(Window.orderBy(F.col("x").asc(), F.col("day").asc())).alias("rk"))
        .join(F.broadcast(n))
        .filter(F.expr("5*rk >= 4*n"))
        .agg(F.min("x").alias("qx"))
    )
    qy = (
        daily.select("y", F.row_number().over(Window.orderBy(F.col("y").asc(), F.col("day").asc())).alias("rk"))
        .join(F.broadcast(n))
        .filter(F.expr("5*rk >= 4*n"))
        .agg(F.min("y").alias("qy"))
    )
    return (
        daily.join(F.broadcast(qx))
        .join(F.broadcast(qy))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max("qx").alias("click_q80"),
            F.max("qy").alias("purchase_q80"),
            F.sum(F.expr("CAST(x >= qx AS LONG)")).alias("n_x_extreme"),
            F.sum(F.expr("CAST(y >= qy AS LONG)")).alias("n_y_extreme"),
            F.sum(F.expr("CAST(x >= qx AND y >= qy AS LONG)")).alias("n_joint"),
        )
        .select(
            "n_days",
            "click_q80",
            "purchase_q80",
            "n_joint",
            F.expr(
                "ROUND(CAST(n_joint AS DOUBLE)/n_y_extreme, 6)"
            ).alias("tail_dependence"),
            F.expr(
                "ROUND(CAST(n_x_extreme AS DOUBLE)*n_y_extreme/(CAST(n_days AS DOUBLE)*n_days), 6)"
            ).alias("independence_baseline"),
        )
    )


EXT_TAIL_DEPENDENCE_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
n AS (SELECT COUNT(*) AS n FROM daily),
qx AS (
  SELECT MIN(x) AS qx FROM (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, day ASC) AS rk FROM daily
  ) CROSS JOIN n WHERE 5*rk >= 4*n
),
qy AS (
  SELECT MIN(y) AS qy FROM (
    SELECT y, ROW_NUMBER() OVER (ORDER BY y ASC, day ASC) AS rk FROM daily
  ) CROSS JOIN n WHERE 5*rk >= 4*n
)
SELECT COUNT(*) AS n_days,
       MAX(qx) AS click_q80, MAX(qy) AS purchase_q80,
       CAST(SUM(CAST(x >= qx AND y >= qy AS BIGINT)) AS BIGINT) AS n_joint,
       ROUND(CAST(SUM(CAST(x >= qx AND y >= qy AS BIGINT)) AS DOUBLE)
             /SUM(CAST(y >= qy AS BIGINT)), 6) AS tail_dependence,
       ROUND(CAST(SUM(CAST(x >= qx AS BIGINT)) AS DOUBLE)*SUM(CAST(y >= qy AS BIGINT))
             /(CAST(COUNT(*) AS DOUBLE)*COUNT(*)), 6) AS independence_baseline
FROM daily CROSS JOIN qx CROSS JOIN qy
"""


EXT_QUERIES.update({"ext_tail_dependence": ext_tail_dependence})
EXT_ORACLES.update({"ext_tail_dependence": EXT_TAIL_DEPENDENCE_SQL})


# --- round-5 wave: Markov sequence anomaly score ------------------------------


def ext_markov_sequence_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral-sequence scoring under a FIXED reference
    Markov model (stay probability 0.3, any switch 0.175 — sums to 1
    over the 5 event types): average transition log-likelihood per
    user, bottom-20 (most anomalous) reported — the bot/abuse screen
    where ext_markov_entropy measures the corpus, this scores each
    ACTOR against a reference. Per-user stay/switch counts are exact
    integers from one LAG window; the score is a two-literal ln
    expression; ranking ties break by user_id.

    Scale shape: one per-user window + one hash agg; top-k via
    TakeOrderedAndProject."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum(F.expr("CAST(event_type = prev AS LONG)")).alias("n_stay"),
        )
    )
    return (
        trans.filter(F.col("n_trans") >= 5)
        .select(
            "user_id",
            "n_trans",
            "n_stay",
            F.expr(
                "ROUND((n_stay*LN(0.3e0) + (n_trans - n_stay)*LN(0.175e0))"
                "/n_trans, 6)"
            ).alias("avg_loglik"),
        )
        .orderBy(F.col("avg_loglik").asc(), F.col("user_id").asc())
        .limit(20)
    )


EXT_MARKOV_SEQUENCE_SCORE_SQL = r"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
trans AS (
  SELECT user_id, COUNT(*) AS n_trans,
         CAST(SUM(CAST(event_type = prev AS BIGINT)) AS BIGINT) AS n_stay
  FROM seq WHERE prev IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_trans, n_stay,
       ROUND((n_stay*LN(0.3e0) + (n_trans - n_stay)*LN(0.175e0))/n_trans, 6) AS avg_loglik
FROM trans WHERE n_trans >= 5
ORDER BY avg_loglik ASC, user_id ASC LIMIT 20
"""


EXT_QUERIES.update({"ext_markov_sequence_score": ext_markov_sequence_score})
EXT_ORACLES.update({"ext_markov_sequence_score": EXT_MARKOV_SEQUENCE_SCORE_SQL})
