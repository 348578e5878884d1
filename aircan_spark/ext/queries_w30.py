"""Declared-query waves: round-5 wave: Dickey-Fuller unit-root test;
round-5 wave: customer segment-migration matrix; round-5 wave:
t-closeness privacy audit.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: the DF regression reduces to exact BIGINT moments of
integer daily counts; segment thresholds are exact nearest-rank
statistics on the COLLAPSED spend-value axis (no global row ranking);
t-closeness EMD runs on exact integer bucket counts.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w29 import *  # noqa: F401,F403


# --- round-5 wave: Dickey-Fuller unit-root test ----------------------------------


def ext_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test on daily purchase volume: regress
    the first difference on the lagged level (with intercept) and
    report gamma and its t-statistic — the stationarity gate before
    any ARIMA-family forecast, completing the trend family (X264
    Mann-Kendall sees monotone trend; DF sees the random-walk root).
    Both the difference and the lag are exact integers, so the whole
    regression reduces to six BIGINT moments; the 5% critical value
    -2.86 (constant-only DF, large n) is a documented literal.

    Scale shape: collapse to O(days) counts, one LAG window on that
    tiny axis, one scalar moment agg."""
    daily = (
        _t(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.orderBy("day")
    pairs = (
        daily.withColumn("y_lag", F.lag("y").over(w))
        .filter("y_lag IS NOT NULL")
        .select(F.expr("y - y_lag").alias("dy"), "y_lag")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y_lag").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.expr("y_lag*y_lag")).alias("sxx"),
        F.sum(F.expr("dy*dy")).alias("syy"),
        F.sum(F.expr("y_lag*dy")).alias("sxy"),
    )
    fit = m.select(
        "n",
        F.expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n").alias("vx"),
        F.expr(
            "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)"
            "/(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n)"
        ).alias("g"),
        F.expr("CAST(sy AS DOUBLE)/n").alias("mdy"),
        F.expr("CAST(sx AS DOUBLE)/n").alias("mx"),
        F.expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n").alias("vy"),
        F.expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n").alias("cxy"),
    )
    return fit.select(
        F.col("n").alias("n_obs"),
        F.expr("ROUND(g, 6)").alias("gamma"),
        F.expr(
            "ROUND(g/SQRT(((vy - g*cxy)/(n - 2))/vx), 4)"
        ).alias("df_stat"),
        F.expr(
            "CAST(g/SQRT(((vy - g*cxy)/(n - 2))/vx) < -2.86 AS INT)"
        ).alias("stationary_5pct"),
    )


EXT_DICKEY_FULLER_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pairs AS (
  SELECT y - LAG(y) OVER (ORDER BY day) AS dy,
         LAG(y) OVER (ORDER BY day) AS y_lag
  FROM daily
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y_lag) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(y_lag*y_lag) AS BIGINT) AS sxx,
         CAST(SUM(dy*dy) AS BIGINT) AS syy,
         CAST(SUM(y_lag*dy) AS BIGINT) AS sxy
  FROM pairs WHERE y_lag IS NOT NULL
),
fit AS (
  SELECT n,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n AS vx,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)
           /(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n) AS g,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n AS vy,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n AS cxy
  FROM m
)
SELECT n AS n_obs,
       ROUND(g, 6) AS gamma,
       ROUND(g/SQRT(((vy - g*cxy)/(n - 2))/vx), 4) AS df_stat,
       CAST(g/SQRT(((vy - g*cxy)/(n - 2))/vx) < -2.86 AS INTEGER)
         AS stationary_5pct
FROM fit
"""


EXT_QUERIES.update({"ext_dickey_fuller": ext_dickey_fuller})
EXT_ORACLES.update({"ext_dickey_fuller": EXT_DICKEY_FULLER_SQL})


# --- round-5 wave: segment-migration matrix --------------------------------------


def ext_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix: users are split into
    low/mid/high spend terciles in each half of the window (thresholds
    are exact nearest-rank terciles of FIRST-half spend, applied to
    both halves so movement is real, not threshold drift), plus a
    'none' state for absence — the churn/upsell flow chart every CRM
    review opens with. Thresholds come off the COLLAPSED spend-value
    axis (cumulative counts over distinct values), never a global
    per-user ranking.

    Scale shape: one per-user conditional agg, an O(distinct values)
    threshold sweep, one O(16)-cell matrix agg."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN CAST(ts AS DATE) < DATE'2024-01-16'"
                    " THEN CAST(ROUND(value*100) AS BIGINT) END"
                )
            ).alias("y1"),
            F.sum(
                F.expr(
                    "CASE WHEN CAST(ts AS DATE) >= DATE'2024-01-16'"
                    " THEN CAST(ROUND(value*100) AS BIGINT) END"
                )
            ).alias("y2"),
        )
    )
    vals = (
        users.filter("y1 IS NOT NULL")
        .groupBy("y1")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wv = Window.orderBy("y1").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = vals.withColumn("cc", F.sum("c").over(wv)).withColumn(
        "n", F.sum("c").over(wall)
    )
    t1 = cum.filter("3*cc >= n").agg(F.min("y1").alias("t1"))
    t2 = cum.filter("3*cc >= 2*n").agg(F.min("y1").alias("t2"))
    seg = (
        users.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            F.expr(
                "CASE WHEN y1 IS NULL THEN 'none'"
                " WHEN y1 <= t1 THEN 'low'"
                " WHEN y1 <= t2 THEN 'mid' ELSE 'high' END"
            ).alias("seg_h1"),
            F.expr(
                "CASE WHEN y2 IS NULL THEN 'none'"
                " WHEN y2 <= t1 THEN 'low'"
                " WHEN y2 <= t2 THEN 'mid' ELSE 'high' END"
            ).alias("seg_h2"),
        )
    )
    mat = seg.groupBy("seg_h1", "seg_h2").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        mat.withColumn("tot", F.sum("n_users").over(wall))
        .select(
            "seg_h1",
            "seg_h2",
            "n_users",
            F.expr("ROUND(CAST(n_users AS DOUBLE)/tot, 6)").alias("share"),
        )
        .orderBy("seg_h1", "seg_h2")
    )


EXT_SEGMENT_MIGRATION_SQL = r"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                       THEN CAST(ROUND(value*100) AS BIGINT) END) AS BIGINT) AS y1,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                       THEN CAST(ROUND(value*100) AS BIGINT) END) AS BIGINT) AS y2
  FROM events GROUP BY user_id
),
vals AS (
  SELECT y1, COUNT(*) AS c FROM users WHERE y1 IS NOT NULL GROUP BY y1
),
cum AS (
  SELECT y1,
         SUM(c) OVER (ORDER BY y1
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER () AS n
  FROM vals
),
t1 AS (SELECT MIN(y1) AS t1 FROM cum WHERE 3*cc >= n),
t2 AS (SELECT MIN(y1) AS t2 FROM cum WHERE 3*cc >= 2*n),
seg AS (
  SELECT CASE WHEN y1 IS NULL THEN 'none'
              WHEN y1 <= t1 THEN 'low'
              WHEN y1 <= t2 THEN 'mid' ELSE 'high' END AS seg_h1,
         CASE WHEN y2 IS NULL THEN 'none'
              WHEN y2 <= t1 THEN 'low'
              WHEN y2 <= t2 THEN 'mid' ELSE 'high' END AS seg_h2
  FROM users CROSS JOIN t1 CROSS JOIN t2
),
mat AS (
  SELECT seg_h1, seg_h2, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM seg GROUP BY 1, 2
)
SELECT seg_h1, seg_h2, n_users,
       ROUND(CAST(n_users AS DOUBLE)/SUM(n_users) OVER (), 6) AS share
FROM mat ORDER BY seg_h1, seg_h2
"""


EXT_QUERIES.update({"ext_segment_migration": ext_segment_migration})
EXT_ORACLES.update({"ext_segment_migration": EXT_SEGMENT_MIGRATION_SQL})


# --- round-5 wave: t-closeness privacy audit -------------------------------------


def ext_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness privacy audit completing the anonymity trio (X100
    k-anonymity, X247 l-diversity): for each quasi-identifier class
    (market segment x nation), the normalized 1D earth-mover distance
    between the class's sensitive-attribute distribution (account
    balance in $1000 buckets) and the global one — the worst classes
    leak the most about their members even when k and l look healthy.
    EMD = sum |F_class - F_global| / (B-1) over the ordered bucket
    axis; all counts exact integers, top-5 classes by t.

    Scale shape: one pass to (class, bucket) counts, a broadcast
    bucket-axis fill so every class sees every bucket, per-class
    cumulative windows over the tiny O(classes x buckets) grid."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.expr("CAST(FLOOR(c_acctbal/1000.0) AS BIGINT)").alias("b"),
    )
    cls_bucket = c.groupBy("c_mktsegment", "c_nationkey", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    classes = cls_bucket.select("c_mktsegment", "c_nationkey").distinct()
    buckets = cls_bucket.select("b").distinct()
    glob = c.groupBy("b").agg(F.count(F.lit(1)).alias("gcnt"))
    grid = (
        classes.crossJoin(F.broadcast(buckets))
        .join(cls_bucket, ["c_mktsegment", "c_nationkey", "b"], "left")
        .join(F.broadcast(glob), "b", "left")
        .select(
            "c_mktsegment",
            "c_nationkey",
            "b",
            F.expr("COALESCE(cnt, 0L)").alias("cnt"),
            F.expr("COALESCE(gcnt, 0L)").alias("gcnt"),
        )
    )
    wc = (
        Window.partitionBy("c_mktsegment", "c_nationkey")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wcl = Window.partitionBy("c_mktsegment", "c_nationkey")
    scored = (
        grid.withColumn("ccum", F.sum("cnt").over(wc))
        .withColumn("gcum", F.sum("gcnt").over(wc))
        .withColumn("ctot", F.sum("cnt").over(wcl))
        .withColumn("nb", F.count(F.lit(1)).over(wcl))
        .withColumn("gtot", F.sum("gcnt").over(wcl))
    )
    t = scored.groupBy("c_mktsegment", "c_nationkey").agg(
        F.max("ctot").alias("n_rows"),
        F.expr(
            "ROUND(SUM(ABS(CAST(ccum AS DOUBLE)/ctot"
            " - CAST(gcum AS DOUBLE)/gtot))/(MAX(nb) - 1), 6)"
        ).alias("t_emd"),
    )
    return (
        t.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation"),
            "n_rows",
            "t_emd",
        )
        .orderBy(F.col("t_emd").desc(), "segment", "nation")
        .limit(5)
    )


EXT_T_CLOSENESS_SQL = r"""
WITH c AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(FLOOR(c_acctbal/1000.0) AS BIGINT) AS b
  FROM customer
),
cls_bucket AS (
  SELECT c_mktsegment, c_nationkey, b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3
),
gdist AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS gcnt FROM c GROUP BY 1),
grid AS (
  SELECT cl.c_mktsegment, cl.c_nationkey, bk.b,
         COALESCE(cb.cnt, 0) AS cnt, COALESCE(g.gcnt, 0) AS gcnt
  FROM (SELECT DISTINCT c_mktsegment, c_nationkey FROM cls_bucket) cl
  CROSS JOIN (SELECT DISTINCT b FROM cls_bucket) bk
  LEFT JOIN cls_bucket cb ON cb.c_mktsegment = cl.c_mktsegment
    AND cb.c_nationkey = cl.c_nationkey AND cb.b = bk.b
  LEFT JOIN gdist g ON g.b = bk.b
),
scored AS (
  SELECT c_mktsegment, c_nationkey, b, cnt, gcnt,
         SUM(cnt) OVER wc AS ccum,
         SUM(gcnt) OVER wc AS gcum,
         SUM(cnt) OVER wcl AS ctot,
         COUNT(*) OVER wcl AS nb
  FROM grid
  WINDOW wc AS (PARTITION BY c_mktsegment, c_nationkey ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wcl AS (PARTITION BY c_mktsegment, c_nationkey)
),
gtot_t AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS gtot FROM gdist),
t AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(MAX(ctot) AS BIGINT) AS n_rows,
         ROUND(SUM(ABS(CAST(ccum AS DOUBLE)/ctot
               - CAST(gcum AS DOUBLE)/gtot))/(MAX(nb) - 1), 6) AS t_emd
  FROM scored CROSS JOIN gtot_t
  GROUP BY c_mktsegment, c_nationkey
)
SELECT c_mktsegment AS segment, c_nationkey AS nation, n_rows, t_emd
FROM t ORDER BY t_emd DESC, segment, nation LIMIT 5
"""


EXT_QUERIES.update({"ext_t_closeness": ext_t_closeness})
EXT_ORACLES.update({"ext_t_closeness": EXT_T_CLOSENESS_SQL})
