"""Declared-query waves: round-5 wave: nearest-neighbor caliper matching
(ATT estimator); round-5 wave: split-conformal prediction intervals;
round-5 wave: PPS (probability-proportional-to-size) systematic sample.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: matching runs on exact integer covariates with explicit
prev/next tie rules; conformal quantiles are nearest-rank integers;
the PPS selection is exact integer cumulative arithmetic.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w21 import *  # noqa: F401,F403


# --- round-5 wave: nearest-neighbor caliper matching --------------------------


def ext_caliper_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor caliper matching ATT: md5-assigned treated users
    match to the control stratum with the CLOSEST activity level
    (event-count covariate, caliper 3, ties to the lower value), and
    the treatment effect on spend averages the treated-minus-matched-
    control-mean differences — the covariate-balance estimator
    completing the causal family (stratified/IPS/CUPED/DiD/RD). Exact:
    integer covariates, prev/next control values via two windows over
    the collapsed value axis, control stratum means from integer-cent
    sums, the final ATT a decimal-rounded mean.

    Scale shape: per-user agg, then ALL matching runs on the collapsed
    O(distinct covariate values) axis — never user-by-user search."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("a"),
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("yc"),
        )
        .select(
            "user_id",
            "a",
            "yc",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 2"
            ).alias("treat"),
        )
    )
    ctrl_vals = (
        users.filter(F.col("treat") == 0)
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("cn"), F.sum("yc").alias("cs"))
    )
    # collapsed axis: all covariate values seen anywhere, with prev/next
    # CONTROL value attached by two running extremes
    axis = (
        users.select("a")
        .distinct()
        .join(ctrl_vals.select(F.col("a"), F.lit(1).alias("is_ctrl")), "a", "left")
    )
    wprev = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy(F.col("a").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = axis.select(
        "a",
        F.max(F.expr("CASE WHEN is_ctrl = 1 THEN a END")).over(wprev).alias("prev_c"),
        F.min(F.expr("CASE WHEN is_ctrl = 1 THEN a END")).over(wnext).alias("next_c"),
    )
    nearest = marked.select(
        "a",
        F.expr(
            "CASE"
            " WHEN prev_c IS NULL THEN next_c"
            " WHEN next_c IS NULL THEN prev_c"
            " WHEN a - prev_c <= next_c - a THEN prev_c"
            " ELSE next_c END"
        ).alias("m"),
    ).filter(F.expr("m IS NOT NULL AND ABS(a - m) <= 3"))
    matched = (
        users.filter(F.col("treat") == 1)
        .join(nearest, "a")
        .join(
            ctrl_vals.select(F.col("a").alias("m"), "cn", "cs"), "m"
        )
        .select(
            F.expr("CAST(yc AS DOUBLE)/1e2 - CAST(cs AS DOUBLE)/cn/1e2").alias("d")
        )
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_matched_treated"),
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(d, 6) AS DECIMAL(28,6))) AS DOUBLE)"
            "/COUNT(*), 4)"
        ).alias("att_spend"),
    )


EXT_CALIPER_MATCHING_SQL = r"""
WITH users AS (
  SELECT user_id, COUNT(*) AS a,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS yc,
         CAST(('0x' || SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2 AS BIGINT) AS treat
  FROM events GROUP BY user_id
),
ctrl_vals AS (
  SELECT a, COUNT(*) AS cn, CAST(SUM(yc) AS BIGINT) AS cs
  FROM users WHERE treat = 0 GROUP BY a
),
axis AS (
  SELECT u.a, CASE WHEN c.a IS NOT NULL THEN 1 END AS is_ctrl
  FROM (SELECT DISTINCT a FROM users) u
  LEFT JOIN (SELECT DISTINCT a FROM ctrl_vals) c ON u.a = c.a
),
marked AS (
  SELECT a,
         MAX(CASE WHEN is_ctrl = 1 THEN a END) OVER (
           ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
         MIN(CASE WHEN is_ctrl = 1 THEN a END) OVER (
           ORDER BY a DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_c
  FROM axis
),
nearest AS (
  SELECT a, m FROM (
    SELECT a,
           CASE WHEN prev_c IS NULL THEN next_c
                WHEN next_c IS NULL THEN prev_c
                WHEN a - prev_c <= next_c - a THEN prev_c
                ELSE next_c END AS m
    FROM marked
  ) WHERE m IS NOT NULL AND ABS(a - m) <= 3
),
matched AS (
  SELECT CAST(u.yc AS DOUBLE)/1e2 - CAST(c.cs AS DOUBLE)/c.cn/1e2 AS d
  FROM users u
  JOIN nearest n ON u.a = n.a
  JOIN ctrl_vals c ON c.a = n.m
  WHERE u.treat = 1
)
SELECT COUNT(*) AS n_matched_treated,
       ROUND(CAST(SUM(CAST(ROUND(d, 6) AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), 4) AS att_spend
FROM matched
"""


EXT_QUERIES.update({"ext_caliper_matching": ext_caliper_matching})
EXT_ORACLES.update({"ext_caliper_matching": EXT_CALIPER_MATCHING_SQL})


# --- round-5 wave: split-conformal prediction interval ------------------------


def ext_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for daily revenue: the mean
    model fits on the first 15 days, the conformal quantile is the
    exact nearest-rank ceil(0.9*(n+1))-th absolute calibration residual,
    and the audit reports the interval's EMPIRICAL coverage on the held-
    out last 15 days — the distribution-free uncertainty wrapper that
    needs no normality anywhere. Residuals are exact integer cents;
    the quantile is an integer order statistic; coverage is a count.

    Scale shape: one day hash agg; ranking on the O(days) axis."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("c"))
    )
    cal = daily.filter(F.col("t") < 15)
    mu = cal.agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("n")
    )
    resid = cal.join(F.broadcast(mu)).select(
        F.expr("ABS(c*n - s)").alias("rn")  # |c - s/n| * n, exact integer
    )
    w = Window.orderBy(F.col("rn").asc())
    q = (
        resid.select("rn", F.row_number().over(w).alias("rk"))
        .join(F.broadcast(mu.select("n")))
        .filter(F.expr("10*rk >= 9*(n + 1)"))
        .agg(F.min("rn").alias("qn"))
    )
    test = daily.filter(F.col("t") >= 15).join(F.broadcast(mu)).join(
        F.broadcast(q)
    )
    return test.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.expr("ROUND(MAX(CAST(s AS DOUBLE)/n/1e2), 2)").alias("point_forecast"),
        F.expr("ROUND(MAX(CAST(qn AS DOUBLE)/n/1e2), 2)").alias("interval_half_width"),
        F.expr(
            "CAST(SUM(CAST(ABS(c*n - s) <= qn AS LONG)) AS BIGINT)"
        ).alias("n_covered"),
        F.expr(
            "ROUND(CAST(SUM(CAST(ABS(c*n - s) <= qn AS LONG)) AS DOUBLE)"
            "/COUNT(*), 6)"
        ).alias("empirical_coverage"),
    )


EXT_CONFORMAL_INTERVAL_SQL = r"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
mu AS (SELECT CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS n FROM daily WHERE t < 15),
resid AS (
  SELECT ABS(c*n - s) AS rn FROM daily CROSS JOIN mu WHERE t < 15
),
q AS (
  SELECT MIN(rn) AS qn FROM (
    SELECT rn, ROW_NUMBER() OVER (ORDER BY rn ASC) AS rk FROM resid
  ) CROSS JOIN mu WHERE 10*rk >= 9*(n + 1)
)
SELECT COUNT(*) AS n_test,
       ROUND(MAX(CAST(s AS DOUBLE)/n/1e2), 2) AS point_forecast,
       ROUND(MAX(CAST(qn AS DOUBLE)/n/1e2), 2) AS interval_half_width,
       CAST(SUM(CAST(ABS(c*n - s) <= qn AS BIGINT)) AS BIGINT) AS n_covered,
       ROUND(CAST(SUM(CAST(ABS(c*n - s) <= qn AS BIGINT)) AS DOUBLE)/COUNT(*), 6) AS empirical_coverage
FROM daily CROSS JOIN mu CROSS JOIN q WHERE t >= 15
"""


EXT_QUERIES.update({"ext_conformal_interval": ext_conformal_interval})
EXT_ORACLES.update({"ext_conformal_interval": EXT_CONFORMAL_INTERVAL_SQL})


# --- round-5 wave: PPS systematic sample --------------------------------------


def ext_pps_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sample of 20
    customers by revenue: walk the cumulative revenue axis in customer-
    key order and select every customer whose interval [cum-rev, cum)
    contains a selection point k*step (step = total/20, offset step/2)
    — big customers are certain selections, small ones enter with
    probability proportional to spend. The selection count per customer
    is floor((40*cr/tr - 1)/2) - floor over the interval start: both
    engines evaluate the IDENTICAL float expression, so the floors
    agree bit-for-bit. The audit ships sampled keys + each one's
    expected inclusion count (revenue share x 20).

    Scale shape: one revenue agg + one cumulative window over the
    O(customers) aggregated axis."""
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias("r")
        )
    )
    w = Window.orderBy("o_custkey").rowsBetween(Window.unboundedPreceding, 0)
    cum = rev.select(
        "o_custkey", "r", F.sum("r").over(w).alias("cr")
    )
    tot = rev.agg(F.sum("r").alias("tr"), F.count(F.lit(1)).alias("nc"))
    # selection points: (k + 1/2)*tr/20 for k=0..19; customer selected iff
    # its interval (cr - r, cr] contains one -> count of k with
    # (2k+1)*tr <= 40*cr and (2k+1)*tr > 40*(cr - r)
    sel = (
        cum.join(F.broadcast(tot))
        .select(
            "o_custkey",
            "r",
            "tr",
            F.expr(
                "CAST(FLOOR((40e0*cr/tr - 1)/2) - FLOOR((40e0*(cr - r)/tr - 1)/2)"
                " AS BIGINT)"
            ).alias("n_points"),
        )
        .filter(F.col("n_points") >= 1)
    )
    return sel.select(
        "o_custkey",
        F.expr("ROUND(r/1e2, 2)").alias("revenue"),
        "n_points",
        F.expr("ROUND(CAST(r AS DOUBLE)*20/tr, 6)").alias("expected_inclusions"),
    ).orderBy("o_custkey")


EXT_PPS_SAMPLING_SQL = r"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY o_custkey
),
cum AS (
  SELECT o_custkey, r,
         CAST(SUM(r) OVER (ORDER BY o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr
  FROM rev
),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS tr, COUNT(*) AS nc FROM rev),
sel AS (
  SELECT o_custkey, r, tr,
         CAST(FLOOR((40e0*cr/tr - 1)/2) - FLOOR((40e0*(cr - r)/tr - 1)/2) AS BIGINT) AS n_points
  FROM cum CROSS JOIN tot
)
SELECT o_custkey, ROUND(r/1e2, 2) AS revenue, n_points,
       ROUND(CAST(r AS DOUBLE)*20/tr, 6) AS expected_inclusions
FROM sel WHERE n_points >= 1 ORDER BY o_custkey
"""


EXT_QUERIES.update({"ext_pps_sampling": ext_pps_sampling})
EXT_ORACLES.update({"ext_pps_sampling": EXT_PPS_SAMPLING_SQL})
