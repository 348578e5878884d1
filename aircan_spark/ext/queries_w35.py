"""Declared-query waves: round-5 wave: slope-heterogeneity (moderation)
test; round-5 wave: jackknife SE of a ratio metric; round-5 wave:
two-changepoint binary segmentation.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: per-arm regressions reduce to exact BIGINT moments; the
leave-one-day-out replicates are closed forms of exact cluster sums;
segmentation SSEs come from exact prefix sums with explicit argmin
tie-breaks.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w34 import *  # noqa: F401,F403


# --- round-5 wave: slope-heterogeneity (moderation) test ----------------------------


def ext_slope_heterogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moderation test: does the md5 arm CHANGE the spend-per-click
    slope (not just the mean)? Separate per-arm OLS fits of user spend
    on click count from exact BIGINT moments, the slope difference,
    and its z statistic from the standard per-slope variances — the
    interaction-effect readout X212's mean test cannot see.

    Scale shape: one per-user pass, one O(2)-arm moment agg, O(1)
    arithmetic."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("x"),
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("y"),
        )
        .select(
            "x",
            "y",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 2"
            ).alias("arm"),
        )
    )
    m = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x*x")).alias("sxx"),
        # DECIMAL moment: per-user cent totals are SF-invariant (~3.3e5)
        # but users scale with SF, so int64 SUM(y*y) (~1.7e14 at sf0.1
        # per arm x 10000 = 1.7e18 at sf1000) clears 2^63 only 5.4x past
        # the design point — under the 10x headroom bar (r9 margin audit)
        F.sum(F.expr("CAST(y AS DECIMAL(19,0))*CAST(y AS DECIMAL(19,0))")).alias("syy"),
        F.sum(F.expr("x*y")).alias("sxy"),
    )
    fit = m.select(
        "arm",
        "n",
        F.expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n").alias("vx"),
        F.expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n").alias("vy"),
        F.expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n").alias("cxy"),
    ).select(
        "arm",
        "n",
        F.expr("cxy/vx").alias("b"),
        F.expr("((vy - cxy*cxy/vx)/(n - 2))/vx").alias("se2"),
    )
    a0 = fit.filter("arm = 0").select(
        F.col("n").alias("n0"), F.col("b").alias("b0"), F.col("se2").alias("v0")
    )
    a1 = fit.filter("arm = 1").select(
        F.col("n").alias("n1"), F.col("b").alias("b1"), F.col("se2").alias("v1")
    )
    return a0.crossJoin(F.broadcast(a1)).select(
        "n0",
        "n1",
        F.expr("ROUND(b0/1e2, 6)").alias("slope_arm0"),
        F.expr("ROUND(b1/1e2, 6)").alias("slope_arm1"),
        F.expr("ROUND((b1 - b0)/1e2, 6)").alias("slope_diff"),
        F.expr("ROUND((b1 - b0)/SQRT(v0 + v1), 4)").alias("z_interaction"),
    )


EXT_SLOPE_HETEROGENEITY_SQL = r"""
WITH users AS (
  SELECT CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS y,
         CAST(('0x' || SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2
              AS BIGINT) AS arm
  FROM events GROUP BY user_id
),
m AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx,
         SUM(CAST(y AS HUGEINT)*CAST(y AS HUGEINT)) AS syy,
         CAST(SUM(x*y) AS BIGINT) AS sxy
  FROM users GROUP BY arm
),
fit AS (
  SELECT arm, n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)
           /(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n) AS b,
         (((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n)
           - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)
             *(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n)
             /(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n))/(n - 2))
           /(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n) AS se2
  FROM m
)
SELECT a0.n AS n0, a1.n AS n1,
       ROUND(a0.b/1e2, 6) AS slope_arm0,
       ROUND(a1.b/1e2, 6) AS slope_arm1,
       ROUND((a1.b - a0.b)/1e2, 6) AS slope_diff,
       ROUND((a1.b - a0.b)/SQRT(a0.se2 + a1.se2), 4) AS z_interaction
FROM (SELECT * FROM fit WHERE arm = 0) a0
CROSS JOIN (SELECT * FROM fit WHERE arm = 1) a1
"""


EXT_QUERIES.update({"ext_slope_heterogeneity": ext_slope_heterogeneity})
EXT_ORACLES.update({"ext_slope_heterogeneity": EXT_SLOPE_HETEROGENEITY_SQL})


# --- round-5 wave: jackknife SE of a ratio metric -----------------------------------


def ext_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-cluster jackknife for the ratio metric revenue-per-
    event, with DAYS as clusters: each replicate is the closed form
    (S - s_i)/(N - n_i) of exact cluster sums, and the jackknife SE is
    compared against the naive iid standard error — their squared
    ratio is the design effect the day clustering induces, the honest
    error bar for any 'per-event' KPI (the ratio-metric problem every
    experimentation platform hits).

    Scale shape: one pass to O(days) exact sums + one scalar moment
    row; replicates are arithmetic on the day axis."""
    days = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("ni"),
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("si"),
        )
    )
    tot = _t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("N"),
        F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("S"),
        F.sum(
            F.expr(
                "CAST(ROUND(value*100) AS BIGINT)*CAST(ROUND(value*100) AS BIGINT)"
            )
        ).alias("Q"),
    )
    reps = days.crossJoin(F.broadcast(tot)).select(
        "N",
        "S",
        "Q",
        F.expr(
            "(CAST(S AS DOUBLE) - si)/(CAST(N AS DOUBLE) - ni)"
        ).alias("r_i"),
    )
    m = reps.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("N").alias("N"),
        F.max("S").alias("S"),
        F.max("Q").alias("Q"),
        F.sum("r_i").alias("sr"),
        F.sum(F.expr("r_i*r_i")).alias("srr"),
    )
    return m.select(
        "n_days",
        F.expr("ROUND(CAST(S AS DOUBLE)/N/1e2, 6)").alias("revenue_per_event"),
        F.expr(
            "ROUND(SQRT((n_days - 1.0)/n_days*(srr - sr*sr/n_days))/1e2, 6)"
        ).alias("se_jackknife"),
        F.expr(
            "ROUND(SQRT((CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/N)/(N - 1)/N)"
            "/1e2, 6)"
        ).alias("se_naive"),
        F.expr(
            "ROUND(((n_days - 1.0)/n_days*(srr - sr*sr/n_days))"
            "/((CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/N)/(N - 1)/N), 4)"
        ).alias("design_effect"),
    )


EXT_JACKKNIFE_RATIO_SE_SQL = r"""
WITH days AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS ni,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS si
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS N,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS S,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)
                  *CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS Q
  FROM events
),
reps AS (
  SELECT N, S, Q,
         (CAST(S AS DOUBLE) - si)/(CAST(N AS DOUBLE) - ni) AS r_i
  FROM days CROSS JOIN tot
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         MAX(N) AS N, MAX(S) AS S, MAX(Q) AS Q,
         SUM(r_i) AS sr, SUM(r_i*r_i) AS srr
  FROM reps
)
SELECT n_days,
       ROUND(CAST(S AS DOUBLE)/N/1e2, 6) AS revenue_per_event,
       ROUND(SQRT((n_days - 1.0)/n_days*(srr - sr*sr/n_days))/1e2, 6)
         AS se_jackknife,
       ROUND(SQRT((CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/N)/(N - 1)/N)/1e2, 6)
         AS se_naive,
       ROUND(((n_days - 1.0)/n_days*(srr - sr*sr/n_days))
             /((CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/N)/(N - 1)/N), 4)
         AS design_effect
FROM m
"""


EXT_QUERIES.update({"ext_jackknife_ratio_se": ext_jackknife_ratio_se})
EXT_ORACLES.update({"ext_jackknife_ratio_se": EXT_JACKKNIFE_RATIO_SE_SQL})


# --- round-5 wave: two-changepoint binary segmentation -------------------------------


def ext_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary segmentation with two changepoints on daily revenue:
    greedily place the split that minimizes total within-segment SSE,
    then the second split conditional on the first — the standard
    multiple-changepoint extension of X183's single CUSUM point. All
    SSEs come from exact integer prefix sums; every argmin breaks
    ties toward the earlier day. The day series is FLOOR-rescaled to
    $100 units (identical integer division both engines) so squared
    daily totals stay inside int64 at any scale factor.

    Scale shape: collapse to O(days) with prefix-sum windows; both
    argmin sweeps and the final refit run on that tiny axis."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) DIV 10000 AS BIGINT)"
            ).alias("y")
        )
    )
    wd = Window.orderBy("day")
    wc = wd.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    pre = (
        daily.withColumn("t", F.row_number().over(wd))
        .withColumn("cs", F.sum("y").over(wc))
        .withColumn("cq", F.sum(F.expr("y*y")).over(wc))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("S", F.sum("y").over(wall))
        .withColumn("Q", F.sum(F.expr("y*y")).over(wall))
    )
    sse = pre.filter("t < n").select(
        "day",
        "t",
        "n",
        "S",
        "Q",
        F.expr(
            "(CAST(cq AS DOUBLE) - CAST(cs AS DOUBLE)*cs/t)"
            " + (CAST(Q - cq AS DOUBLE)"
            "    - CAST(S - cs AS DOUBLE)*(S - cs)/(n - t))"
        ).alias("sse1"),
    )
    cp1 = sse.orderBy("sse1", "t").limit(1).select(
        F.col("day").alias("cp1_day"),
        F.col("t").alias("k"),
        "sse1",
    )
    # second sweep: j splits either [1..k] or [k+1..n]
    j2 = pre.crossJoin(F.broadcast(cp1)).filter("t < n AND t <> k")
    kp = pre.crossJoin(F.broadcast(cp1.select("k"))).filter("t = k").select(
        F.col("cs").alias("cs_k"), F.col("cq").alias("cq_k"), F.col("t").alias("kk")
    )
    sse2 = (
        j2.crossJoin(F.broadcast(kp))
        .select(
            "day",
            "t",
            "n",
            "S",
            "Q",
            "k",
            "cs",
            "cq",
            "cs_k",
            "cq_k",
            F.expr(
                "CASE WHEN t < k THEN"
                " (CAST(cq AS DOUBLE) - CAST(cs AS DOUBLE)*cs/t)"
                " + (CAST(cq_k - cq AS DOUBLE)"
                "    - CAST(cs_k - cs AS DOUBLE)*(cs_k - cs)/(k - t))"
                " + (CAST(Q - cq_k AS DOUBLE)"
                "    - CAST(S - cs_k AS DOUBLE)*(S - cs_k)/(n - k))"
                " ELSE"
                " (CAST(cq_k AS DOUBLE) - CAST(cs_k AS DOUBLE)*cs_k/k)"
                " + (CAST(cq - cq_k AS DOUBLE)"
                "    - CAST(cs - cs_k AS DOUBLE)*(cs - cs_k)/(t - k))"
                " + (CAST(Q - cq AS DOUBLE)"
                "    - CAST(S - cs AS DOUBLE)*(S - cs)/(n - t))"
                " END"
            ).alias("sse2"),
        )
    )
    best2 = sse2.orderBy("sse2", "t").limit(1)
    return best2.select(
        F.col("n").alias("n_days"),
        F.expr("CAST(LEAST(k, t) AS INT)").alias("cp1_t"),
        F.expr("CAST(GREATEST(k, t) AS INT)").alias("cp2_t"),
        F.expr(
            "ROUND(CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/n, 2)"
        ).alias("sse_none"),
        F.expr("ROUND(sse2, 2)").alias("sse_two_splits"),
        F.expr(
            "ROUND(1.0 - sse2/(CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/n), 6)"
        ).alias("var_explained"),
    )


EXT_BINARY_SEGMENTATION_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) // 10000 AS BIGINT) AS y
  FROM events GROUP BY 1
),
pre AS (
  SELECT day, y,
         ROW_NUMBER() OVER (ORDER BY day) AS t,
         SUM(y) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         SUM(y*y) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq,
         COUNT(*) OVER () AS n,
         SUM(y) OVER () AS S,
         SUM(y*y) OVER () AS Q
  FROM daily
),
sse AS (
  SELECT day, t, n, S, Q,
         (CAST(cq AS DOUBLE) - CAST(cs AS DOUBLE)*cs/t)
         + (CAST(Q - cq AS DOUBLE)
            - CAST(S - cs AS DOUBLE)*(S - cs)/(n - t)) AS sse1
  FROM pre WHERE t < n
),
cp1 AS (SELECT t AS k FROM sse ORDER BY sse1, t LIMIT 1),
kp AS (
  SELECT p.cs AS cs_k, p.cq AS cq_k, c.k
  FROM pre p CROSS JOIN cp1 c WHERE p.t = c.k
),
sse2 AS (
  SELECT p.t, p.n, p.S, p.Q, kp.k,
         CASE WHEN p.t < kp.k THEN
           (CAST(p.cq AS DOUBLE) - CAST(p.cs AS DOUBLE)*p.cs/p.t)
           + (CAST(kp.cq_k - p.cq AS DOUBLE)
              - CAST(kp.cs_k - p.cs AS DOUBLE)*(kp.cs_k - p.cs)/(kp.k - p.t))
           + (CAST(p.Q - kp.cq_k AS DOUBLE)
              - CAST(p.S - kp.cs_k AS DOUBLE)*(p.S - kp.cs_k)/(p.n - kp.k))
         ELSE
           (CAST(kp.cq_k AS DOUBLE) - CAST(kp.cs_k AS DOUBLE)*kp.cs_k/kp.k)
           + (CAST(p.cq - kp.cq_k AS DOUBLE)
              - CAST(p.cs - kp.cs_k AS DOUBLE)*(p.cs - kp.cs_k)/(p.t - kp.k))
           + (CAST(p.Q - p.cq AS DOUBLE)
              - CAST(p.S - p.cs AS DOUBLE)*(p.S - p.cs)/(p.n - p.t))
         END AS sse2
  FROM pre p CROSS JOIN kp WHERE p.t < p.n AND p.t <> kp.k
),
best2 AS (SELECT * FROM sse2 ORDER BY sse2, t LIMIT 1)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(LEAST(k, t) AS INTEGER) AS cp1_t,
       CAST(GREATEST(k, t) AS INTEGER) AS cp2_t,
       ROUND(CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/n, 2) AS sse_none,
       ROUND(sse2, 2) AS sse_two_splits,
       ROUND(1.0 - sse2/(CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/n), 6)
         AS var_explained
FROM best2
"""


EXT_QUERIES.update({"ext_binary_segmentation": ext_binary_segmentation})
EXT_ORACLES.update({"ext_binary_segmentation": EXT_BINARY_SEGMENTATION_SQL})
