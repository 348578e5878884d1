"""Declared-query waves: round-5 wave: partial autocorrelation (PACF);
round-5 wave: Cochran's Q; round-5 wave: spectral flatness.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: ACF moments are exact integers off LAG pairs; the
Durbin-Levinson solution is written as explicit determinant ratios with
identical expressions; Cochran's Q reduces to exact BIGINT row/column
totals; flatness combines the 13 periodogram powers on a literal axis.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w38 import *  # noqa: F401,F403


# --- round-5 wave: partial autocorrelation -------------------------------------------


def ext_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily event volume at lags 1-3 via
    the explicit Durbin-Levinson determinant ratios — the AR-order
    selector that distinguishes direct lag influence from influence
    inherited through shorter lags (X241's ACF cannot tell the two
    apart; an AR(1) process shows ACF at every lag but PACF only at
    lag 1). Lag products are exact integers; the determinant
    arithmetic is identical in both engines.

    Scale shape: collapse to O(days) counts, three LAG windows on
    that tiny axis, one scalar moment agg."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("day")
    lagged = (
        daily.withColumn("c1", F.lag("c", 1).over(w))
        .withColumn("c2", F.lag("c", 2).over(w))
        .withColumn("c3", F.lag("c", 3).over(w))
    )
    mu = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(c) AS DOUBLE)/COUNT(*)").alias("mu"),
    )
    cent = lagged.crossJoin(F.broadcast(mu)).agg(
        F.max("n").alias("n_days"),
        F.sum(F.expr("(c - mu)*(c - mu)")).alias("ss"),
        F.sum(
            F.expr("CASE WHEN c1 IS NOT NULL THEN (c - mu)*(c1 - mu) ELSE 0 END")
        ).alias("a1"),
        F.sum(
            F.expr("CASE WHEN c2 IS NOT NULL THEN (c - mu)*(c2 - mu) ELSE 0 END")
        ).alias("a2"),
        F.sum(
            F.expr("CASE WHEN c3 IS NOT NULL THEN (c - mu)*(c3 - mu) ELSE 0 END")
        ).alias("a3"),
    )
    rr = cent.select(
        "n_days",
        F.expr("a1/ss").alias("r1"),
        F.expr("a2/ss").alias("r2"),
        F.expr("a3/ss").alias("r3"),
    )
    return rr.select(
        "n_days",
        F.expr("ROUND(r1, 6)").alias("acf1"),
        F.expr("ROUND(r2, 6)").alias("acf2"),
        F.expr("ROUND(r3, 6)").alias("acf3"),
        F.expr("ROUND(r1, 6)").alias("pacf1"),
        F.expr("ROUND((r2 - r1*r1)/(1.0 - r1*r1), 6)").alias("pacf2"),
        F.expr(
            "ROUND("
            "(1.0*(1.0*r3 - r2*r1) - r1*(r1*r3 - r2*r2) + r1*(r1*r1 - 1.0*r2))"
            "/(1.0*(1.0 - r1*r1) - r1*(r1 - r1*r2) + r2*(r1*r1 - r2)), 6)"
        ).alias("pacf3"),
    )


EXT_PACF_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
lagged AS (
  SELECT c,
         LAG(c, 1) OVER (ORDER BY day) AS c1,
         LAG(c, 2) OVER (ORDER BY day) AS c2,
         LAG(c, 3) OVER (ORDER BY day) AS c3
  FROM daily
),
mu AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS DOUBLE)/COUNT(*) AS mu
  FROM lagged
),
cent AS (
  SELECT MAX(n) AS n_days,
         SUM((c - mu)*(c - mu)) AS ss,
         SUM(CASE WHEN c1 IS NOT NULL THEN (c - mu)*(c1 - mu) ELSE 0 END) AS a1,
         SUM(CASE WHEN c2 IS NOT NULL THEN (c - mu)*(c2 - mu) ELSE 0 END) AS a2,
         SUM(CASE WHEN c3 IS NOT NULL THEN (c - mu)*(c3 - mu) ELSE 0 END) AS a3
  FROM lagged CROSS JOIN mu
),
rr AS (
  SELECT n_days, a1/ss AS r1, a2/ss AS r2, a3/ss AS r3 FROM cent
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       ROUND(r1, 6) AS acf1,
       ROUND(r2, 6) AS acf2,
       ROUND(r3, 6) AS acf3,
       ROUND(r1, 6) AS pacf1,
       ROUND((r2 - r1*r1)/(1.0 - r1*r1), 6) AS pacf2,
       ROUND(
         (1.0*(1.0*r3 - r2*r1) - r1*(r1*r3 - r2*r2) + r1*(r1*r1 - 1.0*r2))
         /(1.0*(1.0 - r1*r1) - r1*(r1 - r1*r2) + r2*(r1*r1 - r2)), 6)
         AS pacf3
FROM rr
"""


EXT_QUERIES.update({"ext_pacf": ext_pacf})
EXT_ORACLES.update({"ext_pacf": EXT_PACF_SQL})


# --- round-5 wave: Cochran's Q -------------------------------------------------------


def ext_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across the five binary 'did the user ever do type j'
    indicators: are the five engagement rates homogeneous within the
    same user panel? Generalizes X293's McNemar from 2 matched
    proportions to k = 5; Q = (k-1)[k*sum(C_j^2) - (sum C_j)^2] /
    [k*sum(R_i) - sum(R_i^2)] from exact BIGINT row and column
    totals, against the chi-square(4) 5% critical value 9.488 as a
    documented literal.

    Scale shape: one per-user flag pass, exact scalar moments, O(1)
    arithmetic."""
    items = ["click", "view", "purchase", "signup", "error"]
    flags = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            *[
                F.max(F.expr(f"CAST(event_type = '{it}' AS LONG)")).alias(
                    f"x_{it}"
                )
                for it in items
            ]
        )
        .withColumn("r", F.expr("+".join(f"x_{it}" for it in items)))
    )
    m = flags.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"x_{it}").alias(f"c_{it}") for it in items],
        F.sum("r").alias("sr"),
        F.sum(F.expr("r*r")).alias("srr"),
    )
    csq = " + ".join(f"CAST(c_{it} AS DOUBLE)*c_{it}" for it in items)
    return m.select(
        F.col("n").alias("n_users"),
        F.lit(5).alias("k_types"),
        F.expr(
            f"CASE WHEN 5*sr <> srr THEN"
            f" ROUND(4.0*(5.0*({csq}) - CAST(sr AS DOUBLE)*sr)"
            "/(5.0*sr - CAST(srr AS DOUBLE)), 4) END"
        ).alias("cochran_q"),
        F.expr(
            f"CASE WHEN 5*sr <> srr THEN"
            f" CAST(4.0*(5.0*({csq}) - CAST(sr AS DOUBLE)*sr)"
            "/(5.0*sr - CAST(srr AS DOUBLE)) > 9.488 AS INT) END"
        ).alias("heterogeneous_5pct"),
    )


def _cochran_sql() -> str:
    items = ["click", "view", "purchase", "signup", "error"]
    flg = ",\n         ".join(
        f"CAST(MAX(CAST(event_type = '{it}' AS BIGINT)) AS BIGINT) AS x_{it}"
        for it in items
    )
    rexpr = " + ".join(f"x_{it}" for it in items)
    csums = ",\n         ".join(
        f"CAST(SUM(x_{it}) AS BIGINT) AS c_{it}" for it in items
    )
    csq = " + ".join(f"CAST(c_{it} AS DOUBLE)*c_{it}" for it in items)
    return f"""
WITH flags AS (
  SELECT user_id,
         {flg}
  FROM events GROUP BY user_id
),
with_r AS (SELECT *, {rexpr} AS r FROM flags),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {csums},
         CAST(SUM(r) AS BIGINT) AS sr,
         CAST(SUM(r*r) AS BIGINT) AS srr
  FROM with_r
)
SELECT n AS n_users, 5 AS k_types,
       CASE WHEN 5*sr <> srr THEN
         ROUND(4.0*(5.0*({csq}) - CAST(sr AS DOUBLE)*sr)
               /(5.0*sr - CAST(srr AS DOUBLE)), 4) END AS cochran_q,
       CASE WHEN 5*sr <> srr THEN
         CAST(4.0*(5.0*({csq}) - CAST(sr AS DOUBLE)*sr)
              /(5.0*sr - CAST(srr AS DOUBLE)) > 9.488 AS INTEGER) END
         AS heterogeneous_5pct
FROM m
"""


EXT_QUERIES.update({"ext_cochran_q": ext_cochran_q})
EXT_ORACLES.update({"ext_cochran_q": _cochran_sql()})


# --- round-5 wave: spectral flatness -------------------------------------------------


def ext_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral flatness (Wiener entropy) of the daily-volume
    periodogram at periods 2-14: geometric over arithmetic mean of the
    DFT powers — near 1 the series is spectrally white (no usable
    cycle), near 0 one period dominates; the single-number summary of
    X400's spectrum that belongs on a data-health dashboard, plus the
    dominant period's power share. Same exact integer day counts and
    identical trig expressions as the periodogram.

    Scale shape: O(days) collapse, the tiny days x periods grid, one
    O(13) combine."""
    days = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr("DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01')").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = days.agg(F.count(F.lit(1)).alias("nd"), F.sum("c").alias("sc"))
    grid = days.crossJoin(F.broadcast(stats)).select(
        "d",
        F.expr("CAST(c AS DOUBLE) - CAST(sc AS DOUBLE)/nd").alias("cc"),
        F.explode(F.expr("sequence(2, 14)")).alias("period"),
    )
    spec = grid.groupBy("period").agg(
        F.expr(
            "POW(SUM(cc*COS(2*PI()*d/period)), 2)"
            " + POW(SUM(cc*SIN(2*PI()*d/period)), 2)"
        ).alias("p")
    )
    return spec.agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.expr("ROUND(EXP(AVG(LN(p)))/AVG(p), 6)").alias("spectral_flatness"),
        F.expr("ROUND(MAX(p)/SUM(p), 6)").alias("peak_power_share"),
    )


EXT_SPECTRAL_FLATNESS_SQL = r"""
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
         POW(SUM(cc*COS(2*PI()*d/period)), 2)
           + POW(SUM(cc*SIN(2*PI()*d/period)), 2) AS p
  FROM grid GROUP BY period
)
SELECT COUNT(*) AS n_periods,
       ROUND(EXP(AVG(LN(p)))/AVG(p), 6) AS spectral_flatness,
       ROUND(MAX(p)/SUM(p), 6) AS peak_power_share
FROM spec
"""


EXT_QUERIES.update({"ext_spectral_flatness": ext_spectral_flatness})
EXT_ORACLES.update({"ext_spectral_flatness": EXT_SPECTRAL_FLATNESS_SQL})
