"""Declared-query waves: round-5 wave: VaR/CVaR of daily revenue
changes; round-5 wave: zero-inflation (Poisson vs negative-binomial)
audit; round-5 wave: E-value sensitivity analysis.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: revenue diffs are exact integer cents with nearest-rank
tail statistics on the tiny day axis; count-model fits reduce to exact
BIGINT moments; the E-value is a closed form of exact count ratios.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w31 import *  # noqa: F401,F403


# --- round-5 wave: VaR / CVaR of daily revenue changes ----------------------------


def ext_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-risk and conditional VaR of day-over-day revenue
    changes: the exact nearest-rank 5th-percentile drop (VaR95) and
    the mean of changes at or below it (CVaR95 — the tail average VaR
    famously hides), plus the single worst day. Revenue and its diffs
    are exact integer cents; the tail statistics run on the O(days)
    axis.

    Scale shape: one pass to O(days) exact sums, one LAG window and
    one ranked filter on that tiny axis."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("rev"))
    )
    w = Window.orderBy("day")
    diffs = (
        daily.withColumn("prev", F.lag("rev").over(w))
        .filter("prev IS NOT NULL")
        .select(F.expr("rev - prev").alias("d"))
    )
    wr = Window.orderBy("d")
    wall = Window.partitionBy()
    ranked = diffs.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wall)
    )
    var_row = ranked.filter("20*rk >= n").agg(F.min("d").alias("var_c"))
    tail = diffs.crossJoin(F.broadcast(var_row)).filter("d <= var_c")
    return (
        tail.agg(
            F.count(F.lit(1)).alias("n_tail_days"),
            F.max("var_c").alias("var_c"),
            F.sum("d").alias("tail_sum"),
            F.min("d").alias("worst_c"),
        )
        .crossJoin(
            F.broadcast(diffs.agg(F.count(F.lit(1)).alias("n_days")))
        )
        .select(
            "n_days",
            "n_tail_days",
            F.expr("ROUND(var_c/1e2, 2)").alias("var95"),
            F.expr(
                "ROUND(CAST(tail_sum AS DOUBLE)/n_tail_days/1e2, 4)"
            ).alias("cvar95"),
            F.expr("ROUND(worst_c/1e2, 2)").alias("worst_day_change"),
        )
    )


EXT_VAR_CVAR_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
diffs AS (
  SELECT rev - LAG(rev) OVER (ORDER BY day) AS d FROM daily
  QUALIFY LAG(rev) OVER (ORDER BY day) IS NOT NULL
),
ranked AS (
  SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rk, COUNT(*) OVER () AS n
  FROM diffs
),
var_row AS (SELECT MIN(d) AS var_c FROM ranked WHERE 20*rk >= n),
tail AS (SELECT d, var_c FROM diffs CROSS JOIN var_row WHERE d <= var_c)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM diffs) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_tail_days,
       ROUND(MAX(var_c)/1e2, 2) AS var95,
       ROUND(CAST(SUM(d) AS DOUBLE)/COUNT(*)/1e2, 4) AS cvar95,
       ROUND(MIN(d)/1e2, 2) AS worst_day_change
FROM tail
"""


EXT_QUERIES.update({"ext_var_cvar": ext_var_cvar})
EXT_ORACLES.update({"ext_var_cvar": EXT_VAR_CVAR_SQL})


# --- round-5 wave: zero-inflation audit --------------------------------------------


def ext_zero_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflation audit of per-user purchase counts: the observed
    share of zero-purchase users against what a Poisson fit and a
    method-of-moments negative-binomial fit each predict — the
    distribution check that decides whether 'inactive users' are just
    the Poisson tail or a genuinely separate zero class (and whether
    an NB model suffices before reaching for hurdle models). Counts
    and moments are exact integers; the fits are identical closed
    forms both engines.

    Scale shape: one per-user conditional-count pass, one scalar
    moment agg, O(1) arithmetic."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("k")
        )
    )
    m = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("s1"),
        F.sum(F.expr("k*k")).alias("s2"),
        F.sum(F.expr("CAST(k = 0 AS LONG)")).alias("nz"),
    )
    fit = m.select(
        "n",
        "nz",
        F.expr("CAST(s1 AS DOUBLE)/n").alias("mean"),
        F.expr("(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)/(n - 1)").alias(
            "var"
        ),
    )
    return fit.select(
        F.col("n").alias("n_users"),
        F.expr("ROUND(mean, 6)").alias("mean_purchases"),
        F.expr("ROUND(var, 6)").alias("var_purchases"),
        F.expr("ROUND(CAST(nz AS DOUBLE)/n, 6)").alias("obs_zero_share"),
        F.expr("ROUND(EXP(-mean), 6)").alias("poisson_zero"),
        F.expr(
            "CASE WHEN var > mean THEN"
            " ROUND(POW((mean*mean/(var - mean))"
            "/(mean*mean/(var - mean) + mean), mean*mean/(var - mean)), 6) END"
        ).alias("nb_zero"),
        F.expr(
            "CASE WHEN var > mean THEN ROUND(mean*mean/(var - mean), 4) END"
        ).alias("nb_r"),
    )


EXT_ZERO_INFLATION_SQL = r"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS k
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(k) AS BIGINT) AS s1,
         CAST(SUM(k*k) AS BIGINT) AS s2,
         CAST(SUM(CAST(k = 0 AS BIGINT)) AS BIGINT) AS nz
  FROM users
),
fit AS (
  SELECT n, nz,
         CAST(s1 AS DOUBLE)/n AS mean,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)/(n - 1) AS var
  FROM m
)
SELECT n AS n_users,
       ROUND(mean, 6) AS mean_purchases,
       ROUND(var, 6) AS var_purchases,
       ROUND(CAST(nz AS DOUBLE)/n, 6) AS obs_zero_share,
       ROUND(EXP(-mean), 6) AS poisson_zero,
       CASE WHEN var > mean THEN
         ROUND(POW((mean*mean/(var - mean))
           /(mean*mean/(var - mean) + mean), mean*mean/(var - mean)), 6) END
         AS nb_zero,
       CASE WHEN var > mean THEN ROUND(mean*mean/(var - mean), 4) END AS nb_r
FROM fit
"""


EXT_QUERIES.update({"ext_zero_inflation": ext_zero_inflation})
EXT_ORACLES.update({"ext_zero_inflation": EXT_ZERO_INFLATION_SQL})


# --- round-5 wave: E-value sensitivity analysis -------------------------------------


def ext_evalue_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VanderWeele E-value for the deep-discount effect on large
    shipments (quantity above 25): how strong an unmeasured confounder
    would have to be — on the risk-ratio scale, with both treatment
    and outcome — to fully explain away the observed association.
    E = RR* + sqrt(RR*(RR*-1)) with RR* the risk ratio oriented above
    1; the sensitivity line that closes the causal family (stratified
    / IPS / DR / CUPED / RD / matching / mediation estimators all
    assume no unmeasured confounding — this quantifies the
    assumption's slack). Exact integer counts; identical closed form.

    Scale shape: one scalar conditional-count agg, O(1) arithmetic."""
    m = _t(spark, sf_dir, "lineitem").agg(
        F.sum(F.expr("CAST(l_discount >= 0.05 AS LONG)")).alias("n1"),
        F.sum(
            F.expr("CAST(l_discount >= 0.05 AND l_quantity > 25 AS LONG)")
        ).alias("k1"),
        F.sum(F.expr("CAST(l_discount < 0.05 AS LONG)")).alias("n0"),
        F.sum(
            F.expr("CAST(l_discount < 0.05 AND l_quantity > 25 AS LONG)")
        ).alias("k0"),
    )
    rr = m.select(
        "n1",
        "n0",
        F.expr(
            "(CAST(k1 AS DOUBLE)/n1)/(CAST(k0 AS DOUBLE)/n0)"
        ).alias("rr"),
    ).select(
        "n1",
        "n0",
        "rr",
        F.expr("CASE WHEN rr >= 1.0 THEN rr ELSE 1.0/rr END").alias("rr_star"),
    )
    return rr.select(
        F.expr("n1 + n0").alias("n_rows"),
        F.expr("ROUND(rr, 6)").alias("risk_ratio"),
        F.expr(
            "ROUND(rr_star + SQRT(rr_star*(rr_star - 1.0)), 4)"
        ).alias("e_value"),
    )


EXT_EVALUE_SENSITIVITY_SQL = r"""
WITH m AS (
  SELECT CAST(SUM(CAST(l_discount >= 0.05 AS BIGINT)) AS BIGINT) AS n1,
         CAST(SUM(CAST(l_discount >= 0.05 AND l_quantity > 25 AS BIGINT))
              AS BIGINT) AS k1,
         CAST(SUM(CAST(l_discount < 0.05 AS BIGINT)) AS BIGINT) AS n0,
         CAST(SUM(CAST(l_discount < 0.05 AND l_quantity > 25 AS BIGINT))
              AS BIGINT) AS k0
  FROM lineitem
),
rr AS (
  SELECT n1, n0,
         (CAST(k1 AS DOUBLE)/n1)/(CAST(k0 AS DOUBLE)/n0) AS rr
  FROM m
),
rrs AS (
  SELECT n1, n0, rr,
         CASE WHEN rr >= 1.0 THEN rr ELSE 1.0/rr END AS rr_star
  FROM rr
)
SELECT CAST(n1 + n0 AS BIGINT) AS n_rows,
       ROUND(rr, 6) AS risk_ratio,
       ROUND(rr_star + SQRT(rr_star*(rr_star - 1.0)), 4) AS e_value
FROM rrs
"""


EXT_QUERIES.update({"ext_evalue_sensitivity": ext_evalue_sensitivity})
EXT_ORACLES.update({"ext_evalue_sensitivity": EXT_EVALUE_SENSITIVITY_SQL})
