"""Declared-query waves: round-5 wave: Hoover (Robin Hood) index;
round-5 wave: Atkinson inequality index; round-5 wave: Palma ratio.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: the Hoover numerator uses the exact integer identity
sum|n*y_i - Y| (values FLOOR-rescaled to $100 units so the products
stay inside int64 at any SF); Atkinson's geometric mean runs on
nano-quantized logs; Palma thresholds are exact nearest-rank values
off the collapsed revenue axis.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w44 import *  # noqa: F401,F403


# --- round-5 wave: Hoover (Robin Hood) index -----------------------------------------


def ext_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of customer revenue: the share of
    total revenue that would have to move between customers to reach
    perfect equality — the most interpretable member of the
    inequality family (X117's Gini integrates the whole curve; Hoover
    is ONE number a planner can act on). Computed through the exact
    integer identity sum|y_i/Y - 1/n| = sum|n*y_i - Y|/(n*Y), with
    revenue FLOOR-rescaled to $100 units so every product stays
    inside int64 at any scale factor.

    Scale shape: one per-customer rollup, one broadcast total, one
    exact-integer absolute-deviation pass."""
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) DIV 10000"
                " AS BIGINT)"
            ).alias("y")
        )
    )
    tot = cust.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("yt"))
    dev = cust.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("yt").alias("yt"),
        # DECIMAL combination: the |n*y - yt| terms sum to n^2 * MAD(y)
        # (mean ABSOLUTE DEVIATION, ~7287 measured — not the mean), so the
        # int64 sum crosses 2^63 at ~sf237 with n = customers ∝ SF (r9
        # end-to-end overflow proof, SCALE_PROOF_OVERFLOW_r09 + the
        # corrected PERFORMANCE.md audit row; HUGEINT in the oracle, same
        # exact integers, same double conversion)
        F.sum(F.expr("ABS(CAST(n AS DECIMAL(19,0))*y - yt)")).alias("absdev"),
    )
    return dev.select(
        F.col("n").alias("n_customers"),
        F.expr(
            "ROUND(CAST(absdev AS DOUBLE)/(2.0*n*yt), 6)"
        ).alias("hoover_index"),
    )


EXT_HOOVER_INDEX_SQL = r"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) // 10000 AS BIGINT)
           AS y
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS yt FROM cust),
dev AS (
  SELECT MAX(t.n) AS n, MAX(t.yt) AS yt,
         CAST(SUM(ABS(t.n*c.y - t.yt)) AS BIGINT) AS absdev
  FROM cust c CROSS JOIN tot t
)
SELECT n AS n_customers,
       ROUND(CAST(absdev AS DOUBLE)/(2.0*n*yt), 6) AS hoover_index
FROM dev
"""


EXT_QUERIES.update({"ext_hoover_index": ext_hoover_index})
EXT_ORACLES.update({"ext_hoover_index": EXT_HOOVER_INDEX_SQL})


# --- round-5 wave: Atkinson inequality index -----------------------------------------


def ext_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at aversion epsilon = 1: A = 1 -
    geometric mean / arithmetic mean of customer revenue — the
    welfare-theoretic member of the family, directly readable as 'the
    share of total revenue society would give up for equality'. The
    geometric mean's log sum quantizes to exact integer nano-units
    before the cross-row addition, so no accumulation order exists.

    Scale shape: one per-customer rollup, one exact-moment agg, O(1)
    arithmetic."""
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias("yc")
        )
        .filter("yc > 0")
    )
    m = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yc").alias("s"),
        F.sum(
            F.expr("CAST(ROUND(LN(CAST(yc AS DOUBLE))*1e9) AS BIGINT)")
        ).alias("lq"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.expr("ROUND(CAST(s AS DOUBLE)/n/1e2, 2)").alias("mean_revenue"),
        F.expr(
            "ROUND(EXP(CAST(lq AS DOUBLE)/n/1e9)/1e2, 2)"
        ).alias("geomean_revenue"),
        F.expr(
            "ROUND(1.0 - EXP(CAST(lq AS DOUBLE)/n/1e9)"
            "/(CAST(s AS DOUBLE)/n), 6)"
        ).alias("atkinson_eps1"),
    )


EXT_ATKINSON_INDEX_SQL = r"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS yc
  FROM orders GROUP BY o_custkey HAVING SUM(CAST(ROUND(o_totalprice*100)
    AS BIGINT)) > 0
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yc) AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(LN(CAST(yc AS DOUBLE))*1e9) AS BIGINT)) AS BIGINT)
           AS lq
  FROM cust
)
SELECT n AS n_customers,
       ROUND(CAST(s AS DOUBLE)/n/1e2, 2) AS mean_revenue,
       ROUND(EXP(CAST(lq AS DOUBLE)/n/1e9)/1e2, 2) AS geomean_revenue,
       ROUND(1.0 - EXP(CAST(lq AS DOUBLE)/n/1e9)/(CAST(s AS DOUBLE)/n), 6)
         AS atkinson_eps1
FROM m
"""


EXT_QUERIES.update({"ext_atkinson_index": ext_atkinson_index})
EXT_ORACLES.update({"ext_atkinson_index": EXT_ATKINSON_INDEX_SQL})


# --- round-5 wave: Palma ratio -------------------------------------------------------


def ext_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of customer revenue: top-decile revenue share over
    bottom-two-quintile share — the inequality headline built on the
    observation that the middle 50% share is nearly constant, so ALL
    the action is in the two tails the Gini blurs together. Tail
    membership uses exact nearest-rank value thresholds off the
    COLLAPSED revenue axis (boundary-value ties follow the threshold
    side, documented); every sum is exact integer cents.

    Scale shape: per-customer rollup, an O(distinct values) cumulative
    sweep for both thresholds, one conditional-sum pass."""
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias("yc")
        )
    )
    vals = cust.groupBy("yc").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("yc").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = vals.withColumn("cc", F.sum("c").over(wv)).withColumn(
        "n", F.sum("c").over(wall)
    )
    t40 = cum.filter("5*cc >= 2*n").agg(F.min("yc").alias("t40"))
    t90 = cum.filter("10*cc >= 9*n").agg(F.min("yc").alias("t90"))
    return (
        cust.crossJoin(F.broadcast(t40))
        .crossJoin(F.broadcast(t90))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("yc").alias("tot"),
            F.sum(F.expr("CASE WHEN yc <= t40 THEN yc ELSE 0L END")).alias(
                "bot40"
            ),
            F.sum(F.expr("CASE WHEN yc >= t90 THEN yc ELSE 0L END")).alias(
                "top10"
            ),
        )
        .select(
            "n_customers",
            F.expr("ROUND(CAST(bot40 AS DOUBLE)/tot, 6)").alias(
                "bottom40_share"
            ),
            F.expr("ROUND(CAST(top10 AS DOUBLE)/tot, 6)").alias(
                "top10_share"
            ),
            F.expr(
                "CASE WHEN bot40 > 0 THEN"
                " ROUND(CAST(top10 AS DOUBLE)/bot40, 4) END"
            ).alias("palma_ratio"),
        )
    )


EXT_PALMA_RATIO_SQL = r"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS yc
  FROM orders GROUP BY o_custkey
),
vals AS (SELECT yc, COUNT(*) AS c FROM cust GROUP BY yc),
cum AS (
  SELECT yc,
         SUM(c) OVER (ORDER BY yc
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER () AS n
  FROM vals
),
t40 AS (SELECT MIN(yc) AS t40 FROM cum WHERE 5*cc >= 2*n),
t90 AS (SELECT MIN(yc) AS t90 FROM cum WHERE 10*cc >= 9*n)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(CASE WHEN yc <= t40 THEN yc ELSE 0 END) AS DOUBLE)
             /SUM(yc), 6) AS bottom40_share,
       ROUND(CAST(SUM(CASE WHEN yc >= t90 THEN yc ELSE 0 END) AS DOUBLE)
             /SUM(yc), 6) AS top10_share,
       CASE WHEN SUM(CASE WHEN yc <= t40 THEN yc ELSE 0 END) > 0 THEN
         ROUND(CAST(SUM(CASE WHEN yc >= t90 THEN yc ELSE 0 END) AS DOUBLE)
               /SUM(CASE WHEN yc <= t40 THEN yc ELSE 0 END), 4) END
         AS palma_ratio
FROM cust CROSS JOIN t40 CROSS JOIN t90
"""


EXT_QUERIES.update({"ext_palma_ratio": ext_palma_ratio})
EXT_ORACLES.update({"ext_palma_ratio": EXT_PALMA_RATIO_SQL})
