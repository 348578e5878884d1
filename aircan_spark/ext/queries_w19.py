"""Declared-query waves: round-5 wave: DFT periodogram of the daily
revenue series; round-5 wave: rank-biserial effect size; round-5 wave:
bullwhip (order-vs-ship variance amplification) audit.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: the periodogram normalizes the series to shares BEFORE the
trig terms so a last-ulp cos/sin divergence is far below the output
rounding, then decimal-sums the terms; the other two are exact integer
or half-integer arithmetic end to end.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w18 import *  # noqa: F401,F403


# --- round-5 wave: DFT periodogram --------------------------------------------


def ext_dft_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of daily revenue at the first eight
    harmonics of the 30-day window — the direct spectral read of WHICH
    cycle dominates (k≈4 is the weekly line), complementing
    ext_seasonality_strength's single variance ratio. The series is
    mean-removed and normalized to SHARES of total revenue first, so
    every trig term is O(1/30) and a last-ulp cos/sin libm divergence
    sits ~1e-17 — far below the 8-decimal output; terms are rounded to
    12 decimals and decimal-summed (order-free).

    Scale shape: one day hash agg; the DFT is 8 x O(days) terms on the
    tiny axis."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("c"))
    )
    tot = daily.agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("n"))
    x = daily.join(F.broadcast(tot)).select(
        "t", F.expr("CAST(c AS DOUBLE)/s - 1e0/n").alias("x")
    )
    ks = x.select(
        "t", "x", F.explode(F.expr("sequence(1, 8)")).alias("k")
    )
    pw = ks.groupBy("k").agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(x*COS(2e0*PI()*k*t/30), 12) AS DECIMAL(28,12)))"
            " AS DOUBLE)"
        ).alias("cre"),
        F.expr(
            "CAST(SUM(CAST(ROUND(x*SIN(2e0*PI()*k*t/30), 12) AS DECIMAL(28,12)))"
            " AS DOUBLE)"
        ).alias("cim"),
    )
    return (
        pw.select(
            "k",
            F.expr("ROUND(30e0/k, 4)").alias("period_days"),
            F.expr("ROUND(cre*cre + cim*cim, 8)").alias("power"),
        )
        .orderBy("k")
    )


EXT_DFT_PERIODOGRAM_SQL = r"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS n FROM daily),
x AS (
  SELECT t, CAST(c AS DOUBLE)/s - 1e0/n AS x FROM daily CROSS JOIN tot
),
ks AS (
  SELECT t, x, k.k FROM x CROSS JOIN (SELECT UNNEST(generate_series(1, 8)) AS k) k
),
pw AS (
  SELECT k,
         CAST(SUM(CAST(ROUND(x*COS(2e0*PI()*k*t/30), 12) AS DECIMAL(28,12))) AS DOUBLE) AS cre,
         CAST(SUM(CAST(ROUND(x*SIN(2e0*PI()*k*t/30), 12) AS DECIMAL(28,12))) AS DOUBLE) AS cim
  FROM ks GROUP BY k
)
SELECT k, ROUND(30e0/k, 4) AS period_days,
       ROUND(cre*cre + cim*cim, 8) AS power
FROM pw ORDER BY k
"""


EXT_QUERIES.update({"ext_dft_periodogram": ext_dft_periodogram})
EXT_ORACLES.update({"ext_dft_periodogram": EXT_DFT_PERIODOGRAM_SQL})


# --- round-5 wave: rank-biserial effect size ----------------------------------


def ext_rank_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biserial effect size (= Cliff's delta) of discounting on
    order quantity: the Mann-Whitney U of discounted vs undiscounted
    lineitems scaled to [-1, 1] — the distribution-free effect size
    that reports HOW MUCH two groups differ where ext_kruskal_wallis
    only reports whether. Midranks come from collapsed value margins
    (cumulative counts + (n_v + 1)/2 — exact half-integers), so U and
    delta are exact rationals; the tiny 50-value axis carries the only
    window.

    Scale shape: one (value) hash agg with conditional counts; window
    over the O(support) axis."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"),
        F.expr("CAST(ROUND(l_discount*100) = 0 AS LONG)").alias("is_a"),
    )
    counts = li.groupBy("v").agg(
        F.sum("is_a").alias("ca"), F.sum(F.expr("1 - is_a")).alias("cb")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum(F.expr("ca + cb")).over(w), F.lit(0)).alias("below"),
    ).select(
        "ca",
        F.expr("below + (ca + cb + 1)/2e0").alias("midrank"),
    )
    tot = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    ra = ranked.agg(
        F.expr(
            "CAST(SUM(CAST(ca*midrank*2 AS BIGINT)) AS BIGINT)"
        ).alias("ra2")
    )
    return (
        ra.join(tot)
        .select(
            "na",
            "nb",
            F.expr("ROUND(ra2/2e0 - CAST(na AS DOUBLE)*(na + 1)/2, 1)").alias("u_a"),
            F.expr(
                "ROUND(2e0*(ra2/2e0 - CAST(na AS DOUBLE)*(na + 1)/2)"
                "/(CAST(na AS DOUBLE)*nb) - 1, 6)"
            ).alias("rank_biserial"),
        )
    )


EXT_RANK_BISERIAL_SQL = r"""
WITH v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         CAST(CAST(ROUND(l_discount*100) AS BIGINT) = 0 AS BIGINT) AS is_a
  FROM lineitem
),
counts AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS ca, CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM v GROUP BY v
),
ranked AS (
  SELECT ca,
         COALESCE(CAST(SUM(ca + cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         + (ca + cb + 1)/2e0 AS midrank
  FROM counts
),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM counts),
ra AS (
  SELECT CAST(SUM(CAST(ca*midrank*2 AS BIGINT)) AS BIGINT) AS ra2 FROM ranked
)
SELECT na, nb,
       ROUND(ra2/2e0 - CAST(na AS DOUBLE)*(na + 1)/2, 1) AS u_a,
       ROUND(2e0*(ra2/2e0 - CAST(na AS DOUBLE)*(na + 1)/2)
             /(CAST(na AS DOUBLE)*nb) - 1, 6) AS rank_biserial
FROM ra CROSS JOIN tot
"""


EXT_QUERIES.update({"ext_rank_biserial": ext_rank_biserial})
EXT_ORACLES.update({"ext_rank_biserial": EXT_RANK_BISERIAL_SQL})


# --- round-5 wave: bullwhip (order-vs-ship) variance audit --------------------


def ext_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal variance-amplification (bullwhip-style) audit: the same
    goods measured as weekly ORDER totals (order date) vs weekly SHIP
    totals (ship date) — shipping schedules smooth or amplify demand
    volatility, and the ratio of the two weekly variances quantifies
    it per year. All four moments per stage are exact integer-cent
    sums; n*s2 - s1*s1 stays EXACT in DECIMAL(38) and converts to double
    only for the final O(1)-magnitude CV and ratio outputs (raw
    variances are ~1e12 cents^2 — rounding THEM at fixed decimals sits
    at the double's precision limit and flips between engines).

    Scale shape: two week hash aggs (orders, lineitem), one re-agg per
    year; output O(years)."""
    ow = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.expr("YEAR(o_orderdate)").alias("yr"),
            F.expr(
                "CAST(DATEDIFF(o_orderdate, DATE'1992-01-01') DIV 7 AS BIGINT)"
            ).alias("wk"),
        )
        .agg(F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias("c"))
    )
    lw = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.expr("YEAR(l_shipdate)").alias("yr"),
            F.expr(
                "CAST(DATEDIFF(l_shipdate, DATE'1992-01-01') DIV 7 AS BIGINT)"
            ).alias("wk"),
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(l_extendedprice*100) AS BIGINT)")).alias("c")
        )
    )

    def var_frame(df, prefix):
        return df.groupBy("yr").agg(
            F.count(F.lit(1)).alias(f"{prefix}_n"),
            F.sum("c").alias(f"{prefix}_s1"),
            F.sum(
                F.expr("CAST(c AS DECIMAL(19,0))*CAST(c AS DECIMAL(19,0))")
            ).cast("decimal(38,0)").alias(f"{prefix}_s2"),
        )

    o = var_frame(ow, "o")
    l = var_frame(lw, "l")
    return (
        o.join(l, "yr")
        .filter(F.expr("o_n >= 8 AND l_n >= 8"))
        .select(
            "yr",
            F.col("o_n").alias("order_weeks"),
            F.col("l_n").alias("ship_weeks"),
            F.expr(
                "ROUND(SQRT(CAST(o_n*o_s2 - CAST(o_s1 AS DECIMAL(19,0))*o_s1"
                " AS DOUBLE))/o_s1, 6)"
            ).alias("order_week_cv"),
            F.expr(
                "ROUND(SQRT(CAST(l_n*l_s2 - CAST(l_s1 AS DECIMAL(19,0))*l_s1"
                " AS DOUBLE))/l_s1, 6)"
            ).alias("ship_week_cv"),
            F.expr(
                "ROUND(CAST(l_n*l_s2 - CAST(l_s1 AS DECIMAL(19,0))*l_s1 AS DOUBLE)"
                "*(CAST(o_n AS DOUBLE)*o_n)"
                "/(CAST(o_n*o_s2 - CAST(o_s1 AS DECIMAL(19,0))*o_s1 AS DOUBLE)"
                "*(CAST(l_n AS DOUBLE)*l_n)), 6)"
            ).alias("amplification"),
        )
        .orderBy("yr")
    )


EXT_BULLWHIP_SQL = r"""
WITH ow AS (
  SELECT YEAR(o_orderdate) AS yr,
         DATEDIFF('day', DATE '1992-01-01', o_orderdate) // 7 AS wk,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
lw AS (
  SELECT YEAR(l_shipdate) AS yr,
         DATEDIFF('day', DATE '1992-01-01', l_shipdate) // 7 AS wk,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
o AS (
  SELECT yr, COUNT(*) AS o_n, CAST(SUM(c) AS BIGINT) AS o_s1,
         CAST(SUM(CAST(c AS DECIMAL(19,0))*CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS o_s2
  FROM ow GROUP BY yr
),
l AS (
  SELECT yr, COUNT(*) AS l_n, CAST(SUM(c) AS BIGINT) AS l_s1,
         CAST(SUM(CAST(c AS DECIMAL(19,0))*CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS l_s2
  FROM lw GROUP BY yr
)
SELECT yr, o_n AS order_weeks, l_n AS ship_weeks,
       ROUND(SQRT(CAST(o_n*o_s2 - CAST(o_s1 AS DECIMAL(19,0))*o_s1 AS DOUBLE))/o_s1, 6) AS order_week_cv,
       ROUND(SQRT(CAST(l_n*l_s2 - CAST(l_s1 AS DECIMAL(19,0))*l_s1 AS DOUBLE))/l_s1, 6) AS ship_week_cv,
       ROUND(CAST(l_n*l_s2 - CAST(l_s1 AS DECIMAL(19,0))*l_s1 AS DOUBLE)*(CAST(o_n AS DOUBLE)*o_n)
             /(CAST(o_n*o_s2 - CAST(o_s1 AS DECIMAL(19,0))*o_s1 AS DOUBLE)*(CAST(l_n AS DOUBLE)*l_n)), 6) AS amplification
FROM o JOIN l USING (yr)
WHERE o_n >= 8 AND l_n >= 8
ORDER BY yr
"""


EXT_QUERIES.update({"ext_bullwhip": ext_bullwhip})
EXT_ORACLES.update({"ext_bullwhip": EXT_BULLWHIP_SQL})
