"""Declared-query waves: round-5 wave: factorial (two-way) ANOVA
decomposition; round-5 wave: Deming (orthogonal) regression; round-5
wave: Hurst exponent via rescaled-range analysis.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: every decomposition reduces to exact BIGINT cell moments;
Deming runs on exact integer day counts; the R/S statistic is quantized
to integer micro-units per block before any cross-block sum, so no
float accumulation order exists to differ between engines.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w26 import *  # noqa: F401,F403


# --- round-5 wave: factorial ANOVA decomposition --------------------------------


def ext_factorial_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor variance decomposition of event value over event_type
    x weekday: eta-squared for each main effect (one-way between-group
    SS), for the full cell structure, and the interaction remainder
    SS_cells - SS_A - SS_B (the exact Type-I interaction term under a
    balanced design, reported as a descriptive remainder on unbalanced
    data — the caveat every unbalanced factorial carries), plus the
    cell-level F statistic. Everything derives from exact BIGINT
    per-cell moments (n, sum, sum-of-squares of integer cents).

    Scale shape: ONE grouped pass to the O(types x weekdays) cell
    grid; every SS is arithmetic on that tiny axis."""
    cells = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("CAST(DAYOFWEEK(CAST(ts AS DATE)) AS INT)").alias("wd"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("s"),
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)"
                         "*CAST(ROUND(value*100) AS BIGINT)")).alias("q"),
        )
    )
    # all group SS terms are sums of s^2/n over an axis minus the grand term
    agg = cells.agg(
        F.sum("n").alias("N"),
        F.sum("s").alias("S"),
        F.sum("q").alias("Q"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.expr("CAST(s AS DOUBLE)*s/n")).alias("cell_term"),
    )
    a_term = (
        cells.groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .agg(
            F.sum(F.expr("CAST(s AS DOUBLE)*s/n")).alias("a_term"),
            F.count(F.lit(1)).alias("n_a"),
        )
    )
    b_term = (
        cells.groupBy("wd")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .agg(
            F.sum(F.expr("CAST(s AS DOUBLE)*s/n")).alias("b_term"),
            F.count(F.lit(1)).alias("n_b"),
        )
    )
    j = agg.crossJoin(F.broadcast(a_term)).crossJoin(F.broadcast(b_term)).select(
        "N",
        "n_cells",
        "n_a",
        "n_b",
        F.expr("CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/N").alias("ss_total"),
        F.expr("a_term - CAST(S AS DOUBLE)*S/N").alias("ss_a"),
        F.expr("b_term - CAST(S AS DOUBLE)*S/N").alias("ss_b"),
        F.expr("cell_term - CAST(S AS DOUBLE)*S/N").alias("ss_cells"),
        F.expr("CAST(Q AS DOUBLE) - cell_term").alias("ss_within"),
    )
    return j.select(
        "N",
        F.col("n_cells").alias("cells"),
        F.expr("ROUND(ss_a/ss_total, 6)").alias("eta2_type"),
        F.expr("ROUND(ss_b/ss_total, 6)").alias("eta2_weekday"),
        F.expr("ROUND((ss_cells - ss_a - ss_b)/ss_total, 6)").alias(
            "eta2_interaction_rem"
        ),
        F.expr(
            "ROUND((ss_cells/(n_cells - 1))/(ss_within/(N - n_cells)), 4)"
        ).alias("f_cells"),
    )


EXT_FACTORIAL_ANOVA_SQL = r"""
WITH cells AS (
  SELECT event_type,
         CAST(DAYOFWEEK(CAST(ts AS DATE)) AS INTEGER) AS wd,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)
                  *CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS N, CAST(SUM(s) AS BIGINT) AS S,
         CAST(SUM(q) AS BIGINT) AS Q, COUNT(*) AS n_cells,
         SUM(CAST(s AS DOUBLE)*s/n) AS cell_term
  FROM cells
),
a_term AS (
  SELECT SUM(CAST(s AS DOUBLE)*s/n) AS a_term, COUNT(*) AS n_a
  FROM (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s FROM cells GROUP BY 1)
),
b_term AS (
  SELECT SUM(CAST(s AS DOUBLE)*s/n) AS b_term, COUNT(*) AS n_b
  FROM (SELECT wd, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS s FROM cells GROUP BY 1)
),
j AS (
  SELECT N, n_cells, n_a, n_b,
         CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)*S/N AS ss_total,
         a_term - CAST(S AS DOUBLE)*S/N AS ss_a,
         b_term - CAST(S AS DOUBLE)*S/N AS ss_b,
         cell_term - CAST(S AS DOUBLE)*S/N AS ss_cells,
         CAST(Q AS DOUBLE) - cell_term AS ss_within
  FROM agg CROSS JOIN a_term CROSS JOIN b_term
)
SELECT N, n_cells AS cells,
       ROUND(ss_a/ss_total, 6) AS eta2_type,
       ROUND(ss_b/ss_total, 6) AS eta2_weekday,
       ROUND((ss_cells - ss_a - ss_b)/ss_total, 6) AS eta2_interaction_rem,
       ROUND((ss_cells/(n_cells - 1))/(ss_within/(N - n_cells)), 4) AS f_cells
FROM j
"""


EXT_QUERIES.update({"ext_factorial_anova": ext_factorial_anova})
EXT_ORACLES.update({"ext_factorial_anova": EXT_FACTORIAL_ANOVA_SQL})


# --- round-5 wave: Deming (orthogonal) regression -------------------------------


def ext_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming (errors-in-both-variables, lambda=1 orthogonal) regression
    of daily purchase volume on daily click volume, with the plain OLS
    slope alongside — the comparison that shows how much attenuation
    bias OLS carries when the regressor is itself noisy. Closed form
    from exact BIGINT day-axis moments:
    b = (syy - sxx + sqrt((syy-sxx)^2 + 4 sxy^2)) / (2 sxy).

    Scale shape: the fact table collapses to O(days) exact counts in
    one pass; the fit is O(1) arithmetic on the moment row."""
    days = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("d"))
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("x"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("y"),
        )
    )
    m = days.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x*x")).alias("sxx"),
        F.sum(F.expr("y*y")).alias("syy"),
        F.sum(F.expr("x*y")).alias("sxy"),
    )
    fit = m.select(
        "n",
        F.expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n").alias("vx"),
        F.expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n").alias("vy"),
        F.expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n").alias("cxy"),
        F.expr("CAST(sx AS DOUBLE)/n").alias("mx"),
        F.expr("CAST(sy AS DOUBLE)/n").alias("my"),
    )
    return fit.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CASE WHEN cxy <> 0 THEN ROUND("
            "(vy - vx + SQRT((vy - vx)*(vy - vx) + 4*cxy*cxy))/(2*cxy), 6) END"
        ).alias("deming_slope"),
        F.expr("CASE WHEN vx > 0 THEN ROUND(cxy/vx, 6) END").alias("ols_slope"),
        F.expr(
            "CASE WHEN cxy <> 0 THEN ROUND(my - "
            "(vy - vx + SQRT((vy - vx)*(vy - vx) + 4*cxy*cxy))/(2*cxy)*mx, 4)"
            " END"
        ).alias("deming_intercept"),
    )


EXT_DEMING_REGRESSION_SQL = r"""
WITH days AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
         CAST(SUM(x*y) AS BIGINT) AS sxy
  FROM days
),
fit AS (
  SELECT n,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n AS vx,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n AS vy,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n AS cxy,
         CAST(sx AS DOUBLE)/n AS mx,
         CAST(sy AS DOUBLE)/n AS my
  FROM m
)
SELECT n AS n_days,
       CASE WHEN cxy <> 0 THEN ROUND(
         (vy - vx + SQRT((vy - vx)*(vy - vx) + 4*cxy*cxy))/(2*cxy), 6) END
         AS deming_slope,
       CASE WHEN vx > 0 THEN ROUND(cxy/vx, 6) END AS ols_slope,
       CASE WHEN cxy <> 0 THEN ROUND(my -
         (vy - vx + SQRT((vy - vx)*(vy - vx) + 4*cxy*cxy))/(2*cxy)*mx, 4) END
         AS deming_intercept
FROM fit
"""


EXT_QUERIES.update({"ext_deming_regression": ext_deming_regression})
EXT_ORACLES.update({"ext_deming_regression": EXT_DEMING_REGRESSION_SQL})


# --- round-5 wave: Hurst exponent (R/S analysis) --------------------------------


def ext_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-volume series by classic
    rescaled-range analysis: at block sizes 4/8/16 days, each complete
    block's range of cumulative mean-deviations over its population
    std (R/S), block values quantized to exact integer micro-units
    before averaging, and H = the log-log OLS slope across the three
    sizes — the long-memory diagnostic (H>0.5 trending, H<0.5 mean
    reverting) behind capacity forecasting. The time index is the
    dense rank of observed days, documented as the observed-day axis.

    Scale shape: collapse to O(days) counts; per-block windows over
    that tiny axis; the final fit is O(3) arithmetic."""
    days = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "c",
            (F.row_number().over(Window.orderBy("day")) - 1).alias("d"),
        )
    )
    grid = days.select(
        "c",
        "d",
        F.explode(F.expr("array(4, 8, 16)")).alias("bs"),
    ).select("c", "d", "bs", F.expr("d DIV bs").alias("blk"))
    wcum = (
        Window.partitionBy("bs", "blk")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    word = Window.partitionBy("bs", "blk").orderBy("d")
    wblk = Window.partitionBy("bs", "blk")
    z = (
        grid.withColumn("bn", F.count(F.lit(1)).over(wblk))
        .withColumn("bsum", F.sum("c").over(wblk))
        .withColumn("bqsum", F.sum(F.expr("c*c")).over(wblk))
        .filter(F.expr("bn = bs"))
        .withColumn("cs", F.sum("c").over(wcum))
        .withColumn("k", F.row_number().over(word))
        .withColumn(
            "zk", F.expr("CAST(cs AS DOUBLE) - k*CAST(bsum AS DOUBLE)/bs")
        )
    )
    blocks = z.groupBy("bs", "blk").agg(
        F.expr(
            "CAST(ROUND((MAX(zk) - MIN(zk))"
            "/SQRT(MAX(bqsum)/CAST(MAX(bs) AS DOUBLE)"
            "      - POW(MAX(bsum)/CAST(MAX(bs) AS DOUBLE), 2))*1e6) AS BIGINT)"
        ).alias("rs_q")
    )
    per_bs = blocks.groupBy("bs").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.expr("LN(CAST(SUM(rs_q) AS DOUBLE)/COUNT(*)/1e6)").alias("lrs"),
        F.expr("LN(CAST(MAX(bs) AS DOUBLE))").alias("lbs"),
    )
    fit = per_bs.agg(
        F.count(F.lit(1)).alias("n_sizes"),
        F.sum("n_blocks").alias("total_blocks"),
        F.expr(
            "ROUND((SUM(lbs*lrs) - SUM(lbs)*SUM(lrs)/COUNT(*))"
            "/(SUM(lbs*lbs) - SUM(lbs)*SUM(lbs)/COUNT(*)), 6)"
        ).alias("hurst"),
    )
    return fit


EXT_HURST_EXPONENT_SQL = r"""
WITH days AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c,
         ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS d
  FROM events GROUP BY CAST(ts AS DATE)
),
grid AS (
  SELECT c, d, bs, d // bs AS blk
  FROM days CROSS JOIN (SELECT UNNEST([4, 8, 16]) AS bs)
),
marked AS (
  SELECT c, d, bs, blk,
         COUNT(*) OVER wb AS bn,
         SUM(c) OVER wb AS bsum,
         SUM(c*c) OVER wb AS bqsum
  FROM grid
  WINDOW wb AS (PARTITION BY bs, blk)
),
z AS (
  SELECT bs, blk, bsum, bqsum,
         SUM(c) OVER wc AS cs,
         ROW_NUMBER() OVER wc AS k
  FROM marked WHERE bn = bs
  WINDOW wc AS (PARTITION BY bs, blk ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
blocks AS (
  SELECT bs, blk,
         CAST(ROUND((MAX(CAST(cs AS DOUBLE) - k*CAST(bsum AS DOUBLE)/bs)
                   - MIN(CAST(cs AS DOUBLE) - k*CAST(bsum AS DOUBLE)/bs))
              /SQRT(CAST(MAX(bqsum) AS DOUBLE)/MAX(bs)
                    - POW(CAST(MAX(bsum) AS DOUBLE)/MAX(bs), 2))*1e6)
              AS BIGINT) AS rs_q
  FROM z GROUP BY bs, blk
),
per_bs AS (
  SELECT bs, COUNT(*) AS n_blocks,
         LN(CAST(CAST(SUM(rs_q) AS BIGINT) AS DOUBLE)/COUNT(*)/1e6) AS lrs,
         LN(CAST(MAX(bs) AS DOUBLE)) AS lbs
  FROM blocks GROUP BY bs
)
SELECT COUNT(*) AS n_sizes,
       CAST(SUM(n_blocks) AS BIGINT) AS total_blocks,
       ROUND((SUM(lbs*lrs) - SUM(lbs)*SUM(lrs)/COUNT(*))
             /(SUM(lbs*lbs) - SUM(lbs)*SUM(lbs)/COUNT(*)), 6) AS hurst
FROM per_bs
"""


EXT_QUERIES.update({"ext_hurst_exponent": ext_hurst_exponent})
EXT_ORACLES.update({"ext_hurst_exponent": EXT_HURST_EXPONENT_SQL})
