"""Declared-query waves: round-5 wave: mediation analysis (product of
coefficients with the exact OLS decomposition identity); round-5 wave:
winner's-curse split-half selection audit; round-5 wave: regression
discontinuity estimator at a spend cutoff.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: every coefficient is a closed-form expression over exact
BIGINT moments (the queries_w10+ contract); selection steps compare
exact integers or identical doubles with explicit tie-breaks.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w20 import *  # noqa: F401,F403


# --- round-5 wave: mediation analysis -----------------------------------------

_MED_COEFS = (
    "CAST(n*sxm - sx*sm AS DOUBLE)/(n*sxx - sx*sx) AS a,"
    " (CAST(n*smy - sm*sy AS DOUBLE)*(n*sxx - sx*sx)"
    "  - CAST(n*sxy - sx*sy AS DOUBLE)*(n*sxm - sx*sm))"
    " /(CAST(n*smm - sm*sm AS DOUBLE)*(n*sxx - sx*sx)"
    "   - CAST(n*sxm - sx*sm AS DOUBLE)*(n*sxm - sx*sm)) AS b,"
    " (CAST(n*sxy - sx*sy AS DOUBLE)*(n*smm - sm*sm)"
    "  - CAST(n*smy - sm*sy AS DOUBLE)*(n*sxm - sx*sm))"
    " /(CAST(n*sxx - sx*sx AS DOUBLE)*(n*smm - sm*sm)"
    "   - CAST(n*sxm - sx*sm AS DOUBLE)*(n*sxm - sx*sm)) AS cprime,"
    " CAST(n*sxy - sx*sy AS DOUBLE)/(n*sxx - sx*sx) AS c"
)


def ext_mediation_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baron-Kenny mediation decomposition: does the (md5-assigned)
    treatment raise purchase odds DIRECTLY or via driving more clicks?
    a = effect of x on the mediator m (clicks), b = effect of m on y
    (purchase) controlling x, c' = direct effect, c = total effect —
    with the exact OLS identity c = c' + a*b emitted as a self-check
    column (its residual is pure rounding). Every coefficient is a
    closed-form expression over ten exact BIGINT moments from ONE
    per-user aggregate.

    Scale shape: one per-user hash agg, one scalar moment agg."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("m"),
            F.max(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("yy"),
        )
        .select(
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 2"
            ).alias("x"),
            "m",
            "yy",
        )
    )
    mom = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum("yy").alias("sy"),
        F.sum(F.expr("x*m")).alias("sxm"),
        F.sum(F.expr("x*yy")).alias("sxy"),
        F.sum(F.expr("m*yy")).alias("smy"),
        F.sum(F.expr("x*x")).alias("sxx"),
        F.sum(F.expr("m*m")).alias("smm"),
    )
    co = mom.selectExpr("n", *[e.strip() for e in _MED_COEFS.split(",")])
    return co.select(
        "n",
        F.expr("ROUND(a, 6)").alias("a_x_to_m"),
        F.expr("ROUND(b, 6)").alias("b_m_to_y"),
        F.expr("ROUND(cprime, 6)").alias("direct_effect"),
        F.expr("ROUND(a*b, 6)").alias("indirect_effect"),
        F.expr("ROUND(c, 6)").alias("total_effect"),
        F.expr("ROUND(c - cprime - a*b, 8)").alias("identity_residual"),
    )


EXT_MEDIATION_EFFECT_SQL = f"""
WITH users AS (
  SELECT CAST(('0x' || SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2 AS BIGINT) AS x,
         CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS m,
         MAX(CAST(event_type = 'purchase' AS BIGINT)) AS yy
  FROM events GROUP BY user_id
),
mom AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(m) AS BIGINT) AS sm,
         CAST(SUM(yy) AS BIGINT) AS sy,
         CAST(SUM(x*m) AS BIGINT) AS sxm, CAST(SUM(x*yy) AS BIGINT) AS sxy,
         CAST(SUM(m*yy) AS BIGINT) AS smy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(m*m) AS BIGINT) AS smm
  FROM users
),
co AS (
  SELECT n, {_MED_COEFS} FROM mom
)
SELECT n,
       ROUND(a, 6) AS a_x_to_m,
       ROUND(b, 6) AS b_m_to_y,
       ROUND(cprime, 6) AS direct_effect,
       ROUND(a*b, 6) AS indirect_effect,
       ROUND(c, 6) AS total_effect,
       ROUND(c - cprime - a*b, 8) AS identity_residual
FROM co
"""


EXT_QUERIES.update({"ext_mediation_effect": ext_mediation_effect})
EXT_ORACLES.update({"ext_mediation_effect": EXT_MEDIATION_EFFECT_SQL})


# --- round-5 wave: winner's-curse split-half audit ----------------------------


def ext_winners_curse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winner's-curse quantification: pick the best-mean-revenue brand on
    split A (md5 halves of orders), then measure the SAME brand on the
    untouched split B — the selected maximum regresses toward the pack,
    and the A-B gap is the post-selection inflation any 'top performer'
    dashboard silently carries. Means come from exact integer-cent sums;
    the winner is an exact argmax with brand tie-break; B-side rank of
    the winner rides along.

    Scale shape: one (brand, split) hash agg; selection and the rank
    run on the O(brands) frame."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(ROUND(l_extendedprice*(1 - l_discount)*100) AS BIGINT)"
        ).alias("cents"),
        F.expr(
            "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 2"
        ).alias("half"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    cells = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand", "half")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    a = cells.filter(F.col("half") == 0).select(
        "p_brand", F.col("n").alias("na"), F.col("s").alias("sa")
    )
    b = cells.filter(F.col("half") == 1).select(
        "p_brand", F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    joined = a.join(b, "p_brand").select(
        "p_brand",
        "na",
        "nb",
        F.expr("CAST(sa AS DOUBLE)/na/1e2").alias("mean_a"),
        F.expr("CAST(sb AS DOUBLE)/nb/1e2").alias("mean_b"),
    )
    wa = Window.orderBy(F.col("mean_a").desc(), F.col("p_brand").asc())
    wb = Window.orderBy(F.col("mean_b").desc(), F.col("p_brand").asc())
    ranked = joined.select(
        "p_brand",
        "na",
        "nb",
        "mean_a",
        "mean_b",
        F.row_number().over(wa).alias("rank_a"),
        F.row_number().over(wb).alias("rank_b"),
    )
    return ranked.filter(F.col("rank_a") == 1).select(
        F.col("p_brand").alias("winner_brand"),
        "na",
        "nb",
        F.expr("ROUND(mean_a, 4)").alias("mean_a"),
        F.expr("ROUND(mean_b, 4)").alias("mean_b"),
        F.expr("ROUND(mean_b - mean_a, 4)").alias("regression_to_mean"),
        F.col("rank_b").alias("holdout_rank"),
    )


EXT_WINNERS_CURSE_SQL = r"""
WITH li AS (
  SELECT p_brand,
         CAST(ROUND(l_extendedprice*(1 - l_discount)*100) AS BIGINT) AS cents,
         CAST(('0x' || SUBSTR(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UBIGINT % 2 AS BIGINT) AS half
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
cells AS (
  SELECT p_brand, half, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM li GROUP BY 1, 2
),
joined AS (
  SELECT a.p_brand, a.n AS na, b.n AS nb,
         CAST(a.s AS DOUBLE)/a.n/1e2 AS mean_a,
         CAST(b.s AS DOUBLE)/b.n/1e2 AS mean_b
  FROM (SELECT * FROM cells WHERE half = 0) a
  JOIN (SELECT * FROM cells WHERE half = 1) b USING (p_brand)
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY mean_a DESC, p_brand ASC) AS rank_a,
         ROW_NUMBER() OVER (ORDER BY mean_b DESC, p_brand ASC) AS rank_b
  FROM joined
)
SELECT p_brand AS winner_brand, na, nb,
       ROUND(mean_a, 4) AS mean_a,
       ROUND(mean_b, 4) AS mean_b,
       ROUND(mean_b - mean_a, 4) AS regression_to_mean,
       rank_b AS holdout_rank
FROM ranked WHERE rank_a = 1
"""


EXT_QUERIES.update({"ext_winners_curse": ext_winners_curse})
EXT_ORACLES.update({"ext_winners_curse": EXT_WINNERS_CURSE_SQL})


# --- round-5 wave: regression discontinuity -----------------------------------

_RD_SIDE = (
    "COUNT(*) AS n_{s}, "
    "CAST(SUM(r) AS BIGINT) AS sr_{s}, CAST(SUM(yy) AS BIGINT) AS sy_{s}, "
    "CAST(SUM(r*yy) AS BIGINT) AS sry_{s}, CAST(SUM(r*r) AS BIGINT) AS srr_{s}"
)


def ext_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimator at the $200k order-value
    cutoff: local linear fits of the finished-order share on the
    centered running variable within a $50k bandwidth on each side; the
    RD effect is the difference of the two fitted intercepts AT the
    cutoff — the design that identifies a treatment jump when
    assignment follows a threshold (the boundary-rule cousin of
    ext_did_estimator/ext_causal_impact). Both fits are closed-form OLS
    over exact BIGINT moments; the running variable is centered and
    FLOOR-rescaled to $100 units (identical floor semantics both
    engines) so n*srr stays far inside int64 at any SF.

    Scale shape: one conditional scalar aggregate computes both sides'
    eight moments in a single pass."""
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            F.expr(
                "CAST(FLOOR((CAST(ROUND(o_totalprice*100) AS BIGINT)"
                " - 20000000)/1e4) AS BIGINT)"
            ).alias("r"),
            F.expr("CAST(o_orderstatus = 'F' AS LONG)").alias("yy"),
        )
        .filter(F.expr("r >= -500 AND r <= 499"))
    )
    sides = o.agg(
        *[
            F.expr(
                f"{agg}(CASE WHEN {cond} THEN {val} ELSE 0 END)"
            ).alias(name)
            for side, cond in [("l", "r < 0"), ("rt", "r >= 0")]
            for agg, val, name in [
                ("SUM", "1", f"n_{side}"),
                ("SUM", "r", f"sr_{side}"),
                ("SUM", "yy", f"sy_{side}"),
                ("SUM", "r*yy", f"sry_{side}"),
                ("SUM", "r*r", f"srr_{side}"),
            ]
        ]
    )
    fit = sides.select(
        "n_l",
        "n_rt",
        F.expr(
            "(CAST(sy_l AS DOUBLE) - (CAST(n_l*sry_l - sr_l*sy_l AS DOUBLE)"
            "/(n_l*srr_l - sr_l*sr_l))*sr_l)/n_l"
        ).alias("a_l"),
        F.expr(
            "(CAST(sy_rt AS DOUBLE) - (CAST(n_rt*sry_rt - sr_rt*sy_rt AS DOUBLE)"
            "/(n_rt*srr_rt - sr_rt*sr_rt))*sr_rt)/n_rt"
        ).alias("a_r"),
        F.expr(
            "CAST(n_l*sry_l - sr_l*sy_l AS DOUBLE)/(n_l*srr_l - sr_l*sr_l)"
        ).alias("b_l"),
        F.expr(
            "CAST(n_rt*sry_rt - sr_rt*sy_rt AS DOUBLE)/(n_rt*srr_rt - sr_rt*sr_rt)"
        ).alias("b_r"),
    )
    return fit.select(
        F.col("n_l").alias("n_left"),
        F.col("n_rt").alias("n_right"),
        F.expr("ROUND(a_l, 6)").alias("intercept_left"),
        F.expr("ROUND(a_r, 6)").alias("intercept_right"),
        F.expr("ROUND(b_l*1e2, 6)").alias("slope_left_per_10k"),
        F.expr("ROUND(b_r*1e2, 6)").alias("slope_right_per_10k"),
        F.expr("ROUND(a_r - a_l, 6)").alias("rd_effect"),
    )


EXT_REGRESSION_DISCONTINUITY_SQL = r"""
WITH o AS (
  SELECT CAST(FLOOR((CAST(ROUND(o_totalprice*100) AS BIGINT) - 20000000)/1e4) AS BIGINT) AS r,
         CAST(o_orderstatus = 'F' AS BIGINT) AS yy
  FROM orders
  WHERE CAST(FLOOR((CAST(ROUND(o_totalprice*100) AS BIGINT) - 20000000)/1e4) AS BIGINT) BETWEEN -500 AND 499
),
sides AS (
  SELECT
    CAST(SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
    CAST(SUM(CASE WHEN r < 0 THEN r ELSE 0 END) AS BIGINT) AS sr_l,
    CAST(SUM(CASE WHEN r < 0 THEN yy ELSE 0 END) AS BIGINT) AS sy_l,
    CAST(SUM(CASE WHEN r < 0 THEN r*yy ELSE 0 END) AS BIGINT) AS sry_l,
    CAST(SUM(CASE WHEN r < 0 THEN r*r ELSE 0 END) AS BIGINT) AS srr_l,
    CAST(SUM(CASE WHEN r >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rt,
    CAST(SUM(CASE WHEN r >= 0 THEN r ELSE 0 END) AS BIGINT) AS sr_rt,
    CAST(SUM(CASE WHEN r >= 0 THEN yy ELSE 0 END) AS BIGINT) AS sy_rt,
    CAST(SUM(CASE WHEN r >= 0 THEN r*yy ELSE 0 END) AS BIGINT) AS sry_rt,
    CAST(SUM(CASE WHEN r >= 0 THEN r*r ELSE 0 END) AS BIGINT) AS srr_rt
  FROM o
),
fit AS (
  SELECT n_l, n_rt,
         (CAST(sy_l AS DOUBLE) - (CAST(n_l*sry_l - sr_l*sy_l AS DOUBLE)/(n_l*srr_l - sr_l*sr_l))*sr_l)/n_l AS a_l,
         (CAST(sy_rt AS DOUBLE) - (CAST(n_rt*sry_rt - sr_rt*sy_rt AS DOUBLE)/(n_rt*srr_rt - sr_rt*sr_rt))*sr_rt)/n_rt AS a_r,
         CAST(n_l*sry_l - sr_l*sy_l AS DOUBLE)/(n_l*srr_l - sr_l*sr_l) AS b_l,
         CAST(n_rt*sry_rt - sr_rt*sy_rt AS DOUBLE)/(n_rt*srr_rt - sr_rt*sr_rt) AS b_r
  FROM sides
)
SELECT n_l AS n_left, n_rt AS n_right,
       ROUND(a_l, 6) AS intercept_left,
       ROUND(a_r, 6) AS intercept_right,
       ROUND(b_l*1e2, 6) AS slope_left_per_10k,
       ROUND(b_r*1e2, 6) AS slope_right_per_10k,
       ROUND(a_r - a_l, 6) AS rd_effect
FROM fit
"""


EXT_QUERIES.update(
    {"ext_regression_discontinuity": ext_regression_discontinuity}
)
EXT_ORACLES.update(
    {"ext_regression_discontinuity": EXT_REGRESSION_DISCONTINUITY_SQL}
)
