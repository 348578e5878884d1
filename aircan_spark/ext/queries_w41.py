"""Declared-query waves: round-5 wave: variance inflation factors;
round-5 wave: competing-risks cumulative incidence; round-5 wave:
Taylor's law (fluctuation scaling).

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: VIFs are closed forms of exact BIGINT moments; incidence
counts are exact first-event struct comparisons; the Taylor fit runs
on the bounded O(items) axis from exact per-item day moments.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w40 import *  # noqa: F401,F403


# --- round-5 wave: variance inflation factors ----------------------------------------


def ext_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors for the three per-user activity
    regressors (clicks, views, purchases): VIF_i = 1/(1 - R_i^2) with
    each R_i^2 the two-regressor coefficient of determination from the
    pairwise correlations — the multicollinearity gate before anyone
    interprets X299's grouped OLS coefficients (VIF > 5 means the
    coefficient's sign is not to be trusted). Everything reduces to
    nine exact BIGINT moments; one closed form per factor.

    Scale shape: one per-user pass, one scalar moment agg, O(1)
    arithmetic."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("x1"),
            F.sum(F.expr("CAST(event_type = 'view' AS LONG)")).alias("x2"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("x3"),
        )
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"x{i}").alias(f"s{i}") for i in (1, 2, 3)],
        *[F.sum(F.expr(f"x{i}*x{i}")).alias(f"q{i}") for i in (1, 2, 3)],
        F.sum(F.expr("x1*x2")).alias("p12"),
        F.sum(F.expr("x1*x3")).alias("p13"),
        F.sum(F.expr("x2*x3")).alias("p23"),
    )
    corr = m.select(
        "n",
        *[
            F.expr(
                f"(CAST(p{a}{b} AS DOUBLE) - CAST(s{a} AS DOUBLE)*s{b}/n)"
                f"/SQRT((CAST(q{a} AS DOUBLE) - CAST(s{a} AS DOUBLE)*s{a}/n)"
                f"     *(CAST(q{b} AS DOUBLE) - CAST(s{b} AS DOUBLE)*s{b}/n))"
            ).alias(f"r{a}{b}")
            for a, b in ((1, 2), (1, 3), (2, 3))
        ],
    )

    return corr.select(
        F.col("n").alias("n_users"),
        F.expr("ROUND(r12, 6)").alias("corr_click_view"),
        F.expr("ROUND(r13, 6)").alias("corr_click_purchase"),
        F.expr("ROUND(r23, 6)").alias("corr_view_purchase"),
        F.expr(
            "ROUND(1.0/(1.0 - (r12*r12 + r13*r13 - 2*r12*r13*r23)"
            "/(1.0 - r23*r23)), 4)"
        ).alias("vif_clicks"),
        F.expr(
            "ROUND(1.0/(1.0 - (r12*r12 + r23*r23 - 2*r12*r23*r13)"
            "/(1.0 - r13*r13)), 4)"
        ).alias("vif_views"),
        F.expr(
            "ROUND(1.0/(1.0 - (r13*r13 + r23*r23 - 2*r13*r23*r12)"
            "/(1.0 - r12*r12)), 4)"
        ).alias("vif_purchases"),
    )


EXT_VIF_SQL = r"""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS x1,
         CAST(SUM(CAST(event_type = 'view' AS BIGINT)) AS BIGINT) AS x2,
         CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS x3
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(x3) AS BIGINT) AS s3,
         CAST(SUM(x1*x1) AS BIGINT) AS q1, CAST(SUM(x2*x2) AS BIGINT) AS q2,
         CAST(SUM(x3*x3) AS BIGINT) AS q3,
         CAST(SUM(x1*x2) AS BIGINT) AS p12,
         CAST(SUM(x1*x3) AS BIGINT) AS p13,
         CAST(SUM(x2*x3) AS BIGINT) AS p23
  FROM u
),
corr AS (
  SELECT n,
         (CAST(p12 AS DOUBLE) - CAST(s1 AS DOUBLE)*s2/n)
           /SQRT((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)
                *(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n)) AS r12,
         (CAST(p13 AS DOUBLE) - CAST(s1 AS DOUBLE)*s3/n)
           /SQRT((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)
                *(CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE)*s3/n)) AS r13,
         (CAST(p23 AS DOUBLE) - CAST(s2 AS DOUBLE)*s3/n)
           /SQRT((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n)
                *(CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE)*s3/n)) AS r23
  FROM m
)
SELECT n AS n_users,
       ROUND(r12, 6) AS corr_click_view,
       ROUND(r13, 6) AS corr_click_purchase,
       ROUND(r23, 6) AS corr_view_purchase,
       ROUND(1.0/(1.0 - (r12*r12 + r13*r13 - 2*r12*r13*r23)
             /(1.0 - r23*r23)), 4) AS vif_clicks,
       ROUND(1.0/(1.0 - (r12*r12 + r23*r23 - 2*r12*r23*r13)
             /(1.0 - r13*r13)), 4) AS vif_views,
       ROUND(1.0/(1.0 - (r13*r13 + r23*r23 - 2*r13*r23*r12)
             /(1.0 - r12*r12)), 4) AS vif_purchases
FROM corr
"""


EXT_QUERIES.update({"ext_vif": ext_vif})
EXT_ORACLES.update({"ext_vif": EXT_VIF_SQL})


# --- round-5 wave: competing-risks cumulative incidence ------------------------------


def ext_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competing-risks cumulative incidence: users race toward their
    FIRST purchase or FIRST error (whichever comes first — the other
    event is then never their first outcome), and the CIF at 7/14/21/
    28-day horizons from the window start splits the population into
    converted-first, errored-first, and still-at-risk — the
    two-destination picture X196's single-event survival curve cannot
    draw (naive per-event KM overestimates both). Exact first-event
    selection via min-struct; exact integer day horizons.

    Scale shape: one per-user conditional-min agg, a 4-horizon literal
    explode over the O(users) collapse, exact counts."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr(
                    "CASE WHEN event_type = 'purchase'"
                    " THEN STRUCT(unix_micros(ts) AS us, event_id) END"
                )
            ).alias("fp"),
            F.min(
                F.expr(
                    "CASE WHEN event_type = 'error'"
                    " THEN STRUCT(unix_micros(ts) AS us, event_id) END"
                )
            ).alias("fe"),
        )
        .select(
            F.expr(
                "CASE WHEN fp IS NULL AND fe IS NULL THEN NULL"
                " WHEN fe IS NULL OR (fp IS NOT NULL AND fp < fe) THEN 'purchase'"
                " ELSE 'error' END"
            ).alias("outcome"),
            F.expr(
                "CASE WHEN fp IS NULL AND fe IS NULL THEN NULL"
                " WHEN fe IS NULL OR (fp IS NOT NULL AND fp < fe) THEN fp.us"
                " ELSE fe.us END"
            ).alias("t_us"),
        )
    )
    grid = u.crossJoin(
        F.broadcast(
            _t(spark, sf_dir, "events")
            .limit(1)
            .select(F.explode(F.expr("array(7, 14, 21, 28)")).alias("h"))
        )
    )
    t0 = "UNIX_MICROS(TIMESTAMP'2024-01-01 00:00:00')"
    return (
        grid.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.expr(
                    f"CAST(outcome = 'purchase' AND t_us < {t0} + h*86400000000L"
                    " AS LONG)"
                )
            ).alias("n_purchase_first"),
            F.sum(
                F.expr(
                    f"CAST(outcome = 'error' AND t_us < {t0} + h*86400000000L"
                    " AS LONG)"
                )
            ).alias("n_error_first"),
        )
        .select(
            F.col("h").alias("horizon_days"),
            "n_users",
            F.expr(
                "ROUND(CAST(n_purchase_first AS DOUBLE)/n_users, 6)"
            ).alias("cif_purchase"),
            F.expr(
                "ROUND(CAST(n_error_first AS DOUBLE)/n_users, 6)"
            ).alias("cif_error"),
            F.expr(
                "ROUND(1.0 - CAST(n_purchase_first + n_error_first AS DOUBLE)"
                "/n_users, 6)"
            ).alias("at_risk_share"),
        )
        .orderBy("horizon_days")
    )


EXT_COMPETING_RISKS_SQL = r"""
WITH u AS (
  SELECT CASE WHEN fp IS NULL AND fe IS NULL THEN NULL
              WHEN fe IS NULL OR (fp IS NOT NULL AND fp < fe) THEN 'purchase'
              ELSE 'error' END AS outcome,
         CASE WHEN fp IS NULL AND fe IS NULL THEN NULL
              WHEN fe IS NULL OR (fp IS NOT NULL AND fp < fe) THEN fp.us
              ELSE fe.us END AS t_us
  FROM (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'purchase'
                    THEN {'us': epoch_us(ts), 'eid': event_id} END) AS fp,
           MIN(CASE WHEN event_type = 'error'
                    THEN {'us': epoch_us(ts), 'eid': event_id} END) AS fe
    FROM events GROUP BY user_id
  )
),
grid AS (
  SELECT u.outcome, u.t_us, h.h
  FROM u CROSS JOIN (SELECT UNNEST([7, 14, 21, 28]) AS h) h
)
SELECT h AS horizon_days,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(CAST(outcome = 'purchase'
             AND t_us < epoch_us(TIMESTAMP '2024-01-01 00:00:00')
                 + h*86400000000 AS BIGINT)) AS DOUBLE)/COUNT(*), 6)
         AS cif_purchase,
       ROUND(CAST(SUM(CAST(outcome = 'error'
             AND t_us < epoch_us(TIMESTAMP '2024-01-01 00:00:00')
                 + h*86400000000 AS BIGINT)) AS DOUBLE)/COUNT(*), 6)
         AS cif_error,
       ROUND(1.0 - CAST(SUM(CAST(t_us < epoch_us(TIMESTAMP '2024-01-01 00:00:00')
                 + h*86400000000 AS BIGINT)) AS DOUBLE)/COUNT(*), 6)
         AS at_risk_share
FROM grid GROUP BY h ORDER BY h
"""


EXT_QUERIES.update({"ext_competing_risks": ext_competing_risks})
EXT_ORACLES.update({"ext_competing_risks": EXT_COMPETING_RISKS_SQL})


# --- round-5 wave: Taylor's law (fluctuation scaling) --------------------------------


def ext_taylors_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's law on item demand: regress ln(variance) on ln(mean) of
    each item's daily event counts (observed days, documented) — the
    fluctuation-scaling exponent b in var = a*mean^b. b near 1 means
    Poisson-like independent demand, b near 2 means synchronized
    bursts; the number that decides whether per-item safety stocks can
    pool (X288's newsvendor assumes the answer). Per-item moments are
    exact integers; the ln-ln fit runs on the bounded O(catalog) axis.

    Scale shape: one (item, day) rollup, one per-item moment agg over
    the bounded catalog, O(items) fit arithmetic."""
    idc = (
        _t(spark, sf_dir, "events")
        .select(
            F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("item"),
            F.expr("CAST(ts AS DATE)").alias("day"),
        )
        .filter(F.col("item").isNotNull())
        .groupBy("item", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_item = (
        idc.groupBy("item")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum("c").alias("s"),
            F.sum(F.expr("c*c")).alias("q"),
        )
        .filter("nd >= 5")
        .select(
            "item",
            F.expr("CAST(s AS DOUBLE)/nd").alias("mean"),
            F.expr(
                "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE)*s/nd)/(nd - 1)"
            ).alias("var"),
        )
        .filter("var > 0")
        .select(F.expr("LN(mean)").alias("x"), F.expr("LN(var)").alias("y"))
    )
    fit = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x*x")).alias("sxx"),
        F.sum(F.expr("y*y")).alias("syy"),
        F.sum(F.expr("x*y")).alias("sxy"),
    )
    return fit.select(
        "n_items",
        F.expr(
            "ROUND((sxy - sx*sy/n_items)/(sxx - sx*sx/n_items), 4)"
        ).alias("taylor_exponent"),
        F.expr(
            "ROUND(sy/n_items"
            " - (sxy - sx*sy/n_items)/(sxx - sx*sx/n_items)*sx/n_items, 4)"
        ).alias("ln_intercept"),
        F.expr(
            "ROUND(POW(sxy - sx*sy/n_items, 2)"
            "/((sxx - sx*sx/n_items)*(syy - sy*sy/n_items)), 4)"
        ).alias("r2"),
    )


EXT_TAYLORS_LAW_SQL = r"""
WITH idc AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
         CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
  GROUP BY 1, 2
),
per_item AS (
  SELECT LN(mean) AS x, LN(var) AS y
  FROM (
    SELECT item,
           CAST(SUM(c) AS DOUBLE)/COUNT(*) AS mean,
           (CAST(SUM(c*c) AS DOUBLE)
            - CAST(SUM(c) AS DOUBLE)*SUM(c)/COUNT(*))/(COUNT(*) - 1) AS var
    FROM idc GROUP BY item HAVING COUNT(*) >= 5
  )
  WHERE var > 0
),
fit AS (
  SELECT COUNT(*) AS n_items,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM per_item
)
SELECT CAST(n_items AS BIGINT) AS n_items,
       ROUND((sxy - sx*sy/n_items)/(sxx - sx*sx/n_items), 4) AS taylor_exponent,
       ROUND(sy/n_items
             - (sxy - sx*sy/n_items)/(sxx - sx*sx/n_items)*sx/n_items, 4)
         AS ln_intercept,
       ROUND(POW(sxy - sx*sy/n_items, 2)
             /((sxx - sx*sx/n_items)*(syy - sy*sy/n_items)), 4) AS r2
FROM fit
"""


EXT_QUERIES.update({"ext_taylors_law": ext_taylors_law})
EXT_ORACLES.update({"ext_taylors_law": EXT_TAYLORS_LAW_SQL})
