"""Declared-query waves: round-5 wave: Benjamini-Hochberg FDR over the
per-type experiment family; round-5 wave: Qini uplift curve on the
collapsed score axis; round-5 wave: doubly-robust (AIPW) treatment
effect.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: every statistic reduces to exact BIGINT moments first;
float arithmetic only enters on the tiny collapsed axis (types, scores,
brands) through expressions written identically in both engines.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w23 import *  # noqa: F401,F403


# --- round-5 wave: Benjamini-Hochberg FDR --------------------------------------


def ext_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-event-type experiment
    family: each event type runs the md5-arm Welch comparison of mean
    value, p-values come from the logistic approximation of the normal
    CDF (p = 2/(1+exp(1.702|z|)) — the same closed form in BOTH
    engines, so parity is exact), and BH at q = 0.10 rejects every rank
    up to the largest i with p_(i) <= i/m * q — the multiplicity
    correction any metrics platform needs once it tests one experiment
    against many metrics at once.

    Scale shape: one grouped pass collapses the fact table to exact
    BIGINT moments per (type, arm); ranking and the BH sweep run on the
    O(types) axis."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 2"
        ).alias("arm"),
        F.expr("CAST(ROUND(value*100) AS BIGINT)").alias("yc"),
    )
    m = ev.groupBy("event_type").agg(
        F.sum(F.expr("CAST(arm = 0 AS LONG)")).alias("na"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN yc ELSE 0 END")).alias("sa"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN yc*yc ELSE 0 END")).alias("qa"),
        F.sum(F.expr("CAST(arm = 1 AS LONG)")).alias("nb"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN yc ELSE 0 END")).alias("sb"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN yc*yc ELSE 0 END")).alias("qb"),
    )
    z = m.select(
        "event_type",
        "na",
        "nb",
        F.expr(
            "(CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)"
            " / SQRT((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)*sa/na)/(na - 1)/na"
            "      + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)*sb/nb)/(nb - 1)/nb)"
        ).alias("zval"),
    ).select(
        "event_type",
        "na",
        "nb",
        "zval",
        F.expr("2.0/(1.0 + EXP(1.702*ABS(zval)))").alias("pval"),
    )
    wr = Window.orderBy("pval", "event_type")
    wall = Window.partitionBy()
    ranked = (
        z.withColumn("rnk", F.row_number().over(wr))
        .withColumn("mtests", F.count(F.lit(1)).over(wall))
        .withColumn(
            "crit", F.expr("CAST(rnk AS DOUBLE)/mtests*0.10")
        )
        .withColumn(
            "istar",
            F.max(F.expr("CASE WHEN pval <= crit THEN rnk END")).over(wall),
        )
    )
    return ranked.select(
        "event_type",
        "na",
        "nb",
        F.round("zval", 4).alias("z"),
        F.round("pval", 6).alias("p"),
        F.col("rnk").alias("p_rank"),
        F.round("crit", 6).alias("bh_crit"),
        F.expr("CAST(COALESCE(rnk <= istar, FALSE) AS INT)").alias("rejected"),
    ).orderBy("p_rank")


EXT_FDR_BH_SQL = r"""
WITH ev AS (
  SELECT event_type,
         CAST(('0x' || SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2
              AS BIGINT) AS arm,
         CAST(ROUND(value*100) AS BIGINT) AS yc
  FROM events
),
m AS (
  SELECT event_type,
         CAST(SUM(CAST(arm = 0 AS BIGINT)) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN arm = 0 THEN yc ELSE 0 END) AS BIGINT) AS sa,
         CAST(SUM(CASE WHEN arm = 0 THEN yc*yc ELSE 0 END) AS BIGINT) AS qa,
         CAST(SUM(CAST(arm = 1 AS BIGINT)) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN arm = 1 THEN yc ELSE 0 END) AS BIGINT) AS sb,
         CAST(SUM(CASE WHEN arm = 1 THEN yc*yc ELSE 0 END) AS BIGINT) AS qb
  FROM ev GROUP BY event_type
),
z AS (
  SELECT event_type, na, nb,
         (CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)
           / SQRT((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)*sa/na)/(na - 1)/na
                + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)*sb/nb)/(nb - 1)/nb)
           AS zval
  FROM m
),
p AS (
  SELECT event_type, na, nb, zval,
         2.0/(1.0 + EXP(1.702*ABS(zval))) AS pval
  FROM z
),
ranked AS (
  SELECT event_type, na, nb, zval, pval,
         ROW_NUMBER() OVER (ORDER BY pval, event_type) AS rnk,
         COUNT(*) OVER () AS mtests
  FROM p
),
crit AS (
  SELECT *, CAST(rnk AS DOUBLE)/mtests*0.10 AS crit,
         MAX(CASE WHEN pval <= CAST(rnk AS DOUBLE)/mtests*0.10 THEN rnk END)
           OVER () AS istar
  FROM ranked
)
SELECT event_type, na, nb,
       ROUND(zval, 4) AS z,
       ROUND(pval, 6) AS p,
       rnk AS p_rank,
       ROUND(crit, 6) AS bh_crit,
       CAST(COALESCE(rnk <= istar, FALSE) AS INTEGER) AS rejected
FROM crit ORDER BY p_rank
"""


EXT_QUERIES.update({"ext_fdr_bh": ext_fdr_bh})
EXT_ORACLES.update({"ext_fdr_bh": EXT_FDR_BH_SQL})


# --- round-5 wave: Qini uplift curve -------------------------------------------


def ext_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve for the md5-arm experiment, scored by user
    engagement (click count) and measured on purchases: at each
    distinct score threshold (descending), the incremental purchases
    the treated group shows over the control group scaled to the
    treated population — Qini(s) = cumY_t - cumY_c * cumN_t/cumN_c.
    The curve a targeting model is judged by, computed exactly at every
    group boundary rather than via a global per-user ranking.

    Scale shape: per-user agg, then the entire curve runs on the
    COLLAPSED O(distinct scores) axis — no global row ranking, no
    per-user window."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("score"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("y"),
        )
        .select(
            "score",
            "y",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 2"
            ).alias("treat"),
        )
    )
    counts = users.groupBy("score").agg(
        F.sum(F.expr("CAST(treat = 1 AS LONG)")).alias("nt"),
        F.sum(F.expr("CASE WHEN treat = 1 THEN y ELSE 0 END")).alias("yt"),
        F.sum(F.expr("CAST(treat = 0 AS LONG)")).alias("nc"),
        F.sum(F.expr("CASE WHEN treat = 0 THEN y ELSE 0 END")).alias("yc"),
    )
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        counts.withColumn("cnt", F.sum("nt").over(wc))
        .withColumn("cyt", F.sum("yt").over(wc))
        .withColumn("cnc", F.sum("nc").over(wc))
        .withColumn("cyc", F.sum("yc").over(wc))
    )
    return cum.select(
        "score",
        F.expr("cnt + cnc").alias("cum_users"),
        "cnt",
        "cnc",
        F.expr(
            "CASE WHEN cnc > 0 THEN"
            " ROUND(cyt - CAST(cyc AS DOUBLE)*cnt/cnc, 4) END"
        ).alias("qini"),
        F.expr(
            "CASE WHEN cnt > 0 AND cnc > 0 THEN"
            " ROUND(CAST(cyt AS DOUBLE)/cnt - CAST(cyc AS DOUBLE)/cnc, 6) END"
        ).alias("uplift_rate"),
    ).orderBy(F.col("score").desc())


EXT_QINI_UPLIFT_SQL = r"""
WITH users AS (
  SELECT CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS score,
         CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS y,
         CAST(('0x' || SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2
              AS BIGINT) AS treat
  FROM events GROUP BY user_id
),
counts AS (
  SELECT score,
         CAST(SUM(CAST(treat = 1 AS BIGINT)) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT) AS yt,
         CAST(SUM(CAST(treat = 0 AS BIGINT)) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN treat = 0 THEN y ELSE 0 END) AS BIGINT) AS yc
  FROM users GROUP BY score
),
cum AS (
  SELECT score,
         SUM(nt) OVER w AS cnt, SUM(yt) OVER w AS cyt,
         SUM(nc) OVER w AS cnc, SUM(yc) OVER w AS cyc
  FROM counts
  WINDOW w AS (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT score,
       CAST(cnt + cnc AS BIGINT) AS cum_users,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(cnc AS BIGINT) AS cnc,
       CASE WHEN cnc > 0 THEN
         ROUND(cyt - CAST(cyc AS DOUBLE)*cnt/cnc, 4) END AS qini,
       CASE WHEN cnt > 0 AND cnc > 0 THEN
         ROUND(CAST(cyt AS DOUBLE)/cnt - CAST(cyc AS DOUBLE)/cnc, 6) END
         AS uplift_rate
FROM cum ORDER BY score DESC
"""


EXT_QUERIES.update({"ext_qini_uplift": ext_qini_uplift})
EXT_ORACLES.update({"ext_qini_uplift": EXT_QINI_UPLIFT_SQL})


# --- round-5 wave: doubly-robust (AIPW) ATE ------------------------------------


def ext_dr_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust (AIPW) treatment effect on the deep-discount
    question (same setting as X279's IPS estimator): per-brand clipped
    propensities weight the residuals of a GLOBAL two-arm outcome model
    (overall treated/control means), so the estimate stays consistent
    if EITHER the propensity model OR the outcome model is right —
    the augmentation that distinguishes AIPW from plain IPS. Every
    per-row term is constant within (brand, arm), so the whole
    estimator reduces to exact BIGINT brand moments; float arithmetic
    happens once per brand.

    Scale shape: one grouped pass to O(brands) exact moments; the
    AIPW combination runs on that tiny axis."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount") >= 0.05).cast("int").alias("t"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    bm = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.sum("t").alias("n1"),
            F.sum(F.expr("CASE WHEN t = 1 THEN qc ELSE 0 END")).alias("s1"),
            F.sum(F.expr("CAST(1 - t AS LONG)")).alias("n0"),
            F.sum(F.expr("CASE WHEN t = 0 THEN qc ELSE 0 END")).alias("s0"),
        )
    )
    tot = bm.agg(
        F.sum("n1").alias("tn1"),
        F.sum("s1").alias("ts1"),
        F.sum("n0").alias("tn0"),
        F.sum("s0").alias("ts0"),
    )
    j = bm.crossJoin(F.broadcast(tot)).select(
        "p_brand",
        "n1",
        "s1",
        "n0",
        "s0",
        F.expr("CAST(ts1 AS DOUBLE)/tn1").alias("mu1"),
        F.expr("CAST(ts0 AS DOUBLE)/tn0").alias("mu0"),
        F.expr(
            "LEAST(GREATEST(CAST(n1 AS DOUBLE)/(n1 + n0), 0.05), 0.95)"
        ).alias("e"),
    )
    est = j.agg(
        F.sum(F.expr("n1 + n0")).alias("n_rows"),
        F.sum(
            F.expr(
                "(n1 + n0)*(mu1 - mu0)"
                " + (s1 - n1*mu1)/e"
                " - (s0 - n0*mu0)/(1.0 - e)"
            )
        ).alias("psi"),
        F.sum(F.expr("(n1 + n0)*e")).alias("esum"),
    )
    return est.select(
        "n_rows",
        F.expr("ROUND(psi/n_rows/100.0, 4)").alias("ate_dr"),
        F.expr("ROUND(esum/n_rows, 6)").alias("mean_propensity"),
    )


EXT_DR_ATE_SQL = r"""
WITH li AS (
  SELECT p.p_brand,
         CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
bm AS (
  SELECT p_brand,
         CAST(SUM(t) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN t = 1 THEN qc ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(1 - t) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN t = 0 THEN qc ELSE 0 END) AS BIGINT) AS s0
  FROM li GROUP BY p_brand
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS tn1, CAST(SUM(s1) AS BIGINT) AS ts1,
         CAST(SUM(n0) AS BIGINT) AS tn0, CAST(SUM(s0) AS BIGINT) AS ts0
  FROM bm
),
j AS (
  SELECT p_brand, n1, s1, n0, s0,
         CAST(ts1 AS DOUBLE)/tn1 AS mu1,
         CAST(ts0 AS DOUBLE)/tn0 AS mu0,
         LEAST(GREATEST(CAST(n1 AS DOUBLE)/(n1 + n0), 0.05), 0.95) AS e
  FROM bm CROSS JOIN tot
)
SELECT CAST(SUM(n1 + n0) AS BIGINT) AS n_rows,
       ROUND(SUM((n1 + n0)*(mu1 - mu0)
                 + (s1 - n1*mu1)/e
                 - (s0 - n0*mu0)/(1.0 - e))
             /SUM(n1 + n0)/100.0, 4) AS ate_dr,
       ROUND(SUM((n1 + n0)*e)/SUM(n1 + n0), 6) AS mean_propensity
FROM j
"""


EXT_QUERIES.update({"ext_dr_ate": ext_dr_ate})
EXT_ORACLES.update({"ext_dr_ate": EXT_DR_ATE_SQL})
