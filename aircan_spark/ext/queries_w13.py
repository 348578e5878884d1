"""Declared-query waves: round-5 wave: grouped ridge regression (closed-form
3x3 normal equations); round-5 wave: SPRT sequential A/B monitor; round-5
wave: Pareto knee point (integer-exact chord distance); round-5 wave:
Weiszfeld geometric median (fixed 2 iterations); round-5 wave: conditional
Poisson rate-ratio test (weekend vs weekday).

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: same rules as queries_w10-w12 — exact integer sums, identical
double expression trees, e-notation float literals, decimal-rounded term
sums for ln/sqrt term families; 3x3 determinants expand integer moments
into doubles BEFORE multiplying (triple products overflow BIGINT) with
the identical association both engines.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w12 import *  # noqa: F401,F403


# --- round-5 wave: grouped ridge regression (3x3 closed form) -----------------

_RIDGE_MAT = (
    "CAST(n AS DOUBLE) AS a11, CAST(sx1 AS DOUBLE) AS a12, CAST(sx2 AS DOUBLE) AS a13,"
    " CAST(sx1 AS DOUBLE) AS a21, CAST(s11 + 10 AS DOUBLE) AS a22, CAST(s12 AS DOUBLE) AS a23,"
    " CAST(sx2 AS DOUBLE) AS a31, CAST(s12 AS DOUBLE) AS a32, CAST(s22 + 10 AS DOUBLE) AS a33,"
    " CAST(sy AS DOUBLE) AS b1, CAST(sy1 AS DOUBLE) AS b2, CAST(sy2 AS DOUBLE) AS b3"
)
_DET = "{p}11*({p}22*{p}33 - {p}23*{p}32) - {p}12*({p}21*{p}33 - {p}23*{p}31) + {p}13*({p}21*{p}32 - {p}22*{p}31)"


def _ridge_det(prefix: str) -> str:
    return _DET.format(p=prefix)


_RIDGE_SOLVE = (
    f"({_DET.format(p='a')}) AS det,"
    " (b1*(a22*a33 - a23*a32) - a12*(b2*a33 - a23*b3) + a13*(b2*a32 - a22*b3)) AS det0,"
    " (a11*(b2*a33 - a23*b3) - b1*(a21*a33 - a23*a31) + a13*(a21*b3 - b2*a31)) AS det1,"
    " (a11*(a22*b3 - b2*a32) - a12*(a21*b3 - b2*a31) + b1*(a21*a32 - a22*a31)) AS det2"
)


def ext_grouped_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Massively-grouped RIDGE regression (lambda=10 on the non-intercept
    diagonal): per brand, quantity on discount and tax solved by the
    closed-form 3x3 normal equations via Cramer's rule — the
    'millions of small regularized models' pattern where the grouped
    sufficient-statistics solve replaces any model-parallel framework.
    The ten moments are exact BIGINT sums from ONE hash aggregate; the
    determinants expand those integers into doubles before multiplying
    (triple products would overflow int64) with the identical
    association on both engines.

    Extends ext_grouped_ols (queries_w08) from simple to multiple
    regularized regression. Scale shape: one map-side-combinable agg;
    solves are row-local arithmetic on the O(brands) frame."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("yy"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x1"),
        F.round(F.col("l_tax") * 100).cast("long").alias("x2"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    m = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x1").alias("sx1"),
            F.sum("x2").alias("sx2"),
            F.sum("yy").alias("sy"),
            F.sum(F.expr("x1*x1")).alias("s11"),
            F.sum(F.expr("x1*x2")).alias("s12"),
            F.sum(F.expr("x2*x2")).alias("s22"),
            F.sum(F.expr("yy*x1")).alias("sy1"),
            F.sum(F.expr("yy*x2")).alias("sy2"),
        )
    )
    mat = m.selectExpr("p_brand", "n", *[e.strip() for e in _RIDGE_MAT.split(",")])
    solved = mat.selectExpr(
        "p_brand", "n", *[e.strip() for e in _RIDGE_SOLVE.split(",")]
    )
    return (
        solved.select(
            "p_brand",
            "n",
            F.expr("ROUND(det0/det, 6)").alias("beta_intercept"),
            F.expr("ROUND(det1/det, 6)").alias("beta_discount"),
            F.expr("ROUND(det2/det, 6)").alias("beta_tax"),
        )
        .orderBy("p_brand")
    )


EXT_GROUPED_RIDGE_SQL = rf"""
WITH v AS (
  SELECT p_brand, CAST(l_quantity AS BIGINT) AS yy,
         CAST(ROUND(l_discount*100) AS BIGINT) AS x1,
         CAST(ROUND(l_tax*100) AS BIGINT) AS x2
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
m AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(yy) AS BIGINT) AS sy,
         CAST(SUM(x1*x1) AS BIGINT) AS s11, CAST(SUM(x1*x2) AS BIGINT) AS s12,
         CAST(SUM(x2*x2) AS BIGINT) AS s22,
         CAST(SUM(yy*x1) AS BIGINT) AS sy1, CAST(SUM(yy*x2) AS BIGINT) AS sy2
  FROM v GROUP BY p_brand
),
mat AS (
  SELECT p_brand, n, {_RIDGE_MAT} FROM m
),
solved AS (
  SELECT p_brand, n, {_RIDGE_SOLVE} FROM mat
)
SELECT p_brand, n,
       ROUND(det0/det, 6) AS beta_intercept,
       ROUND(det1/det, 6) AS beta_discount,
       ROUND(det2/det, 6) AS beta_tax
FROM solved ORDER BY p_brand
"""


EXT_QUERIES.update({"ext_grouped_ridge": ext_grouped_ridge})
EXT_ORACLES.update({"ext_grouped_ridge": EXT_GROUPED_RIDGE_SQL})


# --- round-5 wave: SPRT sequential monitor ------------------------------------


def ext_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential monitor over the order stream grouped by day:
    H0: P(orderstatus='F') = 0.3 vs H1: p = 0.35, alpha = beta = 0.05 —
    the always-valid sequential test that lets a pipeline stop a
    data-quality experiment the day the evidence crosses ln(19). The
    per-day (n, k) counts are exact integers; the cumulative LLR is
    k*ln(p1/p0) + (n-k)*ln(q1/q0) over cumulative counts (identical
    expression both engines); output is the decision summary plus
    boundary-crossing days.

    Scale shape: one day hash agg over orders; the cumulative window
    runs on the O(days) axis only."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(o_orderstatus = 'F' AS LONG)")).alias("k"),
        )
    )
    w = Window.orderBy("day")
    cum = daily.select(
        "day",
        F.sum("n").over(w).alias("cn"),
        F.sum("k").over(w).alias("ck"),
    ).select(
        "day",
        "cn",
        "ck",
        F.expr(
            "ck*LN(0.35e0/0.3e0) + (cn - ck)*LN(0.65e0/0.7e0)"
        ).alias("llr"),
    )
    return (
        cum.join(
            cum.agg(
                F.min(
                    F.expr("CASE WHEN llr >= LN(19e0) THEN day END")
                ).alias("first_accept_h1"),
                F.min(
                    F.expr("CASE WHEN llr <= -LN(19e0) THEN day END")
                ).alias("first_accept_h0"),
                F.max("day").alias("last_day"),
            )
        )
        .filter(F.col("day") == F.col("last_day"))
        .select(
            F.col("cn").alias("n_total"),
            F.col("ck").alias("k_total"),
            F.expr("ROUND(llr, 6)").alias("final_llr"),
            "first_accept_h1",
            "first_accept_h0",
            F.expr(
                "CASE WHEN first_accept_h1 IS NOT NULL"
                " AND (first_accept_h0 IS NULL OR first_accept_h1 < first_accept_h0)"
                " THEN 'accept_h1'"
                " WHEN first_accept_h0 IS NOT NULL THEN 'accept_h0'"
                " ELSE 'continue' END"
            ).alias("decision"),
        )
    )


EXT_SPRT_MONITOR_SQL = r"""
WITH daily AS (
  SELECT o_orderdate AS day, COUNT(*) AS n,
         CAST(SUM(CAST(o_orderstatus = 'F' AS BIGINT)) AS BIGINT) AS k
  FROM orders GROUP BY 1
),
cum AS (
  SELECT day,
         CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cn,
         CAST(SUM(k) OVER (ORDER BY day) AS BIGINT) AS ck
  FROM daily
),
llr AS (
  SELECT day, cn, ck,
         ck*LN(0.35e0/0.3e0) + (cn - ck)*LN(0.65e0/0.7e0) AS llr
  FROM cum
),
b AS (
  SELECT MIN(CASE WHEN llr >= LN(19e0) THEN day END) AS first_accept_h1,
         MIN(CASE WHEN llr <= -LN(19e0) THEN day END) AS first_accept_h0,
         MAX(day) AS last_day
  FROM llr
)
SELECT l.cn AS n_total, l.ck AS k_total, ROUND(l.llr, 6) AS final_llr,
       b.first_accept_h1, b.first_accept_h0,
       CASE WHEN b.first_accept_h1 IS NOT NULL
                 AND (b.first_accept_h0 IS NULL OR b.first_accept_h1 < b.first_accept_h0)
            THEN 'accept_h1'
            WHEN b.first_accept_h0 IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM llr l CROSS JOIN b WHERE l.day = b.last_day
"""


EXT_QUERIES.update({"ext_sprt_monitor": ext_sprt_monitor})
EXT_ORACLES.update({"ext_sprt_monitor": EXT_SPRT_MONITOR_SQL})


# --- round-5 wave: Pareto knee point ------------------------------------------


def ext_pareto_knee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knee of the customer revenue concentration curve: the rank where
    the cumulative-share curve is farthest above the uniform diagonal —
    the principled 'top-N customers' cutoff (same geometry as kneedle).
    The chord distance is INTEGER-exact (cum_rev*n_cust - rank*total in
    DECIMAL(38) — raw int64 crosses 2^63 at ~sf2.5 since cum_rev tracks
    total cents; r9 salted-30x smoke catch), so the argmax cannot
    float-flip; ties break to the smallest rank.

    Scale shape: revenue agg to O(customers), one window over the
    aggregated frame (documented single-sort; swap in range-partitioned
    numbering past ~1e7 groups as ext_gini does)."""
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias("r")
        )
    )
    w = Window.orderBy(F.col("r").desc(), F.col("o_custkey").asc())
    cum = rev.select(
        "o_custkey",
        "r",
        F.row_number().over(w).alias("rk"),
        F.sum("r").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cr"),
    )
    tot = rev.agg(
        F.sum("r").alias("t"), F.count(F.lit(1)).alias("nc")
    )
    d = cum.join(F.broadcast(tot)).select(
        # DECIMAL chord distance: cr <= t ~ 3.75e13*SF total cents and
        # nc ~ 1.5e5*SF customers, so the int64 cr*nc product crosses
        # 2^63 at ~sf2.5 (caught by the salted-30x full-registry smoke,
        # r9) — the argmax stays integer-exact in DECIMAL(38)/HUGEINT
        "rk", "cr", "t", "nc",
        F.expr(
            "CAST(cr AS DECIMAL(19,0))*nc - CAST(rk AS DECIMAL(19,0))*t"
        ).alias("d"),
    )
    best = d.orderBy(F.col("d").desc(), F.col("rk").asc()).limit(1)
    return best.select(
        F.col("rk").alias("knee_rank"),
        F.col("nc").alias("n_customers"),
        F.expr("ROUND(CAST(rk AS DOUBLE)/nc, 6)").alias("customer_frac"),
        F.expr("ROUND(CAST(cr AS DOUBLE)/t, 6)").alias("revenue_share"),
    )


EXT_PARETO_KNEE_SQL = r"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY o_custkey
),
cum AS (
  SELECT o_custkey, r,
         ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey ASC) AS rk,
         CAST(SUM(r) OVER (ORDER BY r DESC, o_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr
  FROM rev
),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS t, COUNT(*) AS nc FROM rev),
d AS (
  SELECT rk, cr, t, nc,
         CAST(cr AS HUGEINT)*nc - CAST(rk AS HUGEINT)*t AS d
  FROM cum CROSS JOIN tot
)
SELECT rk AS knee_rank, nc AS n_customers,
       ROUND(CAST(rk AS DOUBLE)/nc, 6) AS customer_frac,
       ROUND(CAST(cr AS DOUBLE)/t, 6) AS revenue_share
FROM d ORDER BY d DESC, rk ASC LIMIT 1
"""


EXT_QUERIES.update({"ext_pareto_knee": ext_pareto_knee})
EXT_ORACLES.update({"ext_pareto_knee": EXT_PARETO_KNEE_SQL})


# --- round-5 wave: Weiszfeld geometric median ---------------------------------


def ext_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric median (L1-optimal 2D center) of the daily activity
    points (clicks, purchases) via TWO fixed Weiszfeld iterations from
    the centroid — the robust-center primitive outliers cannot drag the
    way they drag a mean. Each iteration is one aggregate: inverse-
    distance weights and weighted coordinates are rounded to 12 decimals
    and summed as DECIMAL (order-free); distances guard the d=0
    coincidence with a 1e-9 floor (identical literal both engines).

    Scale shape: points are a day-axis aggregate (O(days)); each
    Weiszfeld round is one scan of that tiny frame with a broadcast
    scalar — the same shape holds for millions of points."""
    pts = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS LONG)")).alias("x"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS LONG)")).alias("y"),
        )
    )
    m0 = pts.agg(
        F.expr("CAST(SUM(x) AS DOUBLE)/COUNT(*)").alias("mx"),
        F.expr("CAST(SUM(y) AS DOUBLE)/COUNT(*)").alias("my"),
    )
    step_exprs = [
        "CAST(SUM(CAST(ROUND(1e0/GREATEST(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 1e-9), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sw",
        "CAST(SUM(CAST(ROUND(x/GREATEST(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 1e-9), 12) AS DECIMAL(28,12))) AS DOUBLE) AS swx",
        "CAST(SUM(CAST(ROUND(y/GREATEST(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 1e-9), 12) AS DECIMAL(28,12))) AS DOUBLE) AS swy",
    ]
    m = m0
    for _ in range(2):
        m = (
            pts.join(F.broadcast(m))
            .agg(*[F.expr(e) for e in step_exprs])
            .select(
                F.expr("swx/sw").alias("mx"), F.expr("swy/sw").alias("my")
            )
        )
    obj = (
        pts.join(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.expr(
                "CAST(SUM(CAST(ROUND(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 12)"
                " AS DECIMAL(28,12))) AS DOUBLE)"
            ).alias("objective"),
            F.max("mx").alias("mx"),
            F.max("my").alias("my"),
        )
    )
    return obj.select(
        "n_points",
        F.expr("ROUND(mx, 4)").alias("median_x"),
        F.expr("ROUND(my, 4)").alias("median_y"),
        F.expr("ROUND(objective, 4)").alias("objective"),
    )


_GEOMED_STEP = (
    "SELECT "
    "CAST(SUM(CAST(ROUND(1e0/GREATEST(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 1e-9), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sw, "
    "CAST(SUM(CAST(ROUND(x/GREATEST(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 1e-9), 12) AS DECIMAL(28,12))) AS DOUBLE) AS swx, "
    "CAST(SUM(CAST(ROUND(y/GREATEST(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 1e-9), 12) AS DECIMAL(28,12))) AS DOUBLE) AS swy "
    "FROM pts CROSS JOIN {prev}"
)
EXT_GEOMETRIC_MEDIAN_SQL = (
    r"""
WITH pts AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
m0 AS (
  SELECT CAST(SUM(x) AS DOUBLE)/COUNT(*) AS mx, CAST(SUM(y) AS DOUBLE)/COUNT(*) AS my
  FROM pts
),
s1 AS ("""
    + _GEOMED_STEP.format(prev="m0")
    + r"""),
m1 AS (SELECT swx/sw AS mx, swy/sw AS my FROM s1),
s2 AS ("""
    + _GEOMED_STEP.format(prev="m1")
    + r"""),
m2 AS (SELECT swx/sw AS mx, swy/sw AS my FROM s2)
SELECT COUNT(*) AS n_points,
       ROUND(MAX(mx), 4) AS median_x,
       ROUND(MAX(my), 4) AS median_y,
       ROUND(CAST(SUM(CAST(ROUND(SQRT((x - mx)*(x - mx) + (y - my)*(y - my)), 12) AS DECIMAL(28,12))) AS DOUBLE), 4) AS objective
FROM pts CROSS JOIN m2
"""
)


EXT_QUERIES.update({"ext_geometric_median": ext_geometric_median})
EXT_ORACLES.update({"ext_geometric_median": EXT_GEOMETRIC_MEDIAN_SQL})


# --- round-5 wave: conditional Poisson rate-ratio test ------------------------


def ext_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday event-rate comparison per type via the
    conditional (binomial) Poisson test: given k = k_we + k_wd events,
    under equal rates k_we ~ Bin(k, t_we/(t_we+t_wd)) where the
    exposures are the exact weekend/weekday day counts of the observed
    span — z = (k_we - k*p)/sqrt(k*p*(1-p)) flags types with genuine
    weekly rhythm. Weekday parity uses epoch-day arithmetic (no engine
    dayofweek convention); everything is integer until the final z.

    Scale shape: two tiny aggs (day classification, per-type counts)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST((DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') % 7 + 7) % 7 >= 5"
            " AS LONG)"
        ).alias("is_we"),
        F.expr("CAST(ts AS DATE)").alias("day"),
    )
    days = ev.select("day", "is_we").distinct().agg(
        F.sum("is_we").alias("t_we"),
        F.sum(F.expr("1 - is_we")).alias("t_wd"),
    )
    per = ev.groupBy("event_type").agg(
        F.sum("is_we").alias("k_we"), F.sum(F.expr("1 - is_we")).alias("k_wd")
    )
    return (
        per.join(F.broadcast(days))
        .select(
            "event_type",
            "k_we",
            "k_wd",
            "t_we",
            "t_wd",
            F.expr("ROUND(CAST(k_we AS DOUBLE)/t_we, 6)").alias("rate_weekend"),
            F.expr("ROUND(CAST(k_wd AS DOUBLE)/t_wd, 6)").alias("rate_weekday"),
            F.expr(
                "ROUND((k_we - (k_we + k_wd)*(CAST(t_we AS DOUBLE)/(t_we + t_wd)))"
                "/SQRT((k_we + k_wd)*(CAST(t_we AS DOUBLE)/(t_we + t_wd))"
                "*(1 - CAST(t_we AS DOUBLE)/(t_we + t_wd))), 6)"
            ).alias("z"),
        )
        .orderBy("event_type")
    )


EXT_POISSON_RATE_TEST_SQL = r"""
WITH ev AS (
  SELECT event_type,
         CAST((DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 + 7) % 7 >= 5 AS BIGINT) AS is_we,
         CAST(ts AS DATE) AS day
  FROM events
),
days AS (
  SELECT CAST(SUM(is_we) AS BIGINT) AS t_we, CAST(SUM(1 - is_we) AS BIGINT) AS t_wd
  FROM (SELECT DISTINCT day, is_we FROM ev)
),
per AS (
  SELECT event_type, CAST(SUM(is_we) AS BIGINT) AS k_we,
         CAST(SUM(1 - is_we) AS BIGINT) AS k_wd
  FROM ev GROUP BY event_type
)
SELECT event_type, k_we, k_wd, t_we, t_wd,
       ROUND(CAST(k_we AS DOUBLE)/t_we, 6) AS rate_weekend,
       ROUND(CAST(k_wd AS DOUBLE)/t_wd, 6) AS rate_weekday,
       ROUND((k_we - (k_we + k_wd)*(CAST(t_we AS DOUBLE)/(t_we + t_wd)))
          /SQRT((k_we + k_wd)*(CAST(t_we AS DOUBLE)/(t_we + t_wd))
          *(1 - CAST(t_we AS DOUBLE)/(t_we + t_wd))), 6) AS z
FROM per CROSS JOIN days ORDER BY event_type
"""


EXT_QUERIES.update({"ext_poisson_rate_test": ext_poisson_rate_test})
EXT_ORACLES.update({"ext_poisson_rate_test": EXT_POISSON_RATE_TEST_SQL})
