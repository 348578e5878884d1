"""Declared-query waves: round-5 wave: Cronbach's alpha reliability;
round-5 wave: terminal-digit forensic audit; round-5 wave: Little's-law
conformance (exact vs instant-sampled concurrency).

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: alpha reduces to exact BIGINT item moments; digit counts
are exact integers; session arithmetic is exact integer microseconds
with closed-form per-session instant counts (no time-spine join).
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w28 import *  # noqa: F401,F403


# --- round-5 wave: Cronbach's alpha ----------------------------------------------


def ext_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability treating each
    user's spend per event type as one of k=5 'items': alpha =
    k/(k-1) * (1 - sum(item variances)/variance(total)) — the scale-
    reliability check that says whether the five per-type spends move
    together enough to justify a single 'engagement' score. Users
    missing a type contribute an exact 0 item score (conditional
    sums), every moment is BIGINT cents.

    Scale shape: one per-user conditional-sum pass, one scalar moment
    agg, O(1) arithmetic."""
    items = ["click", "view", "purchase", "signup", "error"]
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            *[
                F.sum(
                    F.expr(
                        f"CASE WHEN event_type = '{it}'"
                        " THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END"
                    )
                ).alias(f"s_{it}")
                for it in items
            ]
        )
        .withColumn("s_tot", F.expr("+".join(f"s_{it}" for it in items)))
    )
    mom_exprs = [F.count(F.lit(1)).alias("n")]
    for c in [f"s_{it}" for it in items] + ["s_tot"]:
        mom_exprs += [
            F.sum(c).alias(f"m1_{c}"),
            F.sum(F.expr(f"{c}*{c}")).alias(f"m2_{c}"),
        ]
    m = per_user.agg(*mom_exprs)
    var = lambda c: (  # noqa: E731
        f"(CAST(m2_{c} AS DOUBLE) - CAST(m1_{c} AS DOUBLE)*m1_{c}/n)/(n - 1)"
    )
    item_vars = " + ".join(var(f"s_{it}") for it in items)
    return m.select(
        F.col("n").alias("n_users"),
        F.lit(5).alias("k_items"),
        F.expr(f"ROUND(({item_vars})/1e4, 4)").alias("sum_item_var"),
        F.expr(f"ROUND(({var('s_tot')})/1e4, 4)").alias("total_var"),
        F.expr(
            f"ROUND(5.0/4.0*(1.0 - ({item_vars})/({var('s_tot')})), 6)"
        ).alias("cronbach_alpha"),
    )


def _alpha_sql() -> str:
    items = ["click", "view", "purchase", "signup", "error"]
    conds = ",\n         ".join(
        f"CAST(SUM(CASE WHEN event_type = '{it}'"
        f" THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_{it}"
        for it in items
    )
    tot = " + ".join(f"s_{it}" for it in items)
    moms = ",\n         ".join(
        f"CAST(SUM({c}) AS BIGINT) AS m1_{c},"
        f" CAST(SUM({c}*{c}) AS BIGINT) AS m2_{c}"
        for c in [f"s_{it}" for it in items] + ["s_tot"]
    )
    var = (
        lambda c: f"(CAST(m2_{c} AS DOUBLE) - CAST(m1_{c} AS DOUBLE)*m1_{c}/n)/(n - 1)"
    )
    item_vars = " + ".join(var(f"s_{it}") for it in items)
    return f"""
WITH per_user AS (
  SELECT user_id,
         {conds}
  FROM events GROUP BY user_id
),
with_tot AS (
  SELECT *, {tot} AS s_tot FROM per_user
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {moms}
  FROM with_tot
)
SELECT n AS n_users, 5 AS k_items,
       ROUND(({item_vars})/1e4, 4) AS sum_item_var,
       ROUND(({var('s_tot')})/1e4, 4) AS total_var,
       ROUND(5.0/4.0*(1.0 - ({item_vars})/({var('s_tot')})), 6) AS cronbach_alpha
FROM m
"""


EXT_QUERIES.update({"ext_cronbach_alpha": ext_cronbach_alpha})
EXT_ORACLES.update({"ext_cronbach_alpha": _alpha_sql()})


# --- round-5 wave: terminal-digit forensic audit ---------------------------------


def ext_terminal_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-digit forensic audit of order amounts: the distribution
    of the last two cent digits should be uniform over 00..99 for
    organic prices; the chi-square statistic against uniform plus the
    top-5 overrepresented endings expose psychological pricing,
    hand-keyed amounts, or synthetic padding — Benford's complement
    (X216 reads the FIRST digit, this reads the LAST two, which fraud
    touches first).

    Scale shape: one pass to 100 exact counts; chi-square and ranking
    on the O(100) axis."""
    d = (
        _t(spark, sf_dir, "orders")
        .select(
            F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT) % 100").alias("ending")
        )
        .groupBy("ending")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wall = Window.partitionBy()
    scored = (
        d.withColumn("tot", F.sum("c").over(wall))
        .withColumn("exp", F.expr("CAST(tot AS DOUBLE)/100"))
        .withColumn("chi_term", F.expr("(c - exp)*(c - exp)/exp"))
        .withColumn("chi2", F.sum("chi_term").over(wall))
    )
    return (
        scored.select(
            "ending",
            "c",
            F.expr("ROUND(CAST(c AS DOUBLE)/tot, 6)").alias("share"),
            F.expr("ROUND(chi2, 4)").alias("chi2_uniform"),
        )
        .orderBy(F.col("c").desc(), "ending")
        .limit(5)
    )


EXT_TERMINAL_DIGITS_SQL = r"""
WITH d AS (
  SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) % 100 AS ending,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
scored AS (
  SELECT ending, c,
         SUM(c) OVER () AS tot,
         (c - CAST(SUM(c) OVER () AS DOUBLE)/100)
           *(c - CAST(SUM(c) OVER () AS DOUBLE)/100)
           /(CAST(SUM(c) OVER () AS DOUBLE)/100) AS chi_term
  FROM d
)
SELECT ending, c,
       ROUND(CAST(c AS DOUBLE)/tot, 6) AS share,
       ROUND(SUM(chi_term) OVER (), 4) AS chi2_uniform
FROM scored
ORDER BY c DESC, ending LIMIT 5
"""


EXT_QUERIES.update({"ext_terminal_digits": ext_terminal_digits})
EXT_ORACLES.update({"ext_terminal_digits": EXT_TERMINAL_DIGITS_SQL})


# --- round-5 wave: Little's-law conformance --------------------------------------


def ext_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law conformance audit: L = lambda * W holds exactly for
    the time-averaged concurrency, so the informative comparison is
    the EXACT time-average (total session-time over the observation
    span) against the top-of-hour INSTANT-SAMPLED average every
    monitoring dashboard actually plots. Sessions are the X78 30-min-
    gap definition; each session's count of covered hourly instants is
    closed-form integer arithmetic (ceil/floor of exact microseconds),
    so no time-spine join exists at any scale.

    Scale shape: per-user lag + cumulative-flag sessionization (one
    shuffle), one session-level agg, O(1) arithmetic."""
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", F.expr("unix_micros(ts)").alias("us"))
        .withColumn("prev_us", F.lag("us").over(wu))
        .withColumn(
            "new_s",
            F.expr(
                "CAST(prev_us IS NULL OR us - prev_us > 1800000000 AS INT)"
            ),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                wu.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    sess = ev.groupBy("user_id", "sid").agg(
        F.min("us").alias("s_us"), F.max("us").alias("e_us")
    )
    span = ev.agg(F.min("us").alias("t0"), F.max("us").alias("t1"))
    h_us = 3600 * 1000000
    m = sess.crossJoin(F.broadcast(span)).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.expr("e_us - s_us")).alias("busy_us"),
        F.max("t0").alias("t0"),
        F.max("t1").alias("t1"),
        F.sum(
            F.expr(
                f"GREATEST(0L, (CAST(CEIL(CAST(e_us AS DOUBLE)/{h_us}) AS BIGINT) - 1)"
                f" - CAST(CEIL(CAST(s_us AS DOUBLE)/{h_us}) AS BIGINT) + 1)"
            )
        ).alias("covered_instants"),
    )
    return m.select(
        "n_sessions",
        F.expr(f"ROUND(n_sessions/(CAST(t1 - t0 AS DOUBLE)/{h_us}), 4)").alias(
            "lambda_per_hour"
        ),
        F.expr(
            f"ROUND(CAST(busy_us AS DOUBLE)/n_sessions/{h_us}, 6)"
        ).alias("w_hours"),
        F.expr("ROUND(CAST(busy_us AS DOUBLE)/(t1 - t0), 6)").alias("l_exact"),
        F.expr(
            f"ROUND(CAST(covered_instants AS DOUBLE)"
            f"/(CAST(t1 AS BIGINT) DIV {h_us} - CAST(CEIL(CAST(t0 AS DOUBLE)/{h_us}) AS BIGINT) + 1), 6)"
        ).alias("l_sampled"),
    )


_H = 3600 * 1000000

EXT_LITTLES_LAW_SQL = rf"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, us,
         SUM(CAST(prev_us IS NULL OR us - prev_us > 1800000000 AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ev
),
sess AS (
  SELECT user_id, sid, MIN(us) AS s_us, MAX(us) AS e_us
  FROM flagged GROUP BY user_id, sid
),
span AS (SELECT MIN(us) AS t0, MAX(us) AS t1 FROM ev),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM(e_us - s_us) AS BIGINT) AS busy_us,
         MAX(t0) AS t0, MAX(t1) AS t1,
         CAST(SUM(GREATEST(0,
           (CAST(CEIL(CAST(e_us AS DOUBLE)/{_H}) AS BIGINT) - 1)
           - CAST(CEIL(CAST(s_us AS DOUBLE)/{_H}) AS BIGINT) + 1)) AS BIGINT)
           AS covered_instants
  FROM sess CROSS JOIN span
)
SELECT n_sessions,
       ROUND(n_sessions/(CAST(t1 - t0 AS DOUBLE)/{_H}), 4) AS lambda_per_hour,
       ROUND(CAST(busy_us AS DOUBLE)/n_sessions/{_H}, 6) AS w_hours,
       ROUND(CAST(busy_us AS DOUBLE)/(t1 - t0), 6) AS l_exact,
       ROUND(CAST(covered_instants AS DOUBLE)
             /(t1 // {_H} - CAST(CEIL(CAST(t0 AS DOUBLE)/{_H}) AS BIGINT) + 1), 6)
         AS l_sampled
FROM m
"""


EXT_QUERIES.update({"ext_littles_law": ext_littles_law})
EXT_ORACLES.update({"ext_littles_law": EXT_LITTLES_LAW_SQL})
