"""Declared-query waves: round-5 wave: Weibull inter-purchase fit;
round-5 wave: session bounce/entry analysis; round-5 wave:
Durbin-Watson residual autocorrelation.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: gaps are exact integer seconds with nearest-rank deciles
off the collapsed gap-value axis; session entries use explicit
(us, event_id) tie-breaks; the DW statistic derives from exact-moment
OLS residuals through identical expressions.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w32 import *  # noqa: F401,F403


# --- round-5 wave: Weibull inter-purchase fit --------------------------------------


def ext_weibull_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of per-user inter-purchase times by the linearized-
    CDF method: nine exact nearest-rank deciles of the gap
    distribution (computed on the COLLAPSED gap-value axis), regressed
    as ln(-ln(1-p)) on ln(gap) — the slope IS the shape parameter k
    (k < 1 bursty/clumped, k = 1 memoryless, k > 1 regular), the
    behavioral-rhythm diagnostic X231's dispersion index can only
    hint at. Gaps are exact integer seconds; the decile probe points
    are shared literals.

    Scale shape: one per-user LAG pass, an O(distinct gaps) cumulative
    sweep, a 9-point closed-form fit."""
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        _t(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", "event_id", F.expr("unix_micros(ts)").alias("us"))
        .withColumn("prev_us", F.lag("us").over(wu))
        .filter("prev_us IS NOT NULL AND us > prev_us")
        .select(F.expr("(us - prev_us) DIV 1000000").alias("g"))
        .filter("g > 0")
    )
    vals = gaps.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = vals.withColumn("cc", F.sum("c").over(wv)).withColumn(
        "n", F.sum("c").over(wall)
    )
    probes = cum.crossJoin(
        F.broadcast(
            _t(spark, sf_dir, "events")
            .limit(1)
            .select(F.explode(F.expr("sequence(1, 9)")).alias("p"))
        )
    ).filter(F.expr("10*cc >= p*n"))
    dec = probes.groupBy("p").agg(F.min("g").alias("gq"))
    pts = dec.select(
        "p",
        F.expr("LN(CAST(gq AS DOUBLE))").alias("x"),
        F.expr("LN(-LN(1.0 - p/10.0))").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x*x")).alias("sxx"),
        F.sum(F.expr("x*y")).alias("sxy"),
    )
    fit = m.select(
        "np",
        F.expr(
            "(sxy - sx*sy/np)/(sxx - sx*sx/np)"
        ).alias("k"),
        F.expr("sy/np").alias("my"),
        F.expr("sx/np").alias("mx"),
    )
    return fit.crossJoin(
        F.broadcast(gaps.agg(F.count(F.lit(1)).alias("n_gaps")))
    ).select(
        "n_gaps",
        F.expr("ROUND(k, 4)").alias("weibull_shape"),
        F.expr(
            "ROUND(EXP(mx - my/k)/3600.0, 4)"
        ).alias("weibull_scale_hours"),
        F.expr("CAST(k < 1.0 AS INT)").alias("bursty"),
    )


EXT_WEIBULL_INTERARRIVAL_SQL = r"""
WITH gaps AS (
  SELECT (us - prev_us) // 1000000 AS g
  FROM (
    SELECT epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_us
    FROM events WHERE event_type = 'purchase'
  )
  WHERE prev_us IS NOT NULL AND us > prev_us AND (us - prev_us) // 1000000 > 0
),
vals AS (SELECT g, COUNT(*) AS c FROM gaps GROUP BY g),
cum AS (
  SELECT g,
         SUM(c) OVER (ORDER BY g
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER () AS n
  FROM vals
),
dec AS (
  SELECT p, MIN(g) AS gq
  FROM cum CROSS JOIN (SELECT UNNEST(generate_series(1, 9)) AS p)
  WHERE 10*cc >= p*n GROUP BY p
),
pts AS (
  SELECT p, LN(CAST(gq AS DOUBLE)) AS x, LN(-LN(1.0 - p/10.0)) AS y FROM dec
),
m AS (
  SELECT COUNT(*) AS np, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(x*y) AS sxy
  FROM pts
),
fit AS (
  SELECT np,
         (sxy - sx*sy/np)/(sxx - sx*sx/np) AS k,
         sy/np AS my, sx/np AS mx
  FROM m
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM gaps) AS n_gaps,
       ROUND(k, 4) AS weibull_shape,
       ROUND(EXP(mx - my/k)/3600.0, 4) AS weibull_scale_hours,
       CAST(k < 1.0 AS INTEGER) AS bursty
FROM fit
"""


EXT_QUERIES.update({"ext_weibull_interarrival": ext_weibull_interarrival})
EXT_ORACLES.update({"ext_weibull_interarrival": EXT_WEIBULL_INTERARRIVAL_SQL})


# --- round-5 wave: session bounce/entry analysis ------------------------------------


def ext_bounce_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce and depth analysis by session ENTRY action: for sessions
    under the X78 30-minute-gap definition, which first actions lead
    to one-event bounces and which open deep sessions — the landing-
    page report of web analytics, over behavioral sessions instead of
    page URLs. Entry selection uses the explicit (us, event_id) order;
    durations are exact integer microseconds.

    Scale shape: the same per-user sessionization shuffle as X78, one
    per-session agg with an argmin-by-struct entry pick, one
    O(types) rollup."""
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", "event_id", "event_type", F.expr("unix_micros(ts)").alias("us")
        )
        .withColumn("prev_us", F.lag("us").over(wu))
        .withColumn(
            "new_s",
            F.expr("CAST(prev_us IS NULL OR us - prev_us > 1800000000 AS INT)"),
        )
        .withColumn(
            "sid", F.sum("new_s").over(wu.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    sess = ev.groupBy("user_id", "sid").agg(
        F.expr("MIN_BY(event_type, STRUCT(us, event_id))").alias("entry"),
        F.count(F.lit(1)).alias("depth"),
        F.expr("MAX(us) - MIN(us)").alias("dur_us"),
    )
    return (
        sess.groupBy("entry")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.expr("CAST(depth = 1 AS LONG)")).alias("n_bounce"),
            F.sum("depth").alias("tot_depth"),
            F.sum("dur_us").alias("tot_dur_us"),
        )
        .select(
            "entry",
            "n_sessions",
            F.expr("ROUND(CAST(n_bounce AS DOUBLE)/n_sessions, 6)").alias(
                "bounce_rate"
            ),
            F.expr("ROUND(CAST(tot_depth AS DOUBLE)/n_sessions, 4)").alias(
                "avg_depth"
            ),
            F.expr(
                "ROUND(CAST(tot_dur_us AS DOUBLE)/n_sessions/6e7, 4)"
            ).alias("avg_minutes"),
        )
        .orderBy(F.col("n_sessions").desc(), "entry")
    )


EXT_BOUNCE_ENTRY_EXIT_SQL = r"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, event_type, us,
         SUM(CAST(prev_us IS NULL OR us - prev_us > 1800000000 AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ev
),
numbered AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                               ORDER BY us, event_id) AS rn
  FROM flagged
),
sess AS (
  SELECT user_id, sid,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS entry,
         CAST(COUNT(*) AS BIGINT) AS depth,
         CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
  FROM numbered GROUP BY user_id, sid
)
SELECT entry,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(CAST(SUM(CAST(depth = 1 AS BIGINT)) AS DOUBLE)/COUNT(*), 6)
         AS bounce_rate,
       ROUND(CAST(SUM(depth) AS DOUBLE)/COUNT(*), 4) AS avg_depth,
       ROUND(CAST(SUM(dur_us) AS DOUBLE)/COUNT(*)/6e7, 4) AS avg_minutes
FROM sess GROUP BY entry ORDER BY n_sessions DESC, entry
"""


EXT_QUERIES.update({"ext_bounce_entry_exit": ext_bounce_entry_exit})
EXT_ORACLES.update({"ext_bounce_entry_exit": EXT_BOUNCE_ENTRY_EXIT_SQL})


# --- round-5 wave: Durbin-Watson residual autocorrelation ----------------------------


def ext_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test on the residuals of the daily-revenue linear
    trend: DW = sum((e_t - e_{t-1})^2)/sum(e_t^2), near 2 for
    independent errors, toward 0 under positive serial correlation —
    the check that says whether the trend line's error bars (and
    X252's control limits) can be trusted, complementing X282's
    Ljung-Box on raw counts by testing the RESIDUALS. The OLS fit
    comes from exact BIGINT day moments; residuals are identical
    expressions both engines.

    Scale shape: collapse to O(days), one scalar moment agg, one LAG
    window on the day axis, one final agg."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("y"))
        .select(
            "day",
            "y",
            (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("t*t")).alias("stt"),
        F.sum(F.expr("t*y")).alias("sty"),
    )
    fit = m.select(
        "n",
        F.expr(
            "(CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy/n)"
            "/(CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st/n)"
        ).alias("b"),
        F.expr("CAST(sy AS DOUBLE)/n").alias("my"),
        F.expr("CAST(st AS DOUBLE)/n").alias("mt"),
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "day",
        F.expr("CAST(y AS DOUBLE) - (my + b*(t - mt))").alias("e"),
    )
    we = Window.orderBy("day")
    dd = resid.withColumn("e_prev", F.lag("e").over(we))
    return dd.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(
            "ROUND(SUM(CASE WHEN e_prev IS NOT NULL"
            " THEN (e - e_prev)*(e - e_prev) ELSE 0 END)/SUM(e*e), 4)"
        ).alias("durbin_watson"),
        F.expr(
            "ROUND(1.0 - SUM(CASE WHEN e_prev IS NOT NULL"
            " THEN (e - e_prev)*(e - e_prev) ELSE 0 END)/SUM(e*e)/2.0, 4)"
        ).alias("rho_approx"),
    )


EXT_DURBIN_WATSON_SQL = r"""
WITH daily AS (
  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t
  FROM (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1
  )
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t*t) AS BIGINT) AS stt, CAST(SUM(t*y) AS BIGINT) AS sty
  FROM daily
),
fit AS (
  SELECT n,
         (CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy/n)
           /(CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st/n) AS b,
         CAST(sy AS DOUBLE)/n AS my,
         CAST(st AS DOUBLE)/n AS mt
  FROM m
),
resid AS (
  SELECT day, CAST(y AS DOUBLE) - (my + b*(t - mt)) AS e
  FROM daily CROSS JOIN fit
),
dd AS (
  SELECT e, LAG(e) OVER (ORDER BY day) AS e_prev FROM resid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(SUM(CASE WHEN e_prev IS NOT NULL
             THEN (e - e_prev)*(e - e_prev) ELSE 0 END)/SUM(e*e), 4)
         AS durbin_watson,
       ROUND(1.0 - SUM(CASE WHEN e_prev IS NOT NULL
             THEN (e - e_prev)*(e - e_prev) ELSE 0 END)/SUM(e*e)/2.0, 4)
         AS rho_approx
FROM dd
"""


EXT_QUERIES.update({"ext_durbin_watson": ext_durbin_watson})
EXT_ORACLES.update({"ext_durbin_watson": EXT_DURBIN_WATSON_SQL})
