"""Declared-query waves: round-5 wave: weekly growth accounting
(new/retained/resurrected/churned); round-5 wave: pre-period-forecast
causal impact gap; round-5 wave: word burstiness (Fano factor); round-5
wave: Bloom-filter false-positive calibration; round-5 wave: SAX
symbolization + motif counts of the daily revenue series.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: exact integer sums through identical double trees,
e-notation float literals, md5-replayable hash bits for the Bloom
calibration, deterministic tie-breaks on every top-k.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w14 import *  # noqa: F401,F403


# --- round-5 wave: weekly growth accounting -----------------------------------


def ext_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active-user growth accounting: every active (user, week)
    is classified NEW (first-ever week), RETAINED (also active the
    previous week) or RESURRECTED (returning after a gap), and CHURNED
    counts users active last week but silent this week — the canonical
    DAU/MAU decomposition product teams reconcile growth with, plus the
    quick ratio (new+resurrected)/churned. Weeks are epoch-day integer
    arithmetic; classification is per-user LAG/MIN over the tiny
    (user, week) frame; churn joins the week axis shifted by one.

    Scale shape: one distinct (user, week) agg over events, a per-user
    window on that aggregate, one per-week count."""
    uw = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') DIV 7 AS BIGINT)"
            ).alias("wk"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    klass = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
    ).select(
        "wk",
        F.expr(
            "CASE WHEN prev_wk IS NULL THEN 'new'"
            " WHEN prev_wk = wk - 1 THEN 'retained'"
            " ELSE 'resurrected' END"
        ).alias("k"),
    )
    weekly = klass.groupBy("wk").agg(
        F.sum(F.expr("CAST(k = 'new' AS LONG)")).alias("new_users"),
        F.sum(F.expr("CAST(k = 'retained' AS LONG)")).alias("retained"),
        F.sum(F.expr("CAST(k = 'resurrected' AS LONG)")).alias("resurrected"),
    )
    churn = (
        uw.select(F.expr("wk + 1").alias("wk"), "user_id")
        .join(uw, ["wk", "user_id"], "left_anti")
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        weekly.join(churn, "wk", "left")
        .select(
            "wk",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).alias("churned"),
            F.expr(
                "CASE WHEN COALESCE(churned, 0) > 0 THEN"
                " ROUND(CAST(new_users + resurrected AS DOUBLE)/churned, 6)"
                " END"
            ).alias("quick_ratio"),
        )
        .orderBy("wk")
    )


EXT_GROWTH_ACCOUNTING_SQL = r"""
WITH uw AS (
  SELECT DISTINCT user_id,
         DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
),
klass AS (
  SELECT wk,
         CASE WHEN prev_wk IS NULL THEN 'new'
              WHEN prev_wk = wk - 1 THEN 'retained'
              ELSE 'resurrected' END AS k
  FROM (
    SELECT user_id, wk, LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
    FROM uw
  )
),
weekly AS (
  SELECT wk,
         CAST(SUM(CAST(k = 'new' AS BIGINT)) AS BIGINT) AS new_users,
         CAST(SUM(CAST(k = 'retained' AS BIGINT)) AS BIGINT) AS retained,
         CAST(SUM(CAST(k = 'resurrected' AS BIGINT)) AS BIGINT) AS resurrected
  FROM klass GROUP BY wk
),
churn AS (
  SELECT a.wk + 1 AS wk, COUNT(*) AS churned
  FROM uw a LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 1
  WHERE b.user_id IS NULL
  GROUP BY a.wk + 1
)
SELECT w.wk, w.new_users, w.retained, w.resurrected,
       COALESCE(c.churned, 0) AS churned,
       CASE WHEN COALESCE(c.churned, 0) > 0
            THEN ROUND(CAST(w.new_users + w.resurrected AS DOUBLE)/c.churned, 6)
       END AS quick_ratio
FROM weekly w LEFT JOIN churn c ON w.wk = c.wk
ORDER BY w.wk
"""


EXT_QUERIES.update({"ext_growth_accounting": ext_growth_accounting})
EXT_ORACLES.update({"ext_growth_accounting": EXT_GROWTH_ACCOUNTING_SQL})


# --- round-5 wave: causal impact (pre-period forecast gap) --------------------


def ext_causal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal-impact-style intervention read: fit a linear trend to the
    PRE period (days before 2024-01-16) of daily event revenue by exact
    closed-form OLS on integer-cent sums, extrapolate it through the
    POST period as the counterfactual, and report per-day actual vs
    forecast gaps plus the cumulative effect — the interrupted-time-
    series estimator (the DiD cousin when no control group exists; see
    ext_did_estimator). Slope/intercept come from integer moments of
    (t, cents); every gap is actual - (a + b*t) with identical trees.

    Scale shape: one day hash agg; the OLS fit and forecast run on the
    O(days) axis with a broadcast scalar join."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') AS BIGINT)"
            ).alias("t")
        )
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("c"))
    )
    fit = daily.filter(F.col("t") < 15).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("c").alias("sc"),
        F.sum(F.expr("t*c")).alias("stc"),
        F.sum(F.expr("t*t")).alias("stt"),
    ).select(
        F.expr(
            "CAST(n*stc - st*sc AS DOUBLE)/(n*stt - st*st)"
        ).alias("b"),
        F.expr(
            "(CAST(sc AS DOUBLE) - (CAST(n*stc - st*sc AS DOUBLE)/(n*stt - st*st))*st)/n"
        ).alias("a"),
    )
    post = daily.filter(F.col("t") >= 15).join(F.broadcast(fit))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    gap = post.select(
        "t",
        F.expr("ROUND(c/1e2, 2)").alias("actual"),
        F.expr("ROUND((a + b*t)/1e2, 4)").alias("forecast"),
        F.expr("c/1e2 - (a + b*t)/1e2").alias("g"),
    )
    return gap.select(
        "t",
        "actual",
        "forecast",
        F.expr("ROUND(g, 4)").alias("gap"),
        F.round(F.sum("g").over(w), 4).alias("cumulative_effect"),
    ).orderBy("t")


EXT_CAUSAL_IMPACT_SQL = r"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
m AS (
  SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(t*c) AS BIGINT) AS stc, CAST(SUM(t*t) AS BIGINT) AS stt
  FROM daily WHERE t < 15
),
fit AS (
  SELECT CAST(n*stc - st*sc AS DOUBLE)/(n*stt - st*st) AS b,
         (CAST(sc AS DOUBLE) - (CAST(n*stc - st*sc AS DOUBLE)/(n*stt - st*st))*st)/n AS a
  FROM m
),
gap AS (
  SELECT t, ROUND(c/1e2, 2) AS actual, ROUND((a + b*t)/1e2, 4) AS forecast,
         c/1e2 - (a + b*t)/1e2 AS g
  FROM daily CROSS JOIN fit WHERE t >= 15
)
SELECT t, actual, forecast, ROUND(g, 4) AS gap,
       ROUND(SUM(g) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cumulative_effect
FROM gap ORDER BY t
"""


EXT_QUERIES.update({"ext_causal_impact": ext_causal_impact})
EXT_ORACLES.update({"ext_causal_impact": EXT_CAUSAL_IMPACT_SQL})


# --- round-5 wave: word burstiness (Fano factor) ------------------------------


def ext_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word burstiness: variance-to-mean ratio (Fano factor) of
    per-document counts for the 30 most frequent words — topical words
    clump (Fano >> 1) while function words spread Poisson-like (~1 after
    the zero-inflation from absent docs), the Church-Gale signal behind
    keyword weighting and stopword induction. Per-word doc-count moments
    are exact integers over ALL docs (absent docs contribute zero to
    both sums, so no grid is materialized — the zero-fill algebra from
    ext_cronbach_alpha); deterministic top-30 by (total desc, word).

    Scale shape: explode once to (word, doc) counts, one per-word agg;
    the doc total rides in as a broadcast scalar."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("ws")
    )
    wd = (
        docs.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    per = wd.groupBy("w").agg(
        F.sum("c").alias("tot"),
        F.sum(F.expr("c*c")).alias("ss"),
        F.count(F.lit(1)).alias("df"),
    )
    return (
        per.join(F.broadcast(nd))
        .select(
            "w",
            "tot",
            "df",
            F.expr(
                "ROUND((CAST(ss AS DOUBLE)/nd - (CAST(tot AS DOUBLE)/nd)*(CAST(tot AS DOUBLE)/nd))"
                "/(CAST(tot AS DOUBLE)/nd), 6)"
            ).alias("fano"),
        )
        .orderBy(F.col("tot").desc(), F.col("w").asc())
        .limit(30)
    )


EXT_WORD_BURSTINESS_SQL = r"""
WITH wd AS (
  SELECT w, doc_id, COUNT(*) AS c FROM (
    SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents
  ) GROUP BY 1, 2
),
nd AS (SELECT COUNT(*) AS nd FROM documents),
per AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS tot, CAST(SUM(c*c) AS BIGINT) AS ss,
         COUNT(*) AS df
  FROM wd GROUP BY w
)
SELECT w, tot, df,
       ROUND((CAST(ss AS DOUBLE)/nd - (CAST(tot AS DOUBLE)/nd)*(CAST(tot AS DOUBLE)/nd))
             /(CAST(tot AS DOUBLE)/nd), 6) AS fano
FROM per CROSS JOIN nd
ORDER BY tot DESC, w ASC LIMIT 30
"""


EXT_QUERIES.update({"ext_word_burstiness": ext_word_burstiness})
EXT_ORACLES.update({"ext_word_burstiness": EXT_WORD_BURSTINESS_SQL})


# --- round-5 wave: Bloom-filter FPR calibration -------------------------------


def ext_bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs theoretical Bloom false-positive rate: build a 4-hash
    m=16384-bit filter over the customers with orders (md5-derived bit
    positions — replayable on both engines), probe every customer
    WITHOUT orders, and compare the measured FP share to the standard
    (1 - e^{-kn/m})^k estimate — the calibration loop that sizes
    bloom-pruned joins (ext_bloom_semi_join) before trusting them at
    scale. Membership = all 4 bits present, checked by joining probe
    bits against the distinct built-bit set and counting matches.

    Scale shape: two explodes (4 bits/key) + distinct + one join keyed
    by bit position; counts are exact integers, e^x enters only the
    theory column."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    with_orders = (
        _t(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("c_custkey")
        ).distinct()
    )
    build_keys = cust.join(with_orders, "c_custkey")
    probe_keys = cust.join(with_orders, "c_custkey", "left_anti")

    def bits(df):
        return df.select(
            "c_custkey",
            F.explode(F.array(*[F.lit(i) for i in range(1, 5)])).alias("h"),
        ).select(
            "c_custkey",
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(h AS STRING), ':',"
                " CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 16384"
            ).alias("bit"),
        )

    # r13 note: persisting built was measured SLOWER (first 1.9 ->
    # 2.8s, second flat; 2-round alternating A/B) — its two consumers
    # share the distinct exchange via AQE stage reuse. Left unpersisted
    # on purpose.
    built = bits(build_keys).select("bit").distinct()
    probe = bits(probe_keys)
    hits = (
        probe.join(built.withColumn("present", F.lit(1)), "bit", "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.coalesce("present", F.lit(0))).alias("nbits"))
    )
    n_build = build_keys.agg(F.count(F.lit(1)).alias("n_build"))
    m_bits = built.agg(F.count(F.lit(1)).alias("bits_set"))
    fp = hits.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.expr("CAST(nbits = 4 AS LONG)")).alias("n_fp"),
    )
    return (
        fp.join(n_build)
        .join(m_bits)
        .select(
            "n_build",
            "n_probe",
            "bits_set",
            "n_fp",
            F.expr("ROUND(CAST(n_fp AS DOUBLE)/n_probe, 6)").alias("measured_fpr"),
            F.expr(
                "ROUND((CAST(bits_set AS DOUBLE)/16384)*(CAST(bits_set AS DOUBLE)/16384)"
                "*(CAST(bits_set AS DOUBLE)/16384)*(CAST(bits_set AS DOUBLE)/16384), 6)"
            ).alias("occupancy_fpr"),
            F.expr(
                "ROUND(POWER(1 - EXP(-4e0*n_build/16384e0), 4), 6)"
            ).alias("theory_fpr"),
        )
    )


EXT_BLOOM_FPR_CALIBRATION_SQL = r"""
WITH wo AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
build_keys AS (SELECT c.c_custkey FROM customer c JOIN wo USING (c_custkey)),
probe_keys AS (
  SELECT c.c_custkey FROM customer c LEFT JOIN wo USING (c_custkey)
  WHERE wo.c_custkey IS NULL
),
built AS (
  SELECT DISTINCT CAST(('0x' || SUBSTR(md5(CAST(h.h AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT % 16384 AS BIGINT) AS bit
  FROM build_keys CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS h) h
),
probe AS (
  SELECT c_custkey,
         CAST(('0x' || SUBSTR(md5(CAST(h.h AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT % 16384 AS BIGINT) AS bit
  FROM probe_keys CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS h) h
),
hits AS (
  SELECT p.c_custkey, CAST(SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nbits
  FROM probe p LEFT JOIN built b ON p.bit = b.bit
  GROUP BY p.c_custkey
),
fp AS (
  SELECT COUNT(*) AS n_probe, CAST(SUM(CAST(nbits = 4 AS BIGINT)) AS BIGINT) AS n_fp
  FROM hits
),
nb AS (SELECT COUNT(*) AS n_build FROM build_keys),
mb AS (SELECT COUNT(*) AS bits_set FROM built)
SELECT n_build, n_probe, bits_set, n_fp,
       ROUND(CAST(n_fp AS DOUBLE)/n_probe, 6) AS measured_fpr,
       ROUND((CAST(bits_set AS DOUBLE)/16384)*(CAST(bits_set AS DOUBLE)/16384)
             *(CAST(bits_set AS DOUBLE)/16384)*(CAST(bits_set AS DOUBLE)/16384), 6) AS occupancy_fpr,
       ROUND(POWER(1 - EXP(-4e0*n_build/16384e0), 4), 6) AS theory_fpr
FROM fp CROSS JOIN nb CROSS JOIN mb
"""


EXT_QUERIES.update({"ext_bloom_fpr_calibration": ext_bloom_fpr_calibration})
EXT_ORACLES.update({"ext_bloom_fpr_calibration": EXT_BLOOM_FPR_CALIBRATION_SQL})


# --- round-5 wave: SAX symbolization + motifs ---------------------------------


def ext_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of the daily revenue series (alphabet {a,b,c,d}
    at the standard N(0,1) breakpoints ±0.6745) plus counts of every
    3-symbol motif — the discretization that turns time-series motif
    discovery into string counting. The z-score uses exact integer-cent
    moments; symbols are range compares against e-notation literals;
    motifs are a 3-day sliding concat on the day axis.

    Scale shape: one day hash agg; windows on the O(days) axis."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(ts AS DATE)").alias("day"))
        .agg(F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("c"))
    )
    mo = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        # DECIMAL moments: c is the daily cent sum (~1.7e8*SF), so the
        # int64 sum of c*c crosses 2^63 at ~sf3.3 — far below the sf1000
        # design point (the ext_bullwhip pattern; HUGEINT in the oracle)
        F.sum(F.expr("CAST(c AS DECIMAL(19,0))*CAST(c AS DECIMAL(19,0))")).alias("s2"),
    )
    z = daily.join(F.broadcast(mo)).select(
        "day",
        F.expr(
            "(c - CAST(s1 AS DOUBLE)/n)"
            "/SQRT(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))"
        ).alias("z"),
    )
    sym = z.select(
        "day",
        F.expr(
            "CASE WHEN z < -0.6745e0 THEN 'a' WHEN z < 0e0 THEN 'b'"
            " WHEN z < 0.6745e0 THEN 'c' ELSE 'd' END"
        ).alias("s"),
    )
    w = Window.orderBy("day")
    motifs = sym.select(
        F.concat(
            F.col("s"), F.lead("s", 1).over(w), F.lead("s", 2).over(w)
        ).alias("motif")
    ).filter(F.expr("length(motif) = 3"))
    return (
        motifs.groupBy("motif")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("motif").asc())
    )


EXT_SAX_MOTIFS_SQL = r"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
mo AS (
  SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s1,
         SUM(CAST(c AS HUGEINT)*CAST(c AS HUGEINT)) AS s2
  FROM daily
),
z AS (
  SELECT day,
         (c - CAST(s1 AS DOUBLE)/n)
         /SQRT(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)) AS z
  FROM daily CROSS JOIN mo
),
sym AS (
  SELECT day,
         CASE WHEN z < -0.6745e0 THEN 'a' WHEN z < 0e0 THEN 'b'
              WHEN z < 0.6745e0 THEN 'c' ELSE 'd' END AS s
  FROM z
),
motifs AS (
  SELECT s || LEAD(s, 1) OVER (ORDER BY day) || LEAD(s, 2) OVER (ORDER BY day) AS motif
  FROM sym
)
SELECT motif, COUNT(*) AS cnt FROM motifs
WHERE LENGTH(motif) = 3
GROUP BY motif ORDER BY cnt DESC, motif ASC
"""


EXT_QUERIES.update({"ext_sax_motifs": ext_sax_motifs})
EXT_ORACLES.update({"ext_sax_motifs": EXT_SAX_MOTIFS_SQL})
