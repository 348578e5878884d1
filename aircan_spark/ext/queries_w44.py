"""Declared-query waves: round-5 wave: Page's trend test; round-5
wave: sourcing-risk index; round-5 wave: Burrows' Delta stylometry.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: Page's L uses deterministic (count, week) ranks and exact
null moments; per-part HHIs quantize to micro-units with $100-unit
revenue weights; Delta z-scores combine on the tiny 30-word x sources
grid through identical expressions.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w43 import *  # noqa: F401,F403


# --- round-5 wave: Page's trend test -------------------------------------------------


def ext_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ORDERED alternative: do event volumes trend
    across the weeks consistently within every event type? Each type
    (block) ranks the weeks by its own volume; L = sum over weeks of
    (week order) x (rank sum), compared against the exact null
    moments E[L] = b*k*(k+1)^2/4 and Var[L] = b*k^2*(k+1)*(k^2-1)/144
    — strictly more powerful than X451's unordered W when the
    hypothesis is monotone growth. Deterministic (count, week)
    tie-break.

    Scale shape: one (week, type) rollup, per-type ranking over the
    O(weeks) axis, one scalar combine."""
    wt = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') DIV 7"
                " AS BIGINT)"
            ).alias("wk"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wb = Window.partitionBy("event_type").orderBy("c", "wk")
    wkord = Window.orderBy("wk")
    ranked = wt.withColumn("rk", F.row_number().over(wb))
    rsums = ranked.groupBy("wk").agg(
        F.sum("rk").alias("rs"), F.count(F.lit(1)).alias("b")
    )
    ordered = rsums.withColumn("j", F.row_number().over(wkord))
    m = ordered.agg(
        F.max("b").alias("b"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.expr("j*rs")).alias("L"),
    )
    return m.select(
        F.col("b").alias("n_blocks"),
        F.col("k").alias("n_weeks"),
        F.col("L").alias("page_l"),
        F.expr(
            "ROUND((L - CAST(b AS DOUBLE)*k*(k + 1)*(k + 1)/4)"
            "/SQRT(CAST(b AS DOUBLE)*k*k*(k + 1)*(k*k - 1)/144), 4)"
        ).alias("z"),
    )


EXT_PAGE_TREND_SQL = r"""
WITH wt AS (
  SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk,
         event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT wk, event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, wk) AS rk
  FROM wt
),
rsums AS (
  SELECT wk, CAST(SUM(rk) AS BIGINT) AS rs, CAST(COUNT(*) AS BIGINT) AS b
  FROM ranked GROUP BY wk
),
ordered AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY wk) AS j FROM rsums
),
m AS (
  SELECT CAST(MAX(b) AS BIGINT) AS b, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(j*rs) AS BIGINT) AS L
  FROM ordered
)
SELECT b AS n_blocks, k AS n_weeks, L AS page_l,
       ROUND((L - CAST(b AS DOUBLE)*k*(k + 1)*(k + 1)/4)
             /SQRT(CAST(b AS DOUBLE)*k*k*(k + 1)*(k*k - 1)/144), 4) AS z
FROM m
"""


EXT_QUERIES.update({"ext_page_trend": ext_page_trend})
EXT_ORACLES.update({"ext_page_trend": EXT_PAGE_TREND_SQL})


# --- round-5 wave: sourcing-risk index -----------------------------------------------


def ext_sourcing_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourcing-risk index: per part, the supplier-revenue HHI (1 =
    single-sourced); aggregated to the single-source part share, the
    share of REVENUE flowing through single-sourced parts, and the
    revenue-weighted average HHI — the procurement-resilience KPI
    combining X115's supplier counts with X268's concentration math.
    Per-part HHIs quantize to micro-units and weights are $100-unit
    integers, so the weighted average is exact at any scale factor.

    Scale shape: one (part, supplier) rollup, one per-part collapse,
    one scalar combine."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice*100) AS BIGINT)")
            ).alias("rc")
        )
    )
    wp = Window.partitionBy("l_partkey")
    parts = (
        ps.withColumn("tot", F.sum("rc").over(wp))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.max("tot").alias("rev_c"),
            F.expr(
                "CAST(ROUND(SUM(POW(CAST(rc AS DOUBLE)/tot, 2))*1e6)"
                " AS BIGINT)"
            ).alias("hhi_q"),
        )
    )
    return parts.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.expr(
            "ROUND(AVG(CAST(n_supp = 1 AS DOUBLE)), 6)"
        ).alias("single_source_part_share"),
        F.expr(
            "ROUND(CAST(SUM(CASE WHEN n_supp = 1 THEN rev_c ELSE 0 END)"
            " AS DOUBLE)/SUM(rev_c), 6)"
        ).alias("single_source_rev_share"),
        F.expr(
            "ROUND(CAST(SUM(hhi_q*(rev_c DIV 10000)) AS DOUBLE)"
            "/SUM(rev_c DIV 10000)/1e6, 6)"
        ).alias("rev_weighted_hhi"),
    )


EXT_SOURCING_RISK_SQL = r"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem GROUP BY 1, 2
),
marked AS (
  SELECT *, SUM(rc) OVER (PARTITION BY l_partkey) AS tot FROM ps
),
parts AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_supp,
         CAST(MAX(tot) AS BIGINT) AS rev_c,
         CAST(ROUND(SUM(POW(CAST(rc AS DOUBLE)/tot, 2))*1e6) AS BIGINT)
           AS hhi_q
  FROM marked GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(CAST(n_supp = 1 AS DOUBLE)), 6) AS single_source_part_share,
       ROUND(CAST(SUM(CASE WHEN n_supp = 1 THEN rev_c ELSE 0 END) AS DOUBLE)
             /SUM(rev_c), 6) AS single_source_rev_share,
       ROUND(CAST(SUM(hhi_q*(rev_c // 10000)) AS DOUBLE)
             /SUM(rev_c // 10000)/1e6, 6) AS rev_weighted_hhi
FROM parts
"""


EXT_QUERIES.update({"ext_sourcing_risk": ext_sourcing_risk})
EXT_ORACLES.update({"ext_sourcing_risk": EXT_SOURCING_RISK_SQL})


# --- round-5 wave: Burrows' Delta stylometry -----------------------------------------


def ext_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between the two largest sources: mean absolute
    difference of their z-scored relative frequencies over the corpus
    top-30 words — the classic stylometric distance (low Delta = same
    'authorial voice'), sharper than X416's whole-vocabulary JS
    because it normalizes each word by its cross-source variability
    before comparing. Word list and source pair pick deterministically
    (count desc, key asc).

    Scale shape: one tokenize pass to (source, word) counts, a
    broadcast top-30 word list, z-scores over the tiny 30 x sources
    grid, one O(30) combine."""
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        # r13 note: persisting tok (DISK_ONLY) was measured SLOWER
        # (first 3.5 -> 4.5s, second flat; 2-round alternating A/B) —
        # the three consumers share the (source, word) exchange via AQE
        # stage reuse, and serialized re-reads lose to the reused
        # shuffle output. Left unpersisted on purpose.
    )
    top_words = (
        tok.groupBy("w")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), "w")
        .limit(30)
        .select("w")
    )
    src_tot = tok.groupBy("source").agg(F.sum("c").alias("st"))
    freqs = (
        tok.join(F.broadcast(top_words), "w")
        .join(src_tot, "source")
        .select("source", "w", F.expr("CAST(c AS DOUBLE)/st").alias("f"))
    )
    ww = Window.partitionBy("w")
    z = (
        freqs.withColumn("nf", F.count(F.lit(1)).over(ww))
        .withColumn("mf", F.avg("f").over(ww))
        .withColumn(
            "sf",
            F.expr(
                "SQRT(SUM((f - mf)*(f - mf)) OVER (PARTITION BY w)/(nf - 1))"
            ),
        )
        .select("source", "w", F.expr("(f - mf)/sf").alias("z"))
    )
    top2 = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("nd"))
        .orderBy(F.col("nd").desc(), "source")
        .limit(2)
    )
    pair = top2.agg(
        F.min("source").alias("src_a"), F.max("source").alias("src_b")
    )
    za = z.join(
        F.broadcast(pair.select(F.col("src_a").alias("source"))), "source"
    ).select("w", F.col("z").alias("za"))
    zb = z.join(
        F.broadcast(pair.select(F.col("src_b").alias("source"))), "source"
    ).select("w", F.col("z").alias("zb"))
    return (
        za.join(zb, "w")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.expr("ROUND(AVG(ABS(za - zb)), 4)").alias("burrows_delta"),
        )
        .crossJoin(F.broadcast(pair))
        .select("src_a", "src_b", "n_words", "burrows_delta")
    )


EXT_BURROWS_DELTA_SQL = r"""
WITH tok AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT source,
           unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
    FROM documents
  ) GROUP BY source, w
),
top_words AS (
  SELECT w FROM tok GROUP BY w ORDER BY SUM(c) DESC, w LIMIT 30
),
src_tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS st FROM tok GROUP BY source),
freqs AS (
  SELECT t.source, t.w, CAST(t.c AS DOUBLE)/s.st AS f
  FROM tok t
  JOIN top_words tw ON tw.w = t.w
  JOIN src_tot s ON s.source = t.source
),
centered AS (
  SELECT source, w, f,
         AVG(f) OVER (PARTITION BY w) AS mf,
         COUNT(*) OVER (PARTITION BY w) AS nf
  FROM freqs
),
z AS (
  SELECT source, w,
         (f - mf)/SQRT(SUM((f - mf)*(f - mf)) OVER (PARTITION BY w)
                       /(nf - 1)) AS z
  FROM centered
),
top2 AS (
  SELECT source FROM documents GROUP BY source
  ORDER BY COUNT(*) DESC, source LIMIT 2
),
pair AS (SELECT MIN(source) AS src_a, MAX(source) AS src_b FROM top2),
za AS (
  SELECT z.w, z.z AS za FROM z JOIN pair p ON z.source = p.src_a
),
zb AS (
  SELECT z.w, z.z AS zb FROM z JOIN pair p ON z.source = p.src_b
)
SELECT p.src_a, p.src_b,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       ROUND(AVG(ABS(za.za - zb.zb)), 4) AS burrows_delta
FROM za JOIN zb ON zb.w = za.w CROSS JOIN pair p
GROUP BY p.src_a, p.src_b
"""


EXT_QUERIES.update({"ext_burrows_delta": ext_burrows_delta})
EXT_ORACLES.update({"ext_burrows_delta": EXT_BURROWS_DELTA_SQL})
