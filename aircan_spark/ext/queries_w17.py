"""Declared-query waves: round-5 wave: AMS tug-of-war F2 sketch vs exact
second moment; round-5 wave: coordinated (key-hash) join sampling; round-5
wave: histogram join-cardinality estimation audit; round-5 wave: Zipf
exponent fit; round-5 wave: leave-one-source-out ablation.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: md5-replayable sketch signs and samples; integer counts and
moments everywhere; ln-term regressions use the decimal-rounded term-sum
contract from queries_w10.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w16 import *  # noqa: F401,F403


# --- round-5 wave: AMS tug-of-war F2 sketch -----------------------------------


def ext_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (tug-of-war) second-moment sketch vs the exact F2 of the
    lineitem part-key frequency vector — F2 is the self-join size, the
    quantity a join planner wants without building the join. Sixteen
    ±1-signed counters (sign = one md5 bit per (counter, key), fully
    replayable) are summed in ONE pass; the estimator averages the 16
    squared counters in four groups of four and takes the median of the
    group means (average-of-middle-two convention — exact rationals).
    The exact F2 comes from the per-key counts' sum of squares.

    Scale shape: sketch = one conditional hash agg over the fact (16
    integers of state); exact side = one (key) agg + one sum — the
    sketch path never shuffles per-key."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    signed = li.select(
        *[
            F.expr(
                f"CAST(CAST(conv(substring(md5(concat('{j}:',"
                " CAST(l_partkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2"
                " * 2 - 1 AS LONG)"
            ).alias(f"s{j}")
            for j in range(16)
        ]
    )
    z = signed.agg(
        *[F.sum(f"s{j}").alias(f"z{j}") for j in range(16)]
    )
    est = z.selectExpr(
        *[
            f"(CAST(z{4*g} AS DOUBLE)*z{4*g} + CAST(z{4*g+1} AS DOUBLE)*z{4*g+1}"
            f" + CAST(z{4*g+2} AS DOUBLE)*z{4*g+2} + CAST(z{4*g+3} AS DOUBLE)*z{4*g+3})/4"
            f" AS m{g}"
            for g in range(4)
        ]
    )
    med = est.select(
        F.expr(
            "(m0 + m1 + m2 + m3"
            " - GREATEST(m0, m1, m2, m3) - LEAST(m0, m1, m2, m3))/2"
        ).alias("f2_est")
    )
    true = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c*c")).alias("f2_true"))
    )
    return med.join(true).select(
        F.expr("ROUND(f2_est, 2)").alias("f2_est"),
        "f2_true",
        F.expr("ROUND((f2_est - f2_true)/f2_true, 6)").alias("rel_error"),
    )


_AMS_SIGNS = ",\n".join(
    f"         CAST(SUM(CAST(('0x' || SUBSTR(md5('{j}:' || CAST(l_partkey AS VARCHAR)), 1, 8))::UBIGINT % 2 AS BIGINT) * 2 - 1) AS BIGINT) AS z{j}"
    for j in range(16)
)
_AMS_MEANS = ",\n".join(
    f"         (CAST(z{4*g} AS DOUBLE)*z{4*g} + CAST(z{4*g+1} AS DOUBLE)*z{4*g+1}"
    f" + CAST(z{4*g+2} AS DOUBLE)*z{4*g+2} + CAST(z{4*g+3} AS DOUBLE)*z{4*g+3})/4 AS m{g}"
    for g in range(4)
)
EXT_AMS_F2_SQL = f"""
WITH z AS (
  SELECT
{_AMS_SIGNS}
  FROM lineitem
),
est AS (
  SELECT
{_AMS_MEANS}
  FROM z
),
med AS (
  SELECT (m0 + m1 + m2 + m3
          - GREATEST(m0, m1, m2, m3) - LEAST(m0, m1, m2, m3))/2 AS f2_est
  FROM est
),
tr AS (
  SELECT CAST(SUM(c*c) AS BIGINT) AS f2_true FROM (
    SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey
  )
)
SELECT ROUND(f2_est, 2) AS f2_est, f2_true,
       ROUND((f2_est - f2_true)/f2_true, 6) AS rel_error
FROM med CROSS JOIN tr
"""


EXT_QUERIES.update({"ext_ams_f2": ext_ams_f2})
EXT_ORACLES.update({"ext_ams_f2": EXT_AMS_F2_SQL})


# --- round-5 wave: coordinated join sampling ----------------------------------


def ext_coordinated_join_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinated (key-hash) sampling for join estimation: sampling
    BOTH orders and lineitem by the same 10% hash of the JOIN KEY keeps
    every sampled order's lineitems intact, so |sample join|/10% is an
    unbiased join-size estimate — while independent row sampling of two
    tables breaks almost every joined pair (the classic trap, quantified
    here by the row-product naive estimate). Also scores a filtered join
    (finished orders x returned items) from the same sample.

    Scale shape: the sample join touches ~10% of both tables; hash
    membership is a pushed-down integer predicate, no extra shuffle."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr(
            "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 10"
        ).alias("ob"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_returnflag",
        F.expr(
            "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 10"
        ).alias("lb"),
    )
    sj = o.filter(F.expr("ob = 0")).join(
        li.filter(F.expr("lb = 0")), "o_orderkey"
    )
    s = sj.agg(
        F.count(F.lit(1)).alias("n_sample_join"),
        F.sum(
            F.expr("CAST(o_orderstatus = 'F' AND l_returnflag = 'R' AS LONG)")
        ).alias("n_sample_filtered"),
    )
    t = o.join(li, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n_true_join"),
        F.sum(
            F.expr("CAST(o_orderstatus = 'F' AND l_returnflag = 'R' AS LONG)")
        ).alias("n_true_filtered"),
    )
    return (
        s.join(t)
        .select(
            "n_sample_join",
            "n_true_join",
            F.expr("CAST(n_sample_join*10 AS BIGINT)").alias("est_join"),
            F.expr(
                "ROUND((CAST(n_sample_join AS DOUBLE)*10 - n_true_join)/n_true_join, 6)"
            ).alias("join_rel_error"),
            F.expr("CAST(n_sample_filtered*10 AS BIGINT)").alias("est_filtered"),
            F.expr(
                "ROUND((CAST(n_sample_filtered AS DOUBLE)*10 - n_true_filtered)"
                "/n_true_filtered, 6)"
            ).alias("filtered_rel_error"),
        )
    )


EXT_COORDINATED_JOIN_SAMPLE_SQL = r"""
WITH o AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(('0x' || SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT % 10 AS BIGINT) AS ob
  FROM orders
),
li AS (
  SELECT l_orderkey AS o_orderkey, l_returnflag,
         CAST(('0x' || SUBSTR(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UBIGINT % 10 AS BIGINT) AS lb
  FROM lineitem
),
s AS (
  SELECT COUNT(*) AS n_sample_join,
         CAST(SUM(CAST(o.o_orderstatus = 'F' AND li.l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS n_sample_filtered
  FROM o JOIN li USING (o_orderkey)
  WHERE o.ob = 0 AND li.lb = 0
),
t AS (
  SELECT COUNT(*) AS n_true_join,
         CAST(SUM(CAST(o.o_orderstatus = 'F' AND li.l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS n_true_filtered
  FROM o JOIN li USING (o_orderkey)
)
SELECT n_sample_join, n_true_join,
       CAST(n_sample_join*10 AS BIGINT) AS est_join,
       ROUND((CAST(n_sample_join AS DOUBLE)*10 - n_true_join)/n_true_join, 6) AS join_rel_error,
       CAST(n_sample_filtered*10 AS BIGINT) AS est_filtered,
       ROUND((CAST(n_sample_filtered AS DOUBLE)*10 - n_true_filtered)/n_true_filtered, 6) AS filtered_rel_error
FROM s CROSS JOIN t
"""


EXT_QUERIES.update({"ext_coordinated_join_sample": ext_coordinated_join_sample})
EXT_ORACLES.update({"ext_coordinated_join_sample": EXT_COORDINATED_JOIN_SAMPLE_SQL})


# --- round-5 wave: histogram join-cardinality estimate ------------------------


def ext_histogram_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based join-size estimation audit: bucket both join
    sides (orders, lineitem) on orderkey DIV 4096, estimate |join| as
    sum over buckets of n1*n2/4096 (the uniform-within-bucket
    containment assumption every cost-based optimizer makes), and
    compare to the true join size and to the exact per-key product sum
    — quantifying how much the bucketing assumption costs on this key
    distribution.

    Scale shape: two bucket hash aggs + one tiny bucket join; the exact
    side is one keyed agg (no actual join materialized — the true size
    is sum over keys of c1*c2)."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.expr("CAST(o_orderkey DIV 4096 AS BIGINT)").alias("b"))
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.expr("CAST(l_orderkey DIV 4096 AS BIGINT)").alias("b"))
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    est = o.join(li, "b").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.expr("ROUND(SUM(CAST(n1 AS DOUBLE)*n2/4096), 2)").alias("est_join"),
    )
    ok = _t(spark, sf_dir, "orders").groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("c1")
    )
    lk = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(F.count(F.lit(1)).alias("c2"))
    true = ok.join(lk, "o_orderkey").agg(
        F.sum(F.expr("c1*c2")).alias("true_join")
    )
    return (
        est.join(true)
        .select(
            "n_buckets",
            "true_join",
            "est_join",
            F.expr("ROUND((est_join - true_join)/true_join, 6)").alias(
                "rel_error"
            ),
        )
    )


EXT_HISTOGRAM_JOIN_ESTIMATE_SQL = r"""
WITH o AS (
  SELECT o_orderkey // 4096 AS b, COUNT(*) AS n1 FROM orders GROUP BY 1
),
li AS (
  SELECT l_orderkey // 4096 AS b, COUNT(*) AS n2 FROM lineitem GROUP BY 1
),
est AS (
  SELECT COUNT(*) AS n_buckets,
         ROUND(SUM(CAST(n1 AS DOUBLE)*n2/4096), 2) AS est_join
  FROM o JOIN li USING (b)
),
ok AS (SELECT o_orderkey, COUNT(*) AS c1 FROM orders GROUP BY 1),
lk AS (SELECT l_orderkey AS o_orderkey, COUNT(*) AS c2 FROM lineitem GROUP BY 1),
tr AS (
  SELECT CAST(SUM(c1*c2) AS BIGINT) AS true_join FROM ok JOIN lk USING (o_orderkey)
)
SELECT n_buckets, true_join, est_join,
       ROUND((est_join - true_join)/true_join, 6) AS rel_error
FROM est CROSS JOIN tr
"""


EXT_QUERIES.update({"ext_histogram_join_estimate": ext_histogram_join_estimate})
EXT_ORACLES.update({"ext_histogram_join_estimate": EXT_HISTOGRAM_JOIN_ESTIMATE_SQL})


# --- round-5 wave: Zipf exponent fit ------------------------------------------


def ext_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent of the corpus word-frequency distribution:
    regress ln(freq) on ln(rank) over the top-100 words (deterministic
    rank ties by word) — the power-law diagnostic for tokenizer/vocab
    budgeting that complements ext_hill_tail_index (which fits document
    LENGTH tails). Each regression moment is a per-row ln product
    rounded to 12 decimals and decimal-summed (order-free); slope and
    intercept are the closed-form OLS expressions.

    Scale shape: one word count agg; TakeOrderedAndProject(100) at
    scale; the regression runs on 100 rows."""
    words = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = words.select(
        "w",
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
        .alias("rk"),
    ).filter(F.col("rk") <= 100)
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(SUM(CAST(ROUND(LN(CAST(rk AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("sx"),
        F.expr(
            "CAST(SUM(CAST(ROUND(LN(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("sy"),
        F.expr(
            "CAST(SUM(CAST(ROUND(LN(CAST(rk AS DOUBLE))*LN(CAST(c AS DOUBLE)), 12)"
            " AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("sxy"),
        F.expr(
            "CAST(SUM(CAST(ROUND(LN(CAST(rk AS DOUBLE))*LN(CAST(rk AS DOUBLE)), 12)"
            " AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("sxx"),
    )
    return m.select(
        "n",
        F.expr("ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx), 6)").alias("zipf_slope"),
        F.expr(
            "ROUND((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n, 6)"
        ).alias("ln_intercept"),
    )


EXT_ZIPF_FIT_SQL = r"""
WITH words AS (
  SELECT w, COUNT(*) AS c FROM (
    SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents
  ) GROUP BY w
),
ranked AS (
  SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rk FROM words
  QUALIFY rk <= 100
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(LN(CAST(rk AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(LN(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(LN(CAST(rk AS DOUBLE))*LN(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(LN(CAST(rk AS DOUBLE))*LN(CAST(rk AS DOUBLE)), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx
  FROM ranked
)
SELECT n,
       ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx), 6) AS zipf_slope,
       ROUND((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n, 6) AS ln_intercept
FROM m
"""


EXT_QUERIES.update({"ext_zipf_fit": ext_zipf_fit})
EXT_ORACLES.update({"ext_zipf_fit": EXT_ZIPF_FIT_SQL})


# --- round-5 wave: leave-one-source-out ablation ------------------------------


def ext_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out content ablation: per source, how many of
    its distinct 5-gram shingles exist NOWHERE else (the content the
    corpus loses if that source is dropped) and that unique share — the
    marginal-value ranking used to negotiate data mixtures; the
    source-level complement of ext_ngram_novelty's per-document
    attribution. Uniqueness comes from per-shingle distinct-source
    counts (nsrc = 1 → its MIN(source) owns it) — no pairwise source
    comparison.

    Scale shape: one explode to the distinct (shingle, source) frame,
    one per-shingle agg, one per-source agg."""
    sh = (
        _t(spark, sf_dir, "documents")
        .select(
            "source", F.expr("filter(split(text, ' '), x -> x <> '')").alias("ws")
        )
        .filter(F.expr("size(ws) >= 5"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 4),"
                    " i -> concat_ws(' ', slice(ws, i, 5)))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    per_sh = sh.groupBy("sh").agg(
        F.count(F.lit(1)).alias("nsrc"), F.min("source").alias("owner")
    )
    totals = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    uniques = (
        per_sh.filter(F.col("nsrc") == 1)
        .groupBy(F.col("owner").alias("source"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        totals.join(uniques, "source", "left")
        .select(
            "source",
            "n_shingles",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.expr(
                "ROUND(CAST(COALESCE(n_unique, 0) AS DOUBLE)/n_shingles, 6)"
            ).alias("unique_share"),
        )
        .orderBy("source")
    )


EXT_SOURCE_ABLATION_SQL = r"""
WITH sh AS (
  SELECT DISTINCT source,
         UNNEST(list_transform(generate_series(1, len(ws) - 4),
                i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS sh
  FROM (
    SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents
  ) WHERE len(ws) >= 5
),
per_sh AS (
  SELECT sh, COUNT(*) AS nsrc, MIN(source) AS owner FROM sh GROUP BY sh
),
totals AS (SELECT source, COUNT(*) AS n_shingles FROM sh GROUP BY source),
uniques AS (
  SELECT owner AS source, COUNT(*) AS n_unique FROM per_sh WHERE nsrc = 1 GROUP BY owner
)
SELECT t.source, t.n_shingles, COALESCE(u.n_unique, 0) AS n_unique,
       ROUND(CAST(COALESCE(u.n_unique, 0) AS DOUBLE)/t.n_shingles, 6) AS unique_share
FROM totals t LEFT JOIN uniques u ON t.source = u.source
ORDER BY t.source
"""


EXT_QUERIES.update({"ext_source_ablation": ext_source_ablation})
EXT_ORACLES.update({"ext_source_ablation": EXT_SOURCE_ABLATION_SQL})
