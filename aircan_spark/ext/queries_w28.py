"""Declared-query waves: round-5 wave: context-window truncation loss
curve; round-5 wave: popularity-recommender holdout evaluation;
round-5 wave: receivables aging.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: token counts are exact integers from the shared
whitespace-split idiom; the recommender split is a fixed calendar
boundary with count-then-key tie-breaks; aging buckets are exact
integer day arithmetic against the data's own as-of date.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w27 import *  # noqa: F401,F403


# --- round-5 wave: context-window truncation loss -------------------------------


def ext_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation loss curve: at budgets of 128 / 512 /
    2048 / 8192 whitespace tokens, how many documents would be cut and
    what share of the corpus tokens is lost — the sizing study behind
    choosing a training context length, computed exactly from integer
    token counts (same split idiom as X219's token budget).

    Scale shape: one scan collapses each document to one integer, a
    4-way literal explode, one hash agg."""
    toks = _t(spark, sf_dir, "documents").select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("tok")
    )
    grid = toks.select(
        "tok", F.explode(F.expr("array(128L, 512L, 2048L, 8192L)")).alias("budget")
    )
    return (
        grid.groupBy("budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("CAST(tok > budget AS LONG)")).alias("n_truncated"),
            F.sum("tok").alias("total_tokens"),
            F.sum(F.expr("GREATEST(tok - budget, 0L)")).alias("tokens_lost"),
        )
        .select(
            "budget",
            "n_docs",
            "n_truncated",
            "total_tokens",
            "tokens_lost",
            F.expr(
                "ROUND(CAST(tokens_lost AS DOUBLE)/total_tokens, 6)"
            ).alias("loss_share"),
        )
        .orderBy("budget")
    )


EXT_TRUNCATION_LOSS_SQL = r"""
WITH toks AS (
  SELECT CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS tok
  FROM documents
),
grid AS (
  SELECT tok, budget
  FROM toks CROSS JOIN (SELECT UNNEST([128, 512, 2048, 8192]) AS budget)
)
SELECT budget,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(tok > budget AS BIGINT)) AS BIGINT) AS n_truncated,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(GREATEST(tok - budget, 0)) AS BIGINT) AS tokens_lost,
       ROUND(CAST(SUM(GREATEST(tok - budget, 0)) AS DOUBLE)/SUM(tok), 6)
         AS loss_share
FROM grid GROUP BY budget ORDER BY budget
"""


EXT_QUERIES.update({"ext_truncation_loss": ext_truncation_loss})
EXT_ORACLES.update({"ext_truncation_loss": EXT_TRUNCATION_LOSS_SQL})


# --- round-5 wave: popularity-recommender holdout eval ---------------------------


def ext_rec_popularity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout evaluation of the popularity recommender every ranking
    model must beat: train item popularity on events before 2024-01-25,
    recommend the global top-10 (count desc, item asc tie-break), and
    score on the heldout tail — user hit rate (share of test users who
    touch a recommended item), the share of test item-events the
    top-10 covers, and catalog coverage@10. The baseline row any
    recsys experiment report starts with.

    Scale shape: two grouped passes (train counts, test user flags), a
    top-10 broadcast, one scalar agg; no per-user ranking anywhere."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("item"),
        F.expr("CAST(CAST(ts AS DATE) < DATE'2024-01-25' AS INT)").alias("is_train"),
    ).filter(F.col("item").isNotNull())
    train_counts = (
        ev.filter("is_train = 1").groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    )
    top10 = (
        train_counts.orderBy(F.col("c").desc(), "item")
        .limit(10)
        .select("item", F.lit(1).alias("is_top"))
    )
    test = ev.filter("is_train = 0").join(F.broadcast(top10), "item", "left")
    users = test.groupBy("user_id").agg(
        F.max(F.expr("CAST(is_top = 1 AS INT)")).alias("hit")
    )
    n_train_items = train_counts.agg(
        F.count(F.lit(1)).alias("n_train_items")
    )
    ev_cov = test.agg(
        F.count(F.lit(1)).alias("n_test_events"),
        F.sum(F.expr("CAST(is_top = 1 AS LONG)")).alias("n_top_events"),
    )
    u_cov = users.agg(
        F.count(F.lit(1)).alias("n_test_users"),
        F.sum("hit").alias("n_hit_users"),
    )
    return (
        u_cov.crossJoin(F.broadcast(ev_cov))
        .crossJoin(F.broadcast(n_train_items))
        .select(
            "n_train_items",
            "n_test_users",
            F.expr(
                "ROUND(CAST(n_hit_users AS DOUBLE)/n_test_users, 6)"
            ).alias("user_hit_rate"),
            F.expr(
                "ROUND(CAST(n_top_events AS DOUBLE)/n_test_events, 6)"
            ).alias("test_event_share_top10"),
            F.expr(
                "ROUND(LEAST(10.0, CAST(n_train_items AS DOUBLE))/n_train_items, 6)"
            ).alias("coverage_at_10"),
        )
    )


EXT_REC_POPULARITY_EVAL_SQL = r"""
WITH ev AS (
  SELECT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item,
         CAST(CAST(ts AS DATE) < DATE '2024-01-25' AS INTEGER) AS is_train
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
),
train_counts AS (
  SELECT item, COUNT(*) AS c FROM ev WHERE is_train = 1 GROUP BY item
),
top10 AS (
  SELECT item, 1 AS is_top FROM train_counts ORDER BY c DESC, item LIMIT 10
),
test AS (
  SELECT e.user_id, t.is_top
  FROM ev e LEFT JOIN top10 t ON t.item = e.item
  WHERE e.is_train = 0
),
users AS (
  SELECT user_id, MAX(CAST(is_top = 1 AS INTEGER)) AS hit
  FROM test GROUP BY user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM train_counts) AS n_train_items,
       CAST(COUNT(*) AS BIGINT) AS n_test_users,
       ROUND(CAST(SUM(hit) AS DOUBLE)/COUNT(*), 6) AS user_hit_rate,
       (SELECT ROUND(CAST(SUM(CAST(is_top = 1 AS BIGINT)) AS DOUBLE)/COUNT(*), 6)
        FROM test) AS test_event_share_top10,
       (SELECT ROUND(LEAST(10.0, CAST(COUNT(*) AS DOUBLE))/COUNT(*), 6)
        FROM train_counts) AS coverage_at_10
FROM users
"""


EXT_QUERIES.update({"ext_rec_popularity_eval": ext_rec_popularity_eval})
EXT_ORACLES.update({"ext_rec_popularity_eval": EXT_REC_POPULARITY_EVAL_SQL})


# --- round-5 wave: receivables aging ---------------------------------------------


def ext_receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receivables aging of OPEN orders as of the data's own latest
    order date: value outstanding per 0-30 / 31-60 / 61-90 / 91+ day
    bucket with exact integer cents and each bucket's share of the
    open book — the collections report every finance team runs, with
    the as-of date derived from the data so the query is reproducible
    at any scale factor.

    Scale shape: one scalar max, one filtered pass bucketed by exact
    day arithmetic, O(4) output."""
    o = _t(spark, sf_dir, "orders")
    asof = o.agg(F.max(F.expr("CAST(o_orderdate AS DATE)")).alias("asof"))
    aged = (
        o.filter("o_orderstatus = 'O'")
        .crossJoin(F.broadcast(asof))
        .select(
            F.expr("DATEDIFF(asof, CAST(o_orderdate AS DATE))").alias("age"),
            F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").alias("vc"),
        )
        .select(
            F.expr(
                "CASE WHEN age <= 30 THEN 'a_0_30'"
                " WHEN age <= 60 THEN 'b_31_60'"
                " WHEN age <= 90 THEN 'c_61_90'"
                " ELSE 'd_over_90' END"
            ).alias("bucket"),
            "vc",
        )
    )
    wall = Window.partitionBy()
    return (
        aged.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("vc").alias("vc"))
        .withColumn("tot", F.sum("vc").over(wall))
        .select(
            "bucket",
            "n_orders",
            F.expr("ROUND(vc/1e2, 2)").alias("open_value"),
            F.expr("ROUND(CAST(vc AS DOUBLE)/tot, 6)").alias("value_share"),
        )
        .orderBy("bucket")
    )


EXT_RECEIVABLES_AGING_SQL = r"""
WITH asof_t AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS asof_d FROM orders
),
aged AS (
  SELECT CASE WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), a.asof_d) <= 30
                THEN 'a_0_30'
              WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), a.asof_d) <= 60
                THEN 'b_31_60'
              WHEN DATEDIFF('day', CAST(o_orderdate AS DATE), a.asof_d) <= 90
                THEN 'c_61_90'
              ELSE 'd_over_90' END AS bucket,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS vc
  FROM orders CROSS JOIN asof_t a
  WHERE o_orderstatus = 'O'
),
by_bucket AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(vc) AS BIGINT) AS vc
  FROM aged GROUP BY bucket
)
SELECT bucket, n_orders,
       ROUND(vc/1e2, 2) AS open_value,
       ROUND(CAST(vc AS DOUBLE)/SUM(vc) OVER (), 6) AS value_share
FROM by_bucket ORDER BY bucket
"""


EXT_QUERIES.update({"ext_receivables_aging": ext_receivables_aging})
EXT_ORACLES.update({"ext_receivables_aging": EXT_RECEIVABLES_AGING_SQL})
