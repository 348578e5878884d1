"""Declared-query waves: round-5 wave: event-time ordering audit; round-5
wave: item cold-start (catalog freshness) mix; round-5 wave: survivorship
bias quantification.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: pure integer counting and integer-cent means throughout.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w22 import *  # noqa: F401,F403


# --- round-5 wave: event-time ordering audit ----------------------------------


def ext_ordering_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time ordering audit over the ingest order (event_id): per
    user, count inversions where a later-ingested event carries an
    EARLIER timestamp, and the worst backward jump in seconds — the
    measurement that sizes streaming watermarks (a clean feed reports
    zero and licenses watermark 0; any skew quantifies exactly how much
    delay `withWatermark` must absorb). One per-user LAG window; exact
    integer microsecond arithmetic.

    Scale shape: one high-cardinality-key window + one scalar agg."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.expr("unix_micros(ts)").alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
    )
    return ev.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.expr("CAST(us < prev_us AS LONG)")).alias("n_inversions"),
        F.expr(
            "CAST(COALESCE(MAX(CASE WHEN us < prev_us THEN (prev_us - us) DIV 1000000 END), 0) AS BIGINT)"
        ).alias("max_backward_s"),
        F.expr(
            "ROUND(CAST(SUM(CAST(us < prev_us AS LONG)) AS DOUBLE)/COUNT(*), 6)"
        ).alias("inversion_rate"),
    )


EXT_ORDERING_AUDIT_SQL = r"""
WITH ev AS (
  SELECT epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_us
  FROM events
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CAST(us < prev_us AS BIGINT)) AS BIGINT) AS n_inversions,
       CAST(COALESCE(MAX(CASE WHEN us < prev_us THEN (prev_us - us) // 1000000 END), 0) AS BIGINT) AS max_backward_s,
       ROUND(CAST(SUM(CAST(us < prev_us AS BIGINT)) AS DOUBLE)/COUNT(*), 6) AS inversion_rate
FROM ev WHERE prev_us IS NOT NULL
"""


EXT_QUERIES.update({"ext_ordering_audit": ext_ordering_audit})
EXT_ORACLES.update({"ext_ordering_audit": EXT_ORDERING_AUDIT_SQL})


# --- round-5 wave: item cold-start mix ----------------------------------------


def ext_item_cold_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-freshness mix: per week, the share of item-tagged events
    touching items FIRST seen that week — the cold-start exposure a
    recommender faces, and the decay curve of catalog novelty as a
    corpus matures. First-seen week per item is one MIN aggregate;
    attribution is a broadcast join back; everything is integer counts.

    Scale shape: item extraction + two hash aggs + broadcast item-dim
    join (O(items) side)."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("item"),
            F.expr(
                "CAST(DATEDIFF(CAST(ts AS DATE), DATE'2024-01-01') DIV 7 AS BIGINT)"
            ).alias("wk"),
        )
        .filter(F.col("item").isNotNull())
    )
    first = ev.groupBy("item").agg(F.min("wk").alias("first_wk"))
    return (
        ev.join(F.broadcast(first), "item")
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("item").alias("n_items"),
            F.sum(F.expr("CAST(first_wk = wk AS LONG)")).alias("n_cold_events"),
        )
        .select(
            "wk",
            "n_events",
            "n_items",
            "n_cold_events",
            F.expr(
                "ROUND(CAST(n_cold_events AS DOUBLE)/n_events, 6)"
            ).alias("cold_share"),
        )
        .orderBy("wk")
    )


EXT_ITEM_COLD_START_SQL = r"""
WITH ev AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
         DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
),
first AS (SELECT item, MIN(wk) AS first_wk FROM ev GROUP BY item)
SELECT wk, COUNT(*) AS n_events, COUNT(DISTINCT item) AS n_items,
       CAST(SUM(CAST(first_wk = wk AS BIGINT)) AS BIGINT) AS n_cold_events,
       ROUND(CAST(SUM(CAST(first_wk = wk AS BIGINT)) AS DOUBLE)/COUNT(*), 6) AS cold_share
FROM ev JOIN first USING (item)
GROUP BY wk ORDER BY wk
"""


EXT_QUERIES.update({"ext_item_cold_start": ext_item_cold_start})
EXT_ORACLES.update({"ext_item_cold_start": EXT_ITEM_COLD_START_SQL})


# --- round-5 wave: survivorship bias audit ------------------------------------


def ext_survivorship_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship-bias quantification: average per-user spend computed
    over ONLY the users active in both halves of the window (the
    'survivors' most dashboards silently condition on) vs over ALL
    users — the gap is the survivor premium that inflates any metric
    restricted to still-active accounts. Survivor membership is an
    exact half-presence check; means are integer-cent sums.

    Scale shape: one per-user conditional agg; two scalar re-aggs."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).alias("yc"),
            F.max(
                F.expr("CAST(CAST(ts AS DATE) < DATE'2024-01-16' AS INT)")
            ).alias("in_h1"),
            F.max(
                F.expr("CAST(CAST(ts AS DATE) >= DATE'2024-01-16' AS INT)")
            ).alias("in_h2"),
        )
    )
    return users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.expr("CAST(in_h1 = 1 AND in_h2 = 1 AS LONG)")).alias("n_survivors"),
        F.expr("ROUND(CAST(SUM(yc) AS DOUBLE)/COUNT(*)/1e2, 4)").alias(
            "mean_spend_all"
        ),
        F.expr(
            "ROUND(CAST(SUM(CASE WHEN in_h1 = 1 AND in_h2 = 1 THEN yc ELSE 0 END) AS DOUBLE)"
            "/SUM(CAST(in_h1 = 1 AND in_h2 = 1 AS LONG))/1e2, 4)"
        ).alias("mean_spend_survivors"),
        F.expr(
            "ROUND(CAST(SUM(CASE WHEN in_h1 = 1 AND in_h2 = 1 THEN yc ELSE 0 END) AS DOUBLE)"
            "/SUM(CAST(in_h1 = 1 AND in_h2 = 1 AS LONG))"
            "/(CAST(SUM(yc) AS DOUBLE)/COUNT(*)) - 1, 6)"
        ).alias("survivor_premium"),
    )


EXT_SURVIVORSHIP_BIAS_SQL = r"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS yc,
         MAX(CAST(CAST(ts AS DATE) < DATE '2024-01-16' AS INTEGER)) AS in_h1,
         MAX(CAST(CAST(ts AS DATE) >= DATE '2024-01-16' AS INTEGER)) AS in_h2
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CAST(in_h1 = 1 AND in_h2 = 1 AS BIGINT)) AS BIGINT) AS n_survivors,
       ROUND(CAST(SUM(yc) AS DOUBLE)/COUNT(*)/1e2, 4) AS mean_spend_all,
       ROUND(CAST(SUM(CASE WHEN in_h1 = 1 AND in_h2 = 1 THEN yc ELSE 0 END) AS DOUBLE)
             /SUM(CAST(in_h1 = 1 AND in_h2 = 1 AS BIGINT))/1e2, 4) AS mean_spend_survivors,
       ROUND(CAST(SUM(CASE WHEN in_h1 = 1 AND in_h2 = 1 THEN yc ELSE 0 END) AS DOUBLE)
             /SUM(CAST(in_h1 = 1 AND in_h2 = 1 AS BIGINT))
             /(CAST(SUM(yc) AS DOUBLE)/COUNT(*)) - 1, 6) AS survivor_premium
FROM users
"""


EXT_QUERIES.update({"ext_survivorship_bias": ext_survivorship_bias})
EXT_ORACLES.update({"ext_survivorship_bias": EXT_SURVIVORSHIP_BIAS_SQL})
