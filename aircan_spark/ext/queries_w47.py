"""Declared-query wave (round 6): the SQL TEXT surface as a family —
five dialect-portable ANSI queries submitted VERBATIM through
``aircan_spark.sqlapi.sql`` (spark.sql over the registered views) AND
used verbatim as their own DuckDB oracles, so the SQL-text path is
zero-drift by construction (the X202 pattern, widened from one query to
a family). Each key exercises a DIFFERENT dialect-sensitive Catalyst
surface, so parser/analyzer drift in any of them fails its own key:

- window functions over aggregates (RANK / SUM OVER after GROUP BY)
- GROUP BY ROLLUP with GROUPING() super-aggregate markers
- correlated EXISTS (Catalyst's semi-join rewrite)
- INTERSECT / EXCEPT set operations
- scalar subqueries in HAVING

Determinism: counts are exact integers, money goes through the repo's
CAST(ROUND(x*100) AS BIGINT) cents convention, every query carries a
total ORDER BY.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w46 import *  # noqa: F401,F403


#: name -> ONE dialect-portable SQL string: fed to spark.sql AND to the
#: DuckDB oracle verbatim.
SQLTEXT_QUERIES: dict[str, str] = {
    # window functions OVER an aggregated relation: rank event types by
    # volume and carry the grand total as a windowed sum — the
    # aggregate-then-window analyzer path.
    "ext_sqltext_window_rank": """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(RANK() OVER (ORDER BY COUNT(*) DESC, event_type) AS BIGINT) AS volume_rank,
       CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_events
FROM events
GROUP BY event_type
ORDER BY volume_rank, event_type
""",
    # ROLLUP super-aggregates with GROUPING() markers: the cube/rollup
    # parser surface plus NULL-vs-'ALL' disambiguation.
    "ext_sqltext_rollup_grouping": """
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY g_region DESC, g_nation DESC, region_name, nation_name
""",
    # correlated EXISTS — Catalyst rewrites to a left-semi join; the
    # TPC-H Q4 shape (orders with at least one returned lineitem; the
    # testdata lineitem carries l_returnflag but no commit/receipt
    # dates).
    "ext_sqltext_correlated_exists": """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_return_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    # INTERSECT / EXCEPT set operations over customer cohorts.
    "ext_sqltext_set_cohorts": """
WITH f_buyers AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
),
o_buyers AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
)
SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (SELECT k FROM f_buyers INTERSECT SELECT k FROM o_buyers) AS b
UNION ALL
SELECT 'f_only' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (SELECT k FROM f_buyers EXCEPT SELECT k FROM o_buyers) AS f
UNION ALL
SELECT 'o_only' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (SELECT k FROM o_buyers EXCEPT SELECT k FROM f_buyers) AS o
ORDER BY cohort
""",
    # scalar subqueries in HAVING: nations whose supplier count exceeds
    # the global mean suppliers-per-nation.
    "ext_sqltext_scalar_having": """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(*) > (SELECT COUNT(*) FROM supplier) * 1.0
                  / (SELECT COUNT(*) FROM nation)
ORDER BY n_name
""",
}


def _make_sqltext_query(sql_text: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aircan_spark import sqlapi

        return sqlapi.sql(spark, sf_dir, sql_text)

    return run


for _name, _sql in SQLTEXT_QUERIES.items():
    _fn = _make_sqltext_query(_sql)
    _fn.__name__ = _name
    _fn.__doc__ = (
        "SQL-text surface family member (see module docstring): this "
        "exact string runs through spark.sql AND is its own DuckDB "
        "oracle.\n" + _sql
    )
    globals()[_name] = _fn
    EXT_QUERIES.update({_name: _fn})
    EXT_ORACLES.update({_name: _sql})
del _name, _sql, _fn
