"""Declared-query waves: round-5 wave: invoice conformance audit;
round-5 wave: duplicate-payment candidate detection; round-5 wave:
erasure (right-to-be-forgotten) cascade audit.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: all money flows through exact integer cents; pair
detection joins on exact keys with explicit (k1 < k2) dedup and
integer day gaps; the erasure tombstone set is md5-derived.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w24 import *  # noqa: F401,F403


# --- round-5 wave: invoice conformance audit -----------------------------------


def ext_invoice_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table invoice conformance: per order, the stored
    o_totalprice vs the total recomputed from its lineitems
    (SUM(extendedprice*(1-discount)*(1+tax))), residuals bucketed into
    exact-match / <=$1 / <=$100 / >$100 / no-lineitems classes — the
    ledger-consistency audit that catches partial loads, double loads
    and rounding drift between systems of record. All money is exact
    integer cents; the per-line product is the identical float
    expression in both engines before the single ROUND to cents.

    Scale shape: one grouped pass over lineitem to per-order cents, a
    key join to orders, then an O(buckets) collapse."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(ROUND(l_extendedprice*(1 - l_discount)*(1 + l_tax)*100)"
                    " AS BIGINT)"
                )
            ).alias("calc_c")
        )
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").alias("stored_c"),
    )
    res = o.join(li, "l_orderkey", "left").select(
        F.expr(
            "CASE WHEN calc_c IS NULL THEN 'no_lineitems'"
            " WHEN stored_c = calc_c THEN 'exact'"
            " WHEN ABS(stored_c - calc_c) <= 100 THEN 'within_1_dollar'"
            " WHEN ABS(stored_c - calc_c) <= 10000 THEN 'within_100_dollars'"
            " ELSE 'over_100_dollars' END"
        ).alias("bucket"),
        F.expr("COALESCE(ABS(stored_c - calc_c), stored_c)").alias("abs_resid_c"),
    )
    by_bucket = res.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("ROUND(MAX(abs_resid_c)/1e2, 2)").alias("max_abs_resid"),
    )
    wall = Window.partitionBy()
    return (
        by_bucket.withColumn("tot", F.sum("n_orders").over(wall))
        .select(
            "bucket",
            "n_orders",
            F.expr("ROUND(CAST(n_orders AS DOUBLE)/tot, 6)").alias("share"),
            "max_abs_resid",
        )
        .orderBy("bucket")
    )


EXT_INVOICE_CONFORMANCE_SQL = r"""
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1 - l_discount)*(1 + l_tax)*100)
                       AS BIGINT)) AS BIGINT) AS calc_c
  FROM lineitem GROUP BY l_orderkey
),
res AS (
  SELECT CASE WHEN li.calc_c IS NULL THEN 'no_lineitems'
              WHEN CAST(ROUND(o_totalprice*100) AS BIGINT) = li.calc_c THEN 'exact'
              WHEN ABS(CAST(ROUND(o_totalprice*100) AS BIGINT) - li.calc_c) <= 100
                THEN 'within_1_dollar'
              WHEN ABS(CAST(ROUND(o_totalprice*100) AS BIGINT) - li.calc_c) <= 10000
                THEN 'within_100_dollars'
              ELSE 'over_100_dollars' END AS bucket,
         COALESCE(ABS(CAST(ROUND(o_totalprice*100) AS BIGINT) - li.calc_c),
                  CAST(ROUND(o_totalprice*100) AS BIGINT)) AS abs_resid_c
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
, by_bucket AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(MAX(abs_resid_c)/1e2, 2) AS max_abs_resid
  FROM res GROUP BY bucket
)
SELECT bucket, n_orders,
       ROUND(CAST(n_orders AS DOUBLE)/SUM(n_orders) OVER (), 6) AS share,
       max_abs_resid
FROM by_bucket ORDER BY bucket
"""


EXT_QUERIES.update({"ext_invoice_conformance": ext_invoice_conformance})
EXT_ORACLES.update({"ext_invoice_conformance": EXT_INVOICE_CONFORMANCE_SQL})


# --- round-5 wave: duplicate-payment candidates --------------------------------


def ext_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment candidate detection: pairs of DIFFERENT orders
    from the SAME customer within a 3-day window whose amounts agree to
    5% — the classic accounts-payable audit (double-submitted
    invoices, resubmissions with small corrections). The self-join
    keys on customer, so fan-out is bounded by orders-per-customer
    (constant in TPC-H-shaped data), never an all-pairs blowup;
    (k1 < k2) dedups each pair once, and the tolerance test is an
    exact cross-multiplied integer compare — no division. Top 15 by
    amount, then keys, for a stable multi-row answer.

    Scale shape: bounded equi-self-join on the customer key; the
    ranked output is a tiny head on the pair set."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)").alias("amt_c"),
        F.expr("CAST(o_orderdate AS DATE)").alias("d"),
    )
    a = o.select(
        "o_custkey",
        F.col("amt_c").alias("c1"),
        F.col("o_orderkey").alias("k1"),
        F.col("d").alias("d1"),
    )
    b = o.select(
        "o_custkey",
        F.col("amt_c").alias("c2"),
        F.col("o_orderkey").alias("k2"),
        F.col("d").alias("d2"),
    )
    pairs = (
        a.join(b, "o_custkey")
        .filter(
            F.expr(
                "k1 < k2 AND ABS(DATEDIFF(d2, d1)) <= 3"
                " AND ABS(c1 - c2)*100 <= 5*LEAST(c1, c2)"
            )
        )
        .select(
            "o_custkey",
            "c1",
            "c2",
            "k1",
            "k2",
            F.expr("ABS(DATEDIFF(d2, d1))").alias("day_gap"),
        )
    )
    return (
        pairs.select(
            "o_custkey",
            F.expr("ROUND(c1/1e2, 2)").alias("amount_1"),
            F.expr("ROUND(c2/1e2, 2)").alias("amount_2"),
            "k1",
            "k2",
            "day_gap",
        )
        .orderBy(F.col("amount_1").desc(), "k1", "k2")
        .limit(15)
    )


EXT_DUPLICATE_PAYMENTS_SQL = r"""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS amt_c,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT a.o_custkey,
       ROUND(a.amt_c/1e2, 2) AS amount_1,
       ROUND(b.amt_c/1e2, 2) AS amount_2,
       a.o_orderkey AS k1,
       b.o_orderkey AS k2,
       ABS(DATEDIFF('day', a.d, b.d)) AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND ABS(DATEDIFF('day', a.d, b.d)) <= 3
 AND ABS(a.amt_c - b.amt_c)*100 <= 5*LEAST(a.amt_c, b.amt_c)
ORDER BY amount_1 DESC, k1, k2 LIMIT 15
"""


EXT_QUERIES.update({"ext_duplicate_payments": ext_duplicate_payments})
EXT_ORACLES.update({"ext_duplicate_payments": EXT_DUPLICATE_PAYMENTS_SQL})


# --- round-5 wave: erasure cascade audit ---------------------------------------


def ext_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: for a tombstone set of
    customers (md5(custkey) % 97 == 0, ~1%), count the rows that would
    have to disappear from EACH table reachable through the FK chain —
    customer rows, their orders, and the lineitems of those orders.
    The blast-radius measurement an erasure pipeline runs before and
    after a delete to prove the cascade completed.

    Scale shape: the tombstone set is ~1% of customers (broadcastable);
    orders filters by a semi join against it, lineitem by a semi join
    against the ~1% of orders — no full-table shuffle anywhere."""
    tomb = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey")
        .filter(
            F.expr(
                "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 97 = 0"
            )
        )
    )
    t_orders = _t(spark, sf_dir, "orders").join(
        F.broadcast(tomb.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_semi",
    )
    t_li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(t_orders.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey",
        "left_semi",
    )
    rows = [
        tomb.agg(
            F.lit("customer").alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
        t_orders.agg(
            F.lit("orders").alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
        t_li.agg(
            F.lit("lineitem").alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name")


EXT_ERASURE_AUDIT_SQL = r"""
WITH tomb AS (
  SELECT c_custkey FROM customer
  WHERE CAST(('0x' || SUBSTR(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT % 97
             AS BIGINT) = 0
),
t_orders AS (
  SELECT o.* FROM orders o WHERE o.o_custkey IN (SELECT c_custkey FROM tomb)
)
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM tomb
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM t_orders
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM t_orders)
ORDER BY table_name
"""


EXT_QUERIES.update({"ext_erasure_audit": ext_erasure_audit})
EXT_ORACLES.update({"ext_erasure_audit": EXT_ERASURE_AUDIT_SQL})
