"""Declared-query wave (round 6): the two targeted-delete engine ops —
X224's full-rewrite ParquetTable.delete and X194's bucket-pruned
BucketedParquetTable.delete — get driver-checkable batch-parity records.
The delete itself is an engine op (snapshot rewrite, manifest commit),
but its OBSERVABLE RESULT is pure relational algebra: survivors =
orders LEFT ANTI the key set, with `_id` numbering assigned BEFORE the
delete (so per-group MAX(_id) proves ids are preserved, not renumbered)
and the op's return value equal to the key set's row count. Both facts
replay in one SQL statement, so a wrong anti-join, a renumbering bug,
or a bucket-pruning miss shifts the hash.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w48 import *  # noqa: F401,F403


_DELETE_PARITY_SQL = r"""
WITH numbered AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
  FROM orders
),
surv AS (SELECT * FROM numbered WHERE o_orderkey % 7 <> 3)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(MAX(rid) AS BIGINT) AS max_id,
       CAST((SELECT COUNT(*) FROM numbered WHERE o_orderkey % 7 = 3) AS BIGINT)
         AS n_deleted
FROM surv GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def _delete_parity(spark: SparkSession, sf_dir: str, bucketed: bool) -> DataFrame:
    """Shared harness: load orders into a fresh table (numbered by
    o_orderkey — the A1/P1 path), run the REAL delete of keys with
    o_orderkey % 7 == 3, and summarize the survivors per order status
    with the preserved _id maxima and the op's reported delete count."""
    import tempfile

    from aircan_spark.rownum import with_row_number

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    numbered = with_row_number(orders, column="_id", order_by=["o_orderkey"])
    wh = tempfile.mkdtemp(prefix="aircan_r6_delete_wh_")
    if bucketed:
        from aircan_spark.bucketed import BucketedParquetTable

        table = BucketedParquetTable(
            spark, wh, "t", keys=["o_orderkey"], num_buckets=16
        )
        table.overwrite(numbered)
        doomed = orders.filter(F.expr("o_orderkey % 7 = 3")).select("o_orderkey")
        n_del = table.delete(doomed)
    else:
        from aircan_spark.table import ParquetTable

        table = ParquetTable(spark, wh, "t")
        table.overwrite(numbered)
        doomed = orders.filter(F.expr("o_orderkey % 7 = 3")).select("o_orderkey")
        n_del = table.delete(doomed, ["o_orderkey"])
    surv = table.read()
    return (
        surv.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias(
                "total_cents"
            ),
            F.max("_id").cast("bigint").alias("max_id"),
        )
        .withColumn("n_deleted", F.lit(int(n_del)).cast("bigint"))
        .orderBy("o_orderstatus")
    )


def ext_table_delete_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X224 as a driver-checkable query: REAL ParquetTable.delete (LEFT
    ANTI snapshot rewrite, versioned commit). See _delete_parity."""
    return _delete_parity(spark, sf_dir, bucketed=False)


def ext_bucketed_delete_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X194 as a driver-checkable query: REAL BucketedParquetTable.delete
    — the bucket-pruned GDPR path (only buckets hosting doomed keys are
    rewritten; at 16 buckets and keys spread across all residues every
    bucket is touched here, but the same summary catches a pruning bug
    that drops or spares the wrong bucket). See _delete_parity."""
    return _delete_parity(spark, sf_dir, bucketed=True)


EXT_QUERIES.update(
    {
        "ext_table_delete_parity": ext_table_delete_parity,
        "ext_bucketed_delete_parity": ext_bucketed_delete_parity,
    }
)
EXT_ORACLES.update(
    {
        "ext_table_delete_parity": _DELETE_PARITY_SQL,
        "ext_bucketed_delete_parity": _DELETE_PARITY_SQL,
    }
)
