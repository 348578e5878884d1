"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — every implemented operator's declared correctness query
(SURVEY.md §2.12 plus the ext/ beyond-reference operators).
``oracle_sql()`` — matching DuckDB SQL; keys absent here get the weaker
rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aircan_spark.data import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing summary over lineitem (scan -> filter -> groupBy
    -> agg), the shape of the engine's hot path."""
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aircan_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from aircan_spark.queries import ORACLES

    return dict(ORACLES)
