"""SQL surface: register the engine's tables as temp views and run ANSI
SQL through Spark SQL — the parity path for users who query with SQL text
instead of the DataFrame API. Catalyst compiles both to the same plans
(pushdown, broadcast, AQE apply identically), so everything in the
DataFrame registry is equally expressible here.

Written dialect-portably (EXTRACT, CAST/DECIMAL, window functions): the
declared `ext_sql_interface` query feeds the SAME string to Spark and to
the DuckDB oracle — zero-drift by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register each parquet table as a temp view named after itself."""
    from aircan_spark.data import load_table

    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the standard tables, then run ``query`` via Spark SQL."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
