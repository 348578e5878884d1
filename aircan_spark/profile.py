"""Column profiler — the data-quality summary every ingestion pipeline
prints before loading: per-column null counts, distinct cardinality, and
min/max, in long form (one row per column).

Extends the reference's schema-inference step (SURVEY S6:
``TableResource(path).infer()`` samples types but reports no content
stats) with the profile a warehouse ingest actually wants.

ONE scan: every per-column statistic is an expression in a single
aggregate (count/count-distinct/min/max all have partial map-side
forms), and the 1-row wide result is unpivoted row-locally with
``stack`` — no per-column jobs, no driver loop over columns. At 100 TB
swap exact count_distinct for approx_count_distinct per column (the
expand for multiple exact distincts multiplies the scan by the column
count)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max stringified for a uniform schema."""
    cols = columns if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
