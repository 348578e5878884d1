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


def expectations(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Declarative data-quality gate (Great-Expectations-shaped): evaluate
    a list of checks in ONE aggregate pass and return one row per check —
    (check_id, column, kind, observed, threshold, passed).

    Check kinds (each a dict with ``column``, ``kind``, and a bound):
    - ``not_null_rate``  {min}:  fraction of non-null values >= min
    - ``min``            {min}:  column minimum >= min
    - ``max``            {max}:  column maximum <= max
    - ``distinct_max``   {max}:  exact distinct count <= max
    - ``in_set_rate``    {values, min}: fraction of non-null values in set
    - ``unique``         {}:     no duplicated values (distinct == non-null)

    Every bound is evaluated from partial-aggregable expressions
    (count/sum/min/max/count_distinct), so the whole suite costs one scan
    regardless of how many checks it carries — the shape that lets a
    1000-executor ingest gate run as a single job. ``observed`` is the
    measured value as double (rates, mins, counts), NULL-safe."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, ck in enumerate(checks):
        c, kind = F.col(ck["column"]), ck["kind"]
        if kind == "not_null_rate":
            aggs.append(F.sum(F.when(c.isNotNull(), 1).otherwise(0)).alias(f"__a{i}"))
        elif kind == "min":
            aggs.append(F.min(c).cast("double").alias(f"__a{i}"))
        elif kind == "max":
            aggs.append(F.max(c).cast("double").alias(f"__a{i}"))
        elif kind == "distinct_max":
            aggs.append(F.count_distinct(c).alias(f"__a{i}"))
        elif kind == "in_set_rate":
            vals = list(ck["values"])
            aggs.append(F.sum(F.when(c.isin(*vals), 1).otherwise(0)).alias(f"__a{i}"))
            aggs.append(F.sum(F.when(c.isNotNull(), 1).otherwise(0)).alias(f"__b{i}"))
        elif kind == "unique":
            aggs.append(F.count_distinct(c).alias(f"__a{i}"))
            aggs.append(F.sum(F.when(c.isNotNull(), 1).otherwise(0)).alias(f"__b{i}"))
        else:
            raise ValueError(f"unknown check kind: {kind!r}")
    wide = df.agg(*aggs)

    rows = []
    for i, ck in enumerate(checks):
        kind = ck["kind"]
        a = F.col(f"__a{i}").cast("double")
        if kind == "not_null_rate":
            observed = F.round(a / F.col("__n"), 6)
            threshold, passed = ck["min"], observed >= ck["min"]
        elif kind == "min":
            observed = a
            threshold, passed = ck["min"], observed >= ck["min"]
        elif kind == "max":
            observed = a
            threshold, passed = ck["max"], observed <= ck["max"]
        elif kind == "distinct_max":
            observed = a
            threshold, passed = ck["max"], observed <= ck["max"]
        elif kind == "in_set_rate":
            observed = F.round(a / F.greatest(F.col(f"__b{i}"), F.lit(1)).cast("double"), 6)
            threshold, passed = ck["min"], observed >= ck["min"]
        else:  # unique
            observed = a
            threshold = None
            passed = F.col(f"__a{i}") == F.col(f"__b{i}")
        rows.append(
            F.struct(
                F.lit(ck.get("id", f"check_{i}")).alias("check_id"),
                F.lit(ck["column"]).alias("column"),
                F.lit(kind).alias("kind"),
                observed.alias("observed"),
                F.lit(threshold).cast("double").alias("threshold"),
                passed.alias("passed"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
