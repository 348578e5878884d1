"""Per-entity sequence features over event streams — the feature-
engineering pass a training pipeline runs before model input: recency
(time since previous event), frequency (running event count), and
monetary-style accumulation (running value sum).

One window spec, partitioned by the entity key and ordered by a unique
(ts, id) pair: a single hash shuffle on the key computes every feature;
the cumulative frames are streaming-evaluated within each partition (no
per-row rescans). Time deltas use integer epoch micros (exact, no float
truncation); running sums go through DECIMAL so results are independent
of accumulation order across engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_event_features(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(id, key, micros_since_prev, n_prev_events, cum_value) per event.

    ``micros_since_prev`` is NULL for each key's first event;
    ``n_prev_events`` counts strictly-earlier events; ``cum_value`` is the
    running DECIMAL sum including the current row (emitted as string for
    cross-engine exactness)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    micros = F.unix_micros(F.col(ts_col))
    return events.select(
        F.col(id_col),
        F.col(key_col),
        (micros - F.lag(micros).over(w)).alias("micros_since_prev"),
        (F.count(F.lit(1)).over(cum) - 1).alias("n_prev_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .over(cum)
        .cast("decimal(24,6)")
        .cast("string")
        .alias("cum_value"),
    )


def rolling_event_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    span_seconds: int = 3600,
) -> DataFrame:
    """Time-range rolling aggregates per entity: for every event, the
    count / sum / mean of values in the trailing ``span_seconds`` window
    (inclusive of the current row) — the sliding-feature pass (e.g.
    "requests and spend in the last hour") a training pipeline computes
    per example.

    One hash shuffle on the key; the RANGE frame over integer epoch
    micros is streaming-evaluated within each sorted partition. The sum
    accumulates in DECIMAL (exact, order-independent) and the mean is
    derived as decimal-sum / count — identical across engines, unlike a
    float avg() whose value depends on accumulation order."""
    micros = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(micros)
        .rangeBetween(-span_seconds * 1_000_000, 0)
    )
    win_sum = F.sum(F.col(value_col).cast("decimal(18,6)")).over(w)
    win_cnt = F.count(value_col).over(w)
    return events.select(
        F.col(id_col),
        F.col(key_col),
        win_cnt.alias("win_count"),
        win_sum.cast("decimal(24,6)").cast("string").alias("win_sum"),
        F.round(win_sum.cast("double") / win_cnt, 6).alias("win_mean"),
    )


def zscore_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score standardization: (value - group mean) / group
    sample stddev, appended as ``out_col`` (rounded to 6; NULL when the
    value is NULL or the group variance is 0).

    The moment frame (one row per group: n, sum, sum-of-squares in exact
    DECIMAL) broadcasts back onto the data, so the rows themselves never
    shuffle — same shape as the quantile-band filter. Mean and variance
    are derived from the exact integer/decimal moments in one double
    expression, so results are bit-identical across engines; a native
    stddev_samp() would differ in the last ulp with partial-agg order."""
    v_dec = F.col(value_col).cast("decimal(18,6)")
    moments = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("__n"),
        F.sum(v_dec).alias("__s1"),
        F.sum(v_dec * v_dec).alias("__s2"),
    )
    n = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    var = (s2 - s1 * s1 / n) / (n - 1.0)
    z = F.when(
        var > 0.0,
        F.round((F.col(value_col) - s1 / n) / F.sqrt(var), 6),
    )
    return (
        df.join(F.broadcast(moments), group_cols)
        .withColumn(out_col, z)
        .drop("__n", "__s1", "__s2")
    )


def mad_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Median absolute deviation per group — the outlier-robust spread
    statistic (stddev is dominated by the very outliers a corpus filter
    wants to find). Returns (groups..., mad rounded to 6).

    This is the engine's UDAF surface demonstrated for real: median
    needs the group's values held together, which no built-in
    partial-aggregate expresses, so a pandas GROUPED_AGG UDF
    (Arrow-batched, one call per group) computes it. The UDF sorts
    internally, so results are independent of row arrival order —
    safe to oracle across engines (numpy and DuckDB both interpolate
    the even-count median). At 100 TB prefer the two-pass approx
    formulation (approx median broadcast back, then approx median of
    deviations) — kept exact here for oracle-checkability; groups must
    fit in executor memory (they're per-key, not per-corpus)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _mad(v: pd.Series) -> float:
        arr = v.dropna().to_numpy(dtype="float64")
        if arr.size == 0:
            return None
        return round(float(np.median(np.abs(arr - np.median(arr)))), 6)

    return df.groupBy(*group_cols).agg(_mad(F.col(value_col)).alias("mad"))


def debounce_events(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    gap_seconds: int = 60,
) -> DataFrame:
    """Gap-filter repeated events: drop an event when the SAME (user,
    type) fired less than ``gap_seconds`` earlier — the batch analog of
    client-side debouncing, used to strip double-clicks/retry storms
    before behavioral aggregation.

    Semantics are lag-based (gap to the previous event, kept or not):
    deterministic, one window over real keys (user x type — no
    low-cardinality trap), and exactly replayable in SQL. Ties on ts
    break by event_id so reruns keep the same row."""
    w = Window.partitionBy(user_col, type_col).orderBy(ts_col, "event_id")
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    return (
        df.withColumn("__gap", gap)
        .filter(F.col("__gap").isNull() | (F.col("__gap") >= gap_seconds))
        .drop("__gap")
    )


def ohlc_resample(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Downsample a value stream to per-(key, bucket) OHLC bars: open =
    value at the earliest row, close = at the latest, high/low = extremes,
    n = row count. The time-series resampling primitive (finance bars,
    metric rollups) on arbitrary keyed streams.

    open/close use MIN/MAX over (ts, id, value) structs — the argmin trick:
    one partial-aggregable pass, no window, deterministic under ts ties
    via the id tiebreak. One exchange on (key, bucket)."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ordkey = F.struct(F.col(ts_col), F.col(id_col), F.col(value_col))
    return (
        df.groupBy(F.col(key_col), b)
        .agg(
            F.min(ordkey).alias("__first"),
            F.max(ordkey).alias("__last"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            key_col,
            "bucket",
            F.col(f"__first.{value_col}").alias("open"),
            "high",
            "low",
            F.col(f"__last.{value_col}").alias("close"),
            "n",
        )
    )


def robust_scale(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "robust_z",
) -> DataFrame:
    """Per-group robust scaling: (value - group median) / group IQR,
    appended as ``out_col`` (rounded to 6; NULL when the value is NULL or
    the group IQR is 0). The outlier-immune sibling of z-score
    standardization — median/IQR ignore the heavy tails that drag mean
    and stddev, which is exactly when a feature pipeline wants scaling.

    Scale shape: one exchange computes the per-group exact quantile
    bounds (linear-interpolated percentile — same definition as DuckDB's
    quantile_cont, so results cross-check exactly); the O(groups) bounds
    frame broadcasts back onto the rows, which never shuffle. At 100 TB
    swap percentile for approx_percentile and keep the identical plan.
    """
    q = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med"),
        F.expr(f"percentile({value_col}, 0.25)").alias("__q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("__q3"),
    )
    iqr = F.col("__q3") - F.col("__q1")
    scaled = F.when(
        iqr > 0.0,
        F.round((F.col(value_col) - F.col("__med")) / iqr, 6),
    )
    return (
        df.join(F.broadcast(q), group_cols)
        .withColumn(out_col, scaled)
        .drop("__med", "__q1", "__q3")
    )
