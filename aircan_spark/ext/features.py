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
