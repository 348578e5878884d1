"""Incremental aggregate maintenance — a materialized per-key aggregate
kept current by merging delta batches, never recomputing the base.

The scale argument: a 100 TB fact table's daily delta is ~0.1% of the
base. Recomputing `GROUP BY key` over the base costs a full scan +
shuffle every refresh; merging the DELTA's partial aggregate into the
stored aggregate costs a scan of the delta plus an upsert bounded by the
touched keys (and with a bucketed target, only the touched BUCKETS
rewrite — the same partial-rewrite machinery as upsert). This works for
every algebraic aggregate (sum/count/min/max, and mean = sum+count kept
as two columns); holistic aggregates (median, exact distinct) need
sketches instead — use HLL/approx columns for those.

The refresh is idempotent per (delta, batch) only if the caller feeds
each delta exactly once — pair with streaming.stream_ingest's
checkpointed foreachBatch for exactly-once refresh off a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aircan_spark.bucketed import BucketedParquetTable


def partial_agg(
    df: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """The mergeable partial: per-key COUNT(*) as ``n`` plus decimal
    SUMs (order-independent) of ``sum_cols`` as ``sum_<col>``."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.col(c).cast("decimal(28,6)")).cast("decimal(28,6)").alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


class AggTable:
    """A materialized per-key aggregate over a BucketedParquetTable.

    ``refresh(delta)`` folds one delta batch in: partial-agg the delta,
    join with the stored rows for the touched keys, add counts/sums,
    and upsert — O(delta + touched buckets), never O(base)."""

    def __init__(
        self,
        spark,
        path: str,
        name: str,
        keys: list[str],
        sum_cols: list[str],
        num_buckets: int = 16,
    ):
        self.keys, self.sum_cols = list(keys), list(sum_cols)
        self.table = BucketedParquetTable(
            spark, path, name, keys=self.keys, num_buckets=num_buckets
        )

    def read(self) -> DataFrame:
        return self.table.read().select(
            *self.keys, "n", *[f"sum_{c}" for c in self.sum_cols]
        )

    def refresh(self, delta: DataFrame, job_ts=None) -> None:
        inc = partial_agg(delta, self.keys, self.sum_cols)
        if not self.table.exists():
            self.table.overwrite(inc)
            return
        current = self.read()
        merged = (
            current.unionByName(inc)
            .groupBy(*self.keys)
            .agg(
                F.sum("n").cast("long").alias("n"),
                *[
                    F.sum(f"sum_{c}").cast("decimal(28,6)").alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
        )
        # only keys present in the delta can have changed — restrict the
        # upsert stage to them so the bucketed partial rewrite touches
        # the minimum bucket set
        touched = merged.join(
            F.broadcast(inc.select(*self.keys).distinct()), self.keys
        )
        self.table.upsert(touched, job_ts=job_ts)
