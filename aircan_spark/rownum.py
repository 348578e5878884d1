"""Distributed contiguous row numbering — the engine's system `_id` column.

Reference semantics (SURVEY.md §1.4; /root/reference/aircan/dependencies/
cloud/storage.py:69-88,119-125,172-174 and cloud/warehouse.py:13-31):
every ingested table gets a sequential INT64 `_id` as its FIRST column,
numbered 1..N in source order for overwrite, continuing at MAX(_id)+1 for
append, preserved on upsert matches.

The reference streams single-threaded so a counter suffices. On Spark a
naive ``row_number().over(Window.orderBy(...))`` with no partitioning
collapses the whole table into ONE task — unusable at scale. Instead we use
the partition-offset scheme (zipWithIndex's algorithm, expressed on the
DataFrame API):

1. fix a deterministic partition-local order (explicit sort columns, or
   ``monotonically_increasing_id`` which is monotone within a partition and
   encodes the partition index in its high 33 bits — so ordering (pid,
   local) reproduces source/file order for ordered-split sources);
2. count rows per partition (cheap map-side agg, one number per partition);
3. cumulative-sum the counts on the driver (#partitions values, not data);
4. ``row_number()`` within each partition + that partition's offset.

Total cost: one extra pass for the counts (avoidable only by caching), zero
shuffles of the data itself. Scales to any number of partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aircan_spark import ROW_NUMBER_COLUMN

_PID = "__aircan_pid"
_LOCAL = "__aircan_local_order"

# Frames persisted by with_row_number(cache=True) that have not been
# released yet. The numbered result is lazy, so the cache must outlive this
# function call — callers that materialize the result (pipeline.run, table
# writes) call release_caches() afterwards; otherwise LRU eviction applies.
_ACTIVE_CACHES: list[DataFrame] = []


def release_caches() -> int:
    """Unpersist every frame ``with_row_number`` persisted and not yet
    released. Call after the numbered frame has been materialized (written
    or collected); returns the number of caches released. Safe to call
    repeatedly / with nothing outstanding."""
    n = 0
    while _ACTIVE_CACHES:
        df = _ACTIVE_CACHES.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n


def with_row_number(
    df: DataFrame,
    column: str = ROW_NUMBER_COLUMN,
    start: int = 1,
    order_by: list[str | Column] | None = None,
    cache: bool = True,
) -> DataFrame:
    """Prepend a contiguous row-number column starting at ``start``.

    ``order_by``: explicit global ordering columns. When given, the frame is
    range-repartitioned on them first so the numbering is a true global
    order. When omitted, source order is preserved (file/split order), which
    matches the reference's ingest numbering.

    ``cache``: the algorithm reads the frame twice (counts, then numbering);
    caching guarantees the two passes see identical partitioning. Disable
    only for deterministic one-pass-cheap sources.
    """
    if order_by:
        cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
        prepared = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
        prepared = prepared.withColumn(_PID, F.spark_partition_id())
        local_order = cols
    else:
        prepared = df.withColumn(_LOCAL, F.monotonically_increasing_id())
        prepared = prepared.withColumn(_PID, F.spark_partition_id())
        local_order = [F.col(_LOCAL)]

    if cache:
        prepared = prepared.persist()
        _ACTIVE_CACHES.append(prepared)

    counts = {
        row[_PID]: row["cnt"]
        for row in prepared.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start - 1
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # Offsets enter the plan as a literal map — one entry per partition,
    # broadcast implicitly with the task closure. No join, no shuffle.
    if offsets:
        map_entries: list[Column] = []
        for pid, off in offsets.items():
            map_entries.extend([F.lit(pid), F.lit(off)])
        offset_expr = F.create_map(*map_entries)[F.col(_PID)]
    else:
        offset_expr = F.lit(start - 1)

    w = Window.partitionBy(_PID).orderBy(*local_order)
    numbered = prepared.withColumn(
        column, (F.row_number().over(w).cast("long") + offset_expr).cast("long")
    )
    data_cols = [c for c in df.columns if c != column]
    # The persisted intermediate stays cached so the numbering pass reuses
    # the exact partitioning the counts were taken from. Callers release it
    # via release_caches() once the numbered frame materializes.
    return numbered.select(column, *data_cols)
