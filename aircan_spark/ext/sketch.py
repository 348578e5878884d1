"""Mergeable sketch operators — fixed-size summaries whose cost is
independent of corpus size (the 100 TB telemetry primitives).

Count-min here; HLL++ distinct counting is engine-native and exposed via
``relational.distinct_counts`` (X56). The CMS hash family is the portable
md5 integer arithmetic every sampler in this repo uses, so sketches built
by different engines (or different cluster sizes, or different DAYS) agree
bit-for-bit and MERGE by plain count addition — the property that makes a
sketch usable as an incremental aggregate at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(item: Column, row: int, width: int, seed: int) -> Column:
    """Row-r bucket for an item: first 8 hex of md5('{seed}:{row}-{item}')
    mod width — independent hash per row via the row index in the key."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("-", F.lit(f"{seed}:{row}"), item.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def count_min_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Build a count-min sketch over an item column (one row per
    occurrence). Output: (row, bucket, cnt) — at most depth*width rows
    REGARDLESS of input size.

    Scale shape: the depth-way fan-out is a row-local array explode; the
    only exchange is the (row, bucket) partial agg whose key space is
    depth*width. Two sketches with the same (depth, width, seed) merge by
    summing cnt — union + one more tiny agg."""
    fan = items.select(
        F.col(item_col).alias("item"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    bucket = F.when(F.lit(False), F.lit(0))
    # build a CASE over rows so each exploded row uses its own hash
    expr = None
    for r in range(depth):
        cond = F.col("row") == r
        b = _cms_bucket(F.col("item"), r, width, seed)
        expr = b if expr is None else F.when(cond, b).otherwise(expr)
        # (reversed nesting is fine: conditions are disjoint)
    return (
        fan.select("row", expr.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge same-shaped sketches: union + sum — the incremental-aggregate
    property (build per day/shard, merge for any window)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate each query item: min over the depth rows of its
    bucket counts (missing bucket = 0). Overestimates only, by at most
    ~N/width per row with probability 1-2^-depth.

    Scale shape: queries fan out depth-way then broadcast-join the tiny
    sketch; output is O(queries)."""
    fan = queries.select(
        F.col(item_col).alias("item"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    expr = None
    for r in range(depth):
        b = _cms_bucket(F.col("item"), r, width, seed)
        expr = b if expr is None else F.when(F.col("row") == r, b).otherwise(expr)
    keyed = fan.select("item", "row", expr.alias("bucket"))
    return (
        keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .select("item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy("item")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
