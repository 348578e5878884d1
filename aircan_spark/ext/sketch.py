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
    summing cnt — union + one more tiny agg.

    NULL items are dropped in-library (matching ``kmv_minima``): the hash
    is built with concat_ws, which silently skips a NULL arg — without
    the filter a NULL item would hash the seed prefix alone into a real
    bucket instead of being excluded."""
    items = items.filter(F.col(item_col).isNotNull())
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


# --- HyperLogLog registers ----------------------------------------------------------


def _hll_hash60(item: Column, seed: int) -> Column:
    """Portable 60-bit item hash: 15 hex chars of md5('{seed}-{item}') —
    the same md5 integer arithmetic as the CMS/sampler family, so
    registers built by ANY engine (or merged across days/clusters) agree
    bit-for-bit."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("-", F.lit(str(seed)), item.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hll_build(
    items: DataFrame,
    item_col: str,
    b: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Build HyperLogLog registers over a column: m=2^b registers, each
    holding max(rho) where rho = 1 + leading zeros of the hash remainder
    (50-bit window). Output (reg, max_rho) — only non-empty registers, so
    at most m rows regardless of input size.

    rho is computed with integer/string ops only (51 - bitlength via
    ``bin``), never floating log2 — exactly replicable in SQL, immune to
    libm ulp flips. Registers merge by GREATEST (``hll_merge``); the
    cardinality estimate (``hll_estimate``) is derived from the collected
    registers driver-side (<= m rows).

    NULL items are dropped in-library (matching ``kmv_minima``): the
    seed-prefix md5 a NULL would otherwise produce is a real register
    update, not an excluded item."""
    items = items.filter(F.col(item_col).isNotNull())
    m = 1 << b
    h = _hll_hash60(F.col(item_col), seed)
    reg = F.pmod(h, F.lit(m))
    # integer shift, NOT division: h exceeds 2^53, double division would
    # silently round; h is non-negative so arithmetic shift is exact
    w = F.shiftright(h, b)  # remaining ~50 bits
    rho = F.when(w == 0, F.lit(51)).otherwise(F.lit(51) - F.length(F.bin(w)))
    return (
        items.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b_df: DataFrame) -> DataFrame:
    """Merge two register sets built with the same (b, seed): union +
    per-register GREATEST — the HLL merge law (same shape as CMS count
    addition, one tiny agg)."""
    return (
        a.unionByName(b_df)
        .groupBy("reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, b: int = 10) -> float:
    """Cardinality estimate from a register frame: the classic HLL
    harmonic-mean formula with the small-range (linear counting)
    correction. Collects <= m rows — driver math over the SKETCH, never
    the data."""
    import math

    m = 1 << b
    rows = {int(r["reg"]): int(r["max_rho"]) for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -rows.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting
    return est


# --- bottom-k (KMV) uniform sample sketch ----------------------------------------


def bottomk_sample(
    df: DataFrame,
    key_cols: list[str],
    k: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """Mergeable deterministic uniform sample: the k rows whose
    md5(seed, key) hashes are smallest — the KMV/bottom-k sketch. The
    min-k of a union equals the min-k of per-part min-k's, so sketches
    built per partition / per day / per engine MERGE by union + re-take,
    and the same selection replays in any SQL engine (the oracle).

    Physical shape: ``orderBy(hash).limit(k)`` compiles to
    TakeOrderedAndProject — each task forwards only its local k smallest,
    the driver merges k-sized heaps; no global sort, no full shuffle.
    Downstream: quantile estimation over the sample (uniform by hash
    uniformity), distinct estimation (k-th minimum), set resemblance."""
    key = F.md5(
        F.concat_ws(
            "-", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    return df.withColumn("__bk", key).orderBy("__bk").limit(k)


def bottomk_merge(a: DataFrame, b: DataFrame, k: int = 2000) -> DataFrame:
    """Merge two bottom-k samples built with the same seed/keys: union,
    re-take the k smallest. Idempotent and associative."""
    return a.unionByName(b).orderBy("__bk").limit(k)


# --- grouped KMV distinct / resemblance sketch -----------------------------------


def kmv_minima(
    items: DataFrame,
    item_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Per-group k-minimum-values sketch: the k smallest 48-bit md5
    hashes of the DISTINCT items in each group. Output (group..., h, rn)
    — at most k rows per group regardless of group size.

    The k-th minimum estimates distinct cardinality ((k-1)/h_k with h_k
    as a fraction of hash space); the min-k of a union is the min-k of
    the unioned min-k's, so sketches merge by union + re-take and support
    set-resemblance estimates (union/intersection/Jaccard) that HLL
    registers cannot give directly.

    Physical shape: distinct on (group, h) collapses duplicates map-side;
    the rank filter compiles to WindowGroupLimit (Partial+Final) — each
    task forwards only its local k smallest per group, so the exchange
    carries O(groups*k) rows, not the corpus. 48-bit hashes are exact in
    both BIGINT and DOUBLE, so any SQL engine replays the same sketch
    bit-for-bit (the oracle contract)."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    # NULL items hash to NULL, and Spark's ascending row_number ranks
    # NULLs FIRST — an unfiltered NULL would silently consume a sketch
    # slot (and DuckDB orders NULLS LAST, so oracles would diverge).
    # Filter inside the library so the guarantee holds for any caller,
    # including streaming input that was not pre-cleaned.
    hashes = (
        items.select(*group_cols, h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.lit(k)
    )


KMV_HASH_SPACE = float(1 << 48)


def kmv_estimates(minima: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Collapse per-group k-minima to distinct-count estimates:
    (k-1)/h_k when the sketch is full, the exact count of collected
    hashes otherwise (small groups are exact by construction)."""
    agg = minima.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_mins"), F.max("h").alias("hk")
    )
    est = F.when(F.col("n_mins") < k, F.col("n_mins").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("hk").cast("double") / F.lit(KMV_HASH_SPACE))
    )
    return agg.select(*group_cols, est.alias("kmv_distinct"))


def kmv_merge(
    cur: DataFrame, delta: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Merge two grouped KMV sketches: union the hash sets, dedup, and
    re-take the k smallest per group (min-k of a union == min-k of the
    unioned min-k's). Idempotent and associative — the property that
    makes per-batch sketches maintainable by a stream."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        cur.select(*group_cols, "h")
        .unionByName(delta.select(*group_cols, "h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(k))
    )
