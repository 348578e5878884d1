"""Temporal/relational operators Spark's DataFrame API lacks as primitives
— as-of join, bounded range (interval) join — plus thin, scale-shaped
wrappers for top-k-per-group, hierarchical rollup, and grouped quantiles.

The reference (datopian/aircan) has no joins beyond the upsert MERGE
equi-join (see SURVEY.md §2.7); these are part of the beyond-reference
training-data-pipeline surface: as-of joins align event/feature streams
("latest purchase before each click"), range joins window co-occurring
events, top-k/quantiles drive corpus filtering thresholds.

Scale notes (100 TB discipline):
- ``asof_join`` is the union-tag + running-``last`` formulation: ONE
  shuffle, partitioned by the join key — never a per-key sort-merge
  inequality join or a windowed cross product. State per key is a single
  struct (the most recent right row), so skewed keys cost sort time, not
  memory blowup.
- ``range_join`` buckets time into spans at least as wide as the window
  and joins on (key, bucket) with each LEFT row exploded into the <= 2
  covering buckets — candidate fan-out is bounded by 2x, the exact
  predicate filters inside the joined partitions, and the equi-join on
  (key, bucket) lets AQE pick broadcast/skew strategies.
- ``topk_per_group`` relies on Spark's rank-limit pushdown
  (WindowGroupLimit, Spark 3.5+): the k-filter on row_number is applied
  map-side before the shuffle, so each partition ships at most k rows per
  group instead of the whole group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row with
    the same key — ``direction="backward"`` (default) takes the most
    recent right with ``right.ts <= left.ts``, ``"forward"`` the earliest
    right with ``right.ts >= left.ts`` (both inclusive); NULLs when none
    exists (left-outer semantics). The pandas ``merge_asof`` pair of
    directions, distributed.

    Implementation: tag and union both sides, then one running
    ``last(payload, ignorenulls=True)`` window per key ordered by
    (ts, side) — forward flips the tie order and uses ``first`` over the
    following frame. A single hash shuffle on the key — the same cost as
    one equi-join — with no inequality-join cross product.

    ``tolerance`` (e.g. ``"10 minutes"``): matches farther than that from
    ``left_ts`` are nulled out, keeping the left row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    rpayload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    lpayload = F.struct(*[F.col(c) for c in left.columns])
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rpayload.alias("__rpayload"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rpayload"].dataType).alias("__rpayload"),
        lpayload.alias("__lpayload"),
    )
    if direction == "backward":
        w = (
            Window.partitionBy("__key")
            # right rows sort before left rows at equal ts -> inclusive match
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last("__rpayload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("__key")
            # right rows sort AFTER left rows at equal ts (side desc: left=1
            # first) so the following frame still sees the equal-ts match
            .orderBy("__ts", F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first("__rpayload", ignorenulls=True).over(w)
    matched = (
        r.withColumn("__lpayload", F.lit(None).cast(l.schema["__lpayload"].dataType))
        .unionByName(l)
        .withColumn("__match", pick)
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        if direction == "backward":
            in_range = F.col("__match.__rts") >= F.col("__ts") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            in_range = F.col("__match.__rts") <= F.col("__ts") + F.expr(
                f"INTERVAL {tolerance}"
            )
        matched = matched.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )

    out = matched.select(
        *[F.col(f"__lpayload.{c}").alias(c) for c in left.columns], "__match"
    )
    taken = set(left.columns)
    for c in ["__rts", *right_cols]:
        name = right_ts if c == "__rts" else c
        name = name + suffix if name in taken else name
        out = out.withColumn(name, F.col(f"__match.{c}"))
    return out.drop("__match")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "-10 minutes",
    upper: str = "0 seconds",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Bounded interval join: all (left, right) pairs with the same key and
    ``left.ts + lower <= right.ts < left.ts + upper`` (lower inclusive,
    upper exclusive). Returns the matched pairs (inner semantics).

    Bucketing: time is split into spans of the window width; each left row
    explodes into the <= 2 buckets its window can touch, the join is a pure
    equi-join on (key, bucket), and the exact predicate filters in-place.
    This bounds fan-out at 2x and never builds a per-key cross product.
    """
    if left_cols is None:
        left_cols = [c for c in left.columns if c != on]
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]

    def shift(ts_col: str, interval: str):
        iv = F.expr(f"INTERVAL {interval.lstrip('-').strip()}")
        return (
            F.col(ts_col) - iv
            if interval.strip().startswith("-")
            else F.col(ts_col) + iv
        )

    width = span_seconds_literal(lower, upper)  # driver-side int literal

    # A window of span == width covers at most 2 width-sized buckets, so
    # exploding the left into {bucket(ws), bucket(we)} is a superset of
    # every bucket an in-window right row can land in (unix_timestamp
    # truncation is monotone).
    l_b = (
        left.withColumn("__ws", shift(left_ts, lower))
        .withColumn("__we", shift(left_ts, upper))
        .withColumn(
            "__bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.unix_timestamp("__ws") / width),
                        F.floor(F.unix_timestamp("__we") / width),
                    )
                )
            ),
        )
    )
    r_b = right.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / width)
    )

    joined = (
        l_b.alias("L")
        .join(r_b.alias("R"), [l_b["__bucket"] == r_b["__bucket"], l_b[on] == r_b[on]])
        .filter(
            (F.col(f"R.{right_ts}") >= F.col("L.__ws"))
            & (F.col(f"R.{right_ts}") < F.col("L.__we"))
        )
    )
    taken = {on, *left_cols}
    sel = [F.col(f"L.{on}").alias(on)] + [
        F.col(f"L.{c}").alias(c) for c in left_cols
    ]
    for c in right_cols:
        name = c + suffix if c in taken else c
        sel.append(F.col(f"R.{c}").alias(name))
    return joined.select(*sel)


def span_seconds_literal(lower: str, upper: str) -> F.Column:
    """Window span in whole seconds as a literal column (driver-computed)."""
    import re

    def secs(s: str) -> int:
        sign = -1 if s.strip().startswith("-") else 1
        m = re.match(r"-?\s*(\d+)\s*(\w+)", s.strip())
        n, unit = int(m.group(1)), m.group(2).lower()
        mult = {
            "second": 1, "seconds": 1,
            "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600,
            "day": 86400, "days": 86400,
        }[unit]
        return sign * n * mult

    return F.lit(max(secs(upper) - secs(lower), 1))


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` with a deterministic
    tie-break. Emits a ``rank`` column (row_number semantics).

    Spark >= 3.5 rewrites the row_number-filter pattern with
    WindowGroupLimit: each map task keeps only its local top-k per group
    before the shuffle, so the exchange carries O(k * groups) rows, not the
    full table — the distributed top-k you would otherwise hand-roll.
    """
    ordering = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tie_break:
        ordering.append(F.col(tie_break).asc())
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rollup_counts(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: list[F.Column],
    all_label: str = "ALL",
) -> DataFrame:
    """Hierarchical rollup over ``group_cols`` with subtotal + grand-total
    rows; grouping-null cells are labelled ``all_label`` so downstream
    consumers (and cross-engine oracles) need no GROUPING() call. Group
    columns must be strings (callers cast first).

    Spark executes rollup as Expand + one hash aggregate — partial
    (map-side) aggregation applies at every level, so the shuffle carries
    one partial row per (level, group) per task.
    """
    out = df.rollup(*group_cols).agg(*agg_exprs)
    for c in group_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(all_label)))
    return out


def grouped_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact interpolated percentiles per group (SQL ``percentile``,
    continuous/linear interpolation — matches DuckDB ``quantile_cont``).

    Exact percentile is a sort-based aggregate (per-group buffers); at
    100 TB prefer ``approx_percentile`` (t-digest sketch, mergeable,
    bounded memory) — kept exact here because corpus-filter thresholds at
    fixture scale must be oracle-checkable bit-for-bit.
    """
    aggs = [
        F.round(
            F.expr(f"percentile({value_col}, {p})"), 4
        ).alias(f"p{int(p * 100):02d}")
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def filter_by_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the per-group
    [lower_q, upper_q] quantile band — the standard outlier-trimming
    corpus filter (e.g. drop the shortest/longest 5% of documents per
    language).

    The quantile frame is one row per group; it broadcasts, so the filter
    costs one scan + a map-side join — no shuffle of the data rows."""
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_cols)
        .filter(
            (F.col(value_col) >= F.col("__lo"))
            & (F.col(value_col) <= F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def pivot_counts(
    df: DataFrame,
    key_cols: list[str],
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """Long-to-wide count pivot: one row per key, one column per pivot
    value, missing combinations filled with 0.

    ``values`` is explicit so the plan needs no pre-pass distinct scan to
    discover categories (on 100 TB that discovery is a full extra job) and
    the output schema is stable for downstream consumers."""
    out = df.groupBy(*key_cols).pivot(pivot_col, values).count()
    return out.fillna(0, subset=values)


def cube_counts(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: list[F.Column],
    all_label: str = "ALL",
) -> DataFrame:
    """Cube over ``group_cols``: aggregates for every subset of the
    grouping keys (2^k level combinations), grouping-null cells labelled
    ``all_label`` — the cross-dimension dashboard companion of
    ``rollup_counts``. Group columns must be strings (callers cast
    first).

    Same physical shape as rollup: Expand replicates each input row once
    per level combination, then ONE partial-aggregated hash aggregate —
    the shuffle carries per-task partial rows, never the 2^k-expanded
    data. At high k the expansion factor itself is the cost driver: keep
    k small (<= 3) at 100 TB or pre-aggregate first."""
    out = df.cube(*group_cols).agg(*agg_exprs)
    for c in group_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(all_label)))
    return out


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over [lo, hi]: one row per
    NON-EMPTY bin — (bin, bin_lo, bin_hi, n). Values outside [lo, hi]
    are dropped; hi itself lands in the last bin. The distribution-
    profiling primitive behind corpus length/score dashboards.

    The bin index is a row-local expression, so this is a single
    partial-aggregated groupBy on an at-most-``n_bins``-key space: the
    shuffle carries <= n_bins rows per task regardless of data size.
    Empty bins are omitted by construction (sparse output) — zero-fill
    client-side if a dense vector is needed."""
    width = (hi - lo) / n_bins
    binned = df.filter(
        F.col(value_col).isNotNull()
        & (F.col(value_col) >= lo)
        & (F.col(value_col) <= hi)
    ).select(
        F.least(
            F.floor((F.col(value_col) - lo) / width), F.lit(n_bins - 1)
        ).cast("long").alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).select(
        "bin",
        F.round(F.lit(lo) + F.col("bin") * width, 6).alias("bin_lo"),
        F.round(F.lit(lo) + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
        "n",
    )


def winsorize_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorize ``value_col`` within each group: values below/above the
    [lower_q, upper_q] quantiles are CLAMPED to the bounds (not dropped —
    the row-preserving alternative to ``filter_by_group_quantiles`` when
    downstream needs every example, e.g. outlier-robust feature scaling).

    Same scale shape as the band filter: the per-group bound frame
    broadcasts, data rows never shuffle; clamp is a row-local
    least/greatest. Exact percentile per group at fixture scale;
    approx_percentile is the 100 TB swap-in."""
    out_col = out_col or value_col
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("__hi"),
    )
    # least/greatest SKIP nulls (both engines, with version-dependent
    # edge semantics) — gate explicitly so NULL values stay NULL.
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.round(
            F.greatest(F.least(F.col(value_col), F.col("__hi")), F.col("__lo")),
            6,
        ),
    )
    return (
        df.join(F.broadcast(bounds), group_cols)
        .withColumn(out_col, clamped)
        .drop("__lo", "__hi")
    )


def distinct_counts(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct cardinality of ``value_col``.

    ``exact=True`` runs COUNT(DISTINCT) — Catalyst expands it to a
    two-phase aggregate (partial distinct on (group, value), then count),
    so the wide shuffle carries distinct pairs, not raw rows. At 100 TB
    with high-cardinality values that pair set is the bottleneck:
    ``exact=False`` swaps in approx_count_distinct (HyperLogLog++,
    ``rsd`` relative error) whose sketch is constant-size per group and
    merges map-side — shuffle volume drops from |distinct pairs| to
    |groups| * sketch_size."""
    agg = (
        F.count_distinct(F.col(value_col))
        if exact
        else F.approx_count_distinct(value_col, rsd)
    )
    return df.groupBy(*group_cols).agg(agg.alias("n_distinct"))


def group_share(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group corpus composition report: row count, optional weight
    total, and each group's share of the whole — the mix dashboard a
    training-data pipeline checks before and after sampling.

    Two tiny aggregates (per-group and global), both partial-aggregated;
    the global 1-row frame rides back via broadcast cross join so the
    share division stays in-plan. Shares divide exact integer counts, so
    they're bit-identical across engines."""
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        *(
            [F.sum(F.col(weight_col).cast("long")).alias("w")]
            if weight_col
            else []
        ),
    )
    total = per.agg(
        F.sum("n").alias("__tn"),
        *([F.sum("w").alias("__tw")] if weight_col else []),
    )
    out = per.crossJoin(F.broadcast(total)).withColumn(
        "share", F.round(F.col("n") / F.col("__tn"), 6)
    )
    if weight_col:
        out = out.withColumn(
            "weight_share", F.round(F.col("w") / F.col("__tw"), 6)
        )
    return out.drop("__tn", "__tw")


def grouping_sets_counts(
    df: DataFrame,
    sets: list[list[str]],
    agg_exprs: list[F.Column],
    all_label: str = "ALL",
) -> DataFrame:
    """Explicit GROUPING SETS aggregation — only the requested level
    combinations, unlike rollup (prefix hierarchy) or cube (all 2^k).
    Grouping-null cells are labelled ``all_label``; group columns must be
    strings (callers cast first).

    Physically identical family to rollup/cube: Expand replicates each
    row once per requested set (the expansion factor is len(sets), which
    the caller controls exactly), then ONE partial-aggregated hash
    aggregate."""
    cols = sorted({c for s in sets for c in s})
    out = df.groupingSets([list(s) for s in sets], *[F.col(c) for c in cols]).agg(
        *agg_exprs
    )
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(all_label)))
    return out


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tie_col: str,
) -> DataFrame:
    """Latest record per key (CDC/log compaction: ``ORDER BY order_col
    DESC, tie_col DESC`` row 1 per key) — the upsert-log collapse that
    turns an append stream into current state.

    row_number + rank-1 filter benefits from WindowGroupLimit pushdown:
    each map task forwards at most ONE row per key into the shuffle, so
    the exchange carries |keys| rows, not |log|."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col(tie_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Global quantile bucketing (curriculum deciles, difficulty tiers):
    assign each row the index of its quantile band, 0..n_buckets-1.

    NOT a global NTILE — that is a single unpartitioned window (one task
    sorts everything at 100 TB). Instead the n-1 interior quantile
    thresholds (rounded to 6 so the cut points are engine-portable)
    broadcast as a 1-row array frame and each row counts the thresholds
    below its value — a row-local higher-order function over <= n-1
    elements, zero data shuffle. Ties around a cut all land on the same
    side, so bucket populations can deviate from exactly 1/n where mass
    concentrates — the correct behavior for a value-based banding."""
    ps = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.array(
            *[
                F.round(F.expr(f"percentile({value_col}, {p})"), 6)
                for p in ps
            ]
        ).alias("__bounds")
    )
    bucket = F.size(
        F.filter(F.col("__bounds"), lambda b: F.col(value_col) > b)
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, bucket)
        .drop("__bounds")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC between two snapshots of the same table: per key, classify as
    ``insert`` (key only in new), ``delete`` (only in old), or ``update``
    (present in both with any NULL-safe column difference); unchanged
    keys are dropped. ``changed_cols`` lists the differing columns
    (sorted, comma-joined) for updates.

    One FULL OUTER equi-join on the keys — both sides shuffle once on
    the same partitioning; the per-column comparison is a row-local
    projection. The inverse of upsert.merge: applying the diff's
    inserts+updates as a stage and deletes as an anti-filter reproduces
    ``new`` from ``old``."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    # presence flags come from sentinel columns, not data columns — a row
    # whose every compared value is NULL must still read as "present"
    o = old.select(
        *keys, *[F.col(c).alias(f"__o_{c}") for c in compare_cols]
    ).withColumn("__o_present", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"__n_{c}") for c in compare_cols]
    ).withColumn("__n_present", F.lit(True))
    j = o.join(n, keys, "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    kind = (
        F.when(F.col("__o_present").isNull(), F.lit("insert"))
        .when(F.col("__n_present").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
    )
    return (
        j.withColumn("change_type", kind)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.when(
                F.col("change_type") == "update", F.array_join(changed, ",")
            ).alias("changed_cols"),
        )
    )


def zorder_key(cols: list, bits: int = 16):
    """Morton/Z-order interleave of N non-negative integer expressions
    (``bits`` low bits each) into one clustering key — multi-dimensional
    locality for layout: range-partitioning + sorting by this key keeps
    rows close in EVERY dimension close on disk, so min/max row-group
    stats prune multi-dimensional predicates (the Delta/Iceberg OPTIMIZE
    ZORDER primitive).

    Pure integer arithmetic (shift/mod/multiply), whole-stage-codegen
    friendly, bit-replicable in any SQL engine."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b) % 2
            key = key + bit * F.lit(1 << (b * n + d)).cast("long")
    return key


def cluster_by_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Physically cluster a frame by the Z-order key of ``cols``:
    range-partition on the key (balanced output files) and sort within
    partitions, so every output file covers a compact hyper-rectangle of
    the key space."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")


def plan_compaction(
    df: DataFrame,
    size_col: str,
    order_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction plan: assign each file/shard (one input
    row with a byte size) to an output bin so every bin holds
    ~``target_bytes``, preserving ``order_col`` order so compacted files
    stay range-clustered (time-travel/pruning friendly). The split rule
    is the streaming one — ``bin_id = floor(exclusive_cumsum(size) /
    target)`` — deterministic, single-pass, and exactly replayable in
    SQL, unlike best-fit heuristics.

    Scale shape: the window runs over the FILE MANIFEST (one row per
    file — O(files), thousands at 100 TB), never over data rows; the
    plan is then a broadcast-join against the write path. A global
    orderBy window on a manifest-sized frame is the cheap, correct
    tool here."""
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(
        "bin_id", F.floor(cum_before / F.lit(target_bytes)).cast("long")
    )
