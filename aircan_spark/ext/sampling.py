"""Deterministic sampling/split operators for training-data pipelines —
global pseudo-random shuffle, hash-based train/val/test split, stratified
per-group sampling.

All keyed on md5 of (seed, id): cross-engine portable (the same expression
is the DuckDB oracle), reproducible across runs and cluster sizes, and
free of any driver-side randomness. At 100 TB:

- ``shuffle_key``/``deterministic_shuffle`` — sorting by the hash key is a
  range-partitioned parallel sort (no global window, no single task);
  downstream training jobs read the shards in key order.
- ``hash_split`` — a narrow per-row projection (no shuffle at all); split
  fractions hold per-partition by hash uniformity.
- ``stratified_sample`` — row_number over (group, hash) benefits from
  WindowGroupLimit rank pushdown: each map task forwards at most n rows
  per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def shuffle_key(id_col: Column, seed: int) -> Column:
    """Deterministic pseudo-random sort key: md5 over (seed, id)."""
    return F.md5(F.concat_ws("-", F.lit(str(seed)), id_col.cast("string")))


def hash_bucket(id_col: Column, seed: int, buckets: int = BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from the first 8 hex digits of the
    shuffle key — portable integer arithmetic (no engine-native hash)."""
    h = F.conv(F.substring(shuffle_key(id_col, seed), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 42
) -> DataFrame:
    """Attach the shuffle key and return the frame ordered by it — the
    reproducible global shuffle a training run reads its data in."""
    return df.withColumn("shuffle_key", shuffle_key(F.col(id_col), seed)).orderBy(
        "shuffle_key"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Assign each row a split label ('train'/'val'/'test' by default) by
    hash bucket — stable under reordering, appends, and re-runs (a given id
    always lands in the same split)."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w
        cond = bucket < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, group_cols: list[str], n_per_group: int, id_col: str, seed: int = 42
) -> DataFrame:
    """Exactly n rows per group (fewer if the group is smaller), chosen by
    deterministic hash order — reproducible stratified sampling."""
    w = Window.partitionBy(*group_cols).orderBy(shuffle_key(F.col(id_col), seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def bernoulli_sample(
    df: DataFrame, id_col: str, prob_col: Column, seed: int = 42
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep a row iff its hash
    bucket falls below ``prob_col`` (a [0,1] column — constant, or data-
    dependent like a quality score). Reproducible across runs, engines,
    and subsets; zero shuffle (narrow filter)."""
    bucket = hash_bucket(F.col(id_col), seed)
    return df.filter(
        bucket.cast("double") < prob_col.cast("double") * BUCKETS
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Training-mix construction: keep each row with its group's sampling
    rate (groups absent from ``rates`` drop entirely) — the
    source-weighting pass that turns raw corpus proportions into a
    target data mixture. Deterministic per row (md5 bucket), so the mix
    is reproducible and subset-stable like every sampler here; the rate
    lookup is a row-local literal map — no join, no shuffle."""
    mapping = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    prob = F.coalesce(mapping[F.col(group_col)], F.lit(0.0))
    return bernoulli_sample(df, id_col, prob, seed)


def aes_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column,
    k: int,
    group_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows (per group):
    Efraimidis–Spirakis A-ES — key = u^(1/w) with u deterministic from
    md5(seed, id); the k largest keys are a weighted-without-replacement
    sample. Complements ``bernoulli_sample`` (with-replacement semantics,
    variable output size).

    Deterministic and cross-engine portable: u is integer md5 arithmetic,
    the key is rounded to 12 decimals before ranking so JVM-vs-C libm ulp
    differences cannot flip the cut, and ties break on id. Top-k per group
    compiles to WindowGroupLimit (each map task forwards at most k rows
    per group); ungrouped top-k is TakeOrderedAndProject.

    Non-positive weights are EXCLUDED before keying (w=0 has zero A-ES
    probability mass but would divide by zero; w<0 would invert the key,
    sampling the worst rows preferentially). Mirror ``WHERE w > 0`` in any
    oracle replaying the draw."""
    df = df.filter(weight_col.cast("double") > 0)
    u = (
        F.conv(F.substring(shuffle_key(F.col(id_col), seed), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    # clamp away from 0 so ln/pow stay finite; 2^-32 shift is uniform
    u = u + F.lit(1.0 / 4294967296.0)
    key = F.round(F.pow(u, F.lit(1.0) / weight_col.cast("double")), 12)
    keyed = df.withColumn("_aes_key", key)
    if group_col is None:
        out = keyed.orderBy(F.col("_aes_key").desc(), F.col(id_col)).limit(k)
    else:
        w = Window.partitionBy(group_col).orderBy(
            F.col("_aes_key").desc(), F.col(id_col)
        )
        out = keyed.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= k
        ).drop("_rn")
    return out.drop("_aes_key")


def temporal_split(
    df: DataFrame,
    ts_col: str,
    cutoff: str,
    embargo: str | None = None,
) -> DataFrame:
    """Time-based train/test split with an optional embargo gap: rows
    strictly before ``cutoff`` are ``train``, rows at/after
    ``cutoff + embargo`` are ``test``, and rows inside the embargo window
    are ``embargo`` (excluded by the caller) — the leakage guard for
    models with trailing-window features, where a row just after the
    cutoff still SEES pre-cutoff data through its feature windows.

    Row-local predicate (no shuffle, scan-pushable); adds ``split``."""
    cut = F.lit(cutoff).cast("timestamp")
    if embargo is not None:
        test_start = cut + F.expr(f"INTERVAL {embargo}")
    else:
        test_start = cut
    label = (
        F.when(F.col(ts_col) < cut, F.lit("train"))
        .when(F.col(ts_col) >= test_start, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn("split", label)
