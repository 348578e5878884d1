"""Skew mitigation — salted aggregation and salted broadcast-replicate join.

AQE's skew-join splitting (on in session.py) handles most hot-key cases at
runtime by splitting oversized shuffle partitions. These utilities cover the
two shapes AQE does not:

- ``salted_agg``: a groupBy whose HOT KEY overwhelms one reducer. Two-stage
  aggregation: stage 1 groups on (key, salt) so the hot key's rows spread
  over ``salt_buckets`` reducers and combine map-side; stage 2 re-combines
  the per-salt partials. Only algebraic aggregates compose this way, which
  is exactly what the API admits (count/sum/min/max).

- ``salted_join``: an equi-join where the LEFT side has hot keys and the
  right side is too big to broadcast whole but small enough to replicate
  ``salt_buckets`` times. Left rows get a random-but-deterministic salt
  (hash of all columns mod buckets); right rows are exploded once per salt
  value; the join key becomes (key, salt). Row multiplicity is preserved
  exactly — each left row matches its right partners exactly once.

Both rewrites are semantics-preserving; the oracle query (q17) asserts the
salted plan returns byte-identical results to the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__aircan_salt"

# (partial agg, final re-combine) pairs for algebraic aggregates
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with hot-key-safe two-stage execution.

    ``aggs``: output name -> (column, fn) with fn in count/sum/min/max,
    e.g. ``{"n": ("*", "count"), "total": ("value", "sum")}``.
    """
    partials = []
    finals = []
    for out, (col, fn) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(
                f"{fn!r} is not algebraic; only {sorted(_ALGEBRAIC)} compose "
                "over salt buckets"
            )
        partial, final = _ALGEBRAIC[fn]
        c = F.lit(1) if col == "*" else F.col(col)
        partials.append(partial(c).alias(f"__p_{out}"))
        finals.append(final(F.col(f"__p_{out}")).alias(out))

    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    stage1 = salted.groupBy(*keys, _SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt_buckets``
    reducers and the right side replicated once per bucket.

    Supports inner and left joins (replication breaks right/full-outer
    multiplicity). Shuffle volume: left unchanged, right x salt_buckets —
    the classic trade when the right side is modest and the left is skewed.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    l_salted = left.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)),
    )
    r_replicated = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    joined = l_salted.join(r_replicated, [*keys, _SALT], how)
    return joined.drop(_SALT)


def blocked_self_pairs(
    keyed: DataFrame,
    block_col: str,
    id_col: str,
    payload_cols: tuple[str, ...] = (),
    *,
    target_pairs_per_task: int = 2_000_000,
    max_splits: int = 64,
    max_partitions: int = 2048,
    stats: tuple[int, int] | None = None,
) -> DataFrame:
    """All unordered within-block pairs (id_a < id_b), with the parallelism
    DERIVED from the data instead of the session default — the automatic
    version of the knob a pair-work job otherwise needs turned by hand at
    scale (the r7 30x experiment: ext_entity_clusters OOMed at the fixed
    32-partition default and needed a manual bump).

    Two derived quantities from ONE cheap stats pass (groupBy(block) ->
    two scalars; strictly less work than the pair join it sizes):

    - ``p`` — shuffle partitions for the pair join: ceil(sum(block^2) /
      target_pairs_per_task), never below the session default, capped at
      ``max_partitions``. Applied only when it EXCEEDS the default, so
      small inputs keep their exact current plan.
    - ``s`` — triangular block split: partitioning cannot subdivide ONE
      block's pair work (a 3000-row block is 9M pairs in a single task no
      matter how many partitions exist), so blocks bigger than
      sqrt(target) are hash-split into ``s`` sub-buckets and the join
      fans each block over the s(s+1)/2 sub-bucket pairs — every
      unordered row pair appears in EXACTLY one (bu <= bv) cell
      (off-diagonal cells see each cross pair once; the diagonal
      dedupes by id order), so the result is row-identical to the plain
      self-join while the per-task working set stays ~target. Row
      replication cost is (s+1) copies per input row — linear, bounded
      by ``max_splits``.

    With s == 1 (every block comfortably single-task) the plan IS the
    plain two-sided equi-join — zero overhead beyond the stats pass.

    ``stats=(work, max_block)`` supplies the two sizing scalars
    precomputed — for callers that already aggregate per-block counts
    for their own purposes (the hot-shingle guard's doc-frequency pass),
    so the index is not re-aggregated (and, worse, the guard join not
    re-executed) just to size the pair join (guide §1.2 fixed costs).
    The caller owns the equivalence: the values must be sum(c^2) and
    max(c) over ``keyed``'s per-block row counts, exactly what the
    in-function pass computes (for a guard-joined index that means
    df^2 over the rare non-NULL shingles — NULL keys never survive the
    equi-join, so they must not be counted).

    Returns (id_a, id_b, <payload>_a, <payload>_b) for every payload
    column, pairs ordered id_a < id_b. NULL block keys never pair (equi-
    join semantics), matching the plain self-join.
    """
    import math

    spark = keyed.sparkSession
    if stats is None:
        row = (
            keyed.groupBy(block_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.col("c") * F.col("c")).alias("work"),
                F.max("c").alias("max_block"),
            )
            .collect()[0]
        )
        stats = (int(row["work"] or 0), int(row["max_block"] or 0))
    work, max_block = int(stats[0]), int(stats[1])
    default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = max(default_p, min(max_partitions, math.ceil(work / target_pairs_per_task)))
    s = min(max_splits, max(1, math.ceil(max_block / math.sqrt(target_pairs_per_task))))

    if s == 1:
        a = keyed.select(
            block_col,
            F.col(id_col).alias("id_a"),
            *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        )
        b = keyed.select(
            block_col,
            F.col(id_col).alias("id_b"),
            *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        )
        if p > default_p:
            a = a.repartition(p, block_col)
            b = b.repartition(p, block_col)
        return (
            a.join(b, block_col)
            .filter(F.col("id_a") < F.col("id_b"))
            .drop(block_col)
        )

    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)).cast("int")
    a = (
        keyed.withColumn("__bu", bucket)
        .withColumn("__bv", F.explode(F.sequence(F.col("__bu"), F.lit(s - 1))))
        .select(
            block_col,
            "__bu",
            "__bv",
            F.col(id_col).alias("__xid"),
            *[F.col(c).alias(f"__x{c}") for c in payload_cols],
        )
    )
    b = (
        keyed.withColumn("__bv", bucket)
        .withColumn("__bu", F.explode(F.sequence(F.lit(0), F.col("__bv"))))
        .select(
            block_col,
            "__bu",
            "__bv",
            F.col(id_col).alias("__yid"),
            *[F.col(c).alias(f"__y{c}") for c in payload_cols],
        )
    )
    if p > default_p:
        a = a.repartition(p, block_col, "__bu", "__bv")
        b = b.repartition(p, block_col, "__bu", "__bv")
    j = a.join(b, [block_col, "__bu", "__bv"]).filter(
        (F.col("__bu") < F.col("__bv")) | (F.col("__xid") < F.col("__yid"))
    )
    swap = F.col("__xid") < F.col("__yid")
    out = [
        F.when(swap, F.col("__xid")).otherwise(F.col("__yid")).alias("id_a"),
        F.when(swap, F.col("__yid")).otherwise(F.col("__xid")).alias("id_b"),
    ]
    for c in payload_cols:
        out.append(
            F.when(swap, F.col(f"__x{c}")).otherwise(F.col(f"__y{c}")).alias(f"{c}_a")
        )
        out.append(
            F.when(swap, F.col(f"__y{c}")).otherwise(F.col(f"__x{c}")).alias(f"{c}_b")
        )
    return j.select(*out)
