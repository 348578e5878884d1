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
