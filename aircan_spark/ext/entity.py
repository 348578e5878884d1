"""Entity resolution — blocked fuzzy string matching, the dedup pass for
RECORD identity (names, titles, addresses) where exact-hash and shingle
dedup miss single-character variants.

The classic blocking shape: candidates must share a cheap block key
(here: the string minus its volatile tail; first-k chars, soundex, or a
minhash band all slot in the same way), the expensive edit-distance
verify runs only inside blocks. The join is a pure equi-join on the
block key — never an all-pairs cross product — so cost scales with
sum(block_size^2), which the block key's selectivity controls, and the
per-block work parallelizes across whatever partitions the blocks hash
into. Skewed (oversized) blocks are the failure mode at 100 TB: cap
them with a max_block_size pre-filter (same role as max_doc_freq in
ngram_jaccard_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    tail: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``name_col`` values share a block
    (string minus the last ``tail`` chars) and sit within levenshtein
    distance ``max_dist``. Returns (id_a, id_b, name_a, name_b, dist).

    ``max_block_size`` drops blocks larger than the cap before the
    self-join (recall trade for bounded worst-case cost — log what you
    drop at scale).

    Parallelism is DERIVED, not configured: ``blocked_self_pairs``
    (skew.py) sizes the pair join's shuffle partitions from
    sum(block_size^2) and triangular-splits any block whose own pair
    work exceeds one task's budget — the r7 30x experiment's manual
    partition knob, automated (a 3000-row block = 9M pairs is
    indivisible by partition COUNT alone)."""
    from aircan_spark.skew import blocked_self_pairs

    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        F.expr(
            f"substring({name_col}, 1, greatest(length({name_col}) - {tail}, 0))"
        ).alias("__block"),
    )
    if max_block_size is not None:
        sizes = keyed.groupBy("__block").agg(F.count(F.lit(1)).alias("__bn"))
        keyed = keyed.join(
            F.broadcast(sizes.filter(F.col("__bn") <= max_block_size)),
            "__block",
        ).drop("__bn")
    pairs = blocked_self_pairs(keyed, "__block", "__id", ("__name",))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.col("__name_a").alias("name_a"),
            F.col("__name_b").alias("name_b"),
        )
        # bounded levenshtein (Spark 3.5+ threshold arg): the banded DP
        # early-exits once distance exceeds max_dist — O(n*k) per pair
        # instead of O(n*m), the dominant kernel of the block join (guide
        # §1.2 "per-task work"). Returns -1 for pairs beyond the bound,
        # which the filter excludes exactly as the unbounded form's
        # > max_dist pairs were; surviving distances are exact, so the
        # result set is row-identical.
        .withColumn("dist", F.levenshtein("name_a", "name_b", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
