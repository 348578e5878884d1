"""Graph analytics on edge-list DataFrames — triangle counting, PageRank,
BFS depths. Complements the connected-components operators in
``ext/dedup.py`` (hash-min and large-star/small-star).

The reference has no graph surface; these are beyond-reference operators
for the graphs a data pipeline actually builds (co-occurrence graphs,
near-dup pair graphs, entity-resolution clusters).

Scale shapes:
- ``triangle_count`` is the node-iterator formulation with the total-order
  trick: every edge directed low->high, wedges enumerated from the
  low endpoint only, closed by one more equi-join — never a per-node
  neighborhood cross product on the driver, and each triangle is counted
  exactly once. Two shuffle joins on node ids; AQE handles skew.
- ``pagerank`` is classic power iteration: contributions = one join of the
  rank vector to the edge list (shuffle on src), summed per dst (shuffle
  on dst); lineage truncated per round with localCheckpoint (the
  iterative-Spark trap). Fixed iteration count -> deterministic, SQL-
  unrollable (the oracle).
- ``bfs_depths`` expands one frontier per round (join frontier->edges,
  anti-join visited); rounds = eccentricity of the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aircan_spark.data import checkpoint


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list -> distinct (u < v) pairs, self-loops dropped."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    return (
        e.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Count triangles in an undirected graph: wedges (u<v<w from edges
    (u,v),(u,w)) closed by edge (v,w). Returns one row (n_triangles).

    Each triangle {a<b<c} is generated exactly once — as the wedge at its
    minimum vertex a — so no divide-by-multiplicity is needed."""
    e = _canonical_edges(edges, src, dst)
    w1 = e.select(F.col("u"), F.col("v").alias("x"))
    w2 = e.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank by fixed-count power iteration on the UNDIRECTED graph
    (each edge contributes both ways): r = (1-d)/N + d · Σ r(nbr)/deg(nbr).
    Deterministic (fixed iterations, no convergence test), so an oracle
    can unroll the exact same recurrence. Returns (id, rank).

    Nodes are the edge endpoints; isolated nodes are the caller's concern
    (they'd sit at (1-d)/N). Dangling nodes cannot occur on a symmetrized
    edge list (every node has degree >= 1)."""
    e = _canonical_edges(edges, src, dst)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # r12 (guide §5): the node-count action below materializes sym's
    # lazy checkpoint; every per-round rank frame is also lazy, so the
    # whole fixed-count recursion executes as ONE job at the query's
    # own action instead of paying `iters` stand-alone checkpoint jobs.
    # Each round's frame still persists + truncates lineage exactly as
    # before when it is first computed.
    sym = sym.transform(lambda d: checkpoint(d, eager=False))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("u").alias("id"), "deg")
    n = nodes.count()
    if n == 0:  # empty graph -> empty ranks (matches the SQL unroll)
        return edges.sparkSession.createDataFrame([], "id long, rank double")
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"), "deg").transform(
        lambda d: checkpoint(d, eager=False)
    )
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            sym.join(
                ranks.select(
                    F.col("id").alias("u"), (F.col("rank") / F.col("deg")).alias("c")
                ),
                "u",
            )
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
                "deg",
            )
            .transform(lambda d: checkpoint(d, eager=False))
        )
    return ranks.select("id", "rank")


def bfs_depths(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 30,
) -> DataFrame:
    """Hop distance from ``source`` to every reachable node (undirected
    BFS). Returns (id, depth); unreachable nodes are absent. Raises if the
    graph is deeper than ``max_depth`` from the source (same explicit
    non-convergence contract as connected_components)."""
    e = _canonical_edges(edges, src, dst)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # r12 (guide §5): lazy checkpoints — each round's frontier count is
    # the materializing action (1 job/round instead of 3: eager frontier
    # checkpoint + isEmpty + eager visited re-checkpoint). `visited` is
    # still checkpointed per round so the anti-join scans ONE compact
    # frame (a plain growing union was measured SLOWER: k stacked scans
    # with k*32 partitions per round), but lazily — it materializes
    # inside the NEXT round's count job, so no stand-alone job remains.
    sym = sym.transform(lambda d: checkpoint(d, eager=False))
    spark = edges.sparkSession
    visited = spark.createDataFrame([(source, 0)], "id long, depth int")
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            sym.join(frontier.select(F.col("id").alias("u")), "u")
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(depth).alias("depth"))
            .transform(lambda d: checkpoint(d, eager=False))
        )
        # count (not isEmpty): computes every partition, finalizing the
        # lazy checkpoint in the same job that answers convergence
        if nxt.count() == 0:
            return visited
        visited = visited.union(nxt).transform(
            lambda d: checkpoint(d, eager=False)
        )
        frontier = nxt
    if not (
        sym.join(frontier.select(F.col("id").alias("u")), "u")
        .select(F.col("v").alias("id"))
        .join(visited.select("id"), "id", "left_anti")
        .isEmpty()
    ):
        raise RuntimeError(
            f"bfs_depths did not finish within max_depth={max_depth}: the "
            f"graph is deeper than the round budget from node {source!r}"
        )
    return visited


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation: every node
    starts labelled with its own id; each round, a node adopts the label
    most frequent among its NEIGHBORS' current labels (ties broken by
    the smallest label — fully deterministic, so a SQL oracle can unroll
    the exact same rounds). Fixed iteration count, no convergence test.
    Returns (id, community).

    The LPA vote differs from connected components (hash-min, which
    floods one label per connected region): dense clusters keep their
    own majority labels, so communities FINER than components emerge.

    Scale shape per round: one join of the O(nodes) label vector to the
    symmetrized edge list (shuffle on the neighbor key), one
    (node, label) count exchange, one argmax-by-struct per node (MAX of
    (count, -label) — no per-node window sort). Lineage truncated per
    round with localCheckpoint. Nodes are the edge endpoints; isolated
    nodes are the caller's concern."""
    e = _canonical_edges(edges, src, dst)
    # r12 (guide §5): fixed-count loop with no intermediate action —
    # all-lazy checkpoints collapse `iters`+2 stand-alone
    # materialization jobs into the query's own execution; each frame
    # still persists and truncates lineage at first computation.
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(lambda d: checkpoint(d, eager=False))
    labels = sym.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    ).transform(lambda d: checkpoint(d, eager=False))
    for _ in range(iters):
        votes = (
            sym.join(
                labels.select(F.col("id").alias("v"), "lbl"), "v"
            )
            .groupBy(F.col("u").alias("id"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("id")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("lbl")).alias("nl"))).alias("m"))
            .select("id", (-F.col("m.nl")).alias("lbl"))
            .transform(lambda d: checkpoint(d, eager=False))
        )
    return labels.select("id", F.col("lbl").alias("community"))
