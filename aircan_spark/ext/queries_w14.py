"""Declared-query waves: round-5 wave: exact 3-player Shapley channel
attribution; round-5 wave: difference-in-differences estimator; round-5
wave: VWAP/TWAP price aggregation; round-5 wave: newsvendor critical-
fractile stocking quantile; round-5 wave: bipartite (odd-cycle) check via
BFS parity; round-5 wave: greedy max-coverage document selection.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: same rules as queries_w10-w13 — exact integer sums through
identical double trees, e-notation float literals, decimal-rounded term
sums for per-week float families, integer argmax with explicit key
tie-breaks for every greedy selection.
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w03 import _COOC_EDGES_SQL, _cooc_edges
from aircan_spark.ext.queries_w13 import *  # noqa: F401,F403


# --- round-5 wave: exact Shapley channel attribution --------------------------

_SHAP_V = (
    "CASE WHEN u{c} > 0 THEN CAST(k{c} AS DOUBLE)/u{c} ELSE CAST(0 AS DOUBLE) END"
)


def _shapley_expr(player: int) -> str:
    """phi for player bit (0=click, 1=view, 2=signup) over coalitions
    encoded as 3-bit keys c in 0..7 (bit0 click, bit1 view, bit2 signup):
    phi_i = sum over S not containing i of w(|S|) * (v(S+i) - v(S)),
    weights 1/3 (|S| in {0,2}) and 1/6 (|S| = 1) for n = 3."""
    bit = 1 << player
    terms = []
    for s in range(8):
        if s & bit:
            continue
        size = bin(s).count("1")
        w = "1e0/3e0" if size in (0, 2) else "1e0/6e0"
        terms.append(
            f"{w}*(({_SHAP_V.format(c=s | bit)}) - ({_SHAP_V.format(c=s)}))"
        )
    return " + ".join(terms)


def ext_shapley_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution for the three touch
    channels (click, view, signup) toward purchase conversion: coalition
    value v(S) = conversion rate of users whose touch set is exactly S,
    and each channel's phi is the closed-form n=3 Shapley sum (weights
    1/3, 1/6) — the cooperative-game attribution that, unlike last-touch
    or Markov removal, satisfies efficiency/symmetry axioms. All eight
    coalition cells are integer (users, converters) from one hash agg;
    the phi formulas are fixed expression trees (missing coalitions
    contribute v = 0).

    Scale shape: one per-user agg (map-side combinable), one 8-cell agg,
    one pivoted row of closed-form arithmetic."""
    users = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.expr("CAST(event_type = 'click' AS INT)")).alias("hc"),
            F.max(F.expr("CAST(event_type = 'view' AS INT)")).alias("hv"),
            F.max(F.expr("CAST(event_type = 'signup' AS INT)")).alias("hs"),
            F.max(F.expr("CAST(event_type = 'purchase' AS INT)")).alias("conv"),
        )
        .select(
            F.expr("hc + 2*hv + 4*hs").alias("coal"),
            "conv",
        )
    )
    cells = users.groupBy("coal").agg(
        F.count(F.lit(1)).alias("u"), F.sum("conv").alias("k")
    )
    wide = cells.agg(
        *[
            F.sum(F.when(F.col("coal") == c, F.col("u")).otherwise(0)).alias(f"u{c}")
            for c in range(8)
        ],
        *[
            F.sum(F.when(F.col("coal") == c, F.col("k")).otherwise(0)).alias(f"k{c}")
            for c in range(8)
        ],
    )
    rows = []
    for player, name in [(0, "click"), (1, "view"), (2, "signup")]:
        rows.append(
            wide.select(
                F.lit(name).alias("channel"),
                F.expr(f"ROUND({_shapley_expr(player)}, 6)").alias("shapley"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("channel")


_SHAP_WIDE_COLS = ", ".join(
    f"CAST(SUM(CASE WHEN coal = {c} THEN u ELSE 0 END) AS BIGINT) AS u{c}, "
    f"CAST(SUM(CASE WHEN coal = {c} THEN k ELSE 0 END) AS BIGINT) AS k{c}"
    for c in range(8)
)
EXT_SHAPLEY_CHANNEL_SQL = f"""
WITH users AS (
  SELECT user_id,
         MAX(CAST(event_type = 'click' AS INTEGER))
         + 2*MAX(CAST(event_type = 'view' AS INTEGER))
         + 4*MAX(CAST(event_type = 'signup' AS INTEGER)) AS coal,
         MAX(CAST(event_type = 'purchase' AS INTEGER)) AS conv
  FROM events GROUP BY user_id
),
cells AS (SELECT coal, COUNT(*) AS u, CAST(SUM(conv) AS BIGINT) AS k FROM users GROUP BY coal),
wide AS (SELECT {_SHAP_WIDE_COLS} FROM cells)
SELECT 'click' AS channel, ROUND({_shapley_expr(0)}, 6) AS shapley FROM wide
UNION ALL
SELECT 'view' AS channel, ROUND({_shapley_expr(1)}, 6) AS shapley FROM wide
UNION ALL
SELECT 'signup' AS channel, ROUND({_shapley_expr(2)}, 6) AS shapley FROM wide
ORDER BY channel
"""


EXT_QUERIES.update({"ext_shapley_channel": ext_shapley_channel})
EXT_ORACLES.update({"ext_shapley_channel": EXT_SHAPLEY_CHANNEL_SQL})


# --- round-5 wave: difference-in-differences ----------------------------------


def ext_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: md5-assigned treatment arm (replayable
    hash split), post period from 2024-01-16; DiD = (treat_post -
    treat_pre) - (ctrl_post - ctrl_pre) on mean event value, with the
    four cell means from exact integer-cent sums and a normal-
    approximation z from within-cell variances (integer sum of squares)
    — the workhorse causal panel estimator next to CUPED/ATE in the
    experiment toolkit.

    Scale shape: one conditional hash agg produces all four cells."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            "CAST(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 2 AS INT)"
        ).alias("treat"),
        F.expr("CAST(CAST(ts AS DATE) >= DATE'2024-01-16' AS INT)").alias("post"),
        F.expr("CAST(ROUND(value*100) AS BIGINT)").alias("iv"),
    )
    cells = ev.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("iv").alias("s"),
        F.sum(F.expr("iv*iv")).alias("ss"),
    )
    wide = cells.agg(
        *[
            F.sum(
                F.when(
                    (F.col("treat") == t) & (F.col("post") == p), F.col(c)
                ).otherwise(0)
            ).alias(f"{c}{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
            for c in ("n", "s", "ss")
        ]
    )
    mean = "(CAST(s{t}{p} AS DOUBLE)/n{t}{p}/1e2)"
    var = (
        "((CAST(ss{t}{p} AS DOUBLE)/n{t}{p}"
        " - (CAST(s{t}{p} AS DOUBLE)/n{t}{p})*(CAST(s{t}{p} AS DOUBLE)/n{t}{p}))"
        "/1e4/n{t}{p})"
    )
    did = (
        f"(({mean.format(t=1, p=1)}) - ({mean.format(t=1, p=0)}))"
        f" - (({mean.format(t=0, p=1)}) - ({mean.format(t=0, p=0)}))"
    )
    se = (
        "SQRT("
        + " + ".join(var.format(t=t, p=p) for t in (1, 0) for p in (1, 0))
        + ")"
    )
    return wide.select(
        F.col("n10").alias("n_treat_pre"),
        F.col("n11").alias("n_treat_post"),
        F.col("n00").alias("n_ctrl_pre"),
        F.col("n01").alias("n_ctrl_post"),
        F.expr(f"ROUND({mean.format(t=1, p=0)}, 6)").alias("treat_pre"),
        F.expr(f"ROUND({mean.format(t=1, p=1)}, 6)").alias("treat_post"),
        F.expr(f"ROUND({mean.format(t=0, p=0)}, 6)").alias("ctrl_pre"),
        F.expr(f"ROUND({mean.format(t=0, p=1)}, 6)").alias("ctrl_post"),
        F.expr(f"ROUND({did}, 6)").alias("did"),
        F.expr(f"ROUND(({did})/({se}), 6)").alias("z"),
    )


def _did_sql() -> str:
    mean = "(CAST(s{t}{p} AS DOUBLE)/n{t}{p}/1e2)"
    var = (
        "((CAST(ss{t}{p} AS DOUBLE)/n{t}{p}"
        " - (CAST(s{t}{p} AS DOUBLE)/n{t}{p})*(CAST(s{t}{p} AS DOUBLE)/n{t}{p}))"
        "/1e4/n{t}{p})"
    )
    did = (
        f"(({mean.format(t=1, p=1)}) - ({mean.format(t=1, p=0)}))"
        f" - (({mean.format(t=0, p=1)}) - ({mean.format(t=0, p=0)}))"
    )
    se = (
        "SQRT("
        + " + ".join(var.format(t=t, p=p) for t in (1, 0) for p in (1, 0))
        + ")"
    )
    wide_cols = ", ".join(
        f"CAST(SUM(CASE WHEN treat = {t} AND post = {p} THEN {c} ELSE 0 END) AS BIGINT) AS {c}{t}{p}"
        for t in (0, 1)
        for p in (0, 1)
        for c in ("n", "s", "ss")
    )
    return f"""
WITH ev AS (
  SELECT CAST(('0x' || SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2 AS INTEGER) AS treat,
         CAST(CAST(ts AS DATE) >= DATE '2024-01-16' AS INTEGER) AS post,
         CAST(ROUND(value*100) AS BIGINT) AS iv
  FROM events
),
cells AS (
  SELECT treat, post, COUNT(*) AS n, CAST(SUM(iv) AS BIGINT) AS s,
         CAST(SUM(iv*iv) AS BIGINT) AS ss
  FROM ev GROUP BY 1, 2
),
wide AS (SELECT {wide_cols} FROM cells)
SELECT n10 AS n_treat_pre, n11 AS n_treat_post, n00 AS n_ctrl_pre, n01 AS n_ctrl_post,
       ROUND({mean.format(t=1, p=0)}, 6) AS treat_pre,
       ROUND({mean.format(t=1, p=1)}, 6) AS treat_post,
       ROUND({mean.format(t=0, p=0)}, 6) AS ctrl_pre,
       ROUND({mean.format(t=0, p=1)}, 6) AS ctrl_post,
       ROUND({did}, 6) AS did,
       ROUND(({did})/({se}), 6) AS z
FROM wide
"""


EXT_DID_ESTIMATOR_SQL = _did_sql()


EXT_QUERIES.update({"ext_did_estimator": ext_did_estimator})
EXT_ORACLES.update({"ext_did_estimator": EXT_DID_ESTIMATOR_SQL})


# --- round-5 wave: VWAP / TWAP ------------------------------------------------


def ext_vwap_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted vs time-weighted average unit price per brand:
    VWAP = sum(extendedprice)/sum(quantity) is EXACT integer-cent
    arithmetic (extendedprice is already price x quantity); TWAP is the
    mean of weekly unit prices, with each weekly term rounded to 12
    decimals and summed as DECIMAL (order-free). The VWAP-TWAP spread
    flags brands whose large orders price differently from their
    typical week.

    Scale shape: two hash aggs (brand-week, brand); no window, no join
    beyond the broadcast part dim."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(ROUND(l_extendedprice*100) AS BIGINT)").alias("pc"),
        F.col("l_quantity").cast("long").alias("q"),
        F.expr("CAST(DATEDIFF(l_shipdate, DATE'1992-01-01') DIV 7 AS BIGINT)").alias(
            "wk"
        ),
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    wkly = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand", "wk")
        .agg(F.sum("pc").alias("wpc"), F.sum("q").alias("wq"))
    )
    brand = wkly.groupBy("p_brand").agg(
        F.sum("wpc").alias("pc"),
        F.sum("wq").alias("q"),
        F.count(F.lit(1)).alias("n_weeks"),
        F.expr(
            "CAST(SUM(CAST(ROUND(CAST(wpc AS DOUBLE)/wq/1e2, 12)"
            " AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("twsum"),
    )
    return (
        brand.select(
            "p_brand",
            "n_weeks",
            F.expr("ROUND(CAST(pc AS DOUBLE)/q/1e2, 6)").alias("vwap"),
            F.expr("ROUND(twsum/n_weeks, 6)").alias("twap"),
            F.expr(
                "ROUND(CAST(pc AS DOUBLE)/q/1e2 - twsum/n_weeks, 6)"
            ).alias("vwap_minus_twap"),
        )
        .orderBy("p_brand")
    )


EXT_VWAP_TWAP_SQL = r"""
WITH li AS (
  SELECT p_brand,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc,
         CAST(l_quantity AS BIGINT) AS q,
         DATEDIFF('day', DATE '1992-01-01', l_shipdate) // 7 AS wk
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
wkly AS (
  SELECT p_brand, wk, CAST(SUM(pc) AS BIGINT) AS wpc, CAST(SUM(q) AS BIGINT) AS wq
  FROM li GROUP BY 1, 2
),
brand AS (
  SELECT p_brand, CAST(SUM(wpc) AS BIGINT) AS pc, CAST(SUM(wq) AS BIGINT) AS q,
         COUNT(*) AS n_weeks,
         CAST(SUM(CAST(ROUND(CAST(wpc AS DOUBLE)/wq/1e2, 12) AS DECIMAL(28,12))) AS DOUBLE) AS twsum
  FROM wkly GROUP BY p_brand
)
SELECT p_brand, n_weeks,
       ROUND(CAST(pc AS DOUBLE)/q/1e2, 6) AS vwap,
       ROUND(twsum/n_weeks, 6) AS twap,
       ROUND(CAST(pc AS DOUBLE)/q/1e2 - twsum/n_weeks, 6) AS vwap_minus_twap
FROM brand ORDER BY p_brand
"""


EXT_QUERIES.update({"ext_vwap_twap": ext_vwap_twap})
EXT_ORACLES.update({"ext_vwap_twap": EXT_VWAP_TWAP_SQL})


# --- round-5 wave: newsvendor critical-fractile quantile ----------------------


def ext_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking decision per brand: with underage cost 3 and
    overage cost 1 the optimal stock is the 0.75-fractile of demand
    (order quantity) — the smallest q with F(q) >= 3/4, found by exact
    integer nearest-rank over per-brand cumulative counts, plus the
    achieved service level and expected leftover sum((q*-v)+)/n (all
    integer until final division) — the inventory-optimization shape
    (argmin of a piecewise-linear expected cost) solved declaratively.

    Scale shape: one (brand, quantity) hash agg; the cumulative window
    runs over the O(brands x 50) support frame only."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("v")
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    counts = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand", "v")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("v").alias("sv"))
    )
    w = Window.partitionBy("p_brand").orderBy("v")
    cum = counts.select(
        "p_brand",
        "v",
        F.sum("c").over(w).alias("cc"),
        F.sum("sv").over(w).alias("csv"),
    )
    tot = counts.groupBy("p_brand").agg(F.sum("c").alias("n"))
    qstar = (
        cum.join(F.broadcast(tot), "p_brand")
        .filter(F.expr("4*cc >= 3*n"))
        .groupBy("p_brand")
        .agg(F.min("v").alias("q_star"), F.max("n").alias("n"))
    )
    return (
        qstar.join(
            cum.select("p_brand", F.col("v").alias("q_star"), "cc", "csv"),
            ["p_brand", "q_star"],
        )
        .select(
            "p_brand",
            "n",
            "q_star",
            F.expr("ROUND(CAST(cc AS DOUBLE)/n, 6)").alias("service_level"),
            F.expr("ROUND(CAST(q_star*cc - csv AS DOUBLE)/n, 6)").alias(
                "expected_leftover"
            ),
        )
        .orderBy("p_brand")
    )


EXT_NEWSVENDOR_SQL = r"""
WITH counts AS (
  SELECT p_brand, CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sv
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
cum AS (
  SELECT p_brand, v,
         CAST(SUM(c) OVER (PARTITION BY p_brand ORDER BY v) AS BIGINT) AS cc,
         CAST(SUM(sv) OVER (PARTITION BY p_brand ORDER BY v) AS BIGINT) AS csv
  FROM counts
),
tot AS (SELECT p_brand, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY p_brand),
qstar AS (
  SELECT c.p_brand, MIN(c.v) AS q_star, MAX(t.n) AS n
  FROM cum c JOIN tot t USING (p_brand)
  WHERE 4*c.cc >= 3*t.n GROUP BY c.p_brand
)
SELECT q.p_brand, q.n, q.q_star,
       ROUND(CAST(c.cc AS DOUBLE)/q.n, 6) AS service_level,
       ROUND(CAST(q.q_star*c.cc - c.csv AS DOUBLE)/q.n, 6) AS expected_leftover
FROM qstar q JOIN cum c ON c.p_brand = q.p_brand AND c.v = q.q_star
ORDER BY q.p_brand
"""


EXT_QUERIES.update({"ext_newsvendor": ext_newsvendor})
EXT_ORACLES.update({"ext_newsvendor": EXT_NEWSVENDOR_SQL})


# --- round-5 wave: bipartite (odd-cycle) check via BFS parity -----------------


def ext_bipartite_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartiteness test of item 0's co-occurrence component: BFS level
    parity two-colors the component, and any edge joining two same-
    parity vertices witnesses an odd cycle — the graph sanity check
    behind two-mode modeling (user/item projections must NOT be
    bipartite; dependency graphs must). Reuses the engine's iterative
    BFS (checkpointed frontier expansion) and counts conflict edges with
    one join against the canonical edge list.

    Scale shape: BFS rounds are frontier-sized joins; the parity audit
    is one broadcast-joined pass over edges."""
    from aircan_spark.ext import graph

    edges = _cooc_edges(spark, sf_dir)
    depths = graph.bfs_depths(edges, source=0)
    e = edges.join(
        depths.select(F.col("id").alias("src"), F.expr("depth % 2").alias("pu")),
        "src",
    ).join(
        depths.select(F.col("id").alias("dst"), F.expr("depth % 2").alias("pv")),
        "dst",
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_edges_in_component"),
        F.sum(F.expr("CAST(pu = pv AS LONG)")).alias("n_conflict_edges"),
        F.expr("CAST(SUM(CAST(pu = pv AS LONG)) = 0 AS INT)").alias("is_bipartite"),
    ).join(
        depths.agg(F.count(F.lit(1)).alias("n_nodes_reached"))
    ).select("n_nodes_reached", "n_edges_in_component", "n_conflict_edges", "is_bipartite")


EXT_BIPARTITE_CHECK_SQL = (
    "WITH RECURSIVE " + _COOC_EDGES_SQL.strip() + r""",
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT sym.v, r.depth + 1 FROM sym JOIN reach r ON sym.u = r.id
  WHERE r.depth < 30
),
d AS (SELECT id, MIN(depth) % 2 AS par FROM reach GROUP BY id),
e AS (
  SELECT du.par AS pu, dv.par AS pv
  FROM edges JOIN d du ON edges.u = du.id JOIN d dv ON edges.v = dv.id
)
SELECT (SELECT COUNT(*) FROM d) AS n_nodes_reached,
       COUNT(*) AS n_edges_in_component,
       CAST(SUM(CAST(pu = pv AS BIGINT)) AS BIGINT) AS n_conflict_edges,
       CAST(SUM(CAST(pu = pv AS BIGINT)) = 0 AS INTEGER) AS is_bipartite
FROM e
"""
)


EXT_QUERIES.update({"ext_bipartite_check": ext_bipartite_check})
EXT_ORACLES.update({"ext_bipartite_check": EXT_BIPARTITE_CHECK_SQL})


# --- round-5 wave: greedy max-coverage selection ------------------------------


def ext_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage data selection (the 1-1/e-approximate
    submodular facility-location core of coverage-driven corpus
    curation): pick 3 documents that jointly cover the most distinct
    5-gram shingles, one greedy round at a time — round r picks the doc
    with the most not-yet-covered shingles (ties to the smallest
    doc_id). Each round is an anti-join (uncovered shingles) + hash agg
    + deterministic top-1; the chosen doc's shingles join the covered
    set via a broadcast scalar filter (no collect).

    Scale shape: explode once (checkpointed), 3 fixed rounds of
    anti-join + agg; covered set stays a DataFrame throughout. The
    oracle unrolls the identical 3 rounds as chained CTEs."""
    from aircan_spark.data import checkpoint

    # r12 (guide §5): ALL checkpoints in this fixed-3-round greedy loop
    # are lazy — there is no intermediate action, so the final union's
    # own execution materializes the whole round chain as ONE job
    # instead of ~7 stand-alone checkpoint jobs. Each frame (the shingle
    # index, every round's pick and covered set) still persists and
    # truncates lineage at first computation, and later consumers read
    # the persisted blocks.
    sh = checkpoint(
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id", F.expr("filter(split(text, ' '), x -> x <> '')").alias("ws")
        )
        .filter(F.expr("size(ws) >= 5"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 4),"
                    " i -> concat_ws(' ', slice(ws, i, 5)))"
                )
            ).alias("sh"),
        )
        .distinct(),
        eager=False,
    )
    covered = None
    picks = []
    for rnd in range(1, 4):
        cand = sh if covered is None else sh.join(covered, "sh", "left_anti")
        gains = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        top = checkpoint(
            gains.orderBy(F.col("gain").desc(), F.col("doc_id").asc()).limit(1),
            eager=False,
        )
        picks.append(top.select(F.lit(rnd).alias("round"), "doc_id", "gain"))
        chosen_sh = sh.join(
            top.select("doc_id"), "doc_id"
        ).select("sh").distinct()
        covered = checkpoint(
            chosen_sh if covered is None else covered.union(chosen_sh).distinct(),
            eager=False,
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("round")


EXT_GREEDY_COVERAGE_SQL = r"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(generate_series(1, len(ws) - 4),
                i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS sh
  FROM (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents
  ) WHERE len(ws) >= 5
),
g1 AS (SELECT doc_id, COUNT(*) AS gain FROM sh GROUP BY doc_id),
p1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
c1 AS (SELECT DISTINCT s.sh FROM sh s JOIN p1 ON s.doc_id = p1.doc_id),
g2 AS (
  SELECT s.doc_id, COUNT(*) AS gain FROM sh s
  WHERE s.sh NOT IN (SELECT sh FROM c1) GROUP BY s.doc_id
),
p2 AS (SELECT doc_id, gain FROM g2 ORDER BY gain DESC, doc_id ASC LIMIT 1),
c2 AS (
  SELECT sh FROM c1
  UNION
  SELECT DISTINCT s.sh FROM sh s JOIN p2 ON s.doc_id = p2.doc_id
),
g3 AS (
  SELECT s.doc_id, COUNT(*) AS gain FROM sh s
  WHERE s.sh NOT IN (SELECT sh FROM c2) GROUP BY s.doc_id
),
p3 AS (SELECT doc_id, gain FROM g3 ORDER BY gain DESC, doc_id ASC LIMIT 1)
SELECT 1 AS round, doc_id, gain FROM p1
UNION ALL
SELECT 2 AS round, doc_id, gain FROM p2
UNION ALL
SELECT 3 AS round, doc_id, gain FROM p3
ORDER BY round
"""


EXT_QUERIES.update({"ext_greedy_coverage": ext_greedy_coverage})
EXT_ORACLES.update({"ext_greedy_coverage": EXT_GREEDY_COVERAGE_SQL})
