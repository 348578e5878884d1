"""Declared-query waves: round-5 wave: tokenizer training math (BPE merge
candidates), rule-based quality scoring (exact logit), temperature-scaled
corpus mixture weights; round-5 wave: n-gram novelty attribution, source
diversity (Simpson), heavy-tail Hill index, arrival-process CV audit.

Split-wave module per the _qcommon ordering contract (see that module);
updates the shared EXT_QUERIES/EXT_ORACLES registries at import time.

Determinism: same rules as queries_w10/w11 — exact integer sums, identical
double expression trees, e-notation float literals, decimal-rounded term
sums where a cross-row float SUM is unavoidable (sqrt/ln term families).
"""

from __future__ import annotations

from aircan_spark.ext._qcommon import *  # noqa: F401,F403
from aircan_spark.ext._qcommon import EXT_ORACLES, EXT_QUERIES, _load, _t  # noqa: F401
from aircan_spark.ext.queries_w11 import *  # noqa: F401,F403


# --- round-5 wave: BPE merge-step candidates ----------------------------------


def ext_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration's candidate table: counts of ADJACENT
    symbol pairs (character bigrams inside whitespace tokens) over the
    corpus, top 20 by frequency — the merge the tokenizer trainer would
    pick next, with the full ranked frontier for audit. The pair
    expansion is a row-local array transform (every 2-char substring),
    exploded once into a map-side-combinable count; ties rank
    deterministically by pair text.

    Scale shape: explode + one hash agg + TakeOrderedAndProject(20);
    the distributed shape of each iteration of full BPE training (the
    merge-apply step is a row-local regex rewrite between iterations)."""
    words = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(20)
    )


EXT_BPE_MERGE_STEP_SQL = r"""
WITH words AS (
  SELECT w FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
  ) WHERE LENGTH(w) >= 2
),
pairs AS (
  SELECT UNNEST(list_transform(generate_series(1, LENGTH(w) - 1),
                               i -> SUBSTRING(w, i, 2))) AS pair
  FROM words
)
SELECT pair, COUNT(*) AS cnt FROM pairs
GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20
"""


EXT_QUERIES.update({"ext_bpe_merge_step": ext_bpe_merge_step})
EXT_ORACLES.update({"ext_bpe_merge_step": EXT_BPE_MERGE_STEP_SQL})


# --- round-5 wave: rule-based quality logit -----------------------------------


def ext_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpretable quality-classifier scoring pass: per document a
    LINEAR logit over three exact-rational text features (stopword
    ratio, long-word ratio, average word length) with fixed e-notation
    weights, plus the keep decision at logit > 0 — the
    fasttext-quality-filter shape with a fully auditable model. Emitting
    the logit (not the sigmoid) keeps every score a fixed expression
    over integer counts; downstream sampling only needs the ordering.

    Scale shape: row-local array ops (split + two lambda filters), no
    shuffle except the final order; Python-free."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x <> '')").alias("ws"),
            F.expr("length(replace(text, ' ', ''))").alias("letters"),
        )
        .select(
            "doc_id",
            F.expr("size(ws)").alias("nw"),
            F.expr("size(filter(ws, x -> x = 'a' OR x = 'the'))").alias("nsw"),
            F.expr("size(filter(ws, x -> length(x) >= 5))").alias("nlong"),
            "letters",
        )
        .filter(F.col("nw") > 0)
    )
    return (
        docs.select(
            "doc_id",
            F.expr("ROUND(CAST(nsw AS DOUBLE)/nw, 6)").alias("stop_ratio"),
            F.expr("ROUND(CAST(nlong AS DOUBLE)/nw, 6)").alias("long_ratio"),
            F.expr("ROUND(CAST(letters AS DOUBLE)/nw, 6)").alias("avg_word_len"),
            F.expr(
                "ROUND(-1.5e0 + 2e0*(CAST(nsw AS DOUBLE)/nw)"
                " + 1e0*(CAST(nlong AS DOUBLE)/nw)"
                " + 0.2e0*(CAST(letters AS DOUBLE)/nw), 6)"
            ).alias("logit"),
            F.expr(
                "CAST(-1.5e0 + 2e0*(CAST(nsw AS DOUBLE)/nw)"
                " + 1e0*(CAST(nlong AS DOUBLE)/nw)"
                " + 0.2e0*(CAST(letters AS DOUBLE)/nw) > 0 AS INT)"
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


EXT_QUALITY_LOGIT_SQL = r"""
WITH f AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw,
         len(list_filter(string_split(text, ' '), x -> x = 'a' OR x = 'the')) AS nsw,
         len(list_filter(string_split(text, ' '), x -> LENGTH(x) >= 5)) AS nlong,
         LENGTH(REPLACE(text, ' ', '')) AS letters
  FROM documents WHERE LENGTH(text) > 0
)
SELECT doc_id,
       ROUND(CAST(nsw AS DOUBLE)/nw, 6) AS stop_ratio,
       ROUND(CAST(nlong AS DOUBLE)/nw, 6) AS long_ratio,
       ROUND(CAST(letters AS DOUBLE)/nw, 6) AS avg_word_len,
       ROUND(-1.5e0 + 2e0*(CAST(nsw AS DOUBLE)/nw)
             + 1e0*(CAST(nlong AS DOUBLE)/nw)
             + 0.2e0*(CAST(letters AS DOUBLE)/nw), 6) AS logit,
       CAST(-1.5e0 + 2e0*(CAST(nsw AS DOUBLE)/nw)
             + 1e0*(CAST(nlong AS DOUBLE)/nw)
             + 0.2e0*(CAST(letters AS DOUBLE)/nw) > 0 AS INTEGER) AS keep
FROM f WHERE nw > 0 ORDER BY doc_id
"""


EXT_QUERIES.update({"ext_quality_logit": ext_quality_logit})
EXT_ORACLES.update({"ext_quality_logit": EXT_QUALITY_LOGIT_SQL})


# --- round-5 wave: temperature-scaled mixture weights -------------------------


def ext_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixture (tau = 0.5): per-source sampling
    weight w_i = n_i^tau / sum_j n_j^tau over document token counts — the
    standard multilingual/multi-source rebalancing rule that upsamples
    small sources. sqrt(n) terms are rounded to 6 decimals and summed as
    DECIMAL (order-free); each weight and the implied epochs-per-source
    for a 1M-token budget follow as fixed expressions.

    Scale shape: token counts = one row-local array size + hash agg to
    O(sources); everything after is arithmetic on the tiny frame."""
    src = (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            F.expr("size(filter(split(text, ' '), x -> x <> ''))").alias("tok"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("n_tokens"))
    )
    tot = src.agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)"
            " AS DECIMAL(28,6))) AS DOUBLE)"
        ).alias("z")
    )
    return (
        src.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                "ROUND(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)/z, 6)"
            ).alias("weight"),
            F.expr(
                "ROUND(1000000e0*(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)/z)"
                "/n_tokens, 4)"
            ).alias("epochs_at_1m"),
        )
        .orderBy("source")
    )


EXT_MIXTURE_TEMPERATURE_SQL = r"""
WITH src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z
  FROM src
)
SELECT source, n_docs, n_tokens,
       ROUND(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)/z, 6) AS weight,
       ROUND(1000000e0*(ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 6)/z)/n_tokens, 4) AS epochs_at_1m
FROM src CROSS JOIN tot ORDER BY source
"""


EXT_QUERIES.update({"ext_mixture_temperature": ext_mixture_temperature})
EXT_ORACLES.update({"ext_mixture_temperature": EXT_MIXTURE_TEMPERATURE_SQL})


# --- round-5 wave: n-gram novelty attribution ---------------------------------


def ext_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence novelty curve: per document, the share of its
    DISTINCT 5-gram word shingles that no lower-numbered document
    contains — the marginal-contribution measure behind "how much new
    content does each source add" and dedup-threshold tuning. Shingle
    first-owners come from a MIN window over the exploded (shingle, doc)
    pairs, so the corpus is scanned and exploded exactly ONCE (the
    agg+join-back form re-scans the corpus for the owner side — its plan
    showed two parquet scans; the window form shows one).

    Scale shape: one explode, one shuffle by shingle (high-cardinality
    window key), one per-doc hash agg; no join, no pairwise compare."""
    sh = (
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
        .distinct()
    )
    w = Window.partitionBy("sh")
    per = (
        sh.select(
            "doc_id", F.min("doc_id").over(w).alias("first_doc")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.expr("CAST(first_doc = doc_id AS LONG)")).alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.expr("ROUND(CAST(n_novel AS DOUBLE)/n_shingles, 6)").alias("novelty"),
    ).orderBy("doc_id")


EXT_NGRAM_NOVELTY_SQL = r"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(generate_series(1, len(ws) - 4),
                i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS sh
  FROM (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents
  ) WHERE len(ws) >= 5
),
owner AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh)
SELECT s.doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(CAST(o.first_doc = s.doc_id AS BIGINT)) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CAST(o.first_doc = s.doc_id AS BIGINT)) AS DOUBLE)/COUNT(*), 6) AS novelty
FROM sh s JOIN owner o USING (sh)
GROUP BY s.doc_id ORDER BY doc_id
"""


EXT_QUERIES.update({"ext_ngram_novelty": ext_ngram_novelty})
EXT_ORACLES.update({"ext_ngram_novelty": EXT_NGRAM_NOVELTY_SQL})


# --- round-5 wave: Simpson diversity per source -------------------------------


def ext_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity index (probability two random docs differ in
    language) per source, unbiased small-sample form 1 - sum n_i(n_i-1)
    / (N(N-1)) — the language-balance audit; ALL integer arithmetic
    until one final division. Richness (distinct langs) rides along.

    Scale shape: one (source, lang) hash agg, one re-aggregate."""
    cells = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per = cells.groupBy("source").agg(
        F.sum("n").alias("nn"),
        F.sum(F.expr("n*(n - 1)")).alias("pairs_same"),
        F.count(F.lit(1)).alias("richness"),
    )
    return (
        per.filter(F.col("nn") >= 2)
        .select(
            "source",
            F.col("nn").alias("n_docs"),
            "richness",
            F.expr(
                "ROUND(1 - CAST(pairs_same AS DOUBLE)/(CAST(nn AS DOUBLE)*(nn - 1)), 6)"
            ).alias("simpson"),
        )
        .orderBy("source")
    )


EXT_SIMPSON_DIVERSITY_SQL = r"""
WITH cells AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
per AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(n*(n - 1)) AS BIGINT) AS pairs_same,
         COUNT(*) AS richness
  FROM cells GROUP BY source
)
SELECT source, nn AS n_docs, richness,
       ROUND(1 - CAST(pairs_same AS DOUBLE)/(CAST(nn AS DOUBLE)*(nn - 1)), 6) AS simpson
FROM per WHERE nn >= 2 ORDER BY source
"""


EXT_QUERIES.update({"ext_simpson_diversity": ext_simpson_diversity})
EXT_ORACLES.update({"ext_simpson_diversity": EXT_SIMPSON_DIVERSITY_SQL})


# --- round-5 wave: Hill tail index --------------------------------------------


def ext_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail exponent over the top
    k=100 order statistics — the heavy-tail diagnostic that decides
    whether length-capping/packing policy needs a power-law budget:
    alpha = k / sum ln(x_(i)/x_(k+1)). Selection is deterministic
    (length desc, doc_id asc via one ROW_NUMBER); the ln terms are
    rounded to 12 decimals and summed as DECIMAL (order-free).

    Scale shape: at scale the top-(k+1) selection is a
    TakeOrderedAndProject, not a global sort; the ln sum runs on k rows."""
    ranked = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("x"),
            F.row_number()
            .over(Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 101)
    )
    xmin = ranked.filter(F.col("rk") == 101).select(F.col("x").alias("xk"))
    s = (
        ranked.filter(F.col("rk") <= 100)
        .join(F.broadcast(xmin))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max("xk").alias("x_kplus1"),
            F.expr(
                "CAST(SUM(CAST(ROUND(LN(CAST(x AS DOUBLE)/xk), 12)"
                " AS DECIMAL(28,12))) AS DOUBLE)"
            ).alias("lsum"),
        )
    )
    return s.select(
        "k",
        "x_kplus1",
        F.expr("ROUND(lsum, 8)").alias("log_sum"),
        F.expr("ROUND(k/lsum, 6)").alias("hill_alpha"),
    )


EXT_HILL_TAIL_INDEX_SQL = r"""
WITH ranked AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents WHERE n_chars > 0
),
xmin AS (SELECT x AS xk FROM ranked WHERE rk = 101)
SELECT COUNT(*) AS k, MAX(xk) AS x_kplus1,
       ROUND(CAST(SUM(CAST(ROUND(LN(CAST(x AS DOUBLE)/xk), 12) AS DECIMAL(28,12))) AS DOUBLE), 8) AS log_sum,
       ROUND(COUNT(*)/CAST(SUM(CAST(ROUND(LN(CAST(x AS DOUBLE)/xk), 12) AS DECIMAL(28,12))) AS DOUBLE), 6) AS hill_alpha
FROM ranked CROSS JOIN xmin WHERE rk <= 100
"""


EXT_QUERIES.update({"ext_hill_tail_index": ext_hill_tail_index})
EXT_ORACLES.update({"ext_hill_tail_index": EXT_HILL_TAIL_INDEX_SQL})


# --- round-5 wave: inter-arrival CV (Poisson-ness) audit ----------------------


def ext_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coefficient of variation of per-user inter-event gaps, per type of
    the FOLLOWING event — the arrival-process audit (CV ~ 1 means
    memoryless/Poisson traffic; CV >> 1 means bursts; CV << 1 means
    schedules), which sizes streaming-state watermarks and session-gap
    thresholds. Gaps are exact integer seconds from epoch-micros LAG
    per user; mean/CV come from the three integer moment sums, with
    n*s2 - s1*s1 EXACT in DECIMAL(38) (the ext_bullwhip pattern) —
    plain BIGINT s1*s1 overflows ANSI at ~10x the sf0.1 gap volume
    (caught by the 10x full-registry scale smoke), converted to double
    only for the final O(1)-magnitude CV.

    Scale shape: one per-user window (high-cardinality key), one hash
    agg to O(event types)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.expr("unix_micros(ts)").alias("us"),
        )
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .select(
            "event_type", F.expr("CAST((us - prev_us) DIV 1000000 AS BIGINT)").alias("g")
        )
    )
    m = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s1"),
        F.sum(F.expr("CAST(g AS DECIMAL(19,0))*CAST(g AS DECIMAL(19,0))"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    return (
        m.select(
            "event_type",
            F.col("n").alias("n_gaps"),
            F.expr("ROUND(CAST(s1 AS DOUBLE)/n, 6)").alias("mean_gap_s"),
            F.expr(
                "ROUND(SQRT(CAST(n*s2 - CAST(s1 AS DECIMAL(19,0))*s1"
                " AS DOUBLE))/s1, 6)"
            ).alias("cv"),
        )
        .orderBy("event_type")
    )


EXT_INTERARRIVAL_CV_SQL = r"""
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
  FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(g) AS BIGINT) AS s1,
         CAST(SUM(CAST(g AS DECIMAL(19,0))*CAST(g AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type
)
SELECT event_type, n AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE)/n, 6) AS mean_gap_s,
       ROUND(SQRT(CAST(n*s2 - CAST(s1 AS DECIMAL(19,0))*s1 AS DOUBLE))/s1, 6) AS cv
FROM m ORDER BY event_type
"""


EXT_QUERIES.update({"ext_interarrival_cv": ext_interarrival_cv})
EXT_ORACLES.update({"ext_interarrival_cv": EXT_INTERARRIVAL_CV_SQL})
